"""corpus_job CLI end to end from crawled PAGES — the spark-submit
deployment path for the crawl-to-training-corpus composition
(--input-pages → pages_to_documents → prepare_training_corpus)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpus_job_from_pages(spark, tmp_path):
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.sources.tables import TableCatalog

    pages_path = str(tmp_path / "pages")
    generate_pages(spark, 400, n_hosts=5).write.parquet(pages_path)
    cat_dir = str(tmp_path / "cat")

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "corpus_job.py"),
            "--input-pages", pages_path, "--catalog", cat_dir,
            "--output-table", "corpus", "--dedup", "exact",
            "--budget", "512", "--tag", "train-v1",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = TableCatalog(spark, cat_dir).read("corpus")
    n = out.count()
    assert 0 < n <= 400
    cols = set(out.columns)
    assert {"doc_id", "text", "source", "bin_id", "bucket"} <= cols
    # glue semantics survived the funnel: md5 ids and host attribution
    r = out.limit(1).collect()[0]
    assert len(r["doc_id"]) == 32
    assert r["source"]
