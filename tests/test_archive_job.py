from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_archive_job_cli_end_to_end(spark, tmp_path):
    """The spark-submit deployment path: pages parquet in → CDX index,
    cdxj pointers, recrawl schedule, due seeds, trap flags + catalog
    snapshots out — one subprocess, JSON summary on stdout."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.datagen import generate_pages

    pages_path = str(tmp_path / "pages")
    # validators on a deterministic half of the corpus — the fetch-plan
    # output must split conditional/full on exactly this boundary
    generate_pages(spark, 800, n_hosts=6).withColumn(
        "etag",
        F.when(
            F.pmod(F.xxhash64("url"), F.lit(2)) == 0,
            F.concat(F.lit('"e-'), F.md5("url"), F.lit('"')),
        ),
    ).withColumn(
        "last_modified", F.lit(None).cast("string")
    ).write.parquet(pages_path)
    out_dir = str(tmp_path / "arch")
    cat_dir = str(tmp_path / "cat")

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "archive_job.py"),
            "--pages", pages_path, "--out", out_dir,
            "--catalog", cat_dir, "--segments", "4",
            "--write-segment-files",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["captures"] == 800
    assert summary["urls_scheduled"] == 800
    assert summary["cdxj_snapshot"] == 1
    assert summary["schedule_snapshot"] == 1

    # --write-segment-files: the executor-side writer rendered every
    # WARC segment; the cdxj pointer table tiles the files exactly
    # (max offset+length per segment == file size) and the manifest
    # accounts for every capture
    assert summary["segment_records"] == 800
    cdxj_rows = spark.read.parquet(os.path.join(out_dir, "cdxj"))
    ends = {
        r["segment"]: r["end"]
        for r in cdxj_rows.groupBy("segment")
        .agg(F.max(F.col("offset") + F.col("length")).alias("end"))
        .collect()
    }
    from hk_housing_datahub_spark.sources.archive_writer import (
        segment_path,
    )

    seg_dir = os.path.join(out_dir, "segments", "warc")
    assert sum(ends.values()) == summary["segment_bytes"]
    for seg, end in ends.items():
        assert os.path.getsize(segment_path(seg_dir, seg)) == end

    # the outputs compose: due/ is a CrawlEngine seeds frame; cdxj rows
    # carry the pointer columns; the CDX index is prefix-queryable
    due = spark.read.parquet(os.path.join(out_dir, "due"))
    assert due.columns == ["url", "priority"]
    assert 0 < due.count() <= 800

    # fetch plans: due URLs with a stored validator plan 'conditional'
    # and echo it verbatim; the rest plan 'full'
    plans = spark.read.parquet(os.path.join(out_dir, "plans"))
    assert plans.count() == due.count()
    assert (
        summary["plans_conditional"] + summary["plans_full"]
        == summary["due_at_now"]
    )
    assert summary["plans_conditional"] > 0
    assert summary["plans_full"] > 0
    cond = plans.filter("mode = 'conditional'")
    assert cond.filter(F.col("if_none_match").isNull()).count() == 0
    assert (
        cond.filter(
            ~F.col("if_none_match").rlike('^"e-[0-9a-f]{32}"$')
        ).count()
        == 0
    )
    cdxj = spark.read.parquet(os.path.join(out_dir, "cdxj"))
    assert {"surt", "segment", "offset", "length", "digest"} <= set(
        cdxj.columns
    )
    from hk_housing_datahub_spark.sources.cdx import cdx_domain_query

    assert (
        cdx_domain_query(
            spark, os.path.join(out_dir, "cdx"), "example.com"
        ).count()
        == 800
    )
    # catalog read-back sees the committed snapshot
    from hk_housing_datahub_spark.sources import TableCatalog

    cat = TableCatalog(spark, cat_dir)
    assert cat.read("recrawl_schedule").count() == 800


def test_archive_job_incremental_stats_and_replay_guard(spark, tmp_path):
    """Second wave merges O(delta) into the committed stats; replaying
    the same wave-id is a no-op on the accumulated statistics."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.datagen import generate_pages

    # wave 1: base corpus; wave 2: same pages a day later, shifted ts
    pages = generate_pages(spark, 300, n_hosts=4).cache()
    w1 = str(tmp_path / "w1")
    pages.write.parquet(w1)
    w2 = str(tmp_path / "w2")
    pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 40 DAYS")
    ).write.parquet(w2)

    cat_dir = str(tmp_path / "cat")
    env = dict(os.environ, PYTHONPATH=REPO)

    def run(pages_path, out_name, wave_id):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "archive_job.py"),
                "--pages", pages_path,
                "--out", str(tmp_path / out_name),
                "--catalog", cat_dir,
                "--wave-id", wave_id,
            ],
            capture_output=True, text=True, env=env, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    s1 = run(w1, "o1", "wave-1")
    assert s1["stats_merged"] is True
    s2 = run(w2, "o2", "wave-2")
    assert s2["stats_merged"] is True

    from hk_housing_datahub_spark.sources import TableCatalog

    cat = TableCatalog(spark, cat_dir)
    stats = cat.read("recrawl_stats")
    assert stats.count() == 300
    # every URL now has 2 captures accumulated across waves
    assert stats.filter(F.col("n_captures") != 2).count() == 0

    # replay wave 2: ledger short-circuits the merge, stats unchanged
    s2r = run(w2, "o2r", "wave-2")
    assert s2r["stats_merged"] is False
    stats2 = cat.read("recrawl_stats")
    assert stats2.filter(F.col("n_captures") != 2).count() == 0
