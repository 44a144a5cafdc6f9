"""audit_job CLI end to end — the corpus-quality dashboard job over the
already-oracled audit battery (spark-submit deployment path)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_audit_job_end_to_end(spark, tmp_path, sf_small):
    out_dir = str(tmp_path / "audit")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "audit_job.py"),
            "--input", f"{sf_small}/documents.parquet",
            "--output", out_dir,
            "--dedup-hist",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 500
    sections = summary["sections"]
    assert sections["lang_profile"] == 5
    assert sections["fairness"] == 1
    assert sections["quality_sweep"] >= 1
    assert sections["dedup_hist"] >= 1
    # every section is a real parquet with rows
    for name, n in sections.items():
        got = spark.read.parquet(os.path.join(out_dir, name)).count()
        assert got == n, name
    # sanity on the fairness row: one key per source, shares in (0, 1]
    n_sources = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("source").distinct().count()
    )
    fair = spark.read.parquet(os.path.join(out_dir, "fairness")).first()
    assert fair.n_keys == n_sources
    assert 0 < fair.top1_share <= 1
    assert 0 <= fair.gini < 1


def test_audit_job_column_mapping_flags(spark, tmp_path, sf_small):
    """A corpus with non-canonical column names audits identically via
    the --*-col mapping flags (every section, not just the ones that
    used to take text_col); an unmapped/missing column fails fast at
    argument time."""
    renamed_path = str(tmp_path / "renamed")
    (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .withColumnRenamed("text", "body")
        .withColumnRenamed("doc_id", "id")
        .withColumnRenamed("lang", "language")
        .write.parquet(renamed_path)
    )
    out_dir = str(tmp_path / "audit_renamed")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "audit_job.py"),
            "--input", renamed_path,
            "--output", out_dir,
            "--text-col", "body",
            "--id-col", "id",
            "--lang-col", "language",
        ],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 500
    assert summary["sections"]["lang_profile"] == 5
    assert summary["sections"]["fairness"] == 1

    # missing mapped column -> clean argparse error, not a Spark trace
    bad = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "audit_job.py"),
            "--input", renamed_path,
            "--output", str(tmp_path / "never"),
            "--id-col", "id",
            "--lang-col", "language",
            "--text-col", "nope",
        ],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert bad.returncode == 2
    assert "--text-col" in bad.stderr and "nope" in bad.stderr
