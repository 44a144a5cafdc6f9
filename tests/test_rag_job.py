"""rag_job CLI end to end — the spark-submit deployment path for EP3
(reference orchestrators/rag.py:15-29), now with the optional SemDeDup
pass over the chunk vector store."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str, *extra: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "rag_job.py"),
            "--tables-dir", "/root/testdata/sf0.001",
            "--out", out_dir, "--k", "3", *extra,
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_rag_job_semdedup_prunes_vector_store(spark, tmp_path):
    base = _run(str(tmp_path / "plain"))
    assert base["chunks"] > 0 and base["neighbor_rows"] > 0
    assert "semdedup" not in base

    dd = _run(str(tmp_path / "dd"), "--semdedup-tau", "0.9")
    stats = dd["semdedup"]
    assert stats["chunks_in"] == base["chunks"]
    assert 0 < stats["chunks_kept"] <= stats["chunks_in"]
    # the written vector store carries exactly the kept set
    vecs = spark.read.parquet(str(tmp_path / "dd" / "chunk_vectors"))
    assert vecs.count() == stats["chunks_kept"]
    # search still answers over the pruned index
    assert dd["neighbor_rows"] > 0
