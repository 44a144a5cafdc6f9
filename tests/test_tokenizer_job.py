"""tokenizer_job CLI end to end — the spark-submit deployment path for
BPE training (corpus → merges.parquet + merges.txt + fertility)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tokenizer_job_end_to_end(spark, tmp_path, sf_small):
    out_dir = str(tmp_path / "tok")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "tokenizer_job.py"),
            "--input", f"{sf_small}/documents.parquet",
            "--output", out_dir,
            "--merges", "24", "--fertility",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    merges = spark.read.parquet(os.path.join(out_dir, "merges.parquet"))
    rows = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.freq) for r in merges.collect()
    )
    assert len(rows) == 24
    assert [r[0] for r in rows] == list(range(24))
    # interchange file mirrors the table, in rank order
    with open(os.path.join(out_dir, "merges.txt")) as f:
        lines = [ln.split() for ln in f.read().splitlines()]
    assert lines == [[l, r] for _, l, r, _ in rows]
    # the CLI result (local loop path) == in-process distributed learn
    from hk_housing_datahub_spark.operators.bpe import learn_bpe

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    assert rows == learn_bpe(docs, num_merges=24, local_threshold=10**6)
    fert = spark.read.parquet(os.path.join(out_dir, "fertility.parquet"))
    got = {r.lang: r.tokens_per_char for r in fert.collect()}
    assert got and all(0 < v < 2 for v in got.values())


def test_tokenizer_job_unigram_family(spark, tmp_path, sf_small):
    """--family unigram: corpus → unigram.parquet + SentencePiece-style
    vocab file; CLI output equals the in-process fit exactly."""
    out_dir = str(tmp_path / "utok")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "tokenizer_job.py"),
            "--input", f"{sf_small}/documents.parquet",
            "--output", out_dir,
            "--family", "unigram",
            "--vocab-size", "64", "--max-piece-len", "4",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = sorted(
        (r.piece, round(r.logp, 9))
        for r in spark.read.parquet(
            os.path.join(out_dir, "unigram.parquet")
        ).collect()
    )
    from hk_housing_datahub_spark.operators.unigram_lm import (
        learn_unigram_lm,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    want = sorted(
        (p, round(lp, 9))
        for p, lp in learn_unigram_lm(docs, vocab_size=64, max_piece_len=4)
    )
    assert got == want
    with open(os.path.join(out_dir, "unigram_vocab.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == len(want)
    assert all("\t" in ln for ln in lines)
