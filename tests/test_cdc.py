"""Content-defined chunking (multimodal/cdc.py): coverage/bounds
invariants, the shift-resilience property that motivates CDC, Spark/
sequential parity, and the dedup audit + shared-pair joins."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hk_housing_datahub_spark.multimodal.cdc import (
    cdc_chunk_table,
    cdc_chunks_py,
    cdc_dedup_stats,
    cdc_shared_pairs,
)


def _blob(n, seed=0):
    out = bytearray()
    h = hashlib.md5(str(seed).encode()).digest()
    while len(out) < n:
        h = hashlib.md5(h).digest()
        out.extend(h)
    return bytes(out[:n])


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 1000))
def test_chunks_cover_blob_exactly(n, seed):
    payload = _blob(n, seed)
    chunks = cdc_chunks_py(payload, 64, 256, 1024)
    pos = 0
    for off, ln, digest in chunks:
        assert off == pos
        assert 1 <= ln <= 1024
        assert digest == hashlib.md5(payload[off : off + ln]).hexdigest()
        pos += ln
    assert pos == n
    # every chunk except the final partial respects min_size
    for off, ln, _ in chunks[:-1]:
        assert ln >= 64


def test_shift_resilience_vs_fixed_chunking():
    """THE CDC property: inserting bytes at the front only perturbs a
    prefix of chunks — most digests survive. Fixed-size chunking loses
    every digest after the insertion point."""
    base = _blob(8000, seed=7)
    shifted = b"XYZ" + base
    a = {d for _, _, d in cdc_chunks_py(base, 64, 256, 1024)}
    b = {d for _, _, d in cdc_chunks_py(shifted, 64, 256, 1024)}
    assert len(a & b) / len(a) > 0.8
    fixed_a = {
        hashlib.md5(base[i : i + 256]).hexdigest()
        for i in range(0, len(base), 256)
    }
    fixed_b = {
        hashlib.md5(shifted[i : i + 256]).hexdigest()
        for i in range(0, len(shifted), 256)
    }
    assert len(fixed_a & fixed_b) <= 1  # fixed offsets lose everything


def test_spark_matches_sequential_and_pairs(spark):
    rows = [
        (0, _blob(3000, 1)),
        (1, b"PAD!" + _blob(3000, 1)),      # shifted copy of 0
        (2, _blob(3000, 2)),                 # unrelated
        (3, None),                           # null payload
        (4, b""),                            # empty payload
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    tbl = cdc_chunk_table(df, min_size=64, avg_size=256, max_size=1024)
    got = {}
    for r in tbl.collect():
        got.setdefault(r.doc_id, []).append((r.off, r.len, r.digest))
    for i, payload in rows:
        want = cdc_chunks_py(payload, 64, 256, 1024)
        assert sorted(got.get(i, [])) == sorted(want), i
    pairs = {
        (r.a, r.b): r.n_shared
        for r in cdc_shared_pairs(tbl, min_shared=2).collect()
    }
    assert (0, 1) in pairs       # the shifted copy shares most chunks
    assert (0, 2) not in pairs
    stats = cdc_dedup_stats(tbl).first()
    assert stats.total_chunks > stats.distinct_chunks  # 0/1 overlap
    assert 0 < stats.dedup_ratio < 1


def test_avg_size_must_be_power_of_two(spark):
    df = spark.createDataFrame([(0, b"x")], ["doc_id", "payload"])
    with pytest.raises(ValueError):
        cdc_chunk_table(df, avg_size=300)
