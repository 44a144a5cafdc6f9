"""Seen-set state: exact anti-join vs salted-bucket bloom filter.

Properties (SURVEY.md §7 step 4): bloom never yields a false negative
(anything added is always filtered out later); FPR on fresh keys stays
within bound; state survives checkpoint round-trips.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.frontier.seen import BloomSeenSet, ExactSeenSet


def _keys(spark, start, end, n_buckets=32):
    return spark.range(start, end).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col("id"),
    )


def test_exact_seen_roundtrip(spark):
    s = ExactSeenSet(spark)
    a = _keys(spark, 0, 500)
    b = _keys(spark, 250, 750)
    s.add(a)
    unseen = s.filter_unseen(b)
    ids = {r["id"] for r in unseen.collect()}
    assert ids == set(range(500, 750))
    d = tempfile.mkdtemp()
    try:
        s.checkpoint(d + "/seen")
        s2 = ExactSeenSet.restore(spark, d + "/seen")
        assert s2.count() == 500
        assert s2.filter_unseen(b).count() == 250
    finally:
        shutil.rmtree(d)


def test_bloom_no_false_negatives(spark):
    s = BloomSeenSet(spark, n_buckets=32, m_bits=1 << 16, k=7)
    added = _keys(spark, 0, 2000)
    s.add(added)
    # every added key must be filtered out (no false negatives)
    assert s.filter_unseen(added).count() == 0


def test_bloom_fpr_bound(spark):
    s = BloomSeenSet(spark, n_buckets=32, m_bits=1 << 16, k=7)
    s.add(_keys(spark, 0, 2000))
    fresh = _keys(spark, 10_000, 14_000)
    passed = s.filter_unseen(fresh).count()
    fpr = 1 - passed / 4000
    # 2000 keys over 32×65536 bits ⇒ theoretical FPR ≈ 0; allow 2%
    assert fpr < 0.02, fpr


def test_bloom_checkpoint_restore(spark):
    d = tempfile.mkdtemp()
    try:
        s = BloomSeenSet(spark, n_buckets=16, m_bits=1 << 14, k=5)
        s.add(_keys(spark, 0, 300, n_buckets=16))
        s.checkpoint(d + "/bloom")
        s2 = BloomSeenSet.restore(spark, d + "/bloom", 16, 1 << 14, 5)
        assert s2.count() == 300
        assert s2.filter_unseen(_keys(spark, 0, 300, n_buckets=16)).count() == 0
        new = s2.filter_unseen(_keys(spark, 0, 600, n_buckets=16))
        assert new.count() >= 295  # 300 fresh minus rare false positives
    finally:
        shutil.rmtree(d)


def test_bloom_incremental_union(spark):
    s = BloomSeenSet(spark, n_buckets=16, m_bits=1 << 14, k=5)
    s.add(_keys(spark, 0, 100, n_buckets=16))
    s.add(_keys(spark, 100, 200, n_buckets=16))
    assert s.filter_unseen(_keys(spark, 0, 200, n_buckets=16)).count() == 0
    assert s.count() == 200
