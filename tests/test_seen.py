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


# ---------------------------------------------------------------------------
# cuckoo filter (the north-star-named structure)
# ---------------------------------------------------------------------------

def test_cuckoo_no_false_negatives(spark):
    from hk_housing_datahub_spark.frontier.seen import CuckooSeenSet

    s = CuckooSeenSet(spark, None, n_buckets=16, m_rows=1 << 10)
    added = _keys(spark, 0, 3000, n_buckets=16)
    s.add(added)
    leaked = s.filter_unseen(added)
    assert leaked.count() == 0


def test_cuckoo_fpr_bound(spark):
    from hk_housing_datahub_spark.frontier.seen import CuckooSeenSet

    s = CuckooSeenSet(spark, None, n_buckets=16, m_rows=1 << 10)
    s.add(_keys(spark, 0, 3000, n_buckets=16))
    fresh = _keys(spark, 100000, 103000, n_buckets=16)
    passed = s.filter_unseen(fresh).count()
    # 16-bit fingerprints: FPR ~ 8/2^16 per probe; allow a generous bound
    assert passed >= 3000 * 0.995


def test_cuckoo_checkpoint_restore(spark, tmp_path):
    from hk_housing_datahub_spark.frontier.seen import CuckooSeenSet

    s = CuckooSeenSet(spark, None, n_buckets=8, m_rows=1 << 10)
    s.add(_keys(spark, 0, 1000, n_buckets=8))
    p = str(tmp_path / "cuckoo_state")
    s.checkpoint(p)
    r = CuckooSeenSet.restore(spark, p, 8, 1 << 10)
    assert r.filter_unseen(_keys(spark, 0, 1000, n_buckets=8)).count() == 0
    assert r.count() == 1000


def test_cuckoo_numpy_eviction_path():
    """Pure-numpy stress at high load factor: the eviction loop and overflow
    list must preserve the no-false-negative invariant."""
    import numpy as np
    from hk_housing_datahub_spark.frontier.seen import CuckooSeenSet

    m = 1 << 8  # 256 rows x 4 slots = 1024 capacity
    table = np.zeros((m, 4), dtype=np.uint16)
    overflow = set()
    rng = np.random.RandomState(7)
    keys = rng.randint(1, 2**63, size=950, dtype=np.int64).astype(np.uint64)
    CuckooSeenSet._insert(table, overflow, keys)  # ~93% load
    hit = CuckooSeenSet._contains(table, overflow, keys)
    assert hit.all(), f"{(~hit).sum()} false negatives"


def test_cuckoo_crawl_matches_exact(spark):
    """Full crawl with cuckoo seen-state schedules (almost exactly) the same
    set as exact mode — identical here because fingerprint collisions are
    ~1e-4 at this scale."""
    import tempfile as tf
    from hk_housing_datahub_spark.datagen import (
        generate_pages, generate_robots, generate_seeds,
    )
    from hk_housing_datahub_spark.frontier import CrawlEngine

    n, h = 500, 8
    pages = generate_pages(spark, n, n_hosts=h).cache()
    seeds = generate_seeds(spark, 10, n, n_hosts=h)
    robots = generate_robots(spark, n_hosts=h)
    pages.count()
    t1, t2 = tf.mkdtemp(prefix="ck1_"), tf.mkdtemp(prefix="ck2_")
    try:
        e1 = CrawlEngine(spark, pages, robots, t1, wave_ms=1000,
                         max_depth=2, seen_mode="exact")
        r1 = e1.run(seeds, max_waves=3)
        e2 = CrawlEngine(spark, pages, robots, t2, wave_ms=1000,
                         max_depth=2, seen_mode="cuckoo", n_buckets=16)
        r2 = e2.run(seeds, max_waves=3)
        s1 = sorted((r.wave, r.host, r.host_rank, r.url_canon)
                    for r in r1.schedule_log(spark).collect())
        s2 = sorted((r.wave, r.host, r.host_rank, r.url_canon)
                    for r in r2.schedule_log(spark).collect())
        assert s1 == s2
    finally:
        shutil.rmtree(t1)
        shutil.rmtree(t2)


def test_no_state_row_duplication_on_add(spark):
    """Regression: cogrouped merge already passes state-only buckets through;
    a second add touching only SOME buckets must not duplicate the untouched
    buckets' state rows nor inflate counts on re-adding existing keys."""
    from hk_housing_datahub_spark.frontier.seen import CuckooSeenSet

    for s in (
        BloomSeenSet(spark, n_buckets=8, m_bits=1 << 14, k=5),
        CuckooSeenSet(spark, None, n_buckets=8, m_rows=1 << 10),
    ):
        s.add(_keys(spark, 0, 200, n_buckets=8))
        n_rows0 = s.df.count()
        # second add hits a narrow key range (most buckets untouched)
        s.add(_keys(spark, 200, 205, n_buckets=8))
        s.add(_keys(spark, 205, 210, n_buckets=8))
        rows = s.df.groupBy("bucket").count().collect()
        assert all(r["count"] == 1 for r in rows), rows
        assert s.df.count() == n_rows0 <= 8
        # re-adding already-present keys must not inflate n_items
        before = s.count()
        s.add(_keys(spark, 0, 200, n_buckets=8))
        assert s.count() == before == 210
