"""transformWithStateInPandas seen-set: parity with the older stateful
API, warm start from a batch crawl checkpoint, and TTL expiry."""

from __future__ import annotations

import os
import time

import pytest

from hk_housing_datahub_spark.streaming.tws import run_streaming_dedup_tws

SCHEMA = "url_canon string, url_hash long, bucket int"


def _mk(i: int) -> tuple[str, int, int]:
    return (f"https://h{i % 5}.example.com/p/{i}", i * 7919, i % 8)


def _write_batches(spark, d: str, batches: list[list[tuple]]) -> str:
    os.makedirs(d, exist_ok=True)
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"b{j}")
        )
    return os.path.join(d, "*", "*.parquet")


def test_tws_matches_applyinpandaswithstate(spark, tmp_path):
    """Same input, same semantics: the TWS operator emits exactly the
    first-occurrence set the applyInPandasWithState one does."""
    from hk_housing_datahub_spark.streaming.stateful import run_streaming_dedup

    batches = [
        [_mk(i) for i in range(50)],
        [_mk(i) for i in range(25, 75)],  # 25 dupes
    ]
    glob1 = _write_batches(spark, str(tmp_path / "u1"), batches)
    glob2 = _write_batches(spark, str(tmp_path / "u2"), batches)
    old = {r.url_hash for r in run_streaming_dedup(spark, glob1, query_name="old_api").collect()}
    new = {r.url_hash for r in run_streaming_dedup_tws(spark, glob2, query_name="new_api").collect()}
    assert new == old == {i * 7919 for i in range(75)}


def test_tws_warm_start_from_batch_crawl_checkpoint(spark, tmp_path):
    """initialState = a batch BloomSeenSet checkpoint: urls the batch crawl
    saw are never re-emitted by the streaming dedup."""
    from hk_housing_datahub_spark.frontier.seen import BloomSeenSet

    m_bits = 1 << 16
    batch_seen = BloomSeenSet(spark, None, n_buckets=8, m_bits=m_bits)
    batch_keys = spark.createDataFrame(
        [(i % 8, i * 7919) for i in range(30)], "bucket int, url_hash long"
    )
    batch_seen.add(batch_keys)
    ckpt = str(tmp_path / "seen_v0")
    batch_seen.checkpoint(ckpt)

    glob = _write_batches(
        spark, str(tmp_path / "urls"), [[_mk(i) for i in range(60)]]
    )
    out = run_streaming_dedup_tws(
        spark,
        glob,
        query_name="warm_start",
        initial_state=spark.read.parquet(ckpt),
        m_bits=m_bits,
    ).collect()
    # only the 30 urls the batch crawl had NOT seen are emitted
    assert {r.url_hash for r in out} == {i * 7919 for i in range(30, 60)}


def test_tws_ttl_expires_seen_state(spark, tmp_path):
    """With a tiny TTL, state written in batch 1 is expired by the time
    batch 2 runs — the same url is re-emitted (re-crawl-after-expiry)."""
    rows = [_mk(i) for i in range(10)]
    d1 = str(tmp_path / "p1")
    glob1 = _write_batches(spark, d1, [rows])
    first = run_streaming_dedup_tws(
        spark, glob1, query_name="ttl_a", ttl_ms=1, expect_input_rows=10
    ).collect()
    assert len(first) == 10

    # fresh query over two batch files; TTL=1ms means batch-1 state is
    # already expired when batch 2 (same urls) is processed
    d2 = str(tmp_path / "p2")
    glob2 = _write_batches(spark, d2, [rows, rows])
    time.sleep(0.05)
    out = run_streaming_dedup_tws(
        spark, glob2, query_name="ttl_b", ttl_ms=1, expect_input_rows=20
    ).collect()
    assert len(out) == 20, "TTL-expired url was not re-emitted"

    # control: no TTL → second batch fully deduped
    d3 = str(tmp_path / "p3")
    glob3 = _write_batches(spark, d3, [rows, rows])
    out = run_streaming_dedup_tws(spark, glob3, query_name="ttl_c").collect()
    assert len(out) == 10
