"""Streaming recrawl scheduler: batch-parity + incremental semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.recrawl import recrawl_schedule
from hk_housing_datahub_spark.streaming.recrawl import run_streaming_recrawl

DAY = 86_400


def _caps(i, t0=1_700_000_000):
    """Deterministic capture slice i: every URL u0..u19 captured once,
    digests flip on a per-URL cadence."""
    rows = []
    for u in range(20):
        ts = t0 + i * DAY + u * 13
        dg = f"d{u}#{(i + u % 3) // max(1, (u % 4) or 1)}"
        rows.append((f"https://h{u % 5}.example.com/p/{u}", u % 8, ts, dg))
    return rows


def test_streaming_schedule_matches_batch_on_any_slicing(spark, tmp_path):
    d = str(tmp_path / "caps")
    os.makedirs(d)
    schema = "url_canon string, bucket int, ts long, digest string"
    all_rows = []
    for i in range(4):  # 4 micro-batches, time-ordered per URL
        rows = _caps(i)
        all_rows += rows
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(d, f"b{i}")
        )

    emitted = run_streaming_recrawl(
        spark, os.path.join(d, "*", "*.parquet"), query_name="rc_par"
    )
    # the current schedule = the emission with the highest capture count
    latest = {
        r["url"]: r
        for r in emitted.orderBy("n_captures").collect()
    }

    batch = {
        r["url"]: r
        for r in recrawl_schedule(
            spark.createDataFrame(all_rows, schema).select(
                "url_canon",
                F.timestamp_seconds("ts").alias("warc_ts"),
                "digest",
            )
        ).collect()
    }
    assert set(latest) == set(batch)
    for u, b in batch.items():
        s = latest[u]
        assert s["n_captures"] == b["n_captures"], u
        assert s["n_changes"] == b["n_changes"], u
        for col in ("avg_interval_s", "lambda_per_day",
                    "refetch_interval_s"):
            sv, bv = s[col], b[col]
            assert (sv is None) == (bv is None), (u, col)
            if sv is not None:
                assert abs(sv - bv) < 1e-9, (u, col, sv, bv)
        assert s["next_fetch_epoch"] == b["next_fetch_epoch"], u


def test_streaming_schedule_tightens_as_changes_arrive(spark, tmp_path):
    """A URL that starts changing gets a SHORTER interval in later
    emissions — the incremental signal a live crawler acts on."""
    d = str(tmp_path / "caps2")
    os.makedirs(d)
    schema = "url_canon string, bucket int, ts long, digest string"
    t0 = 1_700_000_000
    u = "https://hot.example.com/"
    batches = [
        [(u, 0, t0, "a")],
        [(u, 0, t0 + DAY, "b")],
        [(u, 0, t0 + 2 * DAY, "c")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(d, f"b{i}")
        )
    emitted = run_streaming_recrawl(
        spark, os.path.join(d, "*", "*.parquet"), query_name="rc_tight"
    ).orderBy("n_captures").collect()
    assert [r["n_captures"] for r in emitted] == [1, 2, 3]
    assert emitted[0]["refetch_interval_s"] == 30.0 * DAY  # unknown → max
    assert (
        emitted[2]["refetch_interval_s"]
        < emitted[1]["refetch_interval_s"]
        < emitted[0]["refetch_interval_s"]
    )
