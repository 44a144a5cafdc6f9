"""Streaming materialized view: per-batch freshness, replay safety,
final state == full GROUP BY."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources import TableCatalog
from hk_housing_datahub_spark.sources.rollup import IncrementalRollup, Measure
from hk_housing_datahub_spark.streaming.matview import (
    stream_materialized_rollup,
)


def _rollup(cat):
    return IncrementalRollup(
        cat,
        src="facts",
        dst="facts_by_k",
        group_cols=["k"],
        measures={"n": Measure("count"), "total": Measure("sum", "v")},
    )


def _wave(spark, path, rows):
    spark.createDataFrame(rows, "k string, v long").coalesce(1).write.parquet(
        path
    )


def test_streaming_matview_end_state_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    _wave(spark, os.path.join(src, "w1"), [("a", 1), ("b", 2)])
    _wave(spark, os.path.join(src, "w2"), [("a", 3), ("c", 4)])
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    r = _rollup(cat)
    stats = stream_materialized_rollup(
        spark, src, cat, "facts", r, checkpoint=str(tmp_path / "ck")
    )
    assert stats["batches"] == 2 and stats["rows_ingested"] == 4
    assert stats["refreshes"] == 2  # fresh after EVERY batch
    state = {
        row["k"]: (row["n"], row["total"]) for row in r.read().collect()
    }
    assert state == {"a": (2, 4), "b": (1, 2), "c": (1, 4)}
    # resume on a drained input: no batches re-applied, state unchanged
    stats2 = stream_materialized_rollup(
        spark, src, cat, "facts", r, checkpoint=str(tmp_path / "ck")
    )
    assert stats2["rows_ingested"] == 0 and stats2["refreshes"] == 0
    assert cat.read("facts").count() == 4
    # a new wave lands and only IT is folded
    _wave(spark, os.path.join(src, "w3"), [("b", 10)])
    stats3 = stream_materialized_rollup(
        spark, src, cat, "facts", r, checkpoint=str(tmp_path / "ck")
    )
    assert stats3["rows_ingested"] == 1 and stats3["refreshes"] == 1
    assert {
        row["k"]: (row["n"], row["total"]) for row in r.read().collect()
    } == {"a": (2, 4), "b": (2, 12), "c": (1, 4)}
    # invariant: view == full recompute from the fact table
    full = {
        row["k"]: (row["n"], row["total"])
        for row in cat.read("facts")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert full == {"a": (2, 4), "b": (2, 12), "c": (1, 4)}


def test_streaming_matview_replayed_batch_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    _wave(spark, os.path.join(src, "w1"), [("x", 5)])
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    r = _rollup(cat)
    stream_materialized_rollup(
        spark, src, cat, "facts", r, checkpoint=str(tmp_path / "ck")
    )
    # simulate the crash-replay: same batch df, same batch id, directly
    from hk_housing_datahub_spark.streaming.catalog_sink import (
        CatalogStreamSink,
    )

    sink = CatalogStreamSink(cat, "facts", sink_id="matview")
    sink(spark.createDataFrame([("x", 5)], "k string, v long"), 0)
    assert sink.skipped_replays == 1
    out = r.refresh()
    assert out["applied_from"] == out["applied_to"]  # nothing to fold
    assert {row["k"]: row["n"] for row in r.read().collect()} == {"x": 1}
