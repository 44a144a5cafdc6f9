"""Streaming materialized view: exactly-once ingest + incremental rollup.

The composition the catalog layer exists for: micro-batches land in the
fact table through :class:`CatalogStreamSink` (batch-id idempotent
appends), and after each commit the grouped aggregate is brought up to
date by :class:`IncrementalRollup.refresh` (delta-only, watermark riding
the state rows). Every failure mode degrades to a no-op or a catch-up,
never a double count:

- batch replay after crash-restart → the sink skips the append (batch id
  already in history) → refresh sees no new snapshot → no-op;
- crash between append and refresh → the NEXT batch's refresh folds both
  snapshots (multi-snapshot catch-up is the rollup's normal path);
- refresh crash mid-merge → the merge_upsert never committed, the
  watermark (a column of the state) never advanced → clean re-run.

Scale: the stream path costs O(batch) per micro-batch; the refresh costs
O(batch delta + touched groups) — the view is never recomputed from the
fact table.

Reference semantic target: the reference recomputes dashboard aggregates
from the full store per run; this is the always-fresh variant under
streaming arrival.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..sources.rollup import IncrementalRollup
from ..sources.tables import TableCatalog
from .catalog_sink import CatalogStreamSink


def stream_materialized_rollup(
    spark: SparkSession,
    src_dir: str,
    catalog: TableCatalog,
    src_table: str,
    rollup: IncrementalRollup,
    checkpoint: str,
    sink_id: str = "matview",
    timeout_s: float = 180.0,
) -> dict:
    """Drain a parquet arrival directory (one micro-batch per file,
    ``availableNow``) into ``src_table`` and keep ``rollup`` fresh after
    every batch. Returns {"batches", "rows_ingested", "refreshes"}."""
    glob = os.path.join(src_dir, "*")
    schema = spark.read.parquet(glob).schema
    catalog.create(src_table, schema)  # no-op when the table exists
    sink = CatalogStreamSink(catalog, src_table, sink_id=sink_id)
    stats = {"batches": 0, "rows_ingested": 0, "refreshes": 0}

    def on_batch(batch_df, batch_id: int) -> None:
        before = catalog.current_snapshot(src_table)
        sink(batch_df, batch_id)
        out = rollup.refresh()
        stats["batches"] += 1
        if catalog.current_snapshot(src_table) > before:
            stats["rows_ingested"] += batch_df.count()
        if out["applied_to"] > out["applied_from"]:
            stats["refreshes"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    return stats
