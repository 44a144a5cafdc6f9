"""Exactly-once Structured-Streaming sink into the table catalog.

The generic streaming→Iceberg contract: ``foreachBatch`` delivers each
micro-batch with a monotonically increasing ``batch_id``, but Spark
re-delivers the LAST batch after a crash-restart (the checkpoint commit
happens after the sink runs), so a sink that blindly appends duplicates
it. Iceberg closes this with idempotent snapshot commits keyed by the
batch id; this sink mirrors that: every append records its ``batch_id``
in the snapshot entry, and a replayed batch — its id already present in
the table history — is skipped as a no-op. Combined with the manifest
CAS, each micro-batch lands in the table EXACTLY once, end to end.

Scale: the dedup decision is one driver-side scan of the manifest history
(O(snapshots)); the data path is the normal append (write files → CAS).

Usage::

    sink = CatalogStreamSink(catalog, "events_live")
    (stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.tables import TableCatalog


class CatalogStreamSink:
    """``foreachBatch`` callable with per-query batch-id idempotence.

    ``sink_id`` identifies the STREAM (tie it to the checkpointLocation —
    batch ids are only monotone within one query's checkpoint). Dedup is
    keyed on (sink_id, batch_id): a second stream (or a restart with a
    fresh checkpoint, whose batch ids restart at 0) writing to the same
    table is a different producer, not a replay — its batches land."""

    def __init__(
        self,
        catalog: TableCatalog,
        table: str,
        sink_id: str = "default",
        cluster_by=None,
    ):
        self.catalog = catalog
        self.table = table
        self.sink_id = sink_id
        self.cluster_by = cluster_by
        self.skipped_replays = 0  # observability: replayed batch count

    def _committed_batch_ids(self) -> set[int]:
        return {
            h["batch_id"]
            for h in self.catalog.history(self.table)
            if "batch_id" in h and h.get("sink_id") == self.sink_id
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed_batch_ids():
            # crash-replay of an already-committed micro-batch: exactly-once
            # means this is a no-op, not a second snapshot
            self.skipped_replays += 1
            return
        # the batch_id rides the append's own manifest commit (atomic):
        # there is no window where the data is committed but unstamped
        self.catalog.append(
            self.table,
            batch_df,
            cluster_by=self.cluster_by,
            extra={"batch_id": int(batch_id), "sink_id": self.sink_id},
        )
