"""Structured Streaming variants of the batch operators.

The reference's pipeline is batch-with-wave-semantics (SURVEY.md §2.10);
Structured Streaming is the Spark-native expression of the same incremental
model: watermarks bound state like the reference's flush-and-clear caches
(/root/reference/src/processors/base.py:26-33), and `foreachBatch` is its
per-partition flush (/root/reference/src/orchestrators/agency.py:144-154).

For local verification a parquet directory drives the stream and
``processAllAvailable()`` runs it to completion synchronously; on a real
deployment the source swaps to Kafka without touching the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_windowed_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late data beyond
    10 min dropped; state bounded by the watermark)."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def run_windowed_counts(
    spark: SparkSession, events_parquet: str, query_name: str = "ev_counts"
) -> DataFrame:
    """Drive the streaming agg over a static parquet dir to completion and
    return the (batch) result table — the smoke/correctness harness.

    This harness runs the memory sink in COMPLETE output mode so the full
    window table materializes for batch/oracle comparison; in complete mode
    the watermark is inert (Spark must keep all window state). The
    production semantics — late rows dropped, closed-window state evicted —
    hold in append mode: `run_windowed_counts_append` below demonstrates
    them, and tests/test_newops.py pins the eviction behavior.
    """
    import os
    import tempfile

    # The file-stream source requires a *directory*; accept a bare parquet
    # file by staging a symlink dir (zero-copy).
    if os.path.isfile(events_parquet):
        d = tempfile.mkdtemp(prefix="evstream_")
        # abspath: a relative target would resolve relative to the temp dir
        # and dangle
        os.symlink(os.path.abspath(events_parquet), os.path.join(d, "part-0.parquet"))
        events_parquet = d
    schema = spark.read.parquet(events_parquet).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_parquet)
        # watermarks require TIMESTAMP (parquet may yield TIMESTAMP_NTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = streaming_windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT win.start AS win_start, event_type, n, total_value FROM {query_name}"
    )


def run_windowed_counts_append(
    spark: SparkSession,
    batches: list[DataFrame],
    query_name: str = "ev_counts_append",
) -> DataFrame:
    """Append-mode watermark semantics, demonstrated end-to-end.

    Each DataFrame in `batches` becomes one micro-batch (in order). Append
    mode emits a window only once its close falls behind the watermark
    (max event time − delay), and a row whose window the watermark has
    already closed is DROPPED (visible as numRowsDroppedByWatermark) — the
    bounded-state behavior a production deployment of
    `streaming_windowed_counts` gets (and that complete mode cannot show).
    Returns the emitted (finalized) windows.
    """
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="evappend_")
    # one file per micro-batch, ordered by name with maxFilesPerTrigger=1
    for i, bdf in enumerate(batches):
        bdf.coalesce(1).write.parquet(os.path.join(d, f"b={i}"))
    schema = spark.read.parquet(os.path.join(d, "b=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(d + "/b=*")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = streaming_windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT win.start AS win_start, event_type, n, total_value FROM {query_name}"
    )
