"""Streaming star-schema ingestion: response files → 14 tables, exactly-once.

The Structured-Streaming expression of the batched orchestrator in
``pipeline.py``: a file stream of nested-response documents drives
``foreachBatch``, and every micro-batch runs the same
extract → PK-anti-join-against-committed → append cycle
(/root/reference/src/orchestrators/agency.py:144-154 per-partition flush).

Bilingual pairing across batches is INCREMENTAL state, not a source
re-read: zh/en halves whose partner has not arrived yet are parked in a
``_pending`` side table (REPLACE semantics per batch), and each batch
extracts from ``new ∪ pending`` — per-batch work is O(batch + pending),
independent of how many files the stream has accumulated.

Exactly-once story: the file source's checkpoint guarantees each input
file lands in exactly one micro-batch, and the PK anti-join makes a
replayed batch (crash between append and checkpoint commit) a no-op on
the output tables; the pending table is deduped by (estate_id, lang), so
replaying its REPLACE is idempotent too.

On a real deployment the source swaps to Kafka (one value column of JSON)
without touching the extraction or the sink cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import TableCatalog
from .extractor import extract_estate_tables
from .pipeline import ESTATE_TABLES, _append_deduped
from .schema import create_star_tables

RESPONSE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("estate_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)

PENDING_TABLE = "_pending_estate_responses"


def stream_estate_responses(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    query_name: str = "star_ingest",
    max_files_per_trigger: int = 4,
):
    """Start (and return) the streaming ingestion query over a directory of
    response parquet files. Callers drive it with ``processAllAvailable()``
    for synchronous verification or let the trigger run continuously."""
    create_star_tables(catalog)
    catalog.create(PENDING_TABLE, RESPONSE_STREAM_SCHEMA)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # new rows ∪ parked unpaired halves, deduped (a replayed batch may
        # re-deliver rows already parked) — persisted once for all uses
        combined = (
            batch_df.unionByName(catalog.read(PENDING_TABLE))
            .dropDuplicates(["estate_id", "lang"])
        ).persist()
        try:
            paired = (
                combined.groupBy("estate_id")
                .agg(F.countDistinct("lang").alias("_n"))
                .filter(F.col("_n") >= 2)
                .select("estate_id")
            )
            ready = combined.join(paired, "estate_id", "left_semi")
            tables = extract_estate_tables(ready)
            for t in ESTATE_TABLES:
                _append_deduped(catalog, t, tables[t])
            # park the still-unpaired halves for the next batch
            pending = combined.join(paired, "estate_id", "left_anti")
            catalog.replace(PENDING_TABLE, pending)
        finally:
            combined.unpersist()

    stream = (
        spark.readStream.schema(RESPONSE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    return (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
