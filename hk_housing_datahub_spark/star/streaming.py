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

The pending state is BOUNDED, mirroring the crawl engine's
``max_attempts`` give-up path (frontier/crawl.py): each parked half
records the micro-batch id that first parked it, and a half still
unpaired after ``pending_ttl_batches`` batches moves to the
``_pending_dead_letters`` table (one append per give-up wave — the
catalog manifest's per-snapshot row counts are the dead-letter lineage
metric). Upstream fetches that legitimately return nothing — exactly the
reference's None-returning wiki/agency fetches
(/root/reference/src/crawlers/wiki/wiki.py:84-109) — therefore cannot
grow the state or the per-batch cost without bound.

Exactly-once story: the file source's checkpoint guarantees each input
file lands in exactly one micro-batch, and the PK anti-join makes a
replayed batch (crash between append and checkpoint commit) a no-op on
the output tables. For the pending table itself there is one replay
edge: a crash after the pending REPLACE but before the checkpoint commit
re-parks halves whose partner was consumed in the crashed attempt. Those
stale halves are swept by the per-batch anti-join against the committed
``estates`` PKs — an estate that was already extracted never needs its
halves parked again — so the replayed REPLACE converges to the same
state instead of accumulating orphans.

On a real deployment the source swaps to Kafka (one value column of JSON)
without touching the extraction or the sink cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import TableCatalog
from .extractor import extract_estate_tables
from .pipeline import ESTATE_TABLES, _append_tables_parallel
from .schema import create_star_tables

RESPONSE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("estate_id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)

PENDING_SCHEMA = T.StructType(
    list(RESPONSE_STREAM_SCHEMA)
    + [T.StructField("parked_batch", T.LongType())]
)

DEAD_LETTER_SCHEMA = T.StructType(
    list(PENDING_SCHEMA) + [T.StructField("gave_up_batch", T.LongType())]
)

PENDING_TABLE = "_pending_estate_responses"
DEAD_LETTER_TABLE = "_pending_dead_letters"

_PENDING_COLS = [f.name for f in PENDING_SCHEMA]


def stream_estate_responses(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    query_name: str = "star_ingest",
    max_files_per_trigger: int = 4,
    pending_ttl_batches: int = 100,
):
    """Start (and return) the streaming ingestion query over a directory of
    response parquet files. Callers drive it with ``processAllAvailable()``
    for synchronous verification or let the trigger run continuously.

    ``pending_ttl_batches``: how many micro-batches an unpaired half may
    wait for its partner before being dead-lettered. Generous by default —
    in a healthy stream pairs arrive within a few batches, and a too-small
    TTL would drop a legitimately slow partner's half."""
    from ..sources.pkbloom import PKBloomIndex
    from .schema import STAR_PRIMARY_KEYS

    create_star_tables(catalog)
    catalog.create(PENDING_TABLE, PENDING_SCHEMA)
    catalog.create(DEAD_LETTER_TABLE, DEAD_LETTER_SCHEMA)
    # committed-PK bloom: per-batch dedup probes cost O(batch) instead of
    # re-shuffling every table's full committed key set (pkbloom.py)
    bloom = PKBloomIndex(catalog)
    for t in ESTATE_TABLES:
        bloom.ensure(t, STAR_PRIMARY_KEYS[t])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # new rows ∪ parked unpaired halves, deduped by (estate_id, lang)
        # keeping the OLDEST parked_batch (a replayed batch may re-deliver
        # rows already parked; payloads for one key are identical) —
        # persisted once for all uses
        combined = (
            batch_df.withColumn("parked_batch", F.lit(batch_id).cast("long"))
            .unionByName(catalog.read(PENDING_TABLE))
            .groupBy("estate_id", "lang")
            .agg(
                F.max("payload").alias("payload"),
                F.min("parked_batch").alias("parked_batch"),
            )
        ).persist()
        try:
            paired = (
                combined.groupBy("estate_id")
                .agg(F.countDistinct("lang").alias("_n"))
                .filter(F.col("_n") >= 2)
                .select("estate_id")
            )
            ready = combined.join(paired, "estate_id", "left_semi")
            tables = extract_estate_tables(ready.drop("parked_batch"))
            _append_tables_parallel(
                catalog, {t: tables[t] for t in ESTATE_TABLES}, bloom
            )
            # still-unpaired halves: sweep stale ones (estate already
            # committed — the crash-replay edge above), dead-letter the
            # expired ones, park the rest for the next batch
            unpaired = combined.join(paired, "estate_id", "left_anti").join(
                catalog.read("estates").select("estate_id"),
                "estate_id",
                "left_anti",
            )
            expired = F.lit(batch_id) - F.col("parked_batch") >= pending_ttl_batches
            dead = unpaired.filter(expired).select(*_PENDING_COLS).withColumn(
                "gave_up_batch", F.lit(batch_id).cast("long")
            )
            if not dead.isEmpty():
                catalog.append(DEAD_LETTER_TABLE, dead)
            catalog.replace(
                PENDING_TABLE, unpaired.filter(~expired).select(*_PENDING_COLS)
            )
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
