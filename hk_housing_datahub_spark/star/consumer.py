"""Incrementally-maintained rollup over the transactions append stream.

The downstream-consumer story for the star pipeline: a monthly market
rollup that is maintained from ``TableCatalog.read_changes`` deltas —
O(rollup + delta) per refresh, never a rescan of the transactions table —
with **exactly-once** effect under any crash/replay, because the consumer
cursor is stored INSIDE the rollup rows (``as_of_snapshot``) and replaced
atomically with them: the classic store-offsets-with-the-data pattern.
Whatever snapshot the rollup claims, that is exactly the data it
aggregates; re-running after a crash either sees the old rollup (delta
re-applied from the old cursor) or the new one (no-op).

Re-expresses the reference's monthly market aggregation consumption
(/root/reference/src/processors/agency/estates.py monthly market info →
analytics reads) as an incremental view, the way a 100-TB deployment
would maintain it: the full-recompute twin is the correctness oracle in
tests/test_star.py.

Sums use decimal(18,2): decimal addition is exact and associative, so the
merge of partial aggregates is bit-identical to a full recompute (double
sums would drift by ulps depending on merge order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import TableCatalog

ROLLUP_TABLE = "monthly_tx_rollup"


def _aggregate(tx: DataFrame) -> DataFrame:
    return tx.groupBy(
        F.date_trunc("month", "tx_date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_tx"),
        F.sum(F.col("price").cast("decimal(18,2)")).alias("sum_price"),
    )


def _merge(cur: DataFrame, partial: DataFrame) -> DataFrame:
    """Merge a delta's partial aggregate into the current rollup — exact,
    because counts are integral and sums are decimal."""
    return (
        cur.select("month", "n_tx", "sum_price")
        .unionByName(partial)
        .groupBy("month")
        .agg(
            F.sum("n_tx").alias("n_tx"),
            F.sum("sum_price").cast("decimal(18,2)").alias("sum_price"),
        )
    )


def maintain_monthly_rollup(
    spark: SparkSession, cat: TableCatalog, tx_table: str = "transactions"
) -> int:
    """Refresh ROLLUP_TABLE with the transactions appended since its own
    recorded cursor. Returns the number of delta rows applied (0 = caught
    up; -1 = upstream history was rewritten and the rollup was rebuilt from
    a full scan). Safe to call at any time, any number of times."""
    head = cat.current_snapshot(tx_table)
    try:
        cur = cat.read(ROLLUP_TABLE)
        row = cur.select(F.max("as_of_snapshot")).first()
        as_of = int(row[0]) if row[0] is not None else 0
    except FileNotFoundError:
        cur, as_of = None, 0
    if head <= as_of:
        return 0  # caught up (or a replayed refresh) — no-op
    try:
        delta = cat.read_changes(tx_table, since=as_of, until=head)
    except ValueError:
        # upstream history was rewritten (replace / merge-upsert — e.g. a
        # re-crawl correcting committed listings): the delta stream is no
        # longer append-only, so incremental maintenance is unsound. Rebuild
        # from the rewritten table and re-pin the cursor at its head — the
        # same atomic store-offsets-with-data commit, just O(table) once.
        full = _aggregate(cat.read(tx_table, snapshot=head))
        cat.replace(
            ROLLUP_TABLE,
            full.withColumn("as_of_snapshot", F.lit(head).cast("long")),
        )
        return -1  # signal: rebuilt, not incremental
    delta = delta.persist()
    n_delta = delta.count()
    partial = _aggregate(delta)
    merged = partial if cur is None else _merge(cur, partial)
    cat.replace(
        ROLLUP_TABLE,
        merged.withColumn("as_of_snapshot", F.lit(head).cast("long")),
    )
    delta.unpersist()
    return n_delta


def rollup_vs_full_recompute(
    spark: SparkSession, cat: TableCatalog, tx_table: str = "transactions"
) -> tuple[DataFrame, DataFrame]:
    """(incrementally-maintained rollup, full-recompute twin) — equal
    row-for-row whenever the rollup is caught up (the pytest contract)."""
    inc = cat.read(ROLLUP_TABLE).select("month", "n_tx", "sum_price")
    full = _aggregate(cat.read(tx_table))
    return inc, full
