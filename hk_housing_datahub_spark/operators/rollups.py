"""Aggregation / window parity operators (SURVEY.md §2.5–2.6).

Each function is a pure DataFrame→DataFrame transform, built only from
JVM-side expressions; each has a DuckDB oracle twin in __spark_entry__.

Double-typed aggregates are rounded (documented per function) so the
oracle's value-hash comparison is stable under floating-point summation
order, which differs across engines and partitionings by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def monthly_rollup(orders: DataFrame) -> DataFrame:
    """Per (customer, month) pre-aggregated market metrics.

    Computes what the reference *downloads* pre-aggregated
    (estate_monthly_market_info, /root/reference/src/models/agency/sql_db.py:105-125:
    16 avg/min/max/count/sum metrics per estate-month). Partial aggregation
    (map-side combine) makes this one shuffle keyed on the group — at 100 TB
    the combine reduces shuffle bytes by ~|group cardinality|/|rows|.
    """
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"), month)
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.round(F.sum("o_totalprice"), 2).alias("total_amount"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def latest_per_group(
    df: DataFrame, key: str, order_col: str, tiebreak: str
) -> DataFrame:
    """Top-1-per-key by descending order_col.

    Rebuild of keep_latest_transaction_only
    (/root/reference/src/processors/agency/buildings.py:101-104). A ranking
    window with row_number — Catalyst evaluates it with a single partial
    sort inside each hash partition of `key`; no global sort.
    """
    w = W.partitionBy(key).orderBy(F.col(order_col).desc(), F.col(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def last_non_null_fold(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per key: the last non-null value of each column in event-time order.

    Rebuild of the renovation fold
    (/root/reference/src/processors/agency/buildings.py:100-128: walk
    transactions oldest→newest, keep overwriting bedroom/sitting_room when
    non-null) via ``last(col, ignorenulls=True)`` over an ordered window,
    reduced to one row per key.

    ``tiebreak_cols`` must make (ts_col, *tiebreak_cols) a total order per
    key wherever values can collide on ts_col — without it, equal timestamps
    make "last" partition-order-dependent (nondeterministic across runs).
    """
    w = (
        W.partitionBy(key)
        .orderBy(ts_col, *(tiebreak_cols or []))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    folded = df.select(
        key,
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"last_{c}")
            for c in value_cols
        ],
    )
    return folded.dropDuplicates([key])


def topk_per_group(
    df: DataFrame, key: str, order_col: str, tiebreak: str, k: int
) -> DataFrame:
    """Top-k rows per key (W5 analog: top-k similarity results,
    /root/reference/src/processors/rag/embedding.py:290-307)."""
    w = W.partitionBy(key).orderBy(F.col(order_col).desc(), F.col(tiebreak))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def group_concat_sorted(df: DataFrame, key: str, val: str) -> DataFrame:
    """Sorted comma-joined values per key (A7: comma-joined id batches,
    /root/reference/src/crawlers/agency/estates.py:106-107). Sorting inside
    the array makes the result order-insensitive → oracle-comparable."""
    return df.groupBy(key).agg(
        F.array_join(F.array_sort(F.collect_list(F.col(val).cast("string"))), ",")
        .alias("joined"),
        F.count(F.lit(1)).alias("n"),
    )


def sessionize(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: new session when the inter-event gap exceeds
    the threshold; returns per-session start/end/count. lag + running sum of
    boundary flags — two window passes over one shuffle on user."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    # Parquet timestamps may load as TIMESTAMP_NTZ; normalize before epoch math.
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    flagged = events.withColumn(
        "_new",
        F.when(epoch - F.lag(epoch).over(w) > gap_s, 1).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return flagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def tumbling_counts(
    events: DataFrame, ts_col: str = "ts", by: str = "event_type",
    width: str = "hour",
) -> DataFrame:
    """Batch twin of the streaming windowed aggregation (streaming/events.py):
    count + rounded sum per (type, window)."""
    return (
        events.groupBy(by, F.date_trunc(width, F.col(ts_col)).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def allocation_fairness(
    df: DataFrame, key_col: str, weight_col: str | None = None,
    bands: int = 64,
) -> DataFrame:
    """One-row fairness audit of how a resource (URLs fetched, bytes,
    budget) is spread across keys (hosts, domains): Gini coefficient,
    top-1/top-10 share, and the count — the crawl-ops dashboard numbers
    that catch a frontier quietly collapsing onto a handful of hosts.

    Gini over the per-key totals x_(1) ≤ … ≤ x_(n):

        G = (2·Σ i·x_(i)) / (n·Σ x) − (n + 1)/n

    Plan shape: ONE map-side-combined groupBy(key) reduces the corpus
    to per-key totals (|keys| rows — hosts, not URLs); the ascending
    rank i over those totals is the BANDED two-phase rank
    (operators/banded.py: quantile bands → per-band window → bounded
    broadcast offsets), so even a 10^8-key table never sorts in one
    partition — Σ i·x decomposes over bands exactly because the banded
    rank IS the global rank. The top-1/top-10 shares reuse the same
    ranks from the high end (i > n−10) instead of a second descending
    window. Ranking ties break on the key so the rank assignment is
    total; Σ i·x is invariant under permutations WITHIN a tied total
    (same x), so the Gini is exact and engine-portable. Output floats
    round to 6. Weights are COUNT-like (URLs, bytes — integral):
    ``n_keys``/``total`` report as longs.
    """
    from .banded import banded_global_rank

    w = F.col(weight_col) if weight_col else F.lit(1)
    per = df.groupBy(F.col(key_col).alias("k")).agg(
        F.sum(w).alias("x")
    )
    ranked = banded_global_rank(
        per, "x", ["k"], descending=False, bands=bands, rank_col="i"
    )
    n = F.max("i")
    tot = F.sum("x")
    # Σ i·x and n·Σx overflow 64-bit longs at web scale (10^8 keys ×
    # 10^12 bytes ≈ 10^20 > 2^63, and Spark's non-ANSI long arithmetic
    # wraps SILENTLY); accumulate the rank-weighted sum in double —
    # the Gini rounds to 6, and the DuckDB twin uses the same type so
    # parity holds.
    base = ranked.agg(
        n.alias("n_keys"),
        tot.alias("total"),
        F.sum(F.col("i") * F.col("x").cast("double")).alias("ix"),
    )
    nrow = F.broadcast(base.select(F.col("n_keys").alias("_nk")))
    tops = ranked.crossJoin(nrow).agg(
        F.sum(F.when(F.col("i") == F.col("_nk"), F.col("x"))).alias("t1"),
        F.sum(
            F.when(F.col("i") > F.col("_nk") - 10, F.col("x"))
        ).alias("t10"),
    )
    return (
        base.crossJoin(tops)
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("total").cast("long").alias("total"),
            F.round(
                (F.lit(2.0) * F.col("ix"))
                / (F.col("n_keys").cast("double") * F.col("total"))
                - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"),
                6,
            ).alias("gini"),
            F.round(F.col("t1") / F.col("total"), 6).alias("top1_share"),
            F.round(F.col("t10") / F.col("total"), 6).alias("top10_share"),
        )
    )
