"""Freshness-driven recrawl scheduling (Cho & Garcia-Molina 2003).

The recrawl half of frontier ordering: given the CAPTURE HISTORY of each
URL (multiple (warc_ts, content-digest) observations — exactly what the
CDX index stores, sources/cdx.py), estimate each page's change rate and
derive when to fetch it next. The reference crawls a fixed catalog on a
cron cadence; a web-scale frontier instead budgets re-fetches by expected
staleness — hot pages (listings that update daily) come back quickly,
static pages fall to the max interval.

Estimator: the Cho/Garcia-Molina bias-corrected Poisson rate from
change-detection samples,

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / avg_interval

with n = observation intervals, X = intervals whose digest changed —
the naive X/(n*avg_interval) underestimates because multiple changes
inside one interval are observed as one; the log form corrects it.
Next fetch = last capture + clamp(1/lambda_hat, min, max).

One shuffle on url_canon (window + groupBy share the partitioning);
everything else is codegen arithmetic. SQL-expressible — the DuckDB twin
(`recrawl_schedule` oracle) mirrors it operation for operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_MIN_INTERVAL_S = 3600          # never refetch faster than hourly
DEFAULT_MAX_INTERVAL_S = 30 * 86400    # never wait longer than 30 days


def recrawl_stats(
    captures: DataFrame,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-URL SUFFICIENT STATISTICS of the estimator — everything the
    closed form needs, in O(urls) state: (url, n_captures, n_changes,
    first_ts, last_ts, first_digest, last_digest). The boundary digests
    make the stats MERGEABLE: a later crawl wave's stats combine with
    these without rescanning history (``merge_recrawl_stats``).

    One exchange: the lag window and the aggregate key on the same
    column (pinned in test_plans)."""
    w = W.partitionBy(url_col).orderBy(ts_col, digest_col)
    prev = F.lag(F.col(digest_col)).over(w)
    chg = F.when(
        prev.isNotNull()
        & F.col(digest_col).isNotNull()
        & (F.col(digest_col) != prev),
        1,
    ).otherwise(0)
    cap = F.struct(
        F.unix_timestamp(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    )
    return (
        captures.select(
            F.col(url_col), cap.alias("cap"), chg.alias("chg")
        )
        .groupBy(url_col)
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.sum("chg").alias("n_changes"),
            F.min("cap").getField("ts").alias("first_ts"),
            F.max("cap").getField("ts").alias("last_ts"),
            F.min("cap").getField("digest").alias("first_digest"),
            F.max("cap").getField("digest").alias("last_digest"),
        )
        .withColumnRenamed(url_col, "url")
    )


def merge_recrawl_stats(
    old: DataFrame, new_captures_stats: DataFrame
) -> DataFrame:
    """O(delta) incremental update: combine committed per-URL stats with
    the stats of a NEWER capture batch (``recrawl_stats`` of the new
    wave). Contract: every new capture is at or after the URL's old
    ``last_ts`` (crawl waves are time-ordered) — then

        merged ≡ recrawl_stats(old captures ∪ new captures)

    exactly (property-pinned in tests): counts add, the boundary change
    (old last digest vs new first digest, null-safe like the lag window)
    joins the change counts, and the time span extends. URLs seen on
    only one side pass through. One full-outer join on the url — no
    history rescan at any corpus size."""
    o = old.select(
        "url",
        F.col("n_captures").alias("o_n"),
        F.col("n_changes").alias("o_x"),
        F.col("first_ts").alias("o_first"),
        F.col("last_ts").alias("o_last"),
        F.col("first_digest").alias("o_fd"),
        F.col("last_digest").alias("o_ld"),
    )
    n = new_captures_stats.select(
        "url",
        F.col("n_captures").alias("n_n"),
        F.col("n_changes").alias("n_x"),
        F.col("first_ts").alias("n_first"),
        F.col("last_ts").alias("n_last"),
        F.col("first_digest").alias("n_fd"),
        F.col("last_digest").alias("n_ld"),
    )
    both = F.col("o_n").isNotNull() & F.col("n_n").isNotNull()
    boundary = F.when(
        both
        & F.col("o_ld").isNotNull()
        & F.col("n_fd").isNotNull()
        & (F.col("o_ld") != F.col("n_fd")),
        1,
    ).otherwise(0)
    return o.join(n, "url", "full").select(
        "url",
        (
            F.coalesce("o_n", F.lit(0)) + F.coalesce("n_n", F.lit(0))
        ).alias("n_captures"),
        (
            F.coalesce("o_x", F.lit(0))
            + F.coalesce("n_x", F.lit(0))
            + boundary
        ).alias("n_changes"),
        F.coalesce("o_first", "n_first").alias("first_ts"),
        F.coalesce("n_last", "o_last").alias("last_ts"),
        # presence-conditioned, NOT coalesce: a legitimately NULL digest
        # (NULL body) on the present side must not fall through to the
        # other side's value
        F.when(F.col("o_n").isNotNull(), F.col("o_fd"))
        .otherwise(F.col("n_fd"))
        .alias("first_digest"),
        F.when(F.col("n_n").isNotNull(), F.col("n_ld"))
        .otherwise(F.col("o_ld"))
        .alias("last_digest"),
    )


def schedule_from_stats(
    stats: DataFrame,
    min_interval_s: int = DEFAULT_MIN_INTERVAL_S,
    max_interval_s: int = DEFAULT_MAX_INTERVAL_S,
) -> DataFrame:
    """The Cho/Garcia-Molina closed form over the sufficient statistics
    — THE single definition of the schedule math (``recrawl_schedule``
    composes it; streaming/recrawl.py mirrors it scalar-for-scalar)."""
    n_int = (F.col("n_captures") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    avg_int = F.when(
        n_int > 0, (F.col("last_ts") - F.col("first_ts")) / n_int
    )
    lam_s = F.when(
        (n_int > 0) & (avg_int > 0),
        -F.log((n_int - x + F.lit(0.5)) / (n_int + F.lit(0.5))) / avg_int,
    )
    interval = F.when(
        lam_s > 0,
        F.least(
            F.greatest(F.lit(1.0) / lam_s, F.lit(float(min_interval_s))),
            F.lit(float(max_interval_s)),
        ),
    ).otherwise(F.lit(float(max_interval_s)))
    return stats.select(
        "url",
        "n_captures",
        "n_changes",
        avg_int.alias("avg_interval_s"),
        (lam_s * F.lit(86400.0)).alias("lambda_per_day"),
        interval.alias("refetch_interval_s"),
        (F.col("last_ts") + F.floor(interval)).alias("next_fetch_epoch"),
    )


def recrawl_schedule(
    captures: DataFrame,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    min_interval_s: int = DEFAULT_MIN_INTERVAL_S,
    max_interval_s: int = DEFAULT_MAX_INTERVAL_S,
) -> DataFrame:
    """Per URL: capture counts, change-rate estimate, next fetch time.

    Output columns: url, n_captures, n_changes, avg_interval_s (observed
    span / intervals, NULL for single captures), lambda_per_day (the CGM
    estimate, NULL when unestimable), refetch_interval_s (clamped; the
    max interval when the page never changed or has one capture),
    next_fetch_epoch (last capture + interval, integer seconds).

    Composition: ``schedule_from_stats(recrawl_stats(captures))`` — the
    stats aggregate is one exchange; the closed form is codegen
    arithmetic. For O(delta) maintenance across crawl waves keep the
    stats table and ``merge_recrawl_stats`` instead of recomputing.

    Scale: the lag window and the per-URL aggregate both key on
    ``url_col`` — AQE coalesces them into one exchange; state per URL is
    a handful of longs, so 10^10 URLs is a routine compact-key agg.
    """
    return schedule_from_stats(
        recrawl_stats(captures, url_col, ts_col, digest_col),
        min_interval_s=min_interval_s,
        max_interval_s=max_interval_s,
    )


def due_for_refetch(
    schedule: DataFrame, now_epoch: int, priority: int = 1
) -> DataFrame:
    """Frontier seed rows for every URL whose next fetch time has passed
    — plugs straight into ``CrawlEngine.run`` as a seeds frame (the
    engine re-derives url columns). A pure filter + projection."""
    return schedule.filter(F.col("next_fetch_epoch") <= now_epoch).select(
        F.col("url"), F.lit(priority).alias("priority")
    )
