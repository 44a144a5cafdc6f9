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

    Scale: the lag window and the per-URL aggregate both key on
    ``url_col`` — AQE coalesces them into one exchange; state per URL is
    a handful of longs, so 10^10 URLs is a routine compact-key agg.
    """
    w = W.partitionBy(url_col).orderBy(ts_col, digest_col)
    prev = F.lag(F.col(digest_col)).over(w)
    chg = F.when(
        prev.isNotNull() & (F.col(digest_col) != prev), 1
    ).otherwise(0)
    # group on the ORIGINAL column (renamed only after the agg): aliasing
    # before the groupBy makes Catalyst treat the key as a new attribute
    # and re-shuffle what the window already partitioned — keeping the
    # identity collapses the plan to one exchange (pinned in test_plans)
    per = (
        captures.select(
            F.col(url_col),
            F.unix_timestamp(ts_col).alias("ts"),
            chg.alias("chg"),
        )
        .groupBy(url_col)
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.sum("chg").alias("n_changes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
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
    return per.select(
        F.col(url_col).alias("url"),
        "n_captures",
        "n_changes",
        avg_int.alias("avg_interval_s"),
        (lam_s * F.lit(86400.0)).alias("lambda_per_day"),
        interval.alias("refetch_interval_s"),
        (F.col("last_ts") + F.floor(interval)).alias("next_fetch_epoch"),
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
