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


# ---------------------------------------------------------------------------
# HTTP conditional revalidation (RFC 9110 §13.1 / RFC 7232)
# ---------------------------------------------------------------------------
#
# The cheap half of recrawling: a page whose server sent an ETag or
# Last-Modified can be REVALIDATED (If-None-Match / If-Modified-Since →
# 304, zero body bytes) instead of refetched. At web scale most recrawls
# hit unchanged pages, so the 304 path is the dominant fetch class — and
# every 304 is still a change-rate OBSERVATION (digest provably unchanged)
# that feeds recrawl_stats and becomes a WARC ``revisit`` record
# (sources/warc.py) without moving the body at all. The reference refetches
# its catalog unconditionally on a cron (/root/reference/src/orchestrators/
# agency.py) — validators are what make that loop affordable at 10^10 URLs.
#
# Validators are carried as the VERBATIM header strings (RFC 7232: the
# request must echo the exact value, not a reparsed date), so no date
# parsing/formatting enters the plan — everything stays codegen string
# plumbing and is SQL-oracle-checkable.


def latest_validators(
    captures: DataFrame,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Per URL, the newest capture's revalidation state: (url, last_ts,
    last_digest, etag, last_modified). ONE max-struct aggregate (the
    same compact-key shape as ``cdx_latest``) — ties broken by digest
    then validators so the row is deterministic."""
    s = F.struct(
        F.unix_timestamp(F.col(ts_col)).alias("ts"),
        F.col(digest_col).alias("digest"),
        F.col(etag_col).alias("etag"),
        F.col(last_modified_col).alias("lm"),
    )
    top = F.max(s)
    return (
        captures.groupBy(F.col(url_col).alias("url"))
        .agg(top.alias("s"))
        .select(
            "url",
            F.col("s.ts").alias("last_ts"),
            F.col("s.digest").alias("last_digest"),
            F.col("s.etag").alias("etag"),
            F.col("s.lm").alias("last_modified"),
        )
    )


def fetch_plans(
    due: DataFrame,
    latest: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Join the due set (``due_for_refetch`` output, or any (url,
    priority) frame) with per-URL validator state → one fetch plan per
    due URL: ``mode`` = 'conditional' when a validator exists (send the
    echoed ``if_none_match`` / ``if_modified_since`` headers; a 304
    costs headers only) else 'full' (never-crawled or validator-less
    URLs). One equi-join on the url — AQE-sized; the due set is usually
    the small side but is corpus-dependent, so no forced broadcast."""
    lat = latest.select(
        F.col("url").alias("__u"),
        "last_digest", "etag", "last_modified",
    )
    j = due.join(lat, due[url_col] == F.col("__u"), "left")
    has_validator = (
        F.col("etag").isNotNull() | F.col("last_modified").isNotNull()
    )
    return j.select(
        due[url_col].alias("url"),
        *[c for c in due.columns if c != url_col],
        F.when(has_validator, F.lit("conditional"))
        .otherwise(F.lit("full"))
        .alias("mode"),
        F.col("etag").alias("if_none_match"),
        F.col("last_modified").alias("if_modified_since"),
        F.col("last_digest").alias("prior_digest"),
    )


def apply_fetch_results(
    latest: DataFrame,
    responses: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    status_col: str = "status",
    payload_col: str = "payload",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Fold a wave of fetch/revalidation responses back into capture
    rows. Per response row, joined to the URL's prior state:

    - 304 → disposition 'not_modified': a capture row carrying the
      PRIOR digest and validators forward at the new ts (zero body
      bytes moved; feeds recrawl_stats as an unchanged observation and
      warc.classify_revisits as a revisit), ``store_body`` false.
    - 2xx → digest the new payload; disposition 'new' (no prior),
      'unchanged_body' (server skipped 304 but bytes match — still an
      unchanged observation), or 'modified'. ``store_body`` true.
    - anything else (4xx/5xx/timeout NULL) → disposition 'error':
      ``is_capture`` false — errors never enter capture history, so
      they cannot distort the change-rate estimator (a 304 against no
      prior state is a protocol violation and lands here too).

    One left join on url; digesting and classification are codegen.
    Output: (url, epoch, status, disposition, is_capture, store_body,
    digest, etag, last_modified, changed)."""
    lat = latest.select(
        F.col("url").alias("__u"),
        F.col("last_digest").alias("__pd"),
        F.col("etag").alias("__pe"),
        F.col("last_modified").alias("__pl"),
    )
    r = responses.select(
        F.col(url_col).alias("url"),
        F.unix_timestamp(F.col(ts_col)).alias("epoch"),
        F.col(status_col).alias("status"),
        F.col(payload_col).alias("payload"),
        F.col(etag_col).alias("r_etag"),
        F.col(last_modified_col).alias("r_lm"),
    )
    j = r.join(lat, r["url"] == F.col("__u"), "left")
    ok2xx = (F.col("status") >= 200) & (F.col("status") < 300)
    new_digest = F.md5(F.col("payload"))
    not_mod = (F.col("status") == 304) & F.col("__pd").isNotNull()
    disposition = (
        F.when(not_mod, F.lit("not_modified"))
        .when(ok2xx & F.col("__pd").isNull(), F.lit("new"))
        .when(
            ok2xx & (new_digest == F.col("__pd")), F.lit("unchanged_body")
        )
        .when(ok2xx, F.lit("modified"))
        .otherwise(F.lit("error"))
    )
    is_capture = disposition != "error"
    return j.select(
        r["url"],
        "epoch",
        "status",
        disposition.alias("disposition"),
        is_capture.alias("is_capture"),
        (ok2xx & is_capture).alias("store_body"),
        F.when(not_mod, F.col("__pd"))
        .when(ok2xx, new_digest)
        .alias("digest"),
        # a 200 without validators DROPS them (server stopped sending);
        # a 304 keeps the prior pair it revalidated against
        F.when(not_mod, F.col("__pe"))
        .when(ok2xx, F.col("r_etag"))
        .alias("etag"),
        F.when(not_mod, F.col("__pl"))
        .when(ok2xx, F.col("r_lm"))
        .alias("last_modified"),
        F.when(not_mod, F.lit(False))
        .when(ok2xx & F.col("__pd").isNotNull(), new_digest != F.col("__pd"))
        .alias("changed"),
    )
