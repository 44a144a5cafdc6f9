"""Sitemap discovery — robots.txt ``Sitemap:`` lines → frontier seeds.

The reference bootstraps its crawl from a hand-maintained seed list
(/root/reference/src/orchestrators/agency.py:34-66). Real web crawls also
bootstrap from sitemaps: RFC 9309 §2.3 / sitemaps.org allow any number of
global ``Sitemap: <url>`` lines in robots.txt (outside user-agent groups),
each pointing at an XML document whose ``<loc>`` entries enumerate the
host's canonical URLs.

In this engine the stored pages table IS the fetch source, so "fetching"
a sitemap is a join of the sitemap URLs against the corpus on the
canonical url hash — the same no-html-shuffle fetch discipline as the
crawl itself (frontier/crawl.py): the tiny discovered-URL side shuffles,
the page bodies never do, and nothing forces a broadcast (one sitemap
index per host is small, but AQE decides).

Everything is JVM regex/explode/join — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import canonicalize_url, url_hash


def sitemap_urls(robots_txt: Column) -> Column:
    """array<string> of ``Sitemap:`` targets in a robots.txt body.

    Per sitemaps.org the field is case-insensitive and global (valid
    anywhere in the file, not scoped to a user-agent group); inline
    comments are stripped like any other robots line.
    """
    no_comment = F.regexp_replace(robots_txt, "(?m)[ \\t]*#.*$", "")
    return F.regexp_extract_all(
        no_comment, F.lit("(?im)^\\s*Sitemap\\s*:\\s*(\\S+)\\s*$"), 1
    )


def sitemap_locs(xml: Column) -> Column:
    """array<string> of ``<loc>`` values in a sitemap/sitemap-index XML
    body (whitespace inside the element trimmed, tags case-insensitive)."""
    return F.regexp_extract_all(
        xml, F.lit("(?is)<loc>\\s*(.*?)\\s*</loc>"), 1
    )


def discover_sitemap_seeds(
    robots_bodies: DataFrame,
    pages: DataFrame,
    priority: int = 1,
    max_index_depth: int = 1,
    url_col: str = "url",
    body_col: str = "text",
) -> DataFrame:
    """``(host, robots_txt)`` + stored pages → seed list ``(url, priority)``.

    Steps, each a distributed DataFrame op:
    1. explode every robots body's ``Sitemap:`` lines;
    2. "fetch" each sitemap document by joining its canonical url hash
       against the pages table (a sitemap URL with no stored page is
       silently skipped, like a 404);
    3. parse + explode the ``<loc>`` entries;
    4. if an entry is itself a sitemap (a sitemap-index child, detected by
       the fetched body containing ``<sitemapindex``), repeat once per
       ``max_index_depth`` — the loop is driver-side over a BOUNDED,
       user-chosen constant (index nesting, in practice 1), never over
       data;
    5. distinct canonical targets become seeds at ``priority``.

    Returned schema is exactly the crawl seed contract ``(url, priority)``
    so callers can ``seeds.unionByName(discover_sitemap_seeds(...))``
    straight into ``CrawlEngine.run``.
    """
    fetchable = pages.select(
        url_hash(canonicalize_url(F.col(url_col))).alias("_h"),
        F.col(body_col).alias("_body"),
    )

    def fetch(urls: DataFrame) -> DataFrame:
        # urls: (_u) — canonical-ish sitemap/loc targets
        return urls.select(
            url_hash(canonicalize_url(F.col("_u"))).alias("_h"),
            F.col("_u"),
        ).join(fetchable, "_h").select("_u", "_body")

    sm = robots_bodies.select(
        F.explode(sitemap_urls(F.col("robots_txt"))).alias("_u")
    ).distinct()

    leaves = None
    frontier = fetch(sm)
    for _ in range(max_index_depth + 1):
        is_index = F.lower(F.col("_body")).contains("<sitemapindex")
        leaf_locs = (
            frontier.filter(~is_index)
            .select(F.explode(sitemap_locs(F.col("_body"))).alias("_u"))
        )
        leaves = leaf_locs if leaves is None else leaves.unionByName(leaf_locs)
        child = frontier.filter(is_index).select(
            F.explode(sitemap_locs(F.col("_body"))).alias("_u")
        ).distinct()
        frontier = fetch(child)

    return (
        leaves.distinct()
        .select(
            F.col("_u").alias("url"),
            F.lit(priority).cast("int").alias("priority"),
        )
    )


def sitemap_entries(xml: Column) -> Column:
    """array<struct<loc, lastmod, changefreq, sm_priority>> of a
    sitemap's ``<url>`` entries — the sitemaps.org optional fields ride
    along so freshness decisions can use the SITE's own claims:
    ``<lastmod>`` (W3C datetime), ``<changefreq>`` (lower-cased
    keyword), ``<priority>`` (0.0–1.0, NULL when absent or junk via
    try_cast). Absent elements yield NULL. Pure regex HOFs."""
    blocks = F.regexp_extract_all(
        xml, F.lit("(?is)<url>(.*?)</url>"), 1
    )

    def field(b: Column, tag: str) -> Column:
        return F.nullif(
            F.regexp_extract(
                b, f"(?is)<{tag}>\\s*(.*?)\\s*</{tag}>", 1
            ),
            F.lit(""),
        )

    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(
                b, "(?is)<loc>\\s*(.*?)\\s*</loc>", 1
            ).alias("loc"),
            field(b, "lastmod").alias("lastmod"),
            F.lower(field(b, "changefreq")).alias("changefreq"),
            field(b, "priority").try_cast("double").alias("sm_priority"),
        ),
    )


# sitemaps.org <changefreq> keyword → seconds. "always" floors at an
# hour (a crawler that refetches tighter than hourly on a free-text
# claim is a DoS); "never" carries NO interval — it means archived, so
# it must never TIGHTEN a schedule, and loosening is the estimator's
# call, not the site's.
CHANGEFREQ_INTERVAL_S = {
    "always": 3600,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
}


def changefreq_interval(changefreq: Column) -> Column:
    """Keyword → claimed interval seconds (double); NULL for never /
    unknown / absent."""
    expr = F.lit(None).cast("double")
    for kw, secs in CHANGEFREQ_INTERVAL_S.items():
        expr = F.when(changefreq == kw, F.lit(float(secs))).otherwise(expr)
    return expr


def apply_sitemap_hints(
    schedule: DataFrame,
    sitemap_docs: DataFrame,
    min_interval_s: int = 3600,
    body_col: str = "_body",
) -> DataFrame:
    """Tighten the CGM schedule with the site's own ``<changefreq>``
    claims: a URL whose sitemap claims e.g. ``daily`` is refetched at
    least daily — ``least(cgm_interval, claimed_interval)``, floored at
    ``min_interval_s`` (politeness beats any claim). Claims can only
    TIGHTEN: a site claiming ``yearly`` on a page we MEASURED changing
    hourly keeps the measured schedule (sites understate change to
    save crawl budget; the estimator's evidence wins on that side),
    and ``never``/junk claims change nothing. Multiple entries for one
    URL take the most urgent claim (min interval, max sm_priority).

    Output = the schedule with ``refetch_interval_s`` /
    ``next_fetch_epoch`` rewritten (epoch re-anchored on the same last
    capture: old epoch − old floor(interval) + new floor(interval))
    plus ``hint_interval_s`` and ``sm_priority`` for audit.

    One explode + one url-keyed claim agg + one equi-join — the claim
    side is O(sitemap entries), the corpus never rescans."""
    claims = (
        sitemap_docs.select(
            F.explode(sitemap_entries(F.col(body_col))).alias("e")
        )
        .select(
            canonicalize_url(F.col("e.loc")).alias("url"),
            changefreq_interval(F.col("e.changefreq")).alias("hint"),
            F.col("e.sm_priority").alias("smp"),
        )
        .groupBy("url")
        .agg(
            F.min("hint").alias("hint_interval_s"),
            F.max("smp").alias("sm_priority"),
        )
    )
    joined = schedule.join(claims, "url", "left")
    new_interval = F.when(
        F.col("hint_interval_s").isNotNull(),
        F.greatest(
            F.least(F.col("refetch_interval_s"), F.col("hint_interval_s")),
            F.lit(float(min_interval_s)),
        ),
    ).otherwise(F.col("refetch_interval_s"))
    keep = [
        c
        for c in schedule.columns
        if c not in ("refetch_interval_s", "next_fetch_epoch")
    ]
    return joined.select(
        *keep,
        new_interval.alias("refetch_interval_s"),
        (
            F.col("next_fetch_epoch")
            - F.floor("refetch_interval_s").cast("long")
            + F.floor(new_interval).cast("long")
        ).alias("next_fetch_epoch"),
        "hint_interval_s",
        "sm_priority",
    )


def lastmod_due_seeds(
    sitemap_docs: DataFrame,
    schedule: DataFrame,
    priority: int = 0,
    body_col: str = "_body",
) -> DataFrame:
    """Freshness short-circuit: URLs whose sitemap ``<lastmod>`` claims a
    change AFTER our last capture are due NOW, regardless of the CGM
    interval — the site told us it changed (the crawl trusts but
    verifies: the fetch's digest feeds the next schedule, so a lying
    lastmod raises that host's observed stability and future claims
    still cost only one fetch).

    ``schedule`` is ``recrawl_schedule``/``schedule_from_stats`` output;
    the join keys on the canonical URL. Output = the crawl's
    ``(url, priority)`` seed contract."""
    claims = (
        sitemap_docs.select(
            F.explode(sitemap_entries(F.col(body_col))).alias("e")
        )
        .select(
            canonicalize_url(F.col("e.loc")).alias("url"),
            F.unix_timestamp(
                F.try_to_timestamp(F.col("e.lastmod"))
            ).alias("claimed_ts"),
        )
        .filter(F.col("claimed_ts").isNotNull())
        .groupBy("url")
        .agg(F.max("claimed_ts").alias("claimed_ts"))
    )
    last_seen = schedule.select(
        "url",
        (
            F.col("next_fetch_epoch")
            - F.floor("refetch_interval_s").cast("long")
        ).alias("last_capture_ts"),
    )
    return (
        claims.join(last_seen, "url", "inner")
        .filter(F.col("claimed_ts") > F.col("last_capture_ts"))
        .select("url", F.lit(priority).cast("int").alias("priority"))
    )
