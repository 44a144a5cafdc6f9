"""Per-host politeness scheduler — rank-and-cut window.

Replaces the reference's hard-coded inter-request sleeps
(/root/reference/src/crawlers/agency/estates.py:74 0.25 s/page,
/root/reference/src/orchestrators/agency.py:139,171 and
crawlers/agency/buildings.py:34 0.1 s/request) with a *declarative* per-host
per-wave budget: a wave models a fixed wall-clock slice, each host may
receive at most ``floor(wave_ms / crawl_delay_ms)`` requests in it, and the
requests chosen are the best-ranked by the deterministic total order
``(priority, discovered_ts, url_canon)``.

The total order is the key trick for reproducing the sequential reference's
crawl ordering under arbitrary parallelism: ordering is *defined by the
scheduler*, never by task arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_CRAWL_DELAY_MS = 100
DEFAULT_WAVE_MS = 1_000

# Frontier schema: url_canon, host, url_hash, bucket, priority, discovered_ts,
# depth (+ attempt for retry bookkeeping).


def _url_path(url_canon, keep_query: bool = False) -> "F.Column":
    """URL → the string robots rules match against. RFC 9309 matching
    operates on path + query (``keep_query=True``, the rules-list gate:
    a ``Disallow: /*?print=*`` must be able to match); the legacy
    path_prefix schema has always matched the bare path."""
    no_authority = F.regexp_replace(url_canon, "^[a-z]+://[^/]*", "")
    if keep_query:
        return no_authority
    return F.regexp_replace(no_authority, "\\?.*$", "")


def apply_robots(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop disallowed urls; attach crawl_delay_ms (default when no rule).

    Two rule schemas are accepted, detected by column name:

    - RFC 9309 rule lists (``allow_paths``/``disallow_paths`` arrays, from
      ``functions.robots.parse_robots_rules``): per-URL longest-match
      allow/deny precedence with ``*``/``$`` rule wildcards
      (``robots_permits``), evaluated as a higher-order fold over each
      host's small rule array.
    - the coarse (``allow``, ``path_prefix``) schema: host-level disallow
      plus one allowed prefix.

    Either way the robots table is a small dimension → broadcast join, no
    shuffle of the frontier side, and the gate is a codegen'd filter.
    """
    if robots is None:
        return frontier.withColumn(
            "crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)
        )
    if "disallow_paths" in robots.columns:
        from ..functions.robots import robots_permits

        r = robots.select(
            "host", "allow_paths", "disallow_paths", "crawl_delay_ms"
        )
        joined = frontier.join(F.broadcast(r), "host", "left")
        allowed = F.col("disallow_paths").isNull() | robots_permits(
            _url_path(F.col("url_canon"), keep_query=True),
            F.col("allow_paths"),
            F.col("disallow_paths"),
        )
        return (
            joined.filter(allowed)
            .withColumn(
                "crawl_delay_ms",
                F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
            )
            .drop("allow_paths", "disallow_paths")
        )
    r = robots.select("host", "allow", "path_prefix", "crawl_delay_ms")
    joined = frontier.join(F.broadcast(r), "host", "left")
    allowed = (
        F.col("allow").isNull()
        | (
            F.col("allow")
            & _url_path(F.col("url_canon")).startswith(
                F.coalesce("path_prefix", F.lit(""))
            )
        )
    )
    return (
        joined.filter(allowed)
        .withColumn(
            "crawl_delay_ms",
            F.coalesce("crawl_delay_ms", F.lit(DEFAULT_CRAWL_DELAY_MS)),
        )
        .drop("allow", "path_prefix")
    )


def schedule_wave(
    frontier: DataFrame,
    robots: DataFrame | None = None,
    wave_ms: int = DEFAULT_WAVE_MS,
    salt_buckets: int = 0,
) -> DataFrame:
    """Rank-and-cut: per-host window, keep row_number ≤ budget(host).

    Returns the frontier columns + ``host_rank`` (1-based issue order within
    the host for this wave) and ``scheduled`` (boolean). Unscheduled rows stay
    in the frontier for the next wave (the politeness backlog).

    The per-host window shuffle keys on host and is therefore Zipf-skewed by
    construction. Two execution strategies, identical results:

    - ``salt_buckets=0`` (default): one ``row_number`` pass per host. Fine
      when per-host frontiers fit a task.
    - ``salt_buckets=S>1``: **two-phase rank-and-cut** for 10^10-URL
      frontiers where one hot host may hold a large share of all pending
      urls. Phase 1 ranks within ``(host, url_hash % S)`` sub-partitions and
      pre-cuts to the budget — a row ranked > budget inside ANY sub-partition
      cannot be in the host's true top-budget (the sub-partition alone
      already supplies `budget` better rows). Phase 2 re-ranks only the
      ≤ S×budget survivors per host. The big sort is now bounded by
      S×budget rows per host regardless of frontier size; the hot host's
      pending mass sorts in S parallel tasks instead of one.

    Scheduled rows carry the same (host, host_rank) in both strategies;
    unscheduled rows carry host_rank NULL under two-phase (their rank is
    never consumed — the backlog keeps frontier columns only).
    """
    f = apply_robots(frontier, robots)
    order = [F.col("priority"), F.col("discovered_ts"), F.col("url_canon")]
    budget = F.greatest(
        F.lit(1), F.floor(F.lit(wave_ms) / F.col("crawl_delay_ms"))
    )
    if salt_buckets > 1:
        w1 = W.partitionBy(
            "host", F.pmod("url_hash", F.lit(salt_buckets))
        ).orderBy(*order)
        pre = f.withColumn("_r1", F.row_number().over(w1)).withColumn(
            "_budget", budget
        )
        survivors = pre.filter(F.col("_r1") <= F.col("_budget"))
        w2 = W.partitionBy("host").orderBy(*order)
        ranked = (
            survivors.withColumn("host_rank", F.row_number().over(w2))
            .withColumn("scheduled", F.col("host_rank") <= F.col("_budget"))
        )
        precut = (
            pre.filter(F.col("_r1") > F.col("_budget"))
            .withColumn("host_rank", F.lit(None).cast("int"))
            .withColumn("scheduled", F.lit(False))
        )
        return ranked.unionByName(precut).drop(
            "_r1", "_budget", "crawl_delay_ms"
        )
    w = W.partitionBy("host").orderBy(*order)
    return (
        f.withColumn("host_rank", F.row_number().over(w))
        .withColumn("scheduled", F.col("host_rank") <= budget)
        .drop("crawl_delay_ms")
    )


def apply_domain_budget(
    ranked: DataFrame,
    max_per_domain: int,
    url_col: str = "url_canon",
) -> DataFrame:
    """Second politeness tier over a ``schedule_wave`` result: keep at
    most ``max_per_domain`` scheduled rows per REGISTRABLE DOMAIN
    (eTLD+1) per wave. Per-host budgets alone are gameable — a
    registrant spinning up 500 subdomains takes 500× one host's budget;
    the reference never meets this (one portal, one host), a web-scale
    frontier meets it in its first crawl of a subdomain farm.

    Rows cut by the tier flip ``scheduled`` to false and stay in the
    backlog exactly like host-budget overflow; ``host_rank`` is left
    describing the host tier. In-domain order is the scheduler's own
    total order (priority, discovered_ts, url_canon), so the domain cut
    keeps each domain's globally-best rows and ties across sibling
    hosts break deterministically.

    ONE window keyed on (domain, scheduled) — a compact key; ranking
    the unscheduled backlog rows "among themselves" is harmless and
    avoids a filter-union round trip. Composable AFTER either
    schedule_wave strategy (plain or two-phase salted)."""
    from ..functions.surt import registrable_domain

    dom = registrable_domain(F.col(url_col))
    w = W.partitionBy(dom, F.col("scheduled")).orderBy(
        "priority", "discovered_ts", F.col(url_col)
    )
    dr = F.row_number().over(w)
    return ranked.withColumn(
        "scheduled", F.col("scheduled") & (dr <= max_per_domain)
    )
