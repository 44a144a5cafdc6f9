"""Adaptive per-host politeness from observed fetch latency.

The reference hard-codes its inter-request sleeps (0.25 s/page,
/root/reference/src/crawlers/agency/estates.py:74; 0.1 s/request,
/root/reference/src/orchestrators/agency.py:139,171) — fine for one
portal, wrong for 10^6 hosts of wildly different capacity. Production
crawlers derive the delay from the server's own behavior: Heritrix's
``delayFactor`` (delay = factor × last fetch duration, clamped to
[minDelayMs, maxDelayMs]) and Nutch's ``fetcher.server.delay`` family.
A slow server signals overload — backing off is both politeness and
self-protection (retries are wasted budget).

This module is the declarative version: one compact-key aggregate over
the fetch log computes each host's delay, and the result merges into
the robots dimension that ``scheduler.schedule_wave`` already consumes
— the adaptive signal and the site's crawl-delay directive compose as
``greatest`` (whichever asks for MORE politeness wins).

Scale shape: the fetch log aggregate keys on host (compact key,
map-side combine); the output is one row per OBSERVED host — a
dimension, broadcast by AQE into the robots join. Latencies are integer
ms so the per-host sum is exact (order-independent) and the DuckDB
oracle replays it bit-for-bit; the only float ops are one multiply and
the clamp, identical IEEE in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scheduler import DEFAULT_CRAWL_DELAY_MS


def adaptive_crawl_delay(
    fetch_log: DataFrame,
    delay_factor: float = 2.0,
    min_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
    max_delay_ms: int = 5_000,
    host_col: str = "host",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Per-host ``crawl_delay_ms = floor(clamp(factor × mean latency))``.

    The mean (not the max) over the caller's log window: one slow
    outlier should not freeze a healthy host, but a consistently slow
    server backs the crawler off proportionally (Heritrix semantics
    with a window instead of last-sample jitter). Callers choose the
    window by what they pass — typically the previous wave's fetches.

    Output: (host, n_fetches, avg_latency_ms, crawl_delay_ms) — one
    exchange, map-side combined.
    """
    lat = F.col(latency_col).cast("long")
    avg_ms = F.sum(lat) / F.count(lat)
    raw = F.lit(float(delay_factor)) * avg_ms
    clamped = F.least(
        F.greatest(raw, F.lit(float(min_delay_ms))),
        F.lit(float(max_delay_ms)),
    )
    return fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count(lat).alias("n_fetches"),
        avg_ms.alias("avg_latency_ms"),
        F.floor(clamped).alias("crawl_delay_ms"),
    )


def merge_crawl_delays(
    robots: DataFrame | None,
    adaptive: DataFrame,
) -> DataFrame:
    """Compose the site's robots directive with the adaptive signal into
    the robots-shaped dimension ``schedule_wave`` consumes.

    Precedence: ``greatest(robots crawl_delay_ms, adaptive delay)`` —
    a robots ``Crawl-delay`` is a floor the site asked for, the
    adaptive delay is a floor the server's health demands; honoring
    both means taking the max. Hosts seen only in the fetch log get
    their adaptive delay with NULL rule arrays (= everything allowed,
    exactly ``apply_robots``'s no-rules semantics); hosts with robots
    but no observations keep their directive.

    Full outer join on host — both sides are dimensions (per-HOST
    rows); the frontier fact side never touches this exchange.
    """
    a = adaptive.select("host", F.col("crawl_delay_ms").alias("_adaptive_ms"))
    if robots is None:
        return a.select(
            "host",
            F.col("_adaptive_ms").cast("int").alias("crawl_delay_ms"),
        )
    merged = robots.join(a, "host", "full_outer")
    eff = F.greatest(
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)),
        F.coalesce(F.col("_adaptive_ms"), F.lit(0)),
    )
    keep = [c for c in robots.columns if c != "crawl_delay_ms"]
    return merged.select(
        *keep, eff.cast("int").alias("crawl_delay_ms")
    )
