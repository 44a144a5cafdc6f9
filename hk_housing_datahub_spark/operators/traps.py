"""Crawl-trap detection — per-host URL-space pathology signals.

Spider traps (calendar pages, session-id query strings, cyclic path
aliases like ``/a/b/a/b/…``) inflate a host's URL space without adding
content; at 10^10 frontier URLs they quietly eat the politeness budget.
The reference never meets them (fixed catalog); a web-scale frontier
flags trap-suspect hosts and caps or down-prioritizes them (the
complement of operators/linkgraph.py's promote-good ordering).

``url_trap_features`` is a pure codegen projection per URL;
``host_trap_signals`` is ONE compact-key groupBy per host — both
SQL-expressible (the driver oracle constructs its expectation
analytically). ``flag_trap_hosts`` applies explicit thresholds so the
policy is inspectable, not baked in.

Signals (per host):
- ``urls_per_content`` — URLs ÷ distinct content digests: session-id /
  faceted-navigation explosion duplicates content across URL variants;
- ``avg_depth`` / ``max_depth`` — path-segment depth: calendar and
  pagination traps grow arbitrarily deep;
- ``repeat_seg_share`` — share of URLs with a repeated path segment:
  the cyclic-alias signature (/x/y/x/y);
- ``avg_params`` / ``max_params`` — query-parameter count: faceted
  blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host, url_path, url_query_canon


def url_trap_features(
    urls: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-URL trap features: host, depth, repeated-segment flag,
    query-param count. Pure Column expressions, no shuffle."""
    u = F.col(url_col)
    segs = F.filter(F.split(url_path(u), "/"), lambda x: x != "")
    q = url_query_canon(u)
    return urls.withColumns(
        {
            "host": url_host(u),
            "depth": F.size(segs).cast("long"),
            "has_repeat_seg": F.size(segs)
            != F.size(F.array_distinct(segs)),
            "n_params": F.when(q == "", F.lit(0))
            .otherwise(F.size(F.split(q, "&")))
            .cast("long"),
        }
    )


def host_trap_signals(
    urls: DataFrame,
    url_col: str = "url",
    digest_col: str | None = None,
) -> DataFrame:
    """Per-host aggregate of the URL features (one groupBy on host).
    With ``digest_col`` (content hash of the fetched page, e.g. the CDX
    ``digest``), adds the URLs-per-distinct-content ratio — the
    strongest trap signal; without it that column is NULL."""
    feats = url_trap_features(urls, url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_urls"),
        F.avg("depth").alias("avg_depth"),
        F.max("depth").alias("max_depth"),
        F.avg(F.col("has_repeat_seg").cast("double")).alias(
            "repeat_seg_share"
        ),
        F.avg("n_params").alias("avg_params"),
        F.max("n_params").alias("max_params"),
    ]
    if digest_col is not None:
        aggs.append(
            F.countDistinct(F.col(digest_col)).alias("n_contents")
        )
    out = feats.groupBy("host").agg(*aggs)
    if digest_col is not None:
        # countDistinct skips NULL digests — an all-NULL host would hit
        # ANSI's divide-by-zero, so gate on a positive denominator
        out = out.withColumn(
            "urls_per_content",
            F.when(
                F.col("n_contents") > 0,
                F.col("n_urls") / F.col("n_contents"),
            ),
        )
    else:
        out = out.withColumn(
            "n_contents", F.lit(None).cast("long")
        ).withColumn("urls_per_content", F.lit(None).cast("double"))
    return out


def flag_trap_hosts(
    signals: DataFrame,
    max_urls_per_content: float = 4.0,
    max_avg_depth: float = 8.0,
    max_repeat_seg_share: float = 0.5,
    max_avg_params: float = 4.0,
    min_urls: int = 20,
) -> DataFrame:
    """Threshold policy over ``host_trap_signals``: a host is a trap
    suspect when it has enough URLs to judge AND any signal crosses its
    bound. Returns the signals plus ``trap_reasons`` (array of fired
    rule names, empty = clean) and ``is_trap_suspect``."""
    rules = [
        (
            "dup_content",
            F.col("urls_per_content").isNotNull()
            & (F.col("urls_per_content") > max_urls_per_content),
        ),
        ("deep_paths", F.col("avg_depth") > max_avg_depth),
        (
            "cyclic_paths",
            F.col("repeat_seg_share") > max_repeat_seg_share,
        ),
        ("param_blowup", F.col("avg_params") > max_avg_params),
    ]
    reasons = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return signals.withColumn(
        "trap_reasons",
        F.when(F.col("n_urls") >= min_urls, reasons).otherwise(
            F.array().cast("array<string>")
        ),
    ).withColumn("is_trap_suspect", F.size("trap_reasons") > 0)
