"""DUST: learning duplicate-URL rewrite rules from crawl captures.

"Do not crawl in the DUST" (Bar-Yossef/Keidar/Schonfeld, WWW 2007):
different URLs with similar text are endemic (session ids, tracking
params, ``/index.html`` suffixes, scheme variants), and a frontier that
learns the site's rewrite rules can collapse duplicates BEFORE fetching
— unlike ``mirrors.canonical_urls`` (which picks a representative only
for content already fetched), a validated DUST rule predicts that an
UNSEEN variant is a duplicate and skips the fetch entirely. The
reference crawler never needs this (its seed catalog is deduped by
construction, /root/reference/src/processors/agency/estates.py:87-93);
a Common-Crawl-scale frontier spends a double-digit percentage of its
politeness budget on DUST without it.

Rule space (the paper's substring substitutions, restricted to the two
families that are validatable in one pass and cover the bulk of web
DUST):

- ``drop_param:<name>`` per host — remove one query parameter wherever
  it appears (candidates generated FROM the data: every (host, param)
  observed);
- a fixed path/scheme alphabet (``DEFAULT_PATH_RULES``): strip a
  terminal ``/index.html``, strip a trailing slash, fold https→http.

Validation (the paper's "support from the crawl log", no extra
fetches): a rule fires on capture u when rewrite(u) != u AND the
rewritten URL was itself captured; the pair SUPPORTS the rule when the
two digests agree and VIOLATES it otherwise. Pairs whose target was
never captured are ignored (unknowable without a fetch). A rule is
valid at (min_support, min_precision).

Scale shape (10^10 captures): one (url, digest) dedup shuffle, one
linear param explode, ONE url-keyed equi-join of rewrites against
captures (compact string key; salt-free — rewrite targets distribute
like URLs), one tiny (host, rule) aggregate. The valid-rule table is
per-host-small and broadcasts in ``dust_apply``; application itself is
pure codegen Columns, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host

# (rule_id, java_regex, replacement) — applied to the full URL string;
# the $-anchored path rules deliberately skip URLs with a query string
# (a literal-substring rule on the path tail, per the paper).
DEFAULT_PATH_RULES: list[tuple[str, str, str]] = [
    # keep the directory slash: /dir/index.html → /dir/ (the observed
    # duplicate is the directory URL, not the slashless path)
    ("strip_index_html", "(?<=/)index\\.html?$", ""),
    ("strip_trailing_slash", "(?<=[^/:])/$", ""),
    ("https_to_http", "^https://", "http://"),
]


def _split_query(url: Column) -> tuple[Column, Column]:
    """(prefix-before-?, query-after-?) of a URL Column."""
    base = F.regexp_extract(url, "^([^?]*)", 1)
    query = F.when(
        url.contains("?"), F.regexp_replace(url, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    return base, query


def drop_param(url: Column, param: Column) -> Column:
    """URL with every ``param=...`` (or bare ``param``) pair removed,
    remaining params kept in their original order (the rewrite must hit
    the literally-observed variant, so no re-sorting here); an emptied
    query drops its ``?``. Pure codegen."""
    base, query = _split_query(url)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: ~kv.startswith(F.concat(param, F.lit("=")))
        & (kv != param),
    )
    newq = F.array_join(kept, "&")
    return F.when(newq == "", base).otherwise(
        F.concat(base, F.lit("?"), newq)
    )


def _captures(df: DataFrame, url_col: str, digest_col: str) -> DataFrame:
    return (
        df.select(
            F.col(url_col).alias("url"), F.col(digest_col).alias("digest")
        )
        .filter(F.col("url").isNotNull() & F.col("digest").isNotNull())
        .distinct()
    )


def dust_rules(
    captures: DataFrame,
    min_support: int = 2,
    min_precision: float = 0.9,
    url_col: str = "url",
    digest_col: str = "digest",
    path_rules: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """(host, rule, support, violations, precision, valid) — one row per
    per-host rule with at least one validatable pair. ``precision`` =
    support / (support + violations); ``valid`` applies the thresholds.
    Deterministic and SQL-expressible (the driver entry's oracle states
    the expected counts analytically from its synthetic construction).
    """
    caps = _captures(captures, url_col, digest_col).localCheckpoint(
        eager=True
    )
    _, query = _split_query(F.col("url"))
    params = caps.select(
        "url",
        "digest",
        F.array_distinct(
            F.transform(
                F.filter(F.split(query, "&"), lambda kv: kv != ""),
                lambda kv: F.split(kv, "=").getItem(0),
            )
        ).alias("params"),
    )
    param_rw = params.select(
        "url",
        "digest",
        F.explode("params").alias("param"),
    ).select(
        "url",
        "digest",
        F.concat(F.lit("drop_param:"), F.col("param")).alias("rule"),
        drop_param(F.col("url"), F.col("param")).alias("rewritten"),
    )
    path_rw = None
    for rule_id, pat, repl in (
        DEFAULT_PATH_RULES if path_rules is None else path_rules
    ):
        rw = caps.select(
            "url",
            "digest",
            F.lit(rule_id).alias("rule"),
            F.regexp_replace("url", pat, repl).alias("rewritten"),
        )
        path_rw = rw if path_rw is None else path_rw.union(rw)
    rewrites = (
        param_rw.union(path_rw) if path_rw is not None else param_rw
    ).filter(F.col("rewritten") != F.col("url"))
    target = caps.select(
        F.col("url").alias("rewritten"),
        F.col("digest").alias("target_digest"),
    )
    pairs = rewrites.join(target, "rewritten")
    scored = pairs.groupBy(
        url_host(F.col("url")).alias("host"), "rule"
    ).agg(
        F.sum(
            F.when(F.col("digest") == F.col("target_digest"), 1).otherwise(0)
        ).alias("support"),
        F.sum(
            F.when(F.col("digest") != F.col("target_digest"), 1).otherwise(0)
        ).alias("violations"),
    )
    prec = F.col("support") / (F.col("support") + F.col("violations"))
    return scored.select(
        "host",
        "rule",
        "support",
        "violations",
        F.round(prec, 6).alias("precision"),
        (
            (F.col("support") >= F.lit(min_support))
            & (prec >= F.lit(min_precision))
        ).alias("valid"),
    )


def dust_apply(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "url_dust",
    path_rules: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Rewrite ``url_col`` by the VALID rules of its host, one pass:
    all valid ``drop_param`` rules first (each URL's params filtered
    against its host's param set — one array op, no explode), then the
    path alphabet in ``DEFAULT_PATH_RULES`` order where that
    (host, rule) is valid. Output = input plus ``out_col``; URLs on
    hosts with no learned rules pass through unchanged. One host-keyed
    join (AQE-sized, see inline note), rest pure codegen — the
    frontier calls this before the
    seen-set probe so predicted duplicates dedup against the canonical
    form and are never scheduled."""
    valid = rules.filter("valid")
    per_host = valid.groupBy("host").agg(
        F.collect_set(
            F.when(
                F.col("rule").startswith("drop_param:"),
                F.substring(F.col("rule"), 12, 2147483647),
            )
        ).alias("_drop_params"),
        F.collect_set(
            F.when(~F.col("rule").startswith("drop_param:"), F.col("rule"))
        ).alias("_path_rules"),
    )
    u = F.col(url_col)
    # NO broadcast hint: the rule table is per-host and corpus-dependent
    # (at web scale most hosts carry a session-param rule), so forcing a
    # broadcast is a driver OOM at 10^7 hosts — AQE broadcasts it for
    # free while it is small and falls back to one compact host-keyed
    # shuffle when it is not (same reasoning as textops' hot-line set).
    joined = urls.join(
        per_host,
        url_host(u) == F.col("host"),
        "left",
    ).drop("host")
    base, query = _split_query(u)
    drops = F.coalesce(
        F.col("_drop_params"), F.array().cast("array<string>")
    )
    # mirror drop_param exactly: remove param=... and bare param, KEEP
    # empty segments ('a&&b' stays 'a&&b') — the applied rewrite must be
    # the literal form dust_rules validated against the capture log
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: ~F.array_contains(drops, F.split(kv, "=").getItem(0)),
    )
    newq = F.array_join(kept, "&")
    # rebuild the query ONLY for hosts carrying a valid drop_param rule:
    # everything else passes through byte-identical (the docstring's
    # no-learned-rules guarantee)
    out = F.when((F.size(drops) == 0) | (query == ""), u).otherwise(
        F.when(newq == "", base).otherwise(
            F.concat(base, F.lit("?"), newq)
        )
    )
    path_set = F.coalesce(
        F.col("_path_rules"), F.array().cast("array<string>")
    )
    for rule_id, pat, repl in (
        DEFAULT_PATH_RULES if path_rules is None else path_rules
    ):
        out = F.when(
            F.array_contains(path_set, rule_id),
            F.regexp_replace(out, pat, repl),
        ).otherwise(out)
    return joined.withColumn(out_col, out).drop(
        "_drop_params", "_path_rules"
    )
