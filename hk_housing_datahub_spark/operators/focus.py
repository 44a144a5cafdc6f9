"""Shark-search focused crawling (Hersovici et al. 1998).

The third frontier-ordering axis, complementing importance
(operators/linkgraph.py OPIC/PageRank — "fetch what the web endorses")
and freshness (operators/recrawl.py — "refetch what changes"): TOPICAL
focus — fetch what is likely to be about the crawl's subject. The
reference is precisely a focused crawler (it fetches only real-estate
listing pages from a seeded catalog, /root/reference/src/crawlers/);
at open-web scale that selectivity has to come from a relevance model
over the link context instead of a hand-curated URL list.

Shark-search scores each DISCOVERED outlink before it is fetched:

    rel(s)        = |{lexicon terms contained in lower(s)}| / |lexicon|
    anchor_rel    = rel(anchor text)                (the link's label)
    context_rel   = rel(parent page text)           (the link's page)
    inherited     = delta * parent_relevance        (decay with depth)
    potential     = gamma * inherited
                    + (1-gamma) * (beta * anchor_rel
                                   + (1-beta) * context_rel)

A URL linked from several pages takes its BEST potential (an on-topic
recommendation anywhere beats many off-topic mentions).

Everything is codegen: the lexicon is a literal array (contains +
filter + size — no join, no UDF), anchors come from the one shared
ANCHOR_RE grammar (functions/anchors.py), and the per-child rollup is
ONE compact-key aggregate on the href — the same shuffle shape as the
host-graph rollup, AQE-sized at 10^10 edges. Priority banding reuses
``linkgraph.rank_to_priority`` (one approx_percentile sketch, no
global sort), so the scheduler contract is untouched.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.anchors import ANCHOR_RE


def lexicon_relevance(text: Column, terms: Sequence[str]) -> Column:
    """Lexicon-containment relevance in [0, 1]: the fraction of terms
    (matched case-insensitively as substrings) present in ``text``.
    NULL text scores 0. Pure codegen — the lexicon is a literal array;
    no shuffle, no UDF, rides whatever scan computes it."""
    if not terms:
        raise ValueError("focus lexicon must be non-empty")
    arr = F.array([F.lit(t.lower()) for t in terms])
    low = F.lower(F.coalesce(text, F.lit("")))
    hits = F.size(F.filter(arr, lambda t: low.contains(t)))
    return hits.cast("double") / F.lit(float(len(terms)))


def shark_outlink_scores(
    pages: DataFrame,
    terms: Sequence[str],
    beta: float = 0.8,
    gamma: float = 0.5,
    delta: float = 0.5,
    url_col: str = "url_canon",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Score every outlink of ``pages`` → (url, potential, n_parents,
    best_anchor_rel). ``url`` is the RAW href (canonicalize downstream
    with the frontier's own url columns so scores key exactly like
    frontier rows).

    Narrow anchor explode carrying the parent's relevance in-row (no
    parent join) + ONE aggregate on the href."""
    html = F.col(html_col).cast("string")
    parent_rel = lexicon_relevance(F.col(text_col), terms)
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2).alias("txt"),
    )
    exploded = pages.select(
        F.col(url_col).alias("src"),
        parent_rel.alias("prel"),
        F.explode(pairs).alias("a"),
    ).select(
        "src",
        "prel",
        F.col("a.href").alias("url"),
        lexicon_relevance(F.col("a.txt"), terms).alias("arel"),
    )
    potential = F.lit(gamma) * (F.lit(delta) * F.col("prel")) + F.lit(
        1.0 - gamma
    ) * (
        F.lit(beta) * F.col("arel")
        + F.lit(1.0 - beta) * F.col("prel")
    )
    return (
        exploded.withColumn("potential", potential)
        .groupBy("url")
        .agg(
            F.max("potential").alias("potential"),
            F.count(F.lit(1)).alias("n_parents"),
            F.max("arel").alias("best_anchor_rel"),
        )
    )
