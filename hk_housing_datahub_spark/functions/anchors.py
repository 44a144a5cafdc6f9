"""Anchor-text extraction and aggregation (pure Columns, no UDF).

Anchor text — the words inside ``<a href="…">…</a>`` on LINKING pages —
is the classic off-page description of a TARGET page (how the rest of
the web names it). Search stacks rank with it; webtext training
pipelines use the (target, text, weight) table to caption link-only
documents and to build retrieval-supervision pairs. The reference's
extractor reads hrefs only (/root/reference/src/processors/listing/
parser.py — its ``_RE_HREF`` twin in extract/reference.py:33 drops the
anchor body); this module keeps the body, in document order, and rolls
it up per target.

Everything is ``regexp_extract_all`` / ``arrays_zip`` / ``posexplode``
— JVM codegen end to end, so extraction rides the same scan as any
other projection (no Python in the hot path). The rollup is one
aggregate keyed on (target, text): at 10^10 edges the hot keys are the
home pages of mega-sites — the distinct-source count uses Spark's
partial-distinct expansion (two compact-key exchanges, skew handled by
AQE like every other host-keyed agg in this repo).

The regex stays inside the Java∩RE2 common subset: the DuckDB twin
(``oracle_sql()["anchor_text_rollup"]`` in ``__spark_entry__.py``) runs
the byte-identical pattern, which is what makes the operator
hash-match oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one <a> element: href attribute value + element body up to the first
# closing tag. [^<]* (not .*?) keeps the two engines' match spans
# provably identical and bans nested-markup bodies from matching at all
# (a nested <b> inside the anchor ends the text capture — documented).
ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchors(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
) -> DataFrame:
    """pages → one row per anchor: (src, pos, href, anchor_text).

    ``pos`` is the 0-based document-order index (same order contract as
    the outlink extractor's array). ``anchor_text`` is whitespace-
    normalized (inner runs collapsed, ends trimmed); the EMPTY string
    is a real value — image links and hollow anchors are signal (a
    target linked mostly by empty anchors has no off-page description).
    Binary html is cast to string (UTF-8), NULL html yields no rows.

    Narrow transform: two regexp passes over the same string + a zip +
    posexplode, all inside the scan's codegen stage — zero shuffles.
    """
    html = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2).alias("txt"),
    )
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.posexplode(pairs).alias("pos", "a"),
        )
        .select(
            "src",
            "pos",
            F.col("a.href").alias("href"),
            F.trim(
                F.regexp_replace(F.col("a.txt"), r"\s+", " ")
            ).alias("anchor_text"),
        )
    )


def anchor_text_rollup(
    anchors: DataFrame,
    target_col: str = "href",
) -> DataFrame:
    """(target, anchor_text) → link weight: ``n_links`` (total
    occurrences — a page linking twice with the same words counts
    twice) and ``n_sources`` (distinct linking pages). This is the IR
    anchor table; per-target consumers (top text, total in-weight) are
    one more trivial agg over its compact output.

    One aggregate on (target, anchor_text); the distinct-source count
    rides the same keys via partial-distinct expansion.
    """
    return (
        anchors.groupBy(
            F.col(target_col).alias("target"), "anchor_text"
        )
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src").alias("n_sources"),
        )
    )


def top_anchor_per_target(rollup: DataFrame) -> DataFrame:
    """Collapse the anchor table to each target's best description:
    highest ``n_links``, ties to the lexicographically smallest text
    (deterministic). ``min(struct(-n_links, text))`` keeps it a plain
    aggregate — no window, no second shuffle beyond the target key."""
    best = F.min(
        F.struct(
            (-F.col("n_links")).alias("neg"),
            F.col("anchor_text").alias("txt"),
        )
    )
    return rollup.groupBy("target").agg(
        F.sum("n_links").alias("n_links"),
        F.count(F.lit(1)).alias("n_texts"),
        best.getField("txt").alias("top_anchor"),
    )
