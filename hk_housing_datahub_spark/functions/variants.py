"""Title-variant generation for fuzzy lookup joins.

Re-expresses the reference's variant generator
(/root/reference/src/utils.py:123-177: case variants, CJK dot-form swaps,
Roman-numeral suffix strip, ordered dedup preserving first occurrence) as a
single array Column, so the fuzzy page lookup
(/root/reference/src/crawlers/wiki/wiki.py:59-92) becomes
``explode(variants) → join → row_number() over variant rank → rank==1``
instead of up-to-10 sequential HTTP probes per title.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

ROMAN_SUFFIX_RE = "\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$"


def strip_roman_suffix(title: Column) -> Column:
    """Drop a trailing Roman-numeral phase marker: 'Estate II' / 'Estate (II)'."""
    return F.regexp_replace(title, ROMAN_SUFFIX_RE, "")


def cjk_dot_swaps(title: Column) -> Column:
    """Normalize CJK middle-dot forms (．, ·, .) to the interpunct ·."""
    return F.translate(title, "．.", "··")


def title_variants_basic(title: Column) -> Column:
    """ANSI-mirrorable variant subset (no initcap/CJK-dot — DuckDB lacks
    initcap): [base, upper, lower, roman-stripped, upper(s), lower(s)],
    ordered-deduped keeping first occurrence. Used by the oracle-checked
    lookup query; ``title_variants`` below is the full reference set."""
    base = F.trim(title)
    stripped = strip_roman_suffix(base)
    raw = F.array(
        base, F.upper(base), F.lower(base),
        stripped, F.upper(stripped), F.lower(stripped),
    )
    with_idx = F.transform(raw, lambda v, i: F.struct(v.alias("v"), i.alias("i")))
    firsts = F.filter(
        with_idx, lambda s: F.array_position(raw, s["v"]) == s["i"] + 1
    )
    return F.transform(firsts, lambda s: s["v"])


def title_variants(title: Column) -> Column:
    """Ordered array of lookup variants; order encodes priority (first wins).

    Order mirrors the reference: original, upper, lower, initcap, dot-swapped,
    roman-stripped (and its case variants). Duplicates are removed keeping the
    FIRST occurrence (reference utils.py:169-177 ordered dedup).
    """
    base = F.trim(title)
    stripped = strip_roman_suffix(base)
    raw = F.array(
        base,
        F.upper(base),
        F.lower(base),
        F.initcap(base),
        cjk_dot_swaps(base),
        stripped,
        F.upper(stripped),
        F.lower(stripped),
    )
    # Ordered dedup: keep index of first occurrence of each value.
    with_idx = F.transform(raw, lambda v, i: F.struct(v.alias("v"), i.alias("i")))
    firsts = F.filter(
        with_idx, lambda s: F.array_position(raw, s["v"]) == s["i"] + 1
    )
    return F.transform(firsts, lambda s: s["v"])


def variant_lookup_join(
    titles_df: DataFrame,
    pages_df: DataFrame,
    title_col: str = "title",
    page_title_col: str = "page_title",
) -> DataFrame:
    """First-existing-variant lookup: explode variants with their priority
    rank, broadcast-join against the page-title dimension, keep the
    best-ranked hit per input title (left join semantics: misses → NULL).
    """
    exploded = titles_df.select(
        F.col(title_col),
        F.posexplode(title_variants(F.col(title_col))).alias("variant_rank", "variant"),
    )
    hits = exploded.join(
        F.broadcast(pages_df), exploded.variant == pages_df[page_title_col], "inner"
    )
    w = W.partitionBy(title_col).orderBy("variant_rank")
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return titles_df.join(best, on=title_col, how="left")
