"""Document profiling operators over the `documents` table.

The text-analysis battery a training-data pipeline runs before filtering:
language-ID, quality scoring, token counting, fingerprinting — all thin
compositions of functions/text.py Column expressions (JVM-side), each with a
DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    stopword_count,
    token_count,
)


def profile_documents(
    docs: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document profile row: id, predicted lang, tokens, quality, fp.

    ``passthrough`` carries extra input columns into the profile in the same
    scan — callers must not join the profile back to the corpus to recover a
    column that was already in hand (that is a second full-corpus shuffle at
    scale).
    """
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        *passthrough,
        lang_id(t).alias("pred_lang"),
        token_count(t).alias("n_tokens"),
        stopword_count(t).alias("n_stopwords"),
        punct_count(t).alias("n_punct"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def quality_by_source(docs: DataFrame) -> DataFrame:
    """Corpus-health rollup: per source, doc count + rounded mean quality and
    token stats (the filter-threshold dashboard query)."""
    p = profile_documents(docs, passthrough=("source",))
    return p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """(actual lang, predicted lang) counts — the lang-ID evaluation query."""
    return (
        docs.select("lang", lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def gopher_quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rules-style document filters (Rae et al. 2021, §A1.1) as one
    codegen projection — the standard web-corpus gate battery. Each flag
    is True when the document VIOLATES the rule; ``gopher_pass`` ANDs the
    negations. Pure Column expressions over one scan: at 100 TB this adds
    zero shuffles to a corpus pipeline.

    Rules (fixed, documented thresholds — determinism over tunability):
    - word count outside [50, 100000]
    - mean word length outside [3, 10] chars
    - symbol-to-word ratio > 0.1  (# and … stand in for the symbol class)
    - > 90% of lines start with a bullet character
    - duplicate 3-gram fraction > 0.3 (within-document repetition)
    """
    from ..functions.text import tokens, word_shingles

    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_words_safe = F.greatest(n_words, F.lit(1))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / n_words_safe
    symbols = F.length(t) - F.length(F.regexp_replace(t, "[#…]", ""))
    lines = F.split(t, "\n")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
    )
    n_lines_safe = F.greatest(F.size(lines), F.lit(1))
    sh = word_shingles(t, 3)
    n_sh = F.size(sh)
    dup_frac = F.when(n_sh <= 0, F.lit(0.0)).otherwise(
        (n_sh - F.size(F.array_distinct(sh))) / n_sh
    )
    out = docs.select(
        "*",
        (n_words < 50) | (n_words > 100_000),
        (mean_len < 3) | (mean_len > 10),
        (symbols / n_words_safe > 0.1),
        (bullet_lines / n_lines_safe > 0.9),
        (dup_frac > 0.3),
    )
    names = [
        "flag_word_count",
        "flag_mean_word_len",
        "flag_symbol_ratio",
        "flag_bullet_lines",
        "flag_repetition",
    ]
    base = docs.columns
    out = out.toDF(*base, *names)
    gate = None
    for n in names:
        c = ~F.col(n)
        gate = c if gate is None else gate & c
    return out.withColumn("gopher_pass", gate)


def drop_boilerplate_lines(
    docs: DataFrame,
    max_line_df: int = 5,
    min_line_chars: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style line-level dedup: a line appearing (normalized) in more
    than ``max_line_df`` documents is boilerplate — navigation, footers,
    cookie banners — and is dropped from EVERY document; remaining lines
    are rejoined in their original order. Lines shorter than
    ``min_line_chars`` are kept unconditionally (hubs like '-' or blank
    separators are structure, not boilerplate; counting them would also
    make the DF side needlessly hot).

    Shape at 100 TB: posexplode lines → hash → one aggregate for the
    document-frequency per line-hash (map-side combined; only 8-byte
    hashes shuffle, never text) → anti-join the hot-hash set back →
    group back by doc with order restored via the kept positions.

    The hot-set join carries NO broadcast hint on purpose: with a small
    ``max_line_df`` at web scale the set of lines appearing in more than
    a handful of documents is every common sentence on the web — far too
    large to pin to the driver. AQE decides at runtime from the hot
    set's ACTUAL size: a genuinely tiny boilerplate set converts to a
    broadcast join for free, a huge one falls back to one compact-key
    shuffle on ``lhash`` (8-byte key; the line text rides the exchange
    exactly once, into the same partitioning the regroup reuses).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lhash", F.xxhash64(F.trim(F.lower(F.col("line")))))
    countable = lines.filter(F.length(F.trim("line")) >= min_line_chars)
    hot = (
        countable.groupBy("lhash")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") > max_line_df)
        .select("lhash")
    )
    kept = lines.join(
        hot.withColumn("_hot", F.lit(True)), "lhash", "left"
    ).filter(
        F.col("_hot").isNull()
        | (F.length(F.trim("line")) < min_line_chars)
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    # LEFT join + coalesce: a doc whose every line was boilerplate keeps
    # its row with EMPTY text (the quality gate downstream drops it with
    # honest funnel accounting) — this operator drops lines, never docs
    return docs.drop(text_col).join(rebuilt, id_col, "left").withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
