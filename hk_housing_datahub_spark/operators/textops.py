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
