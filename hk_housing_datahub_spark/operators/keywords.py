"""Per-document TF-IDF keyword extraction — corpus-scale topic tagging.

A training-data pipeline tags every document with its most
characteristic terms (faceting, mixture construction, topic-balanced
sampling, retrieval filters). The classic statistic is smoothed TF-IDF
(Salton & Buckley 1988; the sklearn ``TfidfTransformer`` smoothing):

    idf(t)   = ln((1 + N) / (1 + df(t))) + 1
    score(t) = tf(d, t) * idf(t)

Reference semantic target: the reference ranks listing keywords with
per-category pandas ``value_counts`` over its scraped corpus
(/root/reference/src/processors/ dashboards); this module is the
corpus-scale generalization.

Scale shape (100 TB):

- the ONLY corpus-sized shuffle is the ``(doc, token)`` term-frequency
  aggregate (map-side combined — a doc's repeated tokens collapse in
  the mapper);
- document frequency is a second aggregate over that already-compact
  tf table, never the corpus;
- ``N`` (corpus document count) joins back as a broadcast single row,
  and df joins on the token key — both compact;
- top-k per doc is one doc-keyed window over the scored tf table.

Cross-engine determinism: ranking compares ``round(score, 9)`` (not the
raw double) with ``(tf desc, df asc, token asc)`` tie-breaks, so
mathematically-equal scores computed with last-ulp differences by
different engines (e.g. ``2·ln(10)`` vs ``ln(100)``) cannot flip the
selected rows; the emitted score is rounded to 6 decimals to match the
driver's float canonicalization.

No Python UDFs anywhere — tokenize/agg/join/window are all JVM Columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, tf): the per-document term-frequency table.

    One explode + one map-side-combined groupBy — the single
    corpus-sized shuffle every downstream statistic reuses."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(token, df) from a ``term_frequencies`` table — the tf table
    already holds one row per (doc, token), so df is a plain count."""
    return tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-``k`` keywords per document by smoothed TF-IDF.

    Returns ``(id, rank, token, tf, df, score)`` with ``rank`` 1-based
    in score order. ``min_df`` drops hapax noise (a term must appear in
    at least ``min_df`` documents to be a keyword candidate);
    ``max_df_frac`` drops ubiquitous terms (df > frac·N — corpus-level
    stopwords) before ranking, the standard vectorizer knob.

    Documents whose every token was filtered out simply emit no rows
    (keyword extraction, not an audit — compose with a left join to
    keep empty docs).
    """
    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    dfreq = document_frequencies(tf, id_col=id_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    # N = documents contributing at least one token; a broadcast 1-row
    # cross join, never a driver-side count job.
    n_docs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dfreq = dfreq.crossJoin(F.broadcast(n_docs))
    if max_df_frac is not None:
        dfreq = dfreq.filter(
            F.col("df") <= F.col("n_docs") * F.lit(float(max_df_frac))
        )
    scored = tf.join(dfreq, "token").withColumn(
        "score",
        F.col("tf")
        * (
            F.log((1 + F.col("n_docs")) / (1 + F.col("df")))
            + F.lit(1.0)
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 9).desc(),
        F.col("tf").desc(),
        F.col("df").asc(),
        F.col("token").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "token",
            "tf",
            "df",
            F.round("score", 6).alias("score"),
        )
    )
