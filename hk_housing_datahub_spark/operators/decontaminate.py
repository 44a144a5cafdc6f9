"""Benchmark decontamination — drop training docs that leak eval data.

The standard pre-training hygiene step (e.g. GPT-3 §C, PaLM §D.2): a
training document that shares a long-enough token n-gram with any
benchmark/eval text is contaminated — the model would memorize the answer
rather than learn. The distributed shape is a shingle equi-join:

    corpus  ──13-gram shingles──► (doc_id, shingle_hash)
    evalset ──13-gram shingles──► DISTINCT shingle_hash     (small side)
    contaminated = corpus-shingles ⋈ eval-shingles, distinct doc_id

All JVM (shingling is the same higher-order-function pipeline the dedup
ladder uses; hashes are xxhash64 so only 8-byte keys shuffle, never
text). The eval side is tiny relative to the corpus — Catalyst/AQE
broadcasts it, so at 100 TB the corpus-side scan is map-local: zero
corpus shuffles, the contamination check is effectively free next to the
scan itself.

Default n=13 follows the published convention; lower it for stricter
screens. Shorter docs than n tokens cannot match (no shingles) — also the
published behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("_sh"),
    ).select(id_col, F.xxhash64("_sh").alias("_h"))


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Distinct ids of corpus docs sharing at least one token ``n``-gram
    with any benchmark row."""
    bench_sh = (
        benchmark.select(
            F.explode(
                word_shingles(F.col(bench_text_col or text_col), n)
            ).alias("_sh")
        )
        .select(F.xxhash64("_sh").alias("_h"))
        .distinct()
    )
    corpus_sh = _shingle_hashes(docs, id_col, text_col, n)
    return corpus_sh.join(bench_sh, "_h", "left_semi").select(id_col).distinct()


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """The corpus minus contaminated docs, all columns preserved."""
    bad = contaminated_ids(docs, benchmark, n, id_col, text_col, bench_text_col)
    return docs.join(bad, id_col, "left_anti")


def novelty_scores(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    fraction of the doc's token ``n``-grams (with multiplicity) that
    the reference has never seen — decontamination's positive-selection
    sibling (favor documents that ADD information; a doc that is pure
    recombination of reference n-grams scores 0).

    Same equi-join shape as the contamination screen, but keyed on the
    RAW shingle strings so an independent SQL engine replays it exactly
    (xxhash64 is Spark-only): reference shingles deduplicate to a
    Zipf-bounded set (AQE broadcasts it when it fits), the corpus
    explodes once, one left join + per-doc aggregate. Docs shorter than
    ``n`` tokens score NULL (no evidence). Output: (id, n_ngrams,
    n_known, novelty)."""
    ref = reference.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    ex = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    ref = ref.withColumn("_known", F.lit(1))
    per = (
        ex.join(ref, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("_known", F.lit(0))).alias("n_known"),
        )
        .withColumn(
            "novelty",
            F.round(F.lit(1.0) - F.col("n_known") / F.col("n_ngrams"), 6),
        )
    )
    return docs.select(id_col).join(per, id_col, "left")
