"""Exact duplicated-substring detection — the suffix-array dedup rung.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") deduplicate at the *substring* level: any span of >= k tokens
that occurs more than once anywhere in the corpus is duplicated text,
even when the containing documents are otherwise unrelated. The paper
builds a single-machine suffix array; the distributed re-expression is
rolling k-gram hashing — every duplicated span of length >= k is exactly
a maximal run of duplicated k-grams, so corpus-global k-gram occurrence
counts recover the same spans without any global ordering.

Reference semantic target: the reference dedups whole records by PK
(/root/reference/src/processors/agency/estates.py:87-93); this module is
the training-corpus generalization of that seen-set idea down to the
span level.

Scale shape (the 100 TB story):
- k-gram hashes are 8-byte xxhash64 keys; the occurrence count is ONE
  shuffle with map-side combine (partial counts per partition).
- marking duplicated positions is one shuffle-hash join grams><dup-hashes
  on that compact key; no broadcast assumption (the duplicated-hash set
  is corpus-dependent and can be huge on the web — AQE picks the
  strategy, exactly the drop_boilerplate_lines lesson).
- interval merging is a single groupBy(doc) with a sort_array +
  F.aggregate fold — per-doc state is bounded by the doc's token count,
  never by corpus size.
- total cost is O(total tokens) shuffle bytes, the same asymptotics as
  the paper's suffix array, but embarrassingly partition-parallel.

Everything is JVM Column expressions (xxhash64 / posexplode / aggregate);
no Python UDFs. Each public function has a DuckDB-expressible twin (the
driver oracle runs the gram/count/island logic in ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# ASCII unit separator: cannot appear inside a whitespace-normalized token,
# so joining tokens with it is injective (no gram-boundary ambiguity).
_SEP = chr(31)


def _gram_hashes(toks: Column, k: int) -> Column:
    """array<long>: xxhash64 of each k-token window; [] when < k tokens."""
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - k)  # 0-based window starts
    return F.when(n < k, F.array().cast("array<long>")).otherwise(
        F.transform(
            starts,
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), _SEP)),
        )
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    min_count: int = 2,
) -> DataFrame:
    """Merged duplicated intervals per document.

    Returns (id_col, s, e): half-open token-position intervals [s, e)
    (0-based over the normalized-whitespace tokenization) such that every
    k-gram starting inside [s, e-k] occurs >= ``min_count`` times in the
    whole corpus (occurrences within one document count too, so in-doc
    repetition is caught the same way as cross-doc plagiarism). Adjacent
    and overlapping duplicated windows are merged, so each row is one
    maximal duplicated span.
    """
    grams = docs.select(
        F.col(id_col),
        F.posexplode(_gram_hashes(tokens(F.col(text_col)), k)).alias(
            "s", "ghash"
        ),
    )
    # Corpus-global occurrence count: one shuffle, map-side combined.
    dup = (
        grams.groupBy("ghash")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("ghash")
    )
    hits = grams.join(dup, "ghash").select(
        id_col, F.col("s"), (F.col("s") + k).alias("e")
    )
    # Single-shuffle interval merge: per doc, fold the sorted window list.
    merged = (
        hits.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs")
        )
        .select(
            id_col,
            F.explode(
                F.aggregate(
                    F.col("ivs"),
                    F.array().cast("array<struct<s:long,e:long>>"),
                    lambda acc, x: F.when(
                        F.size(acc) == 0,
                        F.array(
                            F.struct(
                                x["s"].cast("long").alias("s"),
                                x["e"].cast("long").alias("e"),
                            )
                        ),
                    ).otherwise(
                        F.when(
                            x["s"] > F.element_at(acc, -1)["e"],
                            F.concat(
                                acc,
                                F.array(
                                    F.struct(
                                        x["s"].cast("long").alias("s"),
                                        x["e"].cast("long").alias("e"),
                                    )
                                ),
                            ),
                        ).otherwise(
                            F.concat(
                                F.slice(acc, 1, F.size(acc) - 1),
                                F.array(
                                    F.struct(
                                        F.element_at(acc, -1)["s"].alias("s"),
                                        F.greatest(
                                            F.element_at(acc, -1)["e"],
                                            x["e"].cast("long"),
                                        ).alias("e"),
                                    )
                                ),
                            )
                        )
                    ),
                )
            ).alias("iv"),
        )
        .select(id_col, F.col("iv.s").alias("s"), F.col("iv.e").alias("e"))
    )
    return merged


def duplicated_span_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    min_count: int = 2,
) -> DataFrame:
    """Per-doc duplicated-token coverage: (*docs columns*, n_tokens,
    dup_tokens, dup_frac). Docs with no duplicated span get 0/0.0; docs
    shorter than k tokens produce no grams and are never flagged."""
    spans = duplicated_spans(docs, id_col, text_col, k, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("e") - F.col("s")).alias("dup_tokens")
    )
    return (
        docs.withColumn(
            "n_tokens", F.size(tokens(F.col(text_col))).cast("long")
        )
        .join(per_doc, id_col, "left")
        .withColumn(
            "dup_tokens", F.coalesce(F.col("dup_tokens"), F.lit(0).cast("long"))
        )
        .withColumn(
            "dup_frac",
            F.when(F.col("n_tokens") <= 0, F.lit(0.0)).otherwise(
                F.col("dup_tokens") / F.col("n_tokens")
            ),
        )
    )


def drop_duplicated_span_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    min_count: int = 2,
    max_dup_frac: float = 0.2,
) -> DataFrame:
    """Document-level gate on span coverage: keep docs whose duplicated-
    token fraction is <= ``max_dup_frac`` (the policy NeMo-Curator et al.
    apply when span surgery is too aggressive for the downstream task).
    Schema = input schema."""
    prof = duplicated_span_profile(docs, id_col, text_col, k, min_count)
    return prof.filter(F.col("dup_frac") <= max_dup_frac).select(
        *docs.columns
    )


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    min_count: int = 2,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Span surgery: rebuild each doc's text keeping only tokens outside
    every duplicated span (Lee et al.'s remove-all policy — every copy of
    a duplicated substring goes; keeping one canonical copy would need a
    per-gram global ranking, a hot-key shuffle we deliberately avoid).

    Adds ``out_col`` (whitespace-normalized surviving text; '' when the
    whole doc was duplicated). Cost: the profile's shuffles plus a
    per-token interval probe, O(tokens x spans) within each doc only.
    """
    spans = duplicated_spans(docs, id_col, text_col, k, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs")
    )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    keep = F.filter(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.struct(i.alias("i"), F.element_at(toks, i + 1).alias("t")),
        ),
        lambda st: ~F.exists(
            F.col("ivs"),
            lambda iv: (st["i"] >= iv["s"]) & (st["i"] < iv["e"]),
        ),
    )
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            "ivs",
            F.coalesce(
                F.col("ivs"), F.array().cast("array<struct<s:long,e:long>>")
            ),
        )
        .withColumn(
            out_col,
            F.when(n <= 0, F.lit("")).otherwise(
                F.array_join(F.transform(keep, lambda st: st["t"]), " ")
            ),
        )
        .drop("ivs")
    )
