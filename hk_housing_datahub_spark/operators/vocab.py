"""Corpus vocabulary + BPE-fit statistics — tokenizer training at scale.

Training a tokenizer on a 100 TB corpus starts with two corpus-wide
aggregates (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"):

1. the word-frequency table (``token_vocabulary``) — the corpus never
   needs to be touched again after this one pass;
2. symbol-pair counts weighted by word frequency (``bpe_pair_counts``) —
   the quantity BPE's merge loop maximizes, computed here from the
   compact vocabulary table, NOT the corpus.

Scale shape: ``token_vocabulary`` is one explode + one map-side-combined
groupBy on the token string (the only corpus-sized shuffle); everything
downstream operates on the vocabulary, which is orders of magnitude
smaller (Heaps' law). ``top_tokens`` uses orderBy(...).limit(k) — Spark
executes it as TakeOrdered (per-partition top-k then a k-row driver
merge), never a full sort. No Python UDFs anywhere.

Reference semantic target: the reference counts record frequencies per
category for its dashboards (/root/reference/src/processors/ — simple
pandas value_counts); this module is the corpus-scale generalization a
training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def token_vocabulary(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(token, count) corpus word-frequency table.

    One explode + one combined groupBy; ``min_count`` prunes the long tail
    (hapaxes are typically dropped before BPE fitting)."""
    out = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def top_tokens(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """The k most frequent tokens, ties broken by token string — executed
    as TakeOrdered (per-partition heap + k-row merge), not a global sort."""
    return (
        token_vocabulary(docs, text_col)
        .orderBy(F.desc("count"), "token")
        .limit(k)
    )


def bpe_pair_counts(
    vocab: DataFrame,
    min_count: int = 1,
    end_marker: str = "</w>",
) -> DataFrame:
    """(left, right, count): adjacent-symbol pair frequencies over the
    vocabulary, each word's pairs weighted by the word's corpus count —
    BPE's merge-selection statistic for the FIRST iteration (symbols =
    characters, plus ``end_marker`` closing each word, per Sennrich et
    al.). Input is ``token_vocabulary`` output; cost is proportional to
    vocabulary size × word length, independent of corpus size.

    The iterative merge loop itself is inherently sequential (each merge
    changes the next count table) and operates on the vocabulary-sized
    table — at that size it is a driver-side/classic job, not a corpus
    scan; this operator provides the distributed heavy lifting each
    iteration needs if run at vocabulary scale.
    """
    syms = F.concat(
        F.split(F.col("token"), ""),  # one element per character
        F.array(F.lit(end_marker)),
    )
    pairs = F.filter(
        F.transform(
            syms,
            lambda s, i: F.struct(
                s.alias("left"),
                F.try_element_at(syms, i + 2).alias("right"),
            ),
        ),
        lambda p: p["right"].isNotNull(),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "count")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("count"))
        .filter(F.col("count") >= min_count)
    )
