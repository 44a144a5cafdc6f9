"""DSIR-style importance sampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
select raw web documents whose hashed-n-gram distribution looks like a
small TARGET corpus (the reference crawls a fixed quality catalog and
needs no selection; a Common-Crawl-scale corpus funnel selects the few
percent worth training on). The estimator is a bag-of-hashed-n-grams
log-likelihood ratio:

    w(doc) = sum_f count_f(doc) * [ log p_target(f) - log p_raw(f) ]

with add-``alpha`` smoothed bucket probabilities, followed by Gumbel
top-k resampling on ``w`` (sampling without replacement proportional to
the softmax of w — Vieira 2014's Gumbel-max trick, made deterministic
here by deriving the Gumbel noise from an md5 of the doc id + seed).

Everything is JVM Columns (no UDF):

- featurization: whitespace unigrams + bigrams → md5-derived 56-bit
  hash → ``dim`` buckets (the same hash idiom as
  operators/similarity.py:349, so the DuckDB twin is exact);
- fitting: TWO compact aggregations, each bounded by ``dim`` rows —
  the model is a broadcastable ``dim``-row table no matter how big
  either corpus is;
- scoring: explode doc features, broadcast-join the ``dim``-row
  log-ratio table, one groupBy per doc — a single shuffle keyed on the
  doc id at any corpus size;
- selection: banded two-phase Gumbel top-k over ``w + gumbel``
  (operators/banded.py) — no single-partition window, no data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 4096


def _bucket(col: F.Column, dim: int) -> F.Column:
    """md5-derived 56-bit hash → [0, dim) bucket (similarity.py idiom)."""
    h = F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")
    return F.pmod(h, F.lit(dim))


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram(+bigram) counts per document.

    Tokens come from ``functions.text.tokens`` (normalized whitespace
    split) so featurization agrees with the rest of the text battery;
    bigrams are space-joined adjacent pairs. Empty docs emit no rows.
    """
    from ..functions.text import tokens

    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    uni = base.select("id", F.explode("toks").alias("g"))
    feats = uni
    if bigrams:
        # zip(toks[:-1], toks[1:]) — slice lengths clamp at 0 so empty
        # and single-token docs yield [] (sequence(1, 0) would DESCEND
        # in Spark and element_at(_, 0) throws under ANSI)
        bi = base.select(
            "id",
            F.explode(
                F.expr(
                    "zip_with("
                    " slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " slice(toks, 2, greatest(size(toks) - 1, 0)),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            ).alias("g"),
        )
        feats = uni.unionByName(bi)
    return (
        feats.select("id", _bucket(F.col("g"), dim).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_logratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    dim: int = DEFAULT_DIM,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket log p_target - log p_raw, add-``alpha`` smoothed.

    Input frames are ``hashed_ngram_features`` outputs; each side folds
    to ≤``dim`` rows (one agg), totals ride along as a window-free
    grouping-set-of-one via a cross-joined 1-row aggregate that stays a
    broadcast. Output: (bucket, logratio) — ≤``dim`` rows, the whole
    fitted model.
    """

    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    joined = t.join(r, "bucket", "full")
    # totals are 1-row scalar frames cross-joined back in (stay lazy,
    # broadcast — the grouping-set trick would force a second shuffle)
    t_tot = target_feats.agg(F.sum("cnt").alias("t_tot"))
    r_tot = raw_feats.agg(F.sum("cnt").alias("r_tot"))
    a, d = F.lit(float(alpha)), F.lit(float(alpha * dim))
    return (
        joined.crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + a)
                    / (F.col("t_tot") + d)
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)) + a)
                    / (F.col("r_tot") + d)
                )
            ).alias("logratio"),
        )
    )


def importance_weights(
    doc_feats: DataFrame, logratio: DataFrame
) -> DataFrame:
    """(id, weight): sum of cnt * logratio over the doc's buckets —
    the log importance weight. The model side is ≤dim rows and
    broadcast; the only shuffle keys on the doc id."""
    return (
        doc_feats.join(F.broadcast(logratio), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("logratio")).alias("weight"))
    )


def gumbel_key(id_col: F.Column, seed: int) -> F.Column:
    """Deterministic standard-Gumbel noise from md5(id, seed): uniform
    in (0,1) from 52 hash bits, then -ln(-ln(u))."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"#{seed}"))), 1, 13),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(16 ** 13))
    return -F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
    bands: int = 64,
) -> DataFrame:
    """Gumbel top-``k`` resample: keep the k docs with the largest
    ``weight / temperature + Gumbel`` — a without-replacement sample
    proportional to softmax(weight/T), deterministic under ``seed``.
    Docs with no features (empty text) are never selected.

    The top-k is the BANDED two-phase rank (operators/banded.py):
    quantile-banded key, per-band window, bounded broadcast offsets —
    no single-partition Exchange/Sort anywhere in the selection plan
    (pinned in test_plans.py), so the cut over a 10^10-doc weight
    table distributes across ``bands`` executors instead of one. The
    selected SET is bit-identical to a global
    ``row_number() OVER (ORDER BY _gkey DESC, id)`` window. The keyed
    frame is localCheckpoint-ed inside the helper (it is consumed by
    the quantile job, the rank window, and the band counts — one
    2-column materialization instead of three featurize+score passes).
    """
    from .banded import banded_topk

    keyed = weights.select(
        F.col("id").alias(id_col),
        (
            F.col("weight") / F.lit(float(temperature))
            + gumbel_key(F.col("id"), seed)
        ).alias("_gkey"),
    )
    picked = banded_topk(
        keyed, "_gkey", [id_col], k, descending=True, bands=bands
    ).drop("_gkey")
    return docs.join(picked, id_col, "semi")
