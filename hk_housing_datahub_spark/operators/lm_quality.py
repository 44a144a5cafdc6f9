"""N-gram language-model perplexity scoring — the KenLM role in a CCNet
quality pipeline, DataFrame-native.

CCNet's strongest quality signal is perplexity under a small LM trained
on a reference corpus (Wikipedia): low perplexity ≈ fluent prose, high ≈
boilerplate/gibberish/lists. No KenLM wheel ships in this sandbox — and
none is needed for the bigram case: an add-k-smoothed bigram model is a
pair of count tables, and both training and scoring are plain relational
algebra, so the whole signal stays JVM-side, shuffles only compact keys,
and is exactly reproducible by any SQL engine (DuckDB-parity pytest).

    fit:    reference docs ──explode bigrams──► count(w1,w2), count(w1)
            (two map-side-combined aggregates; V = |vocab|, one scalar)
    score:  corpus docs ──explode bigrams──► left-join the two count
            tables ──► logp = ln((c12 + k) / (c1 + k·V)) per bigram
            (unseen bigram → ln(k / (c1 + k·V)); unseen w1 → ln(1/V))
            ──► per-doc mean; perplexity = exp(−mean)

Scale shape at 100 TB: the model tables grow with the REFERENCE corpus
vocabulary (bounded — Zipf), not the scored corpus; the score join keys
on (w1, w2) strings — compact, uniformly distributed — and AQE broadcasts
the model side whenever it fits, else it is one hash join both of whose
sides are pre-aggregated. No Python, no UDFs, no driver loop; the only
driver value is V (one scalar, the fit's hyperparameter denominator).

Reference for the role: /root/reference has no quality model at all —
this is part of the training-data battery the brief asks for beyond the
reference's own operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


@dataclass
class BigramLM:
    """The fitted model: two count tables + the smoothing constants.
    ``bigrams``: (w1, w2, c12); ``unigrams``: (w1, c1); ``v``: vocabulary
    size; ``k``: add-k smoothing mass."""

    bigrams: DataFrame
    unigrams: DataFrame
    v: int
    k: float

    def persist(self) -> "BigramLM":
        self.bigrams = self.bigrams.persist()
        self.unigrams = self.unigrams.persist()
        return self


def doc_bigrams(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs of the normalized
    text; docs with <2 tokens yield an empty array. The token array is
    bound through a lambda variable (the word_shingles trick) so the
    tokenizer runs once per row, not once per bigram element."""

    def mk(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.element_at(toks, i + 1).alias("w1"),
                    F.element_at(toks, i + 2).alias("w2"),
                ),
            )
        )

    return F.element_at(F.transform(F.array(tokens(text)), mk), 1)


def fit_bigram_lm(
    reference: DataFrame, text_col: str = "text", k: float = 0.5
) -> BigramLM:
    """Train on a reference corpus (the CCNet recipe trains on Wikipedia
    and scores the crawl). Two aggregates, both map-side combined; the
    vocabulary size is the single driver-side scalar."""
    pairs = reference.select(
        F.explode(doc_bigrams(F.col(text_col))).alias("bg")
    ).select("bg.w1", "bg.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    unis = reference.select(
        F.explode(tokens(F.col(text_col))).alias("w1")
    )
    unigrams = unis.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = unigrams.count()  # |vocab|: one scalar, the smoothing denominator
    return BigramLM(bigrams=bigrams, unigrams=unigrams, v=max(v, 1), k=k)


def perplexity_score(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` + ``(n_bigrams, avg_logp, perplexity)`` per document.

    Unseen events degrade smoothly: unseen bigram under a seen w1 gets
    the smoothed floor ln(k / (c1 + k·V)); a w1 outside the reference
    vocabulary gets ln(1/V). Documents with <2 tokens score NULL (no
    evidence either way — let the caller's gate decide).
    """
    v, k = float(lm.v), float(lm.k)
    ex = docs.select(
        F.col(id_col), F.explode(doc_bigrams(F.col(text_col))).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")
    joined = ex.join(lm.bigrams, ["w1", "w2"], "left").join(
        lm.unigrams, ["w1"], "left"
    )
    logp = F.when(
        F.col("c1").isNull(), F.log(F.lit(1.0) / F.lit(v))
    ).otherwise(
        F.log(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
            / (F.col("c1") + F.lit(k) * F.lit(v))
        )
    )
    scores = (
        joined.select(F.col(id_col), logp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("lp").alias("avg_logp"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logp")))
    )
    return docs.join(scores, id_col, "left")


def perplexity_buckets(
    scored: DataFrame,
    by: str = "lang",
    probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split: per-``by``-group perplexity
    terciles. The head (lowest perplexity = most Wikipedia-like) is what
    CCNet keeps for high-quality corpora; the buckets also drive mixture
    recipes (oversample head, downsample tail).

    Scale shape: thresholds come from ONE ``percentile_approx`` aggregate
    per group (map-side combined sketches — never a per-group sort, which
    a window-rank split would need over a 100-TB single-language
    partition), broadcast back as a tiny join, then the assignment is a
    codegen comparison. Docs with NULL perplexity (no bigram evidence)
    bucket as 'unscored'. Threshold sketches are approximate at the
    stated ``accuracy``: boundary docs may swap buckets across different
    partitionings — callers needing byte-stable membership should bucket
    on the exact scores they already persist.
    """
    th = scored.groupBy(by).agg(
        F.percentile_approx(
            "perplexity", F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("_th")
    )
    out = scored.join(F.broadcast(th), by, "left")
    bucket = (
        F.when(F.col("perplexity").isNull(), F.lit("unscored"))
        .when(F.col("perplexity") <= F.element_at("_th", 1), F.lit("head"))
        .when(F.col("perplexity") <= F.element_at("_th", 2), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.withColumn("ppl_bucket", bucket).drop("_th")


# --------------------------------------------------------------------------
# Interpolated Kneser–Ney — the smoothing KenLM actually ships
# --------------------------------------------------------------------------


@dataclass
class KneserNeyLM:
    """Interpolated Kneser–Ney bigram model (Chen & Goodman 1999) —
    the smoothing family KenLM implements, and therefore the model the
    CCNet paper's perplexity filter really runs. Unlike add-k (above),
    KN discounts OBSERVED bigrams by an absolute amount ``d`` and gives
    the freed mass to a CONTINUATION distribution (how many distinct
    contexts a word follows — "Francisco" is frequent but only ever
    follows "San", so its continuation probability is tiny), which is
    the behaviour add-k cannot express.

    Everything is still two relational aggregates plus scalars:

      ``contexts``: (w1, c1, n1w1) — c1 = Σ c(w1,·) bigram-context total,
                    n1w1 = N1+(w1,·) distinct continuations of w1
      ``continuations``: (w2, n1w2) — N1+(·,w2) distinct contexts of w2
      ``bigrams``: (w1, w2, c12)
      scalars: ``d`` (absolute discount, estimated n1/(n1+2·n2)),
               ``t`` = total distinct bigram types, ``v`` = |vocab|,
               ``k`` = add-k mass on the continuation distribution so
               OOV words keep a finite floor (documented deviation from
               textbook KN, which assigns OOV zero mass).
    """

    bigrams: DataFrame
    contexts: DataFrame
    continuations: DataFrame
    d: float
    t: int
    v: int
    k: float

    def persist(self) -> "KneserNeyLM":
        self.bigrams = self.bigrams.persist()
        self.contexts = self.contexts.persist()
        self.continuations = self.continuations.persist()
        return self


def fit_kneser_ney(
    reference: DataFrame, text_col: str = "text", k: float = 0.5
) -> KneserNeyLM:
    """Fit interpolated-KN count tables on a reference corpus.

    Plan shape: ONE bigram-type aggregate (shuffle on compact (w1, w2)
    string keys, map-side combined) is the root; the context and
    continuation tables derive from it with two more small aggregates
    over the TYPE table (already |types| rows, Zipf-bounded by the
    reference vocabulary — not the corpus). The discount ``d`` and the
    type total come from one scalar aggregate over the same type table;
    V comes from one distinct-count over tokens. Four driver scalars
    total; no Python in any per-row path.
    """
    pairs = reference.select(
        F.explode(doc_bigrams(F.col(text_col))).alias("bg")
    ).select("bg.w1", "bg.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bigrams = bigrams.persist()
    contexts = bigrams.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    continuations = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n1w2")
    )
    row = bigrams.agg(
        F.count(F.lit(1)).alias("t"),
        F.sum((F.col("c12") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c12") == 2).cast("long")).alias("n2"),
    ).collect()[0]
    t, n1, n2 = int(row["t"]), int(row["n1"] or 0), int(row["n2"] or 0)
    d = (n1 / (n1 + 2.0 * n2)) if (n1 + 2 * n2) > 0 else 0.5
    v = reference.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w")).collect()[0][0]
    return KneserNeyLM(
        bigrams=bigrams,
        contexts=contexts,
        continuations=continuations,
        d=d,
        t=max(t, 1),
        v=max(int(v or 0), 1),
        k=k,
    )


def kn_perplexity_score(
    docs: DataFrame,
    lm: KneserNeyLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` + ``(n_bigrams, avg_logp, perplexity)`` under
    interpolated KN:

        Pc(w2)    = (N1+(·,w2) + k) / (T + k·V)     (continuation, add-k
                                                     floored so OOV > 0)
        λ(w1)     = d · N1+(w1,·) / c(w1)           (freed mass)
        P(w2|w1)  = max(c12 − d, 0)/c(w1) + λ(w1)·Pc(w2)   seen context
        P(w2|w1)  = Pc(w2)                                  unseen context

    Same join shape as the add-k scorer: the corpus explodes once, joins
    the three Zipf-bounded model tables on compact string keys (AQE
    broadcasts them when they fit), one per-doc aggregate. Docs with <2
    tokens score NULL.
    """
    d, t, v, k = float(lm.d), float(lm.t), float(lm.v), float(lm.k)
    ex = docs.select(
        F.col(id_col), F.explode(doc_bigrams(F.col(text_col))).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")
    joined = (
        ex.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.contexts, ["w1"], "left")
        .join(lm.continuations, ["w2"], "left")
    )
    pc = (F.coalesce(F.col("n1w2"), F.lit(0)) + F.lit(k)) / F.lit(
        t + k * v
    )
    lam = F.lit(d) * F.col("n1w1") / F.col("c1")
    seen = (
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("c1")
        + lam * pc
    )
    logp = F.when(F.col("c1").isNull(), F.log(pc)).otherwise(F.log(seen))
    scores = (
        joined.select(F.col(id_col), logp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("lp").alias("avg_logp"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logp")))
    )
    return docs.join(scores, id_col, "left")


# --------------------------------------------------------------------------
# Trigram interpolated Kneser–Ney — the full KenLM-shaped chain
# --------------------------------------------------------------------------


def doc_trigrams(text: Column) -> Column:
    """array<struct<w1,w2,w3>> of adjacent token triples; <3 tokens →
    empty array. Tokenizer bound once per row (word_shingles trick)."""

    def mk(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n < 3,
            F.array().cast("array<struct<w1:string,w2:string,w3:string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 3),
                lambda i: F.struct(
                    F.element_at(toks, i + 1).alias("w1"),
                    F.element_at(toks, i + 2).alias("w2"),
                    F.element_at(toks, i + 3).alias("w3"),
                ),
            )
        )

    return F.element_at(F.transform(F.array(tokens(text)), mk), 1)


@dataclass
class KneserNey3LM:
    """Interpolated trigram KN (Chen & Goodman 1999), all count tables
    derived from ONE trigram-type aggregate (the convention when only
    trigram counts are stored — lower orders use CONTINUATION counts):

      ``trigrams``: (w1, w2, w3, c123)
      ``ctx12``:    (w1, w2, c12, n3)   — Σc and #distinct w3 per context
      ``mid``:      (w2, w3, m23)       — N1+(·, w2, w3) distinct w1
      ``ctx2``:     (w2, m2, n3c)       — Σm23 and #distinct w3 per w2
      ``uni``:      (w3, u3)            — #distinct w2 with (w2,w3) ∈ mid
      scalars: ``d3``/``d2`` (order discounts, n1/(n1+2·n2) on c123/m23),
               ``tm`` = |mid| types, ``v`` = |vocab|, ``k`` = add-k
               floor mass on the unigram continuation (OOV stays finite).

    The probability chain (seen context → discount + freed-mass backoff,
    unseen → next order down):

      Pc(w3)       = (u3 + k) / (tm + k·v)
      P2(w3|w2)    = max(m23 − d2, 0)/m2 + (d2·n3c/m2)·Pc(w3)
      P3(w3|w1w2)  = max(c123 − d3, 0)/c12 + (d3·n3/c12)·P2(w3|w2)
    """

    trigrams: DataFrame
    ctx12: DataFrame
    mid: DataFrame
    ctx2: DataFrame
    uni: DataFrame
    d3: float
    d2: float
    tm: int
    v: int
    k: float

    def persist(self) -> "KneserNey3LM":
        for name in ("trigrams", "ctx12", "mid", "ctx2", "uni"):
            setattr(self, name, getattr(self, name).persist())
        return self


def fit_kneser_ney3(
    reference: DataFrame, text_col: str = "text", k: float = 0.5
) -> KneserNey3LM:
    """Fit the trigram-KN count pyramid. ONE corpus-scale aggregate (the
    trigram-type table, compact (w1,w2,w3) keys, map-side combined)
    roots everything; the four derived tables are aggregates OVER the
    type table (Zipf-bounded by the reference, not the corpus); the two
    discounts and the type total are one scalar aggregate each. No
    Python anywhere; driver traffic is four scalars."""
    ex = reference.select(
        F.explode(doc_trigrams(F.col(text_col))).alias("tg")
    ).select("tg.w1", "tg.w2", "tg.w3")
    ty = ex.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    ty = ty.persist()
    ctx12 = ty.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"), F.count(F.lit(1)).alias("n3")
    )
    mid = ty.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("m23"))
    mid = mid.persist()
    ctx2 = mid.groupBy("w2").agg(
        F.sum("m23").alias("m2"), F.count(F.lit(1)).alias("n3c")
    )
    uni = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("u3"))
    row3 = ty.agg(
        F.sum((F.col("c123") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c123") == 2).cast("long")).alias("n2"),
    ).collect()[0]
    n1, n2 = int(row3["n1"] or 0), int(row3["n2"] or 0)
    d3 = (n1 / (n1 + 2.0 * n2)) if (n1 + 2 * n2) > 0 else 0.5
    rowm = mid.agg(
        F.count(F.lit(1)).alias("tm"),
        F.sum((F.col("m23") == 1).cast("long")).alias("n1"),
        F.sum((F.col("m23") == 2).cast("long")).alias("n2"),
    ).collect()[0]
    tm = int(rowm["tm"])
    n1m, n2m = int(rowm["n1"] or 0), int(rowm["n2"] or 0)
    d2 = (n1m / (n1m + 2.0 * n2m)) if (n1m + 2 * n2m) > 0 else 0.5
    v = reference.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w")).collect()[0][0]
    return KneserNey3LM(
        trigrams=ty,
        ctx12=ctx12,
        mid=mid,
        ctx2=ctx2,
        uni=uni,
        d3=d3,
        d2=d2,
        tm=max(tm, 1),
        v=max(int(v or 0), 1),
        k=k,
    )


def kn3_perplexity_score(
    docs: DataFrame,
    lm: KneserNey3LM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` + (n_trigrams, avg_logp, perplexity) under the trigram
    chain. Five left joins of Zipf-bounded model tables on compact
    string keys (AQE broadcasts what fits), one per-doc mean. Unseen
    (w1,w2) context backs off to P2; unseen w2 middle backs off to the
    continuation unigram; docs with <3 tokens score NULL."""
    d3, d2 = float(lm.d3), float(lm.d2)
    tm, v, k = float(lm.tm), float(lm.v), float(lm.k)
    ex = docs.select(
        F.col(id_col), F.explode(doc_trigrams(F.col(text_col))).alias("tg")
    ).select(id_col, "tg.w1", "tg.w2", "tg.w3")
    joined = (
        ex.join(lm.trigrams, ["w1", "w2", "w3"], "left")
        .join(lm.ctx12, ["w1", "w2"], "left")
        .join(lm.mid, ["w2", "w3"], "left")
        .join(lm.ctx2, ["w2"], "left")
        .join(lm.uni, ["w3"], "left")
    )
    pc = (F.coalesce(F.col("u3"), F.lit(0)) + F.lit(k)) / F.lit(tm + k * v)
    p2_seen = (
        F.greatest(
            F.coalesce(F.col("m23"), F.lit(0)) - F.lit(d2), F.lit(0.0)
        )
        / F.col("m2")
        + (F.lit(d2) * F.col("n3c") / F.col("m2")) * pc
    )
    p2 = F.when(F.col("m2").isNull(), pc).otherwise(p2_seen)
    p3_seen = (
        F.greatest(
            F.coalesce(F.col("c123"), F.lit(0)) - F.lit(d3), F.lit(0.0)
        )
        / F.col("c12")
        + (F.lit(d3) * F.col("n3") / F.col("c12")) * p2
    )
    logp = F.when(F.col("c12").isNull(), F.log(p2)).otherwise(
        F.log(p3_seen)
    )
    scores = (
        joined.select(F.col(id_col), logp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.avg("lp").alias("avg_logp"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logp")))
    )
    return docs.join(scores, id_col, "left")
