"""Discriminative quality classifier: hashed-n-gram logistic regression
fit by distributed full-batch gradient descent — all DataFrame ops.

The FineWeb-Edu / RefinedWeb pattern: label a curated slice positive
and raw crawl negative, fit a linear classifier over cheap text
features, gate the corpus on its score. DSIR (operators/importance.py)
is the *generative* sibling (class-conditional count ratios); this is
the *discriminative* one — it optimizes separation directly, which wins
when the classes overlap in vocabulary but differ in proportions.

No pyspark.ml, no Python UDF anywhere: the model is a (bucket, weight)
table exactly like DSIR's log-ratio table, and one gradient-descent
iteration is plain relational algebra —

    margin_i = Σ_j x_ij·w_j            (broadcast model join + id-sum)
    p_i      = sigmoid(margin_i)
    grad_j   = Σ_i x_ij·(p_i - y_i)/n + λ·w_j   (bucket-sum)
    w_j     ← w_j - lr·grad_j

The INTERCEPT is just the weight of synthetic bucket -1, which every
document carries with x = 1 — no scalar special-casing, no per-
iteration driver collect. Iterations are FIXED (deterministic output,
known job count, pagerank's discipline); weights are localCheckpoint'ed
per round to cut lineage.

Scale (10^10 docs, dim ≤ 2^20): the model side of every join is dim
rows — always broadcastable; the two shuffles per iteration key on doc
id and bucket (both compact). Features are computed ONCE and persisted
by the caller (same contract as the DSIR funnel stage). Fit cost is
iterations × 2 shuffles over the LABELED sample, which is typically
tiny next to the corpus; scoring the corpus is one broadcast join +
one id-keyed sum, identical shape to ``importance_weights``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INTERCEPT_BUCKET = -1


def _exact_sum(addend: Column) -> Column:
    """Order-independent float sum: round each double addend to
    decimal(38,18) (a pure per-value function), sum EXACTLY in decimal
    (exact addition is associative, so shuffle/combine order cannot
    change the result), cast back. Plain double sums re-associate with
    task completion order — two identical fits could differ in the last
    ulp depending on executor load, which breaks the pure-function
    contract the tests and cross-run audits pin. Decimal aggregation
    costs ~2-3x a double sum, negligible against the joins around it;
    the 1e-18 quantization is far below the gradient noise floor."""
    return F.sum(addend.cast("decimal(38,18)")).cast("double")


def _with_intercept(feats: DataFrame) -> DataFrame:
    """(id, bucket, x): log1p-scaled counts + the constant intercept
    feature (bucket -1, x=1) per document."""
    x = feats.select(
        "id", "bucket", F.log1p(F.col("cnt").cast("double")).alias("x")
    )
    ones = feats.select("id").distinct().select(
        "id",
        F.lit(INTERCEPT_BUCKET).alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return x.unionByName(ones)


def fit_quality_classifier(
    pos_feats: DataFrame,
    neg_feats: DataFrame,
    lr: float = 0.5,
    iterations: int = 40,
    reg: float = 1e-4,
) -> DataFrame:
    """(bucket, weight) from labeled ``hashed_ngram_features`` frames
    (positives = curated slice, negatives = raw crawl sample).

    Full-batch gradient descent with L2 regularization (the intercept
    bucket is exempt from the penalty, standard practice). Weights
    start at 0, so the fit is a pure function of the inputs — two runs
    produce identical models (pinned in tests).

    Doc ids must be DISJOINT between the two frames (an id in both
    would double-join its features through the error term — prefix ids
    when the curated slice is drawn from the same corpus)."""
    labeled = (
        _with_intercept(pos_feats).withColumn("y", F.lit(1.0))
        .unionByName(_with_intercept(neg_feats).withColumn("y", F.lit(0.0)))
    )
    xy = labeled.persist()
    labels = xy.select("id", "y").distinct()
    n = float(labels.count())
    w = xy.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("weight")
    ).localCheckpoint(eager=True)
    lr_l, reg_l, n_l = F.lit(lr), F.lit(reg), F.lit(n)
    for _ in range(iterations):
        margins = (
            xy.join(F.broadcast(w), "bucket")
            .groupBy("id")
            .agg(_exact_sum(F.col("x") * F.col("weight")).alias("m"))
        )
        err = labels.join(margins, "id", "left").select(
            "id",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce("m", F.lit(0.0))))
                - F.col("y")
            ).alias("e"),
        )
        grad = (
            xy.join(err, "id")
            .groupBy("bucket")
            .agg((_exact_sum(F.col("x") * F.col("e")) / n_l).alias("g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("weight")
                    - lr_l
                    * (
                        F.coalesce("g", F.lit(0.0))
                        + F.when(
                            F.col("bucket") == INTERCEPT_BUCKET, F.lit(0.0)
                        ).otherwise(reg_l * F.col("weight"))
                    )
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)
        )
    xy.unpersist()
    return w


def score_quality(feats: DataFrame, model: DataFrame) -> DataFrame:
    """(id, quality): sigmoid of the model margin per document — one
    broadcast model join + one id-keyed sum (``importance_weights``'
    plan shape; the model is ≤dim+1 rows no matter the corpus).
    Documents whose features all miss the model's buckets score at the
    intercept alone."""
    margins = (
        _with_intercept(feats)
        .join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(_exact_sum(F.col("x") * F.col("weight")).alias("m"))
    )
    return margins.select(
        "id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("quality"),
    )


def quality_gate(
    docs: DataFrame,
    scores: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring ≥ threshold — a semi-join on the compact
    (id, quality) frame; docs with no score row (empty text) drop."""
    keep = scores.filter(F.col("quality") >= threshold).select(
        F.col("id").alias(id_col)
    )
    return docs.join(keep, id_col, "semi")
