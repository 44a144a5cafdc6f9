from __future__ import annotations

import math

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.importance import (
    hashed_ngram_features,
)
from hk_housing_datahub_spark.operators.quality_clf import (
    fit_quality_classifier,
    quality_gate,
    score_quality,
)

DIM = 512


def _corpus(spark):
    """Separable-by-proportion classes: every doc shares filler words,
    positives lean on an 'educational' vocabulary, negatives on junk."""
    pos = [
        (i, f"study theorem proof lemma chapter exercise s{i % 7} common words here")
        for i in range(40)
    ]
    neg = [
        (1000 + i, f"click spam win prize casino now n{i % 7} common words here")
        for i in range(40)
    ]
    mk = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])
    return mk(pos), mk(neg)


def _fit(spark, iterations=40):
    pos, neg = _corpus(spark)
    return (
        fit_quality_classifier(
            hashed_ngram_features(pos, dim=DIM),
            hashed_ngram_features(neg, dim=DIM),
            iterations=iterations,
        ),
        pos,
        neg,
    )


def test_fit_separates_planted_classes(spark):
    model, pos, neg = _fit(spark)
    feats = hashed_ngram_features(pos.unionByName(neg), dim=DIM)
    scores = {r["id"]: r["quality"] for r in score_quality(feats, model).collect()}
    pos_scores = [scores[i] for i in range(40)]
    neg_scores = [scores[1000 + i] for i in range(40)]
    assert min(pos_scores) > max(neg_scores)  # perfect separation
    assert min(pos_scores) > 0.7 and max(neg_scores) < 0.3
    # gate keeps exactly the positives at the midpoint threshold
    kept = {
        r["doc_id"]
        for r in quality_gate(
            pos.unionByName(neg), score_quality(feats, model), 0.5
        ).collect()
    }
    assert kept == set(range(40))


def test_fit_is_deterministic(spark):
    m1, _, _ = _fit(spark, iterations=15)
    m2, _, _ = _fit(spark, iterations=15)
    w1 = {r["bucket"]: r["weight"] for r in m1.collect()}
    w2 = {r["bucket"]: r["weight"] for r in m2.collect()}
    assert w1 == w2  # zero init + fixed iterations = pure function


def test_gradient_descent_matches_numpy_reference(spark):
    """The distributed fit replays plain full-batch GD: compare weights
    after a few iterations against a dense numpy implementation of the
    identical recurrence (log1p features, intercept bucket, L2 skip on
    the intercept)."""
    import numpy as np

    rows_p = [(0, "alpha beta"), (1, "alpha gamma")]
    rows_n = [(10, "delta beta"), (11, "delta epsilon")]
    pos = spark.createDataFrame(rows_p, ["doc_id", "text"])
    neg = spark.createDataFrame(rows_n, ["doc_id", "text"])
    fp, fn = (
        hashed_ngram_features(pos, dim=64, bigrams=False),
        hashed_ngram_features(neg, dim=64, bigrams=False),
    )
    iters, lr, reg = 7, 0.5, 1e-4
    model = {
        r["bucket"]: r["weight"]
        for r in fit_quality_classifier(
            fp, fn, lr=lr, iterations=iters, reg=reg
        ).collect()
    }
    # dense replay
    feats = {}
    for r in fp.collect():
        feats.setdefault(r["id"], {})[r["bucket"]] = math.log1p(r["cnt"])
    for r in fn.collect():
        feats.setdefault(r["id"], {})[r["bucket"]] = math.log1p(r["cnt"])
    for d in feats.values():
        d[-1] = 1.0
    ys = {0: 1.0, 1: 1.0, 10: 0.0, 11: 0.0}
    buckets = sorted({b for d in feats.values() for b in d})
    idx = {b: j for j, b in enumerate(buckets)}
    X = np.zeros((len(ys), len(buckets)))
    y = np.zeros(len(ys))
    for r, (i, d) in enumerate(sorted(feats.items())):
        y[r] = ys[i]
        for b, v in d.items():
            X[r, idx[b]] = v
    w = np.zeros(len(buckets))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / len(y)
        pen = reg * w
        pen[idx[-1]] = 0.0
        w = w - lr * (g + pen)
    for b in buckets:
        assert abs(model[b] - w[idx[b]]) < 1e-9, b


def test_scoring_plan_broadcasts_the_model(spark):
    model, pos, _ = _fit(spark, iterations=1)
    feats = hashed_ngram_features(pos, dim=DIM)
    plan = (
        score_quality(feats, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_unseen_vocabulary_scores_at_intercept(spark):
    model, _, _ = _fit(spark)
    other = spark.createDataFrame(
        [(5000, "zzz qqq xxx")], ["doc_id", "text"]
    )
    got = score_quality(
        hashed_ngram_features(other, dim=DIM), model
    ).collect()
    assert len(got) == 1  # scores exist even with (mostly) unseen buckets
    assert 0.0 < got[0]["quality"] < 1.0
