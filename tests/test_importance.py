from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.importance import (
    dsir_select,
    fit_logratio,
    hashed_ngram_features,
    importance_weights,
)

DIM = 512


def _weights(spark, docs_rows, target_pred):
    docs = spark.createDataFrame(docs_rows, ["doc_id", "text"])
    raw = hashed_ngram_features(docs, dim=DIM)
    tgt = hashed_ngram_features(docs.filter(target_pred), dim=DIM)
    lr = fit_logratio(tgt, raw, dim=DIM)
    return docs, importance_weights(raw, lr)


def test_dsir_weights_rank_target_like_docs_higher(spark):
    # target-style docs repeat a distinctive vocabulary; noise docs use
    # disjoint grams — their buckets only ever appear on the raw side,
    # so their log-ratios (and summed weights) must come out lower
    rows = [(i, "the quick brown fox jumps over lazy dogs") for i in range(8)]
    rows += [(100 + i, f"zzz{i} qqq{i} vvv{i} kkk{i} jjj{i}") for i in range(8)]
    docs, w = _weights(spark, rows, F.col("doc_id") < 100)
    got = {r["id"]: r["weight"] for r in w.collect()}
    assert len(got) == 16
    target_min = min(v for k, v in got.items() if k < 100)
    noise_max = max(v for k, v in got.items() if k >= 100)
    assert target_min > noise_max
    assert target_min > 0 > noise_max


def test_dsir_empty_doc_has_no_features_and_is_never_selected(spark):
    rows = [(1, "alpha beta gamma"), (2, ""), (3, "   ")]
    docs, w = _weights(spark, rows, F.col("doc_id") == 1)
    ids = {r["id"] for r in w.collect()}
    assert ids == {1}
    picked = dsir_select(docs, w, k=5, seed=3)
    assert {r["doc_id"] for r in picked.collect()} == {1}


def test_dsir_select_is_deterministic_and_seed_sensitive(spark):
    rows = [
        (i, ("good tokens here " * (1 + i % 3)) + f"uniq{i}")
        for i in range(40)
    ]
    docs, w = _weights(spark, rows, F.col("doc_id") % 4 == 0)
    w = w.persist()
    a = {r["doc_id"] for r in dsir_select(docs, w, k=10, seed=1).collect()}
    b = {r["doc_id"] for r in dsir_select(docs, w, k=10, seed=1).collect()}
    c = {r["doc_id"] for r in dsir_select(docs, w, k=10, seed=2).collect()}
    assert a == b and len(a) == 10
    assert c != a  # different Gumbel draw reshuffles the boundary
    # temperature -> 0 degenerates to deterministic top-k by weight:
    # with a huge 1/T multiplier the noise can't flip any pair
    hot = dsir_select(docs, w, k=10, seed=1, temperature=1e-9)
    top_w = sorted(
        (r["weight"] for r in w.collect()), reverse=True
    )[:10]
    hot_ids = {r["doc_id"] for r in hot.collect()}
    hot_w = sorted(
        (
            r["weight"]
            for r in w.filter(F.col("id").isin(hot_ids)).collect()
        ),
        reverse=True,
    )
    # ids can differ on exactly-tied weights; the selected WEIGHTS must
    # be the top-10 multiset
    assert all(abs(x - y) < 1e-12 for x, y in zip(hot_w, top_w))
    w.unpersist()


def test_single_token_and_bigram_feature_counts(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, "a b a")], ["doc_id", "text"]
    )
    f = hashed_ngram_features(docs, dim=DIM)
    per_doc = {
        r["id"]: r["n"]
        for r in f.groupBy("id").agg(F.sum("cnt").alias("n")).collect()
    }
    # doc 1: 1 unigram, 0 bigrams; doc 2: 3 unigrams + 2 bigrams
    assert per_doc == {1: 1, 2: 5}
