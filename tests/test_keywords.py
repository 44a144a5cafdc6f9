from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.keywords import (
    document_frequencies,
    term_frequencies,
    tfidf_keywords,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "harbour flat harbour view the the the"),
            (1, "garden flat with garden terrace the"),
            (2, "the peak mansion peak peak view"),
            (3, ""),  # tokenless doc: emits no keyword rows
        ],
        ["doc_id", "text"],
    )


def test_term_and_document_frequencies(corpus):
    tf = {
        (r.doc_id, r.token): r.tf for r in term_frequencies(corpus).collect()
    }
    assert tf[(0, "harbour")] == 2
    assert tf[(0, "the")] == 3
    assert tf[(2, "peak")] == 3
    assert (3, "") not in tf and not any(d == 3 for d, _ in tf)
    df = {
        r.token: r.df
        for r in document_frequencies(term_frequencies(corpus)).collect()
    }
    assert df["the"] == 3  # in docs 0, 1, 2
    assert df["view"] == 2
    assert df["harbour"] == 1


def test_tfidf_ranks_characteristic_terms_first(corpus):
    out = tfidf_keywords(corpus, k=2).collect()
    top = {r.doc_id: r.token for r in out if r.rank == 1}
    # despite tf('the')=3 in doc 0, df('the')=3 tanks its idf below
    # the doc-exclusive 'harbour' (tf=2, df=1)
    assert top[0] == "harbour"
    assert top[1] == "garden"
    assert top[2] == "peak"
    assert 3 not in top  # empty doc emits nothing
    # score matches the smoothed formula: tf * (ln((1+N)/(1+df)) + 1)
    n = 3
    r0 = [r for r in out if r.doc_id == 0 and r.rank == 1][0]
    want = 2 * (math.log((1 + n) / (1 + 1)) + 1)
    assert abs(r0.score - round(want, 6)) < 1e-9
    assert r0.tf == 2 and r0.df == 1


def test_tfidf_df_knobs_and_determinism(corpus):
    # max_df_frac drops the corpus-level stopword 'the' entirely
    out = tfidf_keywords(corpus, k=10, max_df_frac=0.67).collect()
    assert all(r.token != "the" for r in out)
    # min_df=2 keeps only terms shared by >=2 docs
    shared = tfidf_keywords(corpus, k=10, min_df=2).collect()
    assert set(r.token for r in shared) <= {"the", "flat", "view", "garden"}
    assert all(r.df >= 2 for r in shared)
    # deterministic under any partitioning
    a = sorted(
        (r.doc_id, r.rank, r.token)
        for r in tfidf_keywords(corpus, k=3).collect()
    )
    b = sorted(
        (r.doc_id, r.rank, r.token)
        for r in tfidf_keywords(corpus.repartition(7), k=3).collect()
    )
    assert a == b


def test_tfidf_tie_break_is_stable(spark):
    # two terms with identical (tf, df) in one doc: token asc decides
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    )
    out = [r for r in tfidf_keywords(docs, k=2).collect() if r.doc_id == 0]
    assert [r.token for r in sorted(out, key=lambda r: r.rank)] == [
        "alpha",
        "beta",
    ]


def test_tfidf_plan_is_jvm_only(corpus):
    plan = tfidf_keywords(corpus, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
