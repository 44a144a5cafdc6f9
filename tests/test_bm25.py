from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.bm25 import (
    bm25_postings,
    bm25_search,
    tokenize,
)

DOCS = [
    (1, "Spark window join: the window JOIN plan"),
    (2, "customer order batch; batch batch stream"),
    (3, "slow table scan merge table"),
    (4, "spark spark spark filter"),
    (5, "unrelated words only here"),
    (6, ""),
]
QS = [("qa", "spark window"), ("qb", "batch"), ("qc", "missingterm")]


def _model_topk(docs, queries, k=5, k1=1.2, b=0.75):
    """Pure-Python BM25 over the same tokenization (oracle for tests)."""
    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    bags = {i: tok(t) for i, t in docs}
    bags = {i: ts for i, ts in bags.items() if ts}
    n = len(bags)
    avgdl = sum(len(ts) for ts in bags.values()) / n
    df = {}
    for ts in bags.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = []
    for qid, qtext in queries:
        scored = []
        for i, ts in bags.items():
            s = 0.0
            for t in sorted(set(tok(qtext))):
                tf = ts.count(t)
                if tf == 0 or t not in df:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(ts) / avgdl)
                )
            if s > 0.0:
                scored.append((i, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        out.extend(
            (qid, i, r + 1) for r, (i, _) in enumerate(scored[:k])
        )
    return out


def test_tokenize_drops_empties_and_case(spark):
    got = spark.range(1).select(
        tokenize(F.lit("  Ab,c--9 X!")).alias("t")
    ).head()["t"]
    assert got == ["ab", "c", "9", "x"]


def test_postings_tf_dl_df(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    postings, term_df = bm25_postings(docs)
    p = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in postings.collect()
    }
    assert p[(2, "batch")] == (3, 6)
    assert p[(1, "window")] == (2, 7)
    assert p[(4, "spark")] == (3, 4)
    d = {r["term"]: r["df"] for r in term_df.collect()}
    assert d["spark"] == 2 and d["batch"] == 1 and d["the"] == 1
    # the empty doc contributes nothing
    assert not [k for k in p if k[0] == 6]


def test_search_matches_python_model(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QS, ["qid", "qtext"])
    got = [
        (r["qid"], r["doc_id"], r["rank"])
        for r in bm25_search(docs, qs, k=5)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == _model_topk(DOCS, QS)


def test_two_phase_topk_equals_single_window(spark):
    # salts=1 collapses the banded phase into the plain window; results
    # must be identical for any salt count.
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QS, ["qid", "qtext"])
    a = sorted(
        map(tuple, bm25_search(docs, qs, k=2, salts=1).collect())
    )
    b = sorted(
        map(tuple, bm25_search(docs, qs, k=2, salts=64).collect())
    )
    assert a == b and len(a) > 0


def test_rank_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(10, "same text"), (2, "same text"), (7, "other words")],
        ["doc_id", "text"],
    )
    qs = spark.createDataFrame([("q", "same")], ["qid", "qtext"])
    got = [
        (r["doc_id"], r["rank"])
        for r in bm25_search(docs, qs, k=5).orderBy("rank").collect()
    ]
    assert got == [(2, 1), (10, 2)]


def test_plan_broadcasts_query_side_only(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QS, ["qid", "qtext"])
    plan = (
        bm25_search(docs, qs, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the query-term/df side is broadcast into the postings scan; the
    # postings (corpus) side must never be broadcast
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 1


def test_phrase_search_overlaps_and_duplicate_terms(spark):
    from hk_housing_datahub_spark.operators.bm25 import phrase_search

    df = spark.createDataFrame(
        [
            (1, "x x x y"),          # 'x x' occurs twice (overlapping)
            (2, "a x b x"),          # never contiguous
            (3, "x x"),              # exactly once, at 0
            (4, "y x, x! z"),        # punctuation splits, still adjacent
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search(df, "x x").collect()
    }
    assert got == {1: (2, 0), 3: (1, 0), 4: (1, 1)}


def test_phrase_search_three_gram_and_no_false_positive(spark):
    from hk_housing_datahub_spark.operators.bm25 import phrase_search

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick the brown fox"),   # all terms, wrong order
            (3, "THE Quick  BROWN dog"),  # case/space-insensitive hit
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.first_pos
        for r in phrase_search(df, "the quick brown").collect()
    }
    assert got == {1: 0, 3: 0}
