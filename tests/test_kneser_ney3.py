"""Trigram interpolated Kneser–Ney (operators/lm_quality.py
fit_kneser_ney3 / kn3_perplexity_score): count-pyramid goldens against
an independent dict-based twin, backoff-chain semantics, DuckDB parity,
and partition invariance."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.lm_quality import (
    fit_kneser_ney3,
    kn3_perplexity_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_model(texts, k=0.5):
    """Independent dict-based construction of the same count pyramid."""
    ty: dict = {}
    vocab = set()
    for t in texts:
        ws = t.split()
        vocab.update(ws)
        for i in range(len(ws) - 2):
            key = (ws[i], ws[i + 1], ws[i + 2])
            ty[key] = ty.get(key, 0) + 1
    ctx12: dict = {}
    mid: dict = {}
    for (w1, w2, w3), c in ty.items():
        a, b = ctx12.get((w1, w2), (0, 0))
        ctx12[(w1, w2)] = (a + c, b + 1)
        mid[(w2, w3)] = mid.get((w2, w3), 0) + 1
    ctx2: dict = {}
    uni: dict = {}
    for (w2, w3), m in mid.items():
        a, b = ctx2.get(w2, (0, 0))
        ctx2[w2] = (a + m, b + 1)
        uni[w3] = uni.get(w3, 0) + 1
    n1 = sum(1 for c in ty.values() if c == 1)
    n2 = sum(1 for c in ty.values() if c == 2)
    d3 = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) else 0.5
    n1m = sum(1 for c in mid.values() if c == 1)
    n2m = sum(1 for c in mid.values() if c == 2)
    d2 = n1m / (n1m + 2 * n2m) if (n1m + 2 * n2m) else 0.5
    return dict(
        ty=ty, ctx12=ctx12, mid=mid, ctx2=ctx2, uni=uni,
        d3=d3, d2=d2, tm=len(mid), v=len(vocab), k=k,
    )


def _brute_logp(m, w1, w2, w3):
    pc = (m["uni"].get(w3, 0) + m["k"]) / (m["tm"] + m["k"] * m["v"])
    if w2 in m["ctx2"]:
        m2, n3c = m["ctx2"][w2]
        m23 = m["mid"].get((w2, w3), 0)
        p2 = max(m23 - m["d2"], 0) / m2 + (m["d2"] * n3c / m2) * pc
    else:
        p2 = pc
    if (w1, w2) in m["ctx12"]:
        c12, n3 = m["ctx12"][(w1, w2)]
        c123 = m["ty"].get((w1, w2, w3), 0)
        p3 = max(c123 - m["d3"], 0) / c12 + (m["d3"] * n3 / c12) * p2
        return math.log(p3)
    return math.log(p2)


CORPUS = [
    "the cat sat on the mat",
    "the cat ran on the rug",
    "a dog sat on a rug",
]


def test_count_pyramid_matches_brute(spark):
    lm = fit_kneser_ney3(
        _docs(spark, list(enumerate(CORPUS))), k=0.5
    )
    want = _brute_model(CORPUS)
    got_ty = {
        (r.w1, r.w2, r.w3): r.c123 for r in lm.trigrams.collect()
    }
    assert got_ty == want["ty"]
    got_ctx12 = {
        (r.w1, r.w2): (r.c12, r.n3) for r in lm.ctx12.collect()
    }
    assert got_ctx12 == want["ctx12"]
    assert {(r.w2, r.w3): r.m23 for r in lm.mid.collect()} == want["mid"]
    assert {r.w2: (r.m2, r.n3c) for r in lm.ctx2.collect()} == want["ctx2"]
    assert {r.w3: r.u3 for r in lm.uni.collect()} == want["uni"]
    assert lm.d3 == pytest.approx(want["d3"])
    assert lm.d2 == pytest.approx(want["d2"])
    assert (lm.tm, lm.v) == (want["tm"], want["v"])


def test_backoff_chain_values(spark):
    """Every backoff regime — fully seen trigram, seen context/unseen
    continuation, unseen context/seen middle, totally unseen — matches
    the independent chain evaluation."""
    lm = fit_kneser_ney3(_docs(spark, list(enumerate(CORPUS))), k=0.5)
    m = _brute_model(CORPUS)
    probes = [
        (0, "the cat sat"),      # seen trigram
        (1, "the cat mat"),      # seen context, unseen w3
        (2, "zz cat sat"),       # unseen (w1,w2), seen middle (cat,sat)
        (3, "zz qq ww"),         # nothing seen
    ]
    got = {
        r.doc_id: r.avg_logp
        for r in kn3_perplexity_score(_docs(spark, probes), lm).collect()
    }
    for i, t in probes:
        w1, w2, w3 = t.split()
        assert got[i] == pytest.approx(
            _brute_logp(m, w1, w2, w3), rel=1e-12
        ), t


def test_trigram_mass_sums_to_one_at_k0(spark):
    """Σ_w3 P3(w3|w1,w2) over the full vocabulary = 1 for a seen
    context when the continuation floor is off (k=0) — the defining
    property of a proper discount/backoff chain."""
    lm = fit_kneser_ney3(_docs(spark, list(enumerate(CORPUS))), k=0.0)
    m = _brute_model(CORPUS, k=0.0)
    def p(w1, w2, w3):
        # at k=0 a word outside the continuation support has exactly
        # zero mass (log undefined) — that IS the property being summed
        try:
            return math.exp(_brute_logp(m, w1, w2, w3))
        except ValueError:
            return 0.0

    for ctx in [("the", "cat"), ("on", "the"), ("a", "dog")]:
        total = sum(
            p(ctx[0], ctx[1], w3)
            for w3 in set().union(*[set(t.split()) for t in CORPUS])
        )
        assert total == pytest.approx(1.0, abs=1e-12), ctx
    # and the Spark chain agrees with brute on one seen context
    got = (
        kn3_perplexity_score(_docs(spark, [(0, "the cat sat")]), lm)
        .collect()[0]
        .avg_logp
    )
    assert got == pytest.approx(
        _brute_logp(m, "the", "cat", "sat"), rel=1e-12
    )


def test_duckdb_parity_on_corpus(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lm = fit_kneser_ney3(docs.filter(F.col("doc_id") % 2 == 0), k=0.5)
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logp)
        for r in kn3_perplexity_score(
            docs.filter(F.col("doc_id") % 2 == 1), lm
        )
        .select("doc_id", "n_trigrams", "avg_logp")
        .collect()
    }
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    want = dict(
        duckdb.sql(
            f"""
        WITH d AS (SELECT doc_id, {toks} AS t
                   FROM '{sf_small}/documents.parquet'),
        tg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
               FROM d, unnest(generate_series(1, len(t) - 2)) AS g(i)
               WHERE len(t) >= 3),
        ty AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
        ctx12 AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n3
                  FROM ty GROUP BY 1, 2),
        mid AS (SELECT w2, w3, count(*) AS m23 FROM ty GROUP BY 1, 2),
        ctx2 AS (SELECT w2, sum(m23) AS m2, count(*) AS n3c
                 FROM mid GROUP BY 1),
        uni AS (SELECT w3, count(*) AS u3 FROM mid GROUP BY 1),
        s3 AS (SELECT CAST(sum(CASE WHEN c123 = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS n1,
                      sum(CASE WHEN c123 = 2 THEN 1 ELSE 0 END) AS n2
               FROM ty),
        sm AS (SELECT count(*) AS tm,
                      CAST(sum(CASE WHEN m23 = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS n1,
                      sum(CASE WHEN m23 = 2 THEN 1 ELSE 0 END) AS n2
               FROM mid),
        sc0 AS (SELECT s3.n1 / (s3.n1 + 2.0 * s3.n2) AS d3,
                       sm.n1 / (sm.n1 + 2.0 * sm.n2) AS d2,
                       sm.tm AS tm
                FROM s3, sm),
        v AS (SELECT count(DISTINCT w) AS v FROM
                (SELECT unnest(t) AS w FROM d WHERE doc_id % 2 = 0)),
        sc AS (
            SELECT b.doc_id,
                   ln(CASE WHEN c.c12 IS NULL THEN
                        CASE WHEN x.m2 IS NULL
                             THEN (coalesce(u.u3, 0) + 0.5)
                                  / (s.tm + 0.5 * v.v)
                             ELSE greatest(coalesce(md.m23, 0) - s.d2, 0.0)
                                  / x.m2
                                + (s.d2 * x.n3c / x.m2)
                                  * ((coalesce(u.u3, 0) + 0.5)
                                     / (s.tm + 0.5 * v.v)) END
                      ELSE
                        greatest(coalesce(y.c123, 0) - s.d3, 0.0) / c.c12
                        + (s.d3 * c.n3 / c.c12)
                          * (CASE WHEN x.m2 IS NULL
                               THEN (coalesce(u.u3, 0) + 0.5)
                                    / (s.tm + 0.5 * v.v)
                               ELSE greatest(coalesce(md.m23, 0) - s.d2,
                                             0.0) / x.m2
                                  + (s.d2 * x.n3c / x.m2)
                                    * ((coalesce(u.u3, 0) + 0.5)
                                       / (s.tm + 0.5 * v.v)) END)
                      END) AS lp
            FROM tg b
            LEFT JOIN ty y USING (w1, w2, w3)
            LEFT JOIN ctx12 c USING (w1, w2)
            LEFT JOIN mid md USING (w2, w3)
            LEFT JOIN ctx2 x USING (w2)
            LEFT JOIN uni u USING (w3)
            CROSS JOIN sc0 s CROSS JOIN v
            WHERE b.doc_id % 2 = 1)
        SELECT doc_id, (count(*), avg(lp)) FROM sc GROUP BY doc_id
        """
        ).fetchall()
    )
    assert set(got) == set(want)
    for key, (n, lp) in got.items():
        wn, wlp = want[key]
        assert n == wn, key
        assert lp == pytest.approx(wlp, rel=1e-9), key


def test_partition_invariance(spark):
    rows = [
        (i, f"w{i % 5} w{(i * 3) % 7} w{(i * 2) % 4} shared tail here")
        for i in range(36)
    ]
    d1 = _docs(spark, rows).repartition(1)
    d8 = _docs(spark, rows).repartition(8)
    a = kn3_perplexity_score(d1, fit_kneser_ney3(d1)).select(
        "doc_id", F.round("avg_logp", 9).alias("lp")
    )
    b = kn3_perplexity_score(d8, fit_kneser_ney3(d8)).select(
        "doc_id", F.round("avg_logp", 9).alias("lp")
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
