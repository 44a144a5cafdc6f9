"""Interpolated Kneser–Ney bigram LM (operators/lm_quality.py):
discount estimation, continuation semantics, hand-computed goldens, and
exact DuckDB parity on the corpus."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.lm_quality import (
    fit_kneser_ney,
    kn_perplexity_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_count_tables_and_discount(spark):
    # bigrams: ab ba ab bc  → types: ab(2) ba(1) bc(1); n1=2 n2=1 → d=0.5
    lm = fit_kneser_ney(_docs(spark, [(0, "a b a b c")]))
    assert lm.t == 3
    assert lm.v == 3
    assert lm.d == pytest.approx(2 / (2 + 2 * 1))
    ctx = {r.w1: (r.c1, r.n1w1) for r in lm.contexts.collect()}
    # a is followed twice (both 'b'); b is followed twice ('a','c')
    assert ctx["a"] == (2, 1)
    assert ctx["b"] == (2, 2)
    cont = {r.w2: r.n1w2 for r in lm.continuations.collect()}
    # b follows only 'a'; a and c follow only 'b'
    assert cont == {"b": 1, "a": 1, "c": 1}


def test_golden_probabilities(spark):
    """Hand-computed interpolated-KN values for a 5-token corpus."""
    lm = fit_kneser_ney(_docs(spark, [(0, "a b a b c")]), k=0.5)
    d, t, v, k = lm.d, lm.t, lm.v, lm.k

    def pc(n1w2):
        return (n1w2 + k) / (t + k * v)

    out = {
        r.doc_id: r.avg_logp
        for r in kn_perplexity_score(
            _docs(spark, [(0, "a b"), (1, "b c"), (2, "z a"), (3, "a z")]),
            lm,
        ).collect()
    }
    # seen bigram under seen context: max(2-d,0)/2 + d*1/2 * pc(b)
    assert out[0] == pytest.approx(
        math.log((2 - d) / 2 + (d * 1 / 2) * pc(1)), rel=1e-12
    )
    # count-1 bigram: discount leaves (1-d)/2 plus lambda mass
    assert out[1] == pytest.approx(
        math.log((1 - d) / 2 + (d * 2 / 2) * pc(1)), rel=1e-12
    )
    # unseen context z → pure continuation P(a)
    assert out[2] == pytest.approx(math.log(pc(1)), rel=1e-12)
    # seen context a, OOV continuation z → 0 discounted mass + λ·floor
    assert out[3] == pytest.approx(
        math.log(0.0 + (d * 1 / 2) * pc(0)), rel=1e-12
    )


def test_continuation_beats_raw_frequency(spark):
    """The KN signature: a word frequent under ONE context only
    ("francisco" after "san") gets a smaller continuation probability
    than a rarer word seen under many contexts — add-k cannot do this."""
    rows = [(i, "san francisco") for i in range(10)]
    rows += [(100 + i, w + " visit") for i, w in enumerate(["we", "you", "they"])]
    lm = fit_kneser_ney(_docs(spark, rows))
    cont = {r.w2: r.n1w2 for r in lm.continuations.collect()}
    assert cont["francisco"] == 1  # 10 occurrences, one context
    assert cont["visit"] == 3      # 3 occurrences, three contexts
    # under an unseen context, 'visit' now outranks 'francisco'
    scored = {
        r.doc_id: r.avg_logp
        for r in kn_perplexity_score(
            _docs(spark, [(0, "qq visit"), (1, "qq francisco")]), lm
        ).collect()
    }
    assert scored[0] > scored[1]


def test_probability_mass_sums_to_one_over_continuations(spark):
    """For a seen context, Σ_w2 P(w2|w1) over the model's continuation
    support plus the OOV floors must stay ≤ 1 and approach 1 as k→0."""
    lm = fit_kneser_ney(
        _docs(spark, [(0, "a b a c a b a d b c")]), k=0.0
    )
    d = lm.d
    ctx = {r.w1: (r.c1, r.n1w1) for r in lm.contexts.collect()}
    cont = {r.w2: r.n1w2 for r in lm.continuations.collect()}
    bg = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    c1, n1w1 = ctx["a"]
    total = 0.0
    for w2 in cont:
        c12 = bg.get(("a", w2), 0)
        pcw = cont[w2] / lm.t
        total += max(c12 - d, 0.0) / c1 + (d * n1w1 / c1) * pcw
    assert total == pytest.approx(1.0, abs=1e-12)


def test_duckdb_parity_on_corpus(spark, sf_small):
    """Fit on even docs, score odd docs; DuckDB recomputes the full KN
    pipeline (type counts, contexts, continuations, discount, scoring)
    from the same parquet — per-doc values agree to 1e-9."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lm = fit_kneser_ney(docs.filter(F.col("doc_id") % 2 == 0), k=0.5)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in kn_perplexity_score(
            docs.filter(F.col("doc_id") % 2 == 1), lm
        )
        .select("doc_id", "n_bigrams", "avg_logp")
        .collect()
    }
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    want = dict(
        duckdb.sql(
            f"""
        WITH d AS (SELECT doc_id, {toks} AS t
                   FROM '{sf_small}/documents.parquet'),
        bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM d, unnest(generate_series(1, len(t) - 1)) AS g(i)
               WHERE len(t) >= 2),
        ty AS (SELECT w1, w2, count(*) AS c12 FROM bg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1w1
                FROM ty GROUP BY 1),
        cont AS (SELECT w2, count(*) AS n1w2 FROM ty GROUP BY 1),
        sc0 AS (SELECT count(*) AS t,
                       sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
                       sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
                FROM ty),
        sc1 AS (SELECT t, CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2) AS d
                FROM sc0),
        v AS (SELECT count(DISTINCT w1) AS v FROM
                (SELECT unnest(t) AS w1 FROM d WHERE doc_id % 2 = 0)),
        sc AS (
            SELECT b.doc_id,
                   CASE WHEN c.c1 IS NULL
                        THEN ln((coalesce(n.n1w2, 0) + 0.5)
                                / (s.t + 0.5 * v.v))
                        ELSE ln(
                          greatest(coalesce(y.c12, 0) - s.d, 0.0) / c.c1
                          + (s.d * c.n1w1 / c.c1)
                            * ((coalesce(n.n1w2, 0) + 0.5)
                               / (s.t + 0.5 * v.v)))
                   END AS lp
            FROM bg b
            LEFT JOIN ty y USING (w1, w2)
            LEFT JOIN ctx c USING (w1)
            LEFT JOIN cont n USING (w2)
            CROSS JOIN sc1 s CROSS JOIN v
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
    rows = [(i, f"w{i % 7} w{(i * 3) % 5} common tail words") for i in range(40)]
    d1 = _docs(spark, rows).repartition(1)
    d8 = _docs(spark, rows).repartition(8)
    a = kn_perplexity_score(d1, fit_kneser_ney(d1)).select(
        "doc_id", F.round("avg_logp", 9).alias("lp")
    )
    b = kn_perplexity_score(d8, fit_kneser_ney(d8)).select(
        "doc_id", F.round("avg_logp", 9).alias("lp")
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
