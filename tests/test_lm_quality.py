"""Bigram-LM perplexity quality scoring (operators/lm_quality.py):
golden behavior, smoothing floors, and exact DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.lm_quality import (
    fit_bigram_lm,
    perplexity_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fluent_text_scores_lower_perplexity(spark):
    ref = _docs(
        spark,
        [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(5)],
    )
    lm = fit_bigram_lm(ref)
    scored = {
        r.doc_id: r.perplexity
        for r in perplexity_score(
            _docs(
                spark,
                [
                    (0, "the cat sat on the rug"),      # in-distribution
                    (1, "rug mat dog cat the on sat"),  # scrambled
                    (2, "zx qv jk wp ln bd"),           # out-of-vocabulary
                ],
            ),
            lm,
        ).collect()
    }
    # fluent in-distribution text beats both degenerate cases. (Scrambled
    # vs OOV ordering is a property of add-k: an unseen w1 scores the
    # uniform 1/V while a FREQUENT w1 with an unseen continuation scores
    # k/(c1+kV) < 1/V — i.e. confidently-wrong continuations are penalized
    # harder than total ignorance, which is the behavior we want.)
    assert scored[0] < scored[1]
    assert scored[0] < scored[2]


def test_short_docs_score_null_and_counts_are_exact(spark):
    ref = _docs(spark, [(0, "a b a b a c")])
    lm = fit_bigram_lm(ref, k=1.0)
    assert lm.v == 3
    out = {
        r.doc_id: r
        for r in perplexity_score(
            _docs(spark, [(0, "a b c"), (1, "single"), (2, "")]), lm
        ).collect()
    }
    assert out[0].n_bigrams == 2
    assert out[1].perplexity is None and out[2].perplexity is None
    # hand-computed: c(a)=3, c(b)=2, c(ab)=2, c(bc)=0, V=3, k=1
    import math

    want = (math.log(3 / 6) + math.log(1 / 5)) / 2
    assert out[0].avg_logp == pytest.approx(want, rel=1e-9)


def test_duckdb_parity_on_corpus(spark, sf_small):
    """Fit on even docs, score odd docs; DuckDB recomputes both from the
    same parquet with the same normalization/smoothing — per-doc values
    agree to 1e-9."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    tgt = docs.filter(F.col("doc_id") % 2 == 1)
    lm = fit_bigram_lm(ref, k=0.5)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in perplexity_score(tgt, lm)
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
        ref_bg AS (SELECT w1, w2, count(*) AS c12 FROM bg
                   WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        ref_u AS (SELECT w1, count(*) AS c1 FROM
                    (SELECT doc_id, unnest(t) AS w1 FROM d)
                  WHERE doc_id % 2 = 0 GROUP BY 1),
        v AS (SELECT count(*) AS v FROM ref_u),
        sc AS (
            SELECT b.doc_id,
                   CASE WHEN u.c1 IS NULL THEN ln(1.0 / v.v)
                        ELSE ln((coalesce(r.c12, 0) + 0.5)
                                / (u.c1 + 0.5 * v.v)) END AS lp
            FROM bg b
            LEFT JOIN ref_bg r USING (w1, w2)
            LEFT JOIN ref_u u USING (w1)
            CROSS JOIN v
            WHERE b.doc_id % 2 = 1)
        SELECT doc_id, (count(*), avg(lp)) FROM sc GROUP BY doc_id
        """
        ).fetchall()
    )
    assert set(got) == set(want)
    for k, (n, lp) in got.items():
        wn, wlp = want[k]
        assert n == wn, k
        assert lp == pytest.approx(wlp, rel=1e-9), k


def test_funnel_lm_gate(spark, sf_small):
    """The recipe's max_perplexity gate composes into the funnel: with a
    reference fit on the corpus itself, a generous cap keeps everything
    the cap-less recipe keeps; a harsh cap strictly shrinks the corpus;
    and forgetting lm_reference raises."""
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    base = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", min_quality=0.3)
    ).count()
    loose = prepare_training_corpus(
        docs,
        CorpusRecipe(dedup="exact", min_quality=0.3, max_perplexity=1e9),
        lm_reference=docs,
    ).count()
    # self-fit perplexities on this synthetic corpus span ~26–38; cap at
    # the median so the gate demonstrably bites
    harsh = prepare_training_corpus(
        docs,
        CorpusRecipe(dedup="exact", min_quality=0.3, max_perplexity=30.0),
        lm_reference=docs,
    ).count()
    assert loose == base
    assert 0 < harsh < base
    with pytest.raises(ValueError, match="lm_reference"):
        prepare_training_corpus(
            docs, CorpusRecipe(max_perplexity=10.0)
        ).count()


def test_perplexity_buckets_ccnet_split(spark, sf_small):
    """head/middle/tail per language: buckets are roughly balanced within
    each language, ordered by perplexity (max(head) <= min(tail) within a
    language), and short docs land in 'unscored'."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        perplexity_buckets,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lm = fit_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    scored = perplexity_score(docs, lm).unionByName(
        spark.createDataFrame(
            [(10_001, "en", "x", 1, None, None, None)],
            "doc_id long, lang string, source string, n_chars long,"
            "n_bigrams long, avg_logp double, perplexity double",
        ),
        allowMissingColumns=True,
    )
    out = perplexity_buckets(scored).select(
        "doc_id", "lang", "perplexity", "ppl_bucket"
    )
    rows = out.collect()
    assert {r.ppl_bucket for r in rows if r.doc_id == 10_001} == {"unscored"}
    from collections import defaultdict

    per_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        if r.perplexity is not None:
            per_lang[r.lang][r.ppl_bucket].append(r.perplexity)
    for lang, buckets in per_lang.items():
        n = sum(len(v) for v in buckets.values())
        if n < 30:
            continue
        assert set(buckets) == {"head", "middle", "tail"}, lang
        for b in buckets:
            assert len(buckets[b]) / n == pytest.approx(1 / 3, abs=0.15), (
                lang,
                b,
            )
        assert max(buckets["head"]) <= min(buckets["tail"]), lang
