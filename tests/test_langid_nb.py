"""Trained char-n-gram Naive-Bayes language ID (operators/langid_nb.py):
gram extraction, count goldens, separation on real multilingual text,
floor/prior semantics, and exact DuckDB parity of the confusion rollup."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.langid_nb import (
    char_ngrams,
    fit_nb_langid,
    nb_confusion,
    nb_language_scores,
    nb_predict,
)

SAMPLES = [
    ("en", "the quick brown fox jumps over the lazy dog and then runs away"),
    ("en", "we should think about what the weather will be like this evening"),
    ("en", "there is nothing better than a quiet walk through the old town"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und läuft weg"),
    ("de", "wir sollten darüber nachdenken wie das wetter heute abend wird"),
    ("de", "es gibt nichts schöneres als einen ruhigen spaziergang durch die stadt"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux et s'enfuit"),
    ("fr", "nous devrions réfléchir au temps qu'il fera ce soir dans la ville"),
    ("fr", "il n'y a rien de mieux qu'une promenade tranquille dans la vieille ville"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso y luego huye"),
    ("es", "deberíamos pensar en cómo estará el tiempo esta noche en la ciudad"),
    ("es", "no hay nada mejor que un paseo tranquilo por el casco antiguo"),
]


def _labeled(spark, rows=None):
    rows = rows if rows is not None else SAMPLES
    return spark.createDataFrame(
        [(i, t, l) for i, (l, t) in enumerate(rows)],
        ["doc_id", "text", "lang"],
    )


def test_char_ngrams_golden(spark):
    out = spark.range(1).select(
        char_ngrams(F.lit("  Ab c ")).alias("g"),
        char_ngrams(F.lit("ab")).alias("short"),
        char_ngrams(F.lit("abcd"), n=2).alias("bi"),
    ).first()
    # normalize: lower + collapse whitespace + trim → 'ab c'
    assert out.g == ["ab ", "b c"]
    assert out.short == []
    assert out.bi == ["ab", "bc", "cd"]


def test_fit_counts_and_floor(spark):
    m = fit_nb_langid(_labeled(spark, [("en", "aaab"), ("de", "bbba")]), k=1.0)
    grams = {(r.gram, r.lang): r.c for r in m.grams.collect()}
    assert grams[("aaa", "en")] == 1 and grams[("aab", "en")] == 1
    assert grams[("bbb", "de")] == 1 and grams[("bba", "de")] == 1
    assert m.g == 4  # distinct grams across languages
    langs = {r.lang: r for r in m.langs.collect()}
    import math

    assert langs["en"].tot == 2
    assert langs["en"].prior_ln == pytest.approx(math.log(0.5))
    assert langs["en"].floor_ln == pytest.approx(math.log(1.0 / (2 + 4)))


def test_predicts_held_out_sentences(spark):
    """Train on two sentences per language, predict the held-out third —
    character trigrams separate these four languages cleanly."""
    train = [(l, t) for i, (l, t) in enumerate(SAMPLES) if i % 3 != 2]
    test = [(l, t) for i, (l, t) in enumerate(SAMPLES) if i % 3 == 2]
    model = fit_nb_langid(_labeled(spark, train))
    preds = {
        r.doc_id: r.pred_lang
        for r in nb_predict(_labeled(spark, test), model).collect()
    }
    want = {i: l for i, (l, _) in enumerate(test)}
    assert preds == want


def test_zero_match_language_scores_floor_only(spark):
    """A doc whose grams never occur in some language still gets a score
    for it (prior + all-floor), and an all-OOV doc ranks languages by
    floor steepness — not dropped."""
    model = fit_nb_langid(_labeled(spark, [("en", "hello"), ("zh", "你好吗")]))
    scores = nb_language_scores(
        _labeled(spark, [("??", "qqqq")]), model
    ).collect()
    assert {r.lang for r in scores} == {"en", "zh"}
    assert all(r.score is not None for r in scores)
    # prior-only doc: shorter than n → zero grams → score == prior_ln
    langs = {r.lang: r.prior_ln for r in model.langs.collect()}
    tiny = {
        r.lang: r.score
        for r in nb_language_scores(_labeled(spark, [("??", "ab")]), model).collect()
    }
    assert tiny["en"] == pytest.approx(langs["en"])


def test_confusion_duckdb_parity(spark, sf_small):
    """Fit on even docs, predict odd docs, confusion rollup — DuckDB
    replays training and inference end-to-end; counts match exactly."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    model = fit_nb_langid(docs.filter(F.col("doc_id") % 2 == 0), k=1.0)
    got = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in nb_confusion(
            docs.filter(F.col("doc_id") % 2 == 1), model
        ).collect()
    }
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    want = dict(
        duckdb.sql(
            f"""
        WITH d AS (SELECT doc_id, lang, {norm} AS t
                   FROM '{sf_small}/documents.parquet'),
        dg AS (SELECT doc_id, lang, substr(t, i, 3) AS gram
               FROM d, unnest(generate_series(1, len(t) - 2)) AS g(i)
               WHERE len(t) >= 3),
        ty AS (SELECT gram, lang, count(*) AS c FROM dg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        gsz AS (SELECT count(DISTINCT gram) AS g FROM ty),
        tot AS (SELECT lang, sum(c) AS tot FROM ty GROUP BY 1),
        pri AS (SELECT lang, count(*) AS n_docs FROM d
                WHERE doc_id % 2 = 0 GROUP BY 1),
        prit AS (SELECT sum(n_docs) AS n FROM pri),
        langs AS (SELECT t.lang, t.tot,
                         ln(CAST(p.n_docs AS DOUBLE) / prit.n) AS prior_ln,
                         ln(1.0 / (t.tot + 1.0 * gsz.g)) AS floor_ln
                  FROM tot t JOIN pri p USING (lang)
                  CROSS JOIN prit CROSS JOIN gsz),
        tgt AS (SELECT doc_id, lang AS true_lang,
                       greatest(len(t) - 2, 0) AS n_grams, t
                FROM d WHERE doc_id % 2 = 1),
        tgrams AS (SELECT doc_id, substr(t, i, 3) AS gram
                   FROM tgt, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
        mt AS (SELECT m.doc_id, y.lang,
                      sum(ln((y.c + 1.0) / (o.tot + 1.0 * gsz.g))) AS s,
                      count(*) AS m
               FROM tgrams m JOIN ty y USING (gram)
               JOIN tot o ON y.lang = o.lang CROSS JOIN gsz
               GROUP BY 1, 2),
        sc AS (SELECT b.doc_id, b.true_lang, l.lang,
                      l.prior_ln + coalesce(mt.s, 0.0)
                      + (b.n_grams - coalesce(mt.m, 0)) * l.floor_ln
                          AS score
               FROM tgt b CROSS JOIN langs l
               LEFT JOIN mt ON mt.doc_id = b.doc_id AND mt.lang = l.lang),
        pr AS (SELECT doc_id, true_lang, lang AS pred_lang,
                      row_number() OVER (PARTITION BY doc_id
                          ORDER BY round(score, 6) DESC, lang) AS rn
               FROM sc)
        SELECT (true_lang, pred_lang), count(*) FROM pr
        WHERE rn = 1 GROUP BY true_lang, pred_lang
        """
        ).fetchall()
    )
    want = {tuple(k): v for k, v in want.items()}
    assert got == want


def test_partition_invariance(spark):
    rows = [(l, t * 2) for l, t in SAMPLES for _ in range(3)]
    d1 = _labeled(spark, rows).repartition(1)
    d8 = _labeled(spark, rows).repartition(8)
    a = nb_predict(d1, fit_nb_langid(d1)).collect()
    b = nb_predict(d8, fit_nb_langid(d8)).collect()
    assert {(r.doc_id, r.pred_lang, r.score) for r in a} == {
        (r.doc_id, r.pred_lang, r.score) for r in b
    }


def test_sentence_code_switch_detects_interleaving(spark):
    from hk_housing_datahub_spark.operators.langid_nb import (
        sentence_code_switch,
    )

    train = [(l, t) for i, (l, t) in enumerate(SAMPLES) if i % 3 != 2]
    model = fit_nb_langid(_labeled(spark, train))
    en = "there is nothing better than a quiet walk through the old town"
    de = "es gibt nichts schöneres als einen spaziergang durch die stadt"
    probes = spark.createDataFrame(
        [
            (0, f"{en}. {en}. {en}."),           # monolingual
            (1, f"{en}. {de}. {en}. {de}."),     # alternating
            (2, f"{en}. {en}. {de}. {de}."),     # one block switch
            (3, ""),                             # no sentences
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in sentence_code_switch(probes, model).collect()}
    assert (out[0].n_sentences, out[0].n_langs, out[0].n_switches) == (3, 1, 0)
    assert out[0].dominant_lang == "en"
    assert (out[1].n_sentences, out[1].n_langs, out[1].n_switches) == (4, 2, 3)
    assert out[2].n_switches == 1
    assert out[2].n_langs == 2
    assert (out[3].n_sentences, out[3].n_langs, out[3].n_switches) == (0, 0, 0)
    assert out[3].dominant_lang is None


def test_sentence_split_rule(spark):
    from hk_housing_datahub_spark.operators.langid_nb import split_sentences

    got = spark.range(1).select(
        split_sentences(F.lit("One two!  Three?? Four. ")).alias("s")
    ).first().s
    assert got == ["one two", "three", "four"]


def test_zero_gram_language_stays_predictable(spark):
    """A language whose training docs are all shorter than n chars has
    no gram counts but must remain in the model — prior + all-floor
    scores, never silently dropped from the class set."""
    model = fit_nb_langid(
        _labeled(spark, [("en", "hello world"), ("xx", "ab")])
    )
    langs = {r.lang: r for r in model.langs.collect()}
    assert set(langs) == {"en", "xx"}
    assert langs["xx"].tot == 0
    import math

    assert langs["xx"].floor_ln == pytest.approx(math.log(1.0 / model.g))
    scores = {
        r.lang
        for r in nb_language_scores(
            _labeled(spark, [("?", "whatever text")]), model
        ).collect()
    }
    assert scores == {"en", "xx"}
