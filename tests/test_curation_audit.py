"""Curation-audit battery (operators/textops.py): readability goldens,
bad-words gate semantics, and the one-pass threshold sweep against
direct per-threshold filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.textops import (
    badwords_filter,
    quality_threshold_sweep,
    readability_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_readability_golden(spark):
    out = {
        r.doc_id: r
        for r in readability_scores(
            _docs(
                spark,
                [
                    (0, "the cat sat. the dog ran!"),
                    (1, "a b"),
                ],
            )
        ).collect()
    }
    r = out[0]
    # words=6, sentences=2, vowel groups: e,a,a,e,o,a = 6
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    assert r.flesch == pytest.approx(
        round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    )
    assert r.fk_grade == pytest.approx(
        round(0.39 * (6 / 2) + 11.8 * (6 / 6) - 15.59, 6)
    )
    # 'the' repeats → 5 distinct of 6
    assert r.ttr == pytest.approx(round(5 / 6, 6))
    # no sentence punctuation → floored at one sentence
    assert out[1].n_sentences == 1


def test_badwords_gate_counts_occurrences(spark):
    docs = _docs(
        spark,
        [
            (0, "clean words only here"),
            (1, "one bad word spam here"),
            (2, "spam spam spam is too much"),
        ],
    )
    bad = spark.createDataFrame([("spam",)], ["term"])
    kept = {
        r.doc_id: r.n_badword_hits
        for r in badwords_filter(docs, bad, max_hits=1).collect()
    }
    assert kept == {0: 0, 1: 1}  # doc 2 (3 hits) dropped
    strict = badwords_filter(docs, bad, max_hits=0)
    assert {r.doc_id for r in strict.collect()} == {0}


def test_threshold_sweep_matches_direct_filters(spark, sf_small):
    from hk_housing_datahub_spark.functions.text import (
        quality_score,
        token_count,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    sweep = {
        r.threshold: (r.surviving_docs, r.surviving_tokens)
        for r in quality_threshold_sweep(docs).collect()
    }
    # survivors are cumulative → monotone non-increasing in threshold
    ordered = [sweep[t] for t in sorted(sweep)]
    assert all(
        later[0] <= earlier[0] and later[1] <= earlier[1]
        for earlier, later in zip(ordered, ordered[1:])
    )
    for th, (n_docs, n_toks) in sweep.items():
        direct = docs.select(
            quality_score(F.col("text")).alias("q"),
            token_count(F.col("text")).alias("n"),
        ).filter(
            # bucket floor semantics: survivors are docs whose BUCKET edge
            # >= threshold, i.e. floor(q*20)/20 >= th
            F.least(
                F.floor(F.col("q") * 20).cast("int"), F.lit(19)
            ) / 20.0
            >= th
        )
        row = direct.agg(
            F.count(F.lit(1)).alias("c"), F.sum("n").alias("s")
        ).first()
        assert (row.c, row.s) == (n_docs, n_toks), th


def test_allocation_fairness_golden(spark):
    from hk_housing_datahub_spark.operators.rollups import (
        allocation_fairness,
    )

    # perfectly equal: Gini = 0
    eq = spark.createDataFrame(
        [(f"h{i}", 1) for i in range(4) for _ in range(5)], ["host", "w"]
    )
    r = allocation_fairness(eq, "host").first()
    assert (r.n_keys, r.total, r.gini) == (4, 20, 0.0)
    assert r.top1_share == pytest.approx(0.25)
    # maximally unequal (one key holds everything): Gini = (n-1)/n
    hot = spark.createDataFrame(
        [("h0", 100), ("h1", 0), ("h2", 0), ("h3", 0)], ["host", "w"]
    )
    r = allocation_fairness(hot, "host", weight_col="w").first()
    assert r.gini == pytest.approx((4 - 1) / 4)
    assert r.top1_share == pytest.approx(1.0)
    # hand case: x = [1, 2, 3, 4] → G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    mid = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], ["host", "w"]
    )
    assert allocation_fairness(mid, "host", "w").first().gini == pytest.approx(0.25)


def test_format_profile_golden(spark):
    from hk_housing_datahub_spark.operators.textops import format_profile

    docs = spark.createDataFrame(
        [
            (0, "plain prose here\n- a bullet\nx = f(y);\na | b | c"),
            (1, "1. numbered\n2) also numbered\nprose"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in format_profile(docs).collect()}
    r = out[0]
    assert r.n_lines == 4
    assert r.code_frac == pytest.approx(0.25)   # the ';' line
    assert r.table_frac == pytest.approx(0.25)  # two '|' delimiters
    assert r.bullet_frac == pytest.approx(0.25)
    assert out[1].bullet_frac == pytest.approx(round(2 / 3, 6))
    assert out[2].n_lines == 0 and out[2].code_frac is None


def test_funnel_format_gate_and_lm_families(spark, sf_small):
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    base = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", min_quality=0.3)
    ).count()
    # format gate: corpus text has no newlines → single prose line per
    # doc → fractions 0 → a permissive cap drops nothing
    fmt = prepare_training_corpus(
        docs,
        CorpusRecipe(
            dedup="exact", min_quality=0.3,
            max_bullet_frac=0.5, max_code_frac=0.5,
        ),
    ).count()
    assert fmt == base
    # a zero cap on code_frac only drops docs with code-shaped lines —
    # plant some
    from pyspark.sql import functions as F

    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit("\nx = f(y);")),
        ).otherwise(F.col("text")),
    )
    strict = prepare_training_corpus(
        planted,
        CorpusRecipe(dedup="exact", min_quality=0.3, max_code_frac=0.0),
    )
    assert strict.filter(F.col("doc_id") % 7 == 0).count() == 0
    # kn / kn3 perplexity families plug into the same gate
    for fam in ("kn", "kn3"):
        loose = prepare_training_corpus(
            docs,
            CorpusRecipe(
                dedup="exact", min_quality=0.3,
                max_perplexity=1e9, lm=fam,
            ),
            lm_reference=docs,
        ).count()
        assert loose == base, fam
        harsh = prepare_training_corpus(
            docs,
            CorpusRecipe(
                dedup="exact", min_quality=0.3,
                max_perplexity=20.0, lm=fam,
            ),
            lm_reference=docs,
        ).count()
        assert harsh < base, fam


def test_confusable_fold_collapses_spoofs(spark):
    from hk_housing_datahub_spark.functions.text import (
        fold_confusables,
        normalize_text,
    )

    rows = [
        (0, "abc example offer"),
        (1, "аbс example offer"),   # Cyrillic а and с
        (2, "abc ехаmple offer"),   # Cyrillic е, х, а
        (3, "genuinely different"),
        (4, "αbc εxample offer"),   # Greek α and ε (lowercase)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    keys = {
        r.doc_id: r.k
        for r in d.select(
            "doc_id",
            F.md5(normalize_text(fold_confusables(F.col("text")))).alias("k"),
        ).collect()
    }
    assert keys[0] == keys[1] == keys[2] == keys[4]
    assert keys[3] != keys[0]
    # plain normalized hashing does NOT collapse them
    plain = {
        r.doc_id: r.k
        for r in d.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("k")
        ).collect()
    }
    assert plain[0] != plain[1]


def test_funnel_fold_confusables_knob(spark):
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    base_text = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(i, base_text + f"tail{i}") for i in range(8)]
    # spoofed twin of doc 0 (Cyrillic а/е/о) under a higher id
    spoofed = (
        rows[0][1]
        .replace("a", "а")
        .replace("e", "е")
        .replace("o", "о")
    )
    rows.append((100, spoofed))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", dedup_threshold=1.01)
    )
    folded = prepare_training_corpus(
        docs,
        CorpusRecipe(
            dedup="exact", dedup_threshold=1.01, fold_confusables=True
        ),
    )
    plain_ids = {r.doc_id for r in plain.select("doc_id").collect()}
    folded_ids = {r.doc_id for r in folded.select("doc_id").collect()}
    assert 100 in plain_ids       # plain hashing misses the spoof
    assert 100 not in folded_ids  # folded key collapses it onto doc 0
    assert 0 in folded_ids


def test_novelty_scores_semantics(spark):
    from hk_housing_datahub_spark.operators.decontaminate import (
        novelty_scores,
    )

    ref = spark.createDataFrame(
        [(0, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [
            # pure recombination: every 8-gram present in the reference
            (1, "one two three four five six seven eight nine"),
            # entirely novel
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
            # half-and-half: novel prefix then a full reference window
            (3, "x1 x2 x3 x4 x5 x6 x7 one two three four five six seven eight"),
            # too short for an 8-gram
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in novelty_scores(probes, ref, n=8).collect()}
    assert out[1].novelty == 0.0
    assert out[2].novelty == 1.0
    assert 0 < out[3].novelty < 1
    assert out[3].n_known == 1  # exactly the aligned reference window
    assert out[4].n_ngrams is None and out[4].novelty is None


def test_funnel_novelty_gate(spark, sf_small):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    tgt = docs.filter(F.col("doc_id") % 2 == 1)
    base = prepare_training_corpus(
        tgt, CorpusRecipe(dedup="exact", min_quality=0.3)
    ).count()
    # zero floor keeps everything the floorless recipe keeps
    loose = prepare_training_corpus(
        tgt,
        CorpusRecipe(dedup="exact", min_quality=0.3, min_novelty=0.0),
        novelty_reference=ref,
    ).count()
    assert loose == base
    # a near-1 floor strictly shrinks (synthetic docs share vocabulary)
    harsh = prepare_training_corpus(
        tgt,
        CorpusRecipe(dedup="exact", min_quality=0.3, min_novelty=0.999),
        novelty_reference=ref,
    ).count()
    assert harsh < base
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prepare_training_corpus(
            tgt, CorpusRecipe(dedup="exact", min_novelty=0.5)
        ).count()


def test_cjk_sentence_boundaries(spark):
    """zh/ja prose uses full-width terminators — both the readability
    sentence count and the code-switch splitter must see them."""
    from hk_housing_datahub_spark.operators.langid_nb import (
        split_sentences,
    )

    r = readability_scores(
        _docs(spark, [(0, "你好世界。再见了！真的吗？")])
    ).first()
    assert r.n_sentences == 3
    got = spark.range(1).select(
        split_sentences(F.lit("第一句。第二句！third one.")).alias("s")
    ).first().s
    assert got == ["第一句", "第二句", "third one"]


def test_coherence_scores_golden(spark):
    from hk_housing_datahub_spark.operators.textops import (
        coherence_scores,
    )

    docs = _docs(
        spark,
        [
            # identical adjacent sentences → jaccard 1 everywhere
            (0, "the cat sat here. the cat sat here. the cat sat here."),
            # zero-overlap fragments → coherence 0
            (1, "alpha beta gamma. delta epsilon zeta. eta theta iota."),
            # half overlap: {a,b,c,d} vs {c,d,e,f} → 2/6
            (2, "a b c d. c d e f."),
            # single sentence → NULL
            (3, "no boundary here at all"),
        ],
    )
    out = {r.doc_id: r for r in coherence_scores(docs).collect()}
    assert out[0].mean_coherence == 1.0 and out[0].min_coherence == 1.0
    assert out[1].mean_coherence == 0.0
    assert out[2].mean_coherence == pytest.approx(round(2 / 6, 6))
    assert out[3].n_sentences == 1 and out[3].mean_coherence is None


def test_funnel_coherence_gate(spark):
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    flowing = (
        "the old town square fills with people every morning. "
        "people in the square buy bread and coffee. "
        "the coffee sellers know the town by name."
    )
    stitched = (
        "alpha beta gamma delta epsilon zeta eta theta. "
        "completely unrelated fragment about something else. "
        "yet another disjoint scrap with new words entirely."
    )
    docs = spark.createDataFrame(
        [(i, flowing + f" extra{i}") for i in range(4)]
        + [(10 + i, stitched + f" tail{i}") for i in range(4)],
        ["doc_id", "text"],
    )
    out = prepare_training_corpus(
        docs,
        CorpusRecipe(
            dedup="exact", dedup_threshold=1.01, min_coherence=0.05
        ),
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert all(i in ids for i in range(4))         # flowing prose kept
    assert all(10 + i not in ids for i in range(4))  # fragments dropped


def test_quality_sweep_empty_and_filtered_input(spark):
    """Regression (round-5 review): the ordered-array-fold rewrite must
    return zero rows on an empty corpus — Spark's sequence(1, 0)
    DESCENDS, so an unguarded explode would index into the empty
    bucket array and throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT. The
    audit job runs this section unconditionally over whatever --input
    points at."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert quality_threshold_sweep(empty).collect() == []
    one = spark.createDataFrame([(1, "a decent doc with words")],
                                "doc_id long, text string")
    rows = quality_threshold_sweep(one).collect()
    assert len(rows) == 1 and rows[0]["surviving_docs"] == 1
