"""Composed corpus-preparation funnel: stage semantics + determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.dedup import drop_near_dups
from hk_housing_datahub_spark.pipelines.corpus import (
    CorpusRecipe,
    corpus_stats,
    prepare_training_corpus,
)


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet").cache()


def test_funnel_semantics_and_columns(spark, docs):
    recipe = CorpusRecipe(dedup="exact", min_quality=0.3, pack_budget=512)
    out = prepare_training_corpus(docs, recipe)
    cols = set(out.columns)
    assert {"doc_id", "text", "quality", "n_tokens", "pii_total",
            "bucket", "bin_id"} <= cols
    rows = out.count()
    # survivors == dedup survivors passing the quality gate (sampling off)
    dd = drop_near_dups(docs)
    from hk_housing_datahub_spark.functions.text import quality_score

    want = dd.filter(quality_score(F.col("text")) >= 0.3).count()
    assert rows == want > 0
    # every doc landed in a bin; fills are positive
    assert out.filter(F.col("bin_id").isNull()).count() == 0


def test_funnel_deterministic_and_lsh_matches_exact(spark, docs):
    a = prepare_training_corpus(docs, CorpusRecipe(dedup="lsh"))
    b = prepare_training_corpus(docs, CorpusRecipe(dedup="lsh"))
    ka = sorted((r.doc_id, r.bucket, r.bin_id) for r in a.collect())
    kb = sorted((r.doc_id, r.bucket, r.bin_id) for r in b.collect())
    assert ka == kb  # byte-identical corpus layout across runs
    # the 100-TB LSH path lands on the exact path's survivor set here
    c = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    assert sorted(r.doc_id for r in c.collect()) == sorted(
        r.doc_id for r in a.collect()
    )


def test_funnel_mixture_and_stats(spark, docs):
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    a, b = sorted(srcs)[:2]
    recipe = CorpusRecipe(
        dedup="exact", mixture={a: 0.6, b: 0.4}, mixture_total=150,
        pack_budget=256,
    )
    out = prepare_training_corpus(docs, recipe)
    got_src = {r[0] for r in out.select("source").distinct().collect()}
    assert got_src <= {a, b}
    stats = corpus_stats(docs, out).first()
    assert stats.docs_in == docs.count()
    assert 0 < stats.docs_out <= stats.docs_in
    assert stats.bins > 0 and stats.tokens > 0
    # the scrubbed text carries no raw emails (placeholder may appear)
    leaked = out.filter(
        F.col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
    )
    assert leaked.count() == 0


def test_gopher_flags_trip_on_constructed_violations(spark):
    from hk_housing_datahub_spark.operators.textops import gopher_quality_flags

    # varied vocabulary: no repeated 3-grams, word lengths ~4-8 chars
    good = " ".join(f"word{i} text{i % 97}x" for i in range(60))
    cases = [
        ("short", "too few words here", "flag_word_count"),
        ("longwords", " ".join(["pneumonoultramicroscopic"] * 60),
         "flag_mean_word_len"),
        ("symbols", "# " * 60 + good, "flag_symbol_ratio"),
        ("bullets", "\n".join("- item %d word word" % i for i in range(60)),
         "flag_bullet_lines"),
        ("repeat", "alpha beta gamma " * 40, "flag_repetition"),
        ("clean", good, None),
    ]
    df = spark.createDataFrame(
        [(k, t) for k, t, _ in cases], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    for k, _, flag in cases:
        r = out[k]
        if flag is None:
            assert r.gopher_pass, r
        else:
            assert r[flag], (k, flag, r)
            assert not r.gopher_pass


def test_recipe_gopher_gate(spark, docs):
    from hk_housing_datahub_spark.operators.textops import gopher_quality_flags

    base = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    gated = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", gopher=True)
    )
    assert gated.count() <= base.count()
    assert set(gated.columns) == set(base.columns)  # flags don't leak
    # the gated set == base minus gopher violators (on the same text)
    viol = gopher_quality_flags(base.select("doc_id", "text")).filter(
        ~F.col("gopher_pass")
    )
    assert gated.count() == base.count() - viol.count()


def test_decontamination_catches_planted_overlap(spark, docs):
    from hk_housing_datahub_spark.operators.decontaminate import (
        contaminated_ids,
        drop_contaminated,
    )

    # plant: benchmark rows copy a 13+-token span from two known LONG docs
    two = (
        docs.filter(F.size(F.split("text", "\\s+")) >= 30)
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    n_tok = 13

    def span(text):  # a 20-token snippet from the middle
        toks = text.split()
        assert len(toks) >= 25
        return " ".join(toks[3 : 3 + 20])

    bench = spark.createDataFrame(
        [("q1", "Which is true? " + span(two[0].text)),
         ("q2", span(two[1].text) + " (pick one)")],
        ["qid", "text"],
    )
    bad = {r.doc_id for r in contaminated_ids(docs, bench, n=n_tok).collect()}
    assert {two[0].doc_id, two[1].doc_id} <= bad
    kept = drop_contaminated(docs, bench, n=n_tok)
    assert kept.count() == docs.count() - len(bad)
    assert kept.filter(
        F.col("doc_id").isin(two[0].doc_id, two[1].doc_id)
    ).count() == 0
    # a benchmark sharing nothing flags nothing
    clean_bench = spark.createDataFrame(
        [("q", " ".join(f"zz{i}qx" for i in range(30)))], ["qid", "text"]
    )
    assert contaminated_ids(docs, clean_bench, n=n_tok).count() == 0


def test_funnel_with_benchmark_decontamination(spark, docs):
    two = (
        docs.filter(F.size(F.split("text", "\\s+")) >= 30)
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    snippet = " ".join(two[0].text.split()[2:22])
    bench = spark.createDataFrame([("q", snippet)], ["qid", "text"])
    base = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    gated = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact"), benchmark=bench
    )
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    gated_ids = {r.doc_id for r in gated.select("doc_id").collect()}
    assert two[0].doc_id in base_ids and two[0].doc_id not in gated_ids
    # contamination-driven drops may promote a different cluster member to
    # canonical, so exact subset is not guaranteed — only strictly fewer
    # docs and the contaminated id gone
    assert len(gated_ids) < len(base_ids)


def test_recipe_boilerplate_stage(spark):
    footer = "all rights reserved contact us terms of service"
    docs = spark.createDataFrame(
        [
            (i, f"real content number {i} with words aplenty\n{footer}")
            for i in range(12)
        ],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("web"))
    out = prepare_training_corpus(
        docs,
        CorpusRecipe(dedup="exact", boilerplate_max_df=5, pack_budget=64),
    )
    rows = out.collect()
    assert len(rows) == 12  # docs differ once the shared footer is gone
    assert all(footer not in r.text for r in rows)
    assert all(f"number {r.doc_id}" in r.text for r in rows)


def test_paragraph_dedup_keep_first(spark):
    from hk_housing_datahub_spark.operators.textops import dedup_paragraphs

    shared = "this exact promotional paragraph appears on many pages"
    docs = spark.createDataFrame(
        [
            (0, f"unique opener zero\n\n{shared}\n\nunique closer zero"),
            (1, f"{shared}\n\nunique middle one"),
            # intra-doc duplicate: second copy must also drop
            (2, f"{shared}\n\n{shared}\n\nunique tail two"),
            (3, "entirely original paragraph three"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # globally-first copy = (doc 0, pos 1): survives there, nowhere else
    assert shared in out[0].text
    assert shared not in out[1].text and shared not in out[2].text
    assert out[0].n_dropped_paras == 0
    assert out[1].n_dropped_paras == 1
    assert out[2].n_dropped_paras == 2
    assert out[1].text == "unique middle one"
    assert out[2].text == "unique tail two"
    assert out[3].text == "entirely original paragraph three"
    # deterministic under any layout
    again = {
        r.doc_id: r.text
        for r in dedup_paragraphs(docs.repartition(7)).collect()
    }
    assert again == {k: v.text for k, v in out.items()}


def test_paragraph_dedup_keep_none_and_normalization(spark):
    from hk_housing_datahub_spark.operators.textops import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            # normalization: case/whitespace/digit differences still match
            (0, "Visit Page 17 For   More\n\nalpha original paragraph"),
            (1, "visit page 99 for more\n\nbeta original paragraph"),
            # short paragraphs are structure: kept even when repeated
            (2, "- - -\n\ngamma original paragraph"),
            (3, "- - -\n\ndelta original paragraph"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs, keep="none").collect()}
    assert out[0].text == "alpha original paragraph"
    assert out[1].text == "beta original paragraph"
    assert out[2].text == "- - -\n\ngamma original paragraph"
    assert out[3].text == "- - -\n\ndelta original paragraph"
    # a doc that is ALL duplicates keeps its row with empty text
    alldup = spark.createDataFrame(
        [(0, "the same paragraph everywhere"),
         (1, "the same paragraph everywhere")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dedup_paragraphs(alldup, keep="none").collect()}
    assert rows[0].text == "" and rows[1].text == ""
    assert rows[0].n_dropped_paras == 1
    with pytest.raises(ValueError):
        dedup_paragraphs(alldup, keep="last")


def test_recipe_paragraph_dedup_stage(spark):
    shared = "subscribe to our newsletter for weekly property updates"
    # letters, not digits: the CCNet hash key squashes digits to 0, so
    # numeric suffixes would make every opener a cross-corpus duplicate
    words = ("harbour kowloon tower", "garden estate midlevels",
             "peak mansion central", "bay court aberdeen",
             "terrace villa stanley", "plaza block mongkok",
             "residence square wanchai", "house lane taipo")
    docs = spark.createDataFrame(
        [
            # unique paragraphs share NO tokens across docs, or the
            # funnel's near-dup stage would (correctly) collapse them
            # once the shared paragraph is deduplicated away
            (i, f"{w} spacious bright airy"
                .replace(" ", f" {'abcdefgh'[i]}") + f"\n\n{shared}")
            for i, w in enumerate(words)
        ],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("web"))
    out = prepare_training_corpus(
        docs,
        CorpusRecipe(dedup="exact", paragraph_dedup="first", pack_budget=64),
    )
    rows = out.collect()
    assert len(rows) == 8
    kept_with_shared = [r for r in rows if shared in r.text]
    assert len(kept_with_shared) == 1  # exactly the globally-first copy
    assert all(f"{'abcdefgh'[r.doc_id]}airy" in r.text for r in rows)


def test_recipe_span_dedup_stage(spark, docs):
    """The substring-dedup gate slots after doc-level dedup: survivors are
    exactly the doc-dedup survivors whose duplicated-span coverage (counted
    over the survivor set) is within the cap."""
    from hk_housing_datahub_spark.operators.spandedup import (
        drop_duplicated_span_docs,
    )

    recipe = CorpusRecipe(
        dedup="exact", max_dup_span_frac=0.2, span_k=8, pack_budget=512
    )
    out = prepare_training_corpus(docs, recipe)
    dd = drop_near_dups(docs)
    want = drop_duplicated_span_docs(dd, k=8, max_dup_frac=0.2)
    got_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert got_ids == want_ids and got_ids


def test_gopher_repetition_flags_trip_and_match_reference(spark):
    """Constructed violations trip each repetition-flag family, and every
    metric equals a pure-Python reference of the documented definitions
    (sorted-run numerators == per-value group-by sums)."""
    import collections
    import re as _re

    from hk_housing_datahub_spark.operators.textops import (
        GOPHER_REPETITION_RULES,
        gopher_repetition_flags,
    )

    uniq = " ".join(f"tok{i} filler{i % 89}b" for i in range(80))
    cases = [
        # same line 10 times -> dup line + dup para fractions
        ("dup_lines", "\n".join(["repeated line of text"] * 10),
         ["flag_dup_line_frac", "flag_dup_line_char_frac"]),
        # two long paragraphs, identical -> dup para char fraction
        ("dup_paras", (uniq + "\n\n") * 3, ["flag_dup_para_frac",
         "flag_dup_para_char_frac"]),
        # one dominant bigram -> top n-gram char mass
        ("top_gram", "click here " * 50 + uniq,
         ["flag_top_2gram_char_frac"]),
        # a repeated 10-word sentence scattered through unique filler
        ("dup_gram", " ".join(
            ("the quick brown fox jumps over the lazy sleeping dog "
             + f"u{i} v{i} w{i}") for i in range(20)),
         ["flag_dup_10gram_char_frac", "flag_dup_5gram_char_frac"]),
        ("clean", uniq, []),
    ]
    df = spark.createDataFrame(
        [(k, t) for k, t, _ in cases], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_repetition_flags(df).collect()}
    for k, _, flags in cases:
        r = out[k]
        if not flags:
            assert r.rep_pass, r
        for fl in flags:
            assert r[fl], (k, fl, r)
            assert not r.rep_pass

    def norm(t):
        return _re.sub(r"\s+", " ", t.lower()).strip()

    def sh(t, n):
        w = norm(t).split(" ") if norm(t) else []
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    def dup(arr):
        c = collections.Counter(arr)
        return (sum(v - 1 for v in c.values()),
                sum((v - 1) * len(k) for k, v in c.items()))

    for k, t, _ in cases:
        lines = [x.strip() for x in t.split("\n") if x.strip()]
        paras = [x.strip() for x in _re.split(r"\n{2,}", t) if x.strip()]
        nc = len(norm(t))
        exp = {
            "dup_line_frac": dup(lines)[0] / len(lines) if lines else 0.0,
            "dup_para_frac": dup(paras)[0] / len(paras) if paras else 0.0,
            "dup_line_char_frac":
                dup(lines)[1] / sum(map(len, lines)) if lines else 0.0,
            "dup_para_char_frac":
                dup(paras)[1] / sum(map(len, paras)) if paras else 0.0,
        }
        for n in (2, 3, 4):
            c = collections.Counter(sh(t, n))
            top = max((v * len(g) for g, v in c.items()), default=0)
            exp[f"top_{n}gram_char_frac"] = top / nc if nc else 0.0
        for n in range(5, 11):
            exp[f"dup_{n}gram_char_frac"] = (
                dup(sh(t, n))[1] / nc if nc else 0.0
            )
        for name, _thr in GOPHER_REPETITION_RULES:
            assert abs(out[k][name] - exp[name]) < 1e-12, (k, name)


def test_recipe_gopher_repetition_gate(spark, docs):
    base = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    gated = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", gopher_repetition=True)
    )
    assert gated.count() <= base.count()
    assert gated.columns == base.columns


def test_funnel_dsir_selection_stage(spark, docs):
    recipe = CorpusRecipe(dedup="exact", dsir_top_k=50, dsir_seed=11)
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    out = prepare_training_corpus(docs, recipe, dsir_reference=target)
    assert out.count() == 50
    # deterministic under the seed
    out2 = prepare_training_corpus(docs, recipe, dsir_reference=target)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )
    # selection aims toward the target: the kept set is en-heavier than
    # the funnel survivors as a whole
    base = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    def en_share(df):
        n = df.count()
        return df.filter(F.col("lang") == "en").count() / n
    assert en_share(out) > en_share(base)
    # guard: the knob without its reference is an explicit error
    with pytest.raises(ValueError, match="dsir_reference"):
        prepare_training_corpus(docs, recipe)


def test_funnel_quality_classifier_stage(spark, docs):
    recipe = CorpusRecipe(
        dedup="exact", clf_threshold=0.5, clf_dim=1024, clf_iterations=12
    )
    pos = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    out = prepare_training_corpus(docs, recipe, clf_positive=pos)
    base = prepare_training_corpus(docs, CorpusRecipe(dedup="exact"))
    # the gate selects (a strict subset) and selects TOWARD the
    # positives: kept set is en-heavier than the ungated survivors
    assert 0 < out.count() < base.count()

    def en_share(df):
        return df.filter(F.col("lang") == "en").count() / df.count()

    assert en_share(out) > en_share(base)
    # deterministic: the zero-init fixed-iteration fit is a pure function
    out2 = prepare_training_corpus(docs, recipe, clf_positive=pos)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )
    # the knob without its reference is an explicit error
    with pytest.raises(ValueError, match="clf_positive"):
        prepare_training_corpus(docs, recipe)


def test_pages_to_documents_glue_feeds_the_funnel(spark, docs):
    """Crawl output → pages_to_documents → prepare_training_corpus runs
    end to end: boilerplate never reaches the corpus, ids are md5(url),
    source carries the host, and the funnel accepts the shape as-is."""
    from hk_housing_datahub_spark.pipelines.corpus import pages_to_documents

    url = F.concat(
        F.lit("https://h"), F.pmod("doc_id", F.lit(7)).cast("string"),
        F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit('<div><a href="/">Home</a> <a href="/x">About us</a></div><p>'),
        F.col("text"),
        F.lit('</p><footer><a href="/t">Terms and conditions</a></footer>'),
    )
    pages = docs.select(
        url.alias("url_canon"), html.alias("html"), "lang",
        F.timestamp_seconds(F.lit(0)).alias("warc_ts"),
    )
    d = pages_to_documents(pages)
    assert set(d.columns) == {"doc_id", "text", "lang", "source", "url", "warc_ts"}
    sample = d.limit(5).collect()
    assert all(len(r["doc_id"]) == 32 for r in sample)  # md5 hex
    assert all(r["source"].endswith(".example.org") for r in sample)
    assert all("Terms and conditions" not in r["text"] for r in sample)
    assert all("Home" not in r["text"] for r in sample)
    out = prepare_training_corpus(
        d, CorpusRecipe(dedup="exact", min_quality=0.0, pack_budget=512)
    )
    assert out.count() > 0
    assert {"bin_id", "bucket"} <= set(out.columns)
