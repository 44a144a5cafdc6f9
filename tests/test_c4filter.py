from __future__ import annotations

import re

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.c4filter import (
    badword_hits_join,
    c4_page_flags,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_policy_rules(spark):
    text = "\n".join(
        [
            "this line ends with a period.",  # kept
            "this one has no terminal punctuation",  # dropped: no punct
            "too short.",  # dropped: < 5 words
            "a javascript heavy line with punctuation.",  # dropped: js word
            "ends with a question mark here?",  # kept
            'a quoted terminal works here too"',  # kept
        ]
    )
    out = c4_page_flags(_docs(spark, [(1, text)])).collect()[0]
    kept_lines = out["cleaned_text"].split("\n")
    assert kept_lines == [
        "this line ends with a period.",
        "ends with a question mark here?",
        'a quoted terminal works here too"',
    ]
    assert out["n_sentences"] == 3
    assert out["kept"]  # 3 sentences, no page gate tripped


def test_page_gates(spark):
    good = "one decent sentence here one.\n" * 3
    rows = [
        (1, good),
        (2, good + "\nthis page mentions badterm sadly."),
        (3, good + "\nlorem ipsum dolor sit amet."),
        (4, good + "\nint main() { return 0; }"),
        (5, "only two sentences here one.\nand the second one is here."),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in c4_page_flags(_docs(spark, rows), badwords=("badterm",)).collect()
    }
    assert out[1]["kept"]
    assert not out[2]["kept"] and out[2]["has_badword"]
    assert not out[3]["kept"] and out[3]["has_lorem"]
    assert not out[4]["kept"] and out[4]["has_brace"]
    assert not out[5]["kept"] and out[5]["n_sentences"] == 2


def test_badword_matches_words_not_substrings(spark):
    rows = [
        (1, "the dup word stands alone here."),
        (2, "duplicate is a different word entirely."),
        (3, "ends with dup"),
        (4, "dup starts the line here fine."),
    ]
    out = {
        r["doc_id"]: r["has_badword"]
        for r in c4_page_flags(_docs(spark, rows), badwords=("dup",)).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_badword_join_path_matches_regex_path(spark, sf_med):
    """Large-lexicon join path agrees with the literal regex path on
    which documents contain the word at all."""
    docs = spark.read.parquet(f"{sf_med}/documents.parquet").select(
        "doc_id", "text"
    )
    lex = spark.createDataFrame([("dup",), ("stale",)], ["word"])
    joined = {
        r["doc_id"]: r["badword_hits"]
        for r in badword_hits_join(docs, lex).collect()
    }
    flagged = {
        r["doc_id"]: r["has_badword"]
        for r in c4_page_flags(docs, badwords=("dup", "stale")).collect()
    }
    assert set(joined) == set(flagged)
    for d, hits in joined.items():
        assert (hits > 0) == flagged[d]
    # and hit counts are exact token counts
    pdf = docs.toPandas()
    for _, row in pdf.sample(50, random_state=0).iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", row.text.lower()) if t]
        want = sum(1 for t in toks if t in ("dup", "stale"))
        assert joined[row.doc_id] == want


def test_page_flags_plan_is_map_only(spark, sf_med):
    docs = spark.read.parquet(f"{sf_med}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        c4_page_flags(docs, badwords=("dup",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_funnel_badwords_stage_drops_convicted_pages(spark):
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    rows = [
        (i, "clean words flow nicely along here " * 10 + f"tail{i}", "en", "s")
        for i in range(8)
    ] + [
        (100, "this text contains badterm inside " * 10, "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", badwords=("badterm",))
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 100 not in ids
    assert ids  # the clean docs survive the rest of the funnel
