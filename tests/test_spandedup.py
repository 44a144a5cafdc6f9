"""Exact duplicated-substring (suffix-array-style) dedup tests.

Covers: cross-doc duplicated spans, in-doc repetition, interval merging of
overlapping windows, the coverage profile, document gating, span surgery,
and a DuckDB twin parity check of the whole gram→count→island pipeline.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from hk_housing_datahub_spark.operators.spandedup import (
    drop_duplicated_span_docs,
    duplicated_span_profile,
    duplicated_spans,
    remove_duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    # d1/d2 share a 6-token span inside otherwise-unique text;
    # d3 repeats its own 5-token phrase twice (in-doc duplication);
    # d4 is 3 tokens (< k, can never be flagged);
    # d5 is fully unique.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        {"doc_id": 1, "text": _words("u", 8) + " " + shared + " " + _words("v", 8)},
        {"doc_id": 2, "text": _words("w", 4) + " " + shared + " " + _words("x", 12)},
        {"doc_id": 3, "text": "p q r s t " + _words("y", 6) + " p q r s t"},
        {"doc_id": 4, "text": "tiny doc here"},
        {"doc_id": 5, "text": _words("z", 30)},
    ]
    return _docs(spark, rows)


def test_cross_doc_span_detected_and_merged(spark, corpus):
    spans = duplicated_spans(corpus, k=4).orderBy("doc_id", "s").collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["s"], r["e"]))
    # d1: shared span is tokens 8..14 (6 tokens); three 4-gram windows
    # starting at 8, 9, 10 merge into exactly [8, 14).
    assert by_doc[1] == [(8, 14)]
    # d2: shared span at tokens 4..10.
    assert by_doc[2] == [(4, 10)]
    # d3: both copies of the 5-token phrase flagged: [0,5) and [11,16).
    assert by_doc[3] == [(0, 5), (11, 16)]
    assert 4 not in by_doc and 5 not in by_doc


def test_profile_fractions(spark, corpus):
    prof = {
        r["doc_id"]: r
        for r in duplicated_span_profile(corpus, k=4).collect()
    }
    assert prof[1]["dup_tokens"] == 6 and prof[1]["n_tokens"] == 22
    assert prof[2]["dup_tokens"] == 6 and prof[2]["n_tokens"] == 22
    assert prof[3]["dup_tokens"] == 10 and prof[3]["n_tokens"] == 16
    assert prof[4]["dup_tokens"] == 0 and prof[4]["dup_frac"] == 0.0
    assert prof[5]["dup_tokens"] == 0
    assert abs(prof[3]["dup_frac"] - 10 / 16) < 1e-12


def test_drop_gate_keeps_low_coverage(spark, corpus):
    kept = sorted(
        r["doc_id"]
        for r in drop_duplicated_span_docs(
            corpus, k=4, max_dup_frac=0.3
        ).collect()
    )
    # d3 (10/16 = 0.625) is dropped; d1/d2 (6/22 ≈ 0.27) survive.
    assert kept == [1, 2, 4, 5]


def test_span_surgery_removes_all_copies(spark, corpus):
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_duplicated_spans(corpus, k=4).collect()
    }
    # d3: both copies of "p q r s t" removed, unique middle survives.
    assert out[3] == _words("y", 6)
    # d1: shared middle removed, unique head+tail survive.
    assert out[1] == _words("u", 8) + " " + _words("v", 8)
    # untouched docs: normalized original text.
    assert out[4] == "tiny doc here"
    assert out[5] == _words("z", 30)


def test_empty_and_whitespace_docs(spark):
    docs = _docs(
        spark,
        [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "   \n\t "},
            {"doc_id": 3, "text": _words("a", 10)},
            {"doc_id": 4, "text": _words("a", 10)},
        ],
    )
    prof = {
        r["doc_id"]: r for r in duplicated_span_profile(docs, k=4).collect()
    }
    assert prof[1]["n_tokens"] == 0 and prof[1]["dup_frac"] == 0.0
    assert prof[2]["n_tokens"] == 0
    # the two identical 10-token docs are fully covered
    assert prof[3]["dup_frac"] == 1.0 and prof[4]["dup_frac"] == 1.0
    surg = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_duplicated_spans(docs, k=4).collect()
    }
    assert surg[1] == "" and surg[3] == ""


def test_duckdb_twin_parity_on_real_corpus(spark, sf_med):
    """gram→count≥2→island-merge coverage computed independently in DuckDB
    over the sf0.01 documents table must match the Spark profile exactly."""
    k = 8
    docs = spark.read.parquet(f"{sf_med}/documents.parquet").select(
        "doc_id", "text"
    )
    got = (
        duplicated_span_profile(docs, k=k)
        .select("doc_id", "n_tokens", "dup_tokens")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_med}/documents.parquet')"
    )
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
                      THEN [] :: varchar[]
                      ELSE string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
                 END AS t
          FROM documents),
        g AS (
          SELECT doc_id, i - 1 AS s, array_to_string(t[i:i+{k}-1], chr(31)) AS gram
          FROM toks, unnest(generate_series(1, len(t) - {k} + 1)) AS u(i)
          WHERE len(t) >= {k}),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        hits AS (SELECT doc_id, s, s + {k} AS e FROM g JOIN d USING (gram)),
        isl AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS brk
          FROM hits),
        isl2 AS (
          SELECT doc_id, s, e,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
          FROM isl),
        merged AS (
          SELECT doc_id, min(s) AS s, max(e) AS e
          FROM isl2 GROUP BY doc_id, island),
        cov AS (SELECT doc_id, sum(e - s) AS dup_tokens FROM merged GROUP BY doc_id)
        SELECT t.doc_id,
               len(t.t) :: bigint AS n_tokens,
               coalesce(c.dup_tokens, 0) :: bigint AS dup_tokens
        FROM toks t LEFT JOIN cov c USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # the corpus genuinely exercises the operator: some doc has coverage
    assert (got["dup_tokens"] > 0).any()
