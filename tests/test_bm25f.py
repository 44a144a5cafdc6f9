"""BM25F fielded ranking (operators/bm25.py bm25f_search): field-weight
semantics, saturation vs naive per-field BM25 addition, and exact DuckDB
parity of the full fielded pipeline."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.bm25 import bm25f_search


def _fields(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "field", "text"])


def _queries(spark, rows):
    return spark.createDataFrame(rows, ["qid", "qtext"])


def test_title_hit_outranks_body_hit(spark):
    docs = _fields(
        spark,
        [
            (1, "title", "apple pie recipe"),
            (1, "body", "flour butter sugar baking notes and more notes"),
            (2, "title", "baking basics"),
            (2, "body", "apple apple techniques for beginners and experts"),
            (3, "title", "unrelated topic"),
            (3, "body", "nothing relevant here at all whatsoever today"),
        ],
    )
    q = _queries(spark, [(0, "apple")])
    heavy = bm25f_search(
        docs, q, weights={"title": 10.0, "body": 1.0}, k=3
    ).collect()
    ranked = [r.doc_id for r in sorted(heavy, key=lambda r: r.rank)]
    # with the title field weighted heavily, doc 1's single title hit
    # outranks doc 2's repeated body hits; doc 3 never matches
    assert ranked[0] == 1
    assert 2 in ranked
    assert 3 not in ranked
    # with body weighted instead, repetition in the body wins
    body = bm25f_search(
        docs, q, weights={"title": 1.0, "body": 10.0}, k=1
    ).first()
    assert body.doc_id == 2


def test_field_weights_change_the_winner(spark):
    docs = _fields(
        spark,
        [
            (1, "title", "spark engine"),
            (1, "body", "row batch column"),
            (2, "title", "row batch column"),
            (2, "body", "spark spark spark engine engine details"),
        ],
    )
    q = _queries(spark, [(0, "spark engine")])
    title_heavy = bm25f_search(
        docs, q, weights={"title": 5.0, "body": 1.0}, k=1
    ).first()
    body_heavy = bm25f_search(
        docs, q, weights={"title": 1.0, "body": 5.0}, k=1
    ).first()
    assert title_heavy.doc_id == 1
    assert body_heavy.doc_id == 2


def test_duckdb_parity_on_corpus(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    fields = docs.select(
        "doc_id", F.lit("title").alias("field"),
        F.substring("text", 1, 40).alias("text"),
    ).unionByName(
        docs.select(
            "doc_id", F.lit("body").alias("field"), F.col("text")
        )
    )
    queries = _queries(
        spark, [(0, "table merge join"), (1, "slow scan batch window")]
    )
    got = sorted(
        (r.qid, r.doc_id, round(r.score, 6), r.rank)
        for r in bm25f_search(
            fields, queries, weights={"body": 1.0, "title": 2.5}, k=5
        ).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
        WITH base AS (SELECT doc_id, text FROM
                      '{sf_small}/documents.parquet'),
        fl AS (SELECT doc_id, 'title' AS f, substr(text, 1, 40) AS text
               FROM base
               UNION ALL
               SELECT doc_id, 'body', text FROM base),
        toks AS (SELECT doc_id, f, t AS term FROM (
                     SELECT doc_id, f, unnest(string_split_regex(
                         lower(text), '[^a-z0-9]+')) AS t FROM fl)
                 WHERE t <> ''),
        tf AS (SELECT doc_id, term,
                      sum(CASE WHEN f = 'body' THEN 1 ELSE 0 END) AS tf_0,
                      sum(CASE WHEN f = 'title' THEN 1 ELSE 0 END) AS tf_1
               FROM toks GROUP BY 1, 2),
        dld AS (SELECT doc_id,
                       sum(CASE WHEN f = 'body' THEN 1 ELSE 0 END) AS dl_0,
                       sum(CASE WHEN f = 'title' THEN 1 ELSE 0 END) AS dl_1
                FROM toks GROUP BY 1),
        st AS (SELECT count(*) AS n,
                      CAST(sum(dl_0) AS DOUBLE) / count(*) AS avg_0,
                      CAST(sum(dl_1) AS DOUBLE) / count(*) AS avg_1
               FROM dld),
        tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        q AS (SELECT * FROM (VALUES
                  (0, 'table merge join'),
                  (1, 'slow scan batch window')) v(qid, qtext)),
        qt AS (SELECT DISTINCT qid, t AS term FROM (
                   SELECT qid, unnest(string_split_regex(lower(qtext),
                       '[^a-z0-9]+')) AS t FROM q)
               WHERE t <> ''),
        per AS (SELECT qt.qid, tf.doc_id, tf.term,
                       ln(1.0 + (st.n - tdf.df + 0.5) / (tdf.df + 0.5))
                       * (1.0 * tf.tf_0 / (0.25 + 0.75 * dld.dl_0 / st.avg_0)
                          + 2.5 * tf.tf_1 / (0.25 + 0.75 * dld.dl_1 / st.avg_1))
                       / (1.2
                          + (1.0 * tf.tf_0 / (0.25 + 0.75 * dld.dl_0 / st.avg_0)
                             + 2.5 * tf.tf_1
                               / (0.25 + 0.75 * dld.dl_1 / st.avg_1)))
                           AS s
                FROM qt JOIN tf USING (term)
                JOIN dld ON dld.doc_id = tf.doc_id
                JOIN tdf ON tdf.term = tf.term
                CROSS JOIN st),
        folded AS (SELECT qid, doc_id,
                          CAST(list_reduce(list(s ORDER BY term),
                                           (x, y) -> x + y) AS DOUBLE)
                              AS score
                   FROM per GROUP BY qid, doc_id)
        SELECT qid, doc_id, round(score, 6) AS score,
               CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, doc_id) AS rank
            FROM folded)
        WHERE rank <= 5
        """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_unweighted_fields_are_ignored_entirely(spark):
    """Fields absent from ``weights`` carry w_f = 0: their tokens must
    not count toward term df (skewing idf), emit zero-score candidate
    rows, or shrink/grow the effective collection — scores with the
    junk fields present are IDENTICAL to scores without them."""
    base = [
        (1, "title", "apple pie recipe"),
        (1, "body", "flour butter sugar and notes"),
        (2, "title", "baking basics"),
        (2, "body", "apple techniques for beginners"),
    ]
    junk = [
        (1, "anchor", "apple apple apple apple apple"),
        (2, "nav", "apple unrelated boilerplate chrome"),
        # a doc with ONLY unweighted fields can never match
        (9, "anchor", "apple apple apple"),
    ]
    q = _queries(spark, [(0, "apple")])
    w = {"title": 3.0, "body": 1.0}
    clean = {
        (r.qid, r.doc_id): r.score
        for r in bm25f_search(_fields(spark, base), q, weights=w, k=5)
        .collect()
    }
    noisy = {
        (r.qid, r.doc_id): r.score
        for r in bm25f_search(
            _fields(spark, base + junk), q, weights=w, k=5
        ).collect()
    }
    assert noisy == clean
    assert all(doc != 9 for (_, doc) in noisy)
