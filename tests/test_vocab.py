"""Tokenizer-fit statistics: vocabulary, top-k, BPE pair counts."""

from __future__ import annotations

import duckdb
import pandas as pd

from hk_housing_datahub_spark.operators.vocab import (
    bpe_pair_counts,
    token_vocabulary,
    top_tokens,
)


def test_bpe_pair_counts_sennrich_example(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 1, "text": "low low low lower"},
                {"doc_id": 2, "text": "newest newest"},
            ]
        )
    )
    v = token_vocabulary(docs)
    got = {(r.left, r.right): r["count"] for r in bpe_pair_counts(v).collect()}
    # 'lo'/'ow' occur in low×3 + lower×1; word-end marker closes each word
    assert got[("l", "o")] == 4 and got[("o", "w")] == 4
    assert got[("w", "</w>")] == 3  # low×3
    assert got[("w", "e")] == 3  # lower + newest×2
    assert got[("t", "</w>")] == 2  # newest×2
    assert got[("e", "r")] == 1


def test_top_tokens_order_and_tiebreak(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": "b b a a c"}])
    )
    rows = [(r.token, r["count"]) for r in top_tokens(docs, 2).collect()]
    assert rows == [("a", 2), ("b", 2)]  # count desc, token asc


def test_vocabulary_duckdb_parity(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = (
        token_vocabulary(docs, min_count=2)
        .orderBy("token")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> '')
        SELECT token, count(*) AS count FROM toks
        GROUP BY token HAVING count(*) >= 2 ORDER BY token
        """
    ).df()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["count"].astype("int64").tolist() == want["count"].astype(
        "int64"
    ).tolist()
    assert len(got) > 0


def test_pair_counts_duckdb_parity(spark, sf_small):
    """Character-pair counts weighted by word frequency, cross-checked via
    a DuckDB twin that slices each word with generate_series."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    v = token_vocabulary(docs, min_count=2)
    got = (
        bpe_pair_counts(v)
        .orderBy("left", "right")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''),
        vocab AS (
          SELECT token, count(*) AS cnt FROM toks
          GROUP BY token HAVING count(*) >= 2),
        syms AS (
          SELECT token, cnt, len(token) AS n FROM vocab),
        pairs AS (
          SELECT CASE WHEN i < n THEN substr(token, i, 1)
                      ELSE substr(token, i, 1) END AS left_,
                 CASE WHEN i < n THEN substr(token, i + 1, 1)
                      ELSE '</w>' END AS right_,
                 cnt
          FROM syms, unnest(generate_series(1, n)) AS u(i))
        SELECT left_ AS "left", right_ AS "right", sum(cnt) :: bigint AS count
        FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["left"].tolist() == want["left"].tolist()
    assert got["right"].tolist() == want["right"].tolist()
    assert got["count"].astype("int64").tolist() == want["count"].astype(
        "int64"
    ).tolist()
    assert len(got) > 0
