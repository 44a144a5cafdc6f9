"""PII redaction: golden spans, count/replace agreement, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.redact import (
    _CLASSES,
    redact_pii,
)

GOLDEN = [
    ("mail me at jo.smith+x@corp.example.co", "mail me at <EMAIL>", "email"),
    ("server at 192.168.0.254 is down", "server at <IP> is down", "ip"),
    ("call +852 2345 6789 now", "call <PHONE> now", "phone"),
    ("card 4111 1111 1111 1111 exp 12/29", "card <CARD> exp 12/29", "card"),
    ("no pii here, just 42 and pi", "no pii here, just 42 and pi", None),
]


def test_golden_redactions(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(GOLDEN)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    for i, (_, want, cls) in enumerate(GOLDEN):
        assert out[i].text_redacted == want, (i, out[i].text_redacted)
        if cls is None:
            assert out[i].pii_total == 0
        else:
            assert out[i][f"pii_{cls}"] >= 1
            assert out[i].pii_total >= 1


def test_counts_match_replacements(spark, sf_small):
    """Per-class count == number of that class's placeholders in the
    redacted output, on EVERY row (progressive counting sees exactly what
    the replacement pass sees, so overlapping classes cannot double-count);
    rows without PII are byte-identical."""
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    # inject an overlap-heavy span too: a spaced card is also phone-shaped
    d = d.selectExpr(
        "doc_id",
        "text || CASE WHEN doc_id % 4 = 0"
        " THEN ' pay 4111 1111 1111 1111 now' ELSE '' END AS text",
    )
    out = redact_pii(d)
    for name, _, token in _CLASSES:
        bad = out.filter(
            F.col(f"pii_{name}")
            != (
                F.length("text_redacted")
                - F.length(F.replace("text_redacted", F.lit(token), F.lit("")))
            )
            / len(token)
        )
        assert bad.count() == 0, name
    clean = out.filter(F.col("pii_total") == 0)
    assert clean.filter(F.col("text") != F.col("text_redacted")).count() == 0
    # the overlap rows scrub exactly ONE span, attributed to the card class
    overlap = out.filter(F.col("doc_id") % 4 == 0)
    assert overlap.filter(
        (F.col("pii_card") != 1) | (F.col("pii_phone") != 0)
    ).count() == 0


def test_duckdb_parity_on_corpus(spark, sf_small):
    """Engine-parity oracle without a driver slot: the same portable
    patterns in DuckDB produce byte-identical redacted text per doc.

    The synthetic corpus carries no natural PII (verified: sum(pii_total)
    is 0 on the raw table), so both engines inject the SAME deterministic
    spans per doc_id — every third doc an email, every fifth a phone,
    every seventh an IP — making the parity check exercise real matches,
    overlaps, and mixed-class documents."""
    inject_sql = (
        "text || CASE WHEN doc_id % 3 = 0 THEN ' mail u' || doc_id ||"
        " '@ex' || (doc_id % 7) || '.org' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' tel +852 23' || (doc_id % 90 + 10)"
        " || ' 67' || (doc_id % 90 + 10) ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' at 10.0.' || (doc_id % 250)"
        " || '.' || (doc_id % 200 + 1) ELSE '' END"
    )
    d = spark.read.parquet(f"{sf_small}/documents.parquet").selectExpr(
        "doc_id", f"{inject_sql} AS text"
    )
    assert redact_pii(d).agg(F.sum("pii_total")).first()[0] > 0
    got = {
        r.doc_id: r.text_redacted
        for r in redact_pii(d).select("doc_id", "text_redacted").collect()
    }
    expr = f"({inject_sql})"
    for _, pat, token in _CLASSES:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {expr} AS r FROM "
            f"'{sf_small}/documents.parquet'"
        ).fetchall()
    )
    assert got == want
