"""The byte-identical extraction invariant (BASELINE.json input_hint).

Vectorized pandas-UDF twin vs single-row reference extractor, per url, over
the adversarial synthetic corpus (CJK, control chars, empty text, malformed
html) and hand-built edge cases — text compared as UTF-8 BYTES.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hk_housing_datahub_spark.datagen import generate_pages
from hk_housing_datahub_spark.extract import extract_df, extract_one
from hk_housing_datahub_spark.extract.vectorized import _extract_batch

EDGE_HTML = [
    None,
    b"",
    b"<html><bo",
    b'<div id="content"></div>',
    b'<div id="content">\x01\x02\tx</div>',
    '<div id="content">九龍彌敦道1號</div>'.encode(),
    b'<div id="content">a</div><div id="content">b</div>',
    b'<span class="price">HK$ 1,234</span>',
    b'<span class="price">HK$ NaN</span>',
    b'<time class="txdate">2024-02-30</time>',  # invalid date -> NULL
    b'<time class="txdate">2024-02-29</time>',
    b'<a href="x">1</a><a href="y">2</a>',
    '<div id="content">multi\nline\n nbsp</div>'.encode(),
    b"\xff\xfe garbage \xf0",  # invalid utf-8 -> replacement chars, no crash
]


def _assert_rows_equal(vec_row, ref_row, i):
    ta, tb = vec_row["text"], ref_row["text"]
    a_null = ta is None or (isinstance(ta, float) and pd.isna(ta))
    if a_null or tb is None:
        assert a_null and tb is None, (i, ta, tb)
    else:
        assert ta.encode("utf-8") == tb.encode("utf-8"), i
    for f in ("price", "address", "floor_area"):
        va, vb = vec_row[f], ref_row[f]
        if pd.isna(va) or vb is None:
            assert pd.isna(va) and vb is None, (i, f, va, vb)
        else:
            assert va == vb, (i, f)
    da, db = vec_row["transaction_date"], ref_row["transaction_date"]
    if pd.isna(da) or db is None:
        assert pd.isna(da) and db is None, (i, da, db)
    else:
        assert da.to_pydatetime() == db, i
    assert list(vec_row["outlinks"]) == list(ref_row["outlinks"]), i


def test_edge_cases_identical():
    s = pd.Series(EDGE_HTML, dtype=object)
    vec = _extract_batch(s)
    for i, html in enumerate(EDGE_HTML):
        _assert_rows_equal(vec.iloc[i], extract_one(html), i)


@pytest.fixture(scope="module")
def corpus_pdf(spark):
    return generate_pages(spark, 3000, n_hosts=24).toPandas()


def test_corpus_identical(corpus_pdf):
    vec = _extract_batch(corpus_pdf["html"])
    for i in range(len(corpus_pdf)):
        _assert_rows_equal(vec.iloc[i], extract_one(corpus_pdf["html"].iloc[i]), i)


def test_corpus_text_matches_expected_column(corpus_pdf):
    """Datagen's `text` column IS the oracle: extractor must reproduce it."""
    vec = _extract_batch(corpus_pdf["html"])
    for i in range(len(corpus_pdf)):
        want = corpus_pdf["text"].iloc[i]
        got = vec["text"].iloc[i]
        if want is None:
            assert got is None or pd.isna(got), i
        else:
            assert got.encode() == want.encode(), i


def test_spark_end_to_end_text_bytes(spark):
    """Full distributed path: extracted_text equals the stored text column."""
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 2000, n_hosts=16)
    ex = extract_df(pages)
    bad = ex.filter(
        ~(
            (F.col("text").isNull() & F.col("extracted_text").isNull())
            | (F.encode("text", "UTF-8") == F.encode("extracted_text", "UTF-8"))
        )
    )
    assert bad.count() == 0


def test_filler_pages_identical(spark):
    """filler_listings (scale-bench page shape) must not change extraction
    semantics: fields = first listing, text div unchanged, outlink set
    unchanged, and the vectorized twin stays byte-identical."""
    pdf = generate_pages(spark, 600, n_hosts=8, filler_listings=25).toPandas()
    base = generate_pages(spark, 600, n_hosts=8).toPandas()
    vec = _extract_batch(pdf["html"])
    for i in range(len(pdf)):
        _assert_rows_equal(vec.iloc[i], extract_one(pdf["html"].iloc[i]), i)
        # vs the filler-free page: text and outlinks always identical; the
        # scalar fields identical wherever the real cell parsed (when the real
        # cell is deliberately unparseable, "first match" may hit a filler row
        # — that IS first-match semantics, not a regression).
        b = extract_one(base["html"].iloc[i])
        v = vec.iloc[i]
        if b["text"] is None:
            assert v["text"] is None or pd.isna(v["text"]), i
        else:
            assert v["text"].encode() == b["text"].encode(), i
        assert list(v["outlinks"]) == list(b["outlinks"]), i
        for f in ("price", "address", "floor_area"):
            if b[f] is not None:
                assert v[f] == b[f], (i, f)
