"""Unicode-script profile: Java \\p{IsScript} vs RE2 \\p{Script} parity
and the dominant-script tie-break contract."""

from __future__ import annotations

import duckdb
import pytest

from hk_housing_datahub_spark.operators.textops import (
    _SCRIPTS,
    script_profile,
)

SAMPLES = [
    (0, "Hello plain ascii words"),
    (1, "Привет мир это кириллица"),
    (2, "世界你好汉字文本"),
    (3, "mixed Привет hello 世界 text"),
    (4, "ελληνικά και λατινικά words"),
    (5, "مرحبا بالعالم"),
    (6, "한국어 텍스트"),
    (7, "ひらがな と カタカナ"),
    (8, "12345 ,.!? ---"),  # no script chars at all
    (9, ""),
]


@pytest.fixture(scope="module")
def prof(spark):
    df = spark.createDataFrame(SAMPLES, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}


def test_java_and_re2_script_counts_agree(prof):
    con = duckdb.connect()
    for doc_id, text in SAMPLES:
        for name, _ in _SCRIPTS:
            want = con.sql(
                "select length(?) - length(regexp_replace(?, "
                f"'\\p{{{name.title()}}}', '', 'g'))",
                params=[text, text],
            ).fetchone()[0]
            assert prof[doc_id][f"n_{name}"] == want, (doc_id, name)


def test_dominant_script_and_frac(prof):
    assert prof[0]["dominant_script"] == "latin"
    assert prof[0]["dominant_frac"] == 1.0
    assert prof[1]["dominant_script"] == "cyrillic"
    assert prof[2]["dominant_script"] == "han"
    assert prof[4]["dominant_script"] == "greek"
    assert prof[5]["dominant_script"] == "arabic"
    assert prof[6]["dominant_script"] == "hangul"
    assert prof[3]["dominant_frac"] < 1.0  # genuinely mixed
    for d in (8, 9):
        assert prof[d]["dominant_script"] == "none"
        assert prof[d]["dominant_frac"] == 0.0
        assert prof[d]["n_script_chars"] == 0


def test_tie_break_is_fixed_order(spark):
    # equal latin and cyrillic counts: 'latin' wins (first in _SCRIPTS)
    df = spark.createDataFrame([(0, "ab яж")], ["doc_id", "text"])
    [r] = script_profile(df).collect()
    assert r["n_latin"] == r["n_cyrillic"] == 2
    assert r["dominant_script"] == "latin"
