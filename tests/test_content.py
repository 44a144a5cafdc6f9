"""Main-content extraction (extract/content.py): block classification,
script/style stripping, link-density boilerplate rejection."""

from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.extract.content import (
    extract_main_content,
    main_content,
)

PROSE = (
    "This paragraph is the real content of the page and it has plenty "
    "of prose words for any reader."
)


def _extract(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    return extract_main_content(df, key_cols=("doc_id",)).collect()[0].asDict()


def test_prose_kept_boilerplate_dropped(spark):
    r = _extract(
        spark,
        '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> '
        '<a href="/c">Contact page</a></div>'
        f"<p>{PROSE}</p>"
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>',
    )
    assert r["content"] == PROSE
    assert r["n_content_blocks"] == 1
    assert r["link_chars_total"] > 0


def test_script_and_style_never_leak(spark):
    r = _extract(
        spark,
        f"<script>var secret = 'this string is long enough to pass the "
        f"content gates if it leaked through';</script>"
        f"<style>.c {{ color: red; font-size: extremely-long-value }}</style>"
        f"<p>{PROSE}</p>",
    )
    assert r["content"] == PROSE
    assert "secret" not in r["content"]


def test_link_farm_page_yields_empty_content(spark):
    farm = "".join(
        f'<li><a href="/{i}">descriptive link number {i} here</a></li>'
        for i in range(12)
    )
    r = _extract(spark, f"<ul>{farm}</ul>")
    assert r["content"] == ""
    assert r["n_content_blocks"] == 0


def test_inline_tags_do_not_split_blocks(spark):
    r = _extract(
        spark,
        "<p>This sentence has <b>bold</b> and <i>italic</i> spans plus "
        'one <a href="/x">small link</a> but remains one mostly-prose '
        "content block of the page.</p>",
    )
    assert r["n_content_blocks"] == 1
    assert "bold" in r["content"] and "italic" in r["content"]


def test_short_and_empty_blocks_rejected(spark):
    r = _extract(spark, "<p>too short</p><div></div><p>   </p>")
    assert r["content"] == ""
    assert r["n_content_blocks"] == 0


def test_main_content_column_matches_operator(spark):
    html = f'<div><a href="/">Home nav link</a></div><p>{PROSE}</p>'
    df = spark.createDataFrame([(html,)], ["html"])
    got = df.select(main_content(F.col("html")).alias("c")).collect()[0]["c"]
    assert got == PROSE
