"""Structured-data extraction: JSON-LD blocks, OpenGraph meta tags,
and the per-field JSON-LD-first fallback chain."""

from pyspark.sql import functions as F

from hk_housing_datahub_spark.extract.structured import (
    extract_jsonld,
    extract_meta_tags,
    listing_from_structured,
)

LD = (
    '<script type="application/ld+json">'
    '{"@type":"RealEstateListing","name":"Flat 3A",'
    '"offers":{"price":"5200000","priceCurrency":"HKD"},'
    '"address":{"streetAddress":"8 Nathan Road"}}'
    "</script>"
)
LD_PARTIAL = (
    '<script type="application/ld+json">'
    '{"@type":"Offer","name":"Flat 9C"}</script>'
)
LD_BAD = '<script type="application/ld+json">{"name":"trunc</script>'
OG = (
    '<meta property="og:title" content="OG Flat"/>'
    '<meta property="product:price:amount" content="4100000"/>'
    '<meta property="product:price:currency" content="HKD"/>'
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url_canon string, html binary"
    )


def test_extract_jsonld_blocks_in_order_with_null_on_malformed(spark):
    pages = _pages(
        spark,
        [
            ("u1", f"<html>{LD}{LD_PARTIAL}</html>"),
            ("u2", f"<html>{LD_BAD}</html>"),
            ("u3", "<html>no blocks</html>"),
        ],
    )
    got = {
        (r["url"], r["pos"]): r.asDict()
        for r in extract_jsonld(pages).collect()
    }
    assert set(got) == {("u1", 0), ("u1", 1), ("u2", 0)}
    b0 = got[("u1", 0)]
    assert b0["ld_type"] == "RealEstateListing"
    assert b0["price"] == "5200000"
    assert b0["currency"] == "HKD"
    assert b0["address"] == "8 Nathan Road"
    assert got[("u1", 1)]["name"] == "Flat 9C"
    assert got[("u1", 1)]["price"] is None
    bad = got[("u2", 0)]
    assert bad["name"] is None and bad["json_raw"].startswith('{"name"')


def test_extract_meta_tags_document_order(spark):
    pages = _pages(spark, [("u1", f"<html>{OG}</html>")])
    rows = extract_meta_tags(pages).orderBy("pos").collect()
    assert [(r["property"], r["content"]) for r in rows] == [
        ("og:title", "OG Flat"),
        ("product:price:amount", "4100000"),
        ("product:price:currency", "HKD"),
    ]


def test_fallback_chain_is_per_field(spark):
    pages = _pages(
        spark,
        [
            ("full_ld", f"<html>{LD}{OG}</html>"),  # LD wins every field
            ("partial", f"<html>{LD_PARTIAL}{OG}</html>"),  # mixed
            ("og_only", f"<html>{OG}</html>"),
            ("bad_ld", f"<html>{LD_BAD}{OG}</html>"),  # falls through
            ("naked", "<html>nothing</html>"),
        ],
    )
    got = {
        r["url"]: r.asDict()
        for r in listing_from_structured(pages).collect()
    }
    assert len(got) == 5
    f = got["full_ld"]
    assert (f["name"], f["price"], f["price_num"], f["src_jsonld"]) == (
        "Flat 3A",
        "5200000",
        5200000.0,
        True,
    )
    p = got["partial"]  # name from LD, price from OG
    assert (p["name"], p["price"], p["src_jsonld"]) == (
        "Flat 9C",
        "4100000",
        True,
    )
    o = got["og_only"]
    assert (o["name"], o["price_num"], o["src_jsonld"]) == (
        "OG Flat",
        4100000.0,
        False,
    )
    assert got["bad_ld"]["name"] == "OG Flat"
    n = got["naked"]
    assert n["name"] is None and n["price_num"] is None


def test_structured_plan_is_jvm_only(spark):
    import contextlib
    import io

    pages = _pages(spark, [("u1", f"<html>{LD}</html>")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        listing_from_structured(pages).explain("formatted")
    p = buf.getvalue()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
