from __future__ import annotations

import json

from pyspark.sql import functions as F

from hk_housing_datahub_spark.datagen import generate_pages
from hk_housing_datahub_spark.functions.anchors import extract_anchors
from hk_housing_datahub_spark.sources.derivatives import (
    locate_derivatives,
    render_wat_segment,
    render_wet_segment,
    wat_payload,
    wat_record,
    wet_record,
    wet_record_length,
)
from hk_housing_datahub_spark.sources.warc import (
    locate_records,
    parse_warc_record,
    render_segment,
)

N_SEG = 4


def _pages(spark, n=120):
    return generate_pages(spark, n, n_hosts=6).cache()


def test_wet_record_roundtrip_and_length(spark):
    rows = [
        ("https://a.com/x", 1_700_000_000, "hello world"),
        ("https://a.com/y", 1_700_000_100, ""),
        # multi-byte text: octet length != char length
        ("https://b.com/", 1_700_000_200, "九龍彌敦道 1 號"),
        # CRLFs and a header-lookalike inside the payload
        ("https://c.com/p", 1_700_000_300, "l1\r\nContent-Length: 9\r\n"),
    ]
    df = spark.createDataFrame(
        rows, "url string, epoch long, text string"
    ).select("url", F.timestamp_seconds("epoch").alias("warc_ts"), "text")
    out = df.select(
        "url",
        "text",
        wet_record(F.col("url"), F.col("warc_ts"), F.col("text")).alias(
            "rec"
        ),
        wet_record_length(
            F.col("url"), F.col("warc_ts"), F.col("text")
        ).alias("rlen"),
        parse_warc_record(
            wet_record(F.col("url"), F.col("warc_ts"), F.col("text"))
        ).alias("parsed"),
    ).collect()
    for r in out:
        assert len(bytes(r["rec"])) == r["rlen"]
        assert r["parsed"]["url"] == r["url"]
        assert bytes(r["parsed"]["payload"]).decode("utf-8") == r["text"]
        head = bytes(r["rec"]).split(b"\r\n\r\n", 1)[0].decode()
        assert "WARC-Type: conversion" in head
        assert "WARC-Block-Digest: md5:" in head


def test_wat_payload_json_fields_and_links(spark):
    pages = _pages(spark, 60)
    got = pages.select(
        "url",
        "lang",
        F.md5("html").alias("digest"),
        F.octet_length("html").alias("plen"),
        wat_payload(
            F.col("url"), F.col("warc_ts"), F.col("html"), F.col("lang")
        ).alias("wat"),
    ).collect()
    by_url = {r["url"]: r for r in got}
    anchors = (
        extract_anchors(pages, url_col="url")
        .orderBy("src", "pos")
        .collect()
    )
    links: dict[str, list[str]] = {}
    for a in anchors:
        links.setdefault(a["src"], []).append(a["href"])
    assert len(by_url) == 60
    for url, r in by_url.items():
        doc = json.loads(r["wat"])
        assert doc["url"] == url
        assert doc["digest"] == "md5:" + r["digest"]
        assert doc["length"] == r["plen"]
        assert doc["lang"] == r["lang"]
        assert doc["links"] == links.get(url, [])
        assert doc["n_links"] == len(doc["links"])
        assert doc["date"].endswith("Z") and "T" in doc["date"]


def test_wat_json_escaping_quote_and_backslash(spark):
    df = spark.createDataFrame(
        [(r'https://a.com/x?q="v\1"', 1_700_000_000, b"", "en")],
        "url string, epoch long, html binary, lang string",
    ).select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"), "html", "lang"
    )
    wat = df.select(
        wat_payload(
            F.col("url"), F.col("warc_ts"), F.col("html"), F.col("lang")
        ).alias("w")
    ).first()["w"]
    assert json.loads(wat)["url"] == r'https://a.com/x?q="v\1"'


def test_locate_derivatives_lockstep_with_warc(spark):
    """Row i of a segment's WET/WAT file must describe row i of the
    segment's WARC file: same (segment, offset-order) → same url, and
    the warc pointers must equal warc.locate_records exactly."""
    pages = _pages(spark)
    der = locate_derivatives(pages, n_segments=N_SEG).collect()
    ref = locate_records(pages, n_segments=N_SEG).collect()

    def seq(rows, off):
        out: dict[int, list[str]] = {}
        for r in sorted(rows, key=lambda r: (r["segment"], r[off])):
            out.setdefault(r["segment"], []).append(r["url"])
        return out

    assert seq(der, "warc_offset") == seq(ref, "offset")
    assert seq(der, "wet_offset") == seq(der, "warc_offset")
    assert seq(der, "wat_offset") == seq(der, "warc_offset")
    ref_ptr = {(r["url"], r["segment"]): (r["offset"], r["length"])
               for r in ref}
    for r in der:
        assert ref_ptr[(r["url"], r["segment"])] == (
            r["warc_offset"], r["warc_length"]
        )


def test_wet_wat_pointers_slice_rendered_segments(spark):
    pages = _pages(spark)
    locs = locate_derivatives(pages, n_segments=N_SEG).collect()
    by_seg: dict[int, list] = {}
    for r in locs:
        by_seg.setdefault(r["segment"], []).append(r)
    text_of = {r["url"]: r["text"] or "" for r in pages.collect()}
    for seg, rows in by_seg.items():
        wet = render_wet_segment(pages, seg, n_segments=N_SEG)
        wat = render_wat_segment(pages, seg, n_segments=N_SEG)
        warc = render_segment(pages, seg, n_segments=N_SEG)
        rows.sort(key=lambda r: r["wet_offset"])
        pos_wet = pos_wat = pos_warc = 0
        for r in rows:
            assert (r["wet_offset"], r["wat_offset"], r["warc_offset"]) == (
                pos_wet, pos_wat, pos_warc
            )
            pos_wet += r["wet_length"]
            pos_wat += r["wat_length"]
            pos_warc += r["warc_length"]
        assert pos_wet == len(wet)
        assert pos_wat == len(wat)
        assert pos_warc == len(warc)
        # slice-and-reparse a probe record from each file
        probe = rows[len(rows) // 2]
        wet_rec = wet[
            probe["wet_offset"]: probe["wet_offset"] + probe["wet_length"]
        ]
        wat_rec = wat[
            probe["wat_offset"]: probe["wat_offset"] + probe["wat_length"]
        ]
        df = spark.createDataFrame(
            [(bytearray(wet_rec), bytearray(wat_rec))],
            "wet binary, wat binary",
        )
        parsed = df.select(
            parse_warc_record(F.col("wet")).alias("e"),
            parse_warc_record(F.col("wat")).alias("a"),
        ).first()
        assert parsed["e"]["url"] == probe["url"]
        assert bytes(parsed["e"]["payload"]).decode("utf-8") == text_of[
            probe["url"]
        ]
        doc = json.loads(bytes(parsed["a"]["payload"]).decode("utf-8"))
        assert doc["url"] == probe["url"]
        assert doc["digest"] == "md5:" + probe["digest"]


def test_locate_derivatives_plan_single_exchange(spark):
    """All six pointers ride ONE segment exchange + sort — deriving WET
    and WAT offsets must not add shuffles beyond warc.locate_records."""
    df = spark.createDataFrame(
        [("https://a.com/p", 1000, b"x", "t", "en")],
        ["url", "epoch", "html", "text", "lang"],
    ).select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"),
        "html", "text", "lang",
    )
    plan = (
        locate_derivatives(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
