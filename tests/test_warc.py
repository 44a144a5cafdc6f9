from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources.warc import (
    parse_warc_record,
    render_segment,
    warc_locations,
    warc_record,
    warc_record_length,
)


def _pages(spark):
    rows = [
        # payload with CRLFs, a header-lookalike line, and non-UTF8 bytes
        ("https://a.com/x", 1_700_000_000,
         b"line1\r\nContent-Length: 999\r\n\xff\xfe raw"),
        ("https://a.com/y", 1_700_000_100, b"tiny"),
        ("https://b.com/", 1_700_000_200, b""),
        ("https://c.com/p?b=2&a=1", 1_700_000_300, b"x" * 1000),
    ]
    return spark.createDataFrame(
        rows, "url string, epoch long, html binary"
    ).select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"), "html"
    )


def test_warc_record_roundtrip_and_length(spark):
    pages = _pages(spark)
    out = pages.select(
        "url",
        "html",
        warc_record(F.col("url"), F.col("warc_ts"), F.col("html")).alias(
            "rec"
        ),
        warc_record_length(
            F.col("url"), F.col("warc_ts"), F.col("html")
        ).alias("rlen"),
        parse_warc_record(
            warc_record(F.col("url"), F.col("warc_ts"), F.col("html"))
        ).alias("parsed"),
    ).collect()
    for r in out:
        assert len(bytes(r["rec"])) == r["rlen"]
        assert r["parsed"]["url"] == r["url"]
        assert bytes(r["parsed"]["payload"]) == bytes(r["html"])
        head = bytes(r["rec"]).split(b"\r\n\r\n", 1)[0].decode()
        assert head.startswith("WARC/1.0")
        assert f"Content-Length: {len(bytes(r['html']))}" in head


def test_warc_locations_slice_the_rendered_segment(spark):
    from hk_housing_datahub_spark.datagen import generate_pages

    pages = generate_pages(spark, 200, n_hosts=5).cache()
    n_seg = 4
    locs = warc_locations(pages, n_segments=n_seg).collect()
    assert len(locs) == 200
    by_seg: dict[int, list] = {}
    for r in locs:
        by_seg.setdefault(r["segment"], []).append(r)
    assert set(by_seg) == set(range(n_seg))
    parse_one = None
    for seg, rows in by_seg.items():
        blob = render_segment(pages, seg, n_segments=n_seg)
        rows.sort(key=lambda r: r["offset"])
        # offsets tile the segment exactly: contiguous, gapless
        pos = 0
        for r in rows:
            assert r["offset"] == pos
            pos += r["length"]
        assert pos == len(blob)
        # a pointer slice IS the record for its URL
        probe = rows[len(rows) // 2]
        rec = blob[probe["offset"]: probe["offset"] + probe["length"]]
        df = spark.createDataFrame([(bytearray(rec),)], "rec binary")
        parsed = df.select(
            parse_warc_record(F.col("rec")).alias("p")
        ).collect()[0]["p"]
        assert parsed["url"] == probe["url"]
        # SURT order within the segment (sorted CDX run)
        surts = [r["surt"] for r in rows]
        assert surts == sorted(surts)


def test_cdx_records_with_locations_address_the_segments(spark):
    """The composed cdxj rows point at exactly the bytes render_segment
    produces — the full Common-Crawl-style index/segment contract."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.sources.cdx import (
        cdx_records_with_locations,
    )

    pages = generate_pages(spark, 150, n_hosts=4).cache()
    rows = cdx_records_with_locations(pages, n_segments=3).collect()
    assert len(rows) == 150
    for seg in range(3):
        blob = render_segment(pages, seg, n_segments=3)
        seg_rows = sorted(
            (r for r in rows if r["segment"] == seg),
            key=lambda r: r["offset"],
        )
        assert sum(r["length"] for r in seg_rows) == len(blob)
        probe = seg_rows[0]
        rec = blob[probe["offset"]: probe["offset"] + probe["length"]]
        df = spark.createDataFrame([(bytearray(rec),)], "rec binary")
        parsed = df.select(
            parse_warc_record(F.col("rec")).alias("p")
        ).collect()[0]["p"]
        from hk_housing_datahub_spark.functions.urls import (
            canonicalize_url,
        )

        canon = (
            spark.createDataFrame([(parsed["url"],)], ["u"])
            .select(canonicalize_url(F.col("u")).alias("c"))
            .collect()[0]["c"]
        )
        assert canon == probe["url_canon"]


def test_warc_date_is_utc_regardless_of_session_timezone(spark):
    """ISO 28500's 'Z' suffix must label UTC, not session wall time."""
    df = spark.createDataFrame([(1_700_000_000,)], ["epoch"]).select(
        warc_record(
            F.lit("https://a.com/"),
            F.timestamp_seconds(F.col("epoch")),
            F.lit(b""),
        ).alias("rec")
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Asia/Hong_Kong", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            head = bytes(df.collect()[0]["rec"]).decode()
            assert "WARC-Date: 2023-11-14T22:13:20Z" in head, (tz, head)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_classify_revisits_first_capture_per_digest_is_response(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.sources.warc import (
        classify_revisits,
        revisit_storage_report,
    )

    rows = [
        # u1: v1 at t0, unchanged at t1 (revisit), changed at t2
        # (response), back to v1 at t3 (revisit of t0's digest)
        ("https://a.com/1", 1000, b"v1"),
        ("https://a.com/1", 2000, b"v1"),
        ("https://a.com/1", 3000, b"v2"),
        ("https://a.com/1", 4000, b"v1"),
        # u2: same bytes as u1 — per-URL dedup must NOT cross urls
        ("https://a.com/2", 1500, b"v1"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "epoch", "html"]
    ).select("url", F.timestamp_seconds("epoch").alias("warc_ts"), "html")
    got = {
        (r["url"], r["ts"].timestamp()): r.asDict()
        for r in classify_revisits(df).collect()
    }
    assert got[("https://a.com/1", 1000.0)]["record_type"] == "response"
    assert got[("https://a.com/1", 2000.0)]["record_type"] == "revisit"
    assert got[("https://a.com/1", 2000.0)]["refers_to_ts"].timestamp() == 1000.0
    assert got[("https://a.com/1", 3000.0)]["record_type"] == "response"
    r4 = got[("https://a.com/1", 4000.0)]
    assert r4["record_type"] == "revisit"
    assert r4["refers_to_ts"].timestamp() == 1000.0  # digest-first, not prev
    assert got[("https://a.com/2", 1500.0)]["record_type"] == "response"
    # storage: revisits cost header-only (less than full, more than 0)
    full = got[("https://a.com/1", 1000.0)]["stored_length"]
    rev = got[("https://a.com/1", 2000.0)]["stored_length"]
    assert 0 < rev and rev != full
    rep = revisit_storage_report(classify_revisits(df)).collect()[0]
    assert (rep["n_captures"], rep["n_responses"], rep["n_revisits"]) == (5, 3, 2)
    assert rep["bytes_stored"] == sum(
        v["stored_length"] for v in got.values()
    )


def test_revisit_record_bytes_and_framing(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.sources.warc import revisit_record

    df = spark.createDataFrame(
        [("https://a.com/p", 2000, "https://a.com/p", 1000)],
        ["url", "epoch", "rurl", "repoch"],
    )
    rec = bytes(
        df.select(
            revisit_record(
                F.col("url"),
                F.timestamp_seconds("epoch"),
                F.col("rurl"),
                F.timestamp_seconds("repoch"),
            ).alias("rec")
        ).collect()[0]["rec"]
    )
    text = rec.decode()
    assert text.startswith("WARC/1.0\r\n")
    assert "WARC-Type: revisit\r\n" in text
    assert "WARC-Refers-To-Target-URI: https://a.com/p\r\n" in text
    assert "WARC-Refers-To-Date: 1970-01-01T00:16:40Z\r\n" in text
    assert "Content-Length: 0\r\n" in text
    assert rec.endswith(b"\r\n\r\n\r\n\r\n")  # header block end + record end


def test_deduped_segment_layout_offsets_slice_records(spark):
    """Pointer table and rendered bytes agree under the revisit policy:
    every (offset, length) slice is a whole record of the declared
    type, and the deduped layout is strictly smaller than the
    store-everything one."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.sources.warc import (
        locate_records,
        locate_records_deduped,
        render_segment_deduped,
    )

    rows = []
    for i in range(8):
        url = f"https://site{i % 3}.com/p/{i}"
        body = (f"body-{i % 4} " * 120).encode()  # ~1 KiB, header-dwarfing
        rows.append((url, 1000 + i, body))
        rows.append((url, 5000 + i, body))  # unchanged recrawl
        rows.append((url, 9000 + i, f"fresh-{i}".encode()))  # changed
    df = spark.createDataFrame(rows, ["url", "epoch", "html"]).select(
        "url", F.timestamp_seconds("epoch").alias("warc_ts"), "html"
    )
    locs = locate_records_deduped(df, n_segments=2).collect()
    assert {r["record_type"] for r in locs} == {"response", "revisit"}
    by_seg = {}
    for r in locs:
        by_seg.setdefault(r["segment"], []).append(r)
    for seg, rs in by_seg.items():
        blob = render_segment_deduped(df, seg, n_segments=2)
        assert len(blob) == sum(r["length"] for r in rs)
        for r in sorted(rs, key=lambda x: x["offset"]):
            rec = blob[r["offset"]: r["offset"] + r["length"]]
            assert rec.startswith(b"WARC/1.0\r\n")
            assert f"WARC-Type: {r['record_type']}".encode() in rec
            if r["record_type"] == "revisit":
                assert b"Content-Length: 0\r\n" in rec
                assert b"WARC-Refers-To-Target-URI: " + r[
                    "url"
                ].encode() in rec
            else:
                assert b"WARC-Refers-To" not in rec
    # storage actually shrinks vs the non-dedup layout
    full = sum(r["length"] for r in locate_records(df, n_segments=2).collect())
    dedup = sum(r["length"] for r in locs)
    assert dedup < full


def test_deduped_layout_plan_two_exchanges(spark):
    """The dedup-aware pointer table is exactly two exchanges — the
    (url, digest) revisit ranking and the per-segment offset window;
    classification must not add a third shuffle."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.sources.warc import locate_records_deduped

    df = spark.createDataFrame(
        [("https://a.com/p", 1000, b"x")], ["url", "epoch", "html"]
    ).select("url", F.timestamp_seconds("epoch").alias("warc_ts"), "html")
    plan = (
        locate_records_deduped(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan
