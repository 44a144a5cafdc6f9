from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.functions.surt import surt_host, surt_key
from hk_housing_datahub_spark.functions.urls import url_host
from hk_housing_datahub_spark.sources.cdx import (
    build_cdx_index,
    cdx_domain_query,
    cdx_prefix_query,
)


def test_surt_key_examples(spark):
    cases = [
        ("https://WWW.Example.COM:443/A/B?b=2&a=1#f", "com,example)/a/b?a=1&b=2"),
        ("http://example.com", "com,example)/"),
        ("https://sub.host3.Example.com/X", "com,example,host3,sub)/x"),
        # "x=" is a named-but-empty param: the canonicalization contract
        # (functions/urls.py) drops only fully-empty params, so it stays
        ("http://www.a.b.c:80/p?x=&", "c,b,a)/p?x="),
        # params sort AFTER case folding — case-variant-equal queries
        # must land on one key
        ("https://a.com/p?b=2&A=1", "com,a)/p?a=1&b=2"),
        ("https://a.com/p?B=2&a=1", "com,a)/p?a=1&b=2"),
        # a non-default port is a distinct origin and stays in the key
        ("http://example.com:8080/X", "com,example:8080)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [e for _, e in cases]


def test_cdx_index_build_and_domain_query(spark, tmp_path):
    from hk_housing_datahub_spark.datagen import generate_pages

    pages = generate_pages(spark, 1200, n_hosts=10).cache()
    idx_path = str(tmp_path / "cdx")
    build_cdx_index(pages, idx_path, n_shards=8)

    idx = spark.read.parquet(idx_path)
    assert idx.count() == pages.count()

    # exact-host query == direct predicate on the raw corpus
    expect = sorted(
        r["u"]
        for r in pages.filter(url_host(F.col("url")) == "h3.example.com")
        .select(surt_key(F.col("url")).alias("u"))
        .collect()
    )
    got = sorted(
        r["surt"]
        for r in cdx_domain_query(
            spark, idx_path, "h3.example.com", subdomains=False
        ).collect()
    )
    assert got == expect and len(got) > 0

    # registered-domain query covers the whole corpus (every host is a
    # subdomain of example.com)
    assert cdx_domain_query(spark, idx_path, "example.com").count() == (
        pages.count()
    )
    assert (
        cdx_domain_query(spark, idx_path, "example.com", subdomains=False)
        .count()
        == 0
    )

    # files are sorted runs over non-overlapping SURT ranges: the
    # cluster.idx property that lets stats skip non-covering shards
    ranges = []
    for f in sorted(glob.glob(os.path.join(idx_path, "part-*.parquet"))):
        rows = [r["surt"] for r in spark.read.parquet(f).collect()]
        if not rows:
            continue
        assert rows == sorted(rows), f
        ranges.append((rows[0], rows[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo

    # the prefix predicate reaches the parquet scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdx_prefix_query(spark, idx_path, "com,example,h3)").explain(True)
    plan = buf.getvalue()
    assert "StartsWith" in plan, plan


def test_cdx_snapshot_diff_classes(spark):
    from datetime import datetime, timezone

    from hk_housing_datahub_spark.sources.cdx import cdx_snapshot_diff

    def ts(e):
        return datetime.fromtimestamp(e, tz=timezone.utc)

    t0, t1 = 100, 200
    rows = [
        # changed: latest<=t0 digest A, re-captured in window with B
        ("u_changed", ts(50), "A"), ("u_changed", ts(150), "B"),
        # refreshed: re-captured, same digest (and an older different one
        # proving "latest at t0" is compared, not "any at t0")
        ("u_refreshed", ts(10), "X"), ("u_refreshed", ts(90), "C"),
        ("u_refreshed", ts(160), "C"),
        # stale: known at t0, nothing in the window (a post-t1 capture
        # must NOT count as a window capture)
        ("u_stale", ts(80), "D"), ("u_stale", ts(300), "E"),
        # new: first capture inside (t0, t1]
        ("u_new", ts(120), "F"), ("u_new", ts(180), "G"),
        # unseen at t1: excluded entirely
        ("u_future", ts(250), "H"),
        # NULL digest at t0 (e.g. md5 of a NULL body): the URL is KNOWN,
        # so a non-NULL recapture is a change, not a discovery
        ("u_nullbody", ts(60), None), ("u_nullbody", ts(170), "I"),
    ]
    caps = spark.createDataFrame(rows, ["url_canon", "warc_ts", "digest"])
    got = {
        r["url"]: r.asDict()
        for r in cdx_snapshot_diff(caps, t0, t1).collect()
    }
    assert set(got) == {
        "u_changed", "u_refreshed", "u_stale", "u_new", "u_nullbody",
    }
    assert got["u_nullbody"]["status"] == "changed"
    assert got["u_nullbody"]["digest_t0"] is None
    assert got["u_changed"]["status"] == "changed"
    assert (got["u_changed"]["digest_t0"], got["u_changed"]["digest_t1"]) == ("A", "B")
    assert got["u_refreshed"]["status"] == "refreshed"
    assert got["u_stale"]["status"] == "stale"
    assert got["u_stale"]["captures_in_window"] == 0
    assert got["u_new"]["status"] == "new"
    assert got["u_new"]["digest_t0"] is None
    assert got["u_new"]["digest_t1"] == "G"
    assert got["u_new"]["captures_in_window"] == 2


def test_cdx_domain_query_includes_nondefault_port_origins(spark, tmp_path):
    """surt_key keeps non-default ports; host/domain queries must still
    return those captures (the 'h:' run sits between 'h)' and 'h,')."""
    rows = [
        ("https://a.example.com/x", b"1"),
        ("https://a.example.com:8443/x", b"2"),
        ("https://sub.a.example.com/y", b"3"),
        ("https://aa.example.com/z", b"4"),  # sibling host: excluded
    ]
    pages = spark.createDataFrame(
        [(u, h) for u, h in rows], "url string, html binary"
    ).selectExpr(
        "url", "timestamp_seconds(1700000000) AS warc_ts", "html",
        "'en' AS lang",
    )
    idx = str(tmp_path / "cdx_port")
    build_cdx_index(pages, idx, n_shards=2)
    exact = {
        r["url_canon"]
        for r in cdx_domain_query(
            spark, idx, "a.example.com", subdomains=False
        ).collect()
    }
    assert exact == {
        "https://a.example.com/x",
        "https://a.example.com:8443/x",
    }
    dom = cdx_domain_query(spark, idx, "a.example.com").count()
    assert dom == 3  # + the subdomain, still excluding aa.example.com


def test_cdx_latest_picks_most_recent_capture(spark):
    from hk_housing_datahub_spark.sources.cdx import cdx_latest

    caps = spark.createDataFrame(
        [
            ("u1", 100, "a", "en"),
            ("u1", 300, "c", "fr"),
            ("u1", 200, "b", "de"),
            ("u2", 50, "x", "en"),
        ],
        "url_canon string, epoch long, digest string, lang string",
    ).select(
        "url_canon", F.timestamp_seconds("epoch").alias("warc_ts"),
        "digest", "lang",
    )
    got = {r["url_canon"]: r.asDict() for r in cdx_latest(caps).collect()}
    assert set(got) == {"u1", "u2"}
    # the WHOLE latest row is carried, every column coherent
    assert (got["u1"]["digest"], got["u1"]["lang"]) == ("c", "fr")
    assert got["u1"]["warc_ts"].timestamp() == 300
    assert got["u2"]["digest"] == "x"
    assert cdx_latest(caps).columns == caps.columns
