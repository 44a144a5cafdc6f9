from __future__ import annotations

from hk_housing_datahub_spark.operators.soft404 import (
    flag_soft404,
    probe_urls,
    soft404_signatures,
)


def _caps(spark):
    """bad.com answers everything 200 with one error body; good.com has
    real pages, one of which legitimately discusses 404s; wall.com
    duplicates a cookie banner across URLs (no error vocabulary)."""
    err = "sorry, this page could not be found (404)"
    rows = (
        [(f"http://bad.com/x/{i}", "e-bad", err) for i in range(8)]
        + [
            (f"http://good.com/a/{i}", f"g{i}", f"article {i} body")
            for i in range(6)
        ]
        + [("http://good.com/about-404", "g404", "what is a 404 error?")]
        + [
            (f"http://wall.com/p/{i}", "wall", "accept cookies to continue")
            for i in range(9)
        ]
    )
    return spark.createDataFrame(rows, ["url", "digest", "text"])


def test_heuristic_needs_both_error_text_and_dominance(spark):
    got = {
        r["url"]: r
        for r in flag_soft404(_caps(spark), min_dup_urls=5).collect()
    }
    assert got["http://bad.com/x/0"]["is_soft404"]  # both signals
    assert got["http://bad.com/x/0"]["error_text"]
    assert got["http://bad.com/x/0"]["dominant_dup"]
    # error vocabulary alone (a real page about 404s) is not convicted
    r404 = got["http://good.com/about-404"]
    assert r404["error_text"] and not r404["dominant_dup"]
    assert not r404["is_soft404"]
    # dominance alone (cookie wall) is not convicted
    wall = got["http://wall.com/p/0"]
    assert wall["dominant_dup"] and not wall["error_text"]
    assert not wall["is_soft404"]
    assert not got["http://good.com/a/1"]["is_soft404"]


def test_probe_signature_convicts_regardless_of_vocabulary(spark):
    # quiet.com's error page has NO error vocabulary — only the probe
    # can catch it
    rows = [
        (f"http://quiet.com/q/{i}", "e-quiet", "welcome to quiet.com")
        for i in range(3)
    ] + [("http://quiet.com/real", "qr", "actual content")]
    caps = spark.createDataFrame(rows, ["url", "digest", "text"])
    probes = probe_urls(
        spark.createDataFrame([("quiet.com",)], ["host"])
    )
    purl = probes.collect()[0]["probe_url"]
    caps_with_probe = caps.union(
        spark.createDataFrame(
            [(purl, "e-quiet", "welcome to quiet.com")],
            ["url", "digest", "text"],
        )
    )
    sigs = soft404_signatures(caps_with_probe, probes)
    assert sigs.collect()[0]["digest"] == "e-quiet"
    got = {
        r["url"]: r
        for r in flag_soft404(caps_with_probe, sigs, min_dup_urls=5).collect()
    }
    for i in range(3):
        r = got[f"http://quiet.com/q/{i}"]
        assert r["probe_match"] and r["is_soft404"]
        assert not r["error_text"]  # vocabulary was useless here
    assert not got["http://quiet.com/real"]["is_soft404"]
    assert got[purl]["is_soft404"]  # the probe capture itself


def test_unanswered_probe_yields_no_signature(spark):
    caps = _caps(spark)
    probes = probe_urls(
        spark.createDataFrame([("bad.com",), ("good.com",)], ["host"])
    )
    # neither probe URL was captured (hard-404 hosts)
    assert soft404_signatures(caps, probes).count() == 0


def test_probe_urls_deterministic_and_salted(spark):
    hosts = spark.createDataFrame([("a.com",), ("b.com",)], ["host"])
    p0 = {r["host"]: r["probe_url"] for r in probe_urls(hosts).collect()}
    p0b = {r["host"]: r["probe_url"] for r in probe_urls(hosts).collect()}
    p1 = {r["host"]: r["probe_url"] for r in probe_urls(hosts, salt=1).collect()}
    assert p0 == p0b
    assert all(p0[h] != p1[h] for h in p0)
    assert all(u.startswith(f"http://{h}/__s404_probe__/") for h, u in p0.items())


def _soft_corpus(spark):
    """real.com/start links to ten soft.com pages (which all serve one
    'welcome' body with NO error vocabulary) and one real page; each
    soft page links a hop deeper. soft.com also answers the probe URL
    with the same body; real.com hard-404s its probe (no row)."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.soft404 import probe_urls

    # soft.com is discovered over https, so the engine probes it over
    # https — the corpus must serve the probe on that scheme
    purl = probe_urls(
        spark.createDataFrame([("soft.com", "https")], ["host", "scheme"]),
        scheme_col="scheme",
    ).collect()[0]["probe_url"]
    links = "".join(
        f'<a href="https://soft.com/p/{i}">s</a>' for i in range(10)
    )
    rows = [
        (
            "https://real.com/start",
            f'<html><body><div id="content">start here</div>{links}'
            '<a href="https://real.com/next">n</a></body></html>',
            "start here",
        ),
        (
            "https://real.com/next",
            '<html><body><div id="content">next page</div></body></html>',
            "next page",
        ),
    ]
    for i in range(10):
        rows.append(
            (
                f"https://soft.com/p/{i}",
                '<html><body><div id="content">welcome stranger</div>'
                f'<a href="https://soft.com/deep/{i}">d</a></body></html>',
                "welcome stranger",
            )
        )
        rows.append(
            (
                f"https://soft.com/deep/{i}",
                f'<html><body><div id="content">deep {i}</div></body></html>',
                f"deep {i}",
            )
        )
    rows.append(
        (
            purl,
            '<html><body><div id="content">welcome stranger</div>'
            "</body></html>",
            "welcome stranger",
        )
    )
    return (
        spark.createDataFrame(rows, "url string, html string, text string")
        .select(
            "url",
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
            F.encode("html", "UTF-8").alias("html"),
            "text",
            F.lit("en").alias("lang"),
        ),
        purl,
    )


def test_soft404_guard_suppresses_error_page_outlinks(spark, tmp_path):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    pages, purl = _soft_corpus(spark)
    pages = pages.cache()

    def seeds():
        return spark.createDataFrame(
            [("https://real.com/start", 0)], ["url", "priority"]
        )

    def crawl(name, **kw):
        eng = CrawlEngine(
            spark, pages, None, str(tmp_path / name),
            wave_ms=10_000_000, max_depth=3, **kw,
        )
        res = eng.run(seeds(), max_waves=3)
        urls = {
            r["url_canon"]
            for r in res.listings(spark).select("url_canon").collect()
        }
        return res, urls

    _, base_urls = crawl("noguard")
    assert any("/deep/" in u for u in base_urls)  # control follows junk

    res, urls = crawl("guard", soft404_guard=True)
    # the probe was scheduled and fetched like any URL...
    assert purl in urls
    # ...its signature convicted the welcome pages, so their outlinks
    # never entered the frontier
    assert not any("/deep/" in u for u in urls)
    # real content is untouched
    assert "https://real.com/next" in urls
    flagged = {
        r["url_canon"] for r in res.soft404(spark).collect()
    }
    assert flagged == {purl} | {
        f"https://soft.com/p/{i}" for i in range(10)
    }


def test_soft404_result_accessor_empty_without_guard(spark, tmp_path):
    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    pages, _ = _soft_corpus(spark)
    res = CrawlEngine(
        spark, pages, None, str(tmp_path / "plain"),
        wave_ms=10_000_000, max_depth=2,
    ).run(
        spark.createDataFrame(
            [("https://real.com/start", 0)], ["url", "priority"]
        ),
        max_waves=1,
    )
    assert res.soft404(spark).count() == 0


def test_probe_urls_scheme_column(spark):
    """Per-host scheme: https hosts are probed over https, mixed-scheme
    hosts fold to https (max), NULL/empty schemes default to http, and
    the path part is scheme-independent (same md5)."""
    hosts = spark.createDataFrame(
        [
            ("s.com", "https"),
            ("mixed.com", "http"),
            ("mixed.com", "https"),
            ("plain.com", None),
            ("empty.com", ""),
        ],
        "host string, scheme string",
    )
    got = {
        r["host"]: r["probe_url"]
        for r in probe_urls(hosts, scheme_col="scheme").collect()
    }
    assert len(got) == 4  # one probe per host despite the mixed dup
    assert got["s.com"].startswith("https://s.com/__s404_probe__/")
    assert got["mixed.com"].startswith("https://mixed.com/__s404_probe__/")
    assert got["plain.com"].startswith("http://plain.com/__s404_probe__/")
    assert got["empty.com"].startswith("http://empty.com/__s404_probe__/")
    # path is the same md5 regardless of scheme
    base = {
        r["host"]: r["probe_url"]
        for r in probe_urls(hosts.select("host")).collect()
    }
    for h, u in got.items():
        assert u.split("://", 1)[1] == base[h].split("://", 1)[1]


def _null_probe_corpus(spark):
    """null.com answers its (https) probe with an UNEXTRACTABLE body —
    digest folds to the 'null' class. Two other null.com pages also
    extract NULL for unrelated reasons but carry real outlinks to
    extractable keep-pages. The 'null' signature must not convict them."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.soft404 import probe_urls

    purl = probe_urls(
        spark.createDataFrame([("null.com", "https")], ["host", "scheme"]),
        scheme_col="scheme",
    ).collect()[0]["probe_url"]
    rows = [
        (
            "https://real.com/start",
            '<html><body><div id="content">start</div>'
            '<a href="https://null.com/a">a</a>'
            '<a href="https://null.com/b">b</a></body></html>',
        ),
        # unextractable (no content div) but with real outlinks
        (
            "https://null.com/a",
            '<html><body><a href="https://null.com/keep/a">k</a></body></html>',
        ),
        (
            "https://null.com/b",
            '<html><body><a href="https://null.com/keep/b">k</a></body></html>',
        ),
        (
            "https://null.com/keep/a",
            '<html><body><div id="content">kept a</div></body></html>',
        ),
        (
            "https://null.com/keep/b",
            '<html><body><div id="content">kept b</div></body></html>',
        ),
        # the probe answer: also unextractable
        (purl, "<html><body>oops</body></html>"),
    ]
    return (
        spark.createDataFrame(rows, "url string, html string")
        .select(
            "url",
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
            F.encode("html", "UTF-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit("en").alias("lang"),
        )
    )


def test_null_digest_probe_answer_does_not_mass_convict(spark, tmp_path):
    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    pages = _null_probe_corpus(spark).cache()
    res = CrawlEngine(
        spark, pages, None, str(tmp_path / "nullsig"),
        wave_ms=10_000_000, max_depth=3, soft404_guard=True,
    ).run(
        spark.createDataFrame(
            [("https://real.com/start", 0)], ["url", "priority"]
        ),
        max_waves=3,
    )
    urls = {
        r["url_canon"]
        for r in res.listings(spark).select("url_canon").collect()
    }
    # the unextractable pages' outlinks survived: the folded 'null'
    # digest class never became a conviction signature
    assert "https://null.com/keep/a" in urls
    assert "https://null.com/keep/b" in urls
    assert res.soft404(spark).count() == 0
