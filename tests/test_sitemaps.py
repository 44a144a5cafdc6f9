"""Sitemap discovery: robots Sitemap lines → fetched XML → frontier seeds."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.functions.sitemaps import (
    discover_sitemap_seeds,
    sitemap_locs,
    sitemap_urls,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
TS = dt.datetime(2020, 1, 1)


def _page(url, text):
    return (url, TS, b"", text, "en")


@pytest.fixture(scope="module")
def fixture(spark):
    robots = spark.createDataFrame(
        [
            (
                "h0.example.com",
                "User-agent: *\nDisallow: /private\n"
                "Sitemap: https://h0.example.com/sitemap.xml   # comment\n"
                "sitemap: https://h0.example.com/sitemap-index.xml\n",
            ),
            ("h1.example.com", "User-agent: *\nAllow: /\n"),
            # sitemap URL with no stored page — a 404, silently skipped
            ("h2.example.com", "Sitemap: https://h2.example.com/missing.xml\n"),
        ],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            _page(
                "https://h0.example.com/sitemap.xml",
                "<urlset><url><loc> https://h0.example.com/listing/1?lang=en </loc></url>"
                "<url><LOC>https://h0.example.com/listing/2?lang=en</LOC></url></urlset>",
            ),
            _page(
                "https://h0.example.com/sitemap-index.xml",
                "<sitemapindex><sitemap><loc>https://h0.example.com/sitemap-a.xml</loc>"
                "</sitemap></sitemapindex>",
            ),
            _page(
                "https://h0.example.com/sitemap-a.xml",
                # listing/2 repeats the leaf sitemap's entry → distinct
                "<urlset><url><loc>https://h0.example.com/listing/3?lang=en</loc></url>"
                "<url><loc>https://h0.example.com/listing/2?lang=en</loc></url></urlset>",
            ),
        ],
        PAGES_SCHEMA,
    )
    return robots, pages


def test_sitemap_line_parse(spark):
    df = spark.createDataFrame(
        [
            ("Sitemap: https://a/s.xml\nUser-agent: *\nsitemap:https://a/t.xml # c",),
            ("User-agent: *\nDisallow: /\n",),
        ],
        "robots_txt string",
    )
    got = [r[0] for r in df.select(sitemap_urls(F.col("robots_txt"))).collect()]
    assert got[0] == ["https://a/s.xml", "https://a/t.xml"]
    assert got[1] == []


def test_loc_parse_trims_and_ignores_case(spark):
    df = spark.createDataFrame(
        [("<urlset><url><Loc>  https://a/1 </Loc></url><url><loc>https://a/2</loc></url></urlset>",)],
        "x string",
    )
    assert df.select(sitemap_locs(F.col("x"))).first()[0] == [
        "https://a/1",
        "https://a/2",
    ]


def test_discovery_two_level_distinct_and_404(spark, fixture):
    robots, pages = fixture
    seeds = discover_sitemap_seeds(robots, pages, priority=1)
    rows = sorted((r.url, r.priority) for r in seeds.collect())
    assert rows == [
        ("https://h0.example.com/listing/1?lang=en", 1),
        ("https://h0.example.com/listing/2?lang=en", 1),
        ("https://h0.example.com/listing/3?lang=en", 1),
    ]


def test_discovered_seeds_drive_the_crawl(spark):
    """End-to-end: sitemap-discovered seeds feed CrawlEngine.run unchanged
    (the (url, priority) contract) and the crawl reaches exactly the
    sitemap-listed pages plus their outlink closure."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.frontier import CrawlEngine

    base = generate_pages(spark, 60, n_hosts=3)
    listed = (
        base.orderBy("url").limit(2).select("url").collect()
    )
    locs = "".join(f"<url><loc>{r.url}</loc></url>" for r in listed)
    sitemap_pages = spark.createDataFrame(
        [_page("https://h0.example.com/sitemap.xml", f"<urlset>{locs}</urlset>")],
        PAGES_SCHEMA,
    )
    robots = spark.createDataFrame(
        [("h0.example.com", "Sitemap: https://h0.example.com/sitemap.xml\n")],
        "host string, robots_txt string",
    )
    pages = base.unionByName(sitemap_pages)
    seeds = discover_sitemap_seeds(robots, pages, priority=0)
    tmp = tempfile.mkdtemp(prefix="crawl_sm_")
    try:
        eng = CrawlEngine(spark, pages, None, tmp, wave_ms=1000, max_depth=1)
        res = eng.run(seeds, max_waves=2)
        got = {
            r.url_canon
            for r in res.listings(spark).select("url_canon").collect()
        }
        from hk_housing_datahub_spark.functions.urls import canonicalize_url

        want_seeded = {
            r[0]
            for r in spark.createDataFrame(
                [(x.url,) for x in listed], "url string"
            ).select(canonicalize_url(F.col("url"))).collect()
        }
        # every sitemap-listed page was fetched+extracted; depth-1 closure
        # may add outlink targets on top
        assert want_seeded <= got
        assert res.n_seen >= len(want_seeded)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sitemap_entries_and_lastmod_due_seeds(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.functions.sitemaps import (
        lastmod_due_seeds,
        sitemap_entries,
    )
    from hk_housing_datahub_spark.operators.recrawl import recrawl_schedule

    xml = (
        "<urlset>"
        "<url><loc>https://a.com/fresh</loc>"
        "<lastmod>2023-11-20T00:00:00</lastmod></url>"
        "<url><loc> https://a.com/stale </loc>"
        "<lastmod>2023-11-01T00:00:00</lastmod></url>"
        "<url><loc>https://a.com/nolastmod</loc></url>"
        "<url><loc>https://a.com/badmod</loc>"
        "<lastmod>not-a-date</lastmod></url>"
        "</urlset>"
    )
    docs = spark.createDataFrame([(xml,)], ["_body"])
    ents = docs.select(
        F.explode(sitemap_entries(F.col("_body"))).alias("e")
    ).collect()
    assert len(ents) == 4
    assert ents[2]["e"]["lastmod"] is None

    # schedule: every URL last captured 2023-11-10, never changed
    t_cap = 1_699_574_400  # 2023-11-10T00:00:00Z
    caps = spark.createDataFrame(
        [
            (f"https://a.com/{p}", t_cap, "d")
            for p in ("fresh", "stale", "nolastmod", "badmod")
        ],
        "url_canon string, epoch long, digest string",
    ).select(
        "url_canon",
        F.timestamp_seconds("epoch").alias("warc_ts"),
        "digest",
    )
    sched = recrawl_schedule(caps)
    due = lastmod_due_seeds(docs, sched)
    got = {r["url"] for r in due.collect()}
    # only the URL whose site-claimed change postdates our capture
    assert got == {"https://a.com/fresh"}
    assert due.columns == ["url", "priority"]


def test_apply_sitemap_hints_tighten_only(spark):
    """<changefreq> claims tighten the CGM schedule, never loosen it;
    'always' floors at the politeness minimum; 'never'/junk/absent
    change nothing; duplicate entries take the most urgent claim."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.functions.sitemaps import (
        apply_sitemap_hints,
        changefreq_interval,
    )

    xml = (
        "<urlset>"
        # weekly-measured page the site claims changes daily -> tighten
        "<url><loc>https://a.com/daily</loc>"
        "<changefreq>DAILY</changefreq><priority>0.9</priority></url>"
        # hot page the site claims yearly -> measured evidence wins
        "<url><loc>https://a.com/hot</loc>"
        "<changefreq>yearly</changefreq></url>"
        # 'always' floors at min_interval_s
        "<url><loc>https://a.com/always</loc>"
        "<changefreq>always</changefreq></url>"
        # 'never' carries no interval -> unchanged
        "<url><loc>https://a.com/never</loc>"
        "<changefreq>never</changefreq><priority>abc</priority></url>"
        # duplicate entries -> most urgent claim (daily beats monthly)
        "<url><loc>https://a.com/dup</loc>"
        "<changefreq>monthly</changefreq><priority>0.2</priority></url>"
        "<url><loc>https://a.com/dup</loc>"
        "<changefreq>daily</changefreq><priority>0.7</priority></url>"
        "</urlset>"
    )
    docs = spark.createDataFrame([(xml,)], ["_body"])
    t0 = 1_700_000_000
    sched = spark.createDataFrame(
        [
            ("https://a.com/daily", 604800.0),
            ("https://a.com/hot", 7200.0),
            ("https://a.com/always", 86400.0),
            ("https://a.com/never", 86400.0),
            ("https://a.com/dup", 2592000.0),
            ("https://a.com/unlisted", 86400.0),
        ],
        "url string, refetch_interval_s double",
    ).select(
        "url",
        "refetch_interval_s",
        (F.lit(t0) + F.floor("refetch_interval_s").cast("long")).alias(
            "next_fetch_epoch"
        ),
    )

    out = apply_sitemap_hints(sched, docs, min_interval_s=3600)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["https://a.com/daily"]["refetch_interval_s"] == 86400.0
    assert rows["https://a.com/daily"]["sm_priority"] == 0.9
    # epoch re-anchored on the same last capture
    assert rows["https://a.com/daily"]["next_fetch_epoch"] == t0 + 86400
    assert rows["https://a.com/hot"]["refetch_interval_s"] == 7200.0
    assert rows["https://a.com/always"]["refetch_interval_s"] == 3600.0
    assert rows["https://a.com/never"]["refetch_interval_s"] == 86400.0
    assert rows["https://a.com/never"]["hint_interval_s"] is None
    assert rows["https://a.com/never"]["sm_priority"] is None
    assert rows["https://a.com/dup"]["refetch_interval_s"] == 86400.0
    assert rows["https://a.com/dup"]["sm_priority"] == 0.7
    assert rows["https://a.com/unlisted"]["refetch_interval_s"] == 86400.0
    assert rows["https://a.com/unlisted"]["next_fetch_epoch"] == t0 + 86400

    # keyword mapping is total: unknown keywords yield NULL
    kw = spark.createDataFrame(
        [("daily",), ("never",), ("sometimes",), (None,)], ["k"]
    ).select(changefreq_interval(F.col("k")).alias("s"))
    assert [r["s"] for r in kw.collect()] == [86400.0, None, None, None]
