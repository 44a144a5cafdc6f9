from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.frontier.scope import (
    scope_filter,
    seed_scope_values,
    static_rules,
)


def _frontier(spark, urls):
    from hk_housing_datahub_spark.functions.urls import with_url_columns

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return with_url_columns(df).select("url_canon")


def _seeds(spark, urls):
    return _frontier(spark, urls)


URLS = [
    "https://a.com/listings/1",
    "https://a.com/about",
    "https://sub.a.com/listings/2",
    "https://b.org/listings/3",
    "https://a.com/cal/2024/01/02/03/04/05/06",
]


def test_static_rules_exclude_and_depth(spark):
    df = _frontier(spark, URLS)
    kept = sorted(
        r["url_canon"]
        for r in df.filter(
            static_rules(
                F.col("url_canon"),
                exclude_patterns=[r"/about$"],
                max_path_segments=4,
            )
        ).collect()
    )
    assert kept == [
        "https://a.com/listings/1",
        "https://b.org/listings/3",
        "https://sub.a.com/listings/2",
    ]


def test_scope_modes_host_domain_prefix(spark):
    f = _frontier(spark, URLS)
    seeds = _seeds(spark, ["https://a.com/listings/"])

    host = sorted(
        r["url_canon"]
        for r in scope_filter(f, seeds, mode="host").collect()
    )
    assert host == [
        "https://a.com/about",
        "https://a.com/cal/2024/01/02/03/04/05/06",
        "https://a.com/listings/1",
    ]

    dom = sorted(
        r["url_canon"]
        for r in scope_filter(f, seeds, mode="domain").collect()
    )
    assert dom == [
        "https://a.com/about",
        "https://a.com/cal/2024/01/02/03/04/05/06",
        "https://a.com/listings/1",
        "https://sub.a.com/listings/2",
    ]

    pref = sorted(
        r["url_canon"]
        for r in scope_filter(f, seeds, mode="surt_prefix").collect()
    )
    # path-scoped: same host but /about is OUT; sub.a.com is OUT
    assert pref == ["https://a.com/listings/1"]

    assert scope_filter(f, seeds, mode="open").count() == len(URLS)
    with pytest.raises(ValueError, match="scope mode"):
        scope_filter(f, seeds, mode="site")


def test_seed_scope_values_distinct(spark):
    seeds = _seeds(
        spark,
        ["https://a.com/x", "https://a.com/y", "https://sub.a.com/z"],
    )
    hosts = sorted(
        r["value"] for r in seed_scope_values(seeds, "host").collect()
    )
    assert hosts == ["com,a", "com,a,sub"]
    doms = sorted(
        r["value"] for r in seed_scope_values(seeds, "domain").collect()
    )
    assert doms == ["a.com"]


def _scope_corpus(spark):
    anchors = (
        '<a href="https://hub.example.com/p1">one</a>'
        '<a href="https://sub.hub.example.com/p2">two</a>'
        '<a href="https://other.org/p3">three</a>'
    )
    rows = [
        (
            "https://hub.example.com/",
            f'<div id="content">index</div>{anchors}',
            "index",
        ),
        ("https://hub.example.com/p1", '<div id="content">p1</div>', "p1"),
        (
            "https://sub.hub.example.com/p2",
            '<div id="content">p2</div>',
            "p2",
        ),
        ("https://other.org/p3", '<div id="content">p3</div>', "p3"),
    ]
    return spark.createDataFrame(
        rows, "url string, html string, text string"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        F.encode("html", "UTF-8").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


def _sched(spark, d, wave):
    return sorted(
        r["url_canon"]
        for r in spark.read.parquet(
            os.path.join(d, "schedule", f"wave={wave}")
        ).collect()
    )


def test_crawl_engine_scope_bounds_the_frontier(spark, tmp_path):
    """scope='domain' keeps the crawl on the seed's registrable domain
    (subdomain in, external host out); scope='host' also drops the
    subdomain; the open control fetches everything."""
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _scope_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [("https://hub.example.com/", 1)], "url string, priority int"
    )
    expect = {
        "open": [
            "https://hub.example.com/p1",
            "https://other.org/p3",
            "https://sub.hub.example.com/p2",
        ],
        "domain": [
            "https://hub.example.com/p1",
            "https://sub.hub.example.com/p2",
        ],
        "host": ["https://hub.example.com/p1"],
    }
    for mode, want in expect.items():
        d = str(tmp_path / mode)
        CrawlEngine(
            spark, pages, None, d, wave_ms=300, max_depth=2, scope=mode
        ).run(seeds, max_waves=2)
        assert _sched(spark, d, 1) == want, mode


def test_crawl_engine_scope_rules_reject_patterns(spark, tmp_path):
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _scope_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [("https://hub.example.com/", 1)], "url string, priority int"
    )
    d = str(tmp_path / "rules")
    CrawlEngine(
        spark, pages, None, d, wave_ms=300, max_depth=2,
        scope="domain", scope_rules={"exclude_patterns": [r"/p2$"]},
    ).run(seeds, max_waves=2)
    assert _sched(spark, d, 1) == ["https://hub.example.com/p1"]

    with pytest.raises(TypeError, match="scope_rules"):
        CrawlEngine(
            spark, pages, None, str(tmp_path / "bad"),
            scope="domain", scope_rules={"include": ["x"]},
        )
    with pytest.raises(TypeError, match="scope must be"):
        CrawlEngine(spark, pages, None, str(tmp_path / "bad2"), scope="si")


def test_host_suffix_chain(spark):
    from hk_housing_datahub_spark.frontier.scope import host_suffixes

    [r] = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s")
    ).collect()
    assert list(r["s"]) == [
        "a.b.example.com", "b.example.com", "example.com", "com",
    ]


def test_blocklist_filter_depth_inheritance_and_longest_match(spark):
    from hk_housing_datahub_spark.frontier.scope import blocklist_filter

    rows = [
        (1, "https://ads.example.com/x"),      # subdomain of entry
        (2, "https://example.com/y"),           # entry itself
        (3, "https://notexample.com/z"),        # suffix NOT label-aligned
        (4, "https://deep.bad.example.com/q"),  # matches two entries
        (5, None),                               # null url stays clean
        (6, "https://clean.org/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url_canon string")
    bl = spark.createDataFrame(
        [("example.com", "commerce"), ("bad.example.com", "malware")],
        "domain string, category string",
    )
    got = {
        r.doc_id: r.blocked_category
        for r in blocklist_filter(df, bl, annotate=True).collect()
    }
    assert got == {
        1: "commerce", 2: "commerce", 3: None, 4: "malware",
        5: None, 6: None,
    }
    kept = {r.doc_id for r in blocklist_filter(df, bl).collect()}
    assert kept == {3, 5, 6}
    # duplicate rows share the verdict; row count is preserved
    dup = df.union(df)
    assert blocklist_filter(dup, bl, annotate=True).count() == 12


def test_crawl_engine_blocklist_drops_listed_outlinks(spark, tmp_path):
    """blocklist= keeps listed domains (and their subdomains) out of
    wave 1's frontier; the unlisted outlink still schedules."""
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _scope_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [("https://hub.example.com/", 1)], "url string, priority int"
    )
    bl = spark.createDataFrame(
        [("other.org", "spam")], "domain string, category string"
    )
    d = str(tmp_path / "bl")
    CrawlEngine(
        spark, pages, None, d, wave_ms=300, max_depth=2, blocklist=bl
    ).run(seeds, max_waves=2)
    got = _sched(spark, d, 1)
    assert "https://other.org/p3" not in got
    assert "https://sub.hub.example.com/p2" in got
