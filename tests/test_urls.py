"""URL canonicalization: Spark Column impl vs pure-Python twin, properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.frontier.simulator import canonicalize
from hk_housing_datahub_spark.functions.urls import (
    canonicalize_url,
    seen_bucket,
    url_hash,
    url_host,
    with_url_columns,
)

CASES = [
    "https://Example.COM/path",
    "HTTP://EXAMPLE.com:80/a?b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com",
    "http://example.com:8080/x?z=1&y=2&z=0",
    "https://h0.example.com/listing/5?lang=zh-hk",
    "HTTPS://H0.EXAMPLE.COM:443/listing/5?lang=zh-hk#top",
    "https://example.com/p?&&a=1&",
    "  https://spacey.com/x  ",
    "https://example.com/p?",
]

EXPECTED = {
    "https://Example.COM/path": "https://example.com/path",
    "HTTP://EXAMPLE.com:80/a?b=2&a=1#frag": "http://example.com/a?a=1&b=2",
    "https://example.com:443/": "https://example.com/",
    "https://example.com": "https://example.com/",
    "http://example.com:8080/x?z=1&y=2&z=0": "http://example.com:8080/x?y=2&z=0&z=1",
}


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", canonicalize_url(F.col("url")).alias("canon")).collect()
    }
    for u in CASES:
        assert got[u] == canonicalize(u), u


def test_known_canonical_forms(spark):
    df = spark.createDataFrame([(u,) for u in EXPECTED], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", canonicalize_url(F.col("url")).alias("canon")).collect()
    }
    for u, want in EXPECTED.items():
        assert got[u] == want, (u, got[u])


def test_canonicalization_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("url"))
    twice = once.select(
        F.col("url").alias("c1"), canonicalize_url(F.col("url")).alias("c2")
    )
    for r in twice.collect():
        assert r["c1"] == r["c2"]


def test_bucket_stability_and_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.B.C:443/x#f",), ("https://a.b.c/x",)], ["url"]
    )
    out = with_url_columns(df).select("url_canon", "host", "url_hash", "bucket")
    rows = out.collect()
    # alias forms collapse to identical canon/hash/bucket
    assert rows[0]["url_canon"] == rows[1]["url_canon"]
    assert rows[0]["url_hash"] == rows[1]["url_hash"]
    assert rows[0]["bucket"] == rows[1]["bucket"]
    assert rows[0]["host"] == "a.b.c"
    assert 0 <= rows[0]["bucket"] < 8192


# ---------------------------------------------------------------------------
# property-based: random adversarial URLs (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"])
    _host = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}", fullmatch=True)
    _port = st.sampled_from(["", ":80", ":443", ":8080", ":0012"])
    _path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,3}", fullmatch=True)
    _query = st.lists(
        st.from_regex(r"[a-z]{1,3}=[A-Za-z0-9]{0,4}", fullmatch=True),
        max_size=4,
    ).map(lambda ps: "&".join(ps))
    _frag = st.sampled_from(["", "#x", "#frag/ment?a=1"])

    @st.composite
    def _urls(draw):
        q = draw(_query)
        return (
            draw(_scheme) + "://" + draw(_host) + draw(_port) + draw(_path)
            + ("?" + q if q else "") + draw(_frag)
        )

    @given(st.lists(_urls(), min_size=1, max_size=30))
    @settings(max_examples=20, deadline=None)
    def test_canonicalize_property_parity(spark, urls):
        """Spark canonicalization == the pure-Python twin, and both are
        idempotent, on randomized messy URLs."""
        from hk_housing_datahub_spark.frontier.simulator import canonicalize
        from hk_housing_datahub_spark.functions.urls import canonicalize_url
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [
            r.c
            for r in df.select(canonicalize_url(F.col("url")).alias("c"))
            .collect()
        ]
        want = [canonicalize(u) for u in urls]
        assert got == want
        assert [canonicalize(c) for c in got] == got  # idempotent


def test_registrable_domain_etld_plus_one(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.functions.surt import registrable_domain

    cases = {
        "https://a.b.example.co.uk/p": "example.co.uk",
        "https://www.example.co.uk/": "example.co.uk",
        "https://example.co.uk/": "example.co.uk",
        "https://co.uk/": "co.uk",  # bare public suffix passes through
        "https://deep.sub.example.com/x": "example.com",
        "https://Example.COM/": "example.com",
        "https://news.site.com.au/": "site.com.au",
        "https://localhost/": "localhost",  # single label passes through
        "https://h1.example.org:8080/p?q=1": "example.org",
        "https://192.168.0.1/admin": "192.168.0.1",  # IPv4 passes whole
        "https://10.0.0.1/": "10.0.0.1",  # ...not folded to a shared '0.1'
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r["url"]: r["dom"]
        for r in df.select(
            "url", registrable_domain(F.col("url")).alias("dom")
        ).collect()
    }
    assert got == cases


def test_registrable_domain_groups_sibling_subdomains(spark):
    """The point of the fold: sibling subdomains of one registrant in a
    ccTLD share a group, while unrelated *.co.uk registrants do NOT
    collapse together (the last-2-labels naive rule would)."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.functions.surt import registrable_domain

    df = spark.createDataFrame(
        [
            ("https://a.shop.co.uk/1",),
            ("https://b.shop.co.uk/2",),
            ("https://other.co.uk/3",),
        ],
        ["url"],
    )
    doms = (
        df.select(registrable_domain(F.col("url")).alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    got = {r["d"]: r["count"] for r in doms}
    assert got == {"shop.co.uk": 2, "other.co.uk": 1}
