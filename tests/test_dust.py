from __future__ import annotations

import re

from hk_housing_datahub_spark.operators.dust import (
    DEFAULT_PATH_RULES,
    dust_apply,
    dust_rules,
)


def _mk(host, path, q="", digest=None):
    url = f"http://{host}{path}" + (f"?{q}" if q else "")
    return (url, digest or url)


CAPS = [
    # host a: sess param is DUST (3 supporting pairs), page is content
    _mk("a.com", "/p1", digest="d1"),
    _mk("a.com", "/p1", "sess=x1", digest="d1"),
    _mk("a.com", "/p2", digest="d2"),
    _mk("a.com", "/p2", "sess=x2", digest="d2"),
    _mk("a.com", "/p3", digest="d3"),
    _mk("a.com", "/p3", "sess=x3", digest="d3"),
    _mk("a.com", "/p1", "page=2", digest="d1b"),
    _mk("a.com", "/p2", "page=2", digest="d2b"),
    # host b: sess is CONTENT here (per-host rules!)
    _mk("b.com", "/q", digest="e1"),
    _mk("b.com", "/q", "sess=1", digest="e2"),
    _mk("b.com", "/q", "sess=2", digest="e3"),
    # host a: index.html duplicates
    _mk("a.com", "/dir/", digest="d4"),
    _mk("a.com", "/dir/index.html", digest="d4"),
    _mk("a.com", "/dir2/", digest="d5"),
    _mk("a.com", "/dir2/index.html", digest="d5"),
    # unmatched rewrite target (never captured) must be ignored
    _mk("a.com", "/lonely", "sess=zz", digest="d9"),
]


def _model(caps, min_support=2, min_precision=0.9):
    """Pure-Python twin of dust_rules over (url, digest) captures."""
    caps = sorted(set(caps))
    by_url = dict(caps)
    rows = {}

    def hit(url, digest, rule, rewritten):
        if rewritten == url or rewritten not in by_url:
            return
        host = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", url)
        host = re.sub(r"[/?].*$", "", host)
        host = re.sub(r":[0-9]+$", "", host).lower()
        key = (host, rule)
        s, v = rows.get(key, (0, 0))
        if by_url[rewritten] == digest:
            rows[key] = (s + 1, v)
        else:
            rows[key] = (s, v + 1)

    for url, digest in caps:
        m = re.match(r"^([^?]*)\?(.*)$", url)
        if m:
            basep, q = m.groups()
            parts = [p for p in q.split("&") if p]
            for name in {p.split("=", 1)[0] for p in parts}:
                keep = [
                    p
                    for p in parts
                    if not p.startswith(name + "=") and p != name
                ]
                rw = basep + ("?" + "&".join(keep) if keep else "")
                hit(url, digest, "drop_param:" + name, rw)
        for rule_id, pat, repl in DEFAULT_PATH_RULES:
            rw = re.sub(pat, repl, url)
            hit(url, digest, rule_id, rw)
    out = {}
    for (host, rule), (s, v) in rows.items():
        prec = s / (s + v)
        out[(host, rule)] = (
            s,
            v,
            round(prec, 6),
            s >= min_support and prec >= min_precision,
        )
    return out


def test_dust_rules_match_python_model(spark):
    df = spark.createDataFrame(CAPS, ["url", "digest"])
    got = {
        (r["host"], r["rule"]): (
            r["support"],
            r["violations"],
            r["precision"],
            r["valid"],
        )
        for r in dust_rules(df).collect()
    }
    assert got == _model(CAPS)


def test_dust_rules_expected_verdicts(spark):
    df = spark.createDataFrame(CAPS, ["url", "digest"])
    got = {(r["host"], r["rule"]): r for r in dust_rules(df).collect()}
    sess_a = got[("a.com", "drop_param:sess")]
    assert (sess_a["support"], sess_a["violations"]) == (3, 0)
    assert sess_a["valid"]
    # page param changes content: all violations, invalid
    page_a = got[("a.com", "drop_param:page")]
    assert (page_a["support"], page_a["violations"]) == (0, 2)
    assert not page_a["valid"]
    # per-host: sess on b.com is content
    sess_b = got[("b.com", "drop_param:sess")]
    assert sess_b["violations"] == 2 and not sess_b["valid"]
    idx = got[("a.com", "strip_index_html")]
    assert (idx["support"], idx["violations"]) == (2, 0) and idx["valid"]
    # the unmatched-target rewrite contributed nowhere
    assert sess_a["support"] + page_a["support"] + idx["support"] == 5


def test_dust_rules_drops_nulls_and_dedups(spark):
    rows = CAPS + [CAPS[1], (None, "x"), ("http://a.com/z", None)]
    df = spark.createDataFrame(rows, ["url", "digest"])
    assert {
        (r["host"], r["rule"]): (r["support"], r["violations"])
        for r in dust_rules(df).collect()
    } == {k: v[:2] for k, v in _model(CAPS).items()}


def test_dust_apply_rewrites_only_valid_host_rules(spark):
    rules = dust_rules(spark.createDataFrame(CAPS, ["url", "digest"]))
    frontier = spark.createDataFrame(
        [
            ("http://a.com/new?sess=abc&keep=1",),  # unseen variant!
            ("http://a.com/other/index.html",),
            ("http://a.com/p?page=2",),  # invalid rule: untouched
            ("http://b.com/q?sess=9",),  # other host: untouched
            ("http://c.com/x?sess=1",),  # unknown host: untouched
        ],
        ["url"],
    )
    got = {
        r["url"]: r["url_dust"]
        for r in dust_apply(frontier, rules).collect()
    }
    assert got["http://a.com/new?sess=abc&keep=1"] == "http://a.com/new?keep=1"
    assert got["http://a.com/other/index.html"] == "http://a.com/other/"
    assert got["http://a.com/p?page=2"] == "http://a.com/p?page=2"
    assert got["http://b.com/q?sess=9"] == "http://b.com/q?sess=9"
    assert got["http://c.com/x?sess=1"] == "http://c.com/x?sess=1"


def test_dust_apply_drops_question_mark_when_query_empties(spark):
    rules = dust_rules(spark.createDataFrame(CAPS, ["url", "digest"]))
    frontier = spark.createDataFrame(
        [("http://a.com/solo?sess=q",)], ["url"]
    )
    got = dust_apply(frontier, rules).collect()[0]
    assert got["url_dust"] == "http://a.com/solo"


def _sess_corpus(spark):
    """site.com serves every page at BOTH /p/{i} and /p/{i}?sess={i}
    (byte-identical content); each page links to both addresses of the
    page one hop deeper, so an unguarded crawl fetches every duplicate."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(120):
        text = f"content {i}"
        nxt = i + 60
        html = (
            f'<html><body><div id="content">{text}</div>'
            f'<a href="https://site.com/p/{nxt}">a</a>'
            f'<a href="https://site.com/p/{nxt}?sess={nxt}">b</a>'
            "</body></html>"
        ).encode()
        rows.append((f"https://site.com/p/{i}", html, text))
        rows.append((f"https://site.com/p/{i}?sess={i}", html, text))
    return spark.createDataFrame(
        rows, "url string, html binary, text string"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        "html",
        "text",
        F.lit("en").alias("lang"),
    )


def test_dust_guard_collapses_param_aliases_in_the_frontier(spark, tmp_path):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    pages = _sess_corpus(spark).cache()

    def seeds():
        s = [(f"https://site.com/p/{i}", 0) for i in range(25)]
        s += [(f"https://site.com/p/{i}?sess={i}", 0) for i in range(25)]
        return spark.createDataFrame(s, ["url", "priority"])

    def crawl(name, **kw):
        eng = CrawlEngine(
            spark, pages, None, str(tmp_path / name),
            wave_ms=10_000_000, max_depth=2, **kw,
        )
        res = eng.run(seeds(), max_waves=2)
        return {
            r["wave"]: r["n"]
            for r in res.listings(spark)
            .groupBy("wave")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    base = crawl("noguard")
    assert base[0] == 50 and base[1] == 50  # aliases crawled twice

    guarded = crawl("dust", dust_guard=True)
    # wave 0 fetches the seeded aliases (the guard reacts to captures),
    # then wave 0's own 25 alias pairs validate drop_param:sess and the
    # discovered ?sess= outlinks collapse onto their clean twins
    assert guarded[0] == 50
    assert guarded[1] == 25

    # the crawled set (beyond seeds) is exactly the clean addresses
    eng_listings = (
        spark.read.parquet(str(tmp_path / "dust" / "listings"))
        .filter("wave = 1")
        .select("url_canon")
        .collect()
    )
    assert all("?sess=" not in r["url_canon"] for r in eng_listings)


def test_dust_guard_rejects_unknown_thresholds(spark, tmp_path):
    import pytest as _pytest

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    with _pytest.raises(TypeError, match="dust_thresholds"):
        CrawlEngine(
            spark, _sess_corpus(spark), None, str(tmp_path / "x"),
            dust_guard=True, dust_thresholds={"bogus": 1},
        )


def test_dust_apply_passthrough_and_drop_param_parity(spark):
    """Two rewrite-consistency guarantees: (1) URLs on hosts with no
    valid rules pass through BYTE-identical (even pathological '&&'
    queries are not re-assembled); (2) on ruled hosts the applied
    rewrite keeps empty segments exactly like drop_param, so the
    applied form is the one dust_rules validated."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.dust import drop_param

    rules = dust_rules(spark.createDataFrame(CAPS, ["url", "digest"]))
    frontier = spark.createDataFrame(
        [
            ("http://nowhere.com/x?a=1&&b=2",),  # no rules: untouched
            ("http://a.com/y?a=1&&b=2",),  # ruled host, no sess: same
            ("http://a.com/z?a=1&&sess=q&b=2",),  # sess dropped, && kept
        ],
        ["url"],
    )
    got = {
        r["url"]: r["url_dust"]
        for r in dust_apply(frontier, rules).collect()
    }
    assert got["http://nowhere.com/x?a=1&&b=2"] == "http://nowhere.com/x?a=1&&b=2"
    assert got["http://a.com/y?a=1&&b=2"] == "http://a.com/y?a=1&&b=2"
    want = spark.range(1).select(
        drop_param(
            F.lit("http://a.com/z?a=1&&sess=q&b=2"), F.lit("sess")
        ).alias("u")
    ).collect()[0]["u"]
    assert got["http://a.com/z?a=1&&sess=q&b=2"] == want == "http://a.com/z?a=1&&b=2"
