from __future__ import annotations

import itertools

from hk_housing_datahub_spark.operators.mirrors import (
    host_digest_sets,
    mirror_host_pairs,
    suppressed_hosts,
)


def _caps(spark, rows):
    return spark.createDataFrame(rows, ["host", "digest"])


def test_mirror_pair_scores(spark):
    rows = []
    rows += [("a.com", f"d{i}") for i in range(20)]
    rows += [("b.com", f"d{i}") for i in range(18)]  # 18/20 of a.com
    rows += [("b.com", "bx1"), ("b.com", "bx2")]  # |b| = 20
    rows += [("c.com", f"z{i}") for i in range(15)]  # disjoint
    got = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_host_pairs(_caps(spark, rows)).collect()
    }
    assert list(got) == [("a.com", "b.com")]
    p = got[("a.com", "b.com")]
    assert (p["shared"], p["size_a"], p["size_b"]) == (18, 20, 20)
    assert abs(p["containment"] - 18 / 20) < 1e-12
    assert abs(p["jaccard"] - 18 / 22) < 1e-12


def test_repeat_captures_count_once(spark):
    rows = [("a.com", "d1")] * 5 + [("b.com", "d1")] * 3 + [
        ("a.com", f"x{i}") for i in range(4)
    ] + [("b.com", f"y{i}") for i in range(4)]
    got = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).collect()
    assert len(got) == 1
    assert (got[0]["shared"], got[0]["size_a"], got[0]["size_b"]) == (1, 5, 5)


def test_hot_digest_cap_drops_boilerplate_evidence(spark):
    # every host shares the "empty page" digest; with the cap it carries
    # no signal — disjoint hosts stay unflagged and set sizes exclude it
    hosts = [f"h{i}.com" for i in range(6)]
    rows = [(h, "boiler") for h in hosts]
    rows += [(h, f"{h}-p{i}") for h in hosts for i in range(6)]
    rows += [("h0.com", "m1"), ("h1.com", "m1")]  # one true shared page
    flagged = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0,
        max_digest_df=3,
    ).collect()
    assert [(r["host_a"], r["host_b"]) for r in flagged] == [
        ("h0.com", "h1.com")
    ]
    assert (flagged[0]["shared"], flagged[0]["size_a"]) == (1, 7)
    # without the cap the boilerplate digest fabricates all 15 pairs
    uncapped = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).count()
    assert uncapped == 15


def test_null_digests_ignored(spark):
    rows = [("a.com", None), ("b.com", None), ("a.com", "d"), ("b.com", "d")]
    got = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).collect()
    assert len(got) == 1 and got[0]["shared"] == 1


def test_suppression_keeps_larger_side(spark):
    rows = [("big.com", f"d{i}") for i in range(10)]
    rows += [("small.com", f"d{i}") for i in range(8)]  # subset mirror
    rows += [("tie-a.com", f"t{i}") for i in range(5)]
    rows += [("tie-b.com", f"t{i}") for i in range(5)]  # equal-size mirror
    pairs = mirror_host_pairs(_caps(spark, rows), min_containment=0.8)
    got = {r["host"] for r in suppressed_hosts(pairs).collect()}
    # smaller side suppressed; equal sizes → lexicographically larger
    assert got == {"small.com", "tie-b.com"}


def test_matches_python_set_model(spark):
    """Brute-force set model over a deterministic construction: 8 hosts,
    host i's informative set = pages {j : j % (i+2) == 0, j < 60}."""
    rows = [
        (f"h{i}", f"p{j}")
        for i in range(8)
        for j in range(60)
        if j % (i + 2) == 0
    ]
    sets = {}
    for h, d in rows:
        sets.setdefault(h, set()).add(d)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sh = len(sets[a] & sets[b])
        cont = sh / min(len(sets[a]), len(sets[b]))
        if sh >= 3 and cont >= 0.4:
            want[(a, b)] = (sh, len(sets[a]), len(sets[b]))
    got = {
        (r["host_a"], r["host_b"]): (r["shared"], r["size_a"], r["size_b"])
        for r in mirror_host_pairs(
            _caps(spark, rows), min_shared=3, min_containment=0.4
        ).collect()
    }
    assert got == want and len(want) > 3


def test_host_digest_sets_sizes(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x")]
    got = {
        (r["host"], r["digest"]): r["sz"]
        for r in host_digest_sets(_caps(spark, rows)).collect()
    }
    assert got == {("a", "x"): 2, ("a", "y"): 2, ("b", "x"): 1}


def _mirror_corpus(spark):
    """big.com and mirror.com serve byte-identical content per page id
    (a full mirror); ok.com is distinct. Every page links one hop
    deeper on its own host, so an unguarded crawl follows all three
    into wave 1."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(120):
        for host, text in (
            ("big.com", f"content {i}"),
            ("mirror.com", f"content {i}"),
            ("ok.com", f"ok content {i}"),
        ):
            url = f"https://{host}/p/{i}"
            html = (
                f'<html><body><div id="content">{text}</div>'
                f'<a href="https://{host}/p/{i + 60}">n</a>'
                "</body></html>"
            )
            rows.append((url, html.encode(), text))
    return spark.createDataFrame(
        rows, "url string, html binary, text string"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        "html",
        "text",
        F.lit("en").alias("lang"),
    )


def test_mirror_guard_evicts_the_smaller_mirror(spark, tmp_path):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    pages = _mirror_corpus(spark).cache()

    def seeds():
        s = [
            (f"https://{h}/p/{i}", 0)
            for h in ("big.com", "mirror.com", "ok.com")
            for i in range(25)
        ]
        return spark.createDataFrame(s, ["url", "priority"])

    def crawl(name, **kw):
        eng = CrawlEngine(
            spark, pages, None, str(tmp_path / name),
            wave_ms=10_000_000, max_depth=2, **kw,
        )
        res = eng.run(seeds(), max_waves=2)
        return {
            (r["wave"], r["host"]): r["n"]
            for r in res.listings(spark)
            .groupBy("wave", "host")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    base = crawl("noguard")
    assert base[(1, "mirror.com")] == 25  # unguarded: the copy is crawled

    guarded = crawl(
        "guard",
        mirror_guard=True,
        mirror_thresholds={"min_shared": 10, "min_containment": 0.9},
    )
    # wave 0 is identical (the guard reacts to observed captures)...
    assert guarded[(0, "mirror.com")] == 25
    assert guarded[(0, "big.com")] == 25
    # ...then the equal-size mirror's lexicographically larger host is
    # suppressed while the original and the healthy host continue
    assert (1, "mirror.com") not in guarded
    assert guarded[(1, "big.com")] == base[(1, "big.com")] == 25
    assert guarded[(1, "ok.com")] == base[(1, "ok.com")] == 25


def test_mirror_guard_rejects_unknown_thresholds(spark, tmp_path):
    import pytest

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    with pytest.raises(TypeError, match="mirror_thresholds"):
        CrawlEngine(
            spark, _mirror_corpus(spark), None, str(tmp_path / "x"),
            mirror_guard=True, mirror_thresholds={"bogus": 1},
        )


def test_canonical_urls_prefers_short_clean_addresses(spark):
    from hk_housing_datahub_spark.operators.mirrors import canonical_urls

    rows = [
        ("https://a.com/p?utm=1&ref=2", "d1"),
        ("https://a.com/p", "d1"),  # shortest wins
        ("https://mirror.net/p", "d1"),
        ("https://b.com/x?a=1", "d2"),
        ("https://b.com/y?a=1", "d2"),  # equal len/params -> lexicographic
        ("https://c.com/only", None),  # null digest ignored
    ]
    got = {
        r["digest"]: (r["canonical_url"], r["n_urls"])
        for r in canonical_urls(
            spark.createDataFrame(rows, ["url_canon", "digest"])
        ).collect()
    }
    assert got == {
        "d1": ("https://a.com/p", 3),
        "d2": ("https://b.com/x?a=1", 2),
    }


def test_canonical_urls_query_edges(spark):
    """Param counting reads the query AFTER THE FIRST '?' (a '?' inside
    a value belongs to the query), empty '&' segments don't count, and
    a NULL url row can never win min(struct) for its digest."""
    from hk_housing_datahub_spark.operators.mirrors import canonical_urls

    rows = [
        # equal length 27; true params: 2 ('b=2?c=3' is ONE value) vs 1.
        # Counting after the LAST '?' would see 1 ('c=3') for the first
        # and tie-break lexicographically to the wrong winner.
        ("https://c.com/p?a=1&b=2?c=3", "d3"),
        ("https://c.com/pqrst?a=12345", "d3"),
        # trailing '&' adds no parameter: 1 param beats 2
        ("https://e.com/ppp?a=1&", "d4"),
        ("https://e.com/p?a=1&b=", "d4"),
        # NULL url must not shadow the real address
        (None, "d5"),
        ("https://f.com/x", "d5"),
    ]
    got = {
        r["digest"]: (r["canonical_url"], r["n_urls"])
        for r in canonical_urls(
            spark.createDataFrame(rows, "url_canon string, digest string")
        ).collect()
    }
    assert got == {
        "d3": ("https://c.com/pqrst?a=12345", 2),
        "d4": ("https://e.com/ppp?a=1&", 2),
        "d5": ("https://f.com/x", 1),
    }


def test_mirror_guard_ignores_null_extract_class(spark, tmp_path):
    """Unextractable pages fold into one 'null' digest for the TRAP
    guard, but that class is not content identity: two hosts that each
    serve an unextractable page share nothing. Here semi.com mirrors
    only 4 of big.com's pages (< min_shared=5) and both hosts serve one
    NULL-extract shell — counting the folded class would push shared to
    5 at containment 1.0 and wrongly evict semi.com from wave 1."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine

    def page(host, i, text, link=None):
        url = f"https://{host}/p/{i}"
        body = f'<div id="content">{text}</div>' if text is not None else ""
        html = (
            f"<html><body>{body}"
            f'<a href="https://{host}/p/{link if link is not None else i + 60}">n</a>'
            "</body></html>"
        )
        return (url, html.encode(), text or "")

    rows = []
    for i in range(120):
        rows.append(page("big.com", i, f"content {i}"))
    # semi.com serves ONLY 8 pages, all byte-copies of big.com's first 8
    # (pages 0..3 are seeds and link to 4..7 for wave 1): after wave 0
    # its informative set is exactly {d0..d3} — 4 shared digests, one
    # under min_shared. The folded 'null' class from the two shells
    # would make it 5 shared at containment 5/5 = 1.0.
    for i in range(8):
        rows.append(page("semi.com", i, f"content {i}", link=i + 4))
    # one unextractable shell on EACH host (shared 'null' class)
    rows.append(page("big.com", 500, None))
    rows.append(page("semi.com", 500, None))
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        "html",
        "text",
        F.lit("en").alias("lang"),
    ).cache()

    seeds = spark.createDataFrame(
        [(f"https://big.com/p/{i}", 0) for i in list(range(25)) + [500]]
        + [(f"https://semi.com/p/{i}", 0) for i in [0, 1, 2, 3, 500]],
        ["url", "priority"],
    )
    eng = CrawlEngine(
        spark, pages, None, str(tmp_path / "nullguard"),
        wave_ms=10_000_000, max_depth=2,
        mirror_guard=True,
        mirror_thresholds={"min_shared": 5, "min_containment": 0.9},
    )
    res = eng.run(seeds, max_waves=2)
    by_wave_host = {
        (r["wave"], r["host"]): r["n"]
        for r in res.listings(spark)
        .groupBy("wave", "host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # semi.com is NOT a mirror (4 shared < min_shared) — it must keep
    # crawling in wave 1 despite the shared unextractable shell
    assert (1, "semi.com") in by_wave_host
    assert (1, "big.com") in by_wave_host
