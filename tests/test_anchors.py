from __future__ import annotations

import re

from pyspark.sql import functions as F

from hk_housing_datahub_spark.functions.anchors import (
    ANCHOR_RE,
    anchor_text_rollup,
    extract_anchors,
    top_anchor_per_target,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url_canon", "html"])


def test_extract_anchor_pairs_in_document_order(spark):
    html = (
        '<a href="https://t.org/a">Site  One</a><p>x</p>'
        '<a href="https://t.org/b" class="z">  read\n more </a>'
        '<a href="https://t.org/a"></a>'
    )
    got = (
        extract_anchors(_pages(spark, [("https://s.com/p", html)]))
        .orderBy("pos")
        .collect()
    )
    assert [(r["pos"], r["href"], r["anchor_text"]) for r in got] == [
        (0, "https://t.org/a", "Site One"),  # inner run collapsed
        (1, "https://t.org/b", "read more"),  # trimmed + newline folded
        (2, "https://t.org/a", ""),  # hollow anchor is a real value
    ]


def test_null_and_linkless_html_yield_no_rows(spark):
    got = extract_anchors(
        _pages(
            spark,
            [("https://s.com/1", None), ("https://s.com/2", "<b>none</b>")],
        )
    )
    assert got.count() == 0


def test_binary_html_is_decoded(spark):
    df = _pages(
        spark, [("https://s.com/p", '<a href="https://t.org/x">T</a>')]
    ).select("url_canon", F.encode("html", "UTF-8").alias("html"))
    got = extract_anchors(df).collect()
    assert [(r["href"], r["anchor_text"]) for r in got] == [
        ("https://t.org/x", "T")
    ]


def test_nested_markup_body_does_not_match(spark):
    # [^<]* bans nested tags from the text capture by construction —
    # the anchor with a <b> inside simply isn't extracted (documented)
    html = '<a href="https://t.org/a"><b>bold</b></a><a href="https://t.org/b">ok</a>'
    got = extract_anchors(_pages(spark, [("https://s.com/p", html)])).collect()
    assert [(r["href"], r["anchor_text"]) for r in got] == [
        ("https://t.org/b", "ok")
    ]


def test_rollup_counts_links_and_distinct_sources(spark):
    rows = [
        ("https://s1.com/p", '<a href="https://t.org/a">Home</a><a href="https://t.org/a">Home</a>'),
        ("https://s2.com/p", '<a href="https://t.org/a">Home</a><a href="https://t.org/a">Other</a>'),
    ]
    got = {
        (r["target"], r["anchor_text"]): (r["n_links"], r["n_sources"])
        for r in anchor_text_rollup(extract_anchors(_pages(spark, rows))).collect()
    }
    # s1 links twice with "Home" (counts twice) but is ONE source
    assert got[("https://t.org/a", "Home")] == (3, 2)
    assert got[("https://t.org/a", "Other")] == (1, 1)


def test_top_anchor_breaks_ties_lexicographically(spark):
    rows = [
        ("https://s1.com/p", '<a href="https://t.org/a">beta</a><a href="https://t.org/a">alpha</a>'),
        ("https://s2.com/p", '<a href="https://t.org/a">beta</a><a href="https://t.org/a">alpha</a>'),
    ]
    top = top_anchor_per_target(
        anchor_text_rollup(extract_anchors(_pages(spark, rows)))
    ).collect()
    assert [(r["target"], r["n_links"], r["n_texts"], r["top_anchor"]) for r in top] == [
        ("https://t.org/a", 4, 2, "alpha")  # 2-2 tie → smallest text
    ]


def test_extraction_matches_python_re_model(spark):
    """Battery of awkward bodies vs a pure-Python re.findall model using
    the same pattern + normalization — the library's semantics are the
    regex's semantics, nothing engine-specific."""
    bodies = [
        '<a href="u1">a</a>text<a href="u2">b c</a>',
        '<a href="">empty href</a>',
        '<a href="u3">trail  </a><a href="u3">trail</a>',
        '<A href="u4">upper tag not matched</A>',
        '<a href="u5" rel="no">attrs</a>',
        '<a href="u6">tab\there</a>',
        'no anchors at all',
        '<a href="u7">unclosed',
    ]
    rows = [(f"https://s{i}.com/p", b) for i, b in enumerate(bodies)]
    got = sorted(
        (r["src"], r["pos"], r["href"], r["anchor_text"])
        for r in extract_anchors(_pages(spark, rows)).collect()
    )
    want = []
    for src, body in rows:
        for pos, m in enumerate(re.finditer(ANCHOR_RE, body)):
            want.append(
                (src, pos, m.group(1), re.sub(r"\s+", " ", m.group(2)).strip())
            )
    assert got == sorted(want)


def test_extract_is_shuffle_free(spark):
    df = _pages(spark, [("https://s.com/p", '<a href="u">t</a>')])
    plan = (
        extract_anchors(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
