from __future__ import annotations

import datetime

import pytest

from hk_housing_datahub_spark.extract.dates import extract_publish_date


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode(), t) for u, h, t in rows],
        ["url_canon", "html", "text"],
    )


def test_channel_chain_precedence(spark):
    pages = _pages(
        spark,
        [
            # jsonld beats meta beats url beats text
            (
                "http://a.hk/2020/05/07/x",
                '<script type="application/ld+json">'
                '{"datePublished":"2021-03-04"}</script>'
                '<meta property="article:published_time" '
                'content="2022-06-07T08:00:00Z"/>',
                "posted 2023-09-10",
            ),
            (
                "http://b.hk/2020/05/07/x",
                '<meta property="article:published_time" '
                'content="2022-06-07T08:00:00Z"/>',
                "posted 2023-09-10",
            ),
            ("http://c.hk/2020/05/07/x", "<p>hi</p>", "posted 2023-09-10"),
            ("http://d.hk/page", "<p>hi</p>", "posted 2023-09-10"),
            ("http://e.hk/page", "<p>hi</p>", "no date here"),
        ],
    )
    out = {r.url: r for r in extract_publish_date(pages).collect()}
    assert out["http://a.hk/2020/05/07/x"].publish_date == datetime.date(2021, 3, 4)
    assert out["http://a.hk/2020/05/07/x"].date_source == "jsonld"
    assert out["http://b.hk/2020/05/07/x"].publish_date == datetime.date(2022, 6, 7)
    assert out["http://b.hk/2020/05/07/x"].date_source == "meta"
    assert out["http://c.hk/2020/05/07/x"].publish_date == datetime.date(2020, 5, 7)
    assert out["http://c.hk/2020/05/07/x"].date_source == "url"
    assert out["http://d.hk/page"].publish_date == datetime.date(2023, 9, 10)
    assert out["http://d.hk/page"].date_source == "text"
    assert out["http://e.hk/page"].publish_date is None
    assert out["http://e.hk/page"].date_source is None


def test_invalid_candidates_fall_through(spark):
    pages = _pages(
        spark,
        [
            # impossible jsonld date → meta wins
            (
                "http://a.hk/x",
                '<script type="application/ld+json">'
                '{"datePublished":"2021-02-30"}</script>'
                '<meta property="article:published_time" '
                'content="2021-02-28"/>',
                "",
            ),
            # month-13 url path → text wins
            ("http://b.hk/2020/13/01/x", "<p></p>", "seen 2019-12-31"),
            # year 1234 is not a date path (sanity bound)
            ("http://c.hk/1234/11/05/x", "<p></p>", ""),
        ],
    )
    out = {r.url: r for r in extract_publish_date(pages).collect()}
    assert out["http://a.hk/x"].publish_date == datetime.date(2021, 2, 28)
    assert out["http://a.hk/x"].date_source == "meta"
    assert out["http://b.hk/2020/13/01/x"].publish_date == datetime.date(2019, 12, 31)
    assert out["http://b.hk/2020/13/01/x"].date_source == "text"
    assert out["http://c.hk/1234/11/05/x"].publish_date is None


def test_url_day_defaults_and_text_opt_out(spark):
    pages = _pages(
        spark,
        [
            ("http://a.hk/2018/09/archive/", "<p></p>", "fallback 2011-01-02"),
        ],
    )
    out = extract_publish_date(pages).collect()[0]
    assert out.publish_date == datetime.date(2018, 9, 1)
    assert out.date_source == "url"
    # text channel off: a text-only page yields NULL
    textless = _pages(spark, [("http://b.hk/p", "<p></p>", "x 2011-01-02")])
    row = extract_publish_date(textless, text_col=None).collect()[0]
    assert row.publish_date is None


def test_plan_is_map_only_jvm(spark):
    pages = _pages(spark, [("http://a.hk/p", "<p></p>", "")])
    plan = (
        extract_publish_date(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
