from __future__ import annotations

import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.focus import (
    lexicon_relevance,
    shark_outlink_scores,
)

TERMS = ["kowloon flat", "nathan road"]


def test_lexicon_relevance_fractions(spark):
    df = spark.createDataFrame(
        [
            ("Cheap KOWLOON FLAT on Nathan Road",),
            ("kowloon flat for rent",),
            ("football scores tonight",),
            (None,),
        ],
        "t string",
    )
    out = [
        r["rel"]
        for r in df.select(
            lexicon_relevance(F.col("t"), TERMS).alias("rel")
        ).collect()
    ]
    assert out == [1.0, 0.5, 0.0, 0.0]


def _pages(spark):
    # parent A is ON topic (its text matches both terms), parent B off
    rows = [
        (
            "https://a.com/",
            '<a href="https://t.com/x">kowloon flat 3br</a>'
            '<a href="https://t.com/y">football news</a>',
            "listings for kowloon flat on nathan road",
        ),
        (
            "https://b.com/",
            '<a href="https://t.com/x">match report</a>',
            "sports digest",
        ),
    ]
    return spark.createDataFrame(
        rows, "url_canon string, html string, text string"
    ).withColumn("html", F.encode("html", "UTF-8"))


def test_shark_scores_match_pure_python_model(spark):
    beta, gamma, delta = 0.8, 0.5, 0.5
    out = {
        r["url"]: r
        for r in shark_outlink_scores(
            _pages(spark), TERMS, beta=beta, gamma=gamma, delta=delta
        ).collect()
    }

    def rel(s):
        s = s.lower()
        return sum(t in s for t in TERMS) / len(TERMS)

    def pot(anchor, parent):
        return gamma * delta * rel(parent) + (1 - gamma) * (
            beta * rel(anchor) + (1 - beta) * rel(parent)
        )

    px = max(
        pot("kowloon flat 3br", "listings for kowloon flat on nathan road"),
        pot("match report", "sports digest"),
    )
    py = pot("football news", "listings for kowloon flat on nathan road")
    assert abs(out["https://t.com/x"]["potential"] - px) < 1e-12
    assert abs(out["https://t.com/y"]["potential"] - py) < 1e-12
    assert out["https://t.com/x"]["n_parents"] == 2
    assert out["https://t.com/y"]["n_parents"] == 1
    assert out["https://t.com/x"]["best_anchor_rel"] == 0.5
    assert out["https://t.com/x"]["potential"] > out[
        "https://t.com/y"
    ]["potential"]


def test_shark_scores_plan_one_aggregate_no_join(spark):
    plan = (
        shark_outlink_scores(_pages(spark), TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


def _focus_corpus(spark):
    """One hub page on one host fans out to 6 on-topic and 6 off-topic
    urls (same host → they compete for the politeness budget). Anchors
    discriminate; page texts are neutral. Off-topic urls sort BEFORE
    on-topic ones lexicographically ('off' < 'on'), so an unfocused
    crawl provably schedules the off-topic ones first."""
    anchors = "".join(
        f'<a href="https://hub.example.com/on{i}">kowloon flat {i}</a>'
        f'<a href="https://hub.example.com/off{i}">football news {i}</a>'
        for i in range(6)
    )
    rows = [
        (
            "https://hub.example.com/",
            f'<div id="content">index</div>{anchors}',
            "index",
            "en",
            1_700_000_000,
        )
    ] + [
        (
            f"https://hub.example.com/{kind}{i}",
            f'<div id="content">{kind} page {i}</div>',
            f"{kind} page {i}",
            "en",
            1_700_000_000,
        )
        for kind in ("on", "off")
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "url string, html string, text string, lang string, epoch long"
    ).select(
        "url",
        F.timestamp_seconds("epoch").alias("warc_ts"),
        F.encode("html", "UTF-8").alias("html"),
        "text",
        "lang",
    )


def _scheduled(spark, d, wave):
    return sorted(
        r["url_canon"]
        for r in spark.read.parquet(
            os.path.join(d, "schedule", f"wave={wave}")
        ).collect()
    )


def test_crawl_engine_focus_prioritizes_on_topic_urls(spark, tmp_path):
    """focus_terms: wave 1's politeness budget (3 urls/host) must go to
    the on-topic outlinks; the unfocused control provably picks
    off-topic ones first (lexicographic tie-break)."""
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _focus_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [("https://hub.example.com/", 1)], "url string, priority int"
    )

    d1 = str(tmp_path / "focused")
    eng = CrawlEngine(
        spark, pages, None, d1, wave_ms=300, max_depth=2,
        focus_terms=["kowloon flat"],
    )
    eng.run(seeds, max_waves=2)
    focused = _scheduled(spark, d1, 1)
    assert len(focused) == 3
    assert all("/on" in u for u in focused), focused

    d2 = str(tmp_path / "control")
    CrawlEngine(
        spark, pages, None, d2, wave_ms=300, max_depth=2
    ).run(seeds, max_waves=2)
    control = _scheduled(spark, d2, 1)
    assert len(control) == 3
    assert all("/off" in u for u in control), control


def test_crawl_engine_focus_resume_reaches_identical_schedule(
    spark, tmp_path
):
    """Focus state (focus/wave=N snapshots) is resume-safe: a crawl
    interrupted after wave 1 and resumed must schedule the identical
    wave-2 set as an uninterrupted run."""
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _focus_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [("https://hub.example.com/", 1)], "url string, priority int"
    )
    kw = dict(wave_ms=300, max_depth=2, focus_terms=["kowloon flat"])

    d1 = str(tmp_path / "uninterrupted")
    CrawlEngine(spark, pages, None, d1, **kw).run(seeds, max_waves=2)

    d2 = str(tmp_path / "resumed")
    CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=1)
    CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=1)

    assert _scheduled(spark, d1, 1) == _scheduled(spark, d2, 1)


def test_focus_rejects_rank_composition_and_bad_params(spark, tmp_path):
    import pytest

    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _focus_corpus(spark)
    with pytest.raises(TypeError, match="rewrite frontier"):
        CrawlEngine(
            spark, pages, None, str(tmp_path / "x"),
            focus_terms=["a"], rank_priorities=True,
        )
    with pytest.raises(TypeError, match="focus_params"):
        CrawlEngine(
            spark, pages, None, str(tmp_path / "y"),
            focus_terms=["a"], focus_params={"alpha": 1.0},
        )
