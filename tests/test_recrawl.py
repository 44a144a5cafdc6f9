from __future__ import annotations

import math

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.recrawl import (
    due_for_refetch,
    recrawl_schedule,
)

DAY = 86_400


def _caps(spark, rows):
    return spark.createDataFrame(
        [(u, F"{''}", t, d) for u, t, d in rows],
        "url_canon string, pad string, epoch long, digest string",
    ).select(
        "url_canon",
        F.timestamp_seconds(F.col("epoch")).alias("warc_ts"),
        "digest",
    )


def test_recrawl_estimator_closed_form(spark):
    t0 = 1_700_000_000
    rows = (
        # u_hot: 5 captures daily, digest flips every time -> X = n = 4
        [("u_hot", t0 + i * DAY, f"h{i}") for i in range(5)]
        # u_static: 5 captures daily, never changes -> X = 0
        + [("u_static", t0 + i * DAY, "same") for i in range(5)]
        # u_half: changes on 2 of 4 intervals
        + [("u_half", t0 + i * DAY, f"v{i // 2}") for i in range(5)]
        # u_once: single capture
        + [("u_once", t0, "x")]
    )
    out = {
        r["url"]: r
        for r in recrawl_schedule(_caps(spark, rows)).collect()
    }

    hot = out["u_hot"]
    lam = -math.log((4 - 4 + 0.5) / (4 + 0.5)) / DAY
    assert hot["n_captures"] == 5 and hot["n_changes"] == 4
    assert abs(hot["lambda_per_day"] - lam * DAY) < 1e-9
    assert abs(hot["refetch_interval_s"] - 1 / lam) < 1e-6
    assert hot["next_fetch_epoch"] == t0 + 4 * DAY + math.floor(1 / lam)

    static = out["u_static"]
    assert static["n_changes"] == 0
    # lambda is exactly 0 -> max interval
    assert static["refetch_interval_s"] == 30 * DAY

    half = out["u_half"]
    lam_h = -math.log((4 - 2 + 0.5) / (4 + 0.5)) / DAY
    assert half["n_changes"] == 2
    assert abs(half["refetch_interval_s"] - 1 / lam_h) < 1e-6

    once = out["u_once"]
    assert once["n_captures"] == 1
    assert once["avg_interval_s"] is None
    assert once["lambda_per_day"] is None
    assert once["refetch_interval_s"] == 30 * DAY
    assert once["next_fetch_epoch"] == t0 + 30 * DAY


def test_recrawl_clamps_and_due_filter(spark):
    t0 = 1_700_000_000
    # changes every capture at 10-minute spacing -> raw interval < 1h,
    # clamped up to the hourly floor
    rows = [("u_fast", t0 + i * 600, f"d{i}") for i in range(10)]
    sched = recrawl_schedule(_caps(spark, rows))
    r = sched.collect()[0]
    assert r["refetch_interval_s"] == 3600.0

    due_now = due_for_refetch(sched, now_epoch=r["next_fetch_epoch"])
    assert due_now.count() == 1
    assert due_now.columns == ["url", "priority"]
    assert (
        due_for_refetch(sched, now_epoch=r["next_fetch_epoch"] - 1).count()
        == 0
    )


def test_recrawl_composes_with_cdx_records(spark):
    """The operator's input contract IS the CDX record schema — build the
    index records from generated pages and schedule over them."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.sources.cdx import cdx_records

    pages = generate_pages(spark, 300, n_hosts=6)
    sched = recrawl_schedule(cdx_records(pages))
    n = sched.count()
    assert n == sched.select("url").distinct().count()
    # single-capture corpus: everything lands on the max interval
    assert (
        sched.filter(F.col("refetch_interval_s") != 30 * DAY).count() == 0
    )


def test_recrawl_loop_closes_into_crawl_engine(spark, tmp_path):
    """CDX capture history -> change-rate schedule -> due set -> a fresh
    CrawlEngine wave fetches exactly the due URLs: the freshness loop the
    reference's cron cadence becomes at web scale."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.frontier.crawl import CrawlEngine
    from hk_housing_datahub_spark.sources.cdx import cdx_records

    pages = generate_pages(spark, 300, n_hosts=6).cache()

    # two crawl WAVES one day apart (wave-aligned capture timestamps,
    # like a real recrawl); ~1/3 of pages "changed" between them
    t0 = 1_700_000_000
    c1 = cdx_records(pages).select(
        "url_canon", F.timestamp_seconds(F.lit(t0)).alias("warc_ts"),
        "digest",
    )
    changed = F.pmod(F.xxhash64("url_canon"), F.lit(3)) == 0
    c2 = c1.select(
        "url_canon",
        F.timestamp_seconds(F.lit(t0 + DAY)).alias("warc_ts"),
        F.when(changed, F.concat(F.col("digest"), F.lit("x")))
        .otherwise(F.col("digest"))
        .alias("digest"),
    )
    sched = recrawl_schedule(c1.union(c2)).cache()

    # changed pages: n=1 interval, X=1 -> 1/lambda ~ 0.91 day; stable
    # pages: X=0 -> the 30-day max interval. Two days after the second
    # wave exactly the changed set is due.
    now = t0 + 3 * DAY
    due = due_for_refetch(sched, now_epoch=now, priority=0).cache()
    expected = {
        r["url_canon"]
        for r in c1.filter(changed).select("url_canon").collect()
    }
    assert {r["url"] for r in due.collect()} == expected
    assert 0 < due.count() < pages.count()

    # the due frame IS a seeds frame: one engine wave refetches exactly it
    # robots=None: the loop under test is freshness, not politeness
    eng = CrawlEngine(
        spark, pages, None, str(tmp_path / "recrawl"),
        wave_ms=10_000_000, max_depth=1,
    )
    res = eng.run(due, max_waves=1)
    got = {
        r["url_canon"]
        for r in res.listings(spark)
        .filter(F.col("wave") == 0)
        .select("url_canon")
        .collect()
    }
    assert got == expected


def test_merge_recrawl_stats_equals_full_recompute(spark):
    """The O(delta) contract: merging a later wave's stats into the
    committed stats equals recomputing over the full history — for every
    (n, X) combination, single-capture URLs, NULL digests, URLs present
    on only one side."""
    from hk_housing_datahub_spark.operators.recrawl import (
        merge_recrawl_stats,
        recrawl_stats,
        schedule_from_stats,
    )

    t0 = 1_700_000_000
    old_rows, new_rows = [], []
    for u in range(30):
        url = f"u{u}"
        # old history: 1..3 captures, digests flip on a per-url cadence
        for j in range(1 + u % 3):
            dg = None if (u % 7 == 0 and j == 0) else f"d{u}#{j // max(1, u % 2 + 1)}"
            old_rows.append((url, t0 + j * DAY, dg))
        # new wave: 0..2 captures strictly after the old history
        for j in range(u % 3):
            dg = f"n{u}#{j}" if u % 4 else old_rows[-1][2]  # some unchanged
            new_rows.append((url, t0 + (10 + j) * DAY, dg))
    new_rows.append(("fresh_url", t0 + 20 * DAY, "z"))  # new-side only

    old_caps, new_caps = _caps(spark, old_rows), _caps(spark, new_rows)
    merged = merge_recrawl_stats(
        recrawl_stats(old_caps), recrawl_stats(new_caps)
    )
    full = recrawl_stats(old_caps.unionByName(new_caps))

    key = lambda df: {
        r["url"]: tuple(r)[1:] for r in df.collect()
    }
    assert key(merged) == key(full)

    # and the schedules derived from both stats frames agree
    s_m = {r["url"]: tuple(r)[1:] for r in schedule_from_stats(merged).collect()}
    s_f = {r["url"]: tuple(r)[1:] for r in schedule_from_stats(full).collect()}
    assert s_m == s_f
