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


def _vcaps(spark, rows):
    """rows: (url, epoch, digest, etag, last_modified)."""
    return spark.createDataFrame(
        rows,
        "url_canon string, epoch long, digest string, "
        "etag string, last_modified string",
    ).select(
        "url_canon",
        F.timestamp_seconds(F.col("epoch")).alias("warc_ts"),
        "digest", "etag", "last_modified",
    )


def test_latest_validators_picks_newest_capture(spark):
    from hk_housing_datahub_spark.operators.recrawl import latest_validators

    t0 = 1_700_000_000
    caps = _vcaps(spark, [
        ("u1", t0, "d0", 'W/"a"', None),
        ("u1", t0 + DAY, "d1", 'W/"b"', "Tue, 01 Aug 2023 00:00:00 GMT"),
        ("u2", t0, "d2", None, None),
    ])
    out = {r["url"]: r for r in latest_validators(caps).collect()}
    assert out["u1"]["last_digest"] == "d1"
    assert out["u1"]["etag"] == 'W/"b"'
    assert out["u1"]["last_modified"] == "Tue, 01 Aug 2023 00:00:00 GMT"
    assert out["u1"]["last_ts"] == t0 + DAY
    assert out["u2"]["etag"] is None


def test_fetch_plans_modes_and_echoed_validators(spark):
    from hk_housing_datahub_spark.operators.recrawl import (
        fetch_plans,
        latest_validators,
    )

    t0 = 1_700_000_000
    caps = _vcaps(spark, [
        ("u_etag", t0, "d1", '"e1"', None),
        ("u_lm", t0, "d2", None, "Mon, 31 Jul 2023 12:00:00 GMT"),
        ("u_bare", t0, "d3", None, None),
    ])
    due = spark.createDataFrame(
        [("u_etag", 1), ("u_lm", 2), ("u_bare", 3), ("u_new", 4)],
        "url string, priority int",
    )
    out = {r["url"]: r for r in
           fetch_plans(due, latest_validators(caps)).collect()}
    assert out["u_etag"]["mode"] == "conditional"
    assert out["u_etag"]["if_none_match"] == '"e1"'
    assert out["u_lm"]["mode"] == "conditional"
    assert out["u_lm"]["if_modified_since"] == (
        "Mon, 31 Jul 2023 12:00:00 GMT"
    )
    # no validator and never-crawled both take the full-fetch path
    assert out["u_bare"]["mode"] == "full"
    assert out["u_bare"]["prior_digest"] == "d3"
    assert out["u_new"]["mode"] == "full"
    assert out["u_new"]["if_none_match"] is None
    assert out["u_new"]["priority"] == 4  # due columns pass through


def test_apply_fetch_results_dispositions(spark):
    from hk_housing_datahub_spark.operators.recrawl import (
        apply_fetch_results,
        latest_validators,
    )

    t0 = 1_700_000_000
    body_same = b"same-bytes"
    caps = _vcaps(spark, [
        ("u_304", t0, "dprior", '"e"', None),
        ("u_same", t0, None, None, None),  # placeholder, fixed below
        ("u_chg", t0, "dold", None, "lm0"),
        ("u_err", t0, "dkeep", '"k"', None),
    ])
    # u_same's prior digest must equal md5(body_same): recompute via Spark
    import hashlib
    caps = caps.withColumn(
        "digest",
        F.when(F.col("url_canon") == "u_same",
               F.lit(hashlib.md5(body_same).hexdigest()))
        .otherwise(F.col("digest")),
    )
    resp = spark.createDataFrame(
        [
            ("u_304", t0 + DAY, 304, None, None, None),
            ("u_same", t0 + DAY, 200, bytearray(body_same), '"n"', None),
            ("u_chg", t0 + DAY, 200, bytearray(b"new-bytes"), None, "lm1"),
            ("u_err", t0 + DAY, 503, None, None, None),
            ("u_new", t0 + DAY, 200, bytearray(b"first"), '"f"', None),
            ("u_bad304", t0 + DAY, 304, None, None, None),  # no prior
        ],
        "url string, epoch long, status int, payload binary, "
        "etag string, last_modified string",
    ).select(
        "url", F.timestamp_seconds("epoch").alias("fetch_ts"),
        "status", "payload", "etag", "last_modified",
    )
    out = {r["url"]: r for r in apply_fetch_results(
        latest_validators(caps), resp
    ).collect()}
    r = out["u_304"]
    assert (r["disposition"], r["is_capture"], r["store_body"]) == (
        "not_modified", True, False
    )
    assert r["digest"] == "dprior" and r["etag"] == '"e"'
    assert r["changed"] is False
    r = out["u_same"]
    assert r["disposition"] == "unchanged_body" and r["changed"] is False
    assert r["store_body"] is True and r["etag"] == '"n"'
    r = out["u_chg"]
    assert r["disposition"] == "modified" and r["changed"] is True
    assert r["last_modified"] == "lm1"
    r = out["u_err"]
    assert (r["disposition"], r["is_capture"], r["digest"]) == (
        "error", False, None
    )
    r = out["u_new"]
    assert r["disposition"] == "new" and r["changed"] is None
    assert out["u_bad304"]["disposition"] == "error"


def test_revalidation_feeds_recrawl_stats_as_unchanged_observation(spark):
    """The closed loop: a 304 capture row extends the URL's capture
    history with an unchanged observation — recrawl_stats must count
    the interval (n_captures+1) with no change (n_changes+0)."""
    from hk_housing_datahub_spark.operators.recrawl import (
        apply_fetch_results,
        latest_validators,
        recrawl_stats,
    )

    t0 = 1_700_000_000
    caps = _vcaps(spark, [
        ("u", t0, "d0", '"e"', None),
        ("u", t0 + DAY, "d1", '"e2"', None),
    ])
    resp = spark.createDataFrame(
        [("u", t0 + 2 * DAY, 304, None, None, None)],
        "url string, epoch long, status int, payload binary, "
        "etag string, last_modified string",
    ).select(
        "url", F.timestamp_seconds("epoch").alias("fetch_ts"),
        "status", "payload", "etag", "last_modified",
    )
    folded = apply_fetch_results(latest_validators(caps), resp)
    new_caps = folded.filter(F.col("is_capture")).select(
        F.col("url").alias("url_canon"),
        F.timestamp_seconds("epoch").alias("warc_ts"),
        "digest",
    )
    all_caps = caps.select("url_canon", "warc_ts", "digest").unionByName(
        new_caps
    )
    s = recrawl_stats(all_caps).collect()[0]
    assert s["n_captures"] == 3
    assert s["n_changes"] == 1  # d0->d1 changed, d1->d1(304) did not
    assert s["last_ts"] == t0 + 2 * DAY


def test_fetch_plan_apply_single_join_each(spark):
    """Plan shape: fetch_plans and apply_fetch_results each add exactly
    one join over the latest-validators aggregate — no windows, no
    extra exchanges beyond (agg + join)."""
    from hk_housing_datahub_spark.operators.recrawl import (
        apply_fetch_results,
        fetch_plans,
        latest_validators,
    )

    caps = _vcaps(spark, [("u", 1_700_000_000, "d", None, None)])
    due = spark.createDataFrame([("u", 1)], "url string, priority int")
    lat = latest_validators(caps)
    plan = (
        fetch_plans(due, lat)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # 1 agg exchange (+partials) and join-side exchanges only; the easy
    # invariant: no Window and at most one SortMergeJoin/BroadcastHashJoin
    assert "Window" not in plan
    assert plan.count("Join") <= 2, plan
