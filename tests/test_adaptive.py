"""Adaptive per-host politeness (frontier/adaptive.py).

Heritrix delayFactor semantics: per-host delay = clamp(factor x mean
observed latency); composes with the robots Crawl-delay directive by
taking whichever asks for MORE politeness."""

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.frontier.adaptive import (
    adaptive_crawl_delay,
    merge_crawl_delays,
)
from hk_housing_datahub_spark.frontier.scheduler import (
    DEFAULT_CRAWL_DELAY_MS,
    schedule_wave,
)


@pytest.fixture(scope="module")
def fetch_log(spark):
    # 300 fetches over 10 hosts; integer latencies, deterministic
    return spark.range(300).select(
        F.concat(F.lit("h"), F.pmod("id", F.lit(10)), F.lit(".example.com")).alias(
            "host"
        ),
        (F.pmod(F.col("id") * 7919, F.lit(1900)) + 20).alias("latency_ms"),
    )


def test_delay_is_factor_times_mean_clamped(spark, fetch_log):
    out = adaptive_crawl_delay(fetch_log, delay_factor=2.0, max_delay_ms=5000)
    rows = {r["host"]: r for r in out.collect()}
    assert len(rows) == 10
    # replay one host exactly
    import math

    lats = [(i * 7919) % 1900 + 20 for i in range(300) if i % 10 == 3]
    want = math.floor(
        min(5000.0, max(float(DEFAULT_CRAWL_DELAY_MS), 2.0 * sum(lats) / len(lats)))
    )
    got = rows["h3.example.com"]
    assert got["n_fetches"] == len(lats)
    assert got["crawl_delay_ms"] == want


def test_clamps_both_ends(spark):
    fast = spark.createDataFrame(
        [("fast.example.com", 1)] * 5 + [("slow.example.com", 99_999)] * 5,
        "host string, latency_ms int",
    )
    rows = {
        r["host"]: r["crawl_delay_ms"]
        for r in adaptive_crawl_delay(fast, max_delay_ms=5000).collect()
    }
    assert rows["fast.example.com"] == DEFAULT_CRAWL_DELAY_MS  # floor
    assert rows["slow.example.com"] == 5000  # ceiling


def test_merge_takes_the_more_polite_delay(spark, fetch_log):
    adaptive = adaptive_crawl_delay(fetch_log, delay_factor=2.0)
    robots = spark.createDataFrame(
        [
            # robots stricter than adaptive
            ("h0.example.com", None, None, 60_000),
            # robots looser than adaptive -> adaptive wins
            ("h1.example.com", None, None, 1),
            # robots-only host (never fetched) keeps its directive
            ("onlyrobots.example.com", None, None, 700),
        ],
        "host string, allow_paths array<string>, disallow_paths array<string>,"
        " crawl_delay_ms int",
    )
    merged = {r["host"]: r["crawl_delay_ms"] for r in merge_crawl_delays(robots, adaptive).collect()}
    adapt = {r["host"]: r["crawl_delay_ms"] for r in adaptive.collect()}
    assert merged["h0.example.com"] == 60_000
    assert merged["h1.example.com"] == adapt["h1.example.com"]
    assert merged["onlyrobots.example.com"] == 700
    # adaptive-only hosts surface with their adaptive delay
    assert merged["h2.example.com"] == adapt["h2.example.com"]
    assert len(merged) == 11


def test_merge_without_robots_is_adaptive_dim(spark, fetch_log):
    adaptive = adaptive_crawl_delay(fetch_log)
    out = merge_crawl_delays(None, adaptive)
    assert set(out.columns) == {"host", "crawl_delay_ms"}
    assert out.count() == 10


def test_merged_dim_drives_schedule_wave(spark, fetch_log):
    """The merged dimension is directly consumable by schedule_wave:
    a host slowed to 5000ms gets floor(10000/5000)=2 slots while a
    100ms host gets 100 slots, out of 120 candidate urls each."""
    adaptive = adaptive_crawl_delay(
        spark.createDataFrame(
            [("slow.example.com", 99_999)] * 4, "host string, latency_ms int"
        ),
        max_delay_ms=5000,
    )
    robots = merge_crawl_delays(None, adaptive).select(
        "host",
        F.lit(None).cast("array<string>").alias("allow_paths"),
        F.lit(None).cast("array<string>").alias("disallow_paths"),
        "crawl_delay_ms",
    )
    frontier = spark.range(240).select(
        F.concat(
            F.lit("https://"),
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit("slow")).otherwise(
                F.lit("fast")
            ),
            F.lit(".example.com/p/"),
            F.col("id"),
        ).alias("url_canon"),
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit("slow.example.com"))
        .otherwise(F.lit("fast.example.com"))
        .alias("host"),
        F.lit(1).alias("priority"),
        F.to_timestamp(F.lit("2024-01-01")).alias("discovered_ts"),
    )
    out = schedule_wave(frontier, robots, wave_ms=10_000)
    per_host = {
        r["host"]: r["n"]
        for r in out.filter("scheduled")
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_host["slow.example.com"] == 2
    assert per_host["fast.example.com"] == 100
