from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.redirects import (
    apply_aliases,
    resolve_redirects,
)


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src_url", "dst_url"])
    return {
        r["url"]: (r["target"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chains_resolve_to_terminal_with_hop_counts(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "d"), ("s", "s")]
    got = _resolve(spark, edges)
    assert got["a"] == ("d", 3, False)
    assert got["b"] == ("d", 2, False)
    assert got["c"] == ("d", 1, False)
    assert got["x"] == ("d", 1, False)
    assert "s" not in got  # self-redirect = terminal, not a source
    assert "d" not in got  # terminals are not rows


def test_long_chain_needs_log_rounds(spark):
    # a 40-hop chain resolves within 6 doubling rounds (2^6 = 64)
    edges = [(f"n{i}", f"n{i+1}") for i in range(40)]
    got = _resolve(spark, edges, max_rounds=6)
    assert got["n0"] == ("n40", 40, False)
    # and does NOT resolve with a 2-round budget (2^2 = 4 < 40)
    got2 = _resolve(spark, edges, max_rounds=2)
    assert got2["n0"][2] is True  # over-budget = flagged, not wrong


def test_cycles_flagged_and_chains_into_cycles(spark):
    edges = [("a", "b"), ("b", "a"), ("x", "a"), ("ok", "t")]
    got = _resolve(spark, edges)
    assert got["a"] == (None, None, True)
    assert got["b"] == (None, None, True)
    assert got["x"] == (None, None, True)  # chain INTO a cycle
    assert got["ok"] == ("t", 1, False)


def test_apply_aliases_rewrites_sources_only(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("l1", "l2"), ("l2", "l1")],
        ["src_url", "dst_url"],
    )
    resolved = resolve_redirects(edges)
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("l1",), ("z",)], ["url_canon"]
    )
    got = sorted(
        r["url_canon"]
        for r in apply_aliases(df, resolved).collect()
    )
    # a,b -> c; cycle member l1 and unknown z keep themselves
    assert got == ["c", "c", "c", "l1", "z"]
