"""Harmonic centrality: exact ball propagation vs analytic values, and
HyperBall ≡ exact while the HLL sketches are in their exact regime."""

import math

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.centrality import (
    harmonic_centrality_exact,
    hyperball,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_exact_on_directed_path(spark):
    # 0 -> 1 -> 2 -> 3: harmonic(k) = sum_{j<k} 1/(k-j)
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r["node"]: (r["ball_size"], r["harmonic"])
        for r in harmonic_centrality_exact(e, max_hops=8).collect()
    }
    assert got[0] == (1, 0.0)
    assert got[1] == (2, 1.0)
    assert got[2][0] == 3 and got[2][1] == pytest.approx(1.0 + 0.5)
    assert got[3][0] == 4 and got[3][1] == pytest.approx(
        1.0 + 0.5 + 1.0 / 3.0
    )


def test_exact_truncation_radius_and_duplicates_and_self_loops(spark):
    # duplicate edges collapse; self-loop adds nothing; radius 1 only
    # counts direct in-neighbors
    e = _edges(
        spark, [(0, 1), (0, 1), (1, 1), (1, 2), (0, 3), (3, 2)]
    )
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality_exact(e, max_hops=1).collect()
    }
    assert got[1] == 1.0  # only node 0 at distance 1
    assert got[2] == 2.0  # 1 and 3 both at distance 1; 0 is at 2 — cut
    full = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality_exact(e, max_hops=8).collect()
    }
    assert full[2] == pytest.approx(2.0 + 0.5)  # 0 enters at distance 2


def test_hyperball_matches_exact_on_small_graphs(spark):
    # a ring + chords: every ball stays far below the HLL coupon
    # threshold, so sketch estimates are EXACT and the two paths must
    # agree bit-for-bit on ball_size and to float tolerance on harmonic
    n = 24
    pairs = [(i, (i + 1) % n) for i in range(n)]
    pairs += [(i, (i * 7 + 3) % n) for i in range(0, n, 3)]
    e = _edges(spark, pairs)
    exact = {
        r["node"]: (r["ball_size"], r["harmonic"])
        for r in harmonic_centrality_exact(e, max_hops=30).collect()
    }
    hb = {
        r["node"]: (r["ball_size"], r["harmonic"])
        for r in hyperball(e, max_hops=30).collect()
    }
    assert set(hb) == set(exact)
    for node, (bs, h) in exact.items():
        assert hb[node][0] == bs, node
        assert hb[node][1] == pytest.approx(h, rel=1e-9), node


def test_hyperball_stabilize_stops_before_cap(spark):
    # diameter 3 — with stabilize, round 4 sees zero growth and stops;
    # the result must equal the uncapped exact answer
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    hb = {
        r["node"]: r["harmonic"]
        for r in hyperball(e, max_hops=100, stabilize=True).collect()
    }
    assert hb[3] == pytest.approx(1.0 + 0.5 + 1.0 / 3.0)


def test_hyperball_estimate_quality_beyond_exact_mode(spark):
    # a star: 3000 leaves -> hub. The hub's ball (3001 ids) is far past
    # the lg_k=12 exact threshold — the estimate must land within the
    # published ~1.6% standard error (5 sigma guard band)
    leaves = spark.range(1, 3001).select(
        F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    got = {
        r["node"]: (r["ball_size"], r["harmonic"])
        for r in hyperball(leaves, max_hops=3).collect()
    }
    bs, h = got[0]
    assert abs(bs - 3001) / 3001 < 0.08
    assert h == pytest.approx(3000.0, rel=0.08)  # all at distance 1
    # leaves receive nothing
    assert got[5] == (1, 0.0)
