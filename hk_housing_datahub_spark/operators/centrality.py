"""Harmonic centrality over the crawl webgraph — HyperBall at scale,
an exact ball-propagation twin for verification.

Why the crawl needs this: harmonic centrality is the metric Common
Crawl actually publishes to rank hosts (their host-level webgraph
releases rank by harmonic centrality, after Boldi & Vigna, "Axioms for
Centrality", 2014), and it is the natural seed-priority signal for a
frontier: a host reachable from everywhere in few hops is worth
crawling before a leaf. The reference has no graph at all (its crawl
is a closed id enumeration — /root/reference/src/crawlers/agency/
estates.py:31-59 pages through a listing index); this module is the
rank-family rung PageRank/HITS/OPIC/TrustRank (operators/linkgraph.py)
don't cover: DISTANCE-based importance,

    harmonic(v) = sum_{u != v, d(u,v) <= R} 1 / d(u,v)

with d(u,v) the directed hop distance from u to v and R a truncation
radius (R=infinity is the textbook definition; every engine that
computes it at web scale truncates or stabilizes — HyperBall stops
when the balls stop growing).

Both implementations run the SAME recurrence on incoming balls,

    ball_0(v)     = {v}
    ball_{t+1}(v) = ball_t(v)  UNION  U_{(u,v) in E} ball_t(u)
    harmonic(v)  += (|ball_{t+1}(v)| - |ball_t(v)|) / (t+1)

and differ only in how a ball is represented:

- :func:`harmonic_centrality_exact` carries the ball as a distinct
  node-id array. State is O(sum |ball|) = O(n^2) worst case — the
  verification path for tests/oracles at small scale, and the driver
  entry (`harmonic_centrality`), whose DuckDB twin is a recursive-CTE
  BFS over (src, dst, hops) with the same radius cap.
- :func:`hyperball` carries the ball as a DataSketches HLL sketch
  (Boldi, Rosa & Vigna, "HyperANF", WWW 2011 / HyperBall 2013): state
  is O(n * 2^lg_k) BYTES regardless of graph density. At lg_k=12 a
  register array is ~4 KiB, so Common Crawl's ~10^8-host graph is
  ~400 GB of distributed sketch state — a routine shuffle payload for
  a 1000-executor cluster, while exact balls would be ~10^16 ids.
  DataSketches HLL is EXACT below its coupon-promotion threshold
  (hundreds of items at lg_k=12), which is what lets the parity test
  pin hyperball == exact on small graphs rather than eyeballing an
  approximation.

Scale shape (10^10 edges, 10^8 nodes): per round ONE edge-state
equi-join shuffled on the node key plus one compact-key union
aggregate — the identical shuffle skeleton as one PageRank iteration
(operators/linkgraph.py::_power_iterate), with sketch-sized payloads.
`hll_union_agg` combines map-side like any partial aggregate, so the
exchange carries one partially-merged sketch per (partition, node),
not one per edge. Per-round `localCheckpoint` cuts the lineage so the
plan stays O(1) in rounds. No driver-side collect anywhere; the only
scalar action is the optional early-stop probe (one count per round,
same pattern as dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.linkgraph import _edge_set

DEFAULT_LG_K = 12


def _init_state(e: DataFrame) -> DataFrame:
    """Node universe of the distinct-edge graph (src OR dst side)."""
    return (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def harmonic_centrality_exact(
    edges: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, ball_size, harmonic) by exact ball propagation.

    Self-loops contribute nothing (a node is in its own ball_0, so it
    never re-enters as "new"). ``ball_size`` is |ball_R(v)| INCLUDING
    v itself — the truncated in-neighborhood size, a useful coverage
    number in its own right. ``harmonic`` is the truncated-at-R sum;
    nodes nobody links to stay at 0.0.

    The t-th round's new members are exactly the nodes at distance t
    (BFS layers), so accumulating (growth / t) IS sum(1/d) — no
    per-pair distance table is ever materialized. The DuckDB oracle
    (`__spark_entry__._harmonic_centrality_sql`) takes the opposite
    representation (a recursive-CTE pair table with min-hop per pair)
    and must agree exactly.
    """
    e = _edge_set(edges, src, dst)
    state = _init_state(e).select(
        "node",
        F.array(F.col("node")).alias("ball"),
        F.lit(0.0).alias("harmonic"),
    )
    for t in range(1, max_hops + 1):
        contrib = (
            e.join(state, e["src"] == state["node"])
            .groupBy(e["dst"].alias("node"))
            .agg(
                F.array_distinct(
                    F.flatten(F.collect_list("ball"))
                ).alias("inball")
            )
        )
        # when(inball NULL) keeps the element type generic (long ids,
        # string hosts) — no empty-array cast to pin a type
        grown = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                F.when(F.col("inball").isNull(), F.col("ball"))
                .otherwise(
                    F.array_distinct(F.concat("ball", "inball"))
                )
                .alias("ball"),
                "harmonic",
                F.size("ball").alias("prev_size"),
            )
            .select(
                "node",
                "ball",
                (
                    F.col("harmonic")
                    + (F.size("ball") - F.col("prev_size"))
                    / F.lit(float(t))
                ).alias("harmonic"),
            )
        )
        state = grown.localCheckpoint(eager=True)
    return state.select(
        "node", F.size("ball").alias("ball_size"), "harmonic"
    )


def hyperball(
    edges: DataFrame,
    max_hops: int = 8,
    lg_k: int = DEFAULT_LG_K,
    src: str = "src",
    dst: str = "dst",
    stabilize: bool = True,
) -> DataFrame:
    """(node, ball_size, harmonic) by HLL-sketch ball propagation —
    the 100-TB path. Same recurrence as the exact twin; a ball is a
    ~2^lg_k-byte sketch, growth is measured on `hll_sketch_estimate`
    (exact while the sketch is below its coupon threshold, ~1.6%
    standard error beyond at the default lg_k=12). ``ball_size`` is
    rounded to a long for parity with the exact twin in the regime
    where the sketches are still exact.

    Estimates of a union are not strictly monotone once sketches leave
    exact mode, so per-round growth is clamped at 0 — harmonic never
    decreases, matching the exact semantics.

    ``stabilize=True`` stops early once NO ball grew this round (one
    count action per round — the balls have reached their closure, so
    further rounds are no-ops; this is HyperBall's own termination
    rule and makes ``max_hops`` a cap rather than a cost).
    """
    e = _edge_set(edges, src, dst)
    state = (
        _init_state(e)
        .groupBy("node")
        .agg(F.hll_sketch_agg("node", lg_k).alias("sk"))
        .select("node", "sk", F.lit(1.0).alias("est"), F.lit(0.0).alias("harmonic"))
    )
    for t in range(1, max_hops + 1):
        contrib = (
            e.join(state, e["src"] == state["node"])
            .groupBy(e["dst"].alias("node"))
            .agg(F.hll_union_agg("sk").alias("insk"))
        )
        new_sk = F.when(
            F.col("insk").isNull(), F.col("sk")
        ).otherwise(F.hll_union("sk", "insk"))
        grown = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                new_sk.alias("sk"),
                "est",
                "harmonic",
            )
            .select(
                "node",
                "sk",
                F.hll_sketch_estimate("sk").alias("est"),
                (
                    F.col("harmonic")
                    + F.greatest(
                        F.hll_sketch_estimate("sk") - F.col("est"),
                        F.lit(0.0),
                    )
                    / F.lit(float(t))
                ).alias("harmonic"),
                (F.hll_sketch_estimate("sk") > F.col("est") + 0.5).alias(
                    "grew"
                ),
            )
        )
        state = grown.localCheckpoint(eager=True)
        if stabilize:
            if state.filter("grew").limit(1).count() == 0:
                break
    return state.select(
        "node",
        F.round("est").cast("long").alias("ball_size"),
        "harmonic",
    )
