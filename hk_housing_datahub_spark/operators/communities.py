"""Community detection on the host webgraph — synchronous,
deterministic label propagation (LPA, Raghavan et al. 2007).

Why the crawl wants it: mirror families, link farms and template
networks show up as densely intra-linked host clusters long before any
pairwise content comparison can find them (operators/mirrors.py works
pairwise on shared digests; this is the GRAPH-side complement). A
community id per host feeds the same consumers as the trap/mirror
flags: per-community crawl budgets, one-representative-per-community
sampling, and spam-cluster suppression seeds for trustrank
(operators/linkgraph.py).

Classic LPA is famously nondeterministic (random visit order, random
tie-breaks). This implementation pins BOTH sources of randomness so
the operator is reproducible run-to-run and engine-to-engine — which
is what makes it oracle-able:

- SYNCHRONOUS rounds: every node updates from the previous round's
  labels simultaneously (no visit order exists);
- deterministic tie-break: the new label is the neighbor label with
  the highest multiplicity, ties to the SMALLEST label;
- a FIXED round count instead of "until stable": synchronous LPA can
  2-cycle on bipartite structures (the textbook caveat), so "stable"
  is not guaranteed — a fixed budget is the determinism contract, and
  the caller reads `n_changed` from the result to see whether the
  labeling had already converged.

Node ids are LONGS (the min-struct tie-break needs a negatable count
companion); key string hosts through :func:`hash_nodes` first
(xxhash64 — deterministic everywhere; a 64-bit collision at web scale
merely pre-merges two nodes' labels, bias ~n^2/2^64).

Scale shape (10^8 hosts, 10^10 edges): per round one edge-label join
shuffled on the node key + one (node, label) compact-key count + one
min-struct agg per node — the PageRank shuffle skeleton with a count
payload. Per-round localCheckpoint cuts lineage; state is one long per
node. Rounds are O(1) (LPA converges in a handful of sweeps by
design), so total cost ~ a few PageRank iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.linkgraph import _edge_set


def hash_nodes(df: DataFrame, key: str, out: str = "node_id") -> DataFrame:
    """Append a deterministic long id for a string node key."""
    return df.withColumn(out, F.xxhash64(F.col(key)))


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, label, n_changed) after ``rounds`` synchronous sweeps.

    The graph is treated as UNDIRECTED (links symmetrized), duplicate
    edges collapse first (multiplicity is not a vote — the DISTINCT
    neighbor multiset is what votes, matching the published
    algorithm), self-loops drop (a node's own label is only the
    no-neighbors fallback). ``label`` starts as the node id, so a
    final label is always some member's id — communities are named by
    their minimum "winning" member. ``n_changed`` is how many nodes
    changed label in the LAST round (0 ⇒ converged within budget)."""
    e = _edge_set(edges, src, dst).filter(F.col("src") != F.col("dst"))
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        und.select(F.col("src").alias("node")).distinct()
        .localCheckpoint(eager=True)
    )
    state = nodes.select(
        "node", F.col("node").alias("label"), F.lit(0).alias("n_changed")
    )
    for _ in range(rounds):
        votes = (
            und.join(state, und["dst"] == state["node"])
            .groupBy(und["src"].alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = votes.groupBy("node").agg(
            F.min(
                F.struct((-F.col("cnt")).alias("neg"), F.col("label"))
            )
            .getField("label")
            .alias("new_label")
        )
        merged = state.join(winner, "node", "left").select(
            "node",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label"))
            .cast("int")
            .alias("changed"),
        )
        state = merged.select(
            "node", "label", F.col("changed").alias("n_changed")
        ).localCheckpoint(eager=True)
    total_changed = state.agg(F.sum("n_changed")).collect()[0][0] or 0
    return state.select(
        "node", "label", F.lit(int(total_changed)).alias("n_changed")
    )


def community_sizes(labels: DataFrame) -> DataFrame:
    """(label, n_members) — one compact-key count over the labeling."""
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members")
    )
