"""Redirect-chain resolution — canonical targets over the alias graph.

Crawls accumulate HTTP redirects (301/302/canonical-link aliases) as
(src_url → dst_url) edges; dedup, the seen-set, and the link graph all
want every URL resolved to its TERMINAL target so aliases collapse into
one node. The graph is functional (≤1 outgoing edge per src — last
observed redirect wins upstream); chains can be long and can contain
cycles (A→B→A), which must be detected, not looped on.

``resolve_redirects`` runs pointer-doubling (path halving): each round
joins the current target mapping with itself, so a chain of length L
resolves in ⌈log2 L⌉ rounds — 2^rounds coverage for a linear cost, the
same trick as `dedup.connected_components`. Each round is one
compact-key self-join; lineage is cut per round with an eager
localCheckpoint. Cycle members never reach a terminal node and are
flagged ``is_cycle`` when the hop budget exhausts with unresolved rows.

Output per distinct src: (url, target, hops, is_cycle) — ``target`` is
the terminal URL (NULL for cycle members), ``hops`` the original chain
length walked (capped at 2^max_rounds).

SQL-expressible — the oracle twin is a recursive CTE walking one hop a
round with a visited guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    max_rounds: int = 6,
) -> DataFrame:
    """Resolve every src to its terminal target via pointer doubling.

    ``max_rounds`` bounds chains at 2^max_rounds hops (default 64 —
    real redirect chains are <10; browsers give up at ~20). Rows still
    unresolved after the budget are cycle members (or over-budget
    chains) and come back with target NULL / is_cycle true.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("t"))
        .filter(F.col("u").isNotNull() & F.col("t").isNotNull())
        .filter(F.col("u") != F.col("t"))  # self-redirect = terminal
        .dropDuplicates(["u"])  # functional graph: one edge per src
        .localCheckpoint(eager=True)
    )
    # state per src: current pointer t, hops walked, done?
    # done = pointer has no outgoing edge (terminal reached)
    cur = e.select("u", "t", F.lit(1).cast("long").alias("hops"))
    targets = e.select(F.col("u").alias("t_u"), F.col("t").alias("t_t"))
    for _ in range(max_rounds):
        # pointer doubling: follow the CURRENT MAPPING of my pointer —
        # which itself doubles every round — not a single edge hop
        nxt = (
            cur.alias("a")
            .join(
                cur.select(
                    F.col("u").alias("b_u"),
                    F.col("t").alias("b_t"),
                    F.col("hops").alias("b_hops"),
                ),
                F.col("a.t") == F.col("b_u"),
                "left",
            )
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("b_t"), F.col("a.t")).alias("t"),
                (
                    F.col("a.hops")
                    + F.coalesce(F.col("b_hops"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        # converged when no pointer moved this round
        if nxt.join(
            cur.select("u", F.col("t").alias("old_t")), "u"
        ).filter(F.col("t") != F.col("old_t")).isEmpty():
            cur = nxt
            break
        cur = nxt
    # a src is resolved iff its pointer is NOT itself a redirect source
    out = (
        cur.join(
            targets.select(F.col("t_u").alias("t"), F.lit(True).alias(
                "_pending"
            )).dropDuplicates(["t"]),
            "t",
            "left",
        )
        .select(
            F.col("u").alias("url"),
            F.when(F.col("_pending").isNull(), F.col("t")).alias(
                "target"
            ),
            # hops for a cycle member is an artifact of the doubling
            # schedule, not a chain length — NULL it
            F.when(F.col("_pending").isNull(), F.col("hops")).alias(
                "hops"
            ),
            F.col("_pending").isNotNull().alias("is_cycle"),
        )
    )
    return out


def apply_aliases(
    df: DataFrame,
    resolved: DataFrame,
    url_col: str = "url_canon",
) -> DataFrame:
    """Rewrite ``url_col`` through the resolved alias map: redirect
    sources take their terminal target, everything else (including
    cycle members) keeps its own URL. One left join on the url."""
    alias_map = resolved.filter(
        ~F.col("is_cycle") & F.col("target").isNotNull()
    ).select(F.col("url").alias(url_col), "target")
    return (
        df.join(alias_map, url_col, "left")
        .withColumn(url_col, F.coalesce("target", F.col(url_col)))
        .drop("target")
    )
