"""Host → fetcher-shard assignment (rendezvous hashing, UbiCrawler-style).

A distributed fetcher fleet must agree, with NO coordination, on which
fetcher owns which host: politeness is per-host state (connection reuse,
last-request timestamp, robots cache), so ALL of a host's URLs must land
on ONE shard, and the mapping must barely move when the fleet grows or
shrinks (UbiCrawler's central design goal — Boldi et al., "UbiCrawler: a
scalable fully distributed web crawler", Softw. Pract. Exper. 2004, §3:
consistent hashing of hosts to agents; Nutch/Heritrix partition the
frontier the same way). The reference never meets this — one process,
one portal (/root/reference/src/orchestrators/agency.py) — but a
10^10-URL frontier on a 1000-executor cluster meets it immediately.

Rendezvous (highest-random-weight) hashing beats a ring here: shard s
owns host h iff ``md5(h:s:seed)`` is the maximum over all shards. Remove
a shard and ONLY its hosts move (they re-argmax among survivors); add a
shard and only the hosts whose new weight wins move (~1/(n+1) of them).
No ring state, no virtual-node tables — a pure function of (host,
n_shards, seed), so every executor computes it locally: zero shuffle,
zero driver state, and the SAME assignment in any engine that has md5
(the DuckDB oracle replays it byte-for-byte).

Scale shape: the weight array is ``n_shards`` literal md5 expressions in
one whole-stage-codegen projection — no explode, no join, no UDF. Fleets
are O(10^2-10^3) fetchers; the projection stays a few thousand codegen
ops. For n_shards beyond ~4096 switch to an explode+argmax agg (same
semantics, one compact-key shuffle keyed on host).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rendezvous_shard(
    host: Column, n_shards: int, seed: int = 0
) -> Column:
    """Highest-random-weight shard id (int) for a host Column.

    Weight of shard ``s`` = ``md5(host || ':' || s || ':' || seed)``;
    the winning shard is the lexicographic max weight (hex strings of
    equal length, so lexicographic = numeric; md5 makes ties
    impossible for distinct (host, s) inputs). ``array_max`` over
    ``struct(weight, shard)`` is the argmax — struct ordering compares
    weight first.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cands = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(host, F.lit(f":{s}:{seed}"))
                ).alias("w"),
                F.lit(s).alias("shard"),
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(cands)["shard"].alias("fetch_shard")


def assign_fetch_shards(
    df: DataFrame,
    n_shards: int,
    host_col: str = "host",
    seed: int = 0,
) -> DataFrame:
    """Attach ``fetch_shard`` to every row — a map-only projection."""
    return df.withColumn(
        "fetch_shard", rendezvous_shard(F.col(host_col), n_shards, seed)
    )


def partition_by_shard(
    scheduled: DataFrame,
    n_shards: int,
    host_col: str = "host",
    seed: int = 0,
) -> DataFrame:
    """Lay a scheduled wave out the way a fetcher fleet consumes it:
    one partition per shard (all of a host's URLs in it), rows in the
    scheduler's issue order ``(host, host_rank)`` so a fetcher task
    streams its hosts' queues in politeness order.

    This is the ONE shuffle sharding costs — hash-partition on the
    tiny int ``fetch_shard`` — and it replaces the arbitrary layout the
    fetch join would otherwise hand each executor. Shard skew mirrors
    host skew only if one HOST dominates the wave; the per-host wave
    budget (scheduler.schedule_wave) already bounds that, so shard
    sizes are ~uniform by construction.
    """
    out = assign_fetch_shards(scheduled, n_shards, host_col, seed)
    order = ["host_rank"] if "host_rank" in out.columns else []
    return out.repartition(n_shards, "fetch_shard").sortWithinPartitions(
        host_col, *order
    )


def shard_balance(
    assigned: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Per-shard load audit: hosts owned, URLs carried, and each
    shard's URL share relative to perfect balance (1.0 = exactly
    1/n_shards of the wave). One compact-key agg; the host count is a
    distinct inside the same exchange."""
    per_shard = assigned.groupBy("fetch_shard").agg(
        F.countDistinct(host_col).alias("n_hosts"),
        F.count(F.lit(1)).alias("n_urls"),
    )
    total = F.sum("n_urls").over(W.partitionBy())
    n = F.count(F.lit(1)).over(W.partitionBy())
    return per_shard.select(
        "fetch_shard",
        "n_hosts",
        "n_urls",
        (F.col("n_urls") * n / total).alias("load_factor"),
    )
