"""Mergeable sketch statistics for crawl-wide distinct counts and
size/latency quantiles (Apache DataSketches via Spark SQL aggregates).

Why the frontier needs this: "how many DISTINCT urls (or hosts, or
content digests) has the crawl seen, per host / per wave / overall?" is
the operational question behind budget allocation, trap triage and
coverage reporting — and at 10^10 captures an exact
``count(distinct ...)`` is a full-table shuffle of every url string
every time someone asks. The reference sidesteps the question entirely
(its catalog is a few thousand listings; ``SELECT COUNT(*)`` is free —
/root/reference/src/orchestrators/agency.py:34-66 just re-reads its
SQLite table). A Common-Crawl-scale engine keeps MERGEABLE per-wave
sketches instead:

- each wave contributes O(groups) rows of fixed-size sketch state
  (an HLL_4 register array is ~``2^lg_k`` bytes ≈ 4 KiB at the default
  ``lg_k=12``; a KLL_200 bigint sketch is ≤ ~1.6 KiB), computed in the
  SAME partial-aggregate pass shape as any sum — map-side combine does
  the heavy lifting, the exchange carries sketches, not urls;
- wave sketches UNION into crawl-lifetime answers without rescanning
  any raw table (``merge_sketch_stats``) — the union is register-max /
  compactor-merge, so state stays O(groups) forever;
- HLL union is ORDER- and GROUPING-INSENSITIVE: merging per-wave
  sketches yields the *identical* register state (hence identical
  estimate) as one sketch over the concatenated data — pinned by
  ``test_sketches.py`` — so incremental maintenance is not an
  approximation of the batch answer, it IS the batch answer. (KLL is
  weight-exact but compaction-path-dependent, so its guarantee is the
  published rank-error bound, not bit equality; the tests check both
  accordingly.)

Relative error at the defaults: HLL lg_k=12 → ~1.6% standard error on
distinct counts; KLL k=200 → ~1.7% rank error on quantiles. Raise
``lg_k``/``kll_k`` for tighter bounds; state grows linearly, the plan
shape does not change.

Scale shape (10^10 captures, 10^7 hosts): one compact-key shuffle per
wave keyed on ``keys`` (sketch partials combined map-side); the merge
input is waves × groups rows of kilobyte-sized state — a "small data"
job regardless of raw corpus size. No driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12
DEFAULT_KLL_K = 200


def sketch_stats(
    captures: DataFrame,
    keys: list[str] | None = None,
    distinct_cols: dict[str, str] | None = None,
    quantile_cols: dict[str, str] | None = None,
    lg_k: int = DEFAULT_LG_K,
    kll_k: int = DEFAULT_KLL_K,
) -> DataFrame:
    """Per-``keys`` sketch state over one batch of captures.

    ``distinct_cols`` maps output name -> input column to HLL-sketch
    (default ``{"urls": "url_canon"}``); ``quantile_cols`` maps output
    name -> bigint input column to KLL-sketch (default ``{}``). Output
    columns: ``keys…``, ``n_captures``, ``<name>_hll: binary`` per
    distinct col, ``<name>_kll: binary`` per quantile col.

    One partial-agg exchange on ``keys``; the sketches are Spark SQL
    aggregate functions, so map-side combine applies exactly as it
    would for ``sum``.
    """
    keys = keys if keys is not None else ["host"]
    if distinct_cols is None:
        distinct_cols = {"urls": "url_canon"}
    quantile_cols = quantile_cols or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_captures")]
    for name, col in distinct_cols.items():
        aggs.append(F.hll_sketch_agg(col, lg_k).alias(f"{name}_hll"))
    for name, col in quantile_cols.items():
        aggs.append(
            F.kll_sketch_agg_bigint(F.col(col).cast("bigint"), kll_k).alias(
                f"{name}_kll"
            )
        )
    return captures.groupBy(*keys).agg(*aggs)


# an item-less KLL sketch serializes to its 8-byte preamble alone; the
# kll_sketch_* readers reject that buffer (Spark KLL_INVALID_INPUT_SKETCH_
# BUFFER), so empties are filtered before any merge/read and a group with
# no measured values reports NULL quantiles instead of crashing the job
_KLL_EMPTY_LEN = 8


def _kll_merge_all(col: Column) -> Column:
    """Fold an ARRAY of KLL sketches into one. Empty-buffer sketches
    (all-NULL input groups) are dropped first, and the fold seeds with
    element 1 then folds elements 2…n — seeding with element 1 and then
    folding ALL elements would merge the first sketch twice, silently
    doubling its items' weight (KLL merge is weighted, unlike HLL's
    idempotent register max). All sketches empty → NULL."""
    valid = F.filter(col, lambda x: F.length(x) > _KLL_EMPTY_LEN)
    rest = F.slice(valid, 2, F.greatest(F.size(valid) - 1, F.lit(0)))
    return F.reduce(
        rest,
        F.try_element_at(valid, F.lit(1)),
        lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
    )


def merge_sketch_stats(
    *stats: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Union any number of ``sketch_stats`` frames (e.g. one per crawl
    wave) into one frame of the same schema — O(delta) maintenance: a
    new wave is ``merge_sketch_stats(existing_state, wave_stats)``,
    never a rescan of raw captures.

    HLL partials union via ``hll_union_agg`` (register max — the result
    is bit-identical to sketching the concatenated raw data); KLL
    partials are collected per group (bounded: one row per input frame)
    and pairwise-merged. ``n_captures`` sums. Associative and
    commutative, so wave order and merge tree shape don't matter.
    """
    keys = keys if keys is not None else ["host"]
    unioned = stats[0]
    for s in stats[1:]:
        unioned = unioned.unionByName(s)
    first = stats[0]
    unknown = [
        c
        for c in first.columns
        if c not in keys
        and c != "n_captures"
        and not c.endswith(("_hll", "_kll"))
    ]
    if unknown:
        # fail fast: a column this merge doesn't know how to combine
        # would otherwise vanish from the maintained state silently
        # (e.g. host_graph_stats merged without its n_links rename)
        raise ValueError(
            f"merge_sketch_stats: unmergeable columns {unknown}; "
            "expected keys, n_captures, *_hll, *_kll"
        )
    aggs: list[Column] = [F.sum("n_captures").alias("n_captures")]
    for c in first.columns:
        if c.endswith("_hll"):
            aggs.append(F.hll_union_agg(c).alias(c))
        elif c.endswith("_kll"):
            aggs.append(_kll_merge_all(F.collect_list(c)).alias(c))
    return unioned.groupBy(*keys).agg(*aggs)


def sketch_report(
    stats: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Human/auditor view of a sketch-stats frame: every ``*_hll``
    column becomes ``<name>_distinct: bigint``, every ``*_kll`` column
    becomes ``<name>_p50/p90/p99…``, ``n_captures`` passes through.
    Pure projection — no shuffle; runs on the O(groups) state frame.
    """
    cols: list[Column] = []
    for c in stats.columns:
        if c.endswith("_hll"):
            cols.append(
                F.hll_sketch_estimate(c).alias(f"{c[:-4]}_distinct")
            )
        elif c.endswith("_kll"):
            for q in quantiles:
                # %g keeps p99 / p99_9 / p29 distinct and exact (int
                # truncation would collide 0.99 with 0.999 and mislabel
                # 0.29 as p28 via float rounding)
                label = ("%g" % round(q * 100, 6)).replace(".", "_")
                cols.append(
                    F.when(
                        F.length(c) > _KLL_EMPTY_LEN,
                        F.kll_sketch_get_quantile_bigint(
                            F.col(c), F.lit(q)
                        ),
                    ).alias(f"{c[:-4]}_p{label}")
                )
        else:
            cols.append(F.col(c))
    return stats.select(*cols)


def update_sketch_table(
    catalog,
    table: str,
    wave_stats: DataFrame,
    keys: list[str] | None = None,
) -> int:
    """Maintain a catalog table of crawl-lifetime sketch state with
    O(delta) work per wave: read current state (O(groups) kilobyte
    rows), merge the new wave's stats, REPLACE. Returns the committed
    snapshot id.

    Mirrors ``jobs/archive_job.py``'s stats-maintenance contract: the
    replaced snapshot is atomic (CAS commit in sources/tables.py), and
    re-running the same wave's merge is NOT idempotent for
    ``n_captures``/KLL (weighted), so callers gate replay exactly like
    the archive job's wave ledger. HLL columns alone would be replay-
    safe (idempotent union), but the contract is the conservative one.
    """
    keys = keys if keys is not None else ["host"]
    try:
        current = catalog.read(table)
    except FileNotFoundError:
        merged = wave_stats  # genuinely first wave — any OTHER error raises
    else:
        merged = merge_sketch_stats(current, wave_stats, keys=keys)
    # the merged plan reads the table being replaced — materialize via
    # persist before the catalog swaps the snapshot out from under it
    merged = merged.persist()
    merged.count()
    n = catalog.replace(table, merged)
    merged.unpersist()
    return n
