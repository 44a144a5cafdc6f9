"""Batched incremental star-schema load — the reference's orchestrator layer.

Re-expresses /root/reference/src/orchestrators/agency.py as a Spark
pipeline over the TableCatalog:

- ``partition_ids(cache, partition_size)`` + per-partition
  fetch→process→insert→clear (agency.py:20,34,67-96) → deterministic
  hash-batches over the response tables; each batch extracts, dedups
  against the COMMITTED table state, and appends one snapshot. State never
  accumulates in memory across batches (the reference clears its caches;
  here each batch is an independent bounded job).
- the cross-partition ``pk_sets`` dedup (processors/agency/buildings.py:54-58,
  122-125) → a PK left-anti join against the committed table, so a key
  inserted by batch 3 is never re-inserted by batch 7 — and dimension rows
  that appear in EVERY batch (regions, facilities) land exactly once.
- the two-stage flow — estates first, then the building-ids harvested from
  them (agency.py:140-143 ``building_ids_cache``) — → stage 2's responses
  are semi-joined against the committed ``buildings`` table.
- crash-resume: completed (stage, batch) pairs are recorded in an
  atomically-replaced JSON manifest; re-running skips them, and because
  every append is PK-deduped, a batch that crashed AFTER its append but
  BEFORE its manifest mark is safely re-run (idempotent).

Scale: batches bound the working set exactly like the reference's
``partition_size`` bounds its caches — each batch shuffles only its slice
plus the committed-PK side of the anti-joins, and the catalog's manifest
commits give per-batch lineage (snapshot id, rows) for free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import TableCatalog
from .extractor import (
    extract_building_tables,
    extract_estate_tables,
    extract_monthly_market,
)
from .schema import STAR_PRIMARY_KEYS, STAR_TABLES, create_star_tables

ESTATE_TABLES = [
    "regions", "subregions", "districts", "estates", "facilities",
    "estate_facilities", "estate_school_nets", "estate_mtr_lines",
    "phases", "buildings",
]
BUILDING_TABLES = ["units", "unit_features", "transactions"]


def _batch_of(col, n_batches: int):
    return F.pmod(F.xxhash64(col), F.lit(n_batches))


class _Progress:
    """Atomically-committed set of completed (stage, batch) marks, pinned
    to the batch count they were computed under — resuming with a
    different ``n_batches`` would silently skip uncommitted hash slices,
    so it is rejected instead."""

    def __init__(self, path: str, n_batches: int):
        self.path = path
        self.n_batches = n_batches
        self.done: set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                state = json.load(f)
            recorded = state.get("n_batches")
            if recorded is not None and recorded != n_batches:
                raise ValueError(
                    f"pipeline progress at {path} was written with "
                    f"n_batches={recorded}; resuming with n_batches="
                    f"{n_batches} would mis-map completed hash slices — "
                    "finish with the original batch count or start a fresh "
                    "state dir"
                )
            self.done = set(state["done"])

    def mark(self, stage: str, batch: int) -> None:
        self.done.add(f"{stage}/{batch}")
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"done": sorted(self.done), "n_batches": self.n_batches}, f)
        os.replace(tmp, self.path)

    def has(self, stage: str, batch: int) -> bool:
        return f"{stage}/{batch}" in self.done


def _append_deduped(
    catalog: TableCatalog, table: str, rows: DataFrame
) -> int:
    """PK-anti-join against the committed table, append only new keys.

    Rows with a NULL in any PK column are dropped first: they violate the
    declared non-null key schema, and a null-keyed row would never match
    the committed side of the anti-join (SQL null-equality), so it would be
    re-appended on every resume/replay — silently breaking the documented
    crash-resume idempotency.

    ``fresh`` is persisted across its two uses (count, then write) so the
    extraction lineage — including the nested-JSON render upstream — runs
    once, not twice; the known count also lets the catalog skip its
    post-write verification re-read (one Spark job per commit saved)."""
    pk = STAR_PRIMARY_KEYS[table]
    for c in pk:
        rows = rows.filter(F.col(c).isNotNull())
    committed = catalog.read(table).select(*pk)
    fresh = rows.join(committed, pk, "left_anti").persist()
    try:
        n = fresh.count()
        if n:
            catalog.append(table, fresh, rows=n)
    finally:
        fresh.unpersist()
    return n


def run_star_pipeline(
    spark: SparkSession,
    catalog: TableCatalog,
    estate_responses: DataFrame,
    monthly_responses: DataFrame,
    building_responses: DataFrame,
    n_batches: int = 4,
    state_dir: str | None = None,
) -> dict[str, int]:
    """Run the full two-stage batched load; returns rows appended per table
    (zero for batches skipped on resume)."""
    create_star_tables(catalog)
    progress = _Progress(
        os.path.join(state_dir or catalog.root, "_pipeline_progress.json"),
        n_batches,
    )
    appended = dict.fromkeys(list(STAR_TABLES), 0)

    # ---- stage 1: estates + monthly, batched by estate id ----------------
    for b in range(n_batches):
        if progress.has("estates", b):
            continue
        # persist the batch's rendered responses: ten table extractions
        # share one materialization instead of re-running the upstream
        # lineage per table (the reference likewise holds one partition's
        # responses in memory while its processors consume them)
        batch_est = estate_responses.filter(
            _batch_of(F.col("estate_id"), n_batches) == b
        ).persist()
        tables = extract_estate_tables(batch_est)
        for t in ESTATE_TABLES:
            appended[t] += _append_deduped(catalog, t, tables[t])
        batch_est.unpersist()
        batch_monthly = monthly_responses.filter(
            _batch_of(F.col("estate_id"), n_batches) == b
        )
        appended["estate_monthly_market_info"] += _append_deduped(
            catalog,
            "estate_monthly_market_info",
            extract_monthly_market(batch_monthly),
        )
        progress.mark("estates", b)

    # ---- stage 2: buildings harvested from the committed star ------------
    committed_bids = catalog.read("buildings").select("building_id")
    harvested = building_responses.join(committed_bids, "building_id", "left_semi")
    for b in range(n_batches):
        if progress.has("buildings", b):
            continue
        batch_bld = harvested.filter(
            _batch_of(F.col("building_id"), n_batches) == b
        ).persist()
        tables = extract_building_tables(batch_bld)
        for t in BUILDING_TABLES:
            appended[t] += _append_deduped(catalog, t, tables[t])
        batch_bld.unpersist()
        progress.mark("buildings", b)

    return appended
