"""Publish crawl waves into the table catalog — the north rule's "frontier
over Iceberg tables" made literal.

The crawl engine already writes each wave's extracted listings to its own
``listings/wave=N/`` parquet directory and commits an atomic manifest
(checkpoint.py). This module runs the engine wave-by-wave and, after each
committed wave, registers that wave's directory into a ``TableCatalog``
table via :meth:`TableCatalog.add_files` — Iceberg's metadata-only import:

    wave N committed  ──►  catalog snapshot N+k  (zero data copied)

giving the crawl output the full Iceberg contract downstream:
- one catalog **snapshot per wave**, carrying the wave's per-partition
  lineage (partition id, watermark, rows emitted) on the snapshot entry;
- **incremental consumers** (``read_changes`` / ``IncrementalConsumer``)
  pick up exactly the new waves, O(delta) — the monthly-rollup pattern
  (star/consumer.py) works unchanged over crawl output;
- **time travel** to the corpus as of any wave; **rollback** of a bad wave;
- **stats pruning**: the wave files' footer min/max land in the manifest,
  so ``read(where=[("host", "=", h)])`` skips whole waves that never
  fetched that host.

Crash-resume is exactly-once END TO END, by composing two idempotent
halves: the engine never re-runs a committed wave (its manifest is the
resume point), and ``add_files``'s duplicate-import guard means a
crashed-then-replayed publish of the same wave directory is rejected
rather than doubling rows. ``publish_crawl`` therefore starts by
reconciling: any wave the engine committed but the catalog missed is
published first, then the crawl continues.

Scale: the publish step is driver-side metadata only (one footer pass per
wave's files + one manifest CAS) — at 10^10 URLs the per-wave overhead is
O(files-in-wave), independent of row count, and the data bytes are written
exactly once by the engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..sources.tables import TableCatalog, has_parquet_parts
from .checkpoint import read_manifest
from .crawl import CrawlEngine


@dataclass
class PublishResult:
    table: str
    waves_published: list[int]
    snapshots: dict[int, int]  # wave -> catalog snapshot id
    waves_rejected: list[int] = field(default_factory=list)  # WAP discards
    rows_rejected: dict[int, int] = field(default_factory=dict)  # wave -> rows

    def listings(self, catalog: TableCatalog) -> DataFrame:
        return catalog.read(self.table)


def _published_waves(catalog: TableCatalog, table: str) -> set[int]:
    """Waves already imported, from the snapshot entries' lineage."""
    return {
        h["lineage"]["wave"]
        for h in catalog.history(table)
        if h.get("external") and "wave" in h.get("lineage", {})
    }


def _unresolved_stages(catalog: TableCatalog, table: str) -> dict[int, int]:
    """wave -> staged snapshot id, for imports whose audit never resolved
    (a crash between staging and publish/discard)."""
    return {
        h["lineage"]["wave"]: h["snapshot"]
        for h in catalog.history(table)
        if h["op"] == "stage"
        and h.get("external")
        and not h.get("resolved")
        and "wave" in h.get("lineage", {})
    }


def _wave_dir(engine: CrawlEngine, wave: int) -> str:
    return os.path.join(engine.dir, "listings", f"wave={wave}")


def _publish_wave(
    catalog: TableCatalog,
    table: str,
    engine: CrawlEngine,
    wave: int,
    mode: str = "append",
) -> int:
    m = read_manifest(engine.dir)
    return catalog.add_files(
        table,
        _wave_dir(engine, wave),
        lineage={
            "wave": wave,
            # the engine manifest's lineage covers the LAST wave only;
            # per-wave partition metrics ride along when this is it
            "partitions": m.lineage if m and m.wave == wave else None,
            "source_checkpoint": engine.dir,
        },
        mode=mode,
    )


def publish_crawl(
    engine: CrawlEngine,
    seeds: DataFrame,
    catalog: TableCatalog,
    table: str,
    max_waves: int = 10,
    publish_seen: bool = True,
    audit=None,
) -> PublishResult:
    """Run (or resume) the crawl, committing every wave's listings into
    ``catalog.table`` as its own snapshot. Safe to re-run after a crash at
    any point: committed waves are never re-crawled, published waves are
    never re-imported, and an engine-committed-but-unpublished wave is
    reconciled before crawling continues.

    With ``publish_seen`` (default), each wave's seen-set checkpoint is
    also registered, as a metadata-only REPLACE of ``<table>_seen`` — the
    north rule's "seen-set checkpointed to Iceberg": the current snapshot
    is the live salted-bucket state, older snapshots time-travel to the
    seen-set as of any earlier wave (until vacuum; the catalog never owns
    or deletes the engine's checkpoint files).

    ``audit`` (a ``DataFrame -> bool`` callable) turns each wave's import
    into a write-audit-publish gate: the wave is STAGED (invisible), the
    audit runs on exactly the staged rows, and the wave is then published
    or discarded. A rejected wave never becomes visible to any reader —
    the production guard against a bad extraction batch reaching training
    data. Rejected waves are listed in ``waves_rejected`` and recorded in
    the snapshot history either way (an audited decision is lineage too)."""
    published = _published_waves(catalog, table)
    seen_tbl = f"{table}_seen"
    seen_published = _published_waves(catalog, seen_tbl)
    snapshots: dict[int, int] = {}
    waves: list[int] = []
    rejected: list[int] = []
    rows_rejected: dict[int, int] = {}

    pending = _unresolved_stages(catalog, table)

    def _resolve(w: int, staged: int) -> None:
        if audit is None or audit(catalog.read_staged(table, staged)):
            snapshots[w] = catalog.publish_staged(table, staged)
            waves.append(w)
        else:
            rows_rejected[w] = catalog.discard_staged(table, staged)
            rejected.append(w)
        published.add(w)

    def _sync() -> None:
        m = read_manifest(engine.dir)
        for w in m.waves_done if m else []:
            # the seen-set snapshot must be registered even for a wave
            # that extracted zero listings — a consumer warm-starting
            # dedup from <table>_seen's current snapshot must see the
            # state AFTER the last wave, not one wave stale
            if publish_seen and w not in seen_published:
                catalog.add_files(
                    seen_tbl,
                    os.path.join(engine.dir, f"seen_v{w}"),
                    lineage={
                        "wave": w,
                        "seen_mode": engine.seen_mode,
                        "seen_count": m.seen_count if m.wave == w else None,
                    },
                    mode="replace",
                )
                seen_published.add(w)
            if w in pending:
                # a crash landed between staging and the audit decision:
                # the wave is imported but unresolved — resolve it now
                # (re-staging is blocked by the duplicate-import guard)
                _resolve(w, pending.pop(w))
            elif w not in published:
                # a committed wave can legitimately extract zero rows (all
                # scheduled urls dead): nothing to import, nothing to wedge
                # on — the wave is simply absent from the catalog
                if not has_parquet_parts(_wave_dir(engine, w)):
                    continue
                if audit is None:
                    snapshots[w] = _publish_wave(catalog, table, engine, w)
                    waves.append(w)
                    published.add(w)
                else:
                    staged = _publish_wave(
                        catalog, table, engine, w, mode="stage"
                    )
                    _resolve(w, staged)

    _sync()  # reconcile a crash between engine commit and publish
    for _ in range(max_waves):
        before = read_manifest(engine.dir)
        engine.run(seeds, max_waves=1)
        after = read_manifest(engine.dir)
        if after is None or (before is not None and after.wave == before.wave):
            break  # frontier drained — no new wave committed
        _sync()
    return PublishResult(
        table=table,
        waves_published=waves,
        snapshots=snapshots,
        waves_rejected=rejected,
        rows_rejected=rows_rejected,
    )
