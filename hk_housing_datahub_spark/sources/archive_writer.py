"""Executor-side WARC / WET / WAT segment writer.

``render_segment`` / ``render_wet_segment`` / ``render_segment_deduped``
(sources/warc.py, sources/derivatives.py) materialize ONE segment's
bytes by collecting its records to the driver — the right tool for
tests and small exports, but a 100-segment × ~1 TB crawl export must
render every segment INSIDE its own task. This module is that path:

- one shuffle: ``repartition(segment)`` hash-partitions records so a
  segment never spans two tasks (several small segments may share one —
  the writer splits on the segment boundary inside the task);
- ``sortWithinPartitions(segment, *ORDER_COLS)`` reproduces the exact
  record order of the driver-side render and the cdxj offset window
  (sources/warc.py locate_records), so the written files are
  BYTE-IDENTICAL to the driver render and the (offset, length) pointers
  slice into them unchanged (pinned in tests/test_archive_writer.py);
- the writer is a ``mapInPandas`` iterator: it streams Arrow batches,
  concatenates each batch's per-segment byte runs (boundary detection,
  not per-row writes), and appends to the open segment file — peak
  memory is one Arrow batch, never a segment.

Files land under ``out_dir`` as ``{prefix}-{segment:05d}.{ext}`` (the
Common Crawl-style 1-of-N layout); the returned frame is the write
manifest (segment, path, n_records, n_bytes) — one row per non-empty
segment, the lineage record a publish step would commit. ``out_dir``
must be a filesystem every executor can reach (local in this sandbox;
a shared mount or fuse point on a cluster — the object-store upload
seam in sources/export.py is the same waiver as K6). Writes open with
``"wb"`` so a retried task overwrites its partial file rather than
double-appending; production hardening would write to a temp name and
rename on task commit.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.surt import surt_key
from .warc import (
    ORDER_COLS,
    _classified_layout,
    revisit_record,
    segment_expr,
    warc_record,
    warc_record_length,
)

MANIFEST_SCHEMA = "segment int, path string, n_records long, n_bytes long"


def segment_path(
    out_dir: str, segment: int, prefix: str = "warc", ext: str = "warc"
) -> str:
    """The file a segment's bytes land in — one naming rule for writer,
    tests, and any reader resolving a cdxj pointer to a file."""
    return os.path.join(out_dir, f"{prefix}-{segment:05d}.{ext}")


def write_record_frame(
    records: DataFrame, out_dir: str, prefix: str = "warc",
    ext: str = "warc",
) -> DataFrame:
    """Write a (segment, *ORDER_COLS, rec) frame as one file per
    segment; returns the manifest frame. The caller's ``rec`` must be
    the record BYTES (warc_record / wet_record / wat_record output)."""

    def _write(batches):
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        cur_seg: int | None = None
        fh = None
        n_recs = 0
        n_bytes = 0
        out: list[tuple[int, str, int, int]] = []

        def _close():
            nonlocal fh
            if fh is not None:
                fh.close()
                out.append(
                    (
                        int(cur_seg),
                        segment_path(out_dir, int(cur_seg), prefix, ext),
                        n_recs,
                        n_bytes,
                    )
                )
                fh = None

        for pdf in batches:
            segs = pdf["segment"].to_numpy()
            recs = pdf["rec"]
            i = 0
            while i < len(segs):
                seg = int(segs[i])
                j = i
                while j < len(segs) and segs[j] == seg:
                    j += 1
                if seg != cur_seg:
                    _close()
                    cur_seg, n_recs, n_bytes = seg, 0, 0
                    fh = open(
                        segment_path(out_dir, seg, prefix, ext), "wb"
                    )
                run = b"".join(bytes(b) for b in recs.iloc[i:j])
                fh.write(run)
                n_recs += j - i
                n_bytes += len(run)
                i = j
        _close()
        if out:
            yield pd.DataFrame(
                out, columns=["segment", "path", "n_records", "n_bytes"]
            )

    laid = records.repartition("segment").sortWithinPartitions(
        "segment", *ORDER_COLS
    )
    return laid.mapInPandas(_write, schema=MANIFEST_SCHEMA)


def _located_records(
    pages: DataFrame,
    record: Column,
    n_segments: int,
    url_col: str,
    ts_col: str,
    payload_col: str,
    segment_col: str | None = None,
) -> DataFrame:
    """(segment, *ORDER_COLS, rec) for an arbitrary record expression —
    the distributed twin of derivatives._ordered_records (same columns,
    same order keys, no filter/collect). ``segment_col`` mirrors
    locate_records: a precomputed assignment instead of the url-hash
    split."""
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    seg = (
        F.col(segment_col).cast("int")
        if segment_col
        else segment_expr(u, n_segments)
    )
    return pages.select(
        surt_key(u).alias("surt"),
        ts.alias("ts"),
        u.alias("url"),
        seg.alias("segment"),
        warc_record_length(u, ts, pl).alias("length"),
        F.md5(pl).alias("pdigest"),
        record.alias("rec"),
    )


def write_segments(
    pages: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    segment_col: str | None = None,
) -> DataFrame:
    """All WARC response segments, executor-side — byte-identical files
    to per-segment ``render_segment`` calls; ``warc_locations``'s
    (offset, length) pointers index the written files."""
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    return write_record_frame(
        _located_records(
            pages, warc_record(u, ts, pl), n_segments, url_col, ts_col,
            payload_col, segment_col,
        ),
        out_dir,
    )


def write_segments_deduped(
    pages: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Revisit-policy WARC segments, executor-side: full responses plus
    header-only revisit records, matching ``render_segment_deduped``
    byte-for-byte and ``locate_records_deduped``'s pointers."""
    rows = _classified_layout(
        pages, n_segments, url_col, ts_col, payload_col, keep_payload=True
    ).select(
        *ORDER_COLS,
        "segment",
        F.when(
            F.col("record_type") == "response",
            warc_record(F.col("url"), F.col("ts"), F.col("payload")),
        )
        .otherwise(
            revisit_record(
                F.col("url"),
                F.col("ts"),
                F.col("url"),
                F.col("refers_to_ts"),
            )
        )
        .alias("rec"),
    )
    return write_record_frame(rows, out_dir)


def write_wet_segments(
    pages: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """All WET (extracted-text) segments, executor-side — matches
    per-segment ``render_wet_segment`` bytes and the
    ``locate_derivatives`` (wet_offset, wet_length) pointers."""
    from .derivatives import wet_record

    return write_record_frame(
        _located_records(
            pages,
            wet_record(F.col(url_col), F.col(ts_col), F.col(text_col)),
            n_segments, url_col, ts_col, payload_col,
        ),
        out_dir,
        prefix="wet",
        ext="wet",
    )


def write_wat_segments(
    pages: DataFrame,
    out_dir: str,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    lang_col: str = "lang",
) -> DataFrame:
    """All WAT (metadata-JSON) segments, executor-side — matches
    per-segment ``render_wat_segment`` bytes and the
    ``locate_derivatives`` (wat_offset, wat_length) pointers."""
    from .derivatives import wat_payload, wat_record

    u, ts = F.col(url_col), F.col(ts_col)
    rec = wat_record(
        u, ts, wat_payload(u, ts, F.col(payload_col), F.col(lang_col))
    )
    return write_record_frame(
        _located_records(
            pages, rec, n_segments, url_col, ts_col, payload_col
        ),
        out_dir,
        prefix="wat",
        ext="wat",
    )
