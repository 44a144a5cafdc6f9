"""sources/archive_writer.py — executor-side segment writer.

Contract: the distributed writer's files are BYTE-IDENTICAL to the
driver-side per-segment renders (render_segment / render_segment_deduped
/ render_wet_segment / render_wat_segment), and the cdxj pointer tables
slice into the written files unchanged — so the writer can replace the
driver render in an export job without touching the index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.datagen import generate_pages
from hk_housing_datahub_spark.sources.archive_writer import (
    segment_path,
    write_segments,
    write_segments_deduped,
    write_wat_segments,
    write_wet_segments,
)
from hk_housing_datahub_spark.sources.derivatives import (
    locate_derivatives,
    render_wat_segment,
    render_wet_segment,
)
from hk_housing_datahub_spark.sources.warc import (
    locate_records_deduped,
    parse_warc_record,
    render_segment,
    render_segment_deduped,
    warc_locations,
)

N_SEG = 4


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, 150, n_hosts=6).cache()
    df.count()
    yield df
    df.unpersist()


def _check_manifest(manifest, n_seg):
    rows = {r["segment"]: r for r in manifest}
    assert set(rows) <= set(range(n_seg))
    for r in manifest:
        assert os.path.getsize(r["path"]) == r["n_bytes"]
    return rows


def test_warc_writer_matches_driver_render(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    manifest = write_segments(pages, out, n_segments=N_SEG).collect()
    rows = _check_manifest(manifest, N_SEG)
    assert sum(r["n_records"] for r in manifest) == pages.count()
    for seg in range(N_SEG):
        want = render_segment(pages, seg, n_segments=N_SEG)
        if not want:
            assert seg not in rows
            continue
        with open(segment_path(out, seg), "rb") as fh:
            assert fh.read() == want


def test_cdx_pointers_index_written_files(spark, pages, tmp_path):
    out = str(tmp_path / "warc")
    write_segments(pages, out, n_segments=N_SEG).collect()
    locs = warc_locations(pages, n_segments=N_SEG).collect()
    probes = sorted(locs, key=lambda r: (r["segment"], r["offset"]))
    for r in probes[:: max(1, len(probes) // 7)]:
        with open(segment_path(out, r["segment"]), "rb") as fh:
            fh.seek(r["offset"])
            rec = fh.read(r["length"])
        parsed = (
            spark.createDataFrame([(bytearray(rec),)], "rec binary")
            .select(parse_warc_record(F.col("rec")).alias("p"))
            .collect()[0]["p"]
        )
        assert parsed["url"] == r["url"]


def test_deduped_writer_matches_driver_render(spark, tmp_path):
    # duplicate captures of the same payload -> revisit records
    base = generate_pages(spark, 60, n_hosts=4)
    again = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    pages = base.unionByName(again).cache()
    out = str(tmp_path / "dedup")
    manifest = write_segments_deduped(
        pages, out, n_segments=N_SEG
    ).collect()
    _check_manifest(manifest, N_SEG)
    for seg in range(N_SEG):
        want = render_segment_deduped(pages, seg, n_segments=N_SEG)
        path = segment_path(out, seg)
        got = open(path, "rb").read() if os.path.exists(path) else b""
        assert got == want
    # deduped pointer table still tiles the written files
    locs = locate_records_deduped(pages, n_segments=N_SEG).collect()
    sizes: dict[int, int] = {}
    for r in locs:
        sizes[r["segment"]] = max(
            sizes.get(r["segment"], 0), r["offset"] + r["length"]
        )
    for seg, end in sizes.items():
        assert os.path.getsize(segment_path(out, seg)) == end
    pages.unpersist()


def test_wet_and_wat_writers_match_driver_render(spark, pages, tmp_path):
    wet_dir, wat_dir = str(tmp_path / "wet"), str(tmp_path / "wat")
    write_wet_segments(pages, wet_dir, n_segments=N_SEG).collect()
    write_wat_segments(pages, wat_dir, n_segments=N_SEG).collect()
    for seg in range(N_SEG):
        wet_want = render_wet_segment(pages, seg, n_segments=N_SEG)
        wat_want = render_wat_segment(pages, seg, n_segments=N_SEG)
        wet_path = segment_path(wet_dir, seg, prefix="wet", ext="wet")
        wat_path = segment_path(wat_dir, seg, prefix="wat", ext="wat")
        got_wet = (
            open(wet_path, "rb").read() if os.path.exists(wet_path) else b""
        )
        got_wat = (
            open(wat_path, "rb").read() if os.path.exists(wat_path) else b""
        )
        assert got_wet == wet_want
        assert got_wat == wat_want
    # the derivative pointer table's wet offsets slice the wet files
    locs = locate_derivatives(pages, n_segments=N_SEG).collect()
    probe = max(locs, key=lambda r: r["wet_length"])
    with open(
        segment_path(wet_dir, probe["segment"], prefix="wet", ext="wet"),
        "rb",
    ) as fh:
        fh.seek(probe["wet_offset"])
        rec = fh.read(probe["wet_length"])
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: conversion")
    assert probe["url"].encode() in rec


def test_writer_plan_one_exchange_no_per_row_python(spark, pages):
    """Scale pin: the writer is ONE hash exchange on segment plus an
    in-task sort — no global sort, no extra shuffle, and the only
    Python is the mapInPandas writer itself."""
    import contextlib
    import io
    import re

    df = write_segments(pages, "/tmp/unused-plan-probe", n_segments=N_SEG)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # formatted explain prints each node in the tree AND a detail
    # section; count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "SinglePartition" not in p
    assert "BatchEvalPython" not in p
