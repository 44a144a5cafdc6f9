"""Committed-PK bloom index (sources/pkbloom.py): the O(batch) dedup
probe that replaces the per-batch full-committed-set anti-join shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources.pkbloom import PKBloomIndex
from hk_housing_datahub_spark.sources.tables import TableCatalog
from hk_housing_datahub_spark.star.pipeline import _append_deduped
from hk_housing_datahub_spark.star.schema import create_star_tables

_REGION_SCHEMA = "region_id string, region_name_zh string, region_name_en string"


def _regions(spark, lo, hi):
    return spark.createDataFrame(
        [(f"R{i}", f"區{i}", f"Region {i}") for i in range(lo, hi)],
        _REGION_SCHEMA,
    )


def _counting_catalog(spark, root):
    cat = TableCatalog(spark, root)
    reads = {"n": 0}
    orig = cat.read

    def counting_read(table):
        if table == "regions":
            reads["n"] += 1
        return orig(table)

    cat.read = counting_read
    return cat, reads


def test_bloom_fast_path_never_scans_committed(spark, tmp_path):
    """Disjoint-key batches are all bloom-misses (no false negatives), so
    the committed table is NOT read; a replayed batch is all bloom-hits
    and goes through the exact anti-join exactly once."""
    cat, reads = _counting_catalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    bloom = PKBloomIndex(cat).ensure("regions", ["region_id"])

    reads["n"] = 0
    assert _append_deduped(cat, "regions", _regions(spark, 0, 50), bloom) == 50
    assert reads["n"] == 0  # empty bloom → everything definitely-new

    reads["n"] = 0
    assert _append_deduped(cat, "regions", _regions(spark, 50, 100), bloom) == 50
    assert reads["n"] == 0  # disjoint keys → fast path, no committed scan

    reads["n"] = 0  # replay: all keys known → exact verify, nothing appended
    assert _append_deduped(cat, "regions", _regions(spark, 50, 100), bloom) == 0
    assert reads["n"] == 1

    assert cat.read("regions").count() == 100
    assert bloom.n_items("regions") == 100


def test_bloom_crash_between_update_and_append_is_safe(spark, tmp_path):
    """The documented ordering (bloom update BEFORE append-commit) makes a
    crash in between leave only false positives: the replayed rows route
    through the exact anti-join and are appended — no loss, no dup."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    bloom = PKBloomIndex(cat).ensure("regions", ["region_id"])
    rows = _regions(spark, 0, 20)
    # simulate the crash: bloom knows the keys, the table never got them
    bloom.update("regions", rows.select("region_id"), ["region_id"])
    assert _append_deduped(cat, "regions", rows, bloom) == 20
    assert cat.read("regions").count() == 20
    # and a second replay is a clean no-op
    assert _append_deduped(cat, "regions", rows, bloom) == 0


def test_bloom_backfills_pre_existing_catalog(spark, tmp_path):
    """ensure() on a table that predates the index scans committed PKs
    once; afterwards the committed keys are all bloom-hits."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    first = _regions(spark, 0, 30)
    _append_deduped(cat, "regions", first)  # bloom-less append
    bloom = PKBloomIndex(cat).ensure("regions", ["region_id"])
    assert bloom.n_items("regions") == 30
    probed = bloom.probe("regions", first, ["region_id"])
    assert probed.filter(~F.col("_pk_maybe")).count() == 0
    # replay against the backfilled bloom: no duplicates
    assert _append_deduped(cat, "regions", first, bloom) == 0


def test_bloom_rejects_bad_config(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="power of two"):
        PKBloomIndex(cat, n_buckets=48)
    create_star_tables(cat)
    PKBloomIndex(cat, m_bits=1 << 16).ensure("regions", ["region_id"])
    with pytest.raises(ValueError, match="wrong bits"):
        PKBloomIndex(cat, m_bits=1 << 17).ensure("regions", ["region_id"])


def test_run_star_pipeline_default_uses_bloom_fast_path(
    spark, sf_small, tmp_path
):
    """The production entry point — the same call jobs/star_job.py and the
    star_pipeline_counts oracle query make — defaults ``use_pk_bloom=True``,
    so disjoint-keyed batches never re-read the committed table for dedup.
    Expected committed reads across a fresh 2-batch load: each table once
    at bloom ``ensure`` (the backfill emptiness check), ``buildings`` once
    more for the stage-2 harvest, and the repeated-key DIMENSION tables
    (regions appear in every batch) once more for their exact maybe-verify.
    Disjoint-keyed tables (estates, units, transactions) must show ZERO
    per-batch dedup reads."""
    import os as _os

    from hk_housing_datahub_spark.star import (
        render_building_responses,
        render_estate_responses,
        render_monthly_responses,
        run_star_pipeline,
    )

    cust = spark.read.parquet(_os.path.join(sf_small, "customer.parquet"))
    orders = spark.read.parquet(_os.path.join(sf_small, "orders.parquet"))
    li = spark.read.parquet(_os.path.join(sf_small, "lineitem.parquet"))

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    reads: list[str] = []
    orig = cat.read

    def recording_read(table, *a, **k):
        reads.append(table)
        return orig(table, *a, **k)

    cat.read = recording_read
    run_star_pipeline(
        spark,
        cat,
        render_estate_responses(cust),
        render_monthly_responses(orders),
        render_building_responses(orders, li),
        n_batches=2,
    )
    for t in ("estates", "units", "transactions", "phases"):
        assert reads.count(t) == 1, (t, reads.count(t))  # ensure() only
    assert reads.count("buildings") == 2  # ensure() + stage-2 harvest


def test_table_backend_classifies_identically_to_files(spark, tmp_path):
    """The 10^9+-keys promotion: at a FORCED small m_bits (so false
    positives actually occur), the table-backed bucket-state bloom must
    classify every probe key exactly like the file-shard bloom — same
    bits, same buckets, same false positives — and agree on n_items and
    the update counts. Also: crash-safety ordering holds (a torn state
    write cannot lose old bits, because the meta pointer only flips after
    the new version lands)."""
    cfg = dict(n_buckets=8, m_bits=1 << 10, k=3)
    cat_f = TableCatalog(spark, str(tmp_path / "cf"))
    cat_t = TableCatalog(spark, str(tmp_path / "ct"))
    create_star_tables(cat_f)
    create_star_tables(cat_t)
    bf = PKBloomIndex(cat_f, **cfg).ensure("regions", ["region_id"])
    bt = PKBloomIndex(cat_t, **cfg, backend="table").ensure(
        "regions", ["region_id"]
    )

    batches = [(0, 120), (120, 300), (300, 301)]  # incl. a 1-row batch
    for lo, hi in batches:
        rows = _regions(spark, lo, hi).select("region_id")
        assert bf.update("regions", rows, ["region_id"]) == hi - lo
        assert bt.update("regions", rows, ["region_id"]) == hi - lo
    assert bf.n_items("regions") == bt.n_items("regions") == 301

    # probe a mix of present keys and absent keys (at 2^10 bits / 301 keys
    # many absent keys WILL false-positive — both backends must agree on
    # exactly which)
    probes = _regions(spark, 0, 900)
    got_f = {
        r.region_id: r._pk_maybe
        for r in bf.probe("regions", probes, ["region_id"]).collect()
    }
    got_t = {
        r.region_id: r._pk_maybe
        for r in bt.probe("regions", probes, ["region_id"]).collect()
    }
    assert got_f == got_t
    assert all(got_f[f"R{i}"] for i in range(301))  # no false negatives
    fps = sum(got_f[f"R{i}"] for i in range(301, 900))
    assert 0 < fps < 599  # the small filter really is saturating

    # backend mismatch on reopen is rejected, not silently misread
    with pytest.raises(ValueError, match="backend"):
        PKBloomIndex(cat_t, **cfg).ensure("regions", ["region_id"])


def test_table_backend_drives_append_dedup(spark, tmp_path):
    """_append_deduped over the table-backed bloom: same dedup behavior
    as the file backend — disjoint batch appends without reading the
    committed table, replay appends nothing."""
    cat, reads = _counting_catalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    bloom = PKBloomIndex(cat, n_buckets=8, backend="table").ensure(
        "regions", ["region_id"]
    )
    assert _append_deduped(cat, "regions", _regions(spark, 0, 40), bloom) == 40
    reads["n"] = 0
    assert _append_deduped(cat, "regions", _regions(spark, 40, 80), bloom) == 40
    assert reads["n"] == 0  # disjoint keys: committed table never read
    assert _append_deduped(cat, "regions", _regions(spark, 40, 80), bloom) == 0
    assert cat.read("regions").count() == 80
