"""Incremental materialized rollup: delta-only refresh == full recompute,
watermark atomicity, append-only violation handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources import TableCatalog
from hk_housing_datahub_spark.sources.rollup import IncrementalRollup, Measure


@pytest.fixture()
def cat(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "cat"))


def _mk(cat):
    return IncrementalRollup(
        cat,
        src="facts",
        dst="facts_by_k",
        group_cols=["k"],
        measures={
            "n": Measure("count"),
            "total": Measure("sum", "v"),
            "lo": Measure("min", "v"),
            "hi": Measure("max", "v"),
        },
    )


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v long")


def _state(r):
    return {
        row["k"]: (row["n"], row["total"], row["lo"], row["hi"])
        for row in r.read().collect()
    }


def test_incremental_equals_full_recompute(spark, cat):
    r = _mk(cat)
    batches = [
        [("a", 1), ("a", 5), ("b", 10)],
        [("b", 2), ("c", 7)],            # existing group + new group
        [("a", -3), ("c", 7), ("c", 0)],
    ]
    seen = []
    for b in batches:
        cat.append("facts", _rows(spark, b))
        r.refresh()
        seen += b
        want = {
            k: (
                len([v for kk, v in seen if kk == k]),
                sum(v for kk, v in seen if kk == k),
                min(v for kk, v in seen if kk == k),
                max(v for kk, v in seen if kk == k),
            )
            for k in {kk for kk, _ in seen}
        }
        assert _state(r) == want


def test_multi_snapshot_catchup_and_idempotent_refresh(spark, cat):
    r = _mk(cat)
    cat.append("facts", _rows(spark, [("a", 1)]))
    cat.append("facts", _rows(spark, [("a", 2), ("b", 3)]))
    cat.append("facts", _rows(spark, [("b", 4)]))
    out = r.refresh()  # one refresh folds all three snapshots
    assert out["applied_to"] == cat.current_snapshot("facts")
    assert _state(r) == {"a": (2, 3, 1, 2), "b": (2, 7, 3, 4)}
    snap = cat.current_snapshot("facts_by_k")
    again = r.refresh()  # nothing new: no commit, same state
    assert again["applied_from"] == again["applied_to"]
    assert cat.current_snapshot("facts_by_k") == snap
    assert _state(r) == {"a": (2, 3, 1, 2), "b": (2, 7, 3, 4)}


def test_watermark_rides_the_state_rows(spark, cat):
    r = _mk(cat)
    cat.append("facts", _rows(spark, [("a", 1)]))
    r.refresh()
    h1 = cat.current_snapshot("facts")
    assert r.applied_snapshot() == h1
    cat.append("facts", _rows(spark, [("b", 2)]))
    r.refresh()
    # group 'a' untouched by refresh 2: its row keeps the OLD watermark,
    # but the applied snapshot is the max across rows
    snaps = {
        row["k"]: row[IncrementalRollup.WATERMARK]
        for row in cat.read("facts_by_k").collect()
    }
    assert snaps["a"] == h1 and snaps["b"] > h1
    assert r.applied_snapshot() == cat.current_snapshot("facts")


def test_replace_breaks_append_only_and_rebuild_recovers(spark, cat):
    r = _mk(cat)
    cat.append("facts", _rows(spark, [("a", 1), ("b", 2)]))
    r.refresh()
    cat.replace("facts", _rows(spark, [("a", 100)]))
    cat.append("facts", _rows(spark, [("b", 5)]))
    with pytest.raises(ValueError, match="not append-only"):
        r.refresh()
    r.rebuild()
    assert _state(r) == {"a": (1, 100, 100, 100), "b": (1, 5, 5, 5)}
    # incremental service resumes after the rebuild
    cat.append("facts", _rows(spark, [("a", 1)]))
    r.refresh()
    assert _state(r)["a"] == (2, 101, 1, 100)


def test_untouched_groups_not_rewritten(spark, cat):
    r = _mk(cat)
    cat.append("facts", _rows(spark, [("a", 1)]), cluster_by=["k"])
    r.refresh()
    cat.append("facts", _rows(spark, [("zzz", 9)]))
    out = r.refresh()
    assert out["groups_touched"] == 1  # only the new group
    assert _state(r) == {"a": (1, 1, 1, 1), "zzz": (1, 9, 9, 9)}


def test_empty_snapshots_do_not_advance_the_watermark(spark, cat):
    r = _mk(cat)
    cat.append("facts", _rows(spark, [("a", 1)]))
    r.refresh()
    w = r.applied_snapshot()
    cat.append("facts", spark.createDataFrame([], "k string, v long"))
    out = r.refresh()  # nothing to fold, nothing committed
    assert out["applied_from"] == out["applied_to"] == w
    assert r.applied_snapshot() == w
    cat.append("facts", _rows(spark, [("a", 2)]))
    r.refresh()  # folds past the empty snapshot cleanly
    assert _state(r) == {"a": (2, 3, 1, 2)}
