"""TableCatalog: snapshot isolation, append/replace, history, vacuum."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from hk_housing_datahub_spark.sources import TableCatalog


@pytest.fixture()
def cat(spark):
    d = tempfile.mkdtemp(prefix="cat_")
    yield TableCatalog(spark, d)
    shutil.rmtree(d)


def test_append_and_read(spark, cat):
    df1 = spark.range(0, 10)
    df2 = spark.range(10, 25)
    s1 = cat.append("t", df1)
    assert cat.read("t").count() == 10
    s2 = cat.append("t", df2)
    assert s2 == s1 + 1
    assert cat.read("t").count() == 25
    assert [h["rows"] for h in cat.history("t")] == [10, 15]


def test_replace_and_vacuum(spark, cat):
    cat.append("t", spark.range(0, 10))
    cat.replace("t", spark.range(0, 5))
    assert cat.read("t").count() == 5
    assert cat.vacuum("t") == 1  # the orphaned append snapshot dir
    assert cat.read("t").count() == 5


def test_missing_table_raises(spark, cat):
    with pytest.raises(FileNotFoundError):
        cat.read("nope")


def test_time_travel_read(spark, cat):
    s1 = cat.append("t", spark.range(0, 10))
    s2 = cat.append("t", spark.range(10, 25))
    s3 = cat.replace("t", spark.range(0, 5))
    # VERSION AS OF each retained snapshot
    assert cat.read("t", snapshot=s1).count() == 10
    assert cat.read("t", snapshot=s2).count() == 25
    assert cat.read("t", snapshot=s3).count() == 5
    assert cat.read("t").count() == 5  # current unchanged
    # vacuum expires the non-current snapshots' files
    cat.vacuum("t")
    assert cat.read("t", snapshot=s3).count() == 5


def test_incremental_read_changes(spark, cat):
    s1 = cat.append("t", spark.range(0, 10))
    s2 = cat.append("t", spark.range(10, 25))
    s3 = cat.append("t", spark.range(25, 30))
    # delta after s1 = snapshots s2+s3 only — O(delta) files, not O(table)
    got = sorted(r.id for r in cat.read_changes("t", since=s1).collect())
    assert got == list(range(10, 30))
    # bounded range (s1, s2]
    got = sorted(r.id for r in cat.read_changes("t", since=s1, until=s2).collect())
    assert got == list(range(10, 25))
    # empty delta at head
    assert cat.read_changes("t", since=s3).count() == 0
    # replace breaks append-only incremental semantics
    cat.replace("t", spark.range(0, 3))
    with pytest.raises(ValueError, match="replaced"):
        cat.read_changes("t", since=s1)
