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
