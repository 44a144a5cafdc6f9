"""operators/banded.py — the two-phase banded global rank.

The contract is BIT-IDENTITY with a global ``row_number()`` window
under the same (value [DESC], *tiebreaks) order, on adversarial inputs
(heavy ties that straddle quantile boundaries, negatives, nulls,
empty), while the physical plan stays free of ``Exchange
SinglePartition`` (the whole point — see test_plans.py for the
production-operator pins)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.banded import (
    banded_global_rank,
    banded_topk,
)


def _mk(spark, n=2000, seed=11, nulls=0):
    rng = random.Random(seed)
    # heavy ties: a few repeated values dominate, plus a uniform tail
    pool = [0.0, 0.0, 0.0, 1.0, 1.0, 2.0, 5.0, 5.0, -3.0]
    rows = [
        (f"id{i:06d}", float(rng.choice(pool) if rng.random() < 0.7
                             else rng.uniform(-10, 10)))
        for i in range(n)
    ]
    rows += [(f"nul{i:03d}", None) for i in range(nulls)]
    return spark.createDataFrame(rows, "id string, v double")


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("nulls", [0, 25])
def test_rank_bit_identical_to_global_window(spark, descending, nulls):
    df = _mk(spark, nulls=nulls)
    got = banded_global_rank(
        df, "v", ["id"], descending=descending, bands=16, rank_col="r"
    )
    order = [F.col("v").desc() if descending else F.col("v").asc(),
             F.col("id").asc()]
    want = df.withColumn("r", F.row_number().over(W.orderBy(*order)))
    joined = got.alias("a").join(want.alias("b"), "id")
    assert joined.filter(F.col("a.r") != F.col("b.r")).count() == 0
    assert got.count() == df.count()


@pytest.mark.parametrize("k", [1, 137, 10**6])
def test_topk_set_identical_to_window_cut(spark, k):
    df = _mk(spark)
    got = banded_topk(df, "v", ["id"], k, descending=True, bands=16)
    want = (
        df.withColumn(
            "r",
            F.row_number().over(W.orderBy(F.col("v").desc(), F.col("id"))),
        )
        .filter(F.col("r") <= k)
        .drop("r")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "id string, v double")
    assert banded_global_rank(empty, "v", ["id"], rank_col="r").count() == 0
    one = spark.createDataFrame([("a", 1.0)], "id string, v double")
    got = banded_global_rank(one, "v", ["id"], rank_col="r").collect()
    assert got[0]["r"] == 1
    # all-equal values: every row lands in one band, ranks still total
    flat = spark.createDataFrame(
        [(f"i{j}", 7.0) for j in range(50)], "id string, v double"
    )
    rs = banded_global_rank(flat, "v", ["id"], bands=8, rank_col="r")
    assert sorted(r["r"] for r in rs.collect()) == list(range(1, 51))


def test_bands_one_falls_back_to_single_band(spark):
    df = _mk(spark, n=100)
    got = banded_global_rank(df, "v", ["id"], bands=1, rank_col="r")
    want = df.withColumn(
        "r", F.row_number().over(W.orderBy(F.col("v").asc(), F.col("id")))
    )
    joined = got.alias("a").join(want.alias("b"), "id")
    assert joined.filter(F.col("a.r") != F.col("b.r")).count() == 0


def test_plan_free_of_single_partition_exchange(spark):
    import contextlib
    import io

    df = _mk(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        banded_topk(df, "v", ["id"], 100, bands=16).explain("formatted")
    assert "SinglePartition" not in buf.getvalue()
