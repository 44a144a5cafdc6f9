from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.sketches import (
    merge_sketch_stats,
    sketch_report,
    sketch_stats,
    update_sketch_table,
)


def _captures(spark, n, offset=0):
    """Deterministic capture batch: hosts h0..h4, urls recycle mod 211
    within a host, page bytes uniform-ish 1..1000."""
    return spark.range(offset, offset + n).select(
        F.concat(F.lit("h"), F.pmod("id", F.lit(5))).alias("host"),
        F.concat(
            F.lit("https://h"), F.pmod("id", F.lit(5)),
            F.lit(".example.com/p/"), F.pmod(F.col("id") * 13, F.lit(211)),
        ).alias("url_canon"),
        (F.pmod(F.col("id") * 7919, F.lit(1000)) + 1).alias("nbytes"),
    )


def _stats(df, **kw):
    return sketch_stats(
        df,
        keys=["host"],
        distinct_cols={"urls": "url_canon"},
        quantile_cols={"nbytes": "nbytes"},
        **kw,
    )


def test_estimates_close_to_exact(spark):
    caps = _captures(spark, 4000)
    rep = {
        r["host"]: r.asDict()
        for r in sketch_report(_stats(caps)).collect()
    }
    exact = {
        r["host"]: r.asDict()
        for r in caps.groupBy("host")
        .agg(
            F.countDistinct("url_canon").alias("d"),
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(nbytes, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(rep) == {"h0", "h1", "h2", "h3", "h4"}
    for h, e in exact.items():
        assert rep[h]["n_captures"] == e["n"]  # counts are exact
        # HLL lg_k=12 → ~1.6% stderr; allow 5%
        assert abs(rep[h]["urls_distinct"] - e["d"]) <= max(3, 0.05 * e["d"])
        # KLL k=200 → ~1.7% rank error on a 1..1000 uniform-ish range
        assert abs(rep[h]["nbytes_p50"] - e["p50"]) <= 60


def test_merge_equals_single_pass_hll(spark):
    """Per-wave sketches unioned == one sketch over all waves' data:
    HLL register-max is order/grouping-insensitive, so the incremental
    state IS the batch answer (same estimate, not merely close)."""
    w1, w2, w3 = (
        _captures(spark, 1500, 0),
        _captures(spark, 1500, 1500),
        _captures(spark, 1000, 3000),
    )
    merged = merge_sketch_stats(_stats(w1), _stats(w2), _stats(w3))
    single = _stats(w1.unionByName(w2).unionByName(w3))
    m = {r["host"]: r.asDict() for r in sketch_report(merged).collect()}
    s = {r["host"]: r.asDict() for r in sketch_report(single).collect()}
    assert set(m) == set(s)
    for h in m:
        assert m[h]["urls_distinct"] == s[h]["urls_distinct"]
        assert m[h]["n_captures"] == s[h]["n_captures"]


def test_merge_associative_and_commutative(spark):
    a, b, c = (
        _stats(_captures(spark, 700, 0)),
        _stats(_captures(spark, 700, 700)),
        _stats(_captures(spark, 700, 1400)),
    )
    left = merge_sketch_stats(merge_sketch_stats(a, b), c)
    right = merge_sketch_stats(c, merge_sketch_stats(b, a))
    lv = {r["host"]: r.asDict() for r in sketch_report(left).collect()}
    rv = {r["host"]: r.asDict() for r in sketch_report(right).collect()}
    for h in lv:
        assert lv[h]["urls_distinct"] == rv[h]["urls_distinct"]
        assert lv[h]["n_captures"] == rv[h]["n_captures"]
        # KLL merge-tree shape may differ → bound, not bit equality
        assert abs(lv[h]["nbytes_p50"] - rv[h]["nbytes_p50"]) <= 60


def test_kll_merge_does_not_double_weight_first_wave(spark):
    """Two equal-size waves with disjoint value ranges: the merged
    median sits at the range boundary. A fold that seeded with sketch 1
    AND folded it again would double wave 1's weight and pull the
    median to ~rank 1/3 (≈ value 750) — pin that it doesn't."""
    lo = spark.range(2000).select(
        F.lit("h").alias("host"),
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        (F.col("id") % 1000 + 1).alias("nbytes"),  # 1..1000
    )
    hi = spark.range(2000).select(
        F.lit("h").alias("host"),
        F.concat(F.lit("v"), F.col("id")).alias("url_canon"),
        (F.col("id") % 1000 + 1001).alias("nbytes"),  # 1001..2000
    )
    merged = merge_sketch_stats(_stats(lo), _stats(hi))
    p50 = sketch_report(merged).collect()[0]["nbytes_p50"]
    assert 900 <= p50 <= 1100, p50


def test_sketch_stats_single_exchange(spark):
    """The wave pass is one partial-aggregate exchange on the group
    keys — sketches combine map-side like any sum; the raw url strings
    never shuffle beyond the compact (key, partial-state) rows."""
    plan = _stats(_captures(spark, 100))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_update_sketch_table_incremental_equals_batch(spark):
    from hk_housing_datahub_spark.sources import TableCatalog

    w1, w2 = _captures(spark, 1200, 0), _captures(spark, 1200, 1200)
    with tempfile.TemporaryDirectory(prefix="hk_sketch_cat_") as d:
        cat = TableCatalog(spark, d)
        update_sketch_table(cat, "crawl_sketches", _stats(w1))
        update_sketch_table(cat, "crawl_sketches", _stats(w2))
        got = {
            r["host"]: r.asDict()
            for r in sketch_report(cat.read("crawl_sketches")).collect()
        }
    want = {
        r["host"]: r.asDict()
        for r in sketch_report(_stats(w1.unionByName(w2))).collect()
    }
    assert set(got) == set(want)
    for h in want:
        assert got[h]["urls_distinct"] == want[h]["urls_distinct"]
        assert got[h]["n_captures"] == want[h]["n_captures"]
        assert abs(got[h]["nbytes_p50"] - want[h]["nbytes_p50"]) <= 60


def test_all_null_quantile_group_reports_null_not_crash(spark):
    """A host whose measured column is NULL in every capture yields an
    empty KLL buffer; report and merge must yield NULL quantiles for
    it, not KLL_INVALID_INPUT_SKETCH_BUFFER."""
    caps = spark.createDataFrame(
        [("h1", "u1", 5), ("h1", "u2", 9), ("h2", "u3", None)],
        ["host", "url_canon", "nbytes"],
    )
    s = _stats(caps)
    rep = {r["host"]: r.asDict() for r in sketch_report(s).collect()}
    assert rep["h1"]["nbytes_p50"] is not None
    assert rep["h2"]["nbytes_p50"] is None
    assert rep["h2"]["urls_distinct"] == 1  # HLL side unaffected
    # merging two all-NULL waves stays NULL; merging with a measured
    # wave recovers the measured sketch
    merged_null = merge_sketch_stats(s, _stats(caps))
    rep2 = {
        r["host"]: r.asDict() for r in sketch_report(merged_null).collect()
    }
    assert rep2["h2"]["nbytes_p50"] is None
    assert rep2["h1"]["n_captures"] == 4
    measured = spark.createDataFrame(
        [("h2", "u9", 100)], ["host", "url_canon", "nbytes"]
    )
    rep3 = {
        r["host"]: r.asDict()
        for r in sketch_report(
            merge_sketch_stats(s, _stats(measured))
        ).collect()
    }
    assert rep3["h2"]["nbytes_p50"] == 100


def test_subpercent_quantile_labels_do_not_collide(spark):
    caps = _captures(spark, 500)
    rep = sketch_report(_stats(caps), quantiles=(0.29, 0.99, 0.999))
    assert [c for c in rep.columns if c.startswith("nbytes_")] == [
        "nbytes_p29", "nbytes_p99", "nbytes_p99_9",
    ]
    assert len(set(rep.columns)) == len(rep.columns)


def test_merge_rejects_unmergeable_columns(spark):
    import pytest

    s = _stats(_captures(spark, 100)).withColumn("n_links", F.lit(1))
    with pytest.raises(ValueError, match="n_links"):
        merge_sketch_stats(s, s)
