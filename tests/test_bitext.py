"""Margin-based bitext mining (operators/similarity.py
bitext_margin_mine): hubness correction semantics, candidate-path
equivalence, and exact DuckDB parity on the embeddings table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.similarity import bitext_margin_mine


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_margin_demotes_hub_target(spark):
    """A 'hub' target roughly equidistant from every source has a high
    kNN denominator; a target that is distinctly close to ONE source
    wins that source despite a slightly lower raw cosine."""
    src = _vecs(
        spark,
        [
            (0, [1.0, 0.0, 0.2]),
            (1, [0.0, 1.0, 0.2]),
            (2, [0.7, 0.7, 0.2]),
        ],
    )
    tgt = _vecs(
        spark,
        [
            (10, [0.6, 0.6, 0.6]),   # hub: close to everything
            (11, [0.95, 0.05, 0.1]),  # aligned with src 0
            (12, [0.05, 0.95, 0.1]),  # aligned with src 1
        ],
    )
    out = {
        r.src_id: r.tgt_id
        for r in bitext_margin_mine(src, tgt, k=2, margin_threshold=0.0).collect()
    }
    assert out[0] == 11
    assert out[1] == 12


def test_threshold_filters_low_margin(spark):
    src = _vecs(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    tgt = _vecs(spark, [(10, [0.7, 0.7]), (11, [0.7, 0.7])])
    # both targets identical → margins ≈ 1 → a >1.0 threshold drops all
    assert (
        bitext_margin_mine(src, tgt, k=2, margin_threshold=1.0).count() == 0
    )
    assert (
        bitext_margin_mine(src, tgt, k=2, margin_threshold=0.5).count() == 2
    )


def test_candidates_path_matches_brute_on_full_cross(spark):
    src = _vecs(
        spark, [(i, [float((i * 7) % 5 + 1), float((i * 3) % 4 + 1), 1.0]) for i in range(6)]
    )
    tgt = _vecs(
        spark,
        [(100 + i, [float((i * 5) % 6 + 1), 2.0, float(i % 3 + 1)]) for i in range(5)],
    )
    brute = bitext_margin_mine(src, tgt, k=3, margin_threshold=0.0)
    cand = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    routed = bitext_margin_mine(
        src, tgt, k=3, margin_threshold=0.0, candidates=cand
    )
    assert sorted(map(tuple, brute.collect())) == sorted(
        map(tuple, routed.collect())
    )


def test_duckdb_parity_on_embeddings(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 10 == 0)
    tgt = emb.filter(F.col("vec_id") % 10 == 5)
    got = sorted(
        map(tuple, bitext_margin_mine(src, tgt, k=4, margin_threshold=1.0).collect())
    )
    want = sorted(
        duckdb.sql(
            f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM '{sf_small}/embeddings.parquet'),
        s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 10 = 0),
        t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 10 = 5),
        sc AS (SELECT src_id, tgt_id,
                      list_dot_product(sv, tv) /
                      (sqrt(list_dot_product(sv, sv)) *
                       sqrt(list_dot_product(tv, tv))) AS cs
               FROM s CROSS JOIN t),
        rk AS (SELECT *,
                      row_number() OVER (PARTITION BY src_id
                          ORDER BY cs DESC, tgt_id) AS rs,
                      row_number() OVER (PARTITION BY tgt_id
                          ORDER BY cs DESC, src_id) AS rt
               FROM sc),
        ks AS (SELECT src_id, avg(cs) AS ks FROM rk WHERE rs <= 4 GROUP BY 1),
        kt AS (SELECT tgt_id, avg(cs) AS kt FROM rk WHERE rt <= 4 GROUP BY 1),
        mg AS (SELECT r.src_id, r.tgt_id, r.cs,
                      r.cs / ((ks.ks + kt.kt) / 2) AS m
               FROM rk r JOIN ks USING (src_id) JOIN kt USING (tgt_id)),
        best AS (SELECT *, row_number() OVER (PARTITION BY src_id
                     ORDER BY round(m, 6) DESC, tgt_id) AS rb
                 FROM mg)
        SELECT src_id, tgt_id, round(cs, 6), round(m, 6)
        FROM best WHERE rb = 1 AND round(m, 6) > 1.0
        """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_zero_norm_vectors_and_duplicate_candidates_are_harmless(spark):
    """An all-zero embedding must not inject NaN cosines/margins (it is
    dropped up front), and a caller-supplied shortlist with duplicated
    pairs must mine identically to the deduplicated shortlist (no
    double-counting in the k-NN means)."""
    import math

    src = _vecs(
        spark,
        [
            (0, [1.0, 0.0, 0.2]),
            (1, [0.0, 1.0, 0.2]),
            (9, [0.0, 0.0, 0.0]),  # zero-norm source
        ],
    )
    tgt = _vecs(
        spark,
        [
            (100, [0.9, 0.1, 0.2]),
            (101, [0.1, 0.9, 0.2]),
            (200, [0.0, 0.0, 0.0]),  # zero-norm target
        ],
    )
    out = bitext_margin_mine(src, tgt, k=2, margin_threshold=0.0).collect()
    ids = {(r.src_id, r.tgt_id) for r in out}
    assert all(9 != s and t != 200 for s, t in ids)
    assert ids  # real pairs still mined
    assert all(
        math.isfinite(r.cos_sim) and math.isfinite(r.margin) for r in out
    )

    cand = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    doubled = cand.unionByName(cand).unionByName(cand.limit(3))
    clean = bitext_margin_mine(
        src, tgt, k=2, margin_threshold=0.0, candidates=cand
    )
    noisy = bitext_margin_mine(
        src, tgt, k=2, margin_threshold=0.0, candidates=doubled
    )
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, noisy.collect())
    )
