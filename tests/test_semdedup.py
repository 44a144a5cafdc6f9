from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from hk_housing_datahub_spark.operators.semdedup import (
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def _np_semdedup(ids, X, k, iters, tau):
    """Pure-numpy replay of the published recipe with the module's
    deterministic choices (md5 seeds, lowest-cid ties, avg update,
    empty cluster keeps previous centroid, sim-ASC keep rank)."""
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    cents = X[order[:k]].astype(np.float64).copy()

    def cos(A, B):
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
        return An @ Bn.T

    for _ in range(iters):
        a = cos(X, cents).argmax(axis=1)
        cents = np.array(
            [
                X[a == c].mean(axis=0) if (a == c).any() else cents[c]
                for c in range(len(cents))
            ]
        )
    S = cos(X, cents)
    a = S.argmax(axis=1)
    csim = S[np.arange(len(X)), a]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    kept = np.ones(len(X), bool)
    for c in range(len(cents)):
        m = np.where(a == c)[0]
        o = m[np.lexsort((ids[m], csim[m]))]  # centroid_sim ASC, id ASC
        Sm = Xn[o] @ Xn[o].T
        for i in range(1, len(o)):
            if (Sm[i, :i] >= tau).any():
                kept[o[i]] = False
    return {
        int(ids[i]): (int(a[i]), float(csim[i]), bool(kept[i]))
        for i in range(len(ids))
    }


def test_semdedup_matches_numpy_model_on_corpus(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf.vec_id.to_numpy()
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    model = _np_semdedup(ids, X, k=4, iters=2, tau=0.3)
    got = semdedup(emb, k=4, iters=2, tau=0.3).collect()
    assert len(got) == len(ids)
    for r in got:
        mc, ms, mk = model[r["vec_id"]]
        assert r["cluster"] == mc
        assert abs(r["centroid_sim"] - ms) < 2e-6
        assert r["kept"] == mk


def test_assignment_margins_dwarf_fp_noise(spark, sf_small):
    """The cross-engine hash safety argument: the gap between the best
    and second-best centroid is orders of magnitude above double FP
    noise, so sum-order differences cannot flip an assignment."""
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    pdf = emb.toPandas()
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    cents = kmeans_fit(emb, k=4, iters=2)
    C = np.array(cents)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    S = np.sort(Xn @ Cn.T, axis=1)
    assert np.min(S[:, -1] - S[:, -2]) > 1e-6
    del ids


def test_keep_policy_prefers_least_typical(spark):
    """Two planted near-duplicates: the one FARTHER from its centroid
    (lower centroid_sim) survives, per the paper's keep rule."""
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.995, 0.1, 0.0, 0.0]  # cos(base, near) ≈ 0.995
    far = [0.0, 1.0, 0.0, 0.0]  # its own cluster
    # cos(far, other) = 0.6 < tau — same cluster, not duplicates
    rows = [(1, base), (2, near), (3, far), (4, [0.0, 0.6, 0.8, 0.0])]
    out = {
        r["vec_id"]: r.asDict()
        for r in semdedup(
            _vec_df(spark, rows), k=2, iters=1, tau=0.9
        ).collect()
    }
    assert out[1]["cluster"] == out[2]["cluster"]
    dup = [out[1], out[2]]
    keptrow = [d for d in dup if d["kept"]]
    droprow = [d for d in dup if not d["kept"]]
    assert len(keptrow) == 1 and len(droprow) == 1
    # the kept one is the less-typical (lower centroid_sim)
    assert keptrow[0]["centroid_sim"] <= droprow[0]["centroid_sim"]
    # the other cluster's dissimilar pair both survive (cos < tau)
    assert out[3]["kept"] and out[4]["kept"]


def test_emptied_cluster_keeps_previous_centroid(spark):
    """k larger than the number of natural groups: some cluster empties
    during Lloyd's; the fit must carry its previous centroid forward
    (not crash or emit NULLs) and still label every row."""
    rows = [(i, [1.0 + 0.001 * i, 0.0]) for i in range(6)]
    cents = kmeans_fit(_vec_df(spark, rows), k=4, iters=2)
    assert len(cents) == 4
    assert all(len(c) == 2 and all(map(math.isfinite, c)) for c in cents)
    out = semdedup(_vec_df(spark, rows), k=4, iters=2, tau=0.99).collect()
    assert len(out) == 6
    assert all(r["cluster"] is not None for r in out)


def test_semdedup_deterministic(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in semdedup(emb, k=4, iters=2, tau=0.3).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in semdedup(emb, k=4, iters=2, tau=0.3).collect()
    )
    assert a == b


def test_plan_has_no_cartesian_and_assignment_is_literal(spark, sf_small):
    """Scale shape: the final plan must contain no CartesianProduct —
    assignment is a map-only projection against literal centroids, and
    the intra-cluster pair join is an equi-join on cluster id."""
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    plan = semdedup(emb, k=4, iters=1, tau=0.3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_precomputed_centroids_skip_fit(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    out = semdedup(
        _vec_df(spark, rows),
        tau=0.5,
        centroids=[[1.0, 0.0], [0.0, 1.0]],
    ).collect()
    assert {r["vec_id"]: r["cluster"] for r in out} == {1: 0, 2: 1}
    assert all(r["kept"] for r in out)


@pytest.mark.parametrize("k,iters", [(2, 1), (4, 3)])
def test_assign_labels_every_row(spark, sf_small, k, iters):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").limit(40)
    cents = kmeans_fit(emb, k=k, iters=iters)
    got = kmeans_assign(emb, cents)
    assert got.count() == 40
    assert got.filter("cluster < 0 or cluster >= %d" % k).count() == 0
