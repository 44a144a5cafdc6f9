"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): k-means-cluster the
corpus embeddings, then inside each cluster drop every document whose
cosine similarity to a *keep-preferred* earlier document exceeds a
threshold. Keep preference follows the paper: among semantic duplicates
the example with the LOWEST similarity to its cluster centroid survives
(the most "atypical" representative), so items are ranked centroid-sim
ascending and an item is dropped when any lower-ranked item in its
cluster is within ``tau``.

This is the embedding-space rung of the dedup ladder
(``operators/dedup.py`` covers exact / MinHash-LSH / SimHash /
n-gram-Jaccard; ``operators/spandedup.py`` covers duplicated spans) —
the reference engine has no embedding-space dedup at all, so the
semantic target here is the published recipe, not a reference file.

Scale design (the paper runs this at 10^8..10^9 documents):

- **Lloyd's iterations are fully distributed.** Per iteration the only
  shuffle is the centroid update — a ``groupBy(cluster, pos)`` average
  whose key space is ``k × dim`` (compact, map-side combined). The
  ASSIGNMENT step is map-only: the k×dim centroid matrix (a few KB for
  the coarse k used here, a few MB at the paper's k≈10^5) is collected
  to the driver once per iteration and inlined as literal columns, so
  every executor scores vectors against it inside whole-stage codegen —
  no n×k explode, no shuffle, no Python.
- **Pairwise similarity is confined to clusters.** The self-join keys
  on cluster id (one exchange, AQE-sized); cost is O(sum c_i^2). k is
  the knob that bounds cluster size — the paper scales k with n so
  c ≈ n/k stays ~10^3..10^4 per cluster regardless of corpus size.
- **Cross-engine determinism.** Seeds are the k vectors with the
  smallest ``md5(vec_id)`` (both engines agree on md5 hex), dot
  products fold sequentially in array order (``F.aggregate`` here,
  ``list_dot_product`` in the DuckDB twin), ties break on lowest
  cluster id, and the iteration count is fixed — so the unrolled SQL
  twin replays the identical arithmetic. Centroid averages sum floats
  in shuffle-arrival order, but assignment margins are orders of
  magnitude above FP noise (asserted in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot_lit(vec: Column, cent: list[float]) -> Column:
    """<vec, cent> folded sequentially in array order (matches DuckDB's
    list_dot_product evaluation order bit-for-bit on doubles)."""
    prods = F.zip_with(
        vec, F.array(*[F.lit(float(x)) for x in cent]), lambda a, b: a * b
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _vnorm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _dot_cols(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """struct(sim, negcid) of the best (max-cosine, tie → lowest cid)
    centroid, as one codegen projection — map-only, no explode."""
    vn = _vnorm(vec)
    entries = []
    for cid, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c))  # sequential, like the twin
        sim = _dot_lit(vec, c) / (vn * F.lit(cn))
        entries.append(
            F.struct(sim.alias("sim"), F.lit(-cid).alias("negcid"))
        )
    return F.array_max(F.array(*entries))


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's over the FULL corpus (contrast
    ``similarity.fit_ivf_centroids``, which fits on a bounded driver
    sample): seeds = the k vectors with the smallest md5(id); each
    iteration assigns map-only against literal centroids and updates
    via one compact-key (cluster, pos) average. Returns the k×dim
    centroid list (raw averages — cosine assignment is scale-invariant,
    so no renormalization step to mismatch)."""
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    seed_rows = (
        v.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kmeans_fit: empty vector table")
    cents: list[list[float]] = [list(r["_v"]) for r in seed_rows]
    for _ in range(iters):
        best = _assign_expr(F.col("_v"), cents)
        # the struct-field extraction must NOT share a select with the
        # posexplode generator: the generator rewrite canonicalizes the
        # literal struct's field names away (FIELD_NOT_FOUND on negcid)
        assigned = v.select(
            (-best["negcid"]).alias("_cid"), F.col("_v")
        ).select("_cid", F.posexplode("_v"))
        rows = (
            assigned.groupBy("_cid", "pos")
            .agg(F.avg("col").alias("av"))
            .groupBy("_cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "av"))),
                    lambda s: s["av"],
                ).alias("c")
            )
            .collect()
        )
        newc = {int(r["_cid"]): list(r["c"]) for r in rows}
        # an emptied cluster keeps its previous centroid (twin: coalesce)
        cents = [newc.get(cid, cents[cid]) for cid in range(len(cents))]
    return cents


def kmeans_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster, centroid_sim) — map-only projection."""
    v = vectors.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    best = _assign_expr(F.col("_v"), centroids)
    return v.select(
        F.col(id_col),
        F.col("_v"),
        (-best["negcid"]).cast("int").alias("cluster"),
        best["sim"].alias("centroid_sim"),
    )


def semdedup(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Every input row tagged (cluster, centroid_sim, kept). ``kept`` is
    False iff some same-cluster item with LOWER centroid similarity
    (tie → lower id) is within cosine ``tau`` — the paper's
    keep-the-least-typical policy, decided against the full cluster
    (no cascade: a dropped item still convicts later items, which is
    exactly the upper-triangular matrix rule of the paper's impl)."""
    if centroids is None:
        centroids = kmeans_fit(vectors, k, iters, id_col, vec_col)
    a = kmeans_assign(vectors, centroids, id_col, vec_col)
    rnk = W.partitionBy("cluster").orderBy(
        F.col("centroid_sim").asc(), F.col(id_col).asc()
    )
    ranked = a.withColumn("rnk", F.row_number().over(rnk))
    lo = ranked.select(
        F.col("cluster").alias("_cl"),
        F.col("rnk").alias("_rnk"),
        F.col("_v").alias("_vlo"),
    )
    drops = (
        ranked.alias("hi")
        .join(
            lo,
            (F.col("_cl") == F.col("hi.cluster"))
            & (F.col("_rnk") < F.col("hi.rnk")),
        )
        .filter(
            _dot_cols(F.col("_vlo"), F.col("hi._v"))
            / (_vnorm(F.col("_vlo")) * _vnorm(F.col("hi._v")))
            >= F.lit(tau)
        )
        .select(F.col(f"hi.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        ranked.join(drops, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.round("centroid_sim", 6).alias("centroid_sim"),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )
