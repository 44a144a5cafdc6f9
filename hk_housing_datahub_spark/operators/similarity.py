"""Similarity search over embedding columns (array<float>).

Rebuild of the reference's ChromaDB top-k ANN
(/root/reference/src/processors/rag/embedding.py:290-307, n_results=5) as
DataFrame ops:

- brute-force cosine top-k — the exact baseline; one broadcast of the query
  set, dot products via zip_with/aggregate (JVM, codegen), ranking window.
- LSH-bucketed ANN — random-hyperplane signatures (deterministic planes via
  xxhash64 of (dim, plane)), bucket equi-join, rerank inside buckets; the
  10^9-vector scale path (probe cost ∝ bucket size, not corpus size).

Cosine is computed in double precision with a sequential left-fold
(F.aggregate) so the DuckDB oracle (list_dot_product on DOUBLE[]) agrees to
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc, id asc tiebreak).

    The query side broadcasts (it is small by construction); the corpus side
    streams — no shuffle of the vectors, one ranking window on qid.
    """
    joined = vectors.join(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(qid_col)
    )
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col).alias("nid"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = 16
) -> Column:
    """Random-hyperplane LSH bucket id (n_planes sign bits → one long).

    Plane weights are deterministic pseudo-randoms: w[p][d] =
    (xxhash64(p*dim+d) % 2001 - 1000) — fixed for any run/cluster size, no
    RNG state to ship. All JVM expressions.
    """
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        terms = [
            F.element_at(vec_col, d + 1).cast("double")
            * ((F.xxhash64(F.lit(p * dim + d)) % 2001) - 1000).cast("double")
            for d in range(dim)
        ]
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(F.shiftleft(bit, p))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
) -> DataFrame:
    """Approximate top-k: compare only within the query's hyperplane bucket.

    Recall < 1 by design; pytest checks recall against brute force. At scale
    the bucket join replaces the full cross product: cost ∝ Σ bucket².
    """
    vb = vectors.withColumn("bucket_sig", hyperplane_signature(F.col(vec_col), dim, n_planes))
    qb = queries.withColumn("bucket_sig", hyperplane_signature(F.col(qvec_col), dim, n_planes))
    joined = vb.join(F.broadcast(qb), "bucket_sig").filter(
        F.col(id_col) != F.col(qid_col)
    )
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col).alias("nid"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, blocked by label partition.

    Blocking on a cheap pre-key (here the cluster label; in production a
    coarse LSH bucket) keeps the pair join sub-quadratic.
    """
    l = vectors.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col(label_col).alias("lbl")
    )
    r = vectors.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col(label_col).alias("lbl")
    )
    return (
        l.join(r, "lbl")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )
