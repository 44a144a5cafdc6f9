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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
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
    # Hoist the norms out of the pair loop: each side's norm is computed once
    # per row BEFORE the cross join (identical doubles — same expression over
    # the same input — so the DuckDB oracle still hash-matches), leaving only
    # the dot product as per-pair work. Higher-order-function folds run
    # interpreted, so this cuts ~2/3 of the per-pair expression cost.
    v = vectors.withColumn("_nv", norm(_to_double(F.col(vec_col))))
    q = queries.withColumn("_nq", norm(_to_double(F.col(qvec_col))))
    joined = v.join(F.broadcast(q)).filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col).alias("nid"),
        F.round(
            dot(_to_double(F.col(qvec_col)), _to_double(F.col(vec_col)))
            / (F.col("_nq") * F.col("_nv")),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


LSH_SEED = 42


def md5_grid_values(prefix_rows: int, cols: int) -> np.ndarray:
    """(rows × cols) matrix of md5-derived values on the 1/1000 grid in
    [-1, 1]: val(r, d) = (md5("r#d")[:14 hex] % 2001 - 1000) / 1000 —
    the engine-portable pseudo-random source (DuckDB replays it as
    ('0x' || substr(md5(r || '#' || d), 1, 14))::BIGINT). Used by the
    md5 plane/centroid modes of the ANN operators so their candidate
    sets are hash-checkable; the Gaussian RandomState source stays the
    production default."""
    import hashlib

    out = np.empty((prefix_rows, cols), dtype=np.float64)
    for r in range(prefix_rows):
        for d in range(cols):
            h = int(
                hashlib.md5(f"{r}#{d}".encode()).hexdigest()[:14], 16
            )
            out[r, d] = (h % 2001 - 1000) / 1000.0
    return out


def hyperplane_signatures_udf(
    dim: int, n_tables: int, n_planes: int, plane_mode: str = "gauss"
):
    """Vectorized multi-table random-hyperplane signatures.

    Returns a pandas UDF: array<float> → array<long> of length n_tables; the
    t-th element packs that table's n_planes sign bits. Plane matrix is
    np.RandomState(LSH_SEED) — deterministic on every executor, no state to
    broadcast. Dense matmul over the Arrow batch is the one place a pandas
    UDF beats Column expressions (BLAS vs per-element codegen).
    ``plane_mode='md5_56'`` swaps the Gaussian planes for the md5-grid
    source (row index = table * n_planes + plane), which a DuckDB
    oracle can regenerate bit-for-bit — same signatures, same buckets.
    """
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sigs(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        if plane_mode == "md5_56":
            planes = md5_grid_values(n_tables * n_planes, dim)
        elif plane_mode == "gauss":
            planes = np.random.RandomState(LSH_SEED).standard_normal(
                (n_tables * n_planes, dim)
            )
        else:  # match _perm_hash: a typo must not silently fall back
            raise ValueError(f"unknown plane_mode {plane_mode!r}")
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for vecs in it:
            x = np.stack(vecs.to_numpy())  # (batch, dim)
            bits = (x @ planes.T) > 0  # (batch, tables*planes)
            bits = bits.reshape(len(x), n_tables, n_planes)
            packed = (bits * weights).sum(axis=2)  # (batch, tables)
            yield pd.Series(list(packed))

    return sigs


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_tables: int = 12,
    n_planes: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    plane_mode: str = "gauss",
    **_compat,
) -> DataFrame:
    """Approximate top-k: candidates = union over L hash tables of the
    query's bucket, then exact cosine rerank inside candidates.

    Recall ≈ 1-(1-p^m)^L with p = 1-θ/π; (L=12, m=5) gives ~0.8 recall@1 on
    near-orthogonal corpora while probing ~⅓ of it — tune (L, m) per data.
    At 10^9 vectors the (table, sig) equi-join replaces the cross product.
    """
    sig_udf = hyperplane_signatures_udf(dim, n_tables, n_planes, plane_mode)
    vb = vectors.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(sig_udf(F.col(vec_col))).alias("tbl", "sig"),
    )
    qb = queries.select(
        F.col(qid_col), F.col(qvec_col),
        F.posexplode(sig_udf(F.col(qvec_col))).alias("tbl", "sig"),
    )
    cands = (
        vb.join(F.broadcast(qb), ["tbl", "sig"])
        .filter(F.col(id_col) != F.col(qid_col))
        .select(qid_col, qvec_col, id_col, vec_col)
        .dropDuplicates([qid_col, id_col])
    )
    scored = cands.select(
        F.col(qid_col),
        F.col(id_col).alias("nid"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def fit_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = LSH_SEED,
) -> np.ndarray | None:
    """Fit IVF coarse centroids with spherical k-means (Lloyd's) on a
    bounded deterministic sample.

    Scale story: the sample is hash-selected then capped — at 10^9 vectors
    the driver pulls only ``sample_size`` rows (same strategy MLlib's
    k-means|| init uses); the O(sample × cells × iters) fit runs once on
    the driver and the resulting (cells × dim) matrix ships to executors
    inside the quantizer UDF closure. Deterministic: hash-based sample,
    seeded init, fixed iteration count.
    """
    frac_rank = F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003))
    sample = (
        vectors.select(F.col(vec_col).alias("v"), frac_rank.alias("_r"))
        .orderBy("_r", "v")
        .limit(sample_size)
        .collect()
    )
    if not sample:
        return None  # empty corpus → caller falls back to seeded centroids
    x = np.array([row["v"] for row in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    c = x[rs.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    if len(c) < n_cells:  # degenerate tiny corpus: pad with random units
        pad = rs.standard_normal((n_cells - len(c), dim))
        c = np.vstack([c, pad / np.linalg.norm(pad, axis=1, keepdims=True)])
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for k in range(n_cells):
            m = x[assign == k]
            if len(m):
                c[k] = m.sum(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def ivf_cell_udf(dim: int, n_cells: int, nprobe: int = 1, seed: int = LSH_SEED,
                 centroids: np.ndarray | None = None):
    """Vectorized IVF coarse quantizer: array<float> → the ``nprobe`` nearest
    centroid ids (by cosine). Pass fitted ``centroids`` (see
    ``fit_ivf_centroids``); falls back to seeded random unit vectors when
    None — deterministic on every executor either way (the fitted matrix
    rides in the UDF closure; no broadcast step to manage)."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        if centroids is not None:
            c = centroids
        else:
            c = np.random.RandomState(seed).standard_normal((n_cells, dim))
            c /= np.linalg.norm(c, axis=1, keepdims=True)
        for vecs in it:
            x = np.stack(vecs.to_numpy())  # (batch, dim)
            sims = x @ c.T  # norm(x) constant per row → argmax == cosine
            top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pd.Series(list(top))

    return cells


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qe",
    fit_centroids: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus partitioned into ``n_cells`` coarse cells (each
    vector indexed under its nearest centroid), each query probes its
    ``nprobe`` nearest cells, exact cosine rerank inside the probed cells.
    Centroids are k-means-fitted on a bounded sample by default
    (``fit_centroids=False`` reverts to the seeded-random quantizer).

    Scale path: probe cost ∝ nprobe/n_cells of the corpus; the (cell)
    equi-join shuffles co-partitioned by cell id — at 10^9 vectors, cells
    are also the natural storage partitioning (partitionBy("cell") on the
    index table makes the probe a partition-pruned scan, no shuffle).
    """
    # an explicit ``centroids`` matrix wins over fitting — the oracle
    # path passes the md5-grid literals so the DuckDB twin can replay
    # assignment; note the quantizer then ranks by RAW dot (the fit
    # path L2-normalizes its centroids, an explicit matrix ships as-is)
    cents = (
        centroids
        if centroids is not None
        else (
            fit_ivf_centroids(vectors, dim, n_cells, vec_col, id_col)
            if fit_centroids
            else None
        )
    )
    vcell = vectors.select(
        F.col(id_col), F.col(vec_col),
        F.explode(
            ivf_cell_udf(dim, n_cells, 1, centroids=cents)(F.col(vec_col))
        ).alias("cell"),
    )
    qcell = queries.select(
        F.col(qid_col), F.col(qvec_col),
        F.explode(
            ivf_cell_udf(dim, n_cells, nprobe, centroids=cents)(F.col(qvec_col))
        ).alias("cell"),
    )
    cands = (
        vcell.join(F.broadcast(qcell), "cell")
        .filter(F.col(id_col) != F.col(qid_col))
        .select(qid_col, qvec_col, id_col, vec_col)
        .dropDuplicates([qid_col, id_col])
    )
    scored = cands.select(
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


# ---------------------------------------------------------------------------
# EP3 search path: text-in → top-k neighbors out (sparse inverted index)
# ---------------------------------------------------------------------------

def sparse_text_weights(
    docs: DataFrame,
    id_col: str = "chunk_id",
    text_col: str = "chunk",
    dim: int = 256,
) -> DataFrame:
    """(id, idx, w): a signed hashed bag-of-tokens sparse vector per
    document, entirely JVM-side — the oracle-checkable stand-in encoder
    for the reference's SentenceTransformer (embedding.py:184-193; the
    real model drops into functions/embedding.py's iterator UDF, this
    sparse path exists so the SEARCH machinery itself is verifiable).

    Token → md5-derived 56-bit hash → bucket ``h % dim`` with a ±1 vote
    from the hash parity; per-(doc, bucket) votes sum to an INTEGER
    weight. Integer weights make every downstream dot product and norm an
    exact integer, so cosine scores are bit-identical on any engine that
    evaluates the same expression — the property the DuckDB twin relies
    on. This long-form (id, idx, w) layout IS the inverted index: scoring
    a query is an equi-join on ``idx``, never a scan of dense vectors.
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 14), 16, 10).cast("long")
    vote = F.when(F.pmod(h, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select("id", F.pmod(h, F.lit(dim)).alias("idx"), vote.alias("v"))
        .groupBy("id", "idx")
        .agg(F.sum("v").alias("w"))
    )


def search_similar(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "chunk_id",
    corpus_text: str = "chunk",
    query_id: str = "qid",
    query_text: str = "qtext",
    dim: int = 256,
    k: int = 5,
) -> DataFrame:
    """The reference's ``search_similar(query, n_results)``
    (/root/reference/src/processors/rag/embedding.py:290-307) as one
    composed operator: embed the query TEXT with the same encoder as the
    corpus, score by cosine, return the top-k neighbors per query as
    (qid, chunk_id, cos_sim, rnk).

    Plan shape (the 10^10-chunk story): corpus weights are the big side,
    partitioned by ``idx``; query weights are tiny and broadcast, so the
    scoring join ships no corpus data — each corpus partition scores its
    own postings and the only shuffle is the per-(query, chunk) partial
    dot-product combine. Norms ride the same weight frames. Top-k is a
    per-query window over candidates that share ≥1 index bucket with the
    query (sparse retrieval semantics: disjoint-support chunks score 0
    and are not candidates).
    """
    from pyspark.sql import Window as W

    # Norms ride the weight frames as per-id window sums, NOT separate
    # aggregates: a second aggregate would be a second consumer of the
    # weights lineage and re-run the upstream chunking UDF over the whole
    # corpus (verified in the plan: two ArrowEvalPython nodes); the window
    # costs one narrow shuffle of the integer weights instead.
    cw = sparse_text_weights(corpus, corpus_id, corpus_text, dim).withColumn(
        "cn2", F.sum(F.col("w") * F.col("w")).over(W.partitionBy("id"))
    )
    qw = (
        sparse_text_weights(queries, query_id, query_text, dim)
        .withColumn(
            "qn2", F.sum(F.col("w") * F.col("w")).over(W.partitionBy("id"))
        )
        .select(
            F.col("id").alias("qid"), "idx", F.col("w").alias("qw"), "qn2"
        )
    )
    scored = (
        cw.join(F.broadcast(qw), "idx")
        .groupBy("qid", "id")
        .agg(
            F.sum(F.col("w") * F.col("qw")).alias("dot"),
            F.first("cn2").alias("cn2"),  # constant within the (qid, id) group
            F.first("qn2").alias("qn2"),
        )
        .select(
            "qid",
            F.col("id").alias(corpus_id),
            (F.col("dot") / (F.sqrt("qn2") * F.sqrt("cn2"))).alias("_cs"),
        )
    )

    w = W.partitionBy("qid").orderBy(F.col("_cs").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", corpus_id, F.round("_cs", 6).alias("cos_sim"), "rnk")
    )


def bitext_margin_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin_threshold: float = 1.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """CCMatrix-style margin-based bitext mining (Artetxe & Schwenk
    2019): score every source embedding against target embeddings by
    the RATIO margin

        margin(x, y) = cos(x, y) / ((knn_x + knn_y) / 2)

    where ``knn_x`` is the mean cosine of x to its k nearest targets
    and ``knn_y`` the mean of y to its k nearest sources — the
    normalization that makes cross-lingual mining robust to hubness
    (a "hub" target close to everything gets a high denominator and
    stops winning every source). Returns one row per source — its
    best target by margin — filtered to ``margin > margin_threshold``:
    (src_id, tgt_id, cos_sim, margin).

    Plan shape: with ``candidates=None`` the pair space is the brute
    cross join — the exactness baseline, and the oracle twin. At 10^9
    embeddings pass ``candidates`` (src_id, tgt_id) from the LSH/IVF
    ladder above; scoring, the two k-NN means, and the final argmax then
    run over the candidate set only (CCMatrix does exactly this with
    FAISS shortlists — the margin denominator over the shortlist is the
    documented approximation). Per-side means are windows partitioned by
    one id (fan-out = shortlist size, never a global sort); norms hoist
    out of the pair loop as in brute_force_topk.
    """
    # zero-norm (all-zero) embeddings drop up front: their cosine is
    # 0/0 = NaN, and NaN margins silently vanish from (or pollute) the
    # ranked output — an unminable vector is better absent than NaN
    sv = (
        src.select(
            F.col(id_col).alias("src_id"),
            _to_double(F.col(vec_col)).alias("_sv"),
        )
        .withColumn("_sn", norm(F.col("_sv")))
        .filter(F.col("_sn") > 0)
    )
    tv = (
        tgt.select(
            F.col(id_col).alias("tgt_id"),
            _to_double(F.col(vec_col)).alias("_tv"),
        )
        .withColumn("_tn", norm(F.col("_tv")))
        .filter(F.col("_tn") > 0)
    )
    if candidates is None:
        pairs = sv.crossJoin(F.broadcast(tv))
    else:
        # a duplicated shortlist row would double-count its cosine in
        # both k-NN means (the rank windows would see the pair twice);
        # distinct() is one shuffle of the id-pair table only
        pairs = (
            candidates.select("src_id", "tgt_id")
            .distinct()
            .join(sv, "src_id")
            .join(tv, "tgt_id")
        )
    scored = pairs.select(
        "src_id",
        "tgt_id",
        (
            dot(F.col("_sv"), F.col("_tv")) / (F.col("_sn") * F.col("_tn"))
        ).alias("_cs"),
    )
    # The k-NN means are WINDOW aggregates over the same ranked frame —
    # not separate groupBys joined back — so the pair table streams
    # through three partition-exchanges (src-rank, tgt-rank + tgt-mean,
    # src-mean + argmax) in ONE linear plan: nothing is consumed twice,
    # so nothing needs persist() (an earlier draft cached the pair-scale
    # frame and leaked it for the application lifetime).
    ws = W.partitionBy("src_id").orderBy(F.col("_cs").desc(), F.col("tgt_id"))
    wt = W.partitionBy("tgt_id").orderBy(F.col("_cs").desc(), F.col("src_id"))
    ranked = scored.withColumn("_rs", F.row_number().over(ws)).withColumn(
        "_rt", F.row_number().over(wt)
    )
    wsp = W.partitionBy("src_id")
    wtp = W.partitionBy("tgt_id")
    margined = (
        ranked.withColumn(
            "_kt",
            F.avg(F.when(F.col("_rt") <= k, F.col("_cs"))).over(wtp),
        )
        .withColumn(
            "_ks",
            F.avg(F.when(F.col("_rs") <= k, F.col("_cs"))).over(wsp),
        )
        .select(
            "src_id",
            "tgt_id",
            "_cs",
            (F.col("_cs") / ((F.col("_ks") + F.col("_kt")) / F.lit(2.0))).alias(
                "_mg"
            ),
        )
    )
    wbest = W.partitionBy("src_id").orderBy(
        F.round("_mg", 6).desc(), F.col("tgt_id")
    )
    return (
        margined.withColumn("_rb", F.row_number().over(wbest))
        .filter((F.col("_rb") == 1) & (F.round("_mg", 6) > margin_threshold))
        .select(
            "src_id",
            "tgt_id",
            F.round("_cs", 6).alias("cos_sim"),
            F.round("_mg", 6).alias("margin"),
        )
    )
