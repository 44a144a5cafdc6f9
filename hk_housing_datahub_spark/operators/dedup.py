"""Deduplication operators — exact through approximate, all scale paths.

The reference's dedup is the exact PK-seen-set
(/root/reference/src/processors/agency/estates.py:87-93). A web-scale
training-data pipeline additionally needs *near*-dup detection; this module
provides the standard ladder:

- exact (normalized-hash groupBy)          — one shuffle, map-side combine
- n-gram Jaccard (inverted-index join)     — exact pairwise, oracle-able
- MinHash + LSH banding                    — sub-quadratic candidate gen
- SimHash (hamming-banded)                 — bit-level near-dup
- embedding cosine near-dup                — see similarity.py

Everything is built from JVM expressions (xxhash64, explode, groupBy); no
Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalize_text, tokens, word_shingles


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per lang: total docs vs distinct normalized fingerprints."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
        )
    )


def drop_exact_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fold_spoofs: bool = False,
) -> DataFrame:
    """Keep the lowest-id doc per normalized fingerprint (deterministic).
    ``fold_spoofs=True`` folds Unicode confusables (UTS #39 subset,
    functions/text.py fold_confusables) into the key first, so
    Cyrillic/Greek-homoglyph spoofs collapse onto their originals —
    same plan, one extra codegen translate()."""
    from pyspark.sql import Window as W

    from ..functions.text import fold_confusables

    t = F.col(text_col)
    if fold_spoofs:
        t = fold_confusables(t)
    w = W.partitionBy(fingerprint(t)).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct pairs — the inverted-index input."""
    return (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def _capped_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """(did, shingle, sz): the DF-capped inverted index with per-doc set
    sizes riding along — shared by the exact pair generator and the LSH
    candidate verifier so both measure Jaccard over the same
    informative-shingle universe."""
    from pyspark.sql import Window as W

    sh = _shingled(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        sh = sh.withColumn(
            "_df", F.count(F.lit(1)).over(W.partitionBy("shingle"))
        ).filter(F.col("_df") <= max_shingle_df).drop("_df")
    return sh.withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("did")))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via a shingle inverted index.

    Set sizes ride along as a per-doc window count BEFORE the self-join, so
    no cache and no join-back of a sizes table is needed (the size is
    functionally dependent on the doc id, so grouping by it is free); the
    identical-lineage self-join reuses one shuffle map stage. Output:
    (a, b, jaccard) with a < b, jaccard ≥ threshold.

    ``max_shingle_df`` is the standalone-at-scale guard: a stopword shingle
    ("of the x") appearing in k docs contributes k² join rows, so one hot
    posting list makes the self-join quadratic. Capping document frequency
    drops those shingles BEFORE set sizes are counted — Jaccard is then
    measured over the informative-shingle universe on both sides of the
    comparison (a standard trick: near-dup evidence lives in the rare
    shingles; ubiquitous ones carry no signal). None = exact mode, the
    verifier role for the MinHash-LSH candidates below.
    """
    sh = _capped_shingles(docs, id_col, text_col, n, max_shingle_df)
    co = (
        sh.alias("l")
        .join(sh.alias("r"), "shingle")
        .filter(F.col("l.did") < F.col("r.did"))
        .groupBy(
            F.col("l.did").alias("a"),
            F.col("r.did").alias("b"),
            F.col("l.sz").alias("sza"),
            F.col("r.sz").alias("szb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Directed containment pairs: (src, dst, containment) where
    containment = |shingles(src) ∩ shingles(dst)| / |shingles(src)| —
    Broder 1997's asymmetric resemblance. Catches what Jaccard
    structurally cannot: a short doc quoted wholesale inside a long one
    has containment ≈ 1 but Jaccard ≈ |short|/|long| ≈ 0, so
    quote-level duplication (syndicated paragraphs, scraped excerpts,
    license boilerplate) never crosses a symmetric threshold.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` — identical
    self-join and intersection aggregate (one shuffle pair), the two
    directions then derived from the ONE undirected intersection row
    (explode of two structs, no second join). ``max_shingle_df`` is the
    same hot-posting-list guard, and clipping it changes the measured
    universe identically for both operators."""
    sh = _capped_shingles(docs, id_col, text_col, n, max_shingle_df)
    co = (
        sh.alias("l")
        .join(sh.alias("r"), "shingle")
        .filter(F.col("l.did") < F.col("r.did"))
        .groupBy(
            F.col("l.did").alias("a"),
            F.col("r.did").alias("b"),
            F.col("l.sz").alias("sza"),
            F.col("r.sz").alias("szb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = co.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.round(F.col("inter") / F.col("sza"), 6).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.round(F.col("inter") / F.col("szb"), 6).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("p")
    )
    return both.select("p.src", "p.dst", "p.containment").filter(
        F.col("containment") >= threshold
    )


def _perm_hash(col: str, j: int, hash_mode: str) -> Column:
    """Permutation-``j`` 64-bit-ish hash of a string column.

    ``xxhash64`` (default everywhere) is the production path — JVM
    codegen, full 64 bits. ``md5_56`` is the engine-portable twin (the
    md5-prefix idiom of operators/importance.py / similarity.py): 56
    bits so the unsigned value fits a signed long under ANSI casts, and
    bit-replayable in DuckDB via ('0x' || substr(md5(..), 1, 14)) — the
    mode the driver's hash oracles run; same operator logic, portable
    hash."""
    from ..functions.hash56 import md5_long56

    if hash_mode == "xxhash64":
        return F.xxhash64(col, F.lit(j))
    if hash_mode == "md5_56":
        return md5_long56(F.concat(F.col(col), F.lit(f"#{j}")))
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """64-permutation MinHash signatures, fully JVM-side.

    Each "permutation" j is min(hash(shingle, j)) — one exploded pass,
    one groupBy with 64 min-aggregates (map-side combined, single shuffle).
    No Python: this is the 10^10-document scale path. ``hash_mode``:
    see _perm_hash (md5_56 = DuckDB-replayable oracle twin).
    """
    sh = _shingled(docs, id_col, text_col, n)
    aggs = [
        F.min(_perm_hash("shingle", j, hash_mode)).alias(f"h{j}")
        for j in range(num_perm)
    ]
    return sh.groupBy("did").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs by LSH banding over MinHash signatures.

    bands×rows = num_perm; a pair collides if any band's row-slice matches
    exactly. Band keys compress to one long (xxhash64 mode) or join as
    the plain '#'-separated min string (md5_56 mode — equality-exact
    either way, and the string form replays in SQL). Candidates are NOT
    verified here (compose with ngram_jaccard_pairs on the candidate
    set for verified output).
    """
    if not (0 < bands <= num_perm and num_perm % bands == 0):
        raise ValueError(
            f"bands must divide num_perm (got bands={bands}, "
            f"num_perm={num_perm}) — otherwise band keys silently hash "
            "fewer rows than requested, or zero rows (a constant key that "
            "collides everything into one O(n^2) bucket)"
        )
    rows = num_perm // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_perm, hash_mode)

    def band_key(b: int) -> Column:
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        if hash_mode == "xxhash64":
            return F.xxhash64(*cols)
        return F.concat_ws("#", *[c.cast("string") for c in cols])

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_key(b).alias("key"))
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "did", F.explode(band_structs).alias("bk")
    ).select("did", "bk.band", "bk.key")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "key"])
        .filter(F.col("l.did") < F.col("r.did"))
        .select(F.col("l.did").alias("a"), F.col("r.did").alias("b"))
        .distinct()
    )
    return pairs


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, hash_mode: str = "xxhash64") -> DataFrame:
    """``bits``-bit SimHash per document, JVM-side.

    Token hash bit votes: per bit i, sum(±1) over tokens; fingerprint bit i
    set iff the vote is positive. One explode + one groupBy with ``bits``
    sums. ``hash_mode='md5_56'`` (bits ≤ 56) is the DuckDB-replayable
    twin of the production xxhash64 path — same votes, portable hash.
    """
    if hash_mode == "md5_56" and bits > 56:
        raise ValueError("md5_56 provides 56 hash bits; lower `bits`")
    toks = docs.select(
        F.col(id_col).alias("did"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    from ..functions.hash56 import md5_long56

    if hash_mode == "xxhash64":
        h = F.xxhash64("tok")
    elif hash_mode == "md5_56":
        h = md5_long56(F.col("tok"))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    votes = toks.groupBy("did").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return votes.select("did", fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation by (max_hamming+1)-block banding over the
    ``bits`` fingerprint bits (pigeonhole: ≤ max_hamming differing bits
    cannot touch every block, so at least one block is equal), then
    exact hamming via bit_count(xor). Sub-quadratic; no Python. Recall
    is exact for ANY max_hamming because the block count is derived
    from it; more blocks = smaller keys = more candidate pairs to
    verify. ``hash_mode='md5_56'`` (with bits ≤ 56) is the
    DuckDB-replayable oracle twin.
    """
    n_blocks = max_hamming + 1
    if not 1 <= n_blocks <= bits:
        raise ValueError(
            f"max_hamming must be in [0, {bits - 1}], got {max_hamming}"
        )
    # split the bits into n_blocks contiguous runs, widths as even as possible
    base, extra = divmod(bits, n_blocks)
    widths = [base + (1 if b < extra else 0) for b in range(n_blocks)]
    offsets = [sum(widths[:b]) for b in range(n_blocks)]

    sig = simhash(docs, id_col, text_col, bits, hash_mode)
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                (
                    F.shiftright(F.col("simhash"), offsets[b]).bitwiseAND(
                        F.lit((1 << widths[b]) - 1)
                    )
                    if widths[b] < 64
                    else F.col("simhash")  # single 64-bit block (max_hamming=0)
                ).alias("key"),
            )
            for b in range(n_blocks)
        ]
    )
    banded = sig.select("did", "simhash", F.explode(blocks).alias("bk")).select(
        "did", "simhash", "bk.blk", "bk.key"
    )
    cands = (
        banded.alias("l")
        .join(banded.alias("r"), ["blk", "key"])
        .filter(F.col("l.did") < F.col("r.did"))
        .select(
            F.col("l.did").alias("a"),
            F.col("r.did").alias("b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node in the edge set — component = the
    minimum node id reachable (min-label propagation to fixpoint).

    The canonical near-dup post-step: similar-pair edges (from any of the
    dedup ladder's pair generators) → clusters → keep one document per
    cluster. Iterative DataFrame algorithm: each round joins labels to
    neighbors and takes the per-node min; rounds needed = graph diameter
    (tiny for near-dup clusters, which are cliques-ish). Each round is a
    co-partitioned equi-join + partial-min aggregate on the node key;
    lineage is cut per round with localCheckpoint so the plan stays O(1).
    The driver loop is bounded by ``max_iters`` and exits on convergence —
    the reference pattern for iterative algorithms on Spark (label
    propagation), not a driver-side row loop.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.localCheckpoint(eager=True)
    labels = (
        e.select(F.col("s").alias("n")).distinct().withColumn("lbl", F.col("n"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr = (
            e.join(labels, e["d"] == labels["n"])
            .select(F.col("s").alias("n"), F.col("lbl"))
        )
        # The changed-row count is OBSERVED during the round's checkpoint
        # materialization (old labels join back in, min(lbl) vs _old), so
        # one action per round advances the labels AND tests convergence —
        # no separate count job re-running the round's join.
        obs = Observation()
        new = (
            labels.unionByName(nbr)
            .groupBy("n")
            .agg(F.min("lbl").alias("lbl"))
            .join(labels.withColumnRenamed("lbl", "_old"), "n")
            .observe(
                obs,
                F.sum(
                    F.when(F.col("lbl") < F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("n", "lbl")
        ).localCheckpoint(eager=True)
        labels = new
        if int(obs.get["changed"] or 0) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "the graph diameter exceeds max_iters; returning here would be "
            "silently wrong (one true cluster split into several). Raise "
            "max_iters (rounds needed = diameter; near-dup clusters are "
            "usually dense, so this signals an unexpectedly chain-like graph)"
        )
    return labels.select(F.col("n").alias("node"), F.col("lbl").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the scale path when the graph is CHAIN-LIKE rather than
    clique-ish: rounds needed are O(log^2 n) in the worst case versus
    the graph DIAMETER for ``connected_components``'s min-label
    propagation (which raises on a diameter > max_iters graph by
    design). Same output contract: component = min reachable node id.

    Per round: large-star hangs every neighbor larger than u off
    min(N(u) ∪ {u}) (one node-keyed min-agg + join), small-star does
    the same for the smaller neighbors over (max, min)-oriented edges.
    Both are compact-key shuffles on the node id; lineage is cut per
    round with localCheckpoint. Convergence is detected on a cheap
    (count, xor-of-hashes) edge-set signature instead of a full
    exceptAll — one lightweight agg job per round."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.filter(F.col("u") != F.col("v"))
    nodes = (
        e.select(F.col("u").alias("n"))
        .union(e.select(F.col("v").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical orientation (big, small); self-loops out
    e = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)

    def _signature(ed: DataFrame) -> tuple[int, int]:
        row = ed.agg(
            F.count("*").alias("c"),
            F.coalesce(
                # xor-fold is order-independent — no sort, one partial agg
                F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return int(row["c"]), int(row["h"])

    def _large_star(ed: DataFrame) -> DataFrame:
        und = ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = und.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", "u").alias("m"))
        out = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    def _small_star(ed: DataFrame) -> DataFrame:
        o = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    sig = _signature(e)
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        nsig = _signature(e)
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds — beyond the O(log^2 n) bound, which signals a bug, "
            "not an input property"
        )
    # at the fixpoint every edge is (node, component-min); isolated-in-e
    # nodes (their whole component collapsed) label themselves
    labels = e.groupBy("u").agg(F.min("v").alias("lbl"))
    return (
        nodes.join(labels, nodes["n"] == labels["u"], "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce("lbl", "n").alias("component"),
        )
    )


def _components(pairs: DataFrame, cc_method: str) -> DataFrame:
    """Dispatch the transitive-closure step of every dedup composition:
    ``"label"`` = min-label propagation (rounds = diameter; right for the
    clique-ish clusters near-dup graphs produce), ``"star"`` = alternating
    large-star/small-star (O(log^2 n) rounds; the safe choice when the
    pair graph may be chain-like — template families, pagination chains).
    Identical output contract either way: (node, component=min id)."""
    if cc_method == "label":
        return connected_components(pairs)
    if cc_method == "star":
        return connected_components_star(pairs)
    raise ValueError(f"unknown cc_method {cc_method!r} (label|star)")


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
    cc_method: str = "label",
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): near-dup clusters from the exact
    Jaccard pairs, transitively closed; the minimum doc id of each cluster
    is its canonical representative (keep-lowest-id, matching
    drop_exact_dups' determinism); singletons are their own cluster."""
    pairs = ngram_jaccard_pairs(
        docs, id_col, text_col, threshold=threshold, max_shingle_df=max_shingle_df
    )
    cc = _components(pairs, cc_method)
    out = docs.select(F.col(id_col)).join(
        cc, docs[id_col] == cc["node"], "left"
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))


def drop_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
    cc_method: str = "label",
) -> DataFrame:
    """The end-user corpus dedup: keep exactly the canonical (lowest-id)
    document of every near-dup cluster, all columns preserved. Composes
    dedup_clusters' components with a broadcast semi-join of the canonical
    id set back onto the corpus — the dropped set is tiny relative to the
    corpus, so the join ships only cluster labels, never document text."""
    labels = dedup_clusters(
        docs, id_col, text_col, threshold, max_shingle_df, cc_method
    )
    keep = labels.filter(F.col("is_canonical")).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def verify_pairs_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
) -> DataFrame:
    """Exact (DF-capped) Jaccard computed ONLY for the given candidate
    pairs — the verification half of candidate-generate-then-verify.
    Joins the candidates into the inverted index instead of self-joining
    it, so cost is O(Σ shingles of candidate docs), never quadratic.
    Output: (a, b, jaccard) for candidates with jaccard ≥ threshold."""
    sh = _capped_shingles(docs, id_col, text_col, n, max_shingle_df)
    l = sh.select(
        F.col("did").alias("a"), "shingle", F.col("sz").alias("sza")
    )
    r = sh.select(
        F.col("did").alias("b"), "shingle", F.col("sz").alias("szb")
    )
    inter = (
        pairs.select("a", "b")
        .join(l, "a")
        .join(r, ["b", "shingle"])
        .groupBy("a", "b", "sza", "szb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    max_shingle_df: int | None = 50,
    cc_method: str = "label",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The documented 100-TB corpus-dedup path, composed end to end:
    MinHash+LSH banding generates candidate pairs sub-quadratically →
    each candidate is VERIFIED with its exact DF-capped Jaccard →
    verified edges close transitively (connected_components) → the
    lowest-id document of every cluster survives, all columns preserved.

    Equals the exact path (``drop_near_dups``) whenever LSH recall over
    the ≥threshold pairs is 1: with the default bands=32 (rows = 2), a
    true pair at Jaccard J escapes every band with probability
    (1-J²)^32 — ≤ 1.1e-4 at J = 0.5 and vanishing for real near-dups —
    while precision is exact because every candidate is verified. The
    driver oracle pins equality with the exact path's recursive-CTE twin
    on the test corpus; tests/test_dedup.py pins recall separately.
    """
    # Candidate generation and verification each rebuild the (did, shingle)
    # index from text. Measured: recomputing the explode inside each
    # branch's fused codegen stage beats caching one shared copy (the
    # cache pays a full materialization of the inverted index plus two
    # deserializing reads, and breaks the explode→partial-agg fusion) —
    # ~2× end-to-end. Keep the recompute.
    cands = minhash_lsh_pairs(
        docs, id_col, text_col, n, num_perm, bands, hash_mode
    )
    verified = verify_pairs_jaccard(
        docs, cands, id_col, text_col, n, threshold, max_shingle_df
    )
    cc = _components(verified, cc_method)
    labels = docs.select(F.col(id_col)).join(
        cc, docs[id_col] == cc["node"], "left"
    )
    keep = labels.filter(
        F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every token ``k``-gram, slide a
    window of ``w`` consecutive hashes, keep each window's MINIMUM.
    The selection guarantee fixed-stride shingle sampling cannot give:
    any shared passage of ≥ ``w + k − 1`` tokens produces at least one
    SHARED fingerprint, while the kept-fingerprint density stays ~2/(w+1)
    — local plagiarism/quotation detection at a fraction of full-shingle
    cost.

    Hashes are md5 hex strings by default (lexicographic min — portable
    across engines, so the DuckDB twin is exact);
    ``hash_mode='xxhash64'`` swaps in the JVM long hash (numeric min):
    same selection guarantee, ~5% cheaper in-row (measured — the k-gram
    string assembly dominates, not the hash), but the fingerprint
    narrows from a 32-char string to one long, which is what matters
    downstream: the inverted-index shuffle and the (fp → pair) join
    move 8-byte keys instead of 32-byte strings at 10^10 scale. The k-gram hashing, window minima and
    dedup all happen INSIDE the row as array expressions — the only
    shuffle is the caller's downstream use. Returns distinct (id, fp)
    with ``fp`` typed string (md5) or long (xxhash64)."""
    if hash_mode not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    toks = tokens(F.col(text_col))

    def gram_hash(g: Column) -> Column:
        return F.md5(g) if hash_mode == "md5" else F.xxhash64(g)

    empty_t = "array<string>" if hash_mode == "md5" else "array<bigint>"

    def fps(ts: Column) -> Column:
        n = F.size(ts)
        m = n - k + 1  # number of k-grams
        hs = F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(0))),
            lambda i: gram_hash(F.concat_ws(" ", F.slice(ts, i, k))),
        )
        nw = m - w + 1  # number of windows
        # classic MOSS short-document fallback: a doc with ≥1 k-gram but
        # fewer than w windows (k ≤ tokens < w+k−1) emits the single
        # minimum over ALL its k-gram hashes — without it short
        # duplicated documents have NO fingerprints and are invisible
        # to winnow_overlap_pairs; only docs under k tokens emit nothing
        return (
            F.when(m < 1, F.array().cast(empty_t))
            .when(nw < 1, F.array(F.array_min(hs)))
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(nw, F.lit(1))),
                        lambda j: F.array_min(F.slice(hs, j, w)),
                    )
                )
            )
        )

    arr = F.element_at(F.transform(F.array(toks), fps), 1)
    return docs.select(
        F.col(id_col), F.explode(arr).alias("fp")
    ).distinct()


def shared_key_pairs(
    fps: DataFrame,
    id_col: str,
    key_col: str,
    max_key_df: int | None = 50,
    min_shared: int = 1,
) -> DataFrame:
    """(a, b, n_shared) ordered pairs (a < b) of ids sharing ≥
    ``min_shared`` distinct keys — THE inverted-index pair join, shared
    by the winnowing operator and the CDC chunk-overlap operator. Keys
    with document frequency above ``max_key_df`` drop before the
    self-join (hot keys create quadratic join fan-out at web scale;
    genuinely-related pairs keep their rarer shared keys)."""
    from pyspark.sql import Window as W

    if max_key_df is not None:
        fps = (
            fps.withColumn(
                "_df", F.count(F.lit(1)).over(W.partitionBy(key_col))
            )
            .filter(F.col("_df") <= max_key_df)
            .drop("_df")
        )
    a = fps.select(F.col(id_col).alias("a"), key_col)
    b = fps.select(F.col(id_col).alias("b"), key_col)
    return (
        a.join(b, key_col)
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    max_fp_df: int | None = 50,
    min_shared: int = 1,
    hash_mode: str = "md5",
) -> DataFrame:
    """(a, b, n_shared) pairs of documents sharing ≥ ``min_shared``
    winnowing fingerprints — ordered pairs a < b. Same inverted-index
    plan as the Jaccard operator: fingerprints with document frequency
    above ``max_fp_df`` are dropped before the self-join (boilerplate
    minima would otherwise create quadratic hot keys at web scale; the
    cap bounds per-key join fan-out, and genuinely-overlapping pairs
    keep their rarer shared minima)."""
    fps = winnow_fingerprints(docs, id_col, text_col, k, w, hash_mode)
    return shared_key_pairs(
        fps, id_col, "fp", max_key_df=max_fp_df, min_shared=min_shared
    )
