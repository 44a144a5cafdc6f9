"""Dedup ladder properties: LSH recall vs the exact Jaccard oracle,
SimHash symmetry/sanity, exact dedup correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/documents.parquet").cache()


def test_exact_dedup_drops_only_dups(spark, docs):
    kept = DD.drop_exact_dups(docs)
    stats = DD.exact_dedup_stats(docs).collect()
    assert kept.count() == sum(r["n_distinct"] for r in stats)
    # deterministic: lowest doc_id kept per fingerprint
    kept2 = DD.drop_exact_dups(docs)
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in kept2.collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark, docs):
    """With 64 perms / 16 bands (r=4), P[collide | j=0.8] = 1-(1-0.8^4)^16
    ≈ 0.9997 — every j≥0.8 pair must appear among LSH candidates here."""
    exact = {
        (r.a, r.b)
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    cands = {(r.a, r.b) for r in DD.minhash_lsh_pairs(docs).collect()}
    assert exact, "test corpus should contain near-dup pairs"
    missed = exact - cands
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_minhash_identical_docs_always_collide(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words entirely here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.a, r.b) for r in DD.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_pairs_are_exact_dups_superset(spark, docs):
    """Exact duplicates have hamming 0 → must be found by simhash blocking."""
    exact = {
        (r.a, r.b)
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.999).collect()
    }
    sh = {(r.a, r.b) for r in DD.simhash_pairs(docs, max_hamming=3).collect()}
    assert exact <= sh
    for r in DD.simhash_pairs(docs, max_hamming=3).collect():
        assert 0 <= r.hamming <= 3


def test_jaccard_bounds(spark, docs):
    for r in DD.ngram_jaccard_pairs(docs, threshold=0.5).collect():
        assert 0.5 <= r.jaccard <= 1.0
        assert r.a < r.b


def test_connected_components_chain_and_singleton(spark):
    from hk_housing_datahub_spark.operators.dedup import connected_components

    # a chain 1-2-3-4 (diameter 3), a pair 10-11, plus node 20 only via 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21)], "a long, b long"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_canonical_per_cluster(spark, sf_med):
    import os
    from hk_housing_datahub_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet(os.path.join(sf_med, "documents.parquet"))
    out = dedup_clusters(docs, threshold=0.5, max_shingle_df=50).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1
        assert canon[0].doc_id == cid == min(r.doc_id for r in rows)
    assert len(out) == docs.count()  # every doc labeled, singletons included


def test_drop_near_dups_keeps_exactly_canonicals(spark, sf_med):
    import os
    from hk_housing_datahub_spark.operators.dedup import (
        dedup_clusters,
        drop_near_dups,
    )

    docs = spark.read.parquet(os.path.join(sf_med, "documents.parquet"))
    kept = drop_near_dups(docs)
    labels = dedup_clusters(docs)
    canon = {r.doc_id for r in labels.filter("is_canonical").collect()}
    assert {r.doc_id for r in kept.collect()} == canon
    assert kept.columns == docs.columns  # all columns preserved
    assert kept.count() == labels.select("cluster_id").distinct().count()


def test_connected_components_raises_without_convergence(spark):
    import pytest as _pytest
    from hk_housing_datahub_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    # and converges fine with enough rounds
    got = connected_components(chain, max_iters=12).collect()
    assert {r.component for r in got} == {0}


def test_verified_lsh_candidates_subset_of_exact_pairs(spark, docs):
    """verify_pairs_jaccard over LSH candidates produces pairs with the
    SAME jaccard values as the exact generator (shared capped index) and
    never a pair the exact path lacks (verification = exact precision)."""
    exact = {
        (r.a, r.b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=50
        ).collect()
    }
    cands = DD.minhash_lsh_pairs(docs, bands=32)
    verified = {
        (r.a, r.b): r.jaccard
        for r in DD.verify_pairs_jaccard(
            docs, cands, threshold=0.5, max_shingle_df=50
        ).collect()
    }
    assert set(verified) <= set(exact)
    for pair, j in verified.items():
        assert j == exact[pair]


def test_minhash_lsh_dedup_equals_exact_path(spark, docs):
    """The composed candidate→verify→cluster→drop operator lands on the
    exact path's survivor set (recall 1 at bands=32 on this corpus)."""
    got = {r.doc_id for r in DD.minhash_lsh_dedup(docs).select("doc_id").collect()}
    want = {
        r.doc_id
        for r in DD.drop_near_dups(docs, threshold=0.5, max_shingle_df=50)
        .select("doc_id")
        .collect()
    }
    assert got == want


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    return {n: min(groups[find(n)]) for n in nodes}


@pytest.mark.parametrize(
    "name,edges",
    [
        ("chain", [(i, i + 1) for i in range(60)]),
        (
            "clique_plus_pair",
            [(i, j) for i in range(10) for j in range(i + 1, 10)]
            + [(100, 101)],
        ),
        (
            "two_chains",
            [(i, i + 1) for i in range(0, 20)]
            + [(i, i + 1) for i in range(40, 55)],
        ),
        ("self_loops_and_dups", [(1, 2), (2, 1), (3, 3), (2, 3), (9, 9)]),
    ],
)
def test_star_components_match_union_find(spark, name, edges):
    edges_clean = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    want = _uf_components(edges_clean, nodes)
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {
        r["node"]: r["component"]
        for r in DD.connected_components_star(df).collect()
    }
    # pure self-loop nodes (3,3)/(9,9) never form an inter-node edge:
    # the operator drops them up front like connected_components does
    want = {n: c for n, c in want.items() if n in got}
    assert got == want


def test_star_components_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(11)
    for trial in range(3):
        edges = [
            (rng.randrange(40), rng.randrange(40)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        want = _uf_components(edges, nodes)
        df = spark.createDataFrame(edges, "a bigint, b bigint")
        got = {
            r["node"]: r["component"]
            for r in DD.connected_components_star(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_star_handles_chain_beyond_propagation_bound(spark):
    """The scale motivation: a 60-node chain exceeds min-label
    propagation's 10-round budget (it raises, by its documented
    contract) while the star method converges in O(log^2 n) rounds."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "a bigint, b bigint"
    )
    with pytest.raises(RuntimeError):
        DD.connected_components(df, max_iters=10)
    got = DD.connected_components_star(df).collect()
    assert len(got) == 61
    assert {r["component"] for r in got} == {0}


def test_cc_method_star_matches_label_through_compositions(spark, docs):
    """cc_method="star" must be a pure strategy swap: identical survivor
    sets from both compositions on the real test corpus (clique-ish
    graph) — the only difference is round complexity, not output."""
    lab = {r.doc_id for r in DD.drop_near_dups(docs).select("doc_id").collect()}
    star = {
        r.doc_id
        for r in DD.drop_near_dups(docs, cc_method="star")
        .select("doc_id")
        .collect()
    }
    assert lab == star
    lab_l = {
        r.doc_id
        for r in DD.minhash_lsh_dedup(docs).select("doc_id").collect()
    }
    star_l = {
        r.doc_id
        for r in DD.minhash_lsh_dedup(docs, cc_method="star")
        .select("doc_id")
        .collect()
    }
    assert lab_l == star_l


def test_cc_method_rejects_unknown(spark, docs):
    with pytest.raises(ValueError, match="cc_method"):
        DD._components(
            spark.createDataFrame([(1, 2)], "a bigint, b bigint"), "bogus"
        )


def test_containment_catches_quote_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = (
        short
        + " "
        + " ".join(f"filler{i} unique{i} word{i}" for i in range(30))
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different text entirely here")],
        ["doc_id", "text"],
    )
    cont = {
        (r.src, r.dst): r.containment
        for r in DD.ngram_containment_pairs(df, threshold=0.5).collect()
    }
    # every shingle of the short doc appears in the long one
    assert cont[(1, 2)] == 1.0
    assert (2, 1) not in cont  # long doc is NOT contained in the short
    assert (3, 2) not in cont and (3, 1) not in cont
    # symmetric Jaccard stays under any useful threshold for this pair
    jac = DD.ngram_jaccard_pairs(df, threshold=0.05).collect()
    assert all(r.jaccard < 0.5 for r in jac if {r.a, r.b} == {1, 2})


def test_containment_direction_pairs_share_one_intersection(spark):
    # identical docs contain each other at exactly 1.0 both ways
    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "one two three four five")],
        ["doc_id", "text"],
    )
    rows = DD.ngram_containment_pairs(df, threshold=0.9).collect()
    assert {(r.src, r.dst, r.containment) for r in rows} == {
        (1, 2, 1.0),
        (2, 1, 1.0),
    }


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003)
# --------------------------------------------------------------------------


def test_winnow_guarantee_shared_passage_detected(spark):
    """The winnowing guarantee: a shared passage of >= w + k - 1 tokens
    yields at least one shared fingerprint, wherever it sits."""
    from hk_housing_datahub_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+5-1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} completely different tail words here"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.a, r.b)
        for r in winnow_overlap_pairs(docs, k=5, w=4).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_density_and_short_docs(spark):
    """Fingerprint count is far below k-gram count (~2/(w+1) density);
    docs under k tokens yield no fingerprints, and docs with >= 1
    k-gram but fewer than w windows fall back to ONE fingerprint (the
    classic MOSS min-over-all-hashes rule) so short duplicates stay
    visible to the pair join."""
    from hk_housing_datahub_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    long_text = " ".join(f"tok{i % 13}x{i % 7}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, long_text),
            (2, "too short here"),  # 3 tokens < k: nothing
            (3, "five tokens right here now"),  # 1 k-gram, < w windows
            (4, "five tokens right here now"),  # its duplicate
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, k=5, w=4).collect()
    per: dict[int, int] = {}
    for r in fps:
        per[r.doc_id] = per.get(r.doc_id, 0) + 1
    n_kgrams = 200 - 5 + 1
    assert 0 < per[1] < n_kgrams * 0.75  # windows collapse to shared minima
    assert 2 not in per
    assert per[3] == per[4] == 1  # short-doc fallback fingerprint
    pairs = {
        (r.a, r.b) for r in winnow_overlap_pairs(docs, k=5, w=4).collect()
    }
    assert (3, 4) in pairs  # short duplicates are no longer invisible


def test_winnow_duckdb_parity(spark, sf_small):
    """Window-min fingerprints and the overlap pairs replayed in DuckDB
    (md5 strings compare identically on both engines)."""
    import duckdb

    from hk_housing_datahub_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        map(tuple, winnow_overlap_pairs(
            docs, k=5, w=4, max_fp_df=50
        ).collect())
    )
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    want = sorted(
        duckdb.sql(
            f"""
        WITH d AS (SELECT doc_id, {toks} AS t
                   FROM '{sf_small}/documents.parquet'),
        kg AS (SELECT doc_id, i,
                      md5(array_to_string(t[i:i+4], ' ')) AS h,
                      len(t) - 5 + 1 AS m
               FROM d, unnest(generate_series(1, len(t) - 4)) AS g(i)
               WHERE len(t) >= 5),
        wm AS (SELECT doc_id,
                      min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                      i, m
               FROM kg),
        fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE i <= m - 4 + 1
                UNION
                SELECT doc_id, min(h) AS fp FROM kg WHERE m < 4
                GROUP BY doc_id),
        capped AS (SELECT doc_id, fp FROM fps
                   QUALIFY count(*) OVER (PARTITION BY fp) <= 50)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM capped a JOIN capped b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        """
        ).fetchall()
    )
    assert got == want


def test_winnow_xxhash_mode_guarantee_and_type(spark):
    """The production xxhash64 fingerprint mode keeps the winnowing
    guarantee (a shared passage of >= w+k-1 tokens shares at least one
    fingerprint, incl. the short-doc fallback) with long fingerprints
    instead of md5 strings; unknown modes raise instead of silently
    falling back."""
    import pytest as _pt

    from hk_housing_datahub_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one two three"),
            (2, f"other head words {shared}"),
            (3, "five tokens right here now"),
            (4, "five tokens right here now"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, k=5, w=4, hash_mode="xxhash64")
    assert dict(fps.dtypes)["fp"] == "bigint"
    pairs = {
        (r.a, r.b)
        for r in winnow_overlap_pairs(
            docs, k=5, w=4, hash_mode="xxhash64"
        ).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    with _pt.raises(ValueError):
        winnow_fingerprints(docs, hash_mode="fnv")
