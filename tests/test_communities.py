"""Deterministic label propagation: clique separation, tie-break and
convergence-flag semantics."""

from hk_housing_datahub_spark.operators.communities import (
    community_sizes,
    hash_nodes,
    label_propagation,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def test_two_cliques_with_bridge_separate(spark):
    # two 4-cliques joined by one bridge edge: LPA must label each
    # clique by its minimum member and the bridge must not merge them
    e = _edges(
        spark,
        _clique([0, 1, 2, 3]) + _clique([10, 11, 12, 13]) + [(3, 10)],
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=5).collect()
    }
    assert {got[i] for i in (0, 1, 2, 3)} == {0}
    assert {got[i] for i in (10, 11, 12, 13)} == {10}
    sizes = {
        r["label"]: r["n_members"]
        for r in community_sizes(
            label_propagation(e, rounds=5).select("node", "label")
        ).collect()
    }
    assert sizes == {0: 4, 10: 4}


def test_tie_breaks_to_smallest_label_and_edges_symmetrize(spark):
    # a single directed edge 5 -> 2: symmetrized, each node's only
    # neighbor is the other, so after round 1 both take the smaller
    # label 2 (node 5 adopts 2; node 2 sees neighbor label 5 vs...
    # no — node 2's only vote IS 5, so it adopts 5 in round 1, then
    # they swap forever: the classic 2-cycle. Fixed rounds make the
    # outcome deterministic; n_changed > 0 reports the oscillation.
    e = _edges(spark, [(5, 2)])
    r2 = {
        r["node"]: (r["label"], r["n_changed"])
        for r in label_propagation(e, rounds=2).collect()
    }
    # two rounds of swapping returns to the start
    assert r2[2][0] == 2 and r2[5][0] == 5
    assert r2[2][1] == 2  # both nodes changed in the last round


def test_duplicate_and_self_edges_do_not_vote(spark):
    # node 1 connects to 0 (duplicated 3x) and to 2,3 (community of
    # larger ids). Duplicates collapse, so labels 2,3 outvote... all
    # distinct: votes are {0, 2, 3} each once — tie on count, min
    # label 0 wins for node 1 in round 1. Self-loop on 1 is ignored.
    e = _edges(
        spark, [(1, 0), (1, 0), (0, 1), (1, 1), (1, 2), (1, 3)]
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=1).collect()
    }
    assert got[1] == 0


def test_converged_labeling_reports_zero_changed(spark):
    # a triangle converges to min-label everywhere well inside 5
    # rounds; the last round changes nothing
    e = _edges(spark, [(7, 8), (8, 9), (7, 9)])
    rows = label_propagation(e, rounds=5).collect()
    assert {r["label"] for r in rows} == {7}
    assert all(r["n_changed"] == 0 for r in rows)


def test_hash_nodes_is_deterministic(spark):
    df = spark.createDataFrame([("a.com",), ("b.com",)], "host string")
    a = {r["host"]: r["node_id"] for r in hash_nodes(df, "host").collect()}
    b = {r["host"]: r["node_id"] for r in hash_nodes(df, "host").collect()}
    assert a == b and a["a.com"] != a["b.com"]
