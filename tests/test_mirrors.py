from __future__ import annotations

import itertools

from hk_housing_datahub_spark.operators.mirrors import (
    host_digest_sets,
    mirror_host_pairs,
    suppressed_hosts,
)


def _caps(spark, rows):
    return spark.createDataFrame(rows, ["host", "digest"])


def test_mirror_pair_scores(spark):
    rows = []
    rows += [("a.com", f"d{i}") for i in range(20)]
    rows += [("b.com", f"d{i}") for i in range(18)]  # 18/20 of a.com
    rows += [("b.com", "bx1"), ("b.com", "bx2")]  # |b| = 20
    rows += [("c.com", f"z{i}") for i in range(15)]  # disjoint
    got = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_host_pairs(_caps(spark, rows)).collect()
    }
    assert list(got) == [("a.com", "b.com")]
    p = got[("a.com", "b.com")]
    assert (p["shared"], p["size_a"], p["size_b"]) == (18, 20, 20)
    assert abs(p["containment"] - 18 / 20) < 1e-12
    assert abs(p["jaccard"] - 18 / 22) < 1e-12


def test_repeat_captures_count_once(spark):
    rows = [("a.com", "d1")] * 5 + [("b.com", "d1")] * 3 + [
        ("a.com", f"x{i}") for i in range(4)
    ] + [("b.com", f"y{i}") for i in range(4)]
    got = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).collect()
    assert len(got) == 1
    assert (got[0]["shared"], got[0]["size_a"], got[0]["size_b"]) == (1, 5, 5)


def test_hot_digest_cap_drops_boilerplate_evidence(spark):
    # every host shares the "empty page" digest; with the cap it carries
    # no signal — disjoint hosts stay unflagged and set sizes exclude it
    hosts = [f"h{i}.com" for i in range(6)]
    rows = [(h, "boiler") for h in hosts]
    rows += [(h, f"{h}-p{i}") for h in hosts for i in range(6)]
    rows += [("h0.com", "m1"), ("h1.com", "m1")]  # one true shared page
    flagged = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0,
        max_digest_df=3,
    ).collect()
    assert [(r["host_a"], r["host_b"]) for r in flagged] == [
        ("h0.com", "h1.com")
    ]
    assert (flagged[0]["shared"], flagged[0]["size_a"]) == (1, 7)
    # without the cap the boilerplate digest fabricates all 15 pairs
    uncapped = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).count()
    assert uncapped == 15


def test_null_digests_ignored(spark):
    rows = [("a.com", None), ("b.com", None), ("a.com", "d"), ("b.com", "d")]
    got = mirror_host_pairs(
        _caps(spark, rows), min_shared=1, min_containment=0.0
    ).collect()
    assert len(got) == 1 and got[0]["shared"] == 1


def test_suppression_keeps_larger_side(spark):
    rows = [("big.com", f"d{i}") for i in range(10)]
    rows += [("small.com", f"d{i}") for i in range(8)]  # subset mirror
    rows += [("tie-a.com", f"t{i}") for i in range(5)]
    rows += [("tie-b.com", f"t{i}") for i in range(5)]  # equal-size mirror
    pairs = mirror_host_pairs(_caps(spark, rows), min_containment=0.8)
    got = {r["host"] for r in suppressed_hosts(pairs).collect()}
    # smaller side suppressed; equal sizes → lexicographically larger
    assert got == {"small.com", "tie-b.com"}


def test_matches_python_set_model(spark):
    """Brute-force set model over a deterministic construction: 8 hosts,
    host i's informative set = pages {j : j % (i+2) == 0, j < 60}."""
    rows = [
        (f"h{i}", f"p{j}")
        for i in range(8)
        for j in range(60)
        if j % (i + 2) == 0
    ]
    sets = {}
    for h, d in rows:
        sets.setdefault(h, set()).add(d)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sh = len(sets[a] & sets[b])
        cont = sh / min(len(sets[a]), len(sets[b]))
        if sh >= 3 and cont >= 0.4:
            want[(a, b)] = (sh, len(sets[a]), len(sets[b]))
    got = {
        (r["host_a"], r["host_b"]): (r["shared"], r["size_a"], r["size_b"])
        for r in mirror_host_pairs(
            _caps(spark, rows), min_shared=3, min_containment=0.4
        ).collect()
    }
    assert got == want and len(want) > 3


def test_host_digest_sets_sizes(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x")]
    got = {
        (r["host"], r["digest"]): r["sz"]
        for r in host_digest_sets(_caps(spark, rows)).collect()
    }
    assert got == {("a", "x"): 2, ("a", "y"): 2, ("b", "x"): 1}
