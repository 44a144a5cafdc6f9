from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.linkgraph import (
    pagerank,
    rank_to_priority,
)


def test_pagerank_mass_conservation_and_uniform_cycle(spark):
    # a 4-cycle: every node has in-degree = out-degree = 1, so rank stays
    # exactly uniform at every iteration
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    r = {x["node"]: x["rank"] for x in pagerank(edges, iterations=7).collect()}
    assert len(r) == 4
    for v in r.values():
        assert abs(v - 0.25) < 1e-12
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    # deterministic pseudo-random digraph with dangling nodes
    n = 40
    pairs = sorted(
        {((i * 17 + 3) % n, (i * 29 + 7) % n) for i in range(160)}
        | {(i, (i * i + 1) % n) for i in range(0, n, 3)}
    )
    pairs = [(a, b) for a, b in pairs if a % 7 != 0]  # a-mod-7 nodes dangle
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        x["node"]: x["rank"]
        for x in pagerank(edges, damping=0.85, iterations=12).collect()
    }
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    out = np.zeros(m)
    A = np.zeros((m, m))
    for a, b in pairs:
        A[idx[b], idx[a]] += 1.0
        out[idx[a]] += 1.0
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(out > 0, A / out, 0.0)
    r = np.full(m, 1.0 / m)
    for _ in range(12):
        dangling = r[out == 0].sum()
        r = (1 - 0.85) / m + 0.85 * (A @ r + dangling / m)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dedups_edges_and_drops_nulls(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (1, 0), (None, 0), (0, None)],
        "src int, dst int",
    )
    r = {x["node"]: x["rank"] for x in pagerank(edges, iterations=5).collect()}
    # after dedup this is a 2-cycle: exactly uniform
    assert set(r) == {0, 1}
    assert abs(r[0] - 0.5) < 1e-12 and abs(r[1] - 0.5) < 1e-12


def test_rank_to_priority_bands_and_scheduler_order(spark):
    from hk_housing_datahub_spark.frontier.scheduler import schedule_wave

    # 40 urls on one host; rank decreasing in url index
    rows = [
        (f"https://h.example.com/p{i:02d}", "h.example.com", i * 7919, 2, 0, i)
        for i in range(40)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url_canon string, host string, url_hash long, priority int,"
        " discovered_ts long, idx int",
    )
    ranks = spark.createDataFrame(
        [(f"https://h.example.com/p{i:02d}", 1.0 / (1 + i)) for i in range(38)],
        "node string, rank double",
    )
    out = rank_to_priority(frontier, ranks, n_bands=4)
    got = {r["url_canon"]: r["priority"] for r in out.collect()}
    # top-ranked urls land in the best (lowest) band, never-linked urls in
    # the worst; priorities weakly increase as rank decreases
    assert got["https://h.example.com/p00"] == 2
    assert got["https://h.example.com/p39"] == 5  # unranked
    prios = [got[f"https://h.example.com/p{i:02d}"] for i in range(38)]
    assert prios == sorted(prios)
    assert set(prios) == {2, 3, 4, 5}

    # the scheduler consumes the rewritten priority directly: under a tight
    # budget the scheduled set is exactly the best-ranked urls
    sched = schedule_wave(
        out.drop("idx"), robots=None, wave_ms=1_000
    )  # default 100 ms delay -> budget 10
    picked = sorted(
        r["url_canon"]
        for r in sched.filter(F.col("scheduled")).collect()
    )
    assert picked == sorted(
        f"https://h.example.com/p{i:02d}" for i in range(10)
    )


def test_rank_to_priority_single_band_is_flat(spark):
    frontier = spark.createDataFrame(
        [("u1", "h", 1, 9, 0)],
        "url_canon string, host string, url_hash long, priority int,"
        " discovered_ts long",
    )
    ranks = spark.createDataFrame([("u1", 0.5)], "node string, rank double")
    out = rank_to_priority(frontier, ranks, n_bands=1, base_priority=3)
    assert out.collect()[0]["priority"] == 3


def test_crawl_engine_link_graph_reprioritization(spark, tmp_path):
    """rank_priorities=True: the engine logs per-wave edges, reranks the
    accumulated graph, and rewrites frontier priorities — hubs (high
    in-rank urls) outrank never-linked urls in the checkpointed frontier,
    and a resumed ranked crawl reaches the identical schedule."""
    from hk_housing_datahub_spark.datagen import (
        generate_pages,
        generate_seeds,
    )
    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = generate_pages(spark, 400, n_hosts=8).cache()
    seeds = generate_seeds(spark, 8, 400, n_hosts=8)
    kw = dict(
        wave_ms=400, max_depth=2, rank_priorities=True, rank_iterations=3
    )

    d1 = str(tmp_path / "full")
    eng = CrawlEngine(spark, pages, None, d1, **kw)
    res = eng.run(seeds, max_waves=3)
    assert res.n_extracted > 0

    # frontier checkpoint priorities come from the rank bands
    import glob
    import os as _os

    fdirs = sorted(glob.glob(_os.path.join(d1, "frontier_v*")))
    front = spark.read.parquet(fdirs[-1])
    prios = [r["priority"] for r in front.select("priority").collect()]
    if prios:
        assert min(prios) >= 2 and max(prios) <= 5

    # ranked urls (in the edge log) that appear in the frontier must never
    # rank WORSE than the worst band, and some un-linked url sits in it
    edges = spark.read.parquet(_os.path.join(d1, "edges"))
    linked = front.join(
        edges.select(F.col("dst").alias("url_canon")).distinct(),
        "url_canon",
        "left_semi",
    )
    unlinked = front.join(
        edges.select(F.col("dst").alias("url_canon")).distinct(),
        "url_canon",
        "left_anti",
    )
    for r in unlinked.select("priority").collect():
        assert r["priority"] == 5  # worst band: never linked
    assert linked.count() + unlinked.count() == front.count()

    # resume parity: stop after wave 0, resume, same final schedule log
    d2 = str(tmp_path / "split")
    CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=1)
    res2 = CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=2)
    log1 = sorted(
        (r.wave, r.host, r.host_rank, r.url_canon)
        for r in res.schedule_log(spark).collect()
    )
    log2 = sorted(
        (r.wave, r.host, r.host_rank, r.url_canon)
        for r in res2.schedule_log(spark).collect()
    )
    assert log1 == log2


def test_host_graph_rollup_and_degrees(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.linkgraph import (
        host_degrees,
        host_graph,
    )

    edges = spark.createDataFrame(
        [
            # a.com/1 links twice to b.com (multiplicity), once internal
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/1", "https://b.com/y"),
            ("https://a.com/1", "https://a.com/2"),
            # www.a.com folds into a.com; second distinct linking page
            ("https://www.a.com/2", "https://b.com/x"),
            # c.com is in-degree-only
            ("https://b.com/z", "https://c.com/"),
        ],
        ["src_url", "dst_url"],
    )
    hg = {
        (r["src_host"], r["dst_host"]): r.asDict()
        for r in host_graph(edges).collect()
    }
    ab = hg[("com,a", "com,b")]
    assert ab["n_links"] == 3 and ab["n_src_pages"] == 2
    assert not ab["is_internal"]
    aa = hg[("com,a", "com,a")]
    assert aa["n_links"] == 1 and aa["is_internal"]
    assert ("com,b", "com,c") in hg

    deg = {
        r["host"]: r.asDict()
        for r in host_degrees(host_graph(edges)).collect()
    }
    assert deg["com,a"]["out_degree"] == 1  # only b.com (internal excluded)
    assert deg["com,a"]["out_links"] == 3
    assert deg["com,a"]["internal_links"] == 1
    assert deg["com,b"]["in_degree"] == 1 and deg["com,b"]["in_links"] == 3
    assert deg["com,b"]["out_degree"] == 1
    assert deg["com,c"]["out_degree"] == 0 and deg["com,c"]["in_degree"] == 1


def test_host_graph_stats_merge_equals_single_pass(spark):
    """O(delta) maintenance: wave stats merged ≡ one pass over all
    edges — n_links exact, distinct-page estimates identical (HLL
    register-max), and the materialized view matches host_graph exactly
    at these cardinalities (sparse-mode sketches are exact)."""
    from hk_housing_datahub_spark.operators.linkgraph import (
        host_graph,
        host_graph_from_stats,
        host_graph_stats,
        merge_host_graph_stats,
    )

    def wave(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "concat('https://h', id % 5, '.com/p', id % 40) as src_url",
            "concat('https://h', (id * 3 + 1) % 5, '.com/q', id % 7) "
            "as dst_url",
        )

    w1, w2 = wave(0, 120), wave(80, 260)  # overlapping linking pages
    merged = merge_host_graph_stats(
        host_graph_stats(w1), host_graph_stats(w2)
    )
    single = host_graph_stats(w1.unionAll(w2))
    m = {
        (r["src_host"], r["dst_host"]): r.asDict()
        for r in host_graph_from_stats(merged).collect()
    }
    s = {
        (r["src_host"], r["dst_host"]): r.asDict()
        for r in host_graph_from_stats(single).collect()
    }
    assert m == s
    # the maintained view reproduces the exact rollup (duplicate page
    # edges across waves must NOT inflate the distinct-page count)
    exact = {
        (r["src_host"], r["dst_host"]): r.asDict()
        for r in host_graph(w1.unionAll(w2)).collect()
    }
    assert set(m) == set(exact)
    for k in exact:
        assert m[k]["n_links"] == exact[k]["n_links"]
        assert m[k]["n_src_pages"] == exact[k]["n_src_pages"]
        assert m[k]["is_internal"] == exact[k]["is_internal"]


def test_trustrank_zeroes_components_unreachable_from_seeds(spark):
    """A 3-node spam ring with no path from the trusted seed keeps
    EXACTLY zero rank (its members bootstrap from 0 and teleport never
    reaches them), while total mass stays 1."""
    from hk_housing_datahub_spark.operators.linkgraph import trustrank

    edges = spark.createDataFrame(
        [  # trusted component: 1 -> 2 -> 3 -> 1
            (1, 2), (2, 3), (3, 1),
            # spam ring, internally dense, unreachable from node 1
            (10, 11), (11, 12), (12, 10), (10, 12), (11, 10),
        ],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    r = {
        row["node"]: row["rank"]
        for row in trustrank(edges, seeds, iterations=8).collect()
    }
    assert r[10] == 0.0 and r[11] == 0.0 and r[12] == 0.0
    assert r[1] > 0 and r[2] > 0 and r[3] > 0
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_trustrank_matches_numpy_model(spark):
    import numpy as np

    from hk_housing_datahub_spark.operators.linkgraph import trustrank

    rng = [(a, b) for a in range(12) for b in range(12)
           if a != b and (a * 7 + b * 3) % 5 == 0]
    edges = spark.createDataFrame(rng, ["src", "dst"])
    seed_ids = [0, 4, 8]
    seeds = spark.createDataFrame([(s,) for s in seed_ids], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in trustrank(edges, seeds, damping=0.85, iterations=6).collect()
    }
    nodes = sorted({a for a, _ in rng} | {b for _, b in rng})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    t = np.zeros(n)
    for s in seed_ids:
        t[idx[s]] = 1.0 / len(seed_ids)
    out = {v: [] for v in nodes}
    for a, b in set(rng):
        out[a].append(b)
    r = t.copy()
    for _ in range(6):
        nxt = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if out[v]:
                for w in out[v]:
                    nxt[idx[w]] += r[idx[v]] / len(out[v])
            else:
                dangling += r[idx[v]]
        r = 0.15 * t + 0.85 * (nxt + dangling * t)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, v


def test_trustrank_with_all_nodes_trusted_is_pagerank(spark):
    from hk_housing_datahub_spark.operators.linkgraph import (
        pagerank,
        trustrank,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"]
    )
    all_nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["node"])
    tr = {
        r["node"]: r["rank"]
        for r in trustrank(edges, all_nodes, iterations=5).collect()
    }
    pr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=5).collect()
    }
    for v in pr:
        assert abs(tr[v] - pr[v]) < 1e-12


def test_trustrank_requires_seed_overlap(spark):
    import pytest

    from hk_housing_datahub_spark.operators.linkgraph import trustrank

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["node"])
    with pytest.raises(ValueError, match="no trusted node"):
        trustrank(edges, seeds)


def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np

    from hk_housing_datahub_spark.operators.linkgraph import hits

    edges = [(0, 2), (1, 2), (3, 2), (0, 4), (1, 4), (2, 5), (0, 2)]
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=5
        ).collect()
    }
    E = sorted(set(edges))
    nodes = sorted({u for e in E for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in E:
        A[idx[u], idx[v]] = 1.0
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(5):
        a = A.T @ h
        s = a.sum()
        a = a / s if s > 0 else a * 0
        h = A @ a
        s = h.sum()
        h = h / s if s > 0 else h * 0
    for v in nodes:
        assert abs(got[v][0] - h[idx[v]]) < 1e-12, ("hub", v)
        assert abs(got[v][1] - a[idx[v]]) < 1e-12, ("auth", v)


def test_hits_separates_hub_and_authority_roles(spark):
    """A directory page linking to every article is the top HUB with
    zero authority; the article every hub links to is the top AUTHORITY
    with zero hub score; L1 half-step normalization keeps each score
    family summing to 1."""
    from hk_housing_datahub_spark.operators.linkgraph import hits

    # hub 100 links to articles 1..5; hubs 101,102 each link to article
    # 1 plus one other — article 1 alone is in every hub's list
    edges = (
        [(100, i) for i in range(1, 6)]
        + [(101, 1), (101, 4), (102, 1), (102, 5)]
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=8
        ).collect()
    }
    hubs = {v: s[0] for v, s in got.items()}
    auths = {v: s[1] for v, s in got.items()}
    assert max(hubs, key=hubs.get) == 100
    assert max(auths, key=auths.get) == 1
    # articles never link out -> zero hub; directories are never linked
    # to -> zero authority
    assert all(hubs[v] == 0.0 for v in range(1, 6))
    assert all(auths[v] == 0.0 for v in (100, 101, 102))
    assert abs(sum(hubs.values()) - 1.0) < 1e-9
    assert abs(sum(auths.values()) - 1.0) < 1e-9


def test_hits_dedups_edges_drops_nulls_and_handles_empty(spark):
    from pyspark.sql import types as T

    from hk_housing_datahub_spark.operators.linkgraph import hits

    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
        ]
    )
    dup = hits(
        spark.createDataFrame(
            [(1, 2), (1, 2), (1, 2), (3, 2), (None, 2), (1, None)],
            schema,
        ),
        iterations=3,
    )
    got = {r["node"]: (r["hub"], r["authority"]) for r in dup.collect()}
    # triple-counted edge collapses: 1 and 3 are equal hubs
    assert abs(got[1][0] - got[3][0]) < 1e-12
    empty = hits(spark.createDataFrame([], schema))
    assert empty.count() == 0
    assert set(empty.columns) == {"node", "hub", "authority"}


def _opic_model(nodes, waves):
    """Pure-Python OPIC reference: batch-synchronous (Jacobi) waves over
    pre-wave cash, virtual-root dangling, discovery at (0, 0)."""
    n0 = len(nodes)
    cash = {v: 1.0 / n0 for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for fetched, edges in waves:
        e = sorted({(a, b) for a, b in edges if a in fetched})
        deg = {}
        for a, _ in e:
            deg[a] = deg.get(a, 0) + 1
        for _, b in e:  # discovery before distribution
            if b not in cash:
                cash[b] = 0.0
                hist[b] = 0.0
        pre = dict(cash)
        contrib = {v: 0.0 for v in cash}
        dmass = 0.0
        for u in fetched:
            if u not in pre:
                continue  # unknown fetched id: no cash to move
            if deg.get(u, 0) == 0:
                dmass += pre[u]
        for a, b in e:
            if a in pre:
                contrib[b] += pre[a] / deg[a]
        n = len(cash)
        for v in cash:
            zeroed = 0.0 if v in fetched else pre[v]
            cash[v] = zeroed + contrib[v] + dmass / n
            if v in fetched:
                hist[v] += pre[v]
    th = sum(hist.values())
    imp = {v: (hist[v] + cash[v]) / (th + 1.0) for v in cash}
    return cash, hist, imp


def test_opic_matches_python_model_with_discovery_and_dangling(spark):
    from hk_housing_datahub_spark.operators.linkgraph import (
        opic_importance,
        opic_init,
        opic_step,
    )

    nodes = [0, 1, 2, 3]
    all_edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 5), (0, 1)]
    # wave 2 refetches 0; node 3 dangles; edge (1,5) discovers node 5;
    # 99 is fetched but unknown (carries no cash)
    waves = [[0, 1], [2, 3, 99], [0, 5]]
    edges_df = spark.createDataFrame(all_edges, ["src", "dst"])
    state = opic_init(spark.createDataFrame([(v,) for v in nodes], ["node"]))
    for w in waves:
        f = spark.createDataFrame([(v,) for v in w], ["node"])
        state = opic_step(state, f, edges_df)
        got_cash = {r["node"]: r["cash"] for r in state.collect()}
        assert abs(sum(got_cash.values()) - 1.0) < 1e-12  # invariant
    cash, hist, imp = _opic_model(
        nodes, [(set(w), all_edges) for w in waves]
    )
    rows = {r["node"]: r for r in state.collect()}
    assert set(rows) == set(cash)
    for v in cash:
        assert abs(rows[v]["cash"] - cash[v]) < 1e-12, ("cash", v)
        assert abs(rows[v]["history"] - hist[v]) < 1e-12, ("hist", v)
    got_imp = {
        r["node"]: r["importance"]
        for r in opic_importance(state).collect()
    }
    for v in imp:
        assert abs(got_imp[v] - imp[v]) < 1e-12, ("imp", v)
    assert abs(sum(got_imp.values()) - 1.0) < 1e-12


def test_opic_dangling_fetch_redistributes_uniformly(spark):
    from hk_housing_datahub_spark.operators.linkgraph import (
        opic_init,
        opic_step,
    )

    state = opic_init(spark.createDataFrame([(0,), (1,), (2,)], ["node"]))
    empty = spark.createDataFrame([], "src int, dst int")
    f = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: (r["cash"], r["history"])
        for r in opic_step(state, f, empty).collect()
    }
    third = 1.0 / 3.0
    # fetched 0: its 1/3 cash goes to the root and back 1/9 to each node
    assert abs(got[0][0] - (0.0 + third / 3)) < 1e-12
    assert abs(got[1][0] - (third + third / 3)) < 1e-12
    assert abs(got[0][1] - third) < 1e-12
    assert got[1][1] == 0.0


def test_opic_repeated_full_fetch_ranks_like_indegree(spark):
    """Fetching every page each wave: the hub-fed sink accumulates the
    most history; importance ordering reflects the link structure."""
    from hk_housing_datahub_spark.operators.linkgraph import (
        opic_importance,
        opic_init,
        opic_step,
    )

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 4), (4, 1)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(v,) for v in range(5)], ["node"])
    state = opic_init(nodes)
    for _ in range(6):
        state = opic_step(state, nodes, edges)
    imp = {
        r["node"]: r["importance"]
        for r in opic_importance(state).collect()
    }
    assert imp[0] == max(imp.values())
    assert abs(sum(imp.values()) - 1.0) < 1e-12


def _hub_corpus(spark):
    """10 hub pages each link to one shared popular target AND one
    private target — after wave 0, OPIC cash concentrates on the
    popular page (10 shares vs 1)."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(10):
        html = (
            '<html><body><div id="content">hub</div>'
            '<a href="https://popular.com/p">p</a>'
            f'<a href="https://uniq{i}.com/u">u</a>'
            "</body></html>"
        ).encode()
        rows.append((f"https://hub{i}.com/h", html, "hub"))
    rows.append((b"https://popular.com/p", b"<html></html>", "pop"))
    rows = [(u if isinstance(u, str) else u.decode(), h, t) for u, h, t in rows]
    return spark.createDataFrame(
        rows, "url string, html binary, text string"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
        "html",
        "text",
        F.lit("en").alias("lang"),
    )


def test_crawl_engine_opic_reprioritization_and_resume(spark, tmp_path):
    """rank_method='opic': per-wave O(delta) state advance — the
    popular target (10 hub shares) outranks the private targets in the
    checkpointed frontier; state cash stays exactly 1; a resumed ranked
    crawl reaches the identical schedule log."""
    import glob
    import os as _os

    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.frontier import CrawlEngine

    pages = _hub_corpus(spark).cache()
    seeds = spark.createDataFrame(
        [(f"https://hub{i}.com/h", 0) for i in range(10)],
        ["url", "priority"],
    )
    kw = dict(
        wave_ms=10_000_000,
        max_depth=2,
        rank_priorities=True,
        rank_method="opic",
        rank_bands=4,
    )

    d1 = str(tmp_path / "full")
    res = CrawlEngine(spark, pages, None, d1, **kw).run(seeds, max_waves=2)
    assert res.n_extracted > 0

    fdirs = sorted(glob.glob(_os.path.join(d1, "frontier_v*")))
    front = spark.read.parquet(fdirs[0])  # frontier after wave 0
    prio = {
        r["url_canon"]: r["priority"]
        for r in front.select("url_canon", "priority").collect()
    }
    pop = prio["https://popular.com/p"]
    uniq = [p for u, p in prio.items() if u.startswith("https://uniq")]
    assert pop < min(uniq), prio  # best band for the 10-share target

    # state invariant: total cash is exactly 1 at every checkpoint
    for sdir in sorted(glob.glob(_os.path.join(d1, "opic_v*"))):
        tot = (
            spark.read.parquet(sdir)
            .agg(F.sum("cash").alias("c"))
            .collect()[0]["c"]
        )
        assert abs(tot - 1.0) < 1e-9, sdir

    # resume parity: the stateful rank replays identically
    d2 = str(tmp_path / "split")
    CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=1)
    res2 = CrawlEngine(spark, pages, None, d2, **kw).run(seeds, max_waves=2)
    log1 = sorted(
        (r.wave, r.host, r.host_rank, r.url_canon)
        for r in res.schedule_log(spark).collect()
    )
    log2 = sorted(
        (r.wave, r.host, r.host_rank, r.url_canon)
        for r in res2.schedule_log(spark).collect()
    )
    assert log1 == log2


def test_crawl_engine_rejects_unknown_rank_method(spark, tmp_path):
    import pytest as _pytest

    from hk_housing_datahub_spark.frontier import CrawlEngine

    with _pytest.raises(TypeError, match="rank_method"):
        CrawlEngine(
            spark, _hub_corpus(spark), None, str(tmp_path / "x"),
            rank_priorities=True, rank_method="hits",
        )


def test_hits_zero_iterations_returns_uniform_init(spark):
    from hk_housing_datahub_spark.operators.linkgraph import hits

    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"]),
            iterations=0,
        ).collect()
    }
    # defined zero-iteration result: the init state, uniform 1/n both roles
    assert set(got) == {1, 2, 3}
    for h, a in got.values():
        assert abs(h - 1 / 3) < 1e-12 and abs(a - 1 / 3) < 1e-12


def test_opic_init_dedups_node_projection(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.linkgraph import opic_init

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], ["src", "dst"]
    )
    # the natural node-set construction WITHOUT .distinct()
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    )
    state = opic_init(nodes)
    rows = state.collect()
    assert len(rows) == 3  # one state row per node despite duplicates
    assert abs(sum(r["cash"] for r in rows) - 1.0) < 1e-12
