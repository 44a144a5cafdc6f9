"""Link-graph scoring for crawl prioritization (PageRank power iteration).

The classic frontier-ordering signal (Page et al. 1998; Cho/Garcia-Molina
crawl-ordering studies): pages linked from many high-rank pages are fetched
first. The reference crawls a fixed seed catalog so it never needs this;
a Common-Crawl-scale frontier does — its discovered-outlink queue is
billions of URLs deep and the politeness budget forces a choice of WHICH
unseen URLs each wave spends the budget on. ``pagerank`` turns the
extracted outlink edges into that choice; ``rank_to_priority`` folds the
score into the scheduler's existing ``(host, priority, warc_ts)`` ordering
(frontier/scheduler.py) without changing its contract.

Scale shape (10^10 edges):
- one iteration = two compact-key shuffles (edges ⋈ ranks on src —
  co-partitioned after the first round — then a partial-agg sum on dst);
  rank state is 16 bytes/node.
- dangling mass is ONE scalar frame cross-joined back in (stays lazy, no
  per-iteration driver collect); lineage is cut per round with an eager
  ``localCheckpoint`` exactly like ``dedup.connected_components``.
- iteration count is FIXED (not convergence-tested): deterministic
  output, a known job count, and an unrollable DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) over the distinct-edge graph; ranks sum to 1.

    Semantics (mirrored exactly by the unrolled SQL twin in
    __spark_entry__._pagerank_sql):

    - duplicate edges collapse (web graphs: one href counts once);
      NULL endpoints are dropped;
    - rank_0 = 1/n for every node appearing as src OR dst;
    - rank_{i+1}(v) = (1-d)/n + d * (sum_{u->v} rank_i(u)/deg(u)
      + dangling_i/n)  where dangling = total rank on zero-outdegree
      nodes (standard uniform redistribution, so mass is conserved and
      ranks stay comparable across components).

    ``nodes.count()`` is the one driver-side scalar (the teleport term
    needs n); every other arrow is distributed. Float divisions are kept
    in the same operation order as the SQL twin so the two agree far
    below the comparator's 1e-6.
    """
    e = _edge_set(edges, src, dst)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    n_lit = F.lit(float(n))
    d_lit = F.lit(damping)
    return _power_iterate(
        e,
        nodes,
        F.lit(1.0) / n_lit,
        lambda contrib, dmass: (
            (F.lit(1.0) - d_lit) / n_lit
            + d_lit * (contrib + dmass / n_lit)
        ),
        iterations,
    )


def _edge_set(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct non-NULL (src, dst) edges, checkpointed — the shared
    graph normalization of the rank family."""
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )


def _power_iterate(
    e: DataFrame,
    base: DataFrame,
    init_rank,
    new_rank,
    iterations: int,
) -> DataFrame:
    """THE power-iteration skeleton shared by ``pagerank`` and
    ``trustrank`` (one definition of contribs / dangling / rebuild /
    per-round localCheckpoint — a checkpointing or NULL-handling fix
    lands in both): ``base`` carries ``node`` plus any teleport-vector
    columns the variant's expressions reference; ``init_rank`` is r0;
    ``new_rank(contrib, dmass)`` builds r_{i+1} from the coalesced
    contribution sum and the dangling-mass scalar. Each variant keeps
    its own float operation order inside its lambda so its unrolled SQL
    twin matches bit-for-bit below round(…, 6)."""
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = base.select("node", init_rank.alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = ranks.join(
            deg.withColumnRenamed("src", "node"), "node", "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        ranks = (
            base.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .crossJoin(dangling)
            .select(
                "node",
                new_rank(
                    F.coalesce(F.col("contrib"), F.lit(0.0)),
                    F.col("dmass"),
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def rank_to_priority(
    frontier: DataFrame,
    ranks: DataFrame,
    n_bands: int = 4,
    url_col: str = "url_canon",
    base_priority: int = 2,
) -> DataFrame:
    """Fold link-graph ranks into the scheduler's integer priority.

    Band thresholds come from ONE ``approx_percentile`` aggregate over the
    rank table (a bounded sketch — no global sort at any scale); the top
    rank band maps to ``base_priority``, each lower band to +1. URLs with
    no rank (never linked) keep ``base_priority + n_bands - 1``, i.e. the
    worst band — unknown pages queue behind known-good ones but are never
    starved (the scheduler's backlog carry-over still ages them forward).
    The scheduler contract is untouched: output = frontier with its
    ``priority`` column replaced.
    """
    if n_bands < 2:
        return frontier.withColumn("priority", F.lit(base_priority))
    qs = [i / n_bands for i in range(1, n_bands)]
    thresholds = ranks.agg(
        F.expr(
            "approx_percentile(rank, array({}))".format(
                ", ".join(str(q) for q in qs)
            )
        ).alias("t")
    )
    scored = (
        frontier.join(
            ranks.withColumnRenamed("node", url_col), url_col, "left"
        )
        .crossJoin(F.broadcast(thresholds))
        .withColumn(
            "priority",
            F.when(
                F.col("rank").isNull(),
                F.lit(base_priority + n_bands - 1),
            ).otherwise(
                # band = number of thresholds the rank clears, counted
                # from the top: rank > t[k] for all k >= j → priority j
                F.lit(base_priority + n_bands - 1)
                - F.size(F.filter(F.col("t"), lambda t: F.col("rank") > t))
            ),
        )
        .drop("rank", "t")
    )
    return scored


def host_graph(
    edges: DataFrame, src: str = "src_url", dst: str = "dst_url"
) -> DataFrame:
    """Host-level webgraph rollup of page-level URL edges (the Common
    Crawl host-webgraph product: billions of page edges collapse to
    millions of host pairs, the granularity crawl scheduling and domain
    reputation actually consume).

    Nodes are SURT hosts (functions/surt.py — reversed labels, www
    folded) so the output sorts domain-contiguously like the CDX index.
    Output per (src_host, dst_host): ``n_links`` (page-level edges,
    duplicates counted — anchor multiplicity is signal), ``n_src_pages``
    (distinct linking pages), ``is_internal`` (same host both sides;
    kept but flagged — intra-host navigation boilerplate vs true
    endorsement). NULL/unparseable hosts drop.

    Scale: ONE groupBy on the compact (src_host, dst_host) key; the
    distinct-page count stays inside the same shuffle via the two-level
    (pair, page) pre-aggregate. SQL-expressible (oracle twin).
    """
    from ..functions.surt import surt_host

    sh = surt_host(F.col(src))
    dh = surt_host(F.col(dst))
    per_page = (
        edges.select(
            sh.alias("src_host"),
            dh.alias("dst_host"),
            F.col(src).alias("src_page"),
        )
        .filter(
            (F.col("src_host") != "") & (F.col("dst_host") != "")
        )
        .groupBy("src_host", "dst_host", "src_page")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_page.groupBy("src_host", "dst_host").agg(
        F.sum("n").alias("n_links"),
        F.count(F.lit(1)).alias("n_src_pages"),
    ).select(
        "src_host",
        "dst_host",
        "n_links",
        "n_src_pages",
        (F.col("src_host") == F.col("dst_host")).alias("is_internal"),
    )


def host_degrees(hgraph: DataFrame) -> DataFrame:
    """Per-host degree summary over a ``host_graph`` rollup: external
    in/out degree (distinct counterpart hosts), external in/out link
    volume, and internal link volume — the node table of the host
    webgraph. Two compact aggregations + one full outer join on host.
    """
    ext = hgraph.filter(~F.col("is_internal"))
    out_side = ext.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("n_links").alias("out_links"),
    )
    in_side = ext.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("n_links").alias("in_links"),
    )
    internal = (
        hgraph.filter(F.col("is_internal"))
        .groupBy(F.col("src_host").alias("host"))
        .agg(F.sum("n_links").alias("internal_links"))
    )
    return (
        out_side.join(in_side, "host", "full")
        .join(internal, "host", "full")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
            F.coalesce("internal_links", F.lit(0)).alias(
                "internal_links"
            ),
        )
    )


def host_graph_stats(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    lg_k: int = 12,
) -> DataFrame:
    """MERGEABLE host-graph state for O(delta) wave maintenance:
    (src_host, dst_host, n_links, src_pages_hll).

    ``host_graph``'s ``n_src_pages`` is a distinct count, so two waves'
    rollups cannot be added — the same linking page may appear in both
    (the exact problem ``recrawl_stats`` solves with boundary digests).
    Here the sufficient statistic is a SET, so the state carries an HLL
    sketch of the linking pages instead (operators/sketches.py):
    ``n_links`` sums exactly, the sketch unions exactly (register max —
    merged state is bit-identical to a single pass, pinned in
    test_linkgraph.py), and per-pair state stays O(1) bytes forever.

    A new crawl wave is ``merge_host_graph_stats(state, wave_stats)`` —
    never a rescan of accumulated edges; ``jobs/archive_job.py``'s
    wave-ledger replay guard applies unchanged (sums and weighted
    sketches are not replay-idempotent).
    """
    from ..functions.surt import surt_host

    from .sketches import sketch_stats

    proj = edges.select(
        surt_host(F.col(src)).alias("src_host"),
        surt_host(F.col(dst)).alias("dst_host"),
        F.col(src).alias("src_page"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return sketch_stats(
        proj,
        keys=["src_host", "dst_host"],
        distinct_cols={"src_pages": "src_page"},
        lg_k=lg_k,
    ).withColumnRenamed("n_captures", "n_links")


def merge_host_graph_stats(*stats: DataFrame) -> DataFrame:
    """Union wave-level ``host_graph_stats`` frames — associative,
    commutative, O(groups) state (see sketches.merge_sketch_stats)."""
    from .sketches import merge_sketch_stats

    renamed = [
        s.withColumnRenamed("n_links", "n_captures") for s in stats
    ]
    return merge_sketch_stats(
        *renamed, keys=["src_host", "dst_host"]
    ).withColumnRenamed("n_captures", "n_links")


def host_graph_from_stats(stats: DataFrame) -> DataFrame:
    """Materialize the ``host_graph`` rollup view from maintained state:
    exact ``n_links``, ``n_src_pages`` as the sketch estimate (exact
    while a pair's page set is small enough for the sketch's sparse
    mode — i.e. for the long tail of host pairs; mega-pairs carry the
    published ~1.6% error at lg_k=12). Pure projection, no shuffle."""
    from .sketches import sketch_report

    rep = sketch_report(stats.withColumnRenamed("n_links", "n_captures"))
    return rep.select(
        "src_host",
        "dst_host",
        F.col("n_captures").alias("n_links"),
        F.col("src_pages_distinct").alias("n_src_pages"),
        (F.col("src_host") == F.col("dst_host")).alias("is_internal"),
    )


def trustrank(
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    node_col: str | None = None,
) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen 2004): PageRank with
    the teleport vector CONCENTRATED on a vetted seed set instead of
    uniform — rank flows only from trusted nodes outward, so link-farm
    clusters unreachable from any seed decay toward zero rather than
    bootstrapping each other. The standard frontier defense against
    spam hosts that ``host_trap_signals`` can't catch (their URL space
    looks healthy; their endorsements are fake).

    Recurrence (``t`` = 1/|S∩nodes| on seeds, 0 elsewhere; r0 = t):

        r_{i+1}(v) = (1-d)·t(v) + d·(Σ_{u→v} r_i(u)/deg(u)
                     + dangling_i·t(v))

    Dangling mass redistributes along ``t`` (not uniformly), keeping
    total mass 1 and the zero-rank property of untrusted components
    exact. Same scale shape as ``pagerank`` (one edges⋈ranks join + one
    dst-keyed sum per round, per-round localCheckpoint, 16-byte node
    state); the seed flag is one extra broadcast-sized semi-join folded
    into the initial vector. Deterministic, fixed iterations —
    SQL-unrollable (oracle twin ``trust_graph_rank``). ``node_col``
    names the seed-id column of ``trusted``; omitted, the frame must
    have exactly one column (positional guessing on a wider frame would
    silently rank from the wrong seed set).
    """
    e = _edge_set(edges, src, dst)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    if node_col is None:
        if len(trusted.columns) != 1:
            raise ValueError(
                "trustrank: pass node_col to pick the seed column of a "
                f"multi-column trusted frame (got {trusted.columns})"
            )
        node_col = trusted.columns[0]
    seeds = (
        trusted.select(F.col(node_col).alias("node"))
        .distinct()
        .join(nodes, "node", "semi")
    )
    s_count = seeds.count()
    if s_count == 0:
        raise ValueError(
            "trustrank: no trusted node appears in the edge graph"
        )
    tvec = (
        nodes.join(seeds.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / s_count))
            .otherwise(F.lit(0.0))
            .alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    d_lit = F.lit(damping)
    return _power_iterate(
        e,
        tvec,
        F.col("t"),
        lambda contrib, dmass: (
            (F.lit(1.0) - d_lit) * F.col("t")
            + d_lit * (contrib + dmass * F.col("t"))
        ),
        iterations,
    )


def opic_init(nodes: DataFrame, node_col: str = "node") -> DataFrame:
    """Initial OPIC state over the known node set: (node, cash, history)
    with cash = 1/n uniformly and history = 0 (Abiteboul/Preda/Cobéna
    2003 §2). The node projection is deduplicated so a caller passing
    duplicate ids (e.g. edges.select('src').union(edges.select('dst'))
    without .distinct()) still gets one state row per node and Σcash = 1
    — duplicate state keys would multiply rows in every ``opic_step``
    join. One count + one distinct projection."""
    keys = nodes.select(F.col(node_col).alias("node")).distinct()
    n = keys.count()
    return keys.select(
        "node",
        (F.lit(1.0) / F.lit(float(max(n, 1)))).alias("cash"),
        F.lit(0.0).alias("history"),
    )


def opic_step(
    state: DataFrame,
    fetched: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """One crawl wave of OPIC (Adaptive On-line Page Importance
    Computation, Abiteboul/Preda/Cobéna WWW 2003) — the importance
    estimator that, unlike ``pagerank``/``trustrank``/``hits``, needs NO
    full-graph iteration: each wave banks the fetched pages' cash into
    their history and pushes it to their outlinks, so the estimate
    sharpens as the crawl proceeds, with per-wave cost O(wave edges)
    regardless of accumulated graph size. This is the rank the frontier
    can afford to refresh EVERY wave (the power-iteration family is a
    periodic batch job over the full edge set).

    Batch-synchronous (Jacobi) semantics, deterministic for the SQL
    twin: all distributions read PRE-wave cash simultaneously.

    - ``fetched``: node ids fetched this wave (deduped; ids unknown to
      ``state`` are ignored — they carry no cash to distribute).
    - ``edges``: outlink edges observed for the fetched pages (rows
      whose src is not fetched are ignored; duplicate edges collapse).
    - Each fetched page u: history += cash(u); its cash splits equally
      over its distinct outlinks; a fetched page with NO outlinks sends
      its cash to the virtual root, which redistributes uniformly over
      ALL post-wave nodes (the paper's virtual page, collapsed to one
      scalar exactly like ``pagerank``'s dangling mass).
    - Newly discovered dst nodes enter the state with (0, 0) BEFORE
      receiving this wave's cash — so total cash is conserved at 1.0
      forever (pinned invariant), and Σ(history+cash)/(Σhistory+1) = 1.

    Scale shape: one semi-join to select fetched cash, one edges⋈cash
    join + dst-keyed sum (compact keys), one scalar cross-join, one
    outer join back onto state; eager localCheckpoint cuts lineage so a
    10^5-wave crawl keeps an O(1) plan. State is 24 bytes/node.
    """
    f = fetched.select(F.col(node_col).alias("node")).distinct()
    st = state.select("node", "cash", "history")
    fcash = st.join(f, "node", "semi").select("node", "cash")
    e = _edge_set(
        edges.join(
            f.withColumnRenamed("node", src).select(src), src, "semi"
        ),
        src,
        dst,
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contribs = (
        e.join(fcash.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select("dst", (F.col("cash") / F.col("deg")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("contrib"))
    )
    dangling = fcash.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dmass"))
    base = st.join(
        e.select(F.col("dst").alias("node")).distinct(),
        "node",
        "full",
    ).select(
        "node",
        F.coalesce("cash", F.lit(0.0)).alias("cash"),
        F.coalesce("history", F.lit(0.0)).alias("history"),
    )
    n = base.count()
    return (
        base.join(f.withColumn("_f", F.lit(1)), "node", "left")
        .join(contribs.withColumnRenamed("dst", "node"), "node", "left")
        .crossJoin(dangling)
        .select(
            "node",
            (
                F.when(F.col("_f").isNotNull(), F.lit(0.0)).otherwise(
                    F.col("cash")
                )
                + F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.col("dmass") / F.lit(float(max(n, 1)))
            ).alias("cash"),
            (
                F.col("history")
                + F.when(
                    F.col("_f").isNotNull(), F.col("cash")
                ).otherwise(F.lit(0.0))
            ).alias("history"),
        )
        .localCheckpoint(eager=True)
    )


def opic_importance(state: DataFrame) -> DataFrame:
    """(node, importance) from OPIC state: (history + cash) /
    (Σ history + 1) — the paper's bias-corrected estimate (history
    alone undercounts pages whose cash arrived after their last
    fetch). Importances sum to exactly 1 (cash invariant). One scalar
    aggregate cross-joined back in; no shuffle on the node table."""
    tot = state.agg(
        F.coalesce(F.sum("history"), F.lit(0.0)).alias("_th")
    )
    return state.crossJoin(tot).select(
        "node",
        (
            (F.col("history") + F.col("cash"))
            / (F.col("_th") + F.lit(1.0))
        ).alias("importance"),
    )


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg 1999): (node, hub, authority) by mutually
    recursive power iteration. PageRank/TrustRank answer "how endorsed
    is this page"; HITS separates the two roles a crawl cares about —
    *hubs* (link lists, sitemaps, category indexes: pages whose
    outlinks are worth expanding eagerly) and *authorities* (pages many
    good hubs point at: worth fetching early and keeping). Frontier use:
    hub scores prioritize EXPANSION (wave scheduling of pages whose
    outlinks to harvest), authority scores prioritize FETCH order —
    complementary to the endorsement ranks above.

    Recurrence over the distinct-edge graph (L1-normalized half-steps,
    so scores are comparable across graph sizes and the fixed-point is
    scale-free; h0 = 1/n):

        a_i(v) = Σ_{u→v} h_{i-1}(u)   then  a_i := a_i / Σ a_i
        h_i(u) = Σ_{u→v} a_i(v)       then  h_i := h_i / Σ h_i

    Nodes with no in-edges have authority 0; no out-edges → hub 0.
    Deterministic, fixed iterations — SQL-unrollable (oracle twin
    ``hits_rank``). Scale shape: per half-step one edges⋈scores join +
    one compact-key sum + one scalar-normalizer cross join (broadcast
    of a single row); per-round localCheckpoint bounds the plan like
    ``_power_iterate``. The float operation order inside each half-step
    (coalesce-then-divide) is mirrored by the SQL twin.
    """
    e = _edge_set(edges, src, dst)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )

    def _half(scores, score_col, edge_key, out_key, out_col):
        """One half-step: push ``score_col`` across edges keyed on
        ``edge_key`` → summed at ``out_key`` → L1-normalize over nodes."""
        raw = (
            e.join(scores.withColumnRenamed("node", edge_key), edge_key)
            .groupBy(out_key)
            .agg(F.sum(score_col).alias("_raw"))
        )
        total = raw.agg(
            F.coalesce(F.sum("_raw"), F.lit(0.0)).alias("_tot")
        )
        return (
            nodes.join(
                raw.withColumnRenamed(out_key, "node"), "node", "left"
            )
            .crossJoin(total)
            .select(
                "node",
                F.when(
                    F.col("_tot") > 0,
                    F.coalesce(F.col("_raw"), F.lit(0.0)) / F.col("_tot"),
                )
                .otherwise(F.lit(0.0))
                .alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    hub = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("hub"))
    # iterations=0 is defined as the init state (uniform 1/n both roles),
    # matching pagerank/_power_iterate's zero-iteration convention
    auth = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("authority")
    )
    for _ in range(iterations):
        auth = _half(hub, "hub", "src", "dst", "authority")
        hub = _half(auth, "authority", "dst", "src", "hub")
    return hub.join(auth, "node")
