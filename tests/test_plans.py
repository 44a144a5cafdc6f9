"""Physical-plan invariants — the scale properties are asserted, not assumed.

Each test captures `.explain("formatted")` and asserts the plan property
that matters at 100 TB: filters reach the parquet scan, scans read only the
columns the query projects (html:binary prunes out of every non-extraction
path — it dominates bytes), the fetch join broadcasts the wave side, and
expression work stays inside WholeStageCodegen.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _t(spark, name):
    return spark.read.parquet(os.path.join(SF, f"{name}.parquet"))


def test_filter_pushdown_reaches_scan(spark):
    li = _t(spark, "lineitem")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag")
    p = plan_of(q)
    assert "PushedFilters: [" in p and "l_shipdate" in p.split("PushedFilters")[1][:200], p


def test_column_pruning_reaches_scan(spark):
    li = _t(spark, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    p = plan_of(q)
    schema_line = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in schema_line and "l_quantity" in schema_line
    assert "l_comment" not in schema_line, schema_line


def test_fetch_join_broadcasts_wave_and_prunes_html(spark):
    """The crawl's fetch: corpus scan map-local (wave side broadcast), and a
    frontier-only path never reads the html column."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.functions.urls import with_url_columns
    import tempfile

    tmp = tempfile.mkdtemp(prefix="plancorpus_")
    generate_pages(spark, 2000, n_hosts=8).write.mode("overwrite").parquet(tmp)
    raw = spark.read.parquet(tmp)
    pages = with_url_columns(raw).select("url_canon", "warc_ts", "html", "lang")
    wave = with_url_columns(raw.limit(50).select("url")).select("url_canon", "host")

    fetched = pages.join(F.broadcast(wave), "url_canon", "inner")
    p = plan_of(fetched)
    assert "BroadcastHashJoin" in p, p
    # frontier bookkeeping (no extraction) must not read html bytes
    sched_path = with_url_columns(raw).select("url_canon", "host", "url_hash")
    p2 = plan_of(sched_path)
    schema_line = p2.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in schema_line, schema_line


def test_politeness_window_single_shuffle(spark):
    """Rank-and-cut is one Exchange (hashpartitioning on host) + one Window —
    no global sort of the frontier."""
    from hk_housing_datahub_spark.datagen import generate_seeds
    from hk_housing_datahub_spark.frontier.scheduler import schedule_wave
    from hk_housing_datahub_spark.functions.urls import with_url_columns

    seeds = with_url_columns(generate_seeds(spark, 500, 2000, n_hosts=8)).select(
        "url_canon", "host", "url_hash", "bucket", "priority",
        F.lit(0).cast("timestamp").alias("discovered_ts"), F.lit(0).alias("depth"),
    )
    p = plan_of(schedule_wave(seeds, None, 1000))
    tree = p.split("\n\n")[0]  # the indented operator tree (details repeat names)
    assert tree.count("Exchange") == 1, tree
    assert "Sort" in tree and "Window" in tree, tree
    assert "hashpartitioning(host" in p, p


def test_agg_is_partial_then_final(spark):
    """Map-side combine: HashAggregate appears below AND above the exchange."""
    o = _t(spark, "orders")
    q = o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))
    p = plan_of(q)
    assert p.count("HashAggregate") >= 2, p


def test_codegen_covers_scalar_pipeline(spark):
    """URL canonicalization stays inside WholeStageCodegen (no Python, no
    interpreted projections)."""
    from hk_housing_datahub_spark.functions.urls import with_url_columns

    d = _t(spark, "documents").select(
        F.concat(F.lit("https://h"), "doc_id", F.lit(".example.com/x")).alias("url")
    )
    p = plan_of(with_url_columns(d).select("url_canon", "url_hash"))
    tree = p.split("\n\n")[0]
    # '*' marks WholeStageCodegen nodes in formatted explain. (The query-sort
    # projection uses higher-order functions, which run interpreted — that
    # single Project legitimately lacks the marker.)
    assert "* Project" in tree, tree
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_extraction_is_single_arrow_pass(spark):
    """extract_df evaluates the UDF struct once (one ArrowEvalPython node),
    not once per projected field."""
    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.extract import extract_df

    pages = generate_pages(spark, 100, n_hosts=4)
    p = plan_of(extract_df(pages))
    tree = p.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1, tree


def test_star_extraction_is_all_jvm(spark):
    """The nested-response parse→explode→coerce→fold pipeline must contain
    zero Python evaluation nodes — from_json, arrays_zip, HOF folds and
    try_cast are all codegen-able Column expressions."""
    import __spark_entry__ as E

    plan = plan_of(E.queries()["star_transactions"](spark, SF))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan  # the explodes are JVM Generate nodes


def test_star_trend_lets_aqe_pick_broadcasts(spark):
    """transactions ⋈ units ⋈ buildings ⋈ estates ⋈ districts: NO hard
    broadcast hints anywhere (buildings/estates grow with the estate
    count, so a hint would override AQE's size check exactly where it
    stops being safe), yet the planner still picks BroadcastHashJoin for
    the under-threshold sides at this SF — size statistics, not hints,
    drive the strategy."""
    import __spark_entry__ as E

    df = E.queries()["star_price_trend"](spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # no hard hints survive analysis
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 3


def test_search_similar_single_chunk_pass_and_broadcast(spark):
    """EP3 composed search: the corpus chunking UDF must appear exactly
    ONCE in the plan (norms ride a window over the weights, not a second
    aggregate over the chunk lineage), the query side must broadcast, and
    nothing falls back to a cartesian product."""
    import __spark_entry__ as E

    plan = plan_of(E.queries()["search_similar"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1, tree
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_composed_pipelines_stay_vectorized(spark):
    """wiki_pipeline_docs: exactly the two owned pandas UDFs (wikitable
    expansion, chunking); lsh_dedup_drop: pure JVM (no Python nodes, no
    cartesian) — banding keeps the pair join an equi-join."""
    import __spark_entry__ as E

    wiki = plan_of(E.queries()["wiki_pipeline_docs"](spark, SF))
    assert wiki.split("\n\n")[0].count("ArrowEvalPython") == 2
    assert "BatchEvalPython" not in wiki
    lsh = plan_of(E.queries()["lsh_dedup_drop"](spark, SF))
    assert "ArrowEvalPython" not in lsh
    assert "BatchEvalPython" not in lsh
    assert "CartesianProduct" not in lsh


def test_sample_pack_one_exchange_and_pruned_scan(spark):
    """sample_pack_corpus at 100 TB: the sampling predicate runs inside the
    scan stage (never a separate pass), the scan reads only the 3 needed
    columns (text never loads), and packing costs exactly ONE shuffle (the
    bucket hash) with a per-bucket sort — no global sort anywhere."""
    import __spark_entry__ as E

    # another suite may have cached the documents relation; a cache hit
    # would swap the parquet scan for an all-columns InMemoryRelation and
    # make this pin measure the cache, not the production plan
    spark.catalog.clearCache()

    df = E.queries()["sample_pack_corpus"](spark, SF)
    p = plan_of(df)
    import re

    assert p.count("+- Exchange") == 1, p  # tree section: one shuffle node
    assert "hashpartitioning(bucket" in p, p
    rs = p.split("ReadSchema:")[1].split("\n")[0]
    assert "text" not in rs and "doc_id" in rs and "n_chars" in rs, rs
    # the md5 sampling threshold runs in the scan stage's Filter
    assert "Condition : (substring(md5" in p, p
    # per-bucket sort only — the trailing `false` = non-global sort
    assert re.search(
        r"Arguments: \[bucket#\d+L? ASC NULLS FIRST, doc_id#\d+L? ASC NULLS"
        r" FIRST\], false", p
    ), p


def test_prepare_corpus_funnel_all_jvm(spark):
    """The composed corpus funnel (exact-dedup recipe): dedup window +
    cluster propagation + quality gate + PII regex + sampling + packing —
    ZERO Python evaluation nodes. Every stage is JVM Column expressions,
    so the whole funnel rides whole-stage codegen at any corpus size."""
    import __spark_entry__ as E

    df = E.queries()["prepare_corpus"](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p[:2000]


def test_boilerplate_removal_no_forced_broadcast(spark):
    """drop_boilerplate_lines at 100 TB: the hot-line set is
    corpus-dependent (with a small max_line_df at web scale it is every
    common sentence on the web), so the plan must carry NO hard broadcast
    hint — AQE decides from the hot set's runtime size. At this SF the
    set really is tiny, so after execution AQE's final plan should have
    converted the hot-set join to a broadcast join on its own; and no
    cartesian or Python nodes appear anywhere."""
    from hk_housing_datahub_spark.operators.textops import (
        drop_boilerplate_lines,
    )

    spark.catalog.clearCache()
    d = _t(spark, "documents")
    df = drop_boilerplate_lines(d)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:2000]
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    df.count()  # run it so AQE finalizes the join strategies
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final[:3000]


def test_pk_bloom_fast_path_plan_no_committed_exchange(spark, tmp_path):
    """The star load's per-batch dedup at 100 TB: when the committed-PK
    bloom flags nothing as maybe-committed (the normal case — fresh keys),
    the frame that gets appended is the probe output alone. Its plan must
    contain NO join and NO exchange — in particular no shuffle of the
    committed key set, which is what the bloom exists to avoid — and
    exactly the one Arrow pass for the probe UDF."""
    from hk_housing_datahub_spark.sources.pkbloom import PKBloomIndex
    from hk_housing_datahub_spark.sources.tables import TableCatalog
    from hk_housing_datahub_spark.star.pipeline import _append_deduped
    from hk_housing_datahub_spark.star.schema import create_star_tables

    schema = "region_id string, region_name_zh string, region_name_en string"
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    bloom = PKBloomIndex(cat).ensure("regions", ["region_id"])
    _append_deduped(
        cat,
        "regions",
        spark.createDataFrame(
            [(f"R{i}", f"區{i}", f"Region {i}") for i in range(100)], schema
        ),
        bloom,
    )
    batch = spark.createDataFrame(
        [(f"R{i}", f"區{i}", f"Region {i}") for i in range(100, 200)], schema
    )
    probed = bloom.probe("regions", batch, ["region_id"])
    assert probed.filter(F.col("_pk_maybe")).isEmpty()  # all fresh keys
    definite = probed.filter(~F.col("_pk_maybe")).drop("_pk_maybe")
    tree = plan_of(definite).split("\n\n")[0]
    assert "Join" not in tree and "Exchange" not in tree, tree
    assert tree.count("ArrowEvalPython") == 1, tree


def test_lm_perplexity_is_all_jvm(spark):
    """fit + score of the bigram LM: zero Python evaluation nodes (HOF
    bigrams, count aggregates, compact-key joins, one per-doc mean), no
    cartesian product anywhere."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_bigram_lm,
        perplexity_score,
    )

    d = _t(spark, "documents")
    lm = fit_bigram_lm(d.filter(F.col("doc_id") % 2 == 0))
    p = plan_of(perplexity_score(d.filter(F.col("doc_id") % 2 == 1), lm))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_render_bins_reuses_pack_partitioning(spark):
    """The packed-sequence path (pack_greedy → render_bins) at 100 TB:
    exactly ONE exchange end to end. The pack step shuffles on bucket for
    its window; the render's groupBy(bucket, bin_id) is satisfied by that
    same partitioning (bucket is a prefix of the group key), so Catalyst
    adds NO second shuffle — the sequences materialize map-side on the
    packed partitions. Zero Python nodes anywhere."""
    from hk_housing_datahub_spark.operators.packing import (
        pack_greedy,
        render_bins,
    )

    d = _t(spark, "documents").select(
        "doc_id", "text", F.col("n_chars").alias("n_tokens")
    )
    p = plan_of(render_bins(pack_greedy(d, "doc_id", "n_tokens", 20000)))
    tree = p.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "hashpartitioning(bucket" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_span_dedup_no_forced_broadcast_all_jvm(spark):
    """duplicated-span dedup at 100 TB: the duplicated-gram set is
    corpus-dependent (boilerplate-broadcast lesson) so the plan must carry
    no hard broadcast hint — AQE sizes the gram join at runtime; the
    whole operator is JVM HOFs (no Python nodes, no cartesian); and the
    gram count is map-side combined (partial+final HashAggregate)."""
    from hk_housing_datahub_spark.operators.spandedup import (
        duplicated_span_profile,
    )

    spark.catalog.clearCache()
    df = duplicated_span_profile(_t(spark, "documents"), k=8)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:2000]
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2, p


def test_training_order_broadcasts_bounded_offsets_only(spark):
    """training_order's global rank: the 256-row offset table joins
    broadcast (bounded by construction — the one legitimate broadcast),
    the data side shuffles once on the bucket key, and nothing sorts
    globally (the only unpartitioned window is the 256-row offsets sum)."""
    from hk_housing_datahub_spark.operators.packing import training_order

    spark.catalog.clearCache()
    df = training_order(_t(spark, "documents").select("doc_id"), ["doc_id"])
    p = plan_of(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # data-side partitioning: the ranking window keys on shuffle_bucket
    assert "hashpartitioning(shuffle_bucket" in p, p


def test_vocab_agg_partial_then_final(spark):
    """token_vocabulary: the corpus-sized token count must map-side
    combine (partial+final HashAggregate around one exchange) — at 100 TB
    the shuffle carries one row per distinct token per partition, not one
    row per token occurrence."""
    from hk_housing_datahub_spark.operators.vocab import token_vocabulary

    spark.catalog.clearCache()
    p = plan_of(token_vocabulary(_t(spark, "documents")))
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_gopher_repetition_is_map_only(spark):
    """The full repetition battery is one projection over the scan: no
    Exchange, no Python eval, no join — a pure map pass at any corpus
    size (the sorted-run aggregates live inside the row)."""
    from hk_housing_datahub_spark.operators.textops import (
        gopher_repetition_flags,
    )

    p = plan_of(gopher_repetition_flags(_t(spark, "documents")))
    assert "Exchange" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Join" not in p


def test_pagerank_iteration_plan_compact_key_only(spark):
    """One PageRank iteration's plan: the heavy joins key on src/node
    (compact keys), no cartesian product, no Python eval; the dangling
    scalar enters through a single-row join (BroadcastNestedLoopJoin on
    a 1-row aggregate is fine — it is the cross join of a scalar), and
    per-round localCheckpoint keeps the plan O(1) in iteration count:
    the 3-iteration plan is not ~3x the 1-iteration plan."""
    from hk_housing_datahub_spark.operators.linkgraph import pagerank

    e = _t(spark, "documents").select(
        F.col("doc_id").alias("src"),
        F.pmod(F.col("doc_id") * 7 + 1, F.lit(500)).alias("dst"),
    )
    p1 = plan_of(pagerank(e, iterations=1))
    p3 = plan_of(pagerank(e, iterations=3))
    for p in (p1, p3):
        assert "CartesianProduct" not in p
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert len(p3) < 2 * len(p1), (len(p1), len(p3))


def test_recrawl_schedule_single_exchange(spark):
    """Change-rate estimation: the lag window and the per-URL aggregate
    key on the same column, so ONE hash exchange feeds both — per-URL
    state is a handful of longs at 10^10 URLs."""
    from hk_housing_datahub_spark.operators.recrawl import recrawl_schedule
    from hk_housing_datahub_spark.sources.cdx import cdx_records

    caps = cdx_records(_t(spark, "documents").selectExpr(
        "concat('https://h', doc_id % 10, '.example.com/', doc_id) AS url",
        "timestamp_seconds(doc_id) AS warc_ts",
        "lang",
        "cast(text AS binary) AS html",
    ))
    p = plan_of(recrawl_schedule(caps))
    assert p.count("hashpartitioning(") == 1, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_snapshot_diff_single_aggregate_no_window(spark):
    """Crawl-to-crawl diff is one groupBy (struct-max snapshot selection
    stays inside the partial aggregate) — no window, no join."""
    from hk_housing_datahub_spark.sources.cdx import cdx_snapshot_diff

    caps = _t(spark, "documents").selectExpr(
        "concat('u', doc_id % 50) AS url_canon",
        "timestamp_seconds(1700000000 + doc_id) AS warc_ts",
        "md5(cast(doc_id AS string)) AS digest",
    )
    p = plan_of(cdx_snapshot_diff(caps, 1_700_000_100, 1_700_000_400))
    assert p.count("hashpartitioning(") == 1, p
    assert "Window" not in p and "Join" not in p
    assert "partial_max" in p or "HashAggregate" in p


def test_host_graph_two_level_agg_one_exchange_chain(spark):
    """The (pair, page) pre-aggregate and the pair rollup share the
    prefix of their grouping key: the rollup adds NO second wide
    shuffle over page-level data (AQE/exchange reuse keeps it one
    chain keyed by the compact host pair)."""
    from hk_housing_datahub_spark.operators.linkgraph import host_graph

    edges = _t(spark, "documents").selectExpr(
        "concat('https://h', doc_id % 10, '.example.com/p/', doc_id)"
        " AS src_url",
        "concat('https://h', (doc_id * 7 + 1) % 10, '.example.com/p/',"
        " doc_id) AS dst_url",
    )
    p = plan_of(host_graph(edges))
    # exchanges key on host-pair columns only — never on the raw URL
    segs = p.split("hashpartitioning(")[1:]
    assert segs, p
    for seg in segs:
        head = seg[:120]
        assert "src_url" not in head and "dst_url" not in head, head
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_trap_signals_map_side_features_one_exchange(spark):
    """Per-URL trap features are codegen projections; the host rollup is
    the only exchange (count-distinct adds its standard expand, still
    keyed on host)."""
    from hk_housing_datahub_spark.operators.traps import host_trap_signals

    urls = _t(spark, "documents").selectExpr(
        "concat('https://h', doc_id % 10, '.example.com/a/b/', doc_id)"
        " AS url",
        "md5(cast(doc_id AS string)) AS digest",
    )
    p = plan_of(host_trap_signals(urls, digest_col="digest"))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Join" not in p
    segs = p.split("hashpartitioning(")[1:]
    assert segs, p
    for seg in segs:
        assert "url#" not in seg[:120], seg[:120]


def test_dsir_scoring_broadcasts_model_side(spark):
    """The fitted log-ratio table is dim-bounded and must broadcast into
    the feature scoring join — the corpus side never reshuffles on the
    bucket key."""
    from hk_housing_datahub_spark.operators.importance import (
        fit_logratio,
        hashed_ngram_features,
        importance_weights,
    )

    docs = _t(spark, "documents")
    feats = hashed_ngram_features(docs, dim=512)
    lr = fit_logratio(
        hashed_ngram_features(docs.filter(F.col("lang") == "en"), dim=512),
        feats,
        dim=512,
    )
    p = plan_of(importance_weights(feats, lr))
    assert "BroadcastHashJoin" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_redirect_doubling_compact_key_no_python(spark):
    """Each doubling round is a compact-key self-join: no cartesian
    product, no Python eval; the state frame is (url, target, hops)."""
    from hk_housing_datahub_spark.operators.redirects import (
        resolve_redirects,
    )

    edges = _t(spark, "documents").selectExpr(
        "concat('u', doc_id) AS src_url",
        "concat('u', doc_id - (doc_id % 10)) AS dst_url",
    )
    p = plan_of(resolve_redirects(edges, max_rounds=2))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_content_sniff_is_map_only(spark):
    from hk_housing_datahub_spark.multimodal.binary import (
        sniff_content_type,
    )

    docs = _t(spark, "documents").selectExpr(
        "encode(text, 'UTF-8') AS payload"
    )
    p = plan_of(docs.select(sniff_content_type(F.col("payload"))))
    assert "Exchange" not in p and "Join" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_dust_rules_no_forced_broadcast_all_jvm(spark):
    """DUST at 100 TB: both the validation join (rewrites vs captures,
    url-keyed) and dust_apply's host-keyed rule join are corpus-dependent
    — no hard broadcast hint anywhere (AQE sizes them); no Python nodes,
    no cartesian; the (host, rule) verdict agg is map-side combined."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.dust import (
        dust_apply,
        dust_rules,
    )

    spark.catalog.clearCache()
    caps = _t(spark, "documents").select(
        F.concat(
            F.lit("http://h"),
            F.pmod("doc_id", F.lit(5)),
            F.lit(".com/p/"),
            F.col("doc_id"),
            F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("?s=1")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
        F.md5(F.col("doc_id").cast("string")).alias("digest"),
    )
    rules = dust_rules(caps)
    analyzed = rules._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:2000]
    p = plan_of(rules)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2, p

    applied = dust_apply(caps.select("url"), rules)
    analyzed2 = applied._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed2, analyzed2[:2000]
    assert "BatchEvalPython" not in plan_of(applied)


def test_soft404_no_forced_broadcast_one_host_digest_exchange(spark):
    """soft-404 at 100 TB: the signature join is per-probed-host
    (corpus-dependent — no hard hint, AQE decides) and the dominance
    count is one (host, digest)-keyed aggregate with map-side combine;
    flags are codegen, no Python nodes."""
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.soft404 import (
        flag_soft404,
        probe_urls,
        soft404_signatures,
    )

    spark.catalog.clearCache()
    caps = _t(spark, "documents").select(
        F.concat(
            F.lit("http://h"),
            F.pmod("doc_id", F.lit(5)),
            F.lit(".com/p/"),
            F.col("doc_id"),
        ).alias("url"),
        F.md5(F.col("doc_id").cast("string")).alias("digest"),
        F.col("text"),
    )
    hosts = caps.select(
        F.regexp_extract("url", "http://([^/]*)", 1).alias("host")
    ).distinct()
    sigs = soft404_signatures(caps, probe_urls(hosts))
    flagged = flag_soft404(caps, sigs)
    analyzed = flagged._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:2000]
    p = plan_of(flagged)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "hashpartitioning(host" in p, p
    assert p.count("HashAggregate") >= 2, p


def test_hyperball_round_sketch_agg_combines_map_side(spark):
    """One HyperBall round at 10^10 edges: the edge-state join keys on
    the node, and the sketch union is a partial+final aggregate pair
    (ObjectHashAggregate ×2 around the Exchange) so the shuffle carries
    one partially-merged sketch per (partition, node) — never one row
    per edge. Zero Python nodes; no cartesian product."""
    from hk_housing_datahub_spark.operators.linkgraph import _edge_set

    d = _t(spark, "documents").select("doc_id")
    e = _edge_set(
        d.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * 7 + 1, F.lit(500)).alias("dst"),
        ),
        "src",
        "dst",
    )
    state = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .groupBy("node")
        .agg(F.hll_sketch_agg("node", 12).alias("sk"))
    )
    contrib = (
        e.join(state, e["src"] == state["node"])
        .groupBy(e["dst"].alias("node"))
        .agg(F.hll_union_agg("sk").alias("insk"))
    )
    p = plan_of(contrib)
    assert p.count("ObjectHashAggregate") >= 2  # partial + final
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_bpe_pair_counts_partial_then_final_all_jvm(spark):
    """One BPE iteration's pair counting: partial+final HashAggregate
    around one exchange keyed on the pair (at vocab scale the shuffle
    carries one row per distinct pair per partition), fold/transform
    all JVM — no Python eval anywhere in the learn loop."""
    from hk_housing_datahub_spark.operators.bpe import (
        merge_pair,
        symbol_pair_counts,
        word_symbols,
    )

    wf = _t(spark, "documents").selectExpr(
        "doc_id", "text"
    ).limit(50).select(
        F.col("doc_id"),
        F.lit(1).alias("cnt"),
        word_symbols(F.col("text")).alias("syms"),
    ).withColumn("syms", merge_pair(F.col("syms"), "a", "b"))
    p = plan_of(symbol_pair_counts(wf))
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_phrase_search_broadcasts_offsets_restricts_postings(spark):
    """The phrase-offset table must broadcast (it is bounded by the
    QUERY, never the corpus) and the only wide shuffle keys on the
    compact (doc, anchor) aggregate."""
    from hk_housing_datahub_spark.operators.bm25 import phrase_search

    p = plan_of(phrase_search(_t(spark, "documents"), "table table"))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_script_profile_is_map_only(spark):
    """The full per-script battery is ONE projection over the scan —
    no Exchange, no join, no Python eval at any corpus size."""
    from hk_housing_datahub_spark.operators.textops import script_profile

    p = plan_of(script_profile(_t(spark, "documents")))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_phrase_query_term_filter_pushes_to_postings_scan(spark, tmp_path):
    """A phrase query over the PERSISTED positional index must read only
    its own terms' postings: the In(term, ...) filter reaches the
    parquet scan as a pushed filter."""
    from hk_housing_datahub_spark.operators.bm25 import (
        phrase_search_postings,
        positional_postings,
    )

    idx = str(tmp_path / "postings")
    positional_postings(_t(spark, "documents")).write.parquet(idx)
    post = spark.read.parquet(idx)
    p = plan_of(phrase_search_postings(post, "table table value"))
    pushed = p.split("PushedFilters")[1][:300] if "PushedFilters" in p else ""
    assert "term" in pushed and "In" in pushed, p


def test_readability_is_map_only(spark):
    """The readability battery is one codegen projection over the scan:
    no Exchange, no Python eval, no join — a pure map pass at any
    corpus size."""
    from hk_housing_datahub_spark.operators.textops import (
        readability_scores,
    )

    p = plan_of(readability_scores(_t(spark, "documents")))
    assert "Exchange" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Join" not in p


def test_badwords_gate_no_forced_broadcast_all_jvm(spark):
    """The bad-words gate joins the exploded corpus against the term
    table with NO forced broadcast hint (a blocklist can be UT1-scale;
    AQE decides) and stays fully JVM-side."""
    from hk_housing_datahub_spark.operators.textops import badwords_filter

    d = _t(spark, "documents")
    bad = d.sparkSession.createDataFrame([("slow",), ("dup",)], ["term"])
    df = badwords_filter(d, bad, max_hits=1)
    assert "broadcast" not in df._jdf.queryExecution().logical().toString().lower()
    p = plan_of(df)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_kn_scoring_all_jvm_compact_joins(spark):
    """Interpolated-KN fit + score: zero Python eval nodes and no
    cartesian product — the three model tables join on compact string
    keys exactly like the add-k scorer."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_kneser_ney,
        kn_perplexity_score,
    )

    d = _t(spark, "documents")
    lm = fit_kneser_ney(d.filter(F.col("doc_id") % 2 == 0))
    p = plan_of(kn_perplexity_score(d.filter(F.col("doc_id") % 2 == 1), lm))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_kneser_ney3,
        kn3_perplexity_score,
    )

    lm3 = fit_kneser_ney3(d.filter(F.col("doc_id") % 2 == 0))
    p3 = plan_of(kn3_perplexity_score(d.filter(F.col("doc_id") % 2 == 1), lm3))
    assert "ArrowEvalPython" not in p3 and "BatchEvalPython" not in p3
    assert "CartesianProduct" not in p3


def test_nb_langid_model_broadcasts_langs_only(spark):
    """NB language-ID scoring: the only cross join is docs × the
    |langs|-row rollup (explicitly broadcast); the gram join is a plain
    equi-join with no forced broadcast (the gram table is Zipf-bounded
    but corpus-dependent — AQE decides); all JVM."""
    from hk_housing_datahub_spark.operators.langid_nb import (
        fit_nb_langid,
        nb_language_scores,
    )

    d = _t(spark, "documents")
    model = fit_nb_langid(d.filter(F.col("doc_id") % 2 == 0))
    p = plan_of(
        nb_language_scores(d.filter(F.col("doc_id") % 2 == 1), model)
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the langs fan-out is the one nested-loop (broadcast) join; the gram
    # join must be an equi-join, not a cartesian product
    assert "CartesianProduct" not in p


def test_bitext_linear_plan_no_cache(spark):
    """Margin mining streams the pair table through window exchanges in
    ONE linear plan — no InMemoryRelation (the persisted-cache leak an
    earlier draft had), no Python eval; the brute path's only nested
    loop is the documented broadcast cross join of the target side."""
    from hk_housing_datahub_spark.operators.similarity import (
        bitext_margin_mine,
    )

    e = _t(spark, "embeddings")
    df = bitext_margin_mine(
        e.filter(F.col("vec_id") % 10 == 0),
        e.filter(F.col("vec_id") % 10 == 5),
        k=4,
    )
    p = plan_of(df)
    assert "InMemoryRelation" not in p and "InMemoryTableScan" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def _global_window_specs(df) -> list[str]:
    """windowspecdefinition first-args that are SORT specs — i.e. windows
    with an EMPTY partitionBy: a partitioned window lists its partition
    columns first (`windowspecdefinition(k#0, x#1 ASC ...)`), a global one
    leads with the sort order (`windowspecdefinition(x#1 ASC ...)`)."""
    import re

    s = df._jdf.queryExecution().optimizedPlan().toString()
    bad = []
    for m in re.finditer(r"windowspecdefinition\(([^,)]*)", s):
        first = m.group(1)
        if " ASC" in first or " DESC" in first:
            bad.append(first)
    return bad


def test_dsir_selection_no_single_partition_stage(spark):
    """Round-4 verdict #1: the deployed DSIR Gumbel top-k must not funnel
    the corpus's weight table through one partition. The banded two-phase
    cut keeps the selection plan free of Exchange SinglePartition AND of
    any unpartitioned window."""
    from hk_housing_datahub_spark.operators.importance import (
        dsir_select,
        fit_logratio,
        hashed_ngram_features,
        importance_weights,
    )

    docs = _t(spark, "documents")
    feats = hashed_ngram_features(docs, dim=256)
    lr = fit_logratio(
        hashed_ngram_features(docs.filter(F.col("lang") == "en"), dim=256),
        feats,
        dim=256,
    )
    sel = dsir_select(docs, importance_weights(feats, lr), k=50, seed=1)
    assert _global_window_specs(sel) == []
    p = plan_of(sel)
    assert "Exchange SinglePartition" not in p, p


def test_allocation_fairness_windows_all_partitioned(spark):
    """Round-4 verdict #2: the fairness rank over the key table must be
    band-partitioned — no unpartitioned window anywhere in the plan. The
    scalar one-row aggregates still reduce through a bounded
    SinglePartition exchange (partial -> final over ≤ numPartitions
    rows), which is the correct shape; the pin is on windows only."""
    from hk_housing_datahub_spark.operators.rollups import (
        allocation_fairness,
    )

    docs = _t(spark, "documents")
    fa = allocation_fairness(docs, "lang")
    assert _global_window_specs(fa) == []


def test_no_global_windows_in_probe_and_sweep_entries(spark):
    """Round-5 sweep: a full scan of every driver query found exactly
    four with unpartitioned windows — the stitched-probe builders
    (lead over doc_id), the threshold sweep's bucket cumsum, and the
    training-order offsets. All four are rewritten (equi-join probes,
    ordered array fold, bounded theta-join); this pins the whole
    query surface stays at zero."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "sentence_code_switch",
        "coherence_scores",
        "quality_threshold_sweep",
        "training_order_sample",
        "prepare_corpus",
        "dsir_weights",
        "host_fairness",
    ):
        df = qs[name](spark, SF)
        assert _global_window_specs(df) == [], name
