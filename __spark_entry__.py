"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: a full resumable frontier crawl over a
deterministic synthetic Common-Crawl-style corpus (BASELINE.json
input_hint shape), returning the extracted listings table.

`queries()` — one entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline battery (dedup / similarity / text analysis /
multimodal / streaming). `oracle_sql()` provides a DuckDB twin for every
SQL-expressible one; rows-only entries (custom stateful / UDF-driven ops)
are verified by pytest instead (tests/).

All double aggregates are rounded identically on both sides; timestamps are
emitted as formatted strings (UTC pinned per query) so value-hash
comparison is engine-stable.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from hk_housing_datahub_spark.datagen import (
    generate_pages,
    generate_robots,
    generate_seeds,
)
from hk_housing_datahub_spark.extract import extract_df
from hk_housing_datahub_spark.frontier import CrawlEngine
from hk_housing_datahub_spark.functions import text as TX
from hk_housing_datahub_spark.functions import urls as U
from hk_housing_datahub_spark.functions.chunking import chunk_documents
from hk_housing_datahub_spark.functions.variants import title_variants_basic
from hk_housing_datahub_spark.functions.embedding import embed_documents
from hk_housing_datahub_spark.functions.wikitables import expand_wikitables
from hk_housing_datahub_spark.multimodal import attach_payload, decode_payload_meta
from hk_housing_datahub_spark.operators import dedup as DD
from hk_housing_datahub_spark.operators import nested as NJ
from hk_housing_datahub_spark.operators import joins as J
from hk_housing_datahub_spark.operators import rollups as R
from hk_housing_datahub_spark.operators import similarity as SIM
from hk_housing_datahub_spark.operators import textops as TO
from hk_housing_datahub_spark import star as ST
from hk_housing_datahub_spark.streaming import run_windowed_counts


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-wave politeness-budgeted crawl over a 2000-page synthetic
    corpus (with dead links) → extracted listings (url, fields, lineage
    columns). Runs the full scale path: cuckoo-filter seen set, two-phase
    hot-host politeness window, row-level fetch retry."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 2000, 20
    pages = generate_pages(spark, n, n_hosts=hosts, dead_link_every=11)
    seeds = generate_seeds(spark, 25, n, n_hosts=hosts)
    robots = generate_robots(spark, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_entry_")
    eng = CrawlEngine(
        spark, pages, robots, ckpt, seen_mode="cuckoo", n_buckets=32,
        cuckoo_rows=1 << 12, wave_ms=1000, max_depth=2, max_attempts=2,
        politeness_salt=4,
    )
    res = eng.run(seeds, max_waves=3)
    return res.listings(spark).drop("outlinks")


# --------------------------------------------------------------------------
# oracle-checked queries (SQL-expressible)
# --------------------------------------------------------------------------

def _q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _monthly_rollup(spark, sf):
    o = _t(spark, sf, "orders")
    out = R.monthly_rollup(o)
    return out.withColumn(
        "month", F.date_format("month", "yyyy-MM-dd")
    )


def _latest_order_per_customer(spark, sf):
    o = _t(spark, sf, "orders")
    top = R.latest_per_group(o, "o_custkey", "o_orderdate", "o_orderkey")
    return top.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("latest_order"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        F.round("o_totalprice", 2).alias("price"),
    )


def _last_non_null_fold(spark, sf):
    ev = _t(spark, sf, "events").withColumn(
        "v", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    out = R.last_non_null_fold(
        ev, "user_id", "ts", ["v"], tiebreak_cols=["event_id"]
    )
    return out.select("user_id", F.round("last_v", 4).alias("last_val"))


def _bilingual_pair_join(spark, sf):
    docs = _t(spark, sf, "documents")
    return J.bilingual_pair_join(docs, "source", "en", "zh")


def _group_concat_customers(spark, sf):
    c = _t(spark, sf, "customer")
    return R.group_concat_sorted(c, "c_nationkey", "c_custkey")


def _customers_without_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return J.unseen_anti_join(
        c.select(F.col("c_custkey")), o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    )


def _prefix_filter_parts(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.filter(F.col("p_name").startswith("s"))
        .groupBy("p_type")
        .agg(
            F.countDistinct("p_brand").alias("n_brands"),
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


def _variant_title_lookup(spark, sf):
    p = _t(spark, sf, "part")
    titles = (
        p.filter(F.pmod("p_partkey", F.lit(7)) == 0)
        .select(F.upper(F.col("p_name")).alias("title"))
        .distinct()
    )
    dim = (
        p.filter(F.pmod("p_partkey", F.lit(3)) == 0)
        .select(F.col("p_name").alias("page_title"))
        .distinct()
    )
    exploded = titles.select(
        "title",
        F.posexplode(title_variants_basic(F.col("title"))).alias(
            "variant_rank", "variant"
        ),
    )
    hits = exploded.join(F.broadcast(dim), exploded.variant == dim.page_title)
    w = W.partitionBy("title").orderBy("variant_rank")
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("title", "page_title", "variant_rank")
    )
    return titles.join(best, "title", "left")


def _politeness_schedule(spark, sf):
    o = _t(spark, sf, "orders")
    frontier = o.select(
        F.concat(
            F.lit("https://h"),
            F.pmod("o_custkey", F.lit(40)),
            F.lit(".example.com/o/"),
            F.col("o_orderkey"),
        ).alias("url_canon"),
        F.concat(
            F.lit("h"), F.pmod("o_custkey", F.lit(40)), F.lit(".example.com")
        ).alias("host"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority"),
        F.col("o_orderdate").alias("discovered_ts"),
    )
    w = W.partitionBy("host").orderBy("priority", "discovered_ts", "url_canon")
    return (
        frontier.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= 5)
        .select("host", "host_rank", "url_canon")
    )


def _url_canonicalize(spark, sf):
    d = _t(spark, sf, "documents")
    messy = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://Host"),
            F.pmod("doc_id", F.lit(20)),
            F.lit(".Example.COM:443/path/"),
            F.col("doc_id"),
            F.when(F.pmod("doc_id", F.lit(3)) == 0, F.lit("?b=2&a=1"))
            .when(F.pmod("doc_id", F.lit(3)) == 1, F.lit("?a=1"))
            .otherwise(F.lit("")),
            F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("#frag")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )
    return messy.select(
        "doc_id",
        U.canonicalize_url(F.col("url")).alias("url_canon"),
        U.url_host(F.col("url")).alias("host"),
    )


def _corpus_lang_profile(spark, sf):
    """Per-lang corpus profile: doc counts + distinct normalized
    fingerprints (A2, operators/dedup.py exact_dedup_stats semantics) +
    token totals (F10) in ONE aggregate — the per-operator pieces share
    the grouping, so one driver entry value-checks both."""
    d = _t(spark, sf, "documents")
    prof = d.select(
        "lang",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )
    return prof.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


def _ngram_jaccard_pairs(spark, sf):
    # max_shingle_df caps hot posting lists (a shingle in k docs contributes
    # k^2 join rows) — the standalone-at-100x guard; oracle mirrors the cap.
    return DD.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_df=50
    )


def _ngram_containment_pairs(spark, sf):
    """Directed shingle containment (operators/dedup.py
    ngram_containment_pairs, Broder 1997): |src∩dst|/|src| >= 0.6 —
    the asymmetric measure that catches a short doc quoted inside a
    long one. Twin reuses the jaccard oracle's inverted index and
    derives both directions from the undirected intersection."""
    return DD.ngram_containment_pairs(
        _t(spark, sf, "documents"), threshold=0.6, max_shingle_df=50
    )


def _dedup_clusters(spark, sf):
    """Near-dup cluster canonicalization: Jaccard pairs → connected
    components (iterative min-label propagation) → keep-lowest-id
    canonical per cluster; singletons are their own cluster. Oracle =
    transitive closure via a DuckDB recursive CTE."""
    out = DD.dedup_clusters(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_df=50
    )
    return out.select(
        "doc_id", "cluster_id", F.col("is_canonical").cast("int").alias("is_canonical")
    )


def _dedup_cluster_sizes(spark, sf):
    """Near-dup cluster-size histogram (size → clusters → docs): the
    dedup-audit number a curation run reports — how much mass the
    near-dup pass removes and whether one mega-cluster dominates
    (template families). Two tiny aggregates over the cluster
    assignment; oracle composes the recursive-CTE closure twin."""
    out = DD.dedup_clusters(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_df=50
    )
    sizes = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


def _drop_exact_dups(spark, sf):
    """Corpus filter twin of dedup_exact_stats: keep the lowest-id document
    per normalized fingerprint."""
    out = DD.drop_exact_dups(_t(spark, sf, "documents"))
    return out.select("doc_id", "lang", "source", "n_chars")


def _drop_near_dups(spark, sf):
    """End-user near-dup corpus filter: exactly the canonical (lowest-id)
    document of every transitive near-dup cluster survives."""
    out = DD.drop_near_dups(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_df=50
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def _drop_dup_filters(spark, sf):
    """The three corpus dedup filters union-merged under a method label (one
    driver window slot carries all three hash checks): exact keeps the
    lowest-id doc per normalized fingerprint, near keeps each transitive
    near-dup cluster's canonical doc, substring keeps docs whose
    corpus-duplicated-span coverage (Lee et al. 2022 suffix-array dedup,
    re-expressed as rolling 8-gram hashing — operators/spandedup.py) is
    <= 20% of their tokens."""
    from hk_housing_datahub_spark.operators.spandedup import (
        drop_duplicated_span_docs,
    )

    cols = ["doc_id", "lang", "source", "n_chars"]
    ex = _drop_exact_dups(spark, sf).select(
        F.lit("exact").alias("method"), *cols
    )
    nr = _drop_near_dups(spark, sf).select(
        F.lit("near").alias("method"), *cols
    )
    sp = drop_duplicated_span_docs(
        _t(spark, sf, "documents"), k=8, max_dup_frac=0.2
    ).select(F.lit("substring").alias("method"), *cols)
    return ex.unionByName(nr).unionByName(sp)


def _sample_pack_corpus(spark, sf):
    """Deterministic training-data layout: stratified hash-sample the corpus
    (50% en, 35% zh, 20% rest — md5-keyed, so membership is re-derivable by
    any engine), then pack the sample head-to-tail into 20k-char bins within
    256 hash buckets (operators/sampling.py, operators/packing.py)."""
    from hk_housing_datahub_spark.operators.packing import pack_greedy
    from hk_housing_datahub_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = _t(spark, sf, "documents")
    samp = stratified_hash_sample(
        docs,
        "lang",
        {"en": 0.5, "zh": 0.35},
        default_rate=0.2,
        key_cols=["doc_id"],
        salt="r3",
    )
    packed = pack_greedy(samp, "doc_id", "n_chars", budget=20_000)
    return packed.select("doc_id", "lang", "bucket", "bin_id", "n_chars")


def _lang_confusion(spark, sf):
    return TO.lang_confusion(_t(spark, sf, "documents"))


def _quality_by_source(spark, sf):
    return TO.quality_by_source(_t(spark, sf, "documents"))


def _doc_fingerprints(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def _ann_topk_cosine(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.pmod("vec_id", F.lit(25)) == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return SIM.brute_force_topk(e, q, k=5).select("qid", "nid", "cos_sim", "rnk")


def _embedding_neardup(spark, sf):
    # Blocked near-dup (operators/similarity.py): the label column is the
    # blocking key (production: a coarse LSH bucket), turning the O(n^2)
    # cross join into a per-block equi-join. Oracle blocks identically.
    e = _t(spark, sf, "embeddings").filter(F.pmod("vec_id", F.lit(5)) == 0)
    return SIM.embedding_neardup_pairs(e, threshold=0.4)


def _lsh_dedup_drop(spark, sf):
    """The composed 100-TB dedup path as ONE operator
    (operators/dedup.py minhash_lsh_dedup): MinHash+LSH candidates →
    exact DF-capped Jaccard verification of candidates only →
    connected components → keep-lowest-id survivors. Oracle = the exact
    path's recursive-CTE twin; equality holds because every candidate is
    verified (exact precision) and banding recall is ≥ 1-1.1e-4 per true
    pair at the 0.5 threshold (bands=32, rows=2) on this deterministic
    corpus."""
    out = DD.minhash_lsh_dedup(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_df=50
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def _search_similar(spark, sf):
    """EP3 composed query path (reference embedding.py:290-307
    ``search_similar``): documents → sentence-aware chunks → sparse hashed
    embedding (integer weights, inverted-index layout) for corpus AND
    query texts → cosine top-5 per query. One text-in → neighbors-out
    operator (operators/similarity.py search_similar); every doc_id%101
    document's raw text plays the user query."""
    docs = _t(spark, sf, "documents")
    chunks = chunk_documents(docs)
    queries = docs.filter(F.pmod("doc_id", F.lit(101)) == 0).select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    )
    return SIM.search_similar(chunks, queries, k=5)


def _sessionize_events(spark, sf):
    ev = _t(spark, sf, "events")
    out = R.sessionize(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        "n_events",
    )


def _tumbling_counts(spark, sf):
    ev = _t(spark, sf, "events")
    out = R.tumbling_counts(ev)
    return out.select(
        "event_type",
        F.date_format("win", "yyyy-MM-dd HH:mm:ss").alias("win_ts"),
        "n",
        "total_value",
    )


def _topk_orders_per_customer(spark, sf):
    o = _t(spark, sf, "orders")
    top = R.topk_per_group(o, "o_custkey", "o_totalprice", "o_orderkey", 3)
    return top.select(
        F.col("o_custkey").alias("custkey"),
        "rnk",
        F.col("o_orderkey").alias("orderkey"),
        F.round("o_totalprice", 2).alias("price"),
    )


def _nested_json_explode(spark, sf):
    return NJ.nested_json_explode(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    )


def _cube_order_stats(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# star-schema extraction queries (SURVEY §2 P7/S3/J4 — the reference's
# 12-model nested-response surface, outputs.py:33-488 + sql_db.py:16-158).
# Each renders deterministic nested JSON from the base tables, parses it
# with the explicit response schema, and emits one star table; the oracle
# computes the same table relationally — the JSON round trip must be the
# identity on every extracted field.
# --------------------------------------------------------------------------

def _fmt_ts_cols(df, cols):
    for c in cols:
        df = df.withColumn(c, F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
    return df


def _star_estate_tables(spark, sf):
    resp = ST.render_estate_responses(_t(spark, sf, "customer"))
    return ST.extract_estate_tables(resp)


def _star_estate_tbl(spark, sf, name):
    return _star_estate_tables(spark, sf)[name]


def _star_estates(spark, sf):
    return _fmt_ts_cols(
        _star_estate_tbl(spark, sf, "estates"), ["first_op_date", "last_op_date"]
    )


def _NS():
    return F.lit(None).cast("string")


def _star_geo_dims(spark, sf):
    """regions ∪ subregions ∪ districts in one (tbl, id, name_zh, name_en,
    parent_id) frame — every row and column of the three geographic
    dimension extractions value-checked under a single driver entry (the
    per-table selects are pure renames, no information dropped)."""
    t = _star_estate_tables(spark, sf)
    r = t["regions"].select(
        F.lit("regions").alias("tbl"),
        F.col("region_id").alias("id"),
        F.col("region_name_zh").alias("name_zh"),
        F.col("region_name_en").alias("name_en"),
        _NS().alias("parent_id"),
    )
    s = t["subregions"].select(
        F.lit("subregions").alias("tbl"),
        F.col("subregion_id").alias("id"),
        F.col("subregion_name_zh").alias("name_zh"),
        F.col("subregion_name_en").alias("name_en"),
        F.col("region_id").alias("parent_id"),
    )
    d = t["districts"].select(
        F.lit("districts").alias("tbl"),
        F.col("district_id").alias("id"),
        F.col("district_name_zh").alias("name_zh"),
        F.col("district_name_en").alias("name_en"),
        F.col("subregion_id").alias("parent_id"),
    )
    return r.unionByName(s).unionByName(d)


def _star_facility_links(spark, sf):
    """facilities dimension ∪ estate_facilities bridge ∪ the two
    per-estate link tables (school nets, MTR lines), one (tbl, id,
    estate_id, name_zh, name_en) frame — every row and column of the four
    extractions still hash-checked, in ONE driver slot (the per-table
    selects are pure renames, no information dropped)."""
    t = _star_estate_tables(spark, sf)
    fac = t["facilities"].select(
        F.lit("facilities").alias("tbl"),
        F.col("facility_id").alias("id"),
        _NS().alias("estate_id"),
        F.col("facility_name_zh").alias("name_zh"),
        F.col("facility_name_en").alias("name_en"),
    )
    br = t["estate_facilities"].select(
        F.lit("estate_facilities").alias("tbl"),
        F.col("facility_id").alias("id"),
        F.col("estate_id"),
        _NS().alias("name_zh"),
        _NS().alias("name_en"),
    )
    sn = t["estate_school_nets"].select(
        F.lit("estate_school_nets").alias("tbl"),
        F.col("school_net_id").alias("id"),
        F.col("estate_id"),
        F.col("school_net_name_zh").alias("name_zh"),
        F.col("school_net_name_en").alias("name_en"),
    )
    mtr = t["estate_mtr_lines"].select(
        F.lit("estate_mtr_lines").alias("tbl"),
        _NS().alias("id"),
        F.col("estate_id"),
        F.col("mtr_line_name_zh").alias("name_zh"),
        F.col("mtr_line_name_en").alias("name_en"),
    )
    return fac.unionByName(br).unionByName(sn).unionByName(mtr)


def _star_structures(spark, sf):
    """phases ∪ buildings (the has_phases/no_phases branch surface,
    nullable building→phase FK included), one frame."""
    t = _star_estate_tables(spark, sf)
    ph = t["phases"].select(
        F.lit("phases").alias("tbl"),
        F.col("phase_id").alias("id"),
        F.col("phase_name_zh").alias("name_zh"),
        F.col("phase_name_en").alias("name_en"),
        F.col("estate_id"),
        _NS().alias("phase_fk"),
    )
    bl = t["buildings"].select(
        F.lit("buildings").alias("tbl"),
        F.col("building_id").alias("id"),
        F.col("building_name_zh").alias("name_zh"),
        F.col("building_name_en").alias("name_en"),
        F.col("estate_id"),
        F.col("phase_id").alias("phase_fk"),
    )
    return ph.unionByName(bl)


def _star_monthly_market(spark, sf):
    resp = ST.render_monthly_responses(_t(spark, sf, "orders"))
    return _fmt_ts_cols(ST.extract_monthly_market(resp), ["record_date"])


def _star_bld_tbl(spark, sf, name):
    resp = ST.render_building_responses(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    )
    return ST.extract_building_tables(resp)[name]


def _star_units(spark, sf):
    return _star_bld_tbl(spark, sf, "units")


def _star_unit_features(spark, sf):
    return _star_bld_tbl(spark, sf, "unit_features")


def _star_transactions(spark, sf):
    return _fmt_ts_cols(
        _star_bld_tbl(spark, sf, "transactions"), ["tx_date", "last_tx_date"]
    )


def _catalog_counts(cat, tables) -> DataFrame:
    """Per-table committed row counts as ONE unioned plan — a single Spark
    job over all catalog tables instead of one count job per table (the
    correctness gate runs this after the pipeline; the union saves ~13
    scheduling round-trips)."""
    from functools import reduce

    parts = [
        cat.read(t).agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        for t in tables
    ]
    return reduce(DataFrame.unionByName, parts)


def _star_pipeline_counts(spark, sf):
    """Orchestrator parity (reference orchestrators/agency.py:20,34,67-96):
    the two-stage batched load — estates+monthly per id-batch, then
    buildings harvested from the committed star — with per-batch
    insert+PK-dedup+manifest-commit, run end to end into a fresh
    TableCatalog. Output = final committed row count per table; the oracle
    recomputes each table's distinct extraction relationally, so equality
    proves the batching/dedup/append machinery loses and duplicates
    nothing."""
    from hk_housing_datahub_spark.sources.tables import TableCatalog

    root = tempfile.mkdtemp(prefix="hk_star_pipe_")
    cat = TableCatalog(spark, root)
    ST.run_star_pipeline(
        spark,
        cat,
        ST.render_estate_responses(_t(spark, sf, "customer")),
        ST.render_monthly_responses(_t(spark, sf, "orders")),
        ST.render_building_responses(
            _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
        ),
        # 2 batches exercises the batching/dedup machinery end to end while
        # keeping the correctness-gate job count bounded (the per-commit
        # cost is scheduling round-trips, not data)
        n_batches=2,
    )
    return _catalog_counts(cat, list(_STAR_SQL))


def _star_streaming_ingest(spark, sf):
    """Streaming star ingestion (star/streaming.py): response files drive a
    foreachBatch extract→PK-dedup→append cycle into a fresh catalog;
    output = final committed counts of the 10 estate-side tables. The
    oracle recomputes each relationally — exactly-once across micro-batches
    is what equality proves."""
    from hk_housing_datahub_spark.sources.tables import TableCatalog
    from hk_housing_datahub_spark.star.streaming import stream_estate_responses
    from hk_housing_datahub_spark.star.pipeline import ESTATE_TABLES

    root = tempfile.mkdtemp(prefix="hk_star_stream_")
    src = os.path.join(root, "src")
    resp = ST.render_estate_responses(_t(spark, sf, "customer"))
    # two waves of files → multiple micro-batches
    resp.filter(F.pmod(F.xxhash64("estate_id"), F.lit(2)) == 0).coalesce(
        2
    ).write.parquet(os.path.join(src, "w1"))
    resp.filter(F.pmod(F.xxhash64("estate_id"), F.lit(2)) == 1).coalesce(
        2
    ).write.parquet(os.path.join(src, "w2"))
    cat = TableCatalog(spark, os.path.join(root, "cat"))
    q = stream_estate_responses(
        spark, os.path.join(src, "*"), cat, os.path.join(root, "ckpt"),
        query_name="star_ingest_q",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _catalog_counts(cat, ESTATE_TABLES)


def _robots_txt_parse(spark, sf):
    """robots.txt body → scheduler rules (functions/robots.py): five body
    variants synthesized per doc_id (no UA-* group / full disallow / Allow
    prefix + Crawl-delay / fractional delay / empty Disallow); the oracle
    states the expected parse per variant."""
    from hk_housing_datahub_spark.functions.robots import parse_robots_txt

    d = _t(spark, sf, "documents")
    nl = "\n"
    m = F.pmod("doc_id", F.lit(6))
    body = (
        F.when(m == 0, F.lit(f"User-agent: googlebot{nl}Disallow: /private{nl}"))
        .when(m == 1, F.lit(f"User-agent: *{nl}Disallow: /{nl}"))
        .when(
            m == 2,
            F.lit(
                f"User-agent: *{nl}Allow: /listing/{nl}Crawl-delay: 2{nl}{nl}"
                f"User-agent: badbot{nl}Disallow: /{nl}"
            ),
        )
        .when(m == 3, F.lit(f"User-agent: *{nl}Crawl-delay: 0.5{nl}"))
        .when(
            # RFC 9309 multi-group merge: the Allow and the delay live in
            # the SECOND `*` group, the first only has a sub-path Disallow
            m == 5,
            F.lit(
                f"User-agent: *{nl}Disallow: /a/{nl}{nl}"
                f"User-agent: bot{nl}Disallow: /{nl}{nl}"
                f"User-agent: *{nl}Allow: /pub/{nl}Crawl-delay: 4{nl}"
            ),
        )
        .otherwise(F.lit(f"User-agent: *{nl}Disallow:{nl}"))
    )
    robots = d.select(
        F.concat(F.lit("h"), F.col("doc_id"), F.lit(".example.com")).alias("host"),
        body.alias("robots_txt"),
    )
    out = parse_robots_txt(robots)
    return out.select(
        "host",
        F.col("allow").cast("int").alias("allow"),
        "path_prefix",
        "crawl_delay_ms",
    )


def _wiki_page_gate(spark, sf):
    """P2/P3 parity (wiki.py:70-78) on wiki-shaped pages: a categories
    array + body synthesized from documents; disambiguation pages (category
    containing 消歧義) and non-relevant pages (body without 香港) drop."""
    from hk_housing_datahub_spark.functions.wikitables import gate_wiki_pages

    d = _t(spark, sf, "documents")
    pages = d.select(
        "doc_id",
        F.concat(F.lit("Page "), F.col("doc_id")).alias("title"),
        F.filter(
            F.array(
                F.lit("屋苑"),
                F.when(F.pmod("doc_id", F.lit(4)) != 0, F.lit("香港地方")),
                F.when(F.pmod("doc_id", F.lit(7)) == 0, F.lit("消歧義頁面")),
            ),
            lambda x: x.isNotNull(),
        ).alias("categories"),
        F.when(
            F.pmod("doc_id", F.lit(5)) != 0,
            F.concat(F.lit("香港 "), F.col("text")),
        ).otherwise(F.col("text")).alias("body"),
    )
    return gate_wiki_pages(pages).select(
        "doc_id", "title", F.size("categories").alias("n_cats")
    )


def _wiki_pipeline_docs(spark, sf):
    """EP2 composed end-to-end (reference orchestrators/wiki.py:188-208):
    estate titles → variant lookup (J2) → disambiguation/relevance gate
    (P2/P3) → section concat (F15) → wikitable→CSV expansion (F8/F9) →
    sentence-aware chunking (F11), via pipelines/wiki.py. Inputs are
    synthesized deterministically from ``part``: titles = upper(p_name)
    (matching only through the lower-case variant, so the rank logic is
    live), page content keyed by the page's min partkey (disambig if
    pk%7=0, relevant body iff pk%5≠0, one fixed wikitable)."""
    from hk_housing_datahub_spark.pipelines import estate_wiki_pipeline

    p = _t(spark, sf, "part")
    titles = (
        p.filter(F.pmod("p_partkey", F.lit(7)) == 0)
        .select(F.upper(F.col("p_name")).alias("title"))
        .distinct()
    )
    base = (
        p.filter(F.pmod("p_partkey", F.lit(3)) == 0)
        .groupBy(F.col("p_name").alias("page_title"))
        .agg(F.min("p_partkey").alias("pk"))
    )
    pk = F.col("pk")
    rep = F.repeat(F.concat(F.col("page_title"), F.lit("。")), 30)
    body = F.when(
        F.pmod(pk, F.lit(5)) != 0, F.concat(F.lit("香港 "), rep)
    ).otherwise(rep)
    pages = base.select(
        "page_title",
        F.filter(
            F.array(
                F.lit("屋苑"),
                F.when(F.pmod(pk, F.lit(4)) != 0, F.lit("香港地方")),
                F.when(F.pmod(pk, F.lit(7)) == 0, F.lit("消歧義頁面")),
            ),
            lambda x: x.isNotNull(),
        ).alias("categories"),
        F.array(
            F.struct(F.lit("main").alias("title"), body.alias("text")),
            F.struct(
                F.lit("sub1").alias("title"),
                F.upper(F.substring(body, 1, 40)).alias("text"),
            ),
            F.struct(
                F.lit("sub2").alias("title"),
                F.lower(F.substring(body, 1, 30)).alias("text"),
            ),
        ).alias("sections"),
        F.format_string(
            '{|\n|-\n! Page !! colspan="2" | Info\n'
            '|-\n| rowspan="2" | [[Page %s|w%s]] || %s || %s\n'
            "|-\n| t=%s || pk=%s\n|}",
            "page_title", "pk", "page_title", "pk", "page_title", "pk",
        ).alias("wikitext"),
    )
    return estate_wiki_pipeline(titles, pages)


def _star_price_trend(spark, sf):
    """FK-graph analytic over the extracted star schema: price per district
    per year — transactions ⋈ units ⋈ buildings ⋈ estates ⋈ districts with
    the dimension sides broadcast (the reference README's 'analytics over
    its output DB' promise)."""
    est_resp = ST.render_estate_responses(_t(spark, sf, "customer"))
    est_tables = ST.extract_estate_tables(est_resp)
    bld_resp = ST.render_building_responses(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    )
    bld_tables = ST.extract_building_tables(bld_resp)
    tx, units = bld_tables["transactions"], bld_tables["units"]
    # No explicit broadcast hints: buildings and estates GROW with the
    # estate count (≈2×/estate), so a hard hint would override AQE's
    # runtime size check at exactly the scale where it stops being safe.
    # AQE broadcasts whichever sides are actually under the threshold at
    # run time (all of them at bench SF) and keeps the plan valid at 100×
    # (districts stays tiny; facts shuffle on their join keys).
    joined = (
        tx.join(units.select("unit_id", "building_id"), "unit_id")
        .join(est_tables["buildings"].select("building_id", "estate_id"),
              "building_id")
        .join(est_tables["estates"].select("estate_id", "district_id"),
              "estate_id")
        .join(est_tables["districts"].select("district_id"), "district_id")
    )
    return joined.groupBy(
        "district_id", F.year("tx_date").cast("int").alias("tx_year")
    ).agg(
        F.count(F.lit(1)).alias("n_tx"),
        # sum, not avg, and round-4 = identity (tx2 prices carry 4
        # decimals; an avg of 2-decimal prices lands on exact .005 halves)
        F.round(F.sum("price"), 4).alias("total_price"),
    )


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; pytest carries the strong checks)
# --------------------------------------------------------------------------

def _crawl_frontier_run(spark, sf):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 1200, 16
    pages = generate_pages(spark, n, n_hosts=hosts)
    robots = generate_robots(spark, n_hosts=hosts)
    seeds = generate_seeds(spark, 15, n, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_q_")
    eng = CrawlEngine(spark, pages, robots, ckpt, seen_mode="exact", max_depth=2)
    res = eng.run(seeds, max_waves=3)
    return res.listings(spark).drop("outlinks")


def _prepare_corpus(spark, sf):
    """The composed training-corpus funnel (dedup → quality gate → PII
    scrub → pack), end-to-end hash-checked against the composed DuckDB
    twin (_prepare_corpus_sql). Each stage's twin is also individually
    oracle-checked (drop_dup_filters, quality_by_source,
    sample_pack_corpus) and redaction carries a byte-identical DuckDB
    parity pytest (tests/test_redact.py)."""
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    out = prepare_training_corpus(
        _t(spark, sf, "documents"),
        CorpusRecipe(dedup="exact", min_quality=0.3, pack_budget=512),
    )
    return out.select(
        "doc_id", "lang", "source", "quality", "pii_total", "n_tokens",
        "bucket", "bin_id",
    )


def _crawl_catalog_publish(spark, sf):
    """Rows-only: the round-3 centerpiece end to end — crawl waves →
    metadata-only catalog snapshots (Iceberg add_files) with per-wave
    lineage, seen-set replace snapshots, and a WAP audit accepting every
    wave. Returns the per-snapshot lineage ledger (deterministic:
    wave/rows/op per snapshot)."""
    from hk_housing_datahub_spark.frontier.publish import publish_crawl
    from hk_housing_datahub_spark.sources import TableCatalog

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 1200, 16
    pages = generate_pages(spark, n, n_hosts=hosts)
    robots = generate_robots(spark, n_hosts=hosts)
    seeds = generate_seeds(spark, 15, n, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_pub_")
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="hkcrawl_cat_"))
    eng = CrawlEngine(spark, pages, robots, ckpt, seen_mode="exact", max_depth=2)
    publish_crawl(
        eng, seeds, cat, "listings", max_waves=3,
        audit=lambda df: df.count() >= 0,
    )
    ledger = [
        (
            int(h["snapshot"]),
            h["op"],
            int(h["lineage"]["wave"]) if "lineage" in h else -1,
            int(h.get("rows", -1)),
            h.get("resolved", ""),
        )
        for h in cat.history("listings")
    ]
    return spark.createDataFrame(
        ledger, "snapshot int, op string, wave int, rows int, resolved string"
    )


def _extract_listings(spark, sf):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pages = generate_pages(spark, 3000, n_hosts=24)
    ex = extract_df(pages)
    return ex.select(
        U.canonicalize_url(F.col("url")).alias("url_canon"),
        "lang",
        "extracted_text",
        "price",
        "address",
        "floor_area",
        F.date_format("transaction_date", "yyyy-MM-dd").alias("tx_date"),
        F.size("outlinks").alias("n_outlinks"),
    )


def _extract_fields_replay(spark, sf):
    """The north-rule extractor under the hash oracle: listing pages are
    constructed from the documents table with pure Column expressions
    (controlled field presence per doc_id residue — missing price /
    address / area / INVALID dates all exercised), run through the
    production Arrow extractor (extract/vectorized.py — the same
    compiled regexes as extract/reference.py), and compared against a
    DuckDB twin that rebuilds the identical HTML and replays every
    field regex in RE2. ``text_md5`` is the byte-identity check the
    north rule demands (md5 of the extracted text per url);
    generate_pages-driven extraction stays covered by
    ``extract_listings`` (rows-only) + the byte-identity pytest corpus."""
    d = _t(spark, sf, "documents")
    price_cell = F.format_number(
        (F.lit(1_000_000) + F.col("doc_id") * 37).cast("long"), 0
    )
    html = F.concat(
        F.lit('<html><body><div id="content">'),
        F.col("text"),
        F.lit("</div>"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(
                F.lit('<span class="price">HK$ '), price_cell,
                F.lit("</span>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(3)) != 2,
            F.concat(
                F.lit('<span class="address">No. '),
                (F.pmod("doc_id", F.lit(999)) + 1).cast("string"),
                F.lit(" Nathan Road</span>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.concat(
                F.lit('<span class="area">'),
                (F.pmod("doc_id", F.lit(900)) + 100).cast("string"),
                F.lit(".5 sq.ft</span>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.lit('<time class="txdate">17/05/2023</time>'),  # non-ISO
        ).otherwise(
            F.concat(
                F.lit('<time class="txdate">2023-'),
                F.lpad((F.pmod("doc_id", F.lit(12)) + 1).cast("string"),
                       2, "0"),
                F.lit("-"),
                F.lpad((F.pmod("doc_id", F.lit(28)) + 1).cast("string"),
                       2, "0"),
                F.lit("</time>"),
            )
        ),
        F.lit('<a href="/p/'), F.col("doc_id").cast("string"),
        F.lit('"><a href="https://x.example/'),
        F.pmod("doc_id", F.lit(7)).cast("string"), F.lit('">'),
    )
    pages = d.select("doc_id", F.encode(html, "utf-8").alias("html"))
    ex = extract_df(pages)
    return ex.select(
        "doc_id",
        F.md5("extracted_text").alias("text_md5"),
        "price",
        "address",
        F.col("floor_area"),
        F.date_format("transaction_date", "yyyy-MM-dd").alias("tx_date"),
        F.size("outlinks").alias("n_outlinks"),
    )


def _minhash_lsh_candidates(spark, sf):
    """MinHash-LSH candidate pairs (operators/dedup.py
    minhash_lsh_pairs) in md5_56 hash mode — the engine-portable twin
    of the production xxhash64 path (same shingling, min-aggregates,
    banding and collision join; only the hash function swaps). The
    DuckDB oracle replays all 64 permutation minima and the 16-band
    collision join bit-exactly."""
    return DD.minhash_lsh_pairs(
        _t(spark, sf, "documents"), hash_mode="md5_56"
    )


def _simhash_neardup(spark, sf):
    """SimHash near-dup pairs (operators/dedup.py simhash_pairs) in
    56-bit md5 hash mode — portable twin of the production xxhash64
    path. The pigeonhole banding is recall-exact by construction, so
    the DuckDB oracle checks the brute-force definition instead:
    all pairs with hamming(fingerprint) ≤ 3 over the same bit votes."""
    return DD.simhash_pairs(
        _t(spark, sf, "documents"), max_hamming=3, bits=56,
        hash_mode="md5_56",
    )


def _lsh_ann_topk(spark, sf):
    """Random-hyperplane LSH ANN (operators/similarity.py lsh_topk) in
    md5 plane mode — the engine-portable twin of the Gaussian-plane
    production path (same signature packing, bucket equi-join and
    cosine rerank; only the plane source swaps to the md5 grid). The
    DuckDB oracle regenerates all 60 planes, recomputes every
    signature, replays the bucket collisions and the rerank —
    candidates AND ranks hash-match. Gaussian-mode recall stays pinned
    by tests (recall@1 vs brute force)."""
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.pmod("vec_id", F.lit(25)) == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    return SIM.lsh_topk(e, q, dim=64, k=5, plane_mode="md5_56").select(
        "qid", "nid", "cos_sim", "rnk"
    )


def _chunk_documents(spark, sf):
    return chunk_documents(_t(spark, sf, "documents"))


def _asof_join_events(spark, sf):
    """As-of join (union+window composition, operators/joins.py): each click
    gets the user's most recent purchase at-or-before it; oracle = DuckDB's
    native ASOF LEFT JOIN."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = J.asof_join(clicks, purchases, "user_id", "ts", ["purchase_value"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def _cookie_str_to_map(spark, sf):
    """F1 parity (reference utils.py:10-21 cookie string → dict): str_to_map
    then explode to (doc_id, k, v) rows."""
    d = _t(spark, sf, "documents")
    cookies = d.select(
        "doc_id",
        F.concat(
            F.lit("sid="), F.col("doc_id"),
            F.lit("; lang="), F.col("lang"),
            F.lit("; src="), F.col("source"),
        ).alias("cookie"),
    )
    m = cookies.select(
        "doc_id", F.explode(F.str_to_map(F.col("cookie"), F.lit("; "), F.lit("="))).alias("k", "v")
    )
    return m.select("doc_id", "k", "v")


def _wiki_section_concat(spark, sf):
    """F15 parity (reference processors/wiki/wiki.py:193-200): section text
    concatenated with its 1-level subsection texts, newline-joined, over a
    nested struct column (transform + array_join stay JVM-side)."""
    d = _t(spark, sf, "documents")
    sec = d.select(
        "doc_id",
        F.struct(
            F.concat(F.lit("S"), F.col("doc_id")).alias("title"),
            F.col("text").alias("text"),
            F.array(
                F.struct(
                    F.lit("sub1").alias("title"),
                    F.upper(F.substring("text", 1, 40)).alias("text"),
                ),
                F.struct(
                    F.lit("sub2").alias("title"),
                    F.lower(F.substring("text", 1, 30)).alias("text"),
                ),
            ).alias("subsections"),
        ).alias("section"),
    )
    return sec.select(
        "doc_id",
        F.col("section.title").alias("sec_title"),
        F.concat_ws(
            "\n",
            F.col("section.text"),
            F.array_join(
                F.transform(F.col("section.subsections"), lambda s: s["text"]),
                "\n",
            ),
        ).alias("full_text"),
    )


def _packed_sequences(spark, sf):
    """Packed-bin materialization (operators/packing.py render_bins) —
    each pack bin becomes one training sequence with doc-boundary token
    offsets for attention masking; hash-checked against the DuckDB
    window twin extended to the rendered sequence md5 and offset CSV
    (also pinned per-operator in test_sampling_packing.py)."""
    from hk_housing_datahub_spark.operators.packing import (
        pack_greedy,
        render_bins,
    )

    d = _t(spark, sf, "documents").select(
        "doc_id", "text", F.col("n_chars").alias("n_tokens")
    )
    out = render_bins(pack_greedy(d, "doc_id", "n_tokens", 20000))
    return out.select(
        "bucket",
        "bin_id",
        "n_docs",
        "fill",
        F.md5("seq_text").alias("seq_md5"),
        F.concat_ws(",", F.transform("offsets", lambda o: o.cast("string"))).alias(
            "offsets_csv"
        ),
    )


def _token_vocab_top(spark, sf):
    """Tokenizer-fit statistics (operators/vocab.py) — the corpus
    word-frequency table's top 200 plus BPE first-iteration pair counts'
    top 200, union-merged under a kind label; hash-checked against the
    composed DuckDB twin (also pinned per-operator in test_vocab.py)."""
    from hk_housing_datahub_spark.operators.vocab import (
        bpe_pair_counts,
        token_vocabulary,
        top_tokens,
    )

    d = _t(spark, sf, "documents")
    tt = top_tokens(d, 200).select(
        F.lit("token").alias("kind"),
        F.col("token").alias("sym"),
        F.col("count"),
    )
    v = token_vocabulary(d, min_count=2)
    pp = (
        bpe_pair_counts(v)
        .orderBy(F.desc("count"), "left", "right")
        .limit(200)
        .select(
            F.lit("pair").alias("kind"),
            F.concat_ws("+", "left", "right").alias("sym"),
            F.col("count"),
        )
    )
    return tt.unionByName(pp)


def _training_order_sample(spark, sf):
    """Seeded deterministic global training-order shuffle
    (operators/packing.py training_order) over the corpus head —
    hash-checked against the DuckDB global-window twin (the bucketed
    construction must be bit-identical to row_number over the md5 key;
    also property-pinned in test_sampling_packing.py)."""
    from hk_housing_datahub_spark.operators.packing import training_order

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    return (
        training_order(d, ["doc_id"], seed="epoch0")
        .orderBy("order_rank")
        .limit(500)
        .select("order_rank", "shuffle_bucket", "doc_id", "lang")
    )


def _sitemap_discovery(spark, sf):
    """Sitemap seed discovery (functions/sitemaps.py) — robots
    ``Sitemap:`` lines fetched from a synthetic pages table (leaf sitemaps
    on even hosts, a sitemap-index hop on odd hosts), ``<loc>`` entries
    exploded into the crawl's (url, priority) seed contract; hash-checked
    against the analytic expected-seed oracle (the XML round-trip must
    reproduce exactly the planted listing URLs). End-to-end CrawlEngine
    integration is pinned by test_sitemaps.py."""
    from hk_housing_datahub_spark.functions.sitemaps import (
        discover_sitemap_seeds,
    )

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    host = F.format_string("h%d.example.com", F.pmod("doc_id", F.lit(8)))
    loc = F.format_string(
        "<url><loc>https://h%d.example.com/listing/%d</loc></url>",
        F.pmod("doc_id", F.lit(8)),
        F.col("doc_id"),
    )
    leaf = d.groupBy(host.alias("host")).agg(
        F.concat(
            F.lit("<urlset>"), F.concat_ws("", F.collect_list(loc)),
            F.lit("</urlset>"),
        ).alias("text"),
    )
    leaf_pages = leaf.select(
        F.format_string("https://%s/sitemap-leaf.xml", "host").alias("url"),
        F.col("text"),
    )
    index_pages = leaf.select(
        F.format_string("https://%s/sitemap.xml", "host").alias("url"),
        F.format_string(
            "<sitemapindex><sitemap><loc>https://%s/sitemap-leaf.xml</loc>"
            "</sitemap></sitemapindex>",
            "host",
        ).alias("text"),
    )
    pages = leaf_pages.unionByName(index_pages)
    robots = leaf.select(
        "host",
        F.when(
            F.pmod(F.substring("host", 2, 1).cast("int"), F.lit(2)) == 0,
            F.format_string("Sitemap: https://%s/sitemap-leaf.xml\n", "host"),
        )
        .otherwise(
            F.format_string("Sitemap: https://%s/sitemap.xml\n", "host")
        )
        .alias("robots_txt"),
    )
    return discover_sitemap_seeds(robots, pages, priority=1).orderBy("url")


def _fetch_shard_assign(spark, sf):
    """Rendezvous host->fetcher-shard ownership (frontier/shards.py,
    UbiCrawler's consistent-hash agent assignment): per host, the owning
    shard is argmax_s md5(host:s:seed) — a pure map-only codegen
    projection every executor computes locally (no coordination, no
    shuffle beyond the audit rollup). The DuckDB twin replays the exact
    md5 argmax, so the hash check pins engine-for-engine agreement on
    who owns what — the property a fetcher fleet relies on."""
    from hk_housing_datahub_spark.frontier.shards import assign_fetch_shards

    o = _t(spark, sf, "orders")
    urls = o.select(
        F.concat(
            F.lit("h"), F.pmod("o_custkey", F.lit(40)), F.lit(".example.com")
        ).alias("host")
    )
    return (
        assign_fetch_shards(urls, n_shards=8)
        .groupBy("host", "fetch_shard")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("host")
    )


def _adaptive_politeness(spark, sf):
    """Heritrix-style adaptive per-host politeness (frontier/adaptive.py):
    delay = floor(clamp(2 x mean observed latency, [100, 5000])) per host
    from the fetch log, merged with the robots Crawl-delay dimension by
    ``greatest`` (whichever asks for MORE politeness wins; the reference
    hard-codes its sleeps at /root/reference/src/orchestrators/agency.py:139).
    One compact-key exchange over the log; the robots side is a dimension.
    The DuckDB twin replays sum/count/clamp/greatest bit-for-bit (integer
    latencies keep the per-host sum exact, so the one double division is
    IEEE-identical in both engines)."""
    from hk_housing_datahub_spark.frontier.adaptive import (
        adaptive_crawl_delay,
        merge_crawl_delays,
    )

    e = _t(spark, sf, "events")
    log = e.select(
        F.concat(
            F.lit("h"), F.pmod("event_id", F.lit(37)), F.lit(".example.com")
        ).alias("host"),
        (F.pmod(F.col("event_id") * 7919, F.lit(1900)) + 20).alias(
            "latency_ms"
        ),
    )
    robots = (
        spark.range(37)
        .filter(F.pmod("id", F.lit(5)) == 0)
        .select(
            F.concat(F.lit("h"), F.col("id"), F.lit(".example.com")).alias(
                "host"
            ),
            (F.lit(500) + F.col("id") * 40).cast("int").alias(
                "crawl_delay_ms"
            ),
        )
        .unionAll(
            spark.range(1).select(
                F.lit("h99.example.com").alias("host"),
                F.lit(700).cast("int").alias("crawl_delay_ms"),
            )
        )
    )
    adaptive = adaptive_crawl_delay(
        log, delay_factor=2.0, min_delay_ms=100, max_delay_ms=5000
    )
    merged = merge_crawl_delays(robots, adaptive)
    return merged.join(
        adaptive.select("host", "n_fetches", "avg_latency_ms"), "host", "left"
    ).select("host", "n_fetches", "avg_latency_ms", "crawl_delay_ms")


def _paragraph_dedup(spark, sf):
    """CCNet cross-corpus exact paragraph dedup (operators/textops.py
    dedup_paragraphs, Wenzek et al. 2020 §3.1): multi-paragraph pages are
    built by sandwiching each document between a class-shared header
    (7 classes) and a class-shared footer (3 classes); only the
    globally-first (doc_id, pos) copy of each normalized paragraph
    survives. The DuckDB twin replays the split / CCNet hash
    normalization (lower, collapse whitespace, digits→0) / first-copy
    window / ordered rebuild byte-for-byte, so the hash check pins the
    reconstructed TEXT bytes, not just counts."""
    from hk_housing_datahub_spark.operators.textops import dedup_paragraphs

    d = _t(spark, sf, "documents")
    pages = d.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.concat(
                F.lit("shared header class "),
                F.expr("substring('abcdefg', cast(doc_id % 7 as int) + 1, 1)"),
                F.lit(" for every page in this class"),
            ),
            F.col("text"),
            F.concat(
                F.lit("shared footer variant "),
                F.expr("substring('xyz', cast(doc_id % 3 as int) + 1, 1)"),
            ),
        ).alias("text"),
    )
    return dedup_paragraphs(pages).select(
        "doc_id", "text", "n_paras", "n_dropped_paras"
    )


def _tfidf_keywords(spark, sf):
    """Per-document top-5 smoothed-TF-IDF keywords
    (operators/keywords.py): the single corpus-sized shuffle is the
    (doc, token) tf aggregate; df and N derive from that compact table;
    rank compares round(score, 9) with (tf desc, df asc, token asc)
    tie-breaks so last-ulp ln() differences between engines cannot flip
    the selected rows. Hash-checked against a DuckDB twin replaying the
    identical tokenization, smoothing and window."""
    from hk_housing_datahub_spark.operators.keywords import tfidf_keywords

    return tfidf_keywords(_t(spark, sf, "documents"), k=5)


def _publish_dates(spark, sf):
    """Publish-date extraction chain (extract/dates.py, the
    htmldate/trafilatura recipe): jsonld > meta > url-path > text, each
    candidate try_to_date-validated so impossible dates fall through.
    Pages are deterministically constructed from doc_id — channel class
    c = doc_id%5: 0 = jsonld AND a decoy meta (precedence), 1 = invalid
    jsonld 2021-02-30 + valid meta (in-data fall-through), 2 = url-path
    date (day-less when doc_id%10==7 → defaults to 01), 3 = text date,
    4 = nothing (NULL row). The DuckDB twin replays the identical
    regexes and try_cast validation — engine-vs-engine on the parse."""
    from hk_housing_datahub_spark.extract.dates import extract_publish_date

    d = _t(spark, sf, "documents").select("doc_id")
    y = (F.lit(2000) + F.pmod("doc_id", F.lit(20))).cast("int")
    mo = (F.lit(1) + F.pmod("doc_id", F.lit(12))).cast("int")
    dd = (F.lit(1) + F.pmod("doc_id", F.lit(28))).cast("int")
    dd2 = (F.lit(1) + F.pmod(F.col("doc_id") + 7, F.lit(28))).cast("int")
    iso = F.format_string("%04d-%02d-%02d", y, mo, dd)
    iso2 = F.format_string("%04d-%02d-%02d", y, mo, dd2)
    c = F.pmod("doc_id", F.lit(5))
    html = (
        F.when(
            c == 0,
            F.concat(
                F.lit('<script type="application/ld+json">{"datePublished":"'),
                iso,
                F.lit('"}</script><meta property="article:published_time" content="'),
                iso2,
                F.lit('"/>'),
            ),
        )
        .when(
            c == 1,
            F.concat(
                F.lit('<script type="application/ld+json">{"datePublished":"2021-02-30"}</script>'),
                F.lit('<meta property="article:published_time" content="'),
                iso,
                F.lit('"/>'),
            ),
        )
        .otherwise(F.lit("<p>no structured date</p>"))
    )
    path_date = F.when(
        F.pmod("doc_id", F.lit(10)) == 7, F.format_string("%04d/%02d", y, mo)
    ).otherwise(F.format_string("%04d/%02d/%02d", y, mo, dd))
    host = F.pmod("doc_id", F.lit(50)).cast("int")
    url = F.when(
        c == 2,
        F.concat(
            F.format_string("http://h%d.example/", host),
            path_date,
            F.lit("/post"),
        ),
    ).otherwise(F.format_string("http://h%d.example/page/%d", host, F.col("doc_id")))
    text = F.when(c == 3, F.concat(F.lit("updated "), iso, F.lit(" end"))).otherwise(
        F.lit("no date text")
    )
    pages = d.select(
        url.alias("url_canon"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
    )
    # ISO string for the driver compare: a NULL DATE round-trips as
    # pandas NaT on the DuckDB side and would miscanonicalize
    return extract_publish_date(pages).withColumn(
        "publish_date", F.col("publish_date").cast("string")
    )


# shared by _mixture_upsample and its oracle so the arithmetic can't drift
_UPSAMPLE_W = {"src0": 0.5, "src1": 0.3, "src2": 0.2, "src3": 0.04}
_UPSAMPLE_TOTAL = 150


def _mixture_upsample(spark, sf):
    """Epoch-aware mixture resampling (operators/sampling.py
    upsample_to_mixture, the LLaMA/Gopher repeat-small-sources recipe):
    strata whose target exceeds supply get floor(r) full epochs plus a
    deterministically md5-sampled extra epoch; unweighted strata drop;
    repetition caps at 4 epochs. The DuckDB twin recomputes the
    identical rate arithmetic from its own counts (shares embedded as
    exact repr literals), the identical rate_to_hex threshold
    (trunc(frac·16^8) → %08x) and the identical md5 predicate."""
    from hk_housing_datahub_spark.operators.sampling import (
        upsample_to_mixture,
    )

    d = _t(spark, sf, "documents").select("doc_id", "source")
    return upsample_to_mixture(
        d,
        "source",
        _UPSAMPLE_W,
        total=_UPSAMPLE_TOTAL,
        key_cols=["doc_id"],
        max_epochs=4,
        salt="r4",
    )


_BPE_MERGES = 10  # shared by _bpe_learn/_bpe_vocab and their oracles


def _bpe_learn(spark, sf):
    """Full distributed BPE merge loop (operators/bpe.py learn_bpe,
    Sennrich et al. 2016): 10 merges over the documents word-frequency
    table, tie-broken (count desc, left, right). The DuckDB twin
    unrolls the 10 iterations (_bpe_sql): words as \\x1f-wrapped symbol
    strings, each merge replayed as one left-to-right non-overlapping
    replace — exactly the engine's greedy fold — so ranks, pairs AND
    frequencies hash-match."""
    from hk_housing_datahub_spark.operators.bpe import (
        learn_bpe,
        merges_to_df,
    )

    d = _t(spark, sf, "documents")
    merges = learn_bpe(d, num_merges=_BPE_MERGES)
    return merges_to_df(spark, merges)


def _bpe_vocab(spark, sf):
    """Final BPE symbolization of the 300 most frequent words after the
    10 learned merges (same loop as bpe_learn, return_vocab=True) —
    the oracle twin reads the unrolled loop's final word table, so the
    per-word symbol sequences are compared byte-for-byte."""
    from hk_housing_datahub_spark.operators.bpe import learn_bpe

    d = _t(spark, sf, "documents")
    _, wf = learn_bpe(d, num_merges=_BPE_MERGES, return_vocab=True)
    return (
        wf.orderBy(F.desc("cnt"), "token")
        .limit(300)
        .select("token", "cnt", F.concat_ws(" ", "syms").alias("syms"))
    )


def _kn_perplexity(spark, sf):
    """Interpolated Kneser–Ney bigram perplexity (the smoothing KenLM
    actually ships — operators/lm_quality.py fit_kneser_ney /
    kn_perplexity_score): fit on the even-id half of the corpus, score
    the odd half. The DuckDB twin recomputes the full KN pipeline (type
    counts, context/continuation tables, estimated discount, add-k
    continuation floor) from the same parquet; values rounded to 6 as
    everywhere floats cross the comparator."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_kneser_ney,
        kn_perplexity_score,
    )

    d = _t(spark, sf, "documents")
    lm = fit_kneser_ney(d.filter(F.pmod("doc_id", F.lit(2)) == 0), k=0.5)
    out = kn_perplexity_score(d.filter(F.pmod("doc_id", F.lit(2)) == 1), lm)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 6).alias("perplexity"),
    )


def _kn3_perplexity(spark, sf):
    """Trigram interpolated Kneser–Ney — the full KenLM-shaped chain
    (operators/lm_quality.py fit_kneser_ney3 / kn3_perplexity_score):
    one trigram-type aggregate roots a count pyramid (contexts, middle
    continuations, unigram continuations, two estimated discounts);
    scoring backs off seen-trigram → continuation-bigram → floored
    continuation-unigram. Fit on even docs, score odd; the DuckDB twin
    replays the whole pyramid including both discount estimates."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_kneser_ney3,
        kn3_perplexity_score,
    )

    d = _t(spark, sf, "documents")
    lm = fit_kneser_ney3(d.filter(F.pmod("doc_id", F.lit(2)) == 0), k=0.5)
    out = kn3_perplexity_score(d.filter(F.pmod("doc_id", F.lit(2)) == 1), lm)
    return out.select(
        "doc_id",
        "n_trigrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 6).alias("perplexity"),
    )


def _nb_langid_confusion(spark, sf):
    """Trained char-trigram Naive-Bayes language ID
    (operators/langid_nb.py — the fastText-langid role): fit on the
    even-id half of the corpus using its lang labels, predict the odd
    half, report the (true, predicted) confusion rollup. Training AND
    inference are pure relational algebra, so the DuckDB twin replays
    the whole classifier end-to-end; the argmax ranks on round(score,6)
    with a lang tie-break, making the prediction engine-portable.
    (The synthetic corpus's lang labels are independent of its text, so
    the matrix mostly reflects priors — exactness, not accuracy, is
    what this entry pins; accuracy on real multilingual text is pinned
    by tests/test_langid_nb.py::test_predicts_held_out_sentences.)"""
    from hk_housing_datahub_spark.operators.langid_nb import (
        fit_nb_langid,
        nb_confusion,
    )

    d = _t(spark, sf, "documents")
    model = fit_nb_langid(d.filter(F.pmod("doc_id", F.lit(2)) == 0), k=1.0)
    return nb_confusion(d.filter(F.pmod("doc_id", F.lit(2)) == 1), model)


def _bitext_margin_pairs(spark, sf):
    """CCMatrix-style margin-based bitext mining
    (operators/similarity.py bitext_margin_mine, Artetxe & Schwenk
    2019): two disjoint slices of the embeddings table stand in for the
    two languages' sentence embeddings; each source is matched to its
    best target by the k-NN-normalized ratio margin and kept above
    margin 1. The DuckDB twin replays scoring, both k-NN means, and the
    argmax; ranks break ties on ids and the margin rounds to 6 before
    ranking on both engines."""
    from hk_housing_datahub_spark.operators.similarity import (
        bitext_margin_mine,
    )

    e = _t(spark, sf, "embeddings")
    src = e.filter(F.pmod("vec_id", F.lit(10)) == 0)
    tgt = e.filter(F.pmod("vec_id", F.lit(10)) == 5)
    return bitext_margin_mine(src, tgt, k=4, margin_threshold=1.0)


def _readability_scores(spark, sf):
    """Flesch / Flesch–Kincaid / type–token-ratio battery
    (operators/textops.py readability_scores): fixed regex counting
    rules (vowel-group syllables, [.!?]+ sentences floored at 1) keep
    the whole battery one codegen projection and make the DuckDB twin
    exact."""
    from hk_housing_datahub_spark.operators.textops import (
        readability_scores,
    )

    return readability_scores(_t(spark, sf, "documents"))


def _badwords_gate(spark, sf):
    """C4's bad-words gate done relationally (operators/textops.py
    badwords_filter): explode + semi-join against the term table
    instead of a giant regex alternation, so corpus cost is independent
    of blocklist size. A fixed three-term list with max_hits=2 makes
    the gate demonstrably bite on the synthetic corpus."""
    from hk_housing_datahub_spark.operators.textops import badwords_filter

    d = _t(spark, sf, "documents")
    bad = spark.createDataFrame(
        [("slow",), ("dup",), ("scan",)], ["term"]
    )
    out = badwords_filter(d, bad, max_hits=2)
    return out.select("doc_id", "lang", "source", "n_badword_hits")


def _quality_threshold_sweep(spark, sf):
    """Quality-vs-quantity tradeoff curve in one corpus pass
    (operators/textops.py quality_threshold_sweep): per quality-bucket
    lower edge, the docs/tokens/mean-quality surviving a >=threshold
    gate — one groupBy + a window cumsum over 20 bucket rows."""
    from hk_housing_datahub_spark.operators.textops import (
        quality_threshold_sweep,
    )

    return quality_threshold_sweep(_t(spark, sf, "documents"))


def _sentence_code_switch(spark, sf):
    """Sentence-level code-switch profiling (operators/langid_nb.py
    sentence_code_switch): the NB classifier applied per sentence, with
    a per-doc rollup (sentence count, distinct predicted langs,
    adjacent-disagreement switches, dominant lang). Probe docs are
    stitched deterministically — each odd doc's first 120 chars, a
    sentence from the NEXT odd doc (lead over doc_id), then its own
    again — so interleaving demonstrably occurs. The DuckDB twin
    replays the stitch, the sentence split, classification and the
    rollup end-to-end."""
    from hk_housing_datahub_spark.operators.langid_nb import (
        fit_nb_langid,
        sentence_code_switch,
    )

    d = _t(spark, sf, "documents")
    model = fit_nb_langid(d.filter(F.pmod("doc_id", F.lit(2)) == 0), k=1.0)
    return sentence_code_switch(_stitched_probes(d), model)


def _host_fairness(spark, sf):
    """Crawl-allocation fairness audit (operators/rollups.py
    allocation_fairness): Gini + top-share of character volume across
    (source, lang) cells — the dashboard number that catches a frontier
    collapsing onto a handful of hosts. The DuckDB twin replays the
    rank-weighted Gini identity exactly (integer weights, total rank
    order)."""
    from hk_housing_datahub_spark.operators.rollups import (
        allocation_fairness,
    )

    d = _t(spark, sf, "documents").select(
        F.concat_ws("/", "source", "lang").alias("cell"), "n_chars"
    )
    return allocation_fairness(d, "cell", weight_col="n_chars")


def _winnow_overlaps(spark, sf):
    """Winnowing overlap detection (operators/dedup.py
    winnow_fingerprints / winnow_overlap_pairs — Schleimer et al. 2003,
    the MOSS algorithm): window-min k-gram fingerprints with the
    shared-passage guarantee, DF-capped inverted-index pair join. All
    selection happens inside the row (array expressions over md5
    strings — lexicographic min is engine-portable), so the DuckDB
    twin replays fingerprint selection and the pair join exactly."""
    from hk_housing_datahub_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    return winnow_overlap_pairs(
        _t(spark, sf, "documents"), k=5, w=4, max_fp_df=50
    )


def _format_profile(spark, sf):
    """Format-shape profiling (operators/textops.py format_profile):
    code/table/bullet line fractions over raw newline structure. Probe
    docs are built deterministically (four lines per doc: prose, a
    bullet line, a ``;``-terminated line, a ``|``-delimited line) so
    every classifier demonstrably fires; the DuckDB twin replays the
    construction and the line classifiers."""
    from hk_housing_datahub_spark.operators.textops import format_profile

    d = _t(spark, sf, "documents")
    probes = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 60),
            F.concat(F.lit("- "), F.substring("text", 61, 60)),
            F.concat(F.substring("text", 121, 60), F.lit(";")),
            F.concat(F.lit("a | b | "), F.substring("text", 181, 20)),
        ).alias("text"),
    )
    return format_profile(probes)


def _confusable_dedup(spark, sf):
    """Homoglyph-robust exact dedup (functions/text.py
    fold_confusables, UTS #39 subset): every fifth document gets a
    Cyrillic-spoofed twin (Latin aeopcyx → visually-identical Cyrillic
    аеорсух) appended under a shifted id; dedup keys on
    md5(normalize(fold(text))), keep-lowest-id. Every spoof collapses
    onto its original — plain normalized-hash dedup would keep all of
    them. The DuckDB twin replays the spoof construction, the fold and
    the keep rule with its own translate()."""
    from hk_housing_datahub_spark.functions.text import (
        fold_confusables,
        normalize_text,
    )
    from pyspark.sql import Window

    d = _t(spark, sf, "documents").select("doc_id", "text")
    spoof = d.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.translate("text", "aeopcyx", "аеорсух").alias("text"),
    )
    allrows = d.unionByName(spoof)
    key = F.md5(normalize_text(fold_confusables(F.col("text"))))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        allrows.withColumn("fp", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "fp")
    )


def _novelty_scores(spark, sf):
    """Per-doc 8-gram novelty vs a reference corpus
    (operators/decontaminate.py novelty_scores — positive-selection
    sibling of the contamination screen): reference = even docs, scored
    = odd docs; raw shingle strings key the join so the DuckDB twin is
    exact."""
    from hk_housing_datahub_spark.operators.decontaminate import (
        novelty_scores,
    )

    d = _t(spark, sf, "documents")
    return novelty_scores(
        d.filter(F.pmod("doc_id", F.lit(2)) == 1),
        d.filter(F.pmod("doc_id", F.lit(2)) == 0),
        n=8,
    )


def _bm25f_search(spark, sf):
    """BM25F fielded ranking (operators/bm25.py bm25f_search): title =
    first 40 chars, body = full text, title weighted 2.5×; weighted
    per-field TFs combine BEFORE saturation (the fielded-retrieval
    property two independent BM25 scores cannot express). Integer
    tf/df/dl, exact avgdl division, sorted-term left-fold — bit-stable
    totals, so the DuckDB twin matches ranks exactly."""
    from hk_housing_datahub_spark.operators.bm25 import bm25f_search

    d = _t(spark, sf, "documents")
    fields = d.select(
        "doc_id",
        F.lit("title").alias("field"),
        F.substring("text", 1, 40).alias("text"),
    ).unionByName(
        d.select("doc_id", F.lit("body").alias("field"), F.col("text"))
    )
    queries = spark.createDataFrame(
        [(0, "table merge join"), (1, "slow scan batch window")],
        ["qid", "qtext"],
    )
    out = bm25f_search(
        fields, queries, weights={"body": 1.0, "title": 2.5}, k=5
    )
    return out.select(
        "qid", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _stitched_probes(d):
    """Odd docs stitched with the NEXT odd doc's 120-char prefix and
    their own again — the code-switch / coherence probe corpus. The
    synthetic doc_ids are dense, so "next odd doc" is doc_id + 2: an
    EQUI-JOIN, replacing the earlier lead() over an unpartitioned
    Window that funneled the whole probe table through one partition
    (the 5.7× sf1 outlier in BENCH/sf1_sample_r5.json). The last odd
    doc has no successor and reuses its own prefix, exactly like the
    lead()'s null coalesce — and exactly what the DuckDB twins' lead()
    computes."""
    odd = d.filter(F.pmod("doc_id", F.lit(2)) == 1).select(
        "doc_id", F.substring("text", 1, 120).alias("s1")
    )
    nxt = odd.select(
        (F.col("doc_id") - 2).alias("doc_id"), F.col("s1").alias("s2")
    )
    return odd.join(nxt, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(
            ". ", "s1", F.coalesce("s2", "s1"), "s1"
        ).alias("text"),
    )


def _coherence_scores(spark, sf):
    """Inter-sentence lexical coherence (operators/textops.py
    coherence_scores): adjacent-sentence Jaccard over distinct token
    sets, in-row array algebra. Probe docs stitch each odd doc's prefix
    with the NEXT odd doc's prefix and its own again (_stitched_probes)
    so adjacent pairs mix identical and unrelated sentences; the DuckDB
    twin replays stitch, split and the ordered pair fold."""
    from hk_housing_datahub_spark.operators.textops import (
        coherence_scores,
    )

    return coherence_scores(_stitched_probes(_t(spark, sf, "documents")))


def _bpe_encode_tokens(spark, sf):
    """Corpus tokenization with the learned merge table
    (operators/bpe.py encode_bpe, pandas mode — the production path for
    real 32k-merge tables; bit-equality with the pure-JVM chained-fold
    path and the learn-time symbolization is pinned in test_bpe.py).
    The DuckDB twin pushes every distinct word through the unrolled
    merge chain (the bpe_fertility machinery) and reassembles each
    document's token stream IN WORD ORDER — per-doc token counts and
    the \\x1f-joined stream md5 hash-match."""
    from hk_housing_datahub_spark.operators.bpe import encode_bpe, learn_bpe

    d = _t(spark, sf, "documents")
    merges = learn_bpe(d, num_merges=_BPE_MERGES)
    return encode_bpe(d, merges, mode="pandas").select(
        "doc_id",
        "n_bpe_tokens",
        F.md5(F.concat_ws("\x1f", "bpe_tokens")).alias("tokens_md5"),
    )


def _bpe_fertility(spark, sf):
    """Tokenizer fertility by language (tokens per character — the
    standard multilingual tokenizer-evaluation metric): the 10 learned
    merges applied to the WHOLE corpus (OOV words included) via the
    Arrow-batched sequential encoder (the production path for real
    merge-table sizes; bit-equal to the chained-fold expr path per
    test_bpe.py — at 10 chained folds inside a transform the expr
    plan's ANALYSIS cost already dominates, which is exactly why the
    pandas path exists), then one per-lang aggregate. The
    DuckDB twin pushes every distinct word through the identical
    unrolled replace chain and folds counts back through each doc's
    word list — totals and the ratio hash-match."""
    from hk_housing_datahub_spark.operators.bpe import encode_bpe, learn_bpe

    d = _t(spark, sf, "documents")
    merges = learn_bpe(d, num_merges=_BPE_MERGES)
    enc = encode_bpe(d, merges, mode="pandas")
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            F.sum("n_bpe_tokens") / F.sum("n_chars"), 6
        ).alias("tokens_per_char"),
    )


def _temperature_mixture(spark, sf):
    """Temperature-smoothed multilingual rebalancing (operators/sampling.py
    temperature_mixture, the XLM alpha=0.5 rule): stratum share is
    sqrt(n_lang)/sum sqrt — English samples down, tail languages get
    epoch-upsampled. alpha=0.5 is chosen for the oracle because IEEE
    sqrt is correctly rounded, so the DuckDB twin recomputes the
    IDENTICAL doubles (weights summed in sorted-stratum order on both
    sides) — the epoch plan and md5 thresholds match bit-for-bit."""
    from hk_housing_datahub_spark.operators.sampling import (
        temperature_mixture,
    )

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    return temperature_mixture(
        d, "lang", alpha=0.5, total=600, key_cols=["doc_id"],
        max_epochs=4, salt="r4t",
    )


def _span_dedup_profile(spark, sf):
    """Per-doc duplicated-substring coverage (operators/spandedup.py,
    Lee et al. 2022 suffix-array dedup as rolling 8-gram hashing);
    hash-checked against the gram→count≥2→island-merge DuckDB twin
    (also pinned per-operator in test_spandedup.py and via the
    `substring` branch of drop_dup_filters in the driver window)."""
    from hk_housing_datahub_spark.operators.spandedup import (
        duplicated_span_profile,
    )

    return duplicated_span_profile(_t(spark, sf, "documents"), k=8).select(
        "doc_id", "lang", "source", "n_tokens", "dup_tokens",
        F.round("dup_frac", 6).alias("dup_frac"),
    )


def _canonical_links(spark, sf):
    """rel=canonical extraction + resolution (extract/canonical.py):
    six constructed page shapes — both attribute orders, both quote
    styles, absolute / scheme-relative / path-absolute / dir-relative
    hrefs, an undeclared page and an unresolvable ``..`` href. The
    oracle states the resolved canonical analytically per case; the
    engine's regex+CASE chain must land on it byte-for-byte."""
    from hk_housing_datahub_spark.extract.canonical import canonical_target

    d = _t(spark, sf, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(6))
    i = F.col("doc_id").cast("string")
    base = (
        F.when(m == 3, F.concat(F.lit("https://h3.example.com/dir/page"), i))
        .otherwise(F.concat(F.lit("https://h"), m.cast("string"),
                            F.lit(".example.com/a/b"), i))
    )
    html = (
        F.when(m == 0, F.concat(
            F.lit('<head><link rel="canonical" href="https://c0.example.com/page'),
            F.pmod("doc_id", F.lit(7)).cast("string"),
            F.lit('"></head>'),
        ))
        .when(m == 1, F.concat(
            F.lit("<link href='/canon/"), i,
            F.lit("' rel='canonical'><p>x</p>"),
        ))
        .when(m == 2, F.concat(
            F.lit('<LINK REL="canonical" HREF="//cdn.example.org/p/'),
            i, F.lit('">'),
        ))
        .when(m == 3, F.concat(
            F.lit('<link rel="canonical" href="c'), i,
            F.lit('.html">'),
        ))
        .when(m == 4, F.lit("<p>no declaration here</p>"))
        .otherwise(F.concat(
            F.lit('<link rel="canonical" href="../up/'), i, F.lit('">'),
        ))
    )
    return d.select(
        "doc_id",
        base.alias("url_canon"),
        canonical_target(html, base).alias("canonical"),
    )


def _blocklist_gate(spark, sf):
    """UT1/RefinedWeb domain blocklist gating (frontier/scope.py
    blocklist_filter): an entry blocks itself and every subdomain at
    any depth; overlapping entries resolve to the longest match. Hosts
    are constructed at four depths (deep-subdomain entry, registrable
    ccTLD entry, nested both-match, clean) — the oracle states the
    expected category analytically per case."""
    from hk_housing_datahub_spark.frontier.scope import blocklist_filter

    d = _t(spark, sf, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(4))
    url = (
        F.when(
            m == 0,
            F.concat(
                F.lit("https://ads.tracker"),
                F.pmod("doc_id", F.lit(3)).cast("string"),
                F.lit(".com/x/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://shop.example.co.uk/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://mail.bad.example.co.uk/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://clean.site"),
                F.pmod("doc_id", F.lit(5)).cast("string"),
                F.lit(".org/"),
                F.col("doc_id").cast("string"),
            ),
        )
    )
    urls = d.select("doc_id", url.alias("url_canon"))
    bl = spark.createDataFrame(
        [
            ("tracker0.com", "ads"),
            ("example.co.uk", "commerce"),
            ("bad.example.co.uk", "malware"),
        ],
        "domain string, category string",
    )
    return blocklist_filter(urls, bl, annotate=True)


def _streaming_matview(spark, sf):
    """Streaming materialized view (streaming/matview.py): documents
    arrive as three parquet waves, each micro-batch lands exactly-once
    via CatalogStreamSink and the per-source rollup is refreshed
    delta-only after every batch — the final view state must equal the
    plain GROUP BY over all documents, which IS the DuckDB twin (the
    streaming machinery is additionally pinned by test_matview.py:
    per-batch freshness, replay no-ops, resume)."""
    import tempfile

    from hk_housing_datahub_spark.sources import TableCatalog
    from hk_housing_datahub_spark.sources.rollup import (
        IncrementalRollup,
        Measure,
    )
    from hk_housing_datahub_spark.streaming.matview import (
        stream_materialized_rollup,
    )

    root = tempfile.mkdtemp(prefix="hk_matview_")
    src = os.path.join(root, "src")
    d = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    for i in range(3):
        d.where(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(src, f"w{i}")
        )
    cat = TableCatalog(spark, os.path.join(root, "cat"))
    r = IncrementalRollup(
        cat,
        src="docs",
        dst="docs_by_source",
        group_cols=["source"],
        measures={
            "n_docs": Measure("count"),
            "total_chars": Measure("sum", "n_chars"),
        },
    )
    stream_materialized_rollup(
        spark, src, cat, "docs", r, checkpoint=os.path.join(root, "ck")
    )
    return r.read()


def _host_boilerplate_strip(spark, sf):
    """Per-site template removal (operators/textops.py
    drop_boilerplate_lines with per_col — trafilatura's per-site dedup
    semantics): pages carry a per-source nav header and footer (hot
    WITHIN the source → dropped) plus a bucket-marker line that is
    common ACROSS sources but rare within each one (≈13 global copies,
    ≈1 per source → kept, the line a corpus-global pass would wrongly
    strip). The DuckDB twin replays the per-(source, line) DF count and
    the ordered rebuild; text bytes are md5-compared."""
    from hk_housing_datahub_spark.operators.textops import (
        drop_boilerplate_lines,
    )

    d = _t(spark, sf, "documents")
    pages = d.select(
        "doc_id",
        "source",
        F.concat_ws(
            "\n",
            F.concat(F.lit("shared navigation menu for "), F.col("source")),
            F.concat(
                F.lit("bucket marker line number "),
                (F.col("doc_id") % 37).cast("string"),
                F.lit(" padding"),
            ),
            F.col("text"),
            F.concat(F.lit("copyright footer of site "), F.col("source")),
        ).alias("text"),
    )
    out = drop_boilerplate_lines(
        pages, max_line_df=3, per_col="source"
    )
    return out.select(
        "doc_id", "source", F.md5("text").alias("text_md5")
    )


def _incremental_rollup(spark, sf):
    """Incremental materialized-rollup maintenance
    (sources/rollup.py IncrementalRollup): documents appended to a
    catalog table in three batches; the per-lang aggregate is refreshed
    delta-only (one refresh deliberately folds TWO snapshots, plus a
    trailing no-op refresh proving idempotence) — the final state must
    equal the plain GROUP BY over everything, which is exactly the
    DuckDB twin. The applied-source-snapshot watermark rides the state
    rows, so it commits atomically with the data."""
    import tempfile

    from hk_housing_datahub_spark.sources import TableCatalog
    from hk_housing_datahub_spark.sources.rollup import (
        IncrementalRollup,
        Measure,
    )

    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="hk_rollup_"))
    d = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    r = IncrementalRollup(
        cat,
        src="docs",
        dst="docs_by_lang",
        group_cols=["lang"],
        measures={
            "n_docs": Measure("count"),
            "total_chars": Measure("sum", "n_chars"),
            "min_doc": Measure("min", "doc_id"),
            "max_doc": Measure("max", "doc_id"),
        },
    )
    for i in range(3):
        cat.append("docs", d.where(F.pmod("doc_id", F.lit(3)) == i))
        if i != 1:  # batch 1 stays pending; batch 2's refresh folds both
            r.refresh()
    r.refresh()  # no-op: nothing new, state unchanged
    return r.read()


def _script_profile(spark, sf):
    """Per-doc Unicode-script mix (operators/textops.py script_profile,
    the CCNet script-vs-language garbage check): per-script counts via
    the length-difference regex trick, dominant script with a fixed
    tie-break order. The DuckDB twin uses RE2's \\p{Script} classes —
    identical membership to Java's \\p{IsScript} (probed in tests)."""
    from hk_housing_datahub_spark.operators.textops import script_profile

    return script_profile(_t(spark, sf, "documents"))


def _span_dedup_removal(spark, sf):
    """Span surgery (operators/spandedup.py remove_duplicated_spans,
    Lee et al. 2022 remove-all policy): every token inside a duplicated
    >=8-gram span is cut and the survivors re-joined. The DuckDB twin
    replays gram->count>=2->island-merge, then anti-joins token
    positions against the merged intervals and string_aggs the
    survivors in position order — the rebuilt text is md5-compared
    byte-for-byte."""
    from hk_housing_datahub_spark.operators.spandedup import (
        remove_duplicated_spans,
    )

    out = remove_duplicated_spans(_t(spark, sf, "documents"), k=8)
    return out.select(
        "doc_id",
        "lang",
        F.when(
            F.col("text_deduped") == "", F.lit(0)
        ).otherwise(F.size(F.split("text_deduped", " "))).cast("long")
        .alias("n_kept"),
        F.md5("text_deduped").alias("dedup_md5"),
    )


def _streaming_corpus_ingest(spark, sf):
    """Streaming corpus ingestion (streaming/corpus.py) — two arrival
    waves with overlapping texts drive foreachBatch intra-batch dedup →
    committed-fingerprint bloom dedup (bloom is a PREFILTER: hits
    exact-verify with an anti-join, so the committed set is EXACT) →
    quality gate → batch-id-stamped exactly-once appends. One file per
    wave makes batches ≡ waves, so the final committed corpus is a
    deterministic function of the two wave sets and the DuckDB twin
    replays it: per-wave min-doc_id-per-fingerprint survivors, wave 2
    anti-joined against wave 1's commits. Exactly-once replay/crash
    machinery stays pinned by tests/test_streaming_corpus.py."""
    from hk_housing_datahub_spark.sources import TableCatalog
    from hk_housing_datahub_spark.streaming.corpus import stream_corpus_ingest

    root = tempfile.mkdtemp(prefix="hk_stream_corpus_")
    src = os.path.join(root, "src")
    d = _t(spark, sf, "documents").select("doc_id", "text")
    d.filter(F.pmod("doc_id", F.lit(2)) == 0).coalesce(1).write.parquet(
        os.path.join(src, "w1")
    )
    # wave 2 re-sends half of wave 1 under new ids, plus the odd docs
    resent = (
        d.filter(F.pmod("doc_id", F.lit(4)) == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    d.filter(F.pmod("doc_id", F.lit(2)) == 1).unionByName(resent).coalesce(
        1
    ).write.parquet(os.path.join(src, "w2"))
    cat = TableCatalog(spark, os.path.join(root, "cat"))
    stream_corpus_ingest(
        spark, src, cat, "corpus", checkpoint=os.path.join(root, "ck")
    )
    return cat.read("corpus").select("doc_id", "fp", "quality")


def _main_content_extract(spark, sf):
    """jusText-style main-content extraction (extract/content.py,
    Pomikálek 2011 block classification) over a deterministically
    assembled page per document: a nav link block, the doc's first 120
    chars as the <p> paragraph, a per-doc link-farm list, a <script>
    that must never leak, and a footer — planted boilerplate AND planted
    content on every page. One whole-stage-codegen projection (regexp
    block split + transform/filter/aggregate, no UDF, no shuffle); the
    DuckDB twin replays the identical RE2-safe regexes and per-block
    scoring byte-for-byte."""
    from hk_housing_datahub_spark.extract.content import (
        extract_main_content,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit(
            '<div class="nav"><a href="/">Home</a> <a href="/about">'
            'About</a> <a href="/contact">Contact</a></div>'
        ),
        F.lit("<p>"),
        F.substring("text", 1, 120),
        F.lit("</p>"),
        F.lit('<script>var trk = "never content";</script>'),
        F.lit('<ul><li><a href="/d/'),
        F.col("doc_id").cast("string"),
        F.lit('">doc</a></li><li><a href="/x">more links here</a></li></ul>'),
        F.lit(
            '<footer><a href="/terms">Terms of service</a> '
            '<a href="/privacy">Privacy policy</a></footer>'
        ),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return extract_main_content(pages, key_cols=("doc_id",)).orderBy("doc_id")


def _crawl_to_corpus_docs(spark, sf):
    """The crawl→corpus glue (pipelines.corpus.pages_to_documents):
    input_hint-shaped pages (assembled deterministically: nav, the doc's
    text as the paragraph, script, link farm, footer; per-doc URL)
    become corpus-funnel documents — main-content text, md5(url) ids,
    host attribution, min-chars gate. The twin replays the content
    extraction byte-for-byte plus the id/host derivations."""
    from hk_housing_datahub_spark.pipelines.corpus import pages_to_documents

    docs = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    url = F.concat(
        F.lit("https://s"),
        F.pmod("doc_id", F.lit(97)).cast("string"),
        F.lit(".example.org/d/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit(
            '<div class="nav"><a href="/">Home</a> <a href="/about">'
            'About</a> <a href="/contact">Contact</a></div>'
        ),
        F.lit("<p>"),
        F.substring("text", 1, 120),
        F.lit("</p>"),
        F.lit('<script>var trk = "never content";</script>'),
        F.lit('<ul><li><a href="/d/'),
        F.col("doc_id").cast("string"),
        F.lit('">doc</a></li><li><a href="/x">more links here</a></li></ul>'),
        F.lit(
            '<footer><a href="/terms">Terms of service</a> '
            '<a href="/privacy">Privacy policy</a></footer>'
        ),
    )
    pages = docs.select(
        url.alias("url_canon"),
        html.alias("html"),
        "lang",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("warc_ts"),
    )
    out = pages_to_documents(pages).drop("warc_ts")
    return out.orderBy("doc_id")


def _wet_wat_records(spark, sf):
    """WET/WAT derivative rendering (sources/derivatives.py): each doc
    becomes a capture whose html carries 1–2 constructed anchors plus
    the doc text; the entry emits the capture's full WET conversion
    record TEXT, its WAT metadata JSON payload, and all three lockstep
    segment pointers (warc/wet/wat offsets from ONE response-keyed
    order). The twin rebuilds record bytes and offsets from the header
    grammar in SQL — dates via make_timestamp (UTC instant on both
    engines), links re-extracted with the byte-identical ANCHOR_RE."""
    from hk_housing_datahub_spark.sources.derivatives import (
        locate_derivatives,
        wat_payload,
        wet_record,
    )

    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
        F.lit(".example.com/p/"), F.col("doc_id"),
    )
    html_str = F.concat(
        F.lit('<html><a href="https://h'),
        F.pmod(F.col("doc_id") + 1, F.lit(10)).cast("string"),
        F.lit(".example.com/p/"),
        (F.col("doc_id") + 1).cast("string"),
        F.lit('">next</a>'),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(
                F.lit('<a href="https://x.org/'),
                F.col("doc_id").cast("string"),
                F.lit('">x '),
                F.col("doc_id").cast("string"),
                F.lit("</a>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("<p>"), F.coalesce("text", F.lit("")), F.lit("</p></html>"),
    )
    pages = d.select(
        url.alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.coalesce("text", F.lit("")).alias("text"),
        "lang",
        F.pmod("doc_id", F.lit(4)).alias("seg"),
    )
    locs = locate_derivatives(pages, segment_col="seg")
    recs = pages.select(
        "url",
        F.decode(
            wet_record(F.col("url"), F.col("warc_ts"), F.col("text")),
            "UTF-8",
        ).alias("wet_rec"),
        wat_payload(
            F.col("url"), F.col("warc_ts"), F.col("html"), F.col("lang")
        ).alias("wat_json"),
    )
    return locs.join(recs, "url").select(
        "url", "segment",
        "warc_offset", "warc_length",
        "wet_offset", "wet_length",
        "wat_offset", "wat_length",
        "wet_rec", "wat_json",
    )


def _conditional_refetch(spark, sf):
    """HTTP conditional revalidation (operators/recrawl.py
    latest_validators → fetch_plans → apply_fetch_results): docs %3!=0
    carry 1–2 captures with per-doc validator presence (etag / lm /
    both / neither via %4), every doc is due, and the response battery
    (%5: 304 / unchanged-200 / changed-200 / 503 / 304) exercises every
    disposition including bad-304-without-prior and never-crawled
    'new'. The twin replays the latest-capture ranking, both joins and
    the disposition CASE in SQL."""
    from hk_housing_datahub_spark.operators.recrawl import (
        apply_fetch_results,
        fetch_plans,
        latest_validators,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), F.pmod(did, F.lit(10)),
        F.lit(".example.com/p/"), did,
    )
    caps = (
        d.filter(F.pmod(did, F.lit(3)) != 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.pmod(did, F.lit(2)))).alias(
                "j"
            ),
        )
        .select(
            url.alias("url_canon"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + did * 7 + F.col("j") * 86_400
            ).alias("warc_ts"),
            F.md5(
                F.concat(
                    F.lit("c"), did.cast("string"),
                    F.lit("-"), F.col("j").cast("string"),
                )
            ).alias("digest"),
            F.when(
                F.pmod(did, F.lit(4)) <= 1,
                F.concat(F.lit('"e'), did.cast("string"), F.lit('"')),
            ).alias("etag"),
            F.when(
                F.pmod(did, F.lit(4)).isin(1, 2),
                F.concat(
                    F.lit("Mon, 0"), F.pmod(did, F.lit(9)).cast("string"),
                    F.lit(" Aug 2023 00:00:00 GMT"),
                ),
            ).alias("last_modified"),
        )
    )
    due = d.select(
        url.alias("url"), F.pmod(did, F.lit(5)).cast("int").alias("priority")
    )
    jmax = F.pmod(did, F.lit(2))
    m5 = F.pmod(did, F.lit(5))
    payload = (
        F.when(
            m5 == 1,
            F.concat(
                F.lit("c"), did.cast("string"),
                F.lit("-"), jmax.cast("string"),
            ),
        ).when(m5 == 2, F.concat(F.lit("x"), did.cast("string")))
    )
    resp = d.select(
        url.alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + did * 7 + F.lit(10 * 86_400)
        ).alias("fetch_ts"),
        F.when(m5 == 0, F.lit(304))
        .when(m5 == 3, F.lit(503))
        .when(m5 == 4, F.lit(304))
        .otherwise(F.lit(200))
        .cast("int")
        .alias("status"),
        F.encode(payload, "UTF-8").alias("payload"),
        F.when(m5 == 2, F.concat(F.lit('"n'), did.cast("string"), F.lit('"')))
        .alias("etag"),
        F.when(m5 == 1, F.lit("Tue, 02 Aug 2023 00:00:00 GMT"))
        .alias("last_modified"),
    )
    lat = latest_validators(caps)
    plans = fetch_plans(due, lat).select(
        "url", "priority", "mode",
        "if_none_match", "if_modified_since", "prior_digest",
    )
    folded = apply_fetch_results(lat, resp)
    return plans.join(folded, "url").select(
        "url", "priority", "mode", "if_none_match", "if_modified_since",
        "prior_digest", "epoch", "status", "disposition", "is_capture",
        "store_body", "digest", "etag", "last_modified", "changed",
    )


def _focus_outlink_scores(spark, sf):
    """Shark-search focused-crawl scoring (operators/focus.py): each doc
    page carries two constructed anchors (topical rotation on the first,
    a constant label on the second, shared targets via doc_id moduli so
    multi-parent max-potential aggregation is exercised) and a parent
    text whose lexicon relevance varies (every 5th doc gets the lexicon
    appended). Weights are powers of two (beta=0.75, gamma=delta=0.5)
    so both engines' double arithmetic is EXACT — the potential hashes
    bit-identically with no rounding."""
    from hk_housing_datahub_spark.operators.focus import (
        shark_outlink_scores,
    )

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    a1_txt = (
        F.when(F.pmod(did, F.lit(3)) == 0,
               F.concat(F.lit("kowloon flat "), did.cast("string")))
        .when(F.pmod(did, F.lit(3)) == 1, F.lit("nathan road walk"))
        .otherwise(F.lit("football news"))
    )
    html = F.concat(
        F.lit('<a href="https://t.example.com/a/'),
        F.pmod(did, F.lit(50)).cast("string"),
        F.lit('">'), a1_txt, F.lit("</a>"),
        F.lit('<a href="https://t.example.com/b/'),
        F.pmod(did, F.lit(40)).cast("string"),
        F.lit('">more info</a>'),
    )
    ptext = F.when(
        F.pmod(did, F.lit(5)) == 0,
        F.concat(F.coalesce("text", F.lit("")), F.lit(" kowloon flat")),
    ).otherwise(F.coalesce("text", F.lit("")))
    pages = d.select(
        F.concat(F.lit("https://p"), did).alias("url_canon"),
        F.encode(html, "UTF-8").alias("html"),
        ptext.alias("text"),
    )
    return shark_outlink_scores(
        pages, ["kowloon flat", "nathan road"],
        beta=0.75, gamma=0.5, delta=0.5,
    )


def _crawl_scope_filter(spark, sf):
    """Heritrix-style crawl scope (frontier/scope.py): constructed
    frontier URLs across four host shapes (ccTLD subdomain / bare
    ccTLD / gTLD subdomain / bare gTLD) with an excluded /cal/ path
    class; two literal seeds; the entry unions the host, domain and
    surt_prefix verdict sets tagged by mode. The twin states each
    mode's membership analytically from the same moduli (host = exact
    SURT host, domain = eTLD+1 fold, surt_prefix = path-scoped)."""
    from hk_housing_datahub_spark.frontier.scope import scope_filter

    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    m = F.pmod(did, F.lit(4))
    k = F.pmod(did, F.lit(7)).cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("a.b.shop"), k, F.lit(".co.uk")))
        .when(m == 1, F.concat(F.lit("shop"), k, F.lit(".co.uk")))
        .when(m == 2, F.concat(F.lit("sub.shop"), k, F.lit(".com")))
        .otherwise(F.concat(F.lit("shop"), k, F.lit(".com")))
    )
    path = F.when(
        F.pmod(did, F.lit(11)) == 0,
        F.concat(F.lit("/cal/"), did.cast("string")),
    ).otherwise(F.concat(F.lit("/p/"), did.cast("string")))
    f = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host, path).alias("url_canon"),
    )
    seeds = spark.createDataFrame(
        [("https://shop0.co.uk/x/1",), ("https://shop1.com/",)],
        "url_canon string",
    )
    out = None
    for mode in ("host", "domain", "surt_prefix"):
        part = scope_filter(
            f, seeds, mode=mode, exclude_patterns=["/cal/"]
        ).withColumn("mode", F.lit(mode))
        out = part if out is None else out.unionByName(part)
    return out.select("doc_id", "url_canon", "mode")


def _streaming_lsh_neardup(spark, sf):
    """Streaming NEAR-dup ingestion (streaming/neardup.py) —
    incremental MinHash-LSH across micro-batches: intra-batch
    exact-verified LSH dedup, cross-batch signature-estimator dedup
    against catalog-backed (sig, band) state, batch-id-stamped
    exactly-once appends with torn-batch healing (pytest-pinned in
    test_streaming_neardup.py). Runs in md5_56 hash mode so the DuckDB
    twin replays BOTH waves: per-wave survivors via the exact-path twin
    (LSH recall 1 at bands=32 on this corpus, the lsh_dedup_drop
    argument), then the cross-batch leg LITERALLY — 64 md5 minima per
    survivor, 32 band keys (md5 of the '#'-joined row mins), the
    (band, key) collision join and the matching-positions/64 estimator
    at the 0.5 threshold. Output = the committed near-dup-free
    corpus."""
    from hk_housing_datahub_spark.sources import TableCatalog
    from hk_housing_datahub_spark.streaming.neardup import (
        stream_neardup_ingest,
    )

    root = tempfile.mkdtemp(prefix="hk_stream_neardup_")
    src = os.path.join(root, "src")
    d = _t(spark, sf, "documents").select("doc_id", "text")
    # ONE file per wave: the two waves are the semantic batch
    # boundaries (wave 2's re-sent texts must hit wave 1's committed
    # state), and extra part-files would only multiply micro-batch
    # trigger overhead in the bench without exercising anything new
    # (the per-file exactly-once machinery is pinned by
    # test_streaming_neardup.py)
    d.filter(F.pmod("doc_id", F.lit(2)) == 0).coalesce(1).write.parquet(
        os.path.join(src, "w1")
    )
    # wave 2 re-sends half of wave 1's TEXTS under new ids (near-dups the
    # state must catch), plus the odd docs
    resent = (
        d.filter(F.pmod("doc_id", F.lit(4)) == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    d.filter(F.pmod("doc_id", F.lit(2)) == 1).unionByName(resent).coalesce(
        1
    ).write.parquet(os.path.join(src, "w2"))
    cat = TableCatalog(spark, os.path.join(root, "cat"))
    stream_neardup_ingest(
        spark, src, cat, "docs", checkpoint=os.path.join(root, "ck"),
        hash_mode="md5_56",
    )
    return cat.read("docs").select("doc_id", "text")


def _lm_perplexity_quality(spark, sf):
    """Bigram-LM perplexity quality scoring (the KenLM role in CCNet's
    pipeline, operators/lm_quality.py) — fit on the even-id half of the
    corpus, score the odd half; hash-checked against the DuckDB twin
    (which replays fit + scoring, short docs included as NULL rows) and
    additionally pinned at rel 1e-9 by tests/test_lm_quality.py."""
    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_bigram_lm,
        perplexity_score,
    )

    d = _t(spark, sf, "documents")
    lm = fit_bigram_lm(d.filter(F.pmod("doc_id", F.lit(2)) == 0))
    out = perplexity_score(d.filter(F.pmod("doc_id", F.lit(2)) == 1), lm)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 6).alias("perplexity"),
    )


def _robots_rfc_schedule(spark, sf):
    """RFC 9309 rule lists driving the scheduler's longest-match gate
    (functions/robots.py parse_robots_rules + robots_permits wired into
    scheduler.apply_robots): raw multi-rule robots bodies (full deny +
    Allow carve-out on even hosts; wildcard/`$`-anchored Disallow on odd
    hosts) gate a deterministic synthetic frontier; hash-checked against
    the analytic permitted-set oracle (exactly the /listing/ URLs survive
    and rank by the scheduler's tiebreak). Precedence semantics are also
    pinned by the pytest battery (test_crawl.py
    test_robots_longest_match_precedence /
    test_rfc_rules_feed_the_scheduler)."""
    from hk_housing_datahub_spark.frontier.scheduler import schedule_wave
    from hk_housing_datahub_spark.functions.robots import parse_robots_rules
    from hk_housing_datahub_spark.functions.urls import with_url_columns

    d = _t(spark, sf, "documents")
    path = (
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(F.lit("/listing/"), F.col("doc_id")),
        )
        .when(
            F.pmod("doc_id", F.lit(3)) == 1,
            F.concat(F.lit("/admin/"), F.col("doc_id")),
        )
        .otherwise(F.concat(F.lit("/files/"), F.col("doc_id"), F.lit(".pdf")))
    )
    urls = d.select(
        F.concat(
            F.lit("https://h"),
            F.pmod("doc_id", F.lit(8)),
            F.lit(".example.com"),
            path,
        ).alias("url"),
        F.lit(0).alias("priority"),
    )
    frontier = (
        with_url_columns(urls)
        .withColumn("discovered_ts", F.timestamp_seconds(F.lit(0)))
        .withColumn("depth", F.lit(0))
        .withColumn("attempt", F.lit(0))
    )
    nl = "\n"
    robots_raw = spark.range(8).select(
        F.format_string("h%d.example.com", "id").alias("host"),
        F.when(
            F.pmod("id", F.lit(2)) == 0,
            F.lit(
                f"User-agent: *{nl}Disallow: /{nl}Allow: /listing/{nl}"
                f"Crawl-delay: 0.1{nl}"
            ),
        )
        .otherwise(
            F.lit(f"User-agent: *{nl}Disallow: /*.pdf${nl}Disallow: /admin/{nl}")
        )
        .alias("robots_txt"),
    )
    out = schedule_wave(frontier, parse_robots_rules(robots_raw), wave_ms=100000)
    return out.filter("scheduled").select("url_canon", "host", "host_rank")


def _crawl_frontier_retry(spark, sf):
    """Retry sub-frontier (reference S7, base.py:16-45 3-try retry): corpus
    with dead links, max_attempts=3; dead urls are scheduled up to 3 waves
    then given up. Rows-only; parity vs the sequential simulator is pinned by
    tests/test_crawl.py::test_retry_subfrontier_parity."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 800, 10
    pages = generate_pages(spark, n, n_hosts=hosts, dead_link_every=5)
    robots = generate_robots(spark, n_hosts=hosts)
    seeds = generate_seeds(spark, 12, n, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_retry_")
    eng = CrawlEngine(
        spark, pages, robots, ckpt, seen_mode="exact", wave_ms=30000,
        max_depth=2, max_attempts=3,
    )
    res = eng.run(seeds, max_waves=4)
    return res.schedule_log(spark).orderBy("wave", "host", "host_rank")


def _crawl_frontier_bloom(spark, sf):
    """The 10^10-scale seen-set path: same crawl as crawl_frontier_run but
    with the salted-bucket bloom seen state (applyInPandas per bucket).
    Rows-only; bloom ⊆ exact and FPR bounds pinned by tests/test_seen.py and
    tests/test_crawl.py::test_bloom_mode_close_to_exact."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 1200, 16
    pages = generate_pages(spark, n, n_hosts=hosts)
    robots = generate_robots(spark, n_hosts=hosts)
    seeds = generate_seeds(spark, 15, n, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_bloom_")
    eng = CrawlEngine(
        spark, pages, robots, ckpt, seen_mode="bloom", n_buckets=64,
        bloom_bits=1 << 18, max_depth=2,
    )
    res = eng.run(seeds, max_waves=3)
    return res.listings(spark).drop("outlinks")


def _crawl_frontier_cuckoo(spark, sf):
    """The north-star-named seen-set: partitioned cuckoo filter (per-bucket
    fingerprint table + bounded eviction, applyInPandas state). Rows-only;
    no-false-negative/eviction/restore properties pinned by tests/test_seen.py."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    n, hosts = 1200, 16
    pages = generate_pages(spark, n, n_hosts=hosts)
    robots = generate_robots(spark, n_hosts=hosts)
    seeds = generate_seeds(spark, 15, n, n_hosts=hosts)
    ckpt = tempfile.mkdtemp(prefix="hkcrawl_cuckoo_")
    eng = CrawlEngine(
        spark, pages, robots, ckpt, seen_mode="cuckoo", n_buckets=64,
        cuckoo_rows=1 << 12, max_depth=2,
    )
    res = eng.run(seeds, max_waves=3)
    return res.listings(spark).drop("outlinks")


def _multimodal_probe(spark, sf):
    """Multimodal plumbing (multimodal/binary.py), meta ∪ frames in one
    driver slot (union-shaped merge, every row/column of BOTH paths still
    hash-checked): payload → typed metadata decode, and payload → 4 byte
    slices per doc via mapInPandas (slice sizes + checksums kept, raw
    bytes dropped for stable hashing); the oracle recomputes metadata and
    each frame with character substrings + md5."""
    from hk_housing_datahub_spark.multimodal import sample_frames

    d = attach_payload(_t(spark, sf, "documents"))
    meta = decode_payload_meta(d).select(
        F.lit("meta").alias("tbl"),
        "doc_id",
        F.lit(None).cast("int").alias("idx"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("media_type").alias("label"),
        F.col("width").cast("int").alias("w"),
        F.col("height").cast("int").alias("h"),
        "checksum",
    )
    frames = sample_frames(d, n_frames=4).select(
        F.lit("frames").alias("tbl"),
        "doc_id",
        F.col("frame_index").cast("int").alias("idx"),
        F.coalesce(
            F.length("frame_bytes").cast("long"), F.lit(0).cast("long")
        ).alias("n_bytes"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.col("frame_checksum").alias("checksum"),
    )
    return meta.unionByName(frames)


def _streaming_windowed(spark, sf):
    """Watermarked tumbling-window streaming aggregation
    (streaming/events.py) driven to completion in COMPLETE output mode —
    the watermark is inert there (all window state retained), so the
    final table must equal the plain batch GROUP BY over all events:
    that batch query IS the DuckDB oracle (same idiom as the
    already-oracled tumbling_counts batch twin). Append-mode late-drop
    and state-eviction semantics stay pinned by
    run_windowed_counts_append + tests/test_newops.py."""
    out = run_windowed_counts(
        spark, os.path.join(sf, "events.parquet"), query_name="ev_counts_q"
    )
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias(
            "win_start"
        ),
        "event_type",
        "n",
        "total_value",
    )


def _wiki_table_expand(spark, sf):
    """Deterministic wikitext synthesized from the documents table, then the
    stateful colspan/rowspan 2-D expansion (F8) + CSV render (F9)."""
    d = _t(spark, sf, "documents")
    wiki = d.select(
        "doc_id",
        F.format_string(
            '{|\n|-\n! Doc !! colspan="2" | Stats\n'
            '|-\n| rowspan="2" | [[Doc %s|d%s]] || %s || %s\n'
            "|-\n| lang=%s || src=%s\n|}",
            "doc_id", "doc_id", "lang", "n_chars", "lang", "source",
        ).alias("wikitext"),
    )
    return expand_wikitables(wiki)


def _embed_chunks(spark, sf):
    """EP3 parity: chunk → iterator-UDF embed → vector-table shape."""
    chunks = chunk_documents(_t(spark, sf, "documents"))
    out = embed_documents(chunks, text_col="chunk", id_col="chunk_id", dim=64)
    return out.select(
        "chunk_id", F.size("embedding").alias("dim"), "embedding_norm"
    )


def _ivf_ann_topk(spark, sf):
    """IVF coarse-quantized ANN (operators/similarity.py ivf_topk) with
    an md5-grid literal centroid matrix — the same cell assignment,
    nprobe fan-out, candidate join and cosine rerank as the
    kmeans-fitted path, with a centroid source the DuckDB twin can
    regenerate (assignment ranks by raw dot against the literal
    matrix). The Lloyd's fit itself stays pinned by the recall tests."""
    from hk_housing_datahub_spark.operators.similarity import (
        md5_grid_values,
    )

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.pmod("vec_id", F.lit(25)) == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cents = md5_grid_values(16, 64)
    return SIM.ivf_topk(
        e, q, dim=64, k=5, n_cells=16, nprobe=6, centroids=cents
    ).select("qid", "nid", "cos_sim", "rnk")


def _streaming_stateful_dedup(spark, sf):
    """Stateful streaming seen-set: two micro-batches with overlapping
    URLs; state (per-bucket bloom bytes) persists across batches. The
    emitted set is deterministic — batch 1 probes an EMPTY filter (a
    bloom has no false positives against nothing, so every distinct
    hash emits) and batch 2 is entirely true-positives (b2 ⊆ b1, blooms
    have no false negatives) — so the DuckDB twin is the wave-1
    construction itself; the bloom kernels' bit math is pinned by the
    frontier/seen property suite."""
    from hk_housing_datahub_spark.streaming import run_streaming_dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    urls = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        (F.col("doc_id") * 7919).alias("url_hash"),
        F.pmod("doc_id", F.lit(8)).cast("int").alias("bucket"),
    )
    root = tempfile.mkdtemp(prefix="hk_sdedup_")
    urls.coalesce(1).write.parquet(os.path.join(root, "b1"))
    # second batch: 50% overlap with the first
    urls.filter(F.pmod(F.col("url_hash") / 7919, F.lit(2)) == 0).coalesce(
        1
    ).write.parquet(os.path.join(root, "b2"))
    return run_streaming_dedup(
        spark, os.path.join(root, "*", "*.parquet"), query_name="sdedup_q"
    )


def _streaming_recrawl(spark, sf):
    """Streaming recrawl scheduler (streaming/recrawl.py): two capture
    micro-batches a day apart (digests flip on ~1/3 of URLs, md5-keyed
    so the oracle can replay the flip); state = per-URL sufficient
    statistics in url-hash buckets, one schedule row EMITTED per
    captured URL per batch (update semantics). Batches ≡ waves (one
    file each), so the emitted row set is the per-URL schedule math at
    n_captures = 1 and again at 2 — the DuckDB twin replays both
    snapshots with the recrawl_schedule formulas.
    tests/test_streaming_recrawl.py additionally pins stream≡batch
    parity."""
    from hk_housing_datahub_spark.streaming.recrawl import (
        run_streaming_recrawl,
    )

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    caps = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        F.pmod("doc_id", F.lit(8)).cast("int").alias("bucket"),
        (F.lit(1_700_000_000) + F.col("doc_id")).alias("ts"),
        F.md5(F.col("doc_id").cast("string")).alias("digest"),
    )
    from hk_housing_datahub_spark.functions.hash56 import md5_long56

    flip = F.pmod(md5_long56(F.col("url_canon")), F.lit(3)) == 0
    root = tempfile.mkdtemp(prefix="hk_srecrawl_")
    caps.coalesce(1).write.parquet(os.path.join(root, "b1"))
    caps.select(
        "url_canon",
        "bucket",
        (F.col("ts") + F.lit(86_400)).alias("ts"),
        F.when(flip, F.concat("digest", F.lit("x")))
        .otherwise(F.col("digest"))
        .alias("digest"),
    ).coalesce(1).write.parquet(os.path.join(root, "b2"))
    out = run_streaming_recrawl(
        spark, os.path.join(root, "*", "*.parquet"),
        query_name="srecrawl_q",
    )
    return out.select(
        "url",
        "n_captures",
        "n_changes",
        F.round("avg_interval_s", 6).alias("avg_interval_s"),
        F.round("lambda_per_day", 6).alias("lambda_per_day"),
        F.round("refetch_interval_s", 6).alias("refetch_interval_s"),
        "next_fetch_epoch",
    )


def _streaming_tws_dedup(spark, sf):
    """Same seen-set state machine on transformWithStateInPandas (Spark 4
    arbitrary stateful API): RocksDB state store, per-bucket bloom state,
    warm-startable from a batch crawl checkpoint, TTL-expirable
    (streaming/tws.py; tests/test_tws.py pins parity with the
    applyInPandasWithState path, warm start, and TTL re-emit). Same
    deterministic two-batch construction as streaming_stateful_dedup,
    same wave-1 oracle."""
    from hk_housing_datahub_spark.streaming import run_streaming_dedup_tws

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    urls = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        (F.col("doc_id") * 7919).alias("url_hash"),
        F.pmod("doc_id", F.lit(8)).cast("int").alias("bucket"),
    )
    root = tempfile.mkdtemp(prefix="hk_twsdedup_")
    urls.coalesce(1).write.parquet(os.path.join(root, "b1"))
    urls.filter(F.pmod(F.col("url_hash") / 7919, F.lit(2)) == 0).coalesce(
        1
    ).write.parquet(os.path.join(root, "b2"))
    return run_streaming_dedup_tws(
        spark, os.path.join(root, "*", "*.parquet"), query_name="twsdedup_q"
    )


def _gopher_repetition(spark, sf):
    """Full Gopher within-document repetition battery (Rae et al. 2021
    Table A1; operators/textops.py::gopher_repetition_flags): 13 fraction
    metrics + flags + rep_pass per document, all per-row sorted-run HOFs
    — a map-only pass at any scale. Oracle: the per-value GROUP BY twin
    (_gopher_repetition_sql); the run-scan numerators equal
    sum((cnt-1)*len) / max(cnt*len) exactly, so every fraction matches to
    the comparator's 6 decimals."""
    from hk_housing_datahub_spark.operators.textops import (
        GOPHER_REPETITION_RULES,
        gopher_repetition_flags,
    )

    out = gopher_repetition_flags(_t(spark, sf, "documents"))
    cols = [F.col("doc_id")]
    for name, _ in GOPHER_REPETITION_RULES:
        cols.append(F.round(name, 6).alias(name))
        cols.append(F.col(f"flag_{name}"))
    return out.select(*cols, "rep_pass")


def _gopher_repetition_sql() -> str:
    """DuckDB twin of the repetition battery: per-doc element lists via
    list_transform/list_filter, then one unnest + GROUP BY per metric
    family computing sum(cnt-1), sum((cnt-1)*len) and max(cnt*len)."""
    from hk_housing_datahub_spark.operators.textops import (
        GOPHER_REPETITION_RULES,
    )

    def ngram_cte(n):
        return (
            f"g{n} AS (SELECT doc_id, CAST(max(cnt*length(g)) AS BIGINT)"
            f" AS top, CAST(sum((cnt-1)*length(g)) AS BIGINT) AS dupc\n"
            f"  FROM (SELECT doc_id, g, count(*) AS cnt FROM\n"
            f"    (SELECT doc_id, unnest(list_transform(range(1, "
            f"greatest(len(w)-{n}+2, 1)), i -> array_to_string("
            f"w[i:i+{n}-1], ' '))) AS g FROM words)\n"
            f"   GROUP BY doc_id, g) GROUP BY doc_id)"
        )

    def grp_cte(alias, src_col, src):
        return (
            f"{alias} AS (SELECT doc_id, CAST(sum(cnt-1) AS BIGINT) AS "
            f"dup_els, CAST(sum((cnt-1)*length(e)) AS BIGINT) AS dup_chars,"
            f" CAST(sum(cnt) AS BIGINT) AS n_els,"
            f" CAST(sum(cnt*length(e)) AS BIGINT) AS tot_chars\n"
            f"  FROM (SELECT doc_id, e, count(*) AS cnt FROM\n"
            f"    (SELECT doc_id, unnest({src_col}) AS e FROM {src})\n"
            f"   GROUP BY doc_id, e) GROUP BY doc_id)"
        )

    ctes = [
        "base AS (SELECT doc_id, text, trim(regexp_replace(lower(text),"
        " '\\s+', ' ', 'g')) AS nt FROM documents)",
        "words AS (SELECT doc_id, CASE WHEN nt = '' THEN"
        " CAST([] AS VARCHAR[]) ELSE string_split(nt, ' ') END AS w,"
        " length(nt) AS nc FROM base)",
        "lines_l AS (SELECT doc_id, list_filter(list_transform("
        "string_split(text, chr(10)), x -> trim(x)), x -> x <> '')"
        " AS ls FROM base)",
        "paras_l AS (SELECT doc_id, list_filter(list_transform("
        "string_split_regex(text, '\\n{2,}'), x -> trim(x)),"
        " x -> x <> '') AS ps FROM base)",
        grp_cte("line_g", "ls", "lines_l"),
        grp_cte("para_g", "ps", "paras_l"),
    ] + [ngram_cte(n) for n in range(2, 11)]

    exprs = {
        "dup_line_frac": "CASE WHEN coalesce(line_g.n_els,0) > 0 THEN"
        " line_g.dup_els / line_g.n_els ELSE 0.0 END",
        "dup_para_frac": "CASE WHEN coalesce(para_g.n_els,0) > 0 THEN"
        " para_g.dup_els / para_g.n_els ELSE 0.0 END",
        "dup_line_char_frac": "CASE WHEN coalesce(line_g.tot_chars,0) > 0"
        " THEN line_g.dup_chars / line_g.tot_chars ELSE 0.0 END",
        "dup_para_char_frac": "CASE WHEN coalesce(para_g.tot_chars,0) > 0"
        " THEN para_g.dup_chars / para_g.tot_chars ELSE 0.0 END",
    }
    for n in (2, 3, 4):
        exprs[f"top_{n}gram_char_frac"] = (
            f"CASE WHEN words.nc > 0 THEN coalesce(g{n}.top, 0) / words.nc"
            " ELSE 0.0 END"
        )
    for n in range(5, 11):
        exprs[f"dup_{n}gram_char_frac"] = (
            f"CASE WHEN words.nc > 0 THEN coalesce(g{n}.dupc, 0) / words.nc"
            " ELSE 0.0 END"
        )

    sel, flags = [], []
    for name, thr in GOPHER_REPETITION_RULES:
        sel.append(f"round({exprs[name]}, 6) AS {name}")
        sel.append(f"({exprs[name]}) > {thr} AS flag_{name}")
        flags.append(f"NOT (({exprs[name]}) > {thr})")
    joins = "\n  ".join(
        f"LEFT JOIN {a} USING (doc_id)"
        for a in ["line_g", "para_g"] + [f"g{n}" for n in range(2, 11)]
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT words.doc_id, "
        + ",\n  ".join(sel)
        + ",\n  (" + " AND ".join(flags) + ") AS rep_pass"
        + f"\nFROM words\n  {joins}"
    )


def _link_graph_rank(spark, sf):
    """Link-graph PageRank (operators/linkgraph.py) over a deterministic
    synthetic outlink graph on the documents table: every doc with
    doc_id % 11 != 0 links to (7d+1, 13d+5, 29d+11) mod N, so ~1/11 of
    nodes are dangling (receive links, emit none) and the uniform
    redistribution term is exercised. 5 power iterations, fixed — the
    oracle is the same recurrence unrolled as chained CTEs."""
    from hk_housing_datahub_spark.operators.linkgraph import pagerank

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    ranks = pagerank(edges, damping=0.85, iterations=5)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _link_graph_rank_sql(iterations: int = 5) -> str:
    """Unrolled PageRank twin: r0 = 1/n, then per iteration one
    contribution GROUP BY, one dangling-mass scalar, one rebuild —
    float literals cast to DOUBLE so DuckDB's decimal arithmetic never
    enters and the operation order matches the Spark Columns exactly."""
    ctes = [
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        "raw AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id AS src, (doc_id*{a}+{b}) % n AS dst"
            " FROM documents, nd WHERE doc_id % 11 <> 0"
            for a, b in ((7, 1), (13, 5), (29, 11))
        )
        + ")",
        "e AS (SELECT DISTINCT src, dst FROM raw)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / cnt AS rank"
        " FROM nodes, nn)",
    ]
    d = "CAST(0.85 AS DOUBLE)"
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib"
            f" FROM e JOIN {p} r ON e.src = r.node"
            f" JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
        ctes.append(
            f"dm{i} AS (SELECT coalesce(sum(r.rank), CAST(0.0 AS DOUBLE))"
            f" AS dmass FROM {p} r LEFT JOIN deg d ON r.node = d.src"
            f" WHERE d.src IS NULL)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node,"
            f" (CAST(1.0 AS DOUBLE) - {d}) / nn.cnt"
            f" + {d} * (coalesce(c.contrib, CAST(0.0 AS DOUBLE))"
            f" + dm.dmass / nn.cnt) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c ON n.node = c.node,"
            f" dm{i} dm, nn)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, round(rank, 6) AS rank"
        f" FROM r{iterations}"
    )


def _trust_graph_rank(spark, sf):
    """TrustRank (operators/linkgraph.py trustrank) over the same
    synthetic outlink graph as link_graph_rank, seeds = nodes with
    node % 17 == 0 — teleport mass concentrates on the seeds, dangling
    mass redistributes along the trust vector, and components
    unreachable from any seed decay toward zero. 5 fixed iterations;
    the oracle unrolls the identical recurrence."""
    from hk_housing_datahub_spark.operators.linkgraph import trustrank

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    seeds = docs.filter(F.pmod("doc_id", F.lit(17)) == 0).select(
        F.col("doc_id").alias("node")
    )
    ranks = trustrank(edges, seeds, damping=0.85, iterations=5)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _trust_graph_rank_sql(iterations: int = 5) -> str:
    """Unrolled TrustRank twin of _trust_graph_rank: identical CTE
    skeleton to _link_graph_rank_sql with the uniform 1/n terms
    replaced by the seed-concentrated trust vector t (r0 = t, teleport
    (1-d)*t, dangling mass * t) — operation order mirrored so DuckDB's
    doubles match the Spark Columns far below round(…, 6)."""
    ctes = [
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        "raw AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id AS src, (doc_id*{a}+{b}) % n AS dst"
            " FROM documents, nd WHERE doc_id % 11 <> 0"
            for a, b in ((7, 1), (13, 5), (29, 11))
        )
        + ")",
        "e AS (SELECT DISTINCT src, dst FROM raw)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "seeds AS (SELECT node FROM nodes WHERE node % 17 = 0)",
        "sc AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM seeds)",
        "tv AS (SELECT n.node, CASE WHEN s.node IS NOT NULL"
        " THEN CAST(1.0 AS DOUBLE) / sc.cnt ELSE CAST(0.0 AS DOUBLE) END"
        " AS t FROM nodes n LEFT JOIN seeds s ON n.node = s.node, sc)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, t AS rank FROM tv)",
    ]
    d = "CAST(0.85 AS DOUBLE)"
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib"
            f" FROM e JOIN {p} r ON e.src = r.node"
            f" JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
        ctes.append(
            f"dm{i} AS (SELECT coalesce(sum(r.rank), CAST(0.0 AS DOUBLE))"
            f" AS dmass FROM {p} r LEFT JOIN deg d ON r.node = d.src"
            f" WHERE d.src IS NULL)"
        )
        ctes.append(
            f"r{i} AS (SELECT t.node,"
            f" (CAST(1.0 AS DOUBLE) - {d}) * t.t"
            f" + {d} * (coalesce(c.contrib, CAST(0.0 AS DOUBLE))"
            f" + dm.dmass * t.t) AS rank"
            f" FROM tv t LEFT JOIN c{i} c ON t.node = c.node,"
            f" dm{i} dm)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, round(rank, 6) AS rank"
        f" FROM r{iterations}"
    )


def _hits_rank(spark, sf):
    """HITS hubs/authorities (operators/linkgraph.py hits) over the same
    synthetic outlink graph as link_graph_rank/trust_graph_rank — 5
    fixed mutually-recursive L1-normalized half-steps; the oracle
    unrolls the identical recurrence (two joins + two normalizations
    per round)."""
    from hk_housing_datahub_spark.operators.linkgraph import hits

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    scores = hits(edges, iterations=5)
    return scores.select(
        F.col("node").alias("doc_id"),
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _hits_rank_sql(iterations: int = 5) -> str:
    """Unrolled HITS twin of _hits_rank: same CTE graph construction as
    _trust_graph_rank_sql; each round is authority = normalized in-push
    of hubs then hub = normalized out-pull of authorities, with the
    coalesce-then-divide operation order mirrored from the Spark
    Columns so DuckDB's doubles agree far below round(…, 6)."""
    # MATERIALIZED: DuckDB inlines CTEs by default, and e/nodes are
    # referenced in every half-step — inlining would re-expand the
    # 3-way documents scan dozens of times (fd exhaustion at sf0.01)
    ctes = [
        "nd AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n"
        " FROM documents)",
        "raw AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id AS src, (doc_id*{a}+{b}) % n AS dst"
            " FROM documents, nd WHERE doc_id % 11 <> 0"
            for a, b in ((7, 1), (13, 5), (29, 11))
        )
        + ")",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw)",
        "nodes AS MATERIALIZED"
        " (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS hub"
        " FROM nodes, nd)",
    ]
    z = "CAST(0.0 AS DOUBLE)"
    for i in range(1, iterations + 1):
        ctes.append(
            f"ra{i} AS (SELECT e.dst AS node, sum(h.hub) AS v"
            f" FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst)"
        )
        ctes.append(
            f"sa{i} AS (SELECT coalesce(sum(v), {z}) AS tot FROM ra{i})"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT n.node, CASE WHEN s.tot > 0"
            f" THEN coalesce(r.v, {z}) / s.tot ELSE {z} END AS authority"
            f" FROM nodes n LEFT JOIN ra{i} r ON n.node = r.node, sa{i} s)"
        )
        ctes.append(
            f"rh{i} AS (SELECT e.src AS node, sum(a.authority) AS v"
            f" FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)"
        )
        ctes.append(
            f"sh{i} AS (SELECT coalesce(sum(v), {z}) AS tot FROM rh{i})"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT n.node, CASE WHEN s.tot > 0"
            f" THEN coalesce(r.v, {z}) / s.tot ELSE {z} END AS hub"
            f" FROM nodes n LEFT JOIN rh{i} r ON n.node = r.node, sh{i} s)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT h.node AS doc_id, round(h.hub, 6) AS hub,"
        f" round(a.authority, 6) AS authority"
        f" FROM h{iterations} h JOIN a{iterations} a ON h.node = a.node"
    )


def _structured_listing_fields(spark, sf):
    """Structured-data extraction (extract/structured.py): schema.org
    JSON-LD blocks + OpenGraph meta tags with the per-field
    JSON-LD-first fallback chain, over deterministically constructed
    html: doc_id%3==0 carries BOTH channels (LD wins; %7==0 slices the
    LD malformed so the chain falls through, %5==0 makes it partial so
    price falls through but name doesn't), %3==1 carries OG only,
    %3==2 neither. The DuckDB twin replays the identical block regex,
    json_valid-guarded JSON paths, first-occurrence OG lookup and
    coalesce chain — engine-vs-engine on the actual parsing."""
    from hk_housing_datahub_spark.extract.structured import (
        listing_from_structured,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    p = (F.lit(1000000) + F.pmod(F.col("doc_id") * 37, F.lit(900000))).cast(
        "string"
    )
    ogp = (
        F.lit(1000001) + F.pmod(F.col("doc_id") * 37, F.lit(900000))
    ).cast("string")
    addr_no = F.pmod("doc_id", F.lit(999)).cast("string")
    ld_full = F.concat(
        F.lit('<script type="application/ld+json">{"@type":"Offer","name":"Flat '),
        sid,
        F.lit('","offers":{"price":"'),
        p,
        F.lit('","priceCurrency":"HKD"},"address":{"streetAddress":"No. '),
        addr_no,
        F.lit(' Nathan Road"}}</script>'),
    )
    ld_partial = F.concat(
        F.lit('<script type="application/ld+json">{"@type":"Offer","name":"Flat '),
        sid,
        F.lit('"}</script>'),
    )
    ld_bad = F.concat(
        F.lit('<script type="application/ld+json">{"name":"Flat '),
        sid,
        F.lit('"</script>'),
    )
    ld = F.when(
        F.pmod("doc_id", F.lit(3)) == 0,
        F.when(F.pmod("doc_id", F.lit(7)) == 0, ld_bad)
        .when(F.pmod("doc_id", F.lit(5)) == 0, ld_partial)
        .otherwise(ld_full),
    ).otherwise(F.lit(""))
    og = F.when(
        F.pmod("doc_id", F.lit(3)) < 2,
        F.concat(
            F.lit('<meta property="og:title" content="OG '),
            sid,
            F.lit('"/><meta property="product:price:amount" content="'),
            ogp,
            F.lit('"/><meta property="product:price:currency" content="HKD"/>'),
        ),
    ).otherwise(F.lit(""))
    pages = d.select(
        F.concat(F.lit("url-"), sid).alias("url_canon"),
        F.encode(F.concat(F.lit("<html>"), ld, og, F.lit("</html>")), "UTF-8").alias(
            "html"
        ),
    )
    return listing_from_structured(pages).select(
        "url",
        "name",
        "price",
        F.round("price_num", 6).alias("price_num"),
        "currency",
        "address",
        "src_jsonld",
    )


def _structured_listing_fields_sql() -> str:
    """DuckDB twin of _structured_listing_fields: same html bytes via
    string concat, same block regex (``[^<]*`` body — identical match
    spans in RE2 and Java), json_valid-guarded JSON paths, OG lookup =
    list_position on the parallel regexp_extract_all arrays (first
    occurrence, like the Spark min-by-pos), same coalesce chain."""
    return r"""
WITH parts AS (
  SELECT doc_id,
         CAST(doc_id AS VARCHAR) AS sid,
         CAST(1000000 + (doc_id*37) % 900000 AS VARCHAR) AS p,
         CAST(1000001 + (doc_id*37) % 900000 AS VARCHAR) AS ogp,
         CAST(doc_id % 999 AS VARCHAR) AS addr_no
    FROM documents
),
pages AS (
  SELECT 'url-' || sid AS url,
         '<html>'
         || CASE WHEN doc_id % 3 = 0 THEN
              CASE
                WHEN doc_id % 7 = 0 THEN
                  '<script type="application/ld+json">{"name":"Flat '
                  || sid || '"</script>'
                WHEN doc_id % 5 = 0 THEN
                  '<script type="application/ld+json">{"@type":"Offer","name":"Flat '
                  || sid || '"}</script>'
                ELSE
                  '<script type="application/ld+json">{"@type":"Offer","name":"Flat '
                  || sid || '","offers":{"price":"' || p
                  || '","priceCurrency":"HKD"},"address":{"streetAddress":"No. '
                  || addr_no || ' Nathan Road"}}</script>'
              END
            ELSE '' END
         || CASE WHEN doc_id % 3 < 2 THEN
              '<meta property="og:title" content="OG ' || sid
              || '"/><meta property="product:price:amount" content="' || ogp
              || '"/><meta property="product:price:currency" content="HKD"/>'
            ELSE '' END
         || '</html>' AS h
    FROM parts
),
ld AS (
  SELECT url,
         unnest(regexp_extract_all(
           h, '<script type="application/ld\+json">([^<]*)</script>', 1
         )) AS j
    FROM pages
),
ldf AS (
  SELECT url,
         min(CASE WHEN json_valid(j)
             THEN json_extract_string(j, '$.name') END) AS ld_name,
         min(CASE WHEN json_valid(j)
             THEN json_extract_string(j, '$.offers.price') END) AS ld_price,
         min(CASE WHEN json_valid(j)
             THEN json_extract_string(j, '$.offers.priceCurrency') END)
           AS ld_currency,
         min(CASE WHEN json_valid(j)
             THEN json_extract_string(j, '$.address.streetAddress') END)
           AS ld_address
    FROM ld GROUP BY url
),
ogf AS (
  SELECT url,
         conts[list_position(props, 'og:title')] AS og_name,
         conts[list_position(props, 'product:price:amount')] AS og_price,
         conts[list_position(props, 'product:price:currency')] AS og_currency,
         conts[list_position(props, 'og:street-address')] AS og_address
    FROM (
      SELECT url,
             regexp_extract_all(
               h, '<meta property="([^"]*)" content="([^"]*)"\s*/?>', 1
             ) AS props,
             regexp_extract_all(
               h, '<meta property="([^"]*)" content="([^"]*)"\s*/?>', 2
             ) AS conts
        FROM pages
    )
)
SELECT pg.url,
       coalesce(l.ld_name, o.og_name) AS name,
       coalesce(l.ld_price, o.og_price) AS price,
       round(TRY_CAST(coalesce(l.ld_price, o.og_price) AS DOUBLE), 6)
         AS price_num,
       coalesce(l.ld_currency, o.og_currency) AS currency,
       coalesce(l.ld_address, o.og_address) AS address,
       (l.ld_name IS NOT NULL OR l.ld_price IS NOT NULL
        OR l.ld_currency IS NOT NULL OR l.ld_address IS NOT NULL)
         AS src_jsonld
  FROM pages pg
  LEFT JOIN ldf l ON pg.url = l.url
  LEFT JOIN ogf o ON pg.url = o.url
"""


def _host_communities(spark, sf):
    """Deterministic label propagation (operators/communities.py) over
    the same synthetic outlink graph as the rank entries, symmetrized,
    3 synchronous rounds — tie-breaks to the smallest label, so the
    labeling is reproducible engine-to-engine; the oracle unrolls the
    identical vote/argmin recurrence with a row_number argmin."""
    from hk_housing_datahub_spark.operators.communities import (
        label_propagation,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    labels = label_propagation(edges, rounds=3)
    return labels.select(
        F.col("node").alias("doc_id"),
        "label",
        F.col("n_changed").cast("long").alias("n_changed"),
    )


def _host_communities_sql(rounds: int = 3) -> str:
    """Unrolled LPA twin of _host_communities: symmetrize + dedup +
    drop self-loops, then per round one vote count and one
    (cnt DESC, label ASC) row_number argmin; n_changed = last-round
    label diffs, broadcast onto every row like the Spark constant."""
    ctes = [
        "nd AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n"
        " FROM documents)",
        "raw AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id AS src, (doc_id*{a}+{b}) % n AS dst"
            " FROM documents, nd WHERE doc_id % 11 <> 0"
            for a, b in ((7, 1), (13, 5), (29, 11))
        )
        + ")",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM"
        " (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e))",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"v{i} AS (SELECT u.src AS node, l.label,"
            f" count(*) AS cnt FROM und u JOIN l{i - 1} l"
            f" ON u.dst = l.node GROUP BY u.src, l.label)"
        )
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn"
            f" FROM v{i}) WHERE rn = 1)"
        )
    ctes.append(
        f"ch AS (SELECT count(*) AS c FROM l{rounds} a"
        f" JOIN l{rounds - 1} b ON a.node = b.node"
        f" AND a.label <> b.label)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.node AS doc_id, a.label,"
        f" CAST(ch.c AS BIGINT) AS n_changed FROM l{rounds} a, ch"
    )


def _harmonic_centrality(spark, sf):
    """Harmonic centrality (operators/centrality.py
    harmonic_centrality_exact — the verification twin of the HyperBall
    scale path) over the same synthetic outlink graph as the other
    rank entries, truncated at radius 4. The oracle is a recursive-CTE
    BFS: min-hop per (src, dst) pair under the same radius, then
    harmonic(v) = sum(1/d) over in-pairs — a REPRESENTATION-opposite
    computation (pair table vs ball growth) that must agree exactly."""
    from hk_housing_datahub_spark.operators.centrality import (
        harmonic_centrality_exact,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    hc = harmonic_centrality_exact(edges, max_hops=4)
    return hc.select(
        F.col("node").alias("doc_id"),
        F.col("ball_size").cast("long").alias("ball_size"),
        F.round("harmonic", 6).alias("harmonic"),
    )


def _harmonic_centrality_sql(max_hops: int = 4) -> str:
    """Recursive-BFS twin of _harmonic_centrality. The recursive
    member's UNION dedups (src, dst, d) triples so exploration is
    bounded by pairs × radius; min(d) per pair is the hop distance;
    self-pairs (possible via (a*x+b)%n == x) are excluded from the
    harmonic sum and ball count exactly as a node's own presence in
    its ball contributes no growth on the Spark side."""
    return f"""
WITH RECURSIVE
nd AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT doc_id AS src, (doc_id*7+1) % n AS dst
    FROM documents, nd WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id AS src, (doc_id*13+5) % n AS dst
    FROM documents, nd WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id AS src, (doc_id*29+11) % n AS dst
    FROM documents, nd WHERE doc_id % 11 <> 0
),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
  )
),
dist AS (
  SELECT src, dst, 1 AS d FROM e
  UNION
  SELECT p.src, e.dst, p.d + 1 FROM dist p JOIN e ON p.dst = e.src
   WHERE p.d < {max_hops}
),
mind AS (SELECT src, dst, min(d) AS d FROM dist GROUP BY src, dst),
h AS (
  SELECT dst AS node,
         count(*) AS cnt,
         sum(CAST(1.0 AS DOUBLE) / d) AS harm
    FROM mind WHERE src <> dst GROUP BY dst
)
SELECT n.node AS doc_id,
       CAST(coalesce(h.cnt, 0) + 1 AS BIGINT) AS ball_size,
       round(coalesce(h.harm, CAST(0.0 AS DOUBLE)), 6) AS harmonic
  FROM nodes n LEFT JOIN h ON n.node = h.node
"""


def _opic_importance(spark, sf):
    """OPIC adaptive importance (operators/linkgraph.py opic_init/
    opic_step/opic_importance) over the same synthetic outlink graph as
    the other rank entries: 3 crawl waves fetching doc_id % 3 == wave,
    batch-synchronous cash distribution with virtual-root dangling; the
    oracle unrolls the identical per-wave recurrence."""
    from hk_housing_datahub_spark.operators.linkgraph import (
        opic_importance,
        opic_init,
        opic_step,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2])
    state = opic_init(docs.withColumnRenamed("doc_id", "node"))
    for wave in range(3):
        fetched = docs.filter(
            F.pmod("doc_id", F.lit(3)) == wave
        ).withColumnRenamed("doc_id", "node")
        state = opic_step(state, fetched, edges)
    return opic_importance(state).select(
        F.col("node").alias("doc_id"),
        F.round("importance", 6).alias("importance"),
    )


def _opic_importance_sql(waves: int = 3) -> str:
    """Unrolled OPIC twin of _opic_importance: same CTE graph as the
    hits/trustrank twins; each wave zeroes fetched cash, pushes
    sum(cash/deg) to outlink dsts, banks pre-wave cash into history,
    and spreads the dangling (no-outlink fetched, doc_id % 11 = 0)
    cash uniformly — float operation order mirrored from the Spark
    Columns ((zeroed + contrib) + dmass/n)."""
    z = "CAST(0.0 AS DOUBLE)"
    ctes = [
        "nd AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n"
        " FROM documents)",
        "raw AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id AS src, (doc_id*{a}+{b}) % n AS dst"
            " FROM documents, nd WHERE doc_id % 11 <> 0"
            for a, b in ((7, 1), (13, 5), (29, 11))
        )
        + ")",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw)",
        "deg AS MATERIALIZED"
        " (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "s0 AS (SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / n AS cash,"
        f" {z} AS history FROM documents, nd)",
    ]
    for i in range(waves):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node,"
            " sum(s.cash / deg.deg) AS contrib"
            f" FROM e JOIN s{i} s ON e.src = s.node"
            " JOIN deg ON deg.src = e.src"
            f" WHERE e.src % 3 = {i} GROUP BY e.dst)"
        )
        ctes.append(
            f"d{i} AS (SELECT coalesce(sum(s.cash), {z}) AS dmass"
            f" FROM s{i} s WHERE s.node % 3 = {i} AND s.node % 11 = 0)"
        )
        ctes.append(
            f"s{i + 1} AS MATERIALIZED (SELECT s.node,"
            f" (CASE WHEN s.node % 3 = {i} THEN {z} ELSE s.cash END"
            f" + coalesce(c.contrib, {z}))"
            " + d.dmass / CAST(nd.n AS DOUBLE) AS cash,"
            f" s.history + CASE WHEN s.node % 3 = {i} THEN s.cash"
            f" ELSE {z} END AS history"
            f" FROM s{i} s LEFT JOIN c{i} c ON s.node = c.node,"
            f" d{i} d, nd)"
        )
    ctes.append(
        f"th AS (SELECT coalesce(sum(history), {z}) AS t FROM s{waves})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s.node AS doc_id, round((s.history + s.cash)"
        f" / (th.t + CAST(1.0 AS DOUBLE)), 6) AS importance"
        f" FROM s{waves} s, th"
    )


def _dust_rule_mining(spark, sf):
    """DUST rule learning (operators/dust.py dust_rules): captures are
    built from documents with four planted families — ?sess=<id> is
    content-preserving DUST, ?page=2 changes the digest (rule must be
    rejected), mod-3 docs use directory URLs duplicated behind
    /index.html, mod-11 docs also appear behind https. The oracle
    states the expected per-host pair counts analytically from the same
    construction (memory: analytic oracles beat re-implementing the
    rewrite engine in SQL)."""
    from hk_housing_datahub_spark.operators.dust import dust_rules

    d = _t(spark, sf, "documents").select("doc_id")
    host = F.concat(
        F.lit("h"), F.pmod("doc_id", F.lit(7)), F.lit(".example.com")
    )
    dirdoc = F.pmod("doc_id", F.lit(3)) == 0
    base = F.concat(
        F.lit("http://"),
        host,
        F.lit("/d/"),
        F.col("doc_id"),
        F.when(dirdoc, F.lit("/")).otherwise(F.lit("")),
    )
    dig = F.md5(F.col("doc_id").cast("string"))
    caps = d.select(base.alias("url"), dig.alias("digest"))
    sess = d.filter(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.concat(base, F.lit("?sess="), F.col("doc_id")).alias("url"),
        dig.alias("digest"),
    )
    page = d.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        F.concat(base, F.lit("?page=2")).alias("url"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":p2"))).alias(
            "digest"
        ),
    )
    idxv = d.filter(dirdoc).select(
        F.concat(base, F.lit("index.html")).alias("url"),
        dig.alias("digest"),
    )
    https = d.filter(F.pmod("doc_id", F.lit(11)) == 0).select(
        F.regexp_replace(base, "^http://", "https://").alias("url"),
        dig.alias("digest"),
    )
    captures = caps.union(sess).union(page).union(idxv).union(https)
    return dust_rules(captures, min_support=2, min_precision=0.9)


def _dust_rule_mining_sql() -> str:
    """Analytic twin of _dust_rule_mining: each planted family's
    validatable pairs are exactly its member count per host (cross-fire
    audit in the entry docstring — $-anchored path rules skip query
    URLs, unobserved rewrite targets are ignored), so the rule table is
    four per-host sums."""
    return """
        WITH agg AS (
            SELECT 'h' || (doc_id % 7) || '.example.com' AS host,
                   sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS s,
                   sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS p,
                   sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS i,
                   sum(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS t
            FROM documents GROUP BY 1),
        rules AS (
            SELECT host, 'drop_param:sess' AS rule, s AS support,
                   0 AS violations FROM agg
            UNION ALL
            SELECT host, 'drop_param:page', 0, p FROM agg
            UNION ALL
            SELECT host, 'strip_index_html', i, 0 FROM agg
            UNION ALL
            SELECT host, 'https_to_http', t, 0 FROM agg)
        SELECT host, rule,
               CAST(support AS BIGINT) AS support,
               CAST(violations AS BIGINT) AS violations,
               round(CAST(support AS DOUBLE)
                     / (support + violations), 6) AS precision,
               (support >= 2 AND CAST(support AS DOUBLE)
                     / (support + violations) >= 0.9) AS valid
        FROM rules WHERE support + violations > 0
    """


def _soft404_flags(spark, sf):
    """Soft-404 detection (operators/soft404.py): captures built from
    documents — mod-9 docs all serve their host's one error body
    (shared digest), even-numbered hosts also answer the probe URL with
    it (probe ground truth), odd hosts rely on the
    vocabulary+dominance heuristic; doc 404's text 'body 404' plants
    the vocabulary-without-dominance decoy. The oracle restates each
    family's flags analytically (class size per host ≥ 5 at sf ≥
    0.001, +1 on probed hosts for the probe capture itself)."""
    from hk_housing_datahub_spark.operators.soft404 import (
        flag_soft404,
        probe_urls,
        soft404_signatures,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    host = F.concat(
        F.lit("h"), F.pmod("doc_id", F.lit(7)), F.lit(".example.com")
    )
    soft = F.pmod("doc_id", F.lit(9)) == 0
    err_body = F.lit("oops 404 page not found")
    caps = d.select(
        F.concat(F.lit("http://"), host, F.lit("/d/"), F.col("doc_id")).alias(
            "url"
        ),
        F.when(soft, F.md5(F.concat(F.lit("err:"), host)))
        .otherwise(F.md5(F.col("doc_id").cast("string")))
        .alias("digest"),
        F.when(soft, err_body)
        .otherwise(F.concat(F.lit("body "), F.col("doc_id")))
        .alias("text"),
    )
    hosts = d.select(host.alias("host")).distinct()
    probes = probe_urls(hosts)
    answering = probes.filter(
        F.regexp_extract("host", "^h([0-9]+)", 1).cast("int") % 2 == 0
    )
    probe_caps = answering.select(
        F.col("probe_url").alias("url"),
        F.md5(F.concat(F.lit("err:"), F.col("host"))).alias("digest"),
        err_body.alias("text"),
    )
    captures = caps.union(probe_caps)
    sigs = soft404_signatures(captures, probes)
    return flag_soft404(captures, sigs, min_dup_urls=5).select(
        "url",
        "host",
        "probe_match",
        "error_text",
        "dominant_dup",
        "is_soft404",
    )


def _soft404_flags_sql() -> str:
    """Analytic twin of _soft404_flags: per-host soft-class sizes are
    one GROUP BY; doc rows and the even-host probe rows are restated
    with their known flags (normal docs: unique digest → never
    dominant; error_text only when the id itself contains '404')."""
    return """
        WITH d AS (
            SELECT doc_id, doc_id % 7 AS hn,
                   'h' || (doc_id % 7) || '.example.com' AS host,
                   (doc_id % 9 = 0) AS soft
            FROM documents),
        cls AS (
            SELECT hn,
                   count(*) + CASE WHEN hn % 2 = 0 THEN 1 ELSE 0 END AS n
            FROM d WHERE soft GROUP BY hn),
        docrows AS (
            SELECT 'http://' || d.host || '/d/' || d.doc_id AS url,
                   d.host,
                   (d.soft AND d.hn % 2 = 0) AS probe_match,
                   (d.soft OR CAST(d.doc_id AS VARCHAR) LIKE '%404%')
                       AS error_text,
                   (d.soft AND c.n >= 5) AS dominant_dup
            FROM d LEFT JOIN cls c ON d.hn = c.hn),
        proberows AS (
            SELECT 'http://' || h.host || '/__s404_probe__/'
                       || md5(h.host || ':0') AS url,
                   h.host,
                   TRUE AS probe_match,
                   TRUE AS error_text,
                   (c.n >= 5) AS dominant_dup
            FROM (SELECT DISTINCT hn, host FROM d WHERE hn % 2 = 0) h
            LEFT JOIN cls c ON h.hn = c.hn),
        allrows AS (
            SELECT * FROM docrows UNION ALL SELECT * FROM proberows)
        SELECT url, host, probe_match, error_text, dominant_dup,
               (probe_match OR (error_text AND dominant_dup))
                   AS is_soft404
        FROM allrows
    """


def _canonical_url_per_digest(spark, sf):
    """Representative-URL choice (operators/mirrors.py canonical_urls):
    each doc's content appears behind three addresses — clean, a
    tracking-param variant, a longer mirror-host copy; the shortest
    clean one must win per digest. Oracle replays the (length, params,
    url) preference as a window."""
    from hk_housing_datahub_spark.operators.mirrors import canonical_urls

    d = _t(spark, sf, "documents").select("doc_id")
    base = F.concat(
        F.lit("https://h"),
        F.pmod("doc_id", F.lit(10)).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    digest = F.md5(F.col("doc_id").cast("string"))
    caps = (
        d.select(base.alias("url_canon"), digest.alias("digest"))
        .unionAll(
            d.select(
                F.concat(base, F.lit("?utm=1")).alias("url_canon"),
                digest.alias("digest"),
            )
        )
        .unionAll(
            d.select(
                F.concat(
                    F.lit("https://mirror"),
                    F.pmod("doc_id", F.lit(10)).cast("string"),
                    F.lit(".example.net/page/"),
                    F.col("doc_id").cast("string"),
                ).alias("url_canon"),
                digest.alias("digest"),
            )
        )
    )
    return canonical_urls(caps)


_BM25_QUERIES = [
    ("q1", "spark window join"),
    ("q2", "customer order batch"),
    ("q3", "slow table scan merge"),
]


def _bm25_search(spark, sf):
    """Lexical retrieval (operators/bm25.py): inverted postings + Okapi
    BM25 top-5 per query over documents.text — the keyword half of the
    reference's retrieval surface (its ChromaDB search_similar,
    /root/reference/src/processors/rag/embedding.py:290-307, is the
    embedding half, re-expressed as the search_similar entry). Scores
    are bit-stable across engines: integer tf/df/dl/N, exact-int-sum
    avgdl, one shared per-term expression tree, and a sorted-term left
    fold (F.aggregate here, list_reduce in DuckDB)."""
    from hk_housing_datahub_spark.operators.bm25 import bm25_search

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    qs = spark.createDataFrame(_BM25_QUERIES, "qid string, qtext string")
    return bm25_search(docs, qs, k=5)


_PHRASE = "table table"  # repeated term exercises multi-offset votes


def _phrase_search(spark, sf):
    """Exact phrase matching over the positional inverted index
    (operators/bm25.py phrase_search, Lucene's proximity algorithm
    relationally): the i-th phrase term at position p votes for anchor
    p-i; anchors collecting all distinct offsets are hits. The DuckDB
    twin replays the identical votes/anchor algebra from the same
    tokenization."""
    from hk_housing_datahub_spark.operators.bm25 import phrase_search

    return phrase_search(
        _t(spark, sf, "documents").select("doc_id", "text"), _PHRASE
    )


def _semdedup_drop(spark, sf):
    """SemDeDup (operators/semdedup.py, Abbas et al. 2023): distributed
    full-corpus Lloyd's (k=8, 2 iterations, md5-order seeds) over the
    embeddings table, then the paper's keep-the-least-typical rule at
    cosine tau=0.3 inside each cluster. The DuckDB twin unrolls the
    identical iterations as CTEs; dot products fold sequentially in
    array order in both engines, and assignment margins on this corpus
    are >=4e-4 — nine orders above cross-engine FP noise (pinned in
    tests/test_semdedup.py)."""
    from hk_housing_datahub_spark.operators.semdedup import semdedup

    emb = _t(spark, sf, "embeddings")
    return semdedup(emb, k=8, iters=2, tau=0.3)


def _c4_clean_pages(spark, sf):
    """C4 cleaning rules (operators/c4filter.py, Raffel et al. 2020
    §2.2) over a deterministically planted page view of documents: each
    doc's words regroup into 8-word lines whose terminal decoration
    (period / bang / question / none / ' javascript.' / ' {.') is the
    first md5 hex of (doc_id, line-index), plus a ~1/256 lorem-ipsum
    page marker — so every rule has planted positives. Map-only codegen
    end to end; the twin replays the identical construction."""
    from hk_housing_datahub_spark.operators.c4filter import c4_page_flags

    docs = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    n_lines = F.greatest(
        F.lit(1), F.ceil(F.size(toks) / F.lit(8.0))
    ).cast("int")

    def line(i):
        body = F.array_join(F.slice(toks, i * 8 + 1, 8), " ")
        h1 = F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                )
            ),
            1,
            1,
        )
        return (
            F.when(h1.isin(*"01234567"), F.concat(body, F.lit(".")))
            .when(h1.isin("8", "9"), F.concat(body, F.lit("!")))
            .when(h1.isin("a", "b"), F.concat(body, F.lit("?")))
            .when(h1.isin("c", "d"), body)
            .when(h1 == "e", F.concat(body, F.lit(" javascript.")))
            .otherwise(F.concat(body, F.lit(" {.")))
        )

    page = F.array_join(F.transform(F.sequence(F.lit(0), n_lines - 1), line), "\n")
    page = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) == "ab",
        F.concat(page, F.lit("\nlorem ipsum dolor sit amet.")),
    ).otherwise(page)
    pages = docs.select("doc_id", "lang", page.alias("text"))
    return c4_page_flags(pages, badwords=("dup",)).select(
        "doc_id",
        "lang",
        "n_sentences",
        "has_badword",
        "has_lorem",
        "has_brace",
        "kept",
        "cleaned_text",
    )


def _domain_budget_schedule(spark, sf):
    """Two-tier politeness (frontier/scheduler.py schedule_wave +
    apply_domain_budget): a co.uk registrant's 20-subdomain farm wins
    20 host budgets (3 urls each at wave_ms=300/delay 100) but the
    registrable-domain tier keeps only the domain's 8 globally-best
    rows; the oracle replays both windows with the analytic domain."""
    from hk_housing_datahub_spark.frontier.scheduler import (
        apply_domain_budget,
        schedule_wave,
    )

    o = _t(spark, sf, "orders")
    frontier = o.select(
        F.concat(
            F.lit("https://s"),
            F.pmod("o_custkey", F.lit(20)),
            F.lit(".farm"),
            F.pmod("o_custkey", F.lit(3)),
            F.lit(".co.uk/o/"),
            F.col("o_orderkey"),
        ).alias("url_canon"),
        F.concat(
            F.lit("s"), F.pmod("o_custkey", F.lit(20)),
            F.lit(".farm"), F.pmod("o_custkey", F.lit(3)),
            F.lit(".co.uk"),
        ).alias("host"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority"),
        F.col("o_orderdate").alias("discovered_ts"),
    )
    out = apply_domain_budget(
        schedule_wave(frontier, None, 300), max_per_domain=8
    )
    return out.filter(F.col("scheduled")).select(
        "url_canon", "host", "host_rank"
    )


def _warc_revisits(spark, sf):
    """WARC revisit-record classification (sources/warc.py
    classify_revisits) over the multi-capture construction shared with
    cdx_latest: payload digests repeat in adjacent capture pairs, so
    each url's second capture of an unchanged payload must become a
    ``revisit`` referring to the FIRST capture of that digest. The
    oracle replays the same (url, digest)-window ranking in SQL."""
    from hk_housing_datahub_spark.sources.warc import classify_revisits

    d = _t(spark, sf, "documents")
    caps = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.pmod("doc_id", F.lit(4)))
        ).alias("j"),
    ).select(
        F.concat(
            F.lit("https://h"),
            F.pmod("doc_id", F.lit(10)).cast("string"),
            F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.col("doc_id") * 13
            + F.col("j") * (F.lit(86_400) + F.pmod("doc_id", F.lit(7)) * 3_600)
        ).alias("warc_ts"),
        F.encode(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.floor(
                    (F.col("j") + F.pmod("doc_id", F.lit(3))) / 2
                ).cast("string"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    out = classify_revisits(caps)
    return out.select(
        F.col("url").alias("url_canon"),
        F.unix_timestamp("ts").alias("epoch"),
        "digest",
        "record_type",
        F.unix_timestamp("refers_to_ts").alias("refers_epoch"),
    )


def _registrable_domains(spark, sf):
    """eTLD+1 folding (functions/surt.py registrable_domain) over six
    constructed host shapes: deep ccTLD subdomains (co.uk / com.au —
    last THREE labels), gTLD subdomains (last two), a bare public
    suffix, a single-label host (both pass through), mixed case and a
    port. The oracle states the expected domain analytically per case —
    the Spark side must parse/fold correctly to match."""
    from hk_housing_datahub_spark.functions.surt import registrable_domain

    d = _t(spark, sf, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(6))
    url = (
        F.when(
            m == 0,
            F.concat(
                F.lit("https://a.b.shop"),
                F.pmod("doc_id", F.lit(7)).cast("string"),
                F.lit(".co.uk/p/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://www.site"),
                F.pmod("doc_id", F.lit(5)).cast("string"),
                F.lit(".com.au/"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://deep.sub.host"),
                F.pmod("doc_id", F.lit(9)).cast("string"),
                F.lit(".example.com/x"),
            ),
        )
        .when(m == 3, F.lit("https://co.uk/"))
        .when(m == 4, F.lit("https://localhost/"))
        .otherwise(
            F.concat(
                F.lit("https://News.Site"),
                F.pmod("doc_id", F.lit(4)).cast("string"),
                F.lit(".COM:8080/p"),
            )
        )
    )
    return d.select(
        "doc_id", registrable_domain(url).alias("domain")
    )


def _cdx_surt_keys(spark, sf):
    """SURT keys (functions/surt.py, the Common Crawl CDX sort key) over
    messy constructed URLs: mixed-case scheme/host/path, default port,
    fragments, unsorted query params, www and nested-subdomain variants.
    The oracle constructs the expected strings analytically (same pattern
    as url_canonicalize's twin)."""
    from hk_housing_datahub_spark.functions.surt import surt_key

    d = _t(spark, sf, "documents")
    messy = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("WWW.")).otherwise(
                F.lit("")
            ),
            F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("Sub.")).otherwise(
                F.lit("")
            ),
            F.lit("Host"),
            F.pmod("doc_id", F.lit(20)),
            F.lit(".Example.COM:443/Path/"),
            F.col("doc_id"),
            F.when(F.pmod("doc_id", F.lit(3)) == 0, F.lit("?b=2&a=1"))
            .when(F.pmod("doc_id", F.lit(3)) == 1, F.lit("?a=1"))
            .otherwise(F.lit("")),
            F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("#frag")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )
    return messy.select(
        "doc_id",
        surt_key(F.col("url")).alias("surt"),
        U.canonicalize_url(F.col("url")).alias("url_canon"),
    )


def _recrawl_schedule(spark, sf):
    """Cho/Garcia-Molina recrawl scheduling (operators/recrawl.py) over a
    constructed capture history: each doc gets 1–4 captures at a
    doc-specific uniform interval, digests flip every second capture
    (offset by doc) — so the change-rate estimator sees every (n, X)
    combination including single-capture and never-changed URLs."""
    from hk_housing_datahub_spark.operators.recrawl import recrawl_schedule

    d = _t(spark, sf, "documents")
    caps = d.select(
        "doc_id", F.explode(
            F.sequence(F.lit(0), F.pmod("doc_id", F.lit(4)))
        ).alias("j"),
    ).select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.col("doc_id") * 13
            + F.col("j") * (F.lit(86_400) + F.pmod("doc_id", F.lit(7)) * 3_600)
        ).alias("warc_ts"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.floor(
                    (F.col("j") + F.pmod("doc_id", F.lit(3))) / 2
                ).cast("string"),
            )
        ).alias("digest"),
    )
    out = recrawl_schedule(caps)
    return out.select(
        "url", "n_captures", "n_changes",
        F.round("avg_interval_s", 6).alias("avg_interval_s"),
        F.round("lambda_per_day", 6).alias("lambda_per_day"),
        F.round("refetch_interval_s", 6).alias("refetch_interval_s"),
        "next_fetch_epoch",
    )


def _cdx_snapshot_diff(spark, sf):
    """Crawl-to-crawl diff classification (sources/cdx.py
    cdx_snapshot_diff) over a constructed capture history with a
    per-doc epoch shift so every class appears: docs whose first capture
    lands after t0 are ``new``, single-capture docs before t0 are
    ``stale``, and the digest flip pattern splits the recrawled rest
    into ``changed`` vs ``refreshed``."""
    from hk_housing_datahub_spark.sources.cdx import cdx_snapshot_diff

    d = _t(spark, sf, "documents")
    caps = d.select(
        "doc_id", F.explode(
            F.sequence(F.lit(0), F.pmod("doc_id", F.lit(4)))
        ).alias("j"),
    ).select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod("doc_id", F.lit(5)) * 40_000
            + F.col("doc_id") * 13
            + F.col("j") * (F.lit(86_400) + F.pmod("doc_id", F.lit(7)) * 3_600)
        ).alias("warc_ts"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.floor(
                    (F.col("j") + F.pmod("doc_id", F.lit(3))) / 2
                ).cast("string"),
            )
        ).alias("digest"),
    )
    return cdx_snapshot_diff(caps, 1_700_100_000, 1_700_400_000)


def _host_edges(spark, sf):
    """Deterministic page-level URL edges for the host-graph queries:
    every doc links out 3× — two external hosts (one modulus 12 so two
    hosts exist only as targets: in-degree-only nodes) and one internal
    self-host link; docs % 6 == 0 duplicate their first outlink (link
    multiplicity ≠ distinct pages); docs % 4 == 0 carry a ``www.``
    prefix the SURT fold must erase."""
    d = _t(spark, sf, "documents").select("doc_id")
    src = F.concat(
        F.lit("https://"),
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit("www.")).otherwise(
            F.lit("")
        ),
        F.lit("h"), F.pmod("doc_id", F.lit(10)),
        F.lit(".example.com/p/"), F.col("doc_id"),
    )

    def dst(host_expr):
        return F.concat(
            F.lit("https://h"), host_expr,
            F.lit(".example.com/p/"), F.pmod(F.col("doc_id") * 31, F.lit(997)),
        )

    e1 = d.select(
        src.alias("src_url"),
        dst(F.pmod(F.col("doc_id") * 7 + 1, F.lit(10))).alias("dst_url"),
    )
    e1dup = e1.join(
        d.filter(F.pmod("doc_id", F.lit(6)) == 0).select(
            src.alias("src_url")
        ),
        "src_url",
    )
    e2 = d.select(
        src.alias("src_url"),
        dst(F.pmod(F.col("doc_id") * 13 + 5, F.lit(12))).alias("dst_url"),
    )
    e3 = d.select(
        src.alias("src_url"),
        dst(F.pmod("doc_id", F.lit(10))).alias("dst_url"),
    )
    return e1.union(e1dup).union(e2).union(e3)


def _host_graph_rollup(spark, sf):
    """Host-level webgraph rollup (operators/linkgraph.py host_graph):
    page edges collapse to SURT-host pairs with link multiplicity,
    distinct linking pages, and the internal/external flag."""
    from hk_housing_datahub_spark.operators.linkgraph import host_graph

    return host_graph(_host_edges(spark, sf))


def _host_graph_degrees(spark, sf):
    """Per-host degree table (operators/linkgraph.py host_degrees) over
    the same rollup — external in/out degree and volume, internal
    volume; in-degree-only hosts (modulus-12 targets) appear with
    out_degree 0."""
    from hk_housing_datahub_spark.operators.linkgraph import (
        host_degrees,
        host_graph,
    )

    return host_degrees(host_graph(_host_edges(spark, sf)))


def _dsir_weights(spark, sf):
    """DSIR importance sampling (operators/importance.py): fit hashed
    unigram+bigram log-likelihood ratios with the English docs as the
    target corpus and the whole table as raw, score every doc, and
    Gumbel-top-k select 100 under seed 7 — all Columns, the DuckDB twin
    replays the identical hash/smoothing/Gumbel arithmetic."""
    from hk_housing_datahub_spark.operators.importance import (
        dsir_select,
        fit_logratio,
        gumbel_key,
        hashed_ngram_features,
        importance_weights,
    )

    docs = _t(spark, sf, "documents")
    # the raw features feed BOTH the model fit and the scoring pass —
    # persist so tokenization+hashing runs once (same as the funnel)
    raw_feats = hashed_ngram_features(docs, dim=4096).persist()
    tgt_feats = hashed_ngram_features(
        docs.filter(F.col("lang") == "en"), dim=4096
    )
    lr = fit_logratio(tgt_feats, raw_feats, dim=4096)
    w = importance_weights(raw_feats, lr)
    picked = dsir_select(
        docs.select("doc_id"), w, k=100, seed=7
    ).select("doc_id", F.lit(True).alias("selected"))
    return (
        w.select(F.col("id").alias("doc_id"), "weight")
        .join(picked, "doc_id", "left")
        .select(
            "doc_id",
            F.round("weight", 6).alias("weight"),
            F.coalesce("selected", F.lit(False)).alias("selected"),
        )
    )


def _host_trap_signals(spark, sf):
    """Crawl-trap detection (operators/traps.py) over a constructed URL
    space: hosts 0–5 are healthy (shallow distinct pages), host 6 is a
    cyclic-path trap (/x/y/x/y/…), host 7 a session-id trap (one page
    behind ?sid= variants with constant content digest). The oracle
    computes every per-host signal analytically from the same moduli."""
    from hk_housing_datahub_spark.operators.traps import (
        flag_trap_hosts,
        host_trap_signals,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    h = F.pmod("doc_id", F.lit(8))
    reps = (F.pmod("doc_id", F.lit(4)) + 1).cast("int")
    path = (
        F.when(
            h == 6,
            F.concat(
                F.lit("/"),
                F.array_join(
                    F.flatten(
                        F.array_repeat(
                            F.array(F.lit("x"), F.lit("y")), reps
                        )
                    ),
                    "/",
                ),
            ),
        )
        .when(h == 7, F.lit("/page"))
        .otherwise(F.concat(F.lit("/p/"), F.col("doc_id")))
    )
    query = (
        F.when(h == 7, F.concat(F.lit("?sid="), F.col("doc_id")))
        .when(
            (h < 6) & (F.pmod("doc_id", F.lit(3)) == 0),
            F.lit("?a=1&b=2"),
        )
        .otherwise(F.lit(""))
    )
    urls = d.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example.com"), path, query
        ).alias("url"),
        F.when(h == 7, F.lit("constant"))
        .otherwise(F.md5(F.col("doc_id").cast("string")))
        .alias("digest"),
    )
    out = flag_trap_hosts(host_trap_signals(urls, digest_col="digest"))
    return out.select(
        "host",
        "n_urls",
        F.round("avg_depth", 6).alias("avg_depth"),
        "max_depth",
        F.round("repeat_seg_share", 6).alias("repeat_seg_share"),
        F.round("avg_params", 6).alias("avg_params"),
        "max_params",
        "n_contents",
        F.round("urls_per_content", 6).alias("urls_per_content"),
        F.array_join("trap_reasons", ",").alias("trap_reasons"),
        "is_trap_suspect",
    )


def _per_source_cap(spark, sf):
    """Per-domain dominance cap (operators/sampling.py cap_per_group —
    the RefinedWeb/C4 rule): keep the 12 docs per source with the
    smallest salted-md5 order key. Deterministic, so the DuckDB twin is
    the identical window."""
    from hk_housing_datahub_spark.operators.sampling import cap_per_group

    d = _t(spark, sf, "documents").select("doc_id", "source")
    return cap_per_group(d, ["source"], ["doc_id"], 12, salt="capv1")


def _warc_cdx_locations(spark, sf):
    """WARC segment pointer table (sources/warc.py warc_locations): each
    doc becomes a response record; records are split into 4 segments
    (portable doc_id split so the oracle can mirror it), SURT-ordered
    within a segment, with byte offsets from the running record-length
    sum. The oracle recomputes every record length from the header
    grammar (static field widths + url + digits(payload_len)) — the
    date field is tz-dependent text but constant 20-byte width."""
    from hk_housing_datahub_spark.sources.warc import warc_locations

    d = _t(spark, sf, "documents")
    pages = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/p/"), F.col("doc_id"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.pmod("doc_id", F.lit(4)).alias("seg"),
    )
    return warc_locations(pages, segment_col="seg")


def _warc_write_manifest(spark, sf):
    """Executor-side WARC segment writer (sources/archive_writer.py
    write_segments): renders every segment's file INSIDE its task (one
    hash exchange on segment + in-task sort, byte-identical to the
    driver-side render — pinned in tests/test_archive_writer.py) and
    returns the write manifest. The oracle recomputes per-segment
    record counts and byte totals from the same header grammar the
    cdxj oracle uses — the manifest's n_bytes IS the sum of record
    lengths, so index and files agree by construction."""
    import tempfile

    from hk_housing_datahub_spark.sources.archive_writer import (
        write_segments,
    )

    d = _t(spark, sf, "documents")
    pages = d.select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/p/"), F.col("doc_id"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id")
        ).alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.pmod("doc_id", F.lit(4)).alias("seg"),
    )
    out_dir = tempfile.mkdtemp(prefix="warc_manifest_")
    return write_segments(pages, out_dir, segment_col="seg").select(
        "segment", "n_records", "n_bytes"
    )


def _redirect_resolve(spark, sf):
    """Redirect-chain resolution (operators/redirects.py): chains of
    length doc_id%10 down to multiple-of-ten terminals, plus 2-cycles
    on doc_id%50==7 — pointer doubling resolves terminals + hop counts
    and flags cycle members; the oracle is a recursive CTE with a
    visited guard."""
    from hk_housing_datahub_spark.operators.redirects import (
        resolve_redirects,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    chains = d.filter(F.pmod("doc_id", F.lit(10)) != 0).select(
        F.concat(F.lit("u"), F.col("doc_id")).alias("src_url"),
        F.concat(F.lit("u"), F.col("doc_id") - 1).alias("dst_url"),
    )
    loops = d.filter(F.pmod("doc_id", F.lit(50)) == 7)
    cyc = loops.select(
        F.concat(F.lit("cA"), F.col("doc_id")).alias("src_url"),
        F.concat(F.lit("cB"), F.col("doc_id")).alias("dst_url"),
    ).union(
        loops.select(
            F.concat(F.lit("cB"), F.col("doc_id")).alias("src_url"),
            F.concat(F.lit("cA"), F.col("doc_id")).alias("dst_url"),
        )
    )
    return resolve_redirects(chains.union(cyc))


def _content_type_sniff(spark, sf):
    """Magic-number MIME sniffing (multimodal/binary.py
    sniff_content_type): each doc's payload gets one of 8 constructed
    leading-byte signatures (incl. the RIFF container disambiguation and
    an html text fallback); the oracle knows the expected MIME from the
    same modulus."""
    from hk_housing_datahub_spark.multimodal.binary import (
        sniff_content_type,
    )

    d = _t(spark, sf, "documents")
    m = F.pmod("doc_id", F.lit(8))
    magic = (
        F.when(m == 0, F.unhex(F.lit("255044462d")))
        .when(m == 1, F.unhex(F.lit("89504e470d0a1a0a")))
        .when(m == 2, F.unhex(F.lit("ffd8ffe0")))
        .when(m == 3, F.unhex(F.lit("524946460000000057454250")))
        .when(m == 4, F.unhex(F.lit("1f8b08")))
        .when(m == 5, F.unhex(F.lit("504b0304")))
        .when(m == 6, F.encode(F.lit("<html ".upper()), "UTF-8"))
        .otherwise(F.encode(F.lit("plain "), "UTF-8"))
    )
    payload = F.concat(magic, F.encode("text", "UTF-8"))
    return d.select(
        "doc_id", sniff_content_type(payload).alias("mime")
    )


def _cdx_latest(spark, sf):
    """Collapsed "latest capture" index view (sources/cdx.py cdx_latest)
    over the same multi-capture construction as recrawl_schedule — one
    row per URL, max-(ts, row) selected inside the partial aggregate."""
    from hk_housing_datahub_spark.sources.cdx import cdx_latest

    d = _t(spark, sf, "documents")
    caps = d.select(
        "doc_id", F.explode(
            F.sequence(F.lit(0), F.pmod("doc_id", F.lit(4)))
        ).alias("j"),
    ).select(
        F.concat(
            F.lit("https://h"), F.pmod("doc_id", F.lit(10)),
            F.lit(".example.com/d/"), F.col("doc_id"),
        ).alias("url_canon"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.col("doc_id") * 13
            + F.col("j") * (F.lit(86_400) + F.pmod("doc_id", F.lit(7)) * 3_600)
        ).alias("warc_ts"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.floor(
                    (F.col("j") + F.pmod("doc_id", F.lit(3))) / 2
                ).cast("string"),
            )
        ).alias("digest"),
    )
    out = cdx_latest(caps)
    return out.select(
        "url_canon",
        F.unix_timestamp("warc_ts").alias("epoch"),
        "digest",
    )


def _anchor_text_rollup(spark, sf):
    """Anchor-text table (functions/anchors.py): synthesized link-bearing
    pages from documents — each doc links its primary target with a
    'Site N' label (doubled on doc_id%5==0: same source, same text —
    n_links counts both, n_sources counts one), a secondary target with
    a whitespace-messy label, and a hollow anchor on doc_id%7==0 (the
    empty string is a real anchor value). Extraction is shuffle-free
    codegen regex; the rollup is one (target, text) aggregate."""
    from hk_housing_datahub_spark.functions.anchors import (
        anchor_text_rollup,
        extract_anchors,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    t1 = F.concat(
        F.lit("https://t"),
        F.pmod(F.col("doc_id") * 31, F.lit(97)).cast("string"),
        F.lit(".org/page"),
    )
    t2 = F.concat(
        F.lit("https://t"),
        F.pmod(F.col("doc_id") * 17, F.lit(97)).cast("string"),
        F.lit(".org/page"),
    )
    a1 = F.concat(
        F.lit('<a href="'), t1, F.lit('">Site  '),
        F.pmod("doc_id", F.lit(13)).cast("string"), F.lit("</a>"),
    )
    a2 = F.concat(
        F.lit('<a href="'), t2, F.lit('" class="c">  read '),
        F.pmod("doc_id", F.lit(4)).cast("string"), F.lit("  more </a>"),
    )
    pages = d.select(
        F.concat(
            F.lit("https://s"),
            F.pmod("doc_id", F.lit(50)).cast("string"),
            F.lit(".example.org/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url_canon"),
        F.concat(
            F.lit("<p>x</p>"),
            a1,
            a2,
            F.when(F.pmod("doc_id", F.lit(5)) == 0, a1).otherwise(F.lit("")),
            F.when(
                F.pmod("doc_id", F.lit(7)) == 0,
                F.concat(F.lit('<a href="'), t1, F.lit('"></a>')),
            ).otherwise(F.lit("")),
        ).alias("html"),
    )
    return anchor_text_rollup(extract_anchors(pages)).select(
        "target", "anchor_text", "n_links", "n_sources"
    )


def _mirror_hosts(spark, sf):
    """Mirror-host detection (operators/mirrors.py): 8 synthetic hosts
    from documents — m1 republishes 90% of m0's pages (the mirror), the
    rest are disjoint, and every host carries the same boilerplate
    digest, which the DF-cap must strip before any pair evidence is
    counted (uncapped it would fabricate all 28 pairs)."""
    from hk_housing_datahub_spark.operators.mirrors import mirror_host_pairs

    d = _t(spark, sf, "documents").select("doc_id")
    h = F.pmod("doc_id", F.lit(8))
    base = F.expr("doc_id div 8").cast("string")
    key = (
        F.when(h == 0, F.concat(F.lit("d0-"), base))
        .when(
            h == 1,
            F.when(
                F.pmod(F.expr("doc_id div 8"), F.lit(10)) < 9,
                F.concat(F.lit("d0-"), base),
            ).otherwise(F.concat(F.lit("d1-"), base)),
        )
        .otherwise(
            F.concat(F.lit("d"), h.cast("string"), F.lit("-"), base)
        )
    )
    host = F.concat(F.lit("m"), h.cast("string"), F.lit(".example.org"))
    caps = d.select(host.alias("host"), F.md5(key).alias("digest")).unionAll(
        d.select(host.alias("host"), F.md5(F.lit("boiler")).alias("digest"))
    )
    return mirror_host_pairs(
        caps, min_shared=3, min_containment=0.5, max_digest_df=4
    ).select(
        "host_a", "host_b", "shared", "size_a", "size_b",
        "containment", "jaccard",
    )


def _quality_classifier_gate(spark, sf):
    """Rows-only: discriminative quality gate (operators/quality_clf.py)
    — fit hashed-n-gram logistic regression by distributed full-batch
    GD (English docs as the curated positives vs a disjoint raw slice,
    DSIR's framing discriminatively), score every doc, keep ≥ 0.5. The
    iterative fit is not hash-replayable in DuckDB — measured (round
    5): JVM exp() and DuckDB exp() disagree in the last ulp on ~10% of
    inputs, and Spark's double→decimal(38,18) cast quantizes through
    the double's SHORTEST string repr while DuckDB expands the full
    binary value, so even the order-independent decimal gradient sums
    diverge; 40 iterations compound both. Strong check instead:
    tests/test_quality_clf.py's 1e-9 numpy-replay parity plus the
    planted-separation and determinism pins."""
    from hk_housing_datahub_spark.operators.importance import (
        hashed_ngram_features,
    )
    from hk_housing_datahub_spark.operators.quality_clf import (
        fit_quality_classifier,
        quality_gate,
        score_quality,
    )

    base = _t(spark, sf, "documents")
    # the sf documents share one vocabulary across langs (statistically
    # identical text), so the entry plants its classes the way every
    # other synthetic-input query does: even doc_ids lean on a curated
    # vocabulary, odd ones on junk — the fitted gate must recover the
    # parity. The fit sees a BOUNDED labeled hash-slice (the production
    # shape: fit cost = iterations x 2 compact shuffles over the
    # sample); scoring covers the whole corpus.
    is_pos = F.pmod("doc_id", F.lit(2)) == 0
    docs = base.select(
        "doc_id",
        "lang",
        F.concat(
            "text",
            F.when(
                is_pos,
                F.lit(" study theorem proof lemma chapter" * 4),
            ).otherwise(F.lit(" click spam win prize casino" * 4)),
        ).alias("text"),
    )
    sample = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            *"01234567"
        )
    )
    pos = sample.filter(is_pos)
    neg = sample.filter(~is_pos).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    model = fit_quality_classifier(
        hashed_ngram_features(pos, dim=1024),
        hashed_ngram_features(neg, dim=1024),
        iterations=6,
    )
    scores = score_quality(
        hashed_ngram_features(docs, dim=1024), model
    )
    return quality_gate(docs, scores, 0.5).select("doc_id", "lang")


def _unigram_lm_vocab(spark, sf):
    """Rows-only: unigram-LM (SentencePiece) tokenizer training
    (operators/unigram_lm.py) — EM over word-segmentation lattices with
    a distributed Arrow-batched E-step and exact-decimal count sums
    (bit-deterministic under any partitioning). Not SQL-expressible
    (iterative forward–backward); the strong checks are
    tests/test_unigram_lm.py: lattice kernels vs brute enumeration,
    the full fit vs an independent sequential reference, and bitwise
    partition invariance."""
    from hk_housing_datahub_spark.operators.unigram_lm import (
        learn_unigram_lm,
    )

    d = _t(spark, sf, "documents")
    model = learn_unigram_lm(d, vocab_size=64, max_piece_len=4)
    return spark.createDataFrame(
        [(p, round(lp, 6)) for p, lp in model], ["piece", "logp"]
    )


def _unigram_encode_pieces(spark, sf):
    """Viterbi encoding of the corpus under a FIXED literal vocabulary
    (operators/unigram_lm.py encode_unigram): max total log-probability,
    ties → fewer pieces → lexicographically greatest piece at the
    earliest divergence, single-char OOV fallback at min(logp)-20 (the
    digits are deliberately absent from the vocab so the fallback path
    is exercised on real corpus words). The DuckDB twin replays the DP
    position-by-position (unrolled stages, identical float adds and
    tie-break ordering — _unigram_encode_sql), so per-doc piece counts
    and the \\x1f-joined stream md5 hash-match. The EM-fitted model
    remains covered by unigram_lm_vocab/unigram_fertility (rows-only;
    learn loop pinned by the brute-enumeration and partition-invariance
    suites in tests/test_unigram_lm.py)."""
    from hk_housing_datahub_spark.operators.unigram_lm import (
        encode_unigram,
    )

    d = _t(spark, sf, "documents")
    out = encode_unigram(
        d, sorted(_UNI_VOCAB.items()), max_piece_len=4
    )
    return out.select(
        "doc_id",
        F.size("pieces").cast("long").alias("n_pieces"),
        F.md5(F.concat_ws("\x1f", "pieces")).alias("pieces_md5"),
    )



def _unigram_fertility_fixed(spark, sf):
    """Per-language fertility of the FIXED-vocab Viterbi tokenizer
    (pieces per character) — the hash-checked sibling of
    unigram_fertility (which audits the EM-trained model, rows-only by
    nature of the data-dependent prune loop): same encoder, same
    rollup, a vocabulary the DuckDB twin can replay. Shares the
    unrolled-DP oracle machinery with unigram_encode_pieces."""
    from hk_housing_datahub_spark.operators.unigram_lm import (
        encode_unigram,
    )

    d = _t(spark, sf, "documents")
    enc = encode_unigram(d, sorted(_UNI_VOCAB.items()), max_piece_len=4)
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("pieces")).cast("long").alias("total_pieces"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.round(
            F.sum(F.size("pieces")) / F.sum(F.length("text")), 6
        ).alias("pieces_per_char"),
    )


def _unigram_fertility(spark, sf):
    """Rows-only: per-language fertility of the trained unigram-LM
    tokenizer (pieces per character over the Viterbi encoding) —
    the vocabulary-coverage audit bpe_fertility provides for the merge
    family, for the EM family. Encoder optimality is pinned by the
    hypothesis sweep in tests/test_unigram_lm.py."""
    from hk_housing_datahub_spark.operators.unigram_lm import (
        encode_unigram,
        learn_unigram_lm,
    )

    d = _t(spark, sf, "documents")
    model = learn_unigram_lm(d, vocab_size=64, max_piece_len=4)
    enc = encode_unigram(d, model, max_piece_len=4)
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("pieces")).alias("total_pieces"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(
            F.sum(F.size("pieces")) / F.sum(F.length("text")), 6
        ).alias("pieces_per_char"),
    )


def _cdc_payload_dedup(spark, sf):
    """Content-defined chunking over binary payloads (multimodal/cdc.py,
    FastCDC-style gear hash): every fifth document gets a byte-shifted
    twin of its payload (4 bytes prepended), and the chunk-level audit
    shows the shifted copies deduplicating — fixed-offset chunking
    would share nothing. The DuckDB twin (_cdc_sql) replays the gear
    boundary test as an 8-byte lag window (mask = 255 sees only the low
    8 hash bits) plus a per-chunk recursive boundary walk — the stats
    hash-match. Kernel coverage/shift properties and Spark≡sequential
    parity are additionally pinned in tests/test_cdc.py."""
    from hk_housing_datahub_spark.multimodal.cdc import (
        cdc_chunk_table,
        cdc_dedup_stats,
    )

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.encode(F.repeat(F.col("text"), 3), "utf-8").alias("payload"),
    )
    spoof = d.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.encode(F.lit("PAD!"), "utf-8"), F.col("payload")).alias(
            "payload"
        ),
    )
    tbl = cdc_chunk_table(
        d.unionByName(spoof), min_size=64, avg_size=256, max_size=1024
    )
    return cdc_dedup_stats(tbl)


def _crawl_sketch_stats(spark, sf):
    """Rows-only: mergeable crawl statistics (operators/sketches.py) —
    two synthetic capture waves sketched per host (HLL distinct urls,
    KLL byte-size quantiles), merged O(delta), reported. Merge ≡
    single-pass equality, error bounds, and the single-exchange plan are
    pinned by tests/test_sketches.py (DataSketches estimates are not
    SQL-expressible in DuckDB, hence no hash oracle)."""
    from hk_housing_datahub_spark.operators.sketches import (
        merge_sketch_stats,
        sketch_report,
        sketch_stats,
    )

    d = _t(spark, sf, "documents").select("doc_id")

    def wave(mult: int, shift: int):
        return d.select(
            F.concat(
                F.lit("h"), F.pmod("doc_id", F.lit(8)).cast("string")
            ).alias("host"),
            F.concat(
                F.lit("https://h"),
                F.pmod("doc_id", F.lit(8)).cast("string"),
                F.lit(".example.com/p/"),
                F.pmod(F.col("doc_id") * mult + shift, F.lit(997)).cast(
                    "string"
                ),
            ).alias("url_canon"),
            (F.pmod(F.col("doc_id") * 7919 + shift, F.lit(200_000)) + 1).alias(
                "nbytes"
            ),
        )

    def stats(w):
        return sketch_stats(
            w,
            keys=["host"],
            distinct_cols={"urls": "url_canon"},
            quantile_cols={"nbytes": "nbytes"},
        )

    merged = merge_sketch_stats(stats(wave(13, 0)), stats(wave(13, 250)))
    return sketch_report(merged).orderBy("host")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every oracle-backed entry precedes the rows-only tail. The first
    50 fill the driver's CORRECTNESS window — small star dimensions and
    the multimodal meta/frame probes are checked through union-shaped
    merge queries (star_geo_dims, star_facility_links, star_structures,
    multimodal_probe; pure renames, every row/column still hash-checked)
    so the window stays all-oracle, with the composed corpus funnel
    (prepare_corpus) and the bigram-LM scorer (lm_perplexity_quality)
    inside it. The 35 oracle-backed entries after the window (▲ in
    COVERAGE.md — the round-4 web-archive/selection battery) are
    hash-checked by the same comparator via tools/check_oracles.py."""
    return {
        # relational parity (SURVEY §2.3–2.7)
        "q1_pricing_summary": _q1_pricing_summary,
        "monthly_rollup": _monthly_rollup,
        "latest_order_per_customer": _latest_order_per_customer,
        "last_non_null_fold": _last_non_null_fold,
        "bilingual_pair_join": _bilingual_pair_join,
        "group_concat_customers": _group_concat_customers,
        "customers_without_orders": _customers_without_orders,
        "prefix_filter_parts": _prefix_filter_parts,
        "variant_title_lookup": _variant_title_lookup,
        "politeness_schedule": _politeness_schedule,
        "url_canonicalize": _url_canonicalize,
        "topk_orders_per_customer": _topk_orders_per_customer,
        "cube_order_stats": _cube_order_stats,
        "nested_json_explode": _nested_json_explode,
        "sessionize_events": _sessionize_events,
        "tumbling_counts": _tumbling_counts,
        # training-data pipeline battery
        "corpus_lang_profile": _corpus_lang_profile,
        "ngram_jaccard_pairs": _ngram_jaccard_pairs,
        "dedup_clusters": _dedup_clusters,
        "drop_dup_filters": _drop_dup_filters,
        "sample_pack_corpus": _sample_pack_corpus,
        "lsh_dedup_drop": _lsh_dedup_drop,
        "prepare_corpus": _prepare_corpus,
        "lang_confusion": _lang_confusion,
        "quality_by_source": _quality_by_source,
        "doc_fingerprints": _doc_fingerprints,
        "ann_topk_cosine": _ann_topk_cosine,
        "embedding_neardup": _embedding_neardup,
        "search_similar": _search_similar,
        "cookie_str_to_map": _cookie_str_to_map,
        "wiki_section_concat": _wiki_section_concat,
        "wiki_page_gate": _wiki_page_gate,
        "wiki_table_expand": _wiki_table_expand,
        "wiki_pipeline_docs": _wiki_pipeline_docs,
        "chunk_documents": _chunk_documents,
        "asof_join_events": _asof_join_events,
        "robots_txt_parse": _robots_txt_parse,
        "multimodal_probe": _multimodal_probe,
        "lm_perplexity_quality": _lm_perplexity_quality,
        # star-schema extraction surface (nested JSON → 14 FK-linked tables)
        "star_estates": _star_estates,
        "star_geo_dims": _star_geo_dims,
        "star_facility_links": _star_facility_links,
        "star_structures": _star_structures,
        "star_monthly_market": _star_monthly_market,
        "star_units": _star_units,
        "star_unit_features": _star_unit_features,
        "star_transactions": _star_transactions,
        "star_price_trend": _star_price_trend,
        "star_pipeline_counts": _star_pipeline_counts,
        "star_streaming_ingest": _star_streaming_ingest,
        # oracle-backed past the 50-entry driver window (▲ in
        # COVERAGE.md): same comparator via tools/check_oracles.py
        "gopher_repetition": _gopher_repetition,
        "link_graph_rank": _link_graph_rank,
        "cdx_surt_keys": _cdx_surt_keys,
        "recrawl_schedule": _recrawl_schedule,
        "cdx_snapshot_diff": _cdx_snapshot_diff,
        "host_graph_rollup": _host_graph_rollup,
        "host_graph_degrees": _host_graph_degrees,
        "dsir_weights": _dsir_weights,
        "host_trap_signals": _host_trap_signals,
        "per_source_cap": _per_source_cap,
        "warc_cdx_locations": _warc_cdx_locations,
        "warc_write_manifest": _warc_write_manifest,
        "extract_fields_replay": _extract_fields_replay,
        "redirect_resolve": _redirect_resolve,
        "content_type_sniff": _content_type_sniff,
        "cdx_latest": _cdx_latest,
        "anchor_text_rollup": _anchor_text_rollup,
        "mirror_hosts": _mirror_hosts,
        "trust_graph_rank": _trust_graph_rank,
        "hits_rank": _hits_rank,
        "harmonic_centrality": _harmonic_centrality,
        "host_communities": _host_communities,
        "structured_listing_fields": _structured_listing_fields,
        "opic_importance": _opic_importance,
        "dust_rule_mining": _dust_rule_mining,
        "soft404_flags": _soft404_flags,
        "registrable_domains": _registrable_domains,
        "warc_revisits": _warc_revisits,
        "domain_budget_schedule": _domain_budget_schedule,
        "canonical_url_per_digest": _canonical_url_per_digest,
        "bm25_search": _bm25_search,
        "phrase_search": _phrase_search,
        "packed_sequences": _packed_sequences,
        "span_dedup_profile": _span_dedup_profile,
        "span_dedup_removal": _span_dedup_removal,
        "ngram_containment_pairs": _ngram_containment_pairs,
        "script_profile": _script_profile,
        "incremental_rollup": _incremental_rollup,
        "host_boilerplate_strip": _host_boilerplate_strip,
        "streaming_matview": _streaming_matview,
        "blocklist_gate": _blocklist_gate,
        "canonical_links": _canonical_links,
        "robots_rfc_schedule": _robots_rfc_schedule,
        "sitemap_discovery": _sitemap_discovery,
        "token_vocab_top": _token_vocab_top,
        "training_order_sample": _training_order_sample,
        "semdedup_drop": _semdedup_drop,
        "c4_clean_pages": _c4_clean_pages,
        "main_content_extract": _main_content_extract,
        "crawl_to_corpus_docs": _crawl_to_corpus_docs,
        "wet_wat_records": _wet_wat_records,
        "conditional_refetch": _conditional_refetch,
        "focus_outlink_scores": _focus_outlink_scores,
        "crawl_scope_filter": _crawl_scope_filter,
        "fetch_shard_assign": _fetch_shard_assign,
        "adaptive_politeness": _adaptive_politeness,
        "paragraph_dedup": _paragraph_dedup,
        "tfidf_keywords": _tfidf_keywords,
        "publish_dates": _publish_dates,
        "mixture_upsample": _mixture_upsample,
        "temperature_mixture": _temperature_mixture,
        "bpe_learn": _bpe_learn,
        "bpe_vocab": _bpe_vocab,
        "bpe_fertility": _bpe_fertility,
        "kn_perplexity": _kn_perplexity,
        "kn3_perplexity": _kn3_perplexity,
        "nb_langid_confusion": _nb_langid_confusion,
        "sentence_code_switch": _sentence_code_switch,
        "host_fairness": _host_fairness,
        "dedup_cluster_sizes": _dedup_cluster_sizes,
        "novelty_scores": _novelty_scores,
        "bm25f_search": _bm25f_search,
        "coherence_scores": _coherence_scores,
        "winnow_overlaps": _winnow_overlaps,
        "format_profile": _format_profile,
        "confusable_dedup": _confusable_dedup,
        "bitext_margin_pairs": _bitext_margin_pairs,
        "readability_scores": _readability_scores,
        "badwords_gate": _badwords_gate,
        "quality_threshold_sweep": _quality_threshold_sweep,
        # rows-only (pytest-verified)
        "bpe_encode_tokens": _bpe_encode_tokens,
        "unigram_lm_vocab": _unigram_lm_vocab,
        "unigram_encode_pieces": _unigram_encode_pieces,
        "unigram_fertility_fixed": _unigram_fertility_fixed,
        "unigram_fertility": _unigram_fertility,
        "cdc_payload_dedup": _cdc_payload_dedup,
        "crawl_sketch_stats": _crawl_sketch_stats,
        "quality_classifier_gate": _quality_classifier_gate,
        "crawl_frontier_run": _crawl_frontier_run,
        "crawl_catalog_publish": _crawl_catalog_publish,
        "extract_listings": _extract_listings,
        "minhash_lsh_candidates": _minhash_lsh_candidates,
        "simhash_neardup": _simhash_neardup,
        "lsh_ann_topk": _lsh_ann_topk,
        "crawl_frontier_retry": _crawl_frontier_retry,
        "crawl_frontier_bloom": _crawl_frontier_bloom,
        "crawl_frontier_cuckoo": _crawl_frontier_cuckoo,
        "streaming_windowed": _streaming_windowed,
        "embed_chunks": _embed_chunks,
        "ivf_ann_topk": _ivf_ann_topk,
        "streaming_stateful_dedup": _streaming_stateful_dedup,
        "streaming_tws_dedup": _streaming_tws_dedup,
        "streaming_recrawl": _streaming_recrawl,
        "streaming_corpus_ingest": _streaming_corpus_ingest,
        "streaming_lsh_neardup": _streaming_lsh_neardup,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _norm_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


_NORM = _norm_sql("text")
_TOKS = f"string_split({_NORM}, ' ')"

# Transitive near-dup survivor set (DuckDB recursive-CTE twin) — shared by
# the drop_dup_filters union oracle and the composed LSH-dedup oracle.
_NEAR_DROP_SQL = f"""
            WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
                   FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
            sh AS (SELECT doc_id, s FROM sh0
                   QUALIFY count(*) OVER (PARTITION BY s) <= 50),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                   FROM sh l JOIN sh r USING (s) WHERE l.doc_id < r.doc_id
                   GROUP BY 1, 2),
            pairs AS (
                SELECT a, b FROM co
                JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
                WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
            edges AS (SELECT a AS s, b AS d FROM pairs
                      UNION SELECT b, a FROM pairs),
            reach AS (
                SELECT s AS n, d AS m FROM edges
                UNION
                SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s),
            lbl AS (SELECT n, min(m) AS mn FROM reach GROUP BY n)
            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d LEFT JOIN lbl l ON l.n = d.doc_id
            WHERE coalesce(least(l.n, l.mn), d.doc_id) = d.doc_id
"""


# Duplicated-span (suffix-array-style) doc gate twin: rolling 8-gram
# occurrence counts → duplicated windows → gaps-and-islands interval merge →
# per-doc coverage; keep docs at <= 20% duplicated tokens
# (operators/spandedup.py::drop_duplicated_span_docs with k=8).
_SPAN_K = 8
_SPAN_DROP_SQL = f"""
            WITH toks AS (SELECT doc_id, lang, source, n_chars,
                                 {_TOKS} AS t FROM documents),
            g AS (SELECT doc_id, i - 1 AS s,
                         array_to_string(t[i:i+{_SPAN_K}-1], chr(31)) AS gram
                  FROM toks,
                       unnest(generate_series(1, len(t) - {_SPAN_K} + 1)) AS u(i)
                  WHERE len(t) >= {_SPAN_K}),
            d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
            hits AS (SELECT doc_id, s, s + {_SPAN_K} AS e FROM g JOIN d USING (gram)),
            isl AS (SELECT doc_id, s, e,
                           CASE WHEN s > coalesce(max(e) OVER (
                                    PARTITION BY doc_id ORDER BY s
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), -1)
                                THEN 1 ELSE 0 END AS brk
                    FROM hits),
            isl2 AS (SELECT doc_id, s, e,
                            sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
                     FROM isl),
            merged AS (SELECT doc_id, min(s) AS s, max(e) AS e
                       FROM isl2 GROUP BY doc_id, island),
            cov AS (SELECT doc_id, sum(e - s) AS dup_tokens
                    FROM merged GROUP BY doc_id)
            SELECT t.doc_id, t.lang, t.source, t.n_chars
            FROM toks t LEFT JOIN cov c USING (doc_id)
            WHERE coalesce(c.dup_tokens, 0) * 1.0 / greatest(len(t.t), 1) <= 0.2
"""


def _chunk_cte_sql(src_sql: str, id_col: str = "doc_id") -> str:
    """Recursive-CTE twin of functions/chunking.py (500-char window, 50
    overlap, sentence-terminator lookback 100) over an arbitrary
    ``(id_col, text)`` source — each step's start depends on the previous
    cut point. Returns columns (id_col, chunk_index, chunk, chunk_id)."""
    return f"""
        WITH RECURSIVE terms(tc) AS (
            SELECT * FROM (VALUES ('。'), ('！'), ('？'), ('；'),
                                  (chr(10)), ('.'), ('!'), ('?'), (';'))),
        _csrc AS ({src_sql}),
        st AS (
            SELECT {id_col}, text AS t, length(text) AS n,
                   CAST(0 AS BIGINT) AS s, 0 AS i
            FROM _csrc WHERE text IS NOT NULL AND length(text) > 0
            UNION ALL
            SELECT {id_col}, t, n, greatest(e - 50, s + 1), i + 1
            FROM (
                SELECT {id_col}, t, n, s, i,
                       CASE WHEN s + 500 >= n THEN n
                            ELSE s + 400 + coalesce(
                                (SELECT max(101 - strpos(
                                     reverse(substr(t, CAST(s + 401 AS INT), 100)), tc))
                                 FROM terms
                                 WHERE strpos(reverse(substr(t,
                                     CAST(s + 401 AS INT), 100)), tc) > 0),
                                100) END AS e
                FROM st)
            WHERE e < n),
        fin AS (
            SELECT {id_col}, i, s, t,
                   CASE WHEN s + 500 >= n THEN n
                        ELSE s + 400 + coalesce(
                            (SELECT max(101 - strpos(
                                 reverse(substr(t, CAST(s + 401 AS INT), 100)), tc))
                             FROM terms
                             WHERE strpos(reverse(substr(t,
                                 CAST(s + 401 AS INT), 100)), tc) > 0),
                            100) END AS e
            FROM st)
        SELECT {id_col}, CAST(i AS INT) AS chunk_index,
               substr(t, CAST(s + 1 AS INT), CAST(e - s AS INT)) AS chunk,
               {id_col} || '_' || i AS chunk_id
        FROM fin
    """


def _sparse_weights_sql(src_sql: str, id_col: str, text_col: str,
                        dim: int = 256) -> str:
    """Twin of operators/similarity.py sparse_text_weights: token →
    md5-derived 56-bit hash → (bucket, ±1 vote) → integer weights."""
    norm = _norm_sql(text_col)
    return f"""
        SELECT {id_col}, h % {dim} AS idx,
               CAST(sum(CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w
        FROM (SELECT {id_col},
                     ('0x' || substr(md5(tok), 1, 14))::BIGINT AS h
              FROM (SELECT {id_col},
                           unnest(string_split({norm}, ' ')) AS tok
                    FROM ({src_sql})))
        GROUP BY 1, 2
    """

# The synthetic lineitem table has duplicate (orderkey, linenumber) pairs;
# star datagen dedups them rank-1 by all consumed columns (datagen.py) —
# this CTE is the DuckDB mirror.
_LI_DEDUP = """
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_partkey, l_suppkey, l_extendedprice, l_quantity,
                     l_discount, l_shipdate) AS _rn
        FROM lineitem) WHERE _rn = 1
"""

# --------------------------------------------------------------------------
# star-schema twins, keyed by TABLE name: the relational expression of
# datagen∘extractor; the Spark side goes through render-JSON → from_json
# → explode, so equality proves the nested round trip is the identity.
# The pipeline/streaming count-oracles and the merged dimension queries
# compose these per-table twins.
# --------------------------------------------------------------------------
_STAR_SQL = {
    "estates": """
        SELECT 'E' || c_custkey AS estate_id,
               CASE WHEN c_custkey % 17 = 0 THEN NULL
                    ELSE '屋苑' || c_custkey END AS estate_name_zh,
               'Estate ' || c_custkey AS estate_name_en,
               'R' || (c_nationkey % 5) AS region_id,
               CASE WHEN c_nationkey % 4 = 0 THEN NULL
                    ELSE 'SR' || c_nationkey END AS subregion_id,
               CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE 'D' || c_nationkey || '_' || (c_custkey % 5)
                    END AS district_id,
               CASE WHEN c_custkey % 13 = 0 THEN NULL
                    ELSE '皇后大道' || c_custkey || '號' END AS address_zh,
               CASE WHEN c_custkey % 13 = 0 THEN NULL
                    ELSE 'No. ' || c_custkey || ' Queen''s Road'
                    END AS address_en,
               CASE WHEN c_custkey % 19 = 0 THEN NULL
                    ELSE strftime(make_timestamp(
                        CAST(1960 + c_custkey % 60 AS BIGINT),
                        CAST(1 + c_custkey % 12 AS BIGINT),
                        CAST(1 + c_custkey % 28 AS BIGINT), 0, 0, 0.0),
                        '%Y-%m-%d %H:%M:%S') END AS first_op_date,
               CASE WHEN c_custkey % 23 = 0 THEN NULL
                    ELSE strftime(make_timestamp(
                        CAST(1980 + c_custkey % 40 AS BIGINT),
                        CAST(1 + (c_custkey + 5) % 12 AS BIGINT),
                        CAST(1 + (c_custkey + 7) % 28 AS BIGINT), 0, 0, 0.0),
                        '%Y-%m-%d %H:%M:%S') END AS last_op_date,
               round(22.2 + (c_custkey % 1000) / 10000.0, 4) AS latitude,
               round(113.8 + (c_custkey % 1500) / 10000.0, 4) AS longitude
        FROM customer
    """,
    "regions": """
        SELECT DISTINCT 'R' || (c_nationkey % 5) AS region_id,
               '區' || (c_nationkey % 5) AS region_name_zh,
               'Region ' || (c_nationkey % 5) AS region_name_en
        FROM customer
    """,
    "subregions": """
        SELECT DISTINCT 'SR' || c_nationkey AS subregion_id,
               '分區' || c_nationkey AS subregion_name_zh,
               'Subregion ' || c_nationkey AS subregion_name_en,
               'R' || (c_nationkey % 5) AS region_id
        FROM customer WHERE c_nationkey % 4 <> 0
    """,
    "districts": """
        SELECT DISTINCT
               'D' || c_nationkey || '_' || (c_custkey % 5) AS district_id,
               '地區' || c_nationkey || '_' || (c_custkey % 5) AS district_name_zh,
               'District ' || c_nationkey || '_' || (c_custkey % 5)
                   AS district_name_en,
               CASE WHEN c_nationkey % 4 = 0 THEN NULL
                    ELSE 'SR' || c_nationkey END AS subregion_id
        FROM customer WHERE c_custkey % 11 <> 0
    """,
    "facilities": """
        WITH f AS (
            SELECT DISTINCT (c_custkey + i) % 30 AS x
            FROM customer, (VALUES (0), (1), (2)) t(i)
            WHERE i < c_custkey % 4)
        SELECT 'F' || x AS facility_id,
               CASE WHEN x % 6 = 0 THEN NULL
                    ELSE '設施' || x END AS facility_name_zh,
               'Facility ' || x AS facility_name_en
        FROM f
    """,
    "estate_facilities": """
        SELECT DISTINCT 'E' || c_custkey AS estate_id,
               'F' || ((c_custkey + i) % 30) AS facility_id
        FROM customer, (VALUES (0), (1), (2)) t(i)
        WHERE i < c_custkey % 4
    """,
    "estate_school_nets": """
        SELECT 'E' || c_custkey AS estate_id,
               'SN' || (c_custkey % 12) AS school_net_id,
               CASE WHEN c_custkey % 10 = 0 THEN ''
                    ELSE '校網' || (c_custkey % 12) END AS school_net_name_zh,
               CASE WHEN c_custkey % 10 = 0 THEN ''
                    ELSE 'Net ' || (c_custkey % 12) END AS school_net_name_en
        FROM customer WHERE c_custkey % 5 <> 0
    """,
    "estate_mtr_lines": """
        SELECT 'E' || c_custkey AS estate_id,
               '線' || (c_custkey % 9) AS mtr_line_name_zh,
               'Line ' || (c_custkey % 9) AS mtr_line_name_en
        FROM customer WHERE c_custkey % 6 <> 0
    """,
    "phases": """
        SELECT 'P' || c_custkey || '_' || p AS phase_id,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE '期數' || p END AS phase_name_zh,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE 'Phase ' || p END AS phase_name_en,
               'E' || c_custkey AS estate_id
        FROM customer, (VALUES (1), (2)) t(p)
        WHERE c_custkey % 3 <> 0 AND p <= 1 + c_custkey % 2
    """,
    "buildings": """
        SELECT 'B' || c_custkey || '_' || j AS building_id,
               '座' || j AS building_name_zh,
               'Tower ' || j AS building_name_en,
               'E' || c_custkey AS estate_id,
               CASE WHEN c_custkey % 3 = 0 THEN NULL
                    ELSE 'P' || c_custkey || '_'
                         || (1 + ((j - 1) % (1 + c_custkey % 2)))
                    END AS phase_id
        FROM customer, (VALUES (1), (2), (3)) t(j)
        WHERE j <= 1 + c_custkey % 3
    """,
    "estate_monthly_market_info": """
        SELECT 'E' || o_custkey AS estate_id,
               strftime(date_trunc('month', o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS record_date,
               round(sum(o_totalprice), 2) / count(*) / 1000 AS avg_ft_price,
               round(sum(o_totalprice), 2) / count(*) * 0.8 / 1000
                   AS avg_net_ft_price,
               round(max(o_totalprice) / 1000, 6) AS max_ft_price,
               round(min(o_totalprice) / 1000, 6) AS min_ft_price,
               round(max(o_totalprice) * 0.8 / 1000, 6) AS max_net_ft_price,
               round(min(o_totalprice) * 0.8 / 1000, 6) AS min_net_ft_price,
               CASE WHEN count(*) >= 2
                    THEN round(sum(o_totalprice), 2) / count(*) / 50000
                    END AS avg_ft_rent,
               CASE WHEN count(*) >= 2
                    THEN round(sum(o_totalprice), 2) / count(*) * 0.8 / 50000
                    END AS avg_net_ft_rent,
               CASE WHEN count(*) >= 2
                    THEN round(max(o_totalprice) / 50000, 8) END AS max_ft_rent,
               CASE WHEN count(*) >= 2
                    THEN round(min(o_totalprice) / 50000, 8) END AS min_ft_rent,
               CASE WHEN count(*) >= 2
                    THEN round(max(o_totalprice) * 0.8 / 50000, 8)
                    END AS max_net_ft_rent,
               CASE WHEN count(*) >= 2
                    THEN round(min(o_totalprice) * 0.8 / 50000, 8)
                    END AS min_net_ft_rent,
               CAST(count(*) AS INT) AS total_tx_count,
               CAST(count(*) // 2 AS INT) AS total_rent_tx_count,
               round(sum(o_totalprice), 2) AS total_tx_amount,
               CASE WHEN count(*) >= 2
                    THEN round(sum(o_totalprice) / 10, 4)
                    END AS total_rent_tx_amount
        FROM orders GROUP BY 1, 2
    """,
    "units": f"""
        WITH li AS ({_LI_DEDUP})
        SELECT 'U' || l_orderkey || '_' || l_linenumber AS unit_id,
               CAST((l_linenumber * 7) % 60 + 2 AS VARCHAR) AS floor,
               substr('ABCDEFGH', CAST(l_partkey % 8 + 1 AS INT), 1) AS flat,
               CASE WHEN l_partkey % 10 = 0 THEN NULL
                    ELSE round(l_quantity * 13.5, 1) END AS area,
               CASE WHEN l_partkey % 10 = 0 THEN NULL
                    ELSE round(l_quantity * 10.8, 1) END AS net_area,
               CAST(CASE WHEN l_suppkey % 2 = 0 AND l_suppkey % 3 <> 0
                         THEN 2 + l_linenumber % 3
                         WHEN l_partkey % 5 <> 0 THEN 1 + l_linenumber % 4
                         END AS INT) AS bedroom,
               CAST(CASE WHEN l_partkey % 7 = 0 THEN NULL
                         ELSE l_linenumber % 3 END AS INT) AS sitting_room,
               'B' || o_custkey || '_'
                   || (1 + (o_orderkey % (1 + o_custkey % 3))) AS building_id
        FROM li JOIN orders ON l_orderkey = o_orderkey
    """,
    "unit_features": f"""
        WITH li AS ({_LI_DEDUP})
        SELECT DISTINCT
               'U' || l_orderkey || '_' || l_linenumber AS unit_id,
               fv.fid AS feature_id,
               fv.fzh AS feature_name_zh,
               fv.fid AS feature_name_en
        FROM li,
             (VALUES (0), (1)) t(i),
             (VALUES (0, 'balcony', '連露台'), (1, 'utility_platform', '連工作平台'),
                     (2, 'sea_view', '海景'), (3, 'garden', '花園'),
                     (4, 'duplex', '複式'), (5, 'rooftop', '天台')) fv(ix, fid, fzh)
        WHERE i < (CASE WHEN l_suppkey % 2 = 0 THEN (l_partkey + 1) % 3
                        ELSE l_partkey % 3 END)
          AND fv.ix = (CASE WHEN l_suppkey % 2 = 0
                            THEN (l_partkey + 1 + i) % 6
                            ELSE (l_partkey + i) % 6 END)
    """,
    "transactions": f"""
        WITH li AS ({_LI_DEDUP})
        SELECT 'T' || l_orderkey || '_' || l_linenumber || 'a' AS tx_id,
               strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS tx_date,
               round(l_extendedprice, 2) AS price,
               CASE WHEN l_linenumber % 4 = 0 OR l_partkey % 23 = 0 THEN NULL
                    ELSE strftime(l_shipdate
                             - to_days(CAST(100 + l_linenumber * 17 AS INT)),
                         '%Y-%m-%d %H:%M:%S') END AS last_tx_date,
               round(l_discount * 100 - 5, 2) AS gain,
               l_extendedprice / (l_quantity * 10.0) AS net_ft_price,
               'U' || l_orderkey || '_' || l_linenumber AS unit_id
        FROM li
        UNION ALL
        SELECT 'T' || l_orderkey || '_' || l_linenumber || 'b',
               strftime(l_shipdate
                   + to_days(CAST(11 + l_linenumber AS INT)),
                   '%Y-%m-%d %H:%M:%S'),
               round(l_extendedprice * 1.05, 4),
               strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'),
               NULL, NULL,
               'U' || l_orderkey || '_' || l_linenumber
        FROM li WHERE l_suppkey % 2 = 0
    """,
}


# EP2 pipeline oracle: the composed twin of pipelines/wiki.py over the
# same part-derived synthetic inputs — variant CTE (shared shape with the
# variant_title_lookup oracle), gate predicates, section-concat string
# algebra, the fixed wikitable's closed-form CSV, then the chunk CTE.
_WIKI_DOCS_SQL = """
    WITH titles AS (
        SELECT DISTINCT upper(p_name) AS title FROM part
        WHERE p_partkey % 7 = 0),
    pd AS (
        SELECT p_name AS page_title, min(p_partkey) AS pk FROM part
        WHERE p_partkey % 3 = 0 GROUP BY 1),
    raw AS (
        SELECT title, idx, v FROM titles, (VALUES (0), (1), (2), (3), (4), (5)) t(idx),
        LATERAL (SELECT CASE idx
            WHEN 0 THEN trim(title)
            WHEN 1 THEN upper(trim(title))
            WHEN 2 THEN lower(trim(title))
            WHEN 3 THEN regexp_replace(trim(title),
                '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', '')
            WHEN 4 THEN upper(regexp_replace(trim(title),
                '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', ''))
            ELSE lower(regexp_replace(trim(title),
                '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', ''))
            END AS v) s),
    firsts AS (
        SELECT title, v, min(idx) AS midx FROM raw GROUP BY title, v),
    variants AS (
        SELECT title, v,
               CAST(row_number() OVER (PARTITION BY title
                    ORDER BY midx) - 1 AS INT) AS variant_rank
        FROM firsts),
    hits AS (
        SELECT title, page_title, pk,
               row_number() OVER (PARTITION BY title
                                  ORDER BY variant_rank) AS rn
        FROM variants JOIN pd ON v = page_title),
    content AS (
        SELECT title, page_title, pk,
               CASE WHEN pk % 5 <> 0
                    THEN '香港 ' || repeat(page_title || '。', 30)
                    ELSE repeat(page_title || '。', 30) END AS body
        FROM hits WHERE rn = 1 AND pk % 7 <> 0),
    gated AS (SELECT * FROM content WHERE contains(body, '香港')),
    full_body AS (
        SELECT title, page_title, pk,
               body || chr(10) || upper(substr(body, 1, 40))
                    || chr(10) || lower(substr(body, 1, 30)) AS fb
        FROM gated),
    docs AS (
        SELECT title, page_title,
               fb || chr(10)
                  || 'Page,Info,Info' || chr(10)
                  || 'w' || pk || ',' || page_title || ',' || pk || chr(10)
                  || 'w' || pk || ',t=' || page_title || ',pk=' || pk
               AS text
        FROM full_body),
    chunks AS ({chunk_cte})
    SELECT c.title, d.page_title, c.chunk_index, c.chunk, c.chunk_id
    FROM chunks c JOIN docs d USING (title)
"""


# EP3 search oracle: chunk the corpus (recursive CTE), sparse-embed chunks
# AND query texts with the shared hashed encoder, integer dot/norms →
# bit-stable cosine, top-5 per query.
_SEARCH_SIMILAR_SQL = f"""
    WITH cw AS ({_sparse_weights_sql(
        "SELECT chunk_id, chunk FROM ("
        + _chunk_cte_sql("SELECT doc_id, text FROM documents")
        + ")",
        "chunk_id", "chunk")}),
    qw AS ({_sparse_weights_sql(
        "SELECT doc_id AS qid, text FROM documents WHERE doc_id % 101 = 0",
        "qid", "text")}),
    cn AS (SELECT chunk_id, sum(w * w) AS cn2 FROM cw GROUP BY 1),
    qn AS (SELECT qid, sum(w * w) AS qn2 FROM qw GROUP BY 1),
    dots AS (
        SELECT qid, chunk_id, CAST(sum(qw.w * cw.w) AS BIGINT) AS dot
        FROM qw JOIN cw USING (idx) GROUP BY 1, 2),
    scored AS (
        SELECT qid, chunk_id, dot / (sqrt(qn2) * sqrt(cn2)) AS cs
        FROM dots JOIN qn USING (qid) JOIN cn USING (chunk_id))
    SELECT qid, chunk_id, round(cs, 6) AS cos_sim, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
              ORDER BY cs DESC, chunk_id) AS rnk FROM scored)
    WHERE rnk <= 5
"""


def _union_sql(*parts: tuple, cols: tuple) -> str:
    """Compose the union-shaped merged-dimension oracles from the
    per-table twins: each part is (table, expr-per-col...); the merged
    query hash-checks every row/column of each underlying table."""
    sels = []
    for tbl, *exprs in parts:
        proj = ", ".join(f"{e} AS {c}" for e, c in zip(exprs, cols))
        sels.append(f"SELECT '{tbl}' AS tbl, {proj} FROM ({_STAR_SQL[tbl]})")
    return "\nUNION ALL\n".join(sels)


def _prepare_corpus_sql() -> str:
    """DuckDB twin of the COMPOSED training-corpus funnel
    (pipelines/corpus.py, exact-dedup recipe: threshold 0.5, shingle-DF
    cap 50, min_quality 0.3, pack_budget 512): exact dedup → transitive
    near-dup canonicalization (recursive CTE over the DEDUPED set — the
    shingle-DF cap must see the funnel's input, not raw documents) →
    quality gate → progressive PII scrub (operators/redact.py order) →
    token count over the SCRUBBED text → md5-bucket offset packing. Each
    stage twin is individually oracle-proven; this composes them so the
    end-to-end funnel is hash-checked too."""
    from hk_housing_datahub_spark.operators.redact import _CLASSES

    quality = f"""round(0.4 * least(len({_TOKS}) / 100.0, 1.0)
                + 0.3 * least(len(list_filter({_TOKS}, x -> x IN
                      ('the','a','of','and','to','in','is','for')))
                      * 5.0 / greatest(len({_TOKS}), 1), 1.0)
                + 0.3 * (1.0 - least((length(text) - length(regexp_replace(
                      text, '[.,;:!?''"()-]', '', 'g')))
                      * 10.0 / greatest(length(text), 1), 1.0)), 6)"""
    # progressive per-class scrub: each class is counted on the text with
    # the earlier classes already replaced — redact.py's pii_counts view
    reds = []
    for i, (_name, pat, token) in enumerate(_CLASSES, start=1):
        src = "gated" if i == 1 else f"r{i - 1}"
        keep = "".join(f"c{j}, " for j in range(1, i))
        reds.append(
            f"r{i} AS (SELECT doc_id, lang, source, quality, {keep}"
            f"len(regexp_extract_all(t, '{pat}')) AS c{i}, "
            f"regexp_replace(t, '{pat}', '{token}', 'g') AS t FROM {src})"
        )
    red_sql = ",\n        ".join(reds)
    total = " + ".join(f"c{i}" for i in range(1, len(_CLASSES) + 1))
    last = f"r{len(_CLASSES)}"
    ntok = f"len(string_split({_norm_sql('t')}, ' '))"
    return f"""
        WITH RECURSIVE
        ex AS (
            SELECT doc_id, lang, source, text FROM (
                SELECT doc_id, lang, source, text,
                       row_number() OVER (PARTITION BY md5({_NORM})
                                          ORDER BY doc_id) AS _rn
                FROM documents)
            WHERE _rn = 1),
        toks AS (SELECT doc_id, {_TOKS} AS tk FROM ex),
        sh0 AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
                FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
                WHERE len(tk) >= 3),
        sh AS (SELECT doc_id, s FROM sh0
               QUALIFY count(*) OVER (PARTITION BY s) <= 50),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
               FROM sh l JOIN sh r USING (s) WHERE l.doc_id < r.doc_id
               GROUP BY 1, 2),
        pairs AS (
            SELECT a, b FROM co
            JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
        edges AS (SELECT a AS s, b AS d FROM pairs
                  UNION SELECT b, a FROM pairs),
        reach AS (
            SELECT s AS n, d AS m FROM edges
            UNION
            SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s),
        lbl AS (SELECT n, min(m) AS mn FROM reach GROUP BY n),
        canon AS (
            SELECT e.doc_id, e.lang, e.source, e.text
            FROM ex e LEFT JOIN lbl l ON l.n = e.doc_id
            WHERE coalesce(least(l.n, l.mn), e.doc_id) = e.doc_id),
        gated AS (
            SELECT * FROM (
                SELECT doc_id, lang, source, {quality} AS quality,
                       text AS t
                FROM canon)
            WHERE quality >= 0.3),
        {red_sql},
        fin AS (
            SELECT doc_id, lang, source, quality,
                   CAST({total} AS INT) AS pii_total,
                   {ntok} AS n_tokens,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM {last})
        SELECT doc_id, lang, source, quality, pii_total, n_tokens, bucket,
               CAST(floor(
                   (sum(n_tokens) OVER (
                        PARTITION BY bucket ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens) / 512.0) AS BIGINT) AS bin_id
        FROM fin
    """


def _bpe_sql(
    k: int,
    min_word_count: int = 2,
    min_pair_count: int = 2,
    final_vocab: bool = False,
) -> str:
    """Unrolled DuckDB twin of operators/bpe.py learn_bpe: each word is
    a \\x1f-wrapped symbol string (``\\x1f s1 \\x1f \\x1f s2 \\x1f ...``),
    pair counts come from the un-wrapped symbol list via a lateral
    generate_series, the argmax pair is (count desc, left, right)
    LIMIT 1, and the merge pass is ONE plain ``replace`` — SQL replace
    scans left-to-right non-overlapping, which is exactly the engine's
    greedy fold. Early stop falls out structurally: an empty best CTE
    left-joins as NULL (word table passes through unchanged) and every
    later best CTE is then empty too, so the union of best rows IS the
    merge table. With ``final_vocab`` the query instead returns the
    top-300 words' final symbolization after the k merges."""
    parts = [
        """
        toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''),
        freq AS (
          SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        w0 AS (
          SELECT token, cnt,
                 chr(31) || array_to_string(
                     string_split_regex(token, ''), chr(31) || chr(31))
                 || chr(31) || chr(31) || '</w>' || chr(31) AS s
          FROM freq
          WHERE cnt >= %(minw)d AND NOT contains(token, chr(31)))"""
        % {"minw": min_word_count}
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
        p{i} AS (
          SELECT syms[j] AS l, syms[j + 1] AS r,
                 CAST(sum(cnt) AS BIGINT) AS c
          FROM (SELECT cnt,
                       string_split(substr(s, 2, length(s) - 2),
                                    chr(31) || chr(31)) AS syms
                FROM w{i - 1}),
               unnest(generate_series(1, len(syms) - 1)) AS u(j)
          GROUP BY 1, 2),
        b{i} AS (
          SELECT l, r, c FROM p{i} WHERE c >= {min_pair_count}
          ORDER BY c DESC, l, r LIMIT 1),
        w{i} AS (
          SELECT w.token, w.cnt,
                 CASE WHEN b.l IS NULL THEN w.s
                      ELSE replace(w.s,
                             chr(31) || b.l || chr(31) || chr(31)
                                     || b.r || chr(31),
                             chr(31) || b.l || b.r || chr(31))
                 END AS s
          FROM w{i - 1} w LEFT JOIN b{i} b ON TRUE)"""
        )
    if final_vocab == "encode":
        # Per-document tokenization under the learned chain: every
        # distinct word runs the same aw{i} unrolled merges, then each
        # doc's words rejoin IN ORDER — token count and the \x1f-joined
        # token stream md5 are compared against encode_bpe's output.
        aw = [
            """
        aw0 AS (
          SELECT token,
                 chr(31) || array_to_string(
                     string_split_regex(token, ''), chr(31) || chr(31))
                 || chr(31) || chr(31) || '</w>' || chr(31) AS s
          FROM (SELECT DISTINCT token FROM toks)
          WHERE NOT contains(token, chr(31)))"""
        ]
        for i in range(1, k + 1):
            aw.append(
                f"""
        aw{i} AS (
          SELECT w.token,
                 CASE WHEN b.l IS NULL THEN w.s
                      ELSE replace(w.s,
                             chr(31) || b.l || chr(31) || chr(31)
                                     || b.r || chr(31),
                             chr(31) || b.l || b.r || chr(31))
                 END AS s
          FROM aw{i - 1} w LEFT JOIN b{i} b ON TRUE)"""
            )
        tail = (
            ","
            + ",".join(aw)
            + f""",
        wl AS (
          SELECT token,
                 array_to_string(
                     string_split(substr(s, 2, length(s) - 2),
                                  chr(31) || chr(31)), chr(31)) AS tokstr,
                 len(string_split(substr(s, 2, length(s) - 2),
                                  chr(31) || chr(31))) AS n_toks
          FROM aw{k}),
        dtoks AS (
          SELECT doc_id, ws[j] AS token, j
          FROM (SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
                WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                      <> ''),
               unnest(generate_series(1, len(ws))) AS u(j)),
        perdoc AS (
          SELECT d.doc_id,
                 string_agg(wl.tokstr, chr(31) ORDER BY d.j) AS alltoks,
                 CAST(sum(wl.n_toks) AS BIGINT) AS n_bpe
          FROM dtoks d JOIN wl USING (token)
          GROUP BY 1)
        SELECT doc.doc_id,
               CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
               md5(coalesce(p.alltoks, '')) AS tokens_md5
        FROM documents doc LEFT JOIN perdoc p USING (doc_id)"""
        )
        return "WITH " + ",".join(parts) + tail
    if final_vocab == "fertility":
        # Encode ALL words (no min-count filter — OOV words of the
        # trained vocab still encode) through the same b{i} merge chain,
        # then fold per-word token counts back through each document's
        # word list: tokens-per-char by language.
        aw = [
            """
        aw0 AS (
          SELECT token,
                 chr(31) || array_to_string(
                     string_split_regex(token, ''), chr(31) || chr(31))
                 || chr(31) || chr(31) || '</w>' || chr(31) AS s
          FROM (SELECT DISTINCT token FROM toks)
          WHERE NOT contains(token, chr(31)))"""
        ]
        for i in range(1, k + 1):
            aw.append(
                f"""
        aw{i} AS (
          SELECT w.token,
                 CASE WHEN b.l IS NULL THEN w.s
                      ELSE replace(w.s,
                             chr(31) || b.l || chr(31) || chr(31)
                                     || b.r || chr(31),
                             chr(31) || b.l || b.r || chr(31))
                 END AS s
          FROM aw{i - 1} w LEFT JOIN b{i} b ON TRUE)"""
            )
        tail = (
            ","
            + ",".join(aw)
            + f""",
        wl AS (
          SELECT token,
                 len(string_split(substr(s, 2, length(s) - 2),
                                  chr(31) || chr(31))) AS n_toks
          FROM aw{k}),
        per_doc AS (
          SELECT d.doc_id, d.lang, sum(wl.n_toks) AS n_bpe
          FROM (SELECT doc_id, lang, unnest(
                    string_split(trim(regexp_replace(lower(text), '\\s+',
                        ' ', 'g')), ' ')) AS token
                FROM documents
                WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                      <> '') d
          JOIN wl ON d.token = wl.token
          GROUP BY 1, 2)
        SELECT doc.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(p.n_bpe, 0)) AS BIGINT) AS total_tokens,
               CAST(sum(doc.n_chars) AS BIGINT) AS total_chars,
               round(sum(coalesce(p.n_bpe, 0)) * 1.0
                     / sum(doc.n_chars), 6) AS tokens_per_char
        FROM documents doc LEFT JOIN per_doc p USING (doc_id)
        GROUP BY 1"""
        )
        return "WITH " + ",".join(parts) + tail
    if final_vocab:
        tail = f"""
        SELECT token, cnt,
               replace(substr(s, 2, length(s) - 2),
                       chr(31) || chr(31), ' ') AS syms
        FROM w{k} ORDER BY cnt DESC, token LIMIT 300"""
    else:
        union = "\n          UNION ALL ".join(
            f"SELECT {i - 1} AS merge_rank, l AS lhs, r AS rhs, "
            f"c AS freq FROM b{i}"
            for i in range(1, k + 1)
        )
        tail = f"""
        SELECT * FROM (
          {union})"""
    return "WITH " + ",".join(parts) + tail


def _embed_chunks_sql() -> str:
    """DuckDB twin of the embed_chunks vector-sink shape: the
    sentence-aware chunk loop (shared _chunk_cte_sql) feeds the
    deterministic hashed-n-gram encoder (functions/embedding.py) —
    FNV-1a over UTF-8 byte trigrams replayed exactly with HUGEINT
    mod-2^64 arithmetic (the low-byte-xor decomposition: xor with a
    byte only touches the low 8 bits), ±1 bucket votes from hash bit
    32, 64 buckets. The entry reports (chunk_id, dim, embedding_norm):
    the norm of the L2-NORMALIZED float32 vector rounds to 1.0 at 4
    decimals whenever any bucket vote survives cancellation and 0.0
    otherwise, so the oracle needs the exact vote table, not the float
    vector."""
    P, M, OFF = 1099511628211, 2**64, 14695981039346656037

    def step(h: str, b: str) -> str:
        return (
            f"(((({h}) // 256) * 256 + xor(CAST(({h}) % 256 AS BIGINT),"
            f" {b})) * CAST({P} AS HUGEINT)) % CAST({M} AS HUGEINT)"
        )

    h = f"CAST({OFF} AS HUGEINT)"
    for b in ("b0", "b1", "b2"):
        h = step(h, b)
    chunk = _chunk_cte_sql("SELECT doc_id, text FROM documents")
    return f"""
        WITH chunks AS ({chunk}),
        cb AS (SELECT chunk_id, hex(encode(chunk)) AS hx,
                      CAST(length(hex(encode(chunk))) / 2 AS BIGINT) AS n
               FROM chunks),
        ng AS (SELECT chunk_id,
                      CASE WHEN j < n THEN
                          ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT
                      ELSE 0 END AS b0,
                      CASE WHEN j + 1 < n THEN
                          ('0x' || substr(hx, 2 * j + 3, 2))::BIGINT
                      ELSE 0 END AS b1,
                      CASE WHEN j + 2 < n THEN
                          ('0x' || substr(hx, 2 * j + 5, 2))::BIGINT
                      ELSE 0 END AS b2
               FROM cb,
                    unnest(generate_series(0, greatest(n, 3) - 3)) AS u(j)),
        hv AS (SELECT chunk_id, {h} AS h3 FROM ng),
        votes AS (SELECT chunk_id, h3 % 64 AS bucket,
                         sum(CASE WHEN (h3 // 4294967296) % 2 = 1
                             THEN -1 ELSE 1 END) AS s
                  FROM hv GROUP BY 1, 2),
        nz AS (SELECT chunk_id, max(abs(s)) > 0 AS live
               FROM votes GROUP BY 1)
        SELECT c.chunk_id, CAST(64 AS INT) AS dim,
               CASE WHEN coalesce(nz.live, FALSE) THEN 1.0 ELSE 0.0 END
                   AS embedding_norm
        FROM chunks c LEFT JOIN nz USING (chunk_id)
    """



def _stream_neardup_sql() -> str:
    """DuckDB twin of the streaming near-dup ingest (md5_56 mode).

    Per wave, survivors come from the exact-path near-dup twin
    (candidates-verified LSH ≡ exact pairs at bands=32 recall — the
    lsh_dedup_drop oracle's argument); the cross-batch leg then replays
    the engine LITERALLY: 64 md5-prefix minhash minima per survivor
    (UNCAPPED shingles — signatures see every shingle, only the exact
    verifier caps df), 32 band keys (md5-prefix of the '#'-joined row
    mins — streaming/neardup.py _band_index md5_56), the (band, key)
    collision join against wave-1's committed state, and the
    matching-positions/64 estimator at threshold 0.5."""

    def near_drop(src: str, g: str) -> str:
        return f"""
        {g}toks AS (SELECT doc_id, text, {_TOKS} AS t FROM ({src})),
        {g}sh0 AS (SELECT DISTINCT doc_id,
                          array_to_string(t[i:i+2], ' ') AS s
               FROM {g}toks,
                    unnest(generate_series(1, len(t) - 2)) AS gg(i)
               WHERE len(t) >= 3),
        {g}shc AS (SELECT doc_id, s FROM {g}sh0
               QUALIFY count(*) OVER (PARTITION BY s) <= 50),
        {g}sz AS (SELECT doc_id, count(*) AS n FROM {g}shc
                  GROUP BY doc_id),
        {g}co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
               FROM {g}shc l JOIN {g}shc r USING (s)
               WHERE l.doc_id < r.doc_id
               GROUP BY 1, 2),
        {g}pairs AS (SELECT a, b FROM {g}co
               JOIN {g}sz sa ON sa.doc_id = a
               JOIN {g}sz sb ON sb.doc_id = b
               WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
        {g}edges AS (SELECT a AS s, b AS d FROM {g}pairs
                  UNION SELECT b, a FROM {g}pairs),
        {g}reach AS (SELECT s AS nn, d AS m FROM {g}edges
              UNION
              SELECT r.nn, e.d FROM {g}reach r
              JOIN {g}edges e ON r.m = e.s),
        {g}lbl AS (SELECT nn, min(m) AS mn FROM {g}reach GROUP BY nn),
        {g}keep AS (SELECT t.doc_id, t.text FROM {g}toks t
                 LEFT JOIN {g}lbl l ON l.nn = t.doc_id
                 WHERE coalesce(least(l.nn, l.mn), t.doc_id) = t.doc_id),
        {g}hx AS (SELECT sh.doc_id, q.j,
                     min(('0x' || substr(md5(sh.s || '#' || q.j),
                          1, 14))::BIGINT) AS m
               FROM {g}sh0 sh
               JOIN {g}keep USING (doc_id),
                    unnest(generate_series(0, 63)) AS q(j)
               GROUP BY 1, 2),
        {g}bk AS (SELECT a.doc_id, a.j // 2 AS band,
                     ('0x' || substr(md5(a.m || '#' || b.m),
                          1, 14))::BIGINT AS key
               FROM {g}hx a JOIN {g}hx b
                 ON a.doc_id = b.doc_id AND b.j = a.j + 1
                    AND a.j % 2 = 0)"""

    w1 = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"
    w2 = ("SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1 "
          "UNION ALL "
          "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
          "WHERE doc_id % 4 = 0")
    return f"""
        WITH RECURSIVE {near_drop(w1, "u")},
        {near_drop(w2, "v")},
        cand AS (SELECT DISTINCT n.doc_id AS nd, o.doc_id AS od
                 FROM vbk n JOIN ubk o
                   ON n.band = o.band AND n.key = o.key),
        est AS (SELECT c.nd
                FROM cand c
                JOIN vhx a ON a.doc_id = c.nd
                JOIN uhx b ON b.doc_id = c.od AND b.j = a.j
                GROUP BY c.nd, c.od
                HAVING sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
                       / 64.0 >= 0.5),
        dropped AS (SELECT DISTINCT nd AS doc_id FROM est)
        SELECT doc_id, text FROM ukeep
        UNION ALL
        SELECT doc_id, text FROM vkeep
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    """


def _cdc_sql(min_size: int = 64, avg_size: int = 256,
             max_size: int = 1024) -> str:
    """DuckDB twin of the CDC chunk audit (multimodal/cdc.py): the gear
    rolling hash ``h = (h<<1 + gear[b]) mod 2^64`` is tested against
    ``mask = avg_size-1`` — with avg_size = 256 only the LOW 8 BITS of
    h matter, and left-shifts push every byte older than 8 positions
    out of them, so "h & mask == 0" at position i is a pure function of
    bytes (i-8, i] — an 8-term lag window over the byte table, no
    sequential scan. (The kernel's h-reset at each boundary is
    invisible to the test: boundaries only fire at ln ≥ min_size = 64 >
    8, so the 8-byte window never spans a chunk start.) Boundary
    CHAINING (min_size gate + forced max_size cut) is the recursive
    chunk walk over that candidate set — one recursion step per chunk,
    not per byte. Chunk identity keys on the hex byte substring itself
    (DuckDB's md5 takes VARCHAR only; equal hex ⟺ equal bytes, which
    is all the dedup stats compare)."""
    from hk_housing_datahub_spark.multimodal.cdc import _GEAR

    gear_vals = ", ".join(f"({b}, {g & 255})" for b, g in enumerate(_GEAR))
    return f"""
        WITH RECURSIVE blobs AS (
          SELECT doc_id, hx, CAST(length(hx) / 2 AS BIGINT) AS n
          FROM (
            SELECT doc_id, hex(encode(repeat(text, 3))) AS hx
            FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id,
                   '50414421' || hex(encode(repeat(text, 3))) AS hx
            FROM documents WHERE doc_id % 5 = 0)),
        gear(b, g) AS (VALUES {gear_vals}),
        bytes AS (
          SELECT bl.doc_id, u.j,
                 ('0x' || substr(bl.hx, 2 * u.j + 1, 2))::INT AS bv
          FROM blobs bl, unnest(generate_series(0, bl.n - 1)) AS u(j)),
        gb AS (
          SELECT doc_id, j, g FROM bytes JOIN gear ON b = bv),
        cand AS (
          SELECT doc_id, j + 1 AS i
          FROM (
            SELECT doc_id, j,
                   (g
                    + 2 * coalesce(lag(g, 1) OVER w, 0)
                    + 4 * coalesce(lag(g, 2) OVER w, 0)
                    + 8 * coalesce(lag(g, 3) OVER w, 0)
                    + 16 * coalesce(lag(g, 4) OVER w, 0)
                    + 32 * coalesce(lag(g, 5) OVER w, 0)
                    + 64 * coalesce(lag(g, 6) OVER w, 0)
                    + 128 * coalesce(lag(g, 7) OVER w, 0)) % 256 AS wsum
            FROM gb
            WINDOW w AS (PARTITION BY doc_id ORDER BY j))
          WHERE j >= 7 AND wsum = 0),
        bnds AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS s FROM blobs
          UNION ALL
          SELECT doc_id, nxt FROM (
            SELECT b.doc_id,
                   least(coalesce((SELECT min(c.i) FROM cand c
                                   WHERE c.doc_id = b.doc_id
                                     AND c.i >= b.s + {min_size}
                                     AND c.i <  b.s + {max_size}),
                                  b.s + {max_size}),
                         b.s + {max_size}) AS nxt,
                   bl.n AS n
            FROM bnds b JOIN blobs bl USING (doc_id)
            WHERE b.s < bl.n
          ) WHERE nxt <= n),
        chunks AS (
          SELECT doc_id, s AS off, e - s AS len, hx
          FROM (
            SELECT b.doc_id, b.s,
                   coalesce(lead(b.s) OVER (PARTITION BY b.doc_id
                                            ORDER BY b.s), bl.n) AS e,
                   bl.hx
            FROM bnds b JOIN blobs bl USING (doc_id))
          WHERE e > s),
        per AS (
          SELECT substr(hx, 2 * off + 1, 2 * len) AS key,
                 count(*) AS refs, min(len) AS len
          FROM chunks GROUP BY 1)
        SELECT CAST(sum(refs) AS BIGINT) AS total_chunks,
               CAST(count(*) AS BIGINT) AS distinct_chunks,
               CAST(sum(refs * len) AS BIGINT) AS total_bytes,
               CAST(sum(len) AS BIGINT) AS distinct_bytes,
               round(1.0 - sum(len) * 1.0 / sum(refs * len), 6)
                   AS dedup_ratio
        FROM per
    """


# Fixed literal unigram-LM vocabulary for the encode oracle: letter
# singles at one logp tier, common English multi-char pieces at better
# ones (so real merging happens), NO digit singles (so corpus words with
# digits exercise the OOV floor fallback). All logps are exact binary
# doubles → both engines sum identically.
_UNI_VOCAB: dict[str, float] = {
    **{c: -6.0 for c in "abcdefghijklmnopqrstuvwxyz"},
    "th": -3.5, "he": -3.5, "in": -3.5, "er": -3.75, "an": -3.75,
    "re": -3.75, "on": -4.0, "at": -4.0, "en": -4.0, "es": -4.0,
    "or": -4.25, "ti": -4.25, "st": -4.25, "ar": -4.25, "nd": -4.25,
    "the": -4.5, "ing": -4.5, "and": -4.75, "ion": -4.75, "ent": -4.75,
    "tion": -5.0,
}


def _unigram_encode_sql(
    vocab: dict, max_piece_len: int = 4, max_word_len: int = 24,
    fertility: bool = False,
) -> str:
    """Unrolled DuckDB twin of encode_unigram under a LITERAL vocab.

    Two position-by-position Viterbi DPs over the distinct-word table
    (word length ≤ 8 in the synthetic corpus; stages unroll to
    ``max_word_len`` for 3× margin): the BASE DP over the vocab alone
    (may be infeasible — no row at the final position), and the AUG DP
    over vocab ∪ {missing single chars at floor} (always feasible) —
    exactly Python's two-phase fallback. Each stage keeps the per-word
    argmax by (score DESC, -n_pieces DESC, path DESC); the \\x1f-joined
    path string compares identically to Python's piece-tuple comparison
    because chr(31) sorts below every piece character. Stages are
    MATERIALIZED — each is referenced by up to ``max_piece_len`` later
    stages and must not re-inline exponentially."""
    floor = min(vocab.values()) - 20.0
    vals = ", ".join(
        f"('{p}', CAST({lp!r} AS DOUBLE))" for p, lp in sorted(vocab.items())
    )

    def stages(tag: str, model: str, model_on: str) -> list[str]:
        out = [
            f"""
        {tag}0 AS MATERIALIZED (
          SELECT word, CAST(0 AS DOUBLE) AS sc, 0 AS np, '' AS path
          FROM w)"""
        ]
        for i in range(1, max_word_len + 1):
            arms = []
            for j in range(max(0, i - max_piece_len), i):
                arms.append(
                    f"""
              SELECT p.word AS word, p.sc + v.lp AS sc,
                     p.np - 1 AS np,
                     CASE WHEN p.path = '' THEN v.piece
                          ELSE p.path || chr(31) || v.piece END AS path
              FROM {tag}{j} p JOIN {model} v
                ON {model_on} v.piece = substr(p.word, {j + 1}, {i - j})
              WHERE len(p.word) >= {i}"""
                )
            body = "\n              UNION ALL".join(arms)
            out.append(
                f"""
        {tag}{i} AS MATERIALIZED (
          SELECT word, sc, np, path FROM (
            SELECT word, sc, np, path,
                   row_number() OVER (PARTITION BY word
                       ORDER BY sc DESC, np DESC, path DESC) AS rn
            FROM ({body})
          ) WHERE rn = 1)"""
            )
        return out

    fb = " UNION ALL ".join(
        f"SELECT word, np, path FROM b{i} WHERE len(word) = {i}"
        for i in range(1, max_word_len + 1)
    )
    fa = " UNION ALL ".join(
        f"SELECT word, np, path FROM a{i} WHERE len(word) = {i}"
        for i in range(1, max_word_len + 1)
    )
    parts = [
        f"""
        vocab(piece, lp) AS (VALUES {vals}),
        dt AS (
          SELECT doc_id, ws[j] AS word, j
          FROM (SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), ' ') AS ws
                FROM documents
                WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                      <> ''),
               unnest(generate_series(1, len(ws))) AS u(j)),
        w AS MATERIALIZED (SELECT DISTINCT word FROM dt),
        wchars AS (
          SELECT DISTINCT word, substr(word, k, 1) AS ch
          FROM w, unnest(generate_series(1, len(word))) AS u(k)),
        augm AS MATERIALIZED (
          SELECT word, ch AS piece, CAST({floor!r} AS DOUBLE) AS lp
          FROM wchars
          WHERE ch NOT IN (SELECT piece FROM vocab WHERE len(piece) = 1)
          UNION ALL
          SELECT w.word, v.piece, v.lp FROM w CROSS JOIN vocab v)"""
    ]
    parts += stages("b", "vocab", "")
    parts += stages("a", "augm", "v.word = p.word AND")
    tail = f""",
        fb AS ({fb}),
        fa AS ({fa}),
        wres AS (
          SELECT w.word,
                 coalesce(fb.path, fa.path) AS path,
                 -(coalesce(fb.np, fa.np)) AS n_pieces
          FROM w LEFT JOIN fb USING (word) LEFT JOIN fa USING (word)),
        perdoc AS (
          SELECT d.doc_id,
                 string_agg(r.path, chr(31) ORDER BY d.j) AS allp,
                 CAST(sum(r.n_pieces) AS BIGINT) AS n_pieces
          FROM dt d JOIN wres r USING (word)
          GROUP BY 1)"""
    if fertility:
        tail += """
        SELECT doc.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(p.n_pieces, 0)) AS BIGINT)
                   AS total_pieces,
               CAST(sum(length(doc.text)) AS BIGINT) AS total_chars,
               round(sum(coalesce(p.n_pieces, 0)) * 1.0
                     / sum(length(doc.text)), 6) AS pieces_per_char
        FROM documents doc LEFT JOIN perdoc p USING (doc_id)
        GROUP BY 1"""
    else:
        tail += """
        SELECT doc.doc_id,
               CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
               md5(coalesce(p.allp, '')) AS pieces_md5
        FROM documents doc LEFT JOIN perdoc p USING (doc_id)"""
    return "WITH " + ",".join(parts) + tail


def _semdedup_sql(k: int = 8, iters: int = 2, tau: float = 0.3) -> str:
    """Unrolled DuckDB twin of operators/semdedup.py: one CTE pair
    (assign, centroid-update) per fixed Lloyd's iteration, then the
    final assignment and the triangular drop rule. Static given the
    (k, iters, tau) literals — the loop only unrolls the chain."""

    def sim(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}.v, {b}.v) / "
            f"(sqrt(list_dot_product({a}.v, {a}.v)) * "
            f"sqrt(list_dot_product({b}.v, {b}.v)))"
        )

    def assign(name: str, cents: str, keep_sim: bool) -> str:
        cols = "vec_id, v, cid" + (", sim" if keep_sim else "")
        return f"""{name} AS (
  SELECT {cols} FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cid) AS rn FROM (
      SELECT e.vec_id, e.v, s.cid, {sim('e', 's')} AS sim
      FROM e CROSS JOIN {cents} s)) WHERE rn = 1)"""

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                            vec_id) - 1 AS cid, v
  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})""",
    ]
    prev = "seeds"
    for i in range(iters):
        ctes.append(assign(f"a{i}", prev, keep_sim=False))
        ctes.append(f"""c{i + 1}l AS (
  SELECT cid, list(av ORDER BY pos) AS v FROM (
    SELECT cid, pos, avg(val) AS av FROM (
      SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS val
      FROM a{i})
    GROUP BY cid, pos) GROUP BY cid)""")
        ctes.append(f"""c{i + 1} AS (
  SELECT s.cid, coalesce(l.v, s.v) AS v
  FROM {prev} s LEFT JOIN c{i + 1}l l USING (cid))""")
        prev = f"c{i + 1}"
    ctes.append(assign("af", prev, keep_sim=True))
    ctes.append("""ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cid
                               ORDER BY sim ASC, vec_id) AS rnk FROM af)""")
    ctes.append(f"""drops AS (
  SELECT DISTINCT hi.vec_id FROM ranked lo JOIN ranked hi
    ON lo.cid = hi.cid AND lo.rnk < hi.rnk
  WHERE {sim('lo', 'hi')} >= {tau})""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT r.vec_id, CAST(r.cid AS INT) AS cluster,
       round(r.sim, 6) AS centroid_sim, (d.vec_id IS NULL) AS kept
FROM ranked r LEFT JOIN drops d ON d.vec_id = r.vec_id"""
    )


def oracle_sql() -> dict[str, str]:
    d = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                   round(avg(l_quantity), 4) AS avg_qty,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "monthly_rollup": """
            SELECT o_custkey AS custkey,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
                   CAST(count(*) AS BIGINT) AS n_tx,
                   round(sum(o_totalprice), 2) AS total_amount,
                   round(avg(o_totalprice), 4) AS avg_price,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders GROUP BY 1, 2
        """,
        "latest_order_per_customer": """
            SELECT o_custkey AS custkey, o_orderkey AS latest_order,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
                   round(o_totalprice, 2) AS price
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn = 1
        """,
        "last_non_null_fold": """
            SELECT user_id, round(last_val, 4) AS last_val FROM (
                SELECT user_id,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS last_val,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM (SELECT user_id, ts, event_id,
                             CASE WHEN event_type = 'error' THEN NULL
                                  ELSE value END AS v
                      FROM events))
            WHERE rn = 1
        """,
        "bilingual_pair_join": """
            WITH ranked AS (
                SELECT source, lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source, lang
                                          ORDER BY doc_id) AS rk
                FROM documents WHERE lang IN ('en', 'zh'))
            SELECT a.source, a.rk,
                   a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   a.n_chars AS n_chars_a, b.n_chars AS n_chars_b
            FROM ranked a JOIN ranked b USING (source, rk)
            WHERE a.lang = 'en' AND b.lang = 'zh'
        """,
        "group_concat_customers": """
            SELECT c_nationkey,
                   string_agg(CAST(c_custkey AS VARCHAR), ','
                              ORDER BY CAST(c_custkey AS VARCHAR)) AS joined,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY c_nationkey
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey)
        """,
        "prefix_filter_parts": """
            SELECT p_type,
                   CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price
            FROM part WHERE p_name LIKE 's%' GROUP BY p_type
        """,
        "variant_title_lookup": """
            WITH titles AS (
                SELECT DISTINCT upper(p_name) AS title FROM part
                WHERE p_partkey % 7 = 0),
            dim AS (
                SELECT DISTINCT p_name AS page_title FROM part
                WHERE p_partkey % 3 = 0),
            raw AS (
                SELECT title, idx, v FROM titles, (VALUES (0), (1), (2), (3), (4), (5)) t(idx),
                LATERAL (SELECT CASE idx
                    WHEN 0 THEN trim(title)
                    WHEN 1 THEN upper(trim(title))
                    WHEN 2 THEN lower(trim(title))
                    WHEN 3 THEN regexp_replace(trim(title),
                        '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', '')
                    WHEN 4 THEN upper(regexp_replace(trim(title),
                        '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', ''))
                    ELSE lower(regexp_replace(trim(title),
                        '\\s*\\([IVXLCDM]+\\)$|\\s+[IVXLCDM]+$', ''))
                    END AS v) s),
            firsts AS (
                SELECT title, v, min(idx) AS midx FROM raw GROUP BY title, v),
            variants AS (
                SELECT title, v,
                       CAST(row_number() OVER (PARTITION BY title
                            ORDER BY midx) - 1 AS INT) AS variant_rank
                FROM firsts),
            hits AS (
                SELECT title, page_title, variant_rank,
                       row_number() OVER (PARTITION BY title
                                          ORDER BY variant_rank) AS rn
                FROM variants JOIN dim ON v = page_title)
            SELECT t.title, h.page_title, h.variant_rank
            FROM titles t LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h
            USING (title)
        """,
        "politeness_schedule": """
            WITH frontier AS (
                SELECT 'https://h' || (o_custkey % 40) || '.example.com/o/'
                       || o_orderkey AS url_canon,
                       'h' || (o_custkey % 40) || '.example.com' AS host,
                       CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority,
                       o_orderdate AS discovered_ts
                FROM orders)
            SELECT host, CAST(host_rank AS INT) AS host_rank, url_canon FROM (
                SELECT *, row_number() OVER (PARTITION BY host
                    ORDER BY priority, discovered_ts, url_canon) AS host_rank
                FROM frontier)
            WHERE host_rank <= 5
        """,
        "url_canonicalize": """
            SELECT doc_id,
                   'https://host' || (doc_id % 20) || '.example.com/path/'
                   || doc_id ||
                   CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                        WHEN doc_id % 3 = 1 THEN '?a=1'
                        ELSE '' END AS url_canon,
                   'host' || (doc_id % 20) || '.example.com' AS host
            FROM documents
        """,
        "topk_orders_per_customer": """
            SELECT o_custkey AS custkey, CAST(rnk AS INT) AS rnk,
                   o_orderkey AS orderkey, round(o_totalprice, 2) AS price
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                  FROM orders)
            WHERE rnk <= 3
        """,
        "nested_json_explode": """
            SELECT o_orderkey AS order_id, o_orderstatus AS status,
                   round(o_totalprice, 2) AS total,
                   l_linenumber AS line_no,
                   round(l_quantity, 2) AS qty,
                   strftime(l_shipdate, '%Y-%m-%d') AS ship_date
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "cube_order_stats": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "sessionize_events": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS newf
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sessions AS (
                SELECT user_id, ts,
                       sum(newf) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_seq
                FROM flagged)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sessions GROUP BY user_id, session_seq
        """,
        "tumbling_counts": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS win_ts,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "corpus_lang_profile": f"""
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_distinct,
                   CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
                   round(avg(len({_TOKS})), 4) AS avg_tokens
            FROM documents GROUP BY lang
        """,
        "ngram_jaccard_pairs": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
                   FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
            sh AS (SELECT doc_id, s FROM sh0
                   QUALIFY count(*) OVER (PARTITION BY s) <= 50),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            co AS (SELECT l.doc_id AS a, r.doc_id AS b,
                          CAST(count(*) AS BIGINT) AS inter
                   FROM sh l JOIN sh r USING (s) WHERE l.doc_id < r.doc_id
                   GROUP BY 1, 2)
            SELECT a, b, round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
            FROM co JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
        """,
        "ngram_containment_pairs": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
                   FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
            sh AS (SELECT doc_id, s FROM sh0
                   QUALIFY count(*) OVER (PARTITION BY s) <= 50),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                   FROM sh l JOIN sh r USING (s) WHERE l.doc_id < r.doc_id
                   GROUP BY 1, 2),
            dirs AS (
                SELECT a AS src, b AS dst,
                       round(inter * 1.0 / sa.n, 6) AS containment
                FROM co JOIN sz sa ON sa.doc_id = a
                UNION ALL
                SELECT b AS src, a AS dst,
                       round(inter * 1.0 / sb.n, 6) AS containment
                FROM co JOIN sz sb ON sb.doc_id = b)
            SELECT src, dst, containment FROM dirs
            WHERE containment >= 0.6
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
                   FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
            sh AS (SELECT doc_id, s FROM sh0
                   QUALIFY count(*) OVER (PARTITION BY s) <= 50),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            co AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                   FROM sh l JOIN sh r USING (s) WHERE l.doc_id < r.doc_id
                   GROUP BY 1, 2),
            pairs AS (
                SELECT a, b FROM co
                JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
                WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
            edges AS (SELECT a AS s, b AS d FROM pairs
                      UNION SELECT b, a FROM pairs),
            reach AS (
                SELECT s AS n, d AS m FROM edges
                UNION
                SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s),
            lbl AS (SELECT n, min(m) AS mn FROM reach GROUP BY n)
            SELECT d.doc_id,
                   CAST(coalesce(least(l.n, l.mn), d.doc_id) AS BIGINT)
                       AS cluster_id,
                   CAST(coalesce(least(l.n, l.mn), d.doc_id) = d.doc_id
                        AS INT) AS is_canonical
            FROM documents d LEFT JOIN lbl l ON l.n = d.doc_id
        """,
        "drop_dup_filters": f"""
            SELECT 'exact' AS method, doc_id, lang, source, n_chars FROM (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (PARTITION BY md5({_NORM})
                                          ORDER BY doc_id) AS _rn
                FROM documents)
            WHERE _rn = 1
            UNION ALL
            SELECT 'near' AS method, doc_id, lang, source, n_chars
            FROM ({_NEAR_DROP_SQL})
            UNION ALL
            SELECT 'substring' AS method, doc_id, lang, source, n_chars
            FROM ({_SPAN_DROP_SQL})
        """,
        # stratified md5 sampling + per-bucket offset packing: membership and
        # bin assignment are decided by the same md5/window expressions in
        # both engines, so the twin is bit-exact (operators/sampling.py,
        # operators/packing.py)
        "sample_pack_corpus": """
            WITH samp AS (
                SELECT doc_id, lang, n_chars
                FROM documents
                WHERE substr(md5(concat_ws(chr(31), 'r3',
                                           CAST(doc_id AS VARCHAR))), 1, 8)
                      < CASE lang WHEN 'en' THEN '80000000'
                                  WHEN 'zh' THEN '59999999'
                                  ELSE '33333333' END
            )
            SELECT doc_id, lang,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
                   CAST(floor(
                       (sum(n_chars) OVER (
                            PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_chars) / 20000.0) AS BIGINT) AS bin_id,
                   n_chars
            FROM samp
        """,
        "lang_confusion": """
            SELECT lang,
                   CASE
                     WHEN (length(lower(text)) - length(regexp_replace(
                         lower(text), '[\\x{4e00}-\\x{9fff}]', '', 'g')))
                         * 1.0 / greatest(length(lower(text)), 1) > 0.05
                       THEN 'zh'
                     WHEN length(lower(text)) != length(regexp_replace(
                         lower(text), '[äöüß]', '', 'g')) THEN 'de'
                     WHEN length(lower(text)) != length(regexp_replace(
                         lower(text), '[éèêëàâçù]', '', 'g')) THEN 'fr'
                     WHEN length(lower(text)) != length(regexp_replace(
                         lower(text), '[ñ¡¿áíóú]', '', 'g')) THEN 'es'
                     ELSE 'en'
                   END AS pred_lang,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        """,
        "quality_by_source": f"""
            WITH prof AS (
                SELECT source,
                       len({_TOKS}) AS n_tokens,
                       len(list_filter({_TOKS}, x -> x IN
                           ('the','a','of','and','to','in','is','for')))
                           AS n_stop,
                       length(text) - length(regexp_replace(text,
                           '[.,;:!?''"()-]', '', 'g')) AS n_punct,
                       length(text) AS n_chars
                FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(round(
                       0.4 * least(n_tokens / 100.0, 1.0)
                     + 0.3 * least(n_stop * 5.0 / greatest(n_tokens, 1), 1.0)
                     + 0.3 * (1.0 - least(n_punct * 10.0
                                          / greatest(n_chars, 1), 1.0)), 6)),
                       6) AS avg_quality,
                   round(avg(n_tokens), 4) AS avg_tokens,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM prof GROUP BY source
        """,
        "doc_fingerprints": f"""
            SELECT doc_id, md5({_NORM}) AS fp FROM documents
        """,
        "ann_topk_cosine": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qe FROM e WHERE vec_id % 25 = 0),
            scored AS (
                SELECT q.qid, e.vec_id AS nid,
                       round(list_dot_product(q.qe, e.v) /
                             (sqrt(list_dot_product(q.qe, q.qe)) *
                              sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
                FROM q CROSS JOIN e WHERE e.vec_id <> q.qid)
            SELECT qid, nid, cos_sim, CAST(rnk AS INT) AS rnk FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY cos_sim DESC, nid) AS rnk FROM scored)
            WHERE rnk <= 5
        """,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id % 5 = 0)
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v)) *
                          sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
            FROM e a JOIN e b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) /
                  (sqrt(list_dot_product(a.v, a.v)) *
                   sqrt(list_dot_product(b.v, b.v))) >= 0.4
        """,
        "cookie_str_to_map": """
            WITH c AS (
                SELECT doc_id,
                       'sid=' || doc_id || '; lang=' || lang ||
                       '; src=' || source AS cookie
                FROM documents),
            kv AS (
                SELECT doc_id, unnest(string_split(cookie, '; ')) AS pair
                FROM c)
            SELECT doc_id,
                   split_part(pair, '=', 1) AS k,
                   split_part(pair, '=', 2) AS v
            FROM kv
        """,
        "wiki_section_concat": """
            SELECT doc_id,
                   'S' || doc_id AS sec_title,
                   text || chr(10) || upper(substr(text, 1, 40)) ||
                   chr(10) || lower(substr(text, 1, 30)) AS full_text
            FROM documents
        """,
        "asof_join_events": """
            WITH clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
            p AS (
                SELECT user_id, ts, max(value) AS purchase_value
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT c.event_id, c.user_id,
                   strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   round(p.purchase_value, 4) AS purchase_value
            FROM clicks c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "star_estates": _STAR_SQL["estates"],
        "star_geo_dims": _union_sql(
            ("regions", "region_id", "region_name_zh", "region_name_en",
             "CAST(NULL AS VARCHAR)"),
            ("subregions", "subregion_id", "subregion_name_zh",
             "subregion_name_en", "region_id"),
            ("districts", "district_id", "district_name_zh",
             "district_name_en", "subregion_id"),
            cols=("id", "name_zh", "name_en", "parent_id"),
        ),
        "star_facility_links": _union_sql(
            ("facilities", "facility_id", "CAST(NULL AS VARCHAR)",
             "facility_name_zh", "facility_name_en"),
            ("estate_facilities", "facility_id", "estate_id",
             "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"),
            ("estate_school_nets", "school_net_id", "estate_id",
             "school_net_name_zh", "school_net_name_en"),
            ("estate_mtr_lines", "CAST(NULL AS VARCHAR)", "estate_id",
             "mtr_line_name_zh", "mtr_line_name_en"),
            cols=("id", "estate_id", "name_zh", "name_en"),
        ),
        "star_structures": _union_sql(
            ("phases", "phase_id", "phase_name_zh", "phase_name_en",
             "estate_id", "CAST(NULL AS VARCHAR)"),
            ("buildings", "building_id", "building_name_zh",
             "building_name_en", "estate_id", "phase_id"),
            cols=("id", "name_zh", "name_en", "estate_id", "phase_fk"),
        ),
        "star_monthly_market": _STAR_SQL["estate_monthly_market_info"],
        "star_units": _STAR_SQL["units"],
        "star_unit_features": _STAR_SQL["unit_features"],
        "star_transactions": _STAR_SQL["transactions"],
        "star_price_trend": f"""
            WITH li AS ({_LI_DEDUP}),
            txs AS (
                SELECT o_custkey, round(l_extendedprice, 2) AS price,
                       l_shipdate AS tx_date
                FROM li JOIN orders ON l_orderkey = o_orderkey
                UNION ALL
                SELECT o_custkey, round(l_extendedprice * 1.05, 4),
                       l_shipdate + to_days(CAST(11 + l_linenumber AS INT))
                FROM li JOIN orders ON l_orderkey = o_orderkey
                WHERE l_suppkey % 2 = 0)
            SELECT 'D' || c_nationkey || '_' || (c_custkey % 5) AS district_id,
                   CAST(year(tx_date) AS INT) AS tx_year,
                   CAST(count(*) AS BIGINT) AS n_tx,
                   round(sum(price), 4) AS total_price
            FROM txs JOIN customer ON o_custkey = c_custkey
            WHERE c_custkey % 11 <> 0
            GROUP BY 1, 2
        """,
        "robots_txt_parse": """
            SELECT 'h' || doc_id || '.example.com' AS host,
                   CASE WHEN doc_id % 6 = 1 THEN 0 ELSE 1 END AS allow,
                   CASE WHEN doc_id % 6 = 2 THEN '/listing/'
                        WHEN doc_id % 6 = 5 THEN '/pub/' ELSE '' END
                       AS path_prefix,
                   CAST(CASE WHEN doc_id % 6 = 2 THEN 2000
                             WHEN doc_id % 6 = 3 THEN 500
                             WHEN doc_id % 6 = 5 THEN 4000
                             ELSE 100 END AS INT) AS crawl_delay_ms
            FROM documents
        """,
        "wiki_page_gate": """
            WITH pages AS (
                SELECT doc_id, 'Page ' || doc_id AS title,
                       list_filter([
                           '屋苑',
                           CASE WHEN doc_id % 4 <> 0 THEN '香港地方' END,
                           CASE WHEN doc_id % 7 = 0 THEN '消歧義頁面' END
                       ], x -> x IS NOT NULL) AS cats,
                       CASE WHEN doc_id % 5 <> 0 THEN '香港 ' || text
                            ELSE text END AS body
                FROM documents)
            SELECT doc_id, title, CAST(len(cats) AS INT) AS n_cats
            FROM pages
            WHERE len(list_filter(cats, c -> contains(c, '消歧義'))) = 0
              AND contains(body, '香港')
        """,
        # wiki_table_expand's synthetic wikitext is one fixed template per
        # document, so the colspan/rowspan expansion + CSV render has a
        # closed form the oracle can state directly.
        "wiki_table_expand": """
            SELECT doc_id, CAST(0 AS INT) AS table_index,
                   CAST(3 AS INT) AS n_rows, CAST(3 AS INT) AS n_cols,
                   'Doc,Stats,Stats' || chr(10) ||
                   'd' || doc_id || ',' || lang || ',' || n_chars || chr(10) ||
                   'd' || doc_id || ',lang=' || lang || ',src=' || source AS csv
            FROM documents
        """,
        "multimodal_probe": """
            WITH f AS (
                SELECT doc_id, text, length(text) AS L, k
                FROM documents, (VALUES (0), (1), (2), (3)) t(k))
            SELECT 'meta' AS tbl, doc_id, CAST(NULL AS INT) AS idx,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS label,
                   CAST(octet_length(encode(text)) % 1920 + 16 AS INT) AS w,
                   CAST(octet_length(encode(text)) * 7 % 1080 + 16 AS INT)
                       AS h,
                   md5(text) AS checksum
            FROM documents
            UNION ALL
            SELECT 'frames' AS tbl, doc_id, CAST(k AS INT) AS idx,
                   CAST(octet_length(encode(substr(text,
                        CAST(k * L // 4 + 1 AS INT),
                        CAST((k + 1) * L // 4 - k * L // 4 AS INT))))
                        AS BIGINT) AS n_bytes,
                   CAST(NULL AS VARCHAR) AS label,
                   CAST(NULL AS INT) AS w, CAST(NULL AS INT) AS h,
                   md5(substr(text,
                        CAST(k * L // 4 + 1 AS INT),
                        CAST((k + 1) * L // 4 - k * L // 4 AS INT)))
                       AS checksum
            FROM f
        """,
        # the bigram-LM fit (even docs) + score (odd docs), the same
        # relational algebra as operators/lm_quality.py — per-doc values
        # also parity-tested at rel 1e-9 in tests/test_lm_quality.py
        "lm_perplexity_quality": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                   FROM d, unnest(generate_series(1, len(t) - 1)) AS g(i)
                   WHERE len(t) >= 2),
            ref_bg AS (SELECT w1, w2, count(*) AS c12 FROM bg
                       WHERE doc_id % 2 = 0 GROUP BY 1, 2),
            ref_u AS (SELECT w1, count(*) AS c1 FROM
                        (SELECT doc_id, unnest(t) AS w1 FROM d)
                      WHERE doc_id % 2 = 0 GROUP BY 1),
            v AS (SELECT count(*) AS v FROM ref_u),
            sc AS (
                SELECT b.doc_id,
                       CASE WHEN u.c1 IS NULL THEN ln(1.0 / v.v)
                            ELSE ln((coalesce(r.c12, 0) + 0.5)
                                    / (u.c1 + 0.5 * v.v)) END AS lp
                FROM bg b
                LEFT JOIN ref_bg r USING (w1, w2)
                LEFT JOIN ref_u u USING (w1)
                CROSS JOIN v
                WHERE b.doc_id % 2 = 1)
            SELECT o.doc_id, a.n_bigrams, a.avg_logp, a.perplexity
            FROM (SELECT doc_id FROM d WHERE doc_id % 2 = 1) o
            LEFT JOIN (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       round(avg(lp), 6) AS avg_logp,
                       round(exp(-avg(lp)), 6) AS perplexity
                FROM sc GROUP BY doc_id) a USING (doc_id)
        """,
        # chunk_documents: the sentence-aware chunk loop as a
        # recursive CTE (template shared with the composed EP2/EP3
        # pipeline oracles)
        "chunk_documents": _chunk_cte_sql(
            "SELECT doc_id, text FROM documents"
        ),
        "search_similar": _SEARCH_SIMILAR_SQL,
        "wiki_pipeline_docs": _WIKI_DOCS_SQL.format(
            chunk_cte=_chunk_cte_sql("SELECT title, text FROM docs", "title")
        ),
    }
    # The composed LSH dedup must land on the SAME survivor set as the
    # exact path — candidate verification makes precision exact and the
    # band design makes recall 1 on this corpus, so one twin serves both.
    d["lsh_dedup_drop"] = _NEAR_DROP_SQL
    # The composed funnel (exact-dedup recipe), end-to-end hash-checked
    d["prepare_corpus"] = _prepare_corpus_sql()
    # Gopher repetition battery: outside the driver's 50-entry window
    # (rows-only there) but fully oracle-backed — tools/check_oracles.py
    # verifies rows+schema+hash locally like any window entry.
    # Interpolated Kneser–Ney: the full fit (type/context/continuation
    # counts, n1/(n1+2·n2) discount) + scoring replayed relationally.
    d["kn_perplexity"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM d, unnest(generate_series(1, len(t) - 1)) AS g(i)
               WHERE len(t) >= 2),
        ty AS (SELECT w1, w2, count(*) AS c12 FROM bg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1w1
                FROM ty GROUP BY 1),
        cont AS (SELECT w2, count(*) AS n1w2 FROM ty GROUP BY 1),
        sc0 AS (SELECT count(*) AS t,
                       sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
                       sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
                FROM ty),
        sc1 AS (SELECT t, CASE WHEN n1 + 2.0 * n2 > 0
                               THEN CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2)
                               ELSE 0.5 END AS d
                FROM sc0),
        v AS (SELECT count(DISTINCT w1) AS v FROM
                (SELECT unnest(t) AS w1 FROM d WHERE doc_id % 2 = 0)),
        sc AS (
            SELECT b.doc_id,
                   CASE WHEN c.c1 IS NULL
                        THEN ln((coalesce(n.n1w2, 0) + 0.5)
                                / (s.t + 0.5 * v.v))
                        ELSE ln(
                          greatest(coalesce(y.c12, 0) - s.d, 0.0) / c.c1
                          + (s.d * c.n1w1 / c.c1)
                            * ((coalesce(n.n1w2, 0) + 0.5)
                               / (s.t + 0.5 * v.v)))
                   END AS lp
            FROM bg b
            LEFT JOIN ty y USING (w1, w2)
            LEFT JOIN ctx c USING (w1)
            LEFT JOIN cont n USING (w2)
            CROSS JOIN sc1 s CROSS JOIN v
            WHERE b.doc_id % 2 = 1)
        SELECT o.doc_id, a.n_bigrams, a.avg_logp, a.perplexity
        FROM (SELECT doc_id FROM d WHERE doc_id % 2 = 1) o
        LEFT JOIN (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(avg(lp), 6) AS avg_logp,
                   round(exp(-avg(lp)), 6) AS perplexity
            FROM sc GROUP BY doc_id) a USING (doc_id)
    """
    # Trigram KN: the count pyramid + two discount estimates + the
    # three-level backoff chain replayed relationally.
    d["kn3_perplexity"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        tg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
               FROM d, unnest(generate_series(1, len(t) - 2)) AS g(i)
               WHERE len(t) >= 3),
        ty AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
        ctx12 AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n3
                  FROM ty GROUP BY 1, 2),
        mid AS (SELECT w2, w3, count(*) AS m23 FROM ty GROUP BY 1, 2),
        ctx2 AS (SELECT w2, sum(m23) AS m2, count(*) AS n3c
                 FROM mid GROUP BY 1),
        uni AS (SELECT w3, count(*) AS u3 FROM mid GROUP BY 1),
        s3 AS (SELECT CAST(sum(CASE WHEN c123 = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS n1,
                      sum(CASE WHEN c123 = 2 THEN 1 ELSE 0 END) AS n2
               FROM ty),
        sm AS (SELECT count(*) AS tm,
                      CAST(sum(CASE WHEN m23 = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS n1,
                      sum(CASE WHEN m23 = 2 THEN 1 ELSE 0 END) AS n2
               FROM mid),
        sc0 AS (SELECT CASE WHEN s3.n1 + 2.0 * s3.n2 > 0
                            THEN s3.n1 / (s3.n1 + 2.0 * s3.n2)
                            ELSE 0.5 END AS d3,
                       CASE WHEN sm.n1 + 2.0 * sm.n2 > 0
                            THEN sm.n1 / (sm.n1 + 2.0 * sm.n2)
                            ELSE 0.5 END AS d2,
                       sm.tm AS tm
                FROM s3, sm),
        v AS (SELECT count(DISTINCT w) AS v FROM
                (SELECT unnest(t) AS w FROM d WHERE doc_id % 2 = 0)),
        sc AS (
            SELECT b.doc_id,
                   ln(CASE WHEN c.c12 IS NULL THEN
                        CASE WHEN x.m2 IS NULL
                             THEN (coalesce(u.u3, 0) + 0.5)
                                  / (s.tm + 0.5 * v.v)
                             ELSE greatest(coalesce(md.m23, 0) - s.d2, 0.0)
                                  / x.m2
                                + (s.d2 * x.n3c / x.m2)
                                  * ((coalesce(u.u3, 0) + 0.5)
                                     / (s.tm + 0.5 * v.v)) END
                      ELSE
                        greatest(coalesce(y.c123, 0) - s.d3, 0.0) / c.c12
                        + (s.d3 * c.n3 / c.c12)
                          * (CASE WHEN x.m2 IS NULL
                               THEN (coalesce(u.u3, 0) + 0.5)
                                    / (s.tm + 0.5 * v.v)
                               ELSE greatest(coalesce(md.m23, 0) - s.d2,
                                             0.0) / x.m2
                                  + (s.d2 * x.n3c / x.m2)
                                    * ((coalesce(u.u3, 0) + 0.5)
                                       / (s.tm + 0.5 * v.v)) END)
                      END) AS lp
            FROM tg b
            LEFT JOIN ty y USING (w1, w2, w3)
            LEFT JOIN ctx12 c USING (w1, w2)
            LEFT JOIN mid md USING (w2, w3)
            LEFT JOIN ctx2 x USING (w2)
            LEFT JOIN uni u USING (w3)
            CROSS JOIN sc0 s CROSS JOIN v
            WHERE b.doc_id % 2 = 1)
        SELECT o.doc_id, a.n_trigrams, a.avg_logp, a.perplexity
        FROM (SELECT doc_id FROM d WHERE doc_id % 2 = 1) o
        LEFT JOIN (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                   round(avg(lp), 6) AS avg_logp,
                   round(exp(-avg(lp)), 6) AS perplexity
            FROM sc GROUP BY doc_id) a USING (doc_id)
    """
    # Sentence-level code-switch: the NB model at sentence granularity,
    # stitched probes, adjacency switches and dominant-lang rollup.
    d["sentence_code_switch"] = f"""
        WITH d AS (SELECT doc_id, lang, text, {_NORM} AS t FROM documents),
        dg AS (SELECT doc_id, lang, substr(t, i, 3) AS gram
               FROM d, unnest(generate_series(1, len(t) - 2)) AS g(i)
               WHERE len(t) >= 3),
        ty AS (SELECT gram, lang, count(*) AS c FROM dg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        gsz AS (SELECT count(DISTINCT gram) AS g FROM ty),
        tot AS (SELECT lang, sum(c) AS tot FROM ty GROUP BY 1),
        pri AS (SELECT lang, count(*) AS n_docs FROM d
                WHERE doc_id % 2 = 0 GROUP BY 1),
        prit AS (SELECT sum(n_docs) AS n FROM pri),
        langs AS (SELECT p.lang, coalesce(t.tot, 0) AS tot,
                         ln(CAST(p.n_docs AS DOUBLE) / prit.n) AS prior_ln,
                         ln(1.0 / (coalesce(t.tot, 0) + 1.0 * gsz.g))
                             AS floor_ln
                  FROM pri p LEFT JOIN tot t USING (lang)
                  CROSS JOIN prit CROSS JOIN gsz),
        oddd AS (SELECT doc_id, substr(text, 1, 120) AS s1,
                        coalesce(lead(substr(text, 1, 120))
                                     OVER (ORDER BY doc_id),
                                 substr(text, 1, 120)) AS s2
                 FROM d WHERE doc_id % 2 = 1),
        probes AS (SELECT doc_id,
                          {_norm_sql("s1 || '. ' || s2 || '. ' || s1")}
                              AS t
                   FROM oddd),
        raw AS (SELECT doc_id, i, trim(s[i]) AS sent
                FROM (SELECT doc_id,
                             string_split_regex(t, '[.!?。！？]+') AS s
                      FROM probes),
                     unnest(generate_series(1, len(s))) AS g(i)
                WHERE trim(s[i]) <> ''),
        sents AS (SELECT doc_id,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY i) - 1 AS sidx,
                         sent
                  FROM raw),
        sg AS (SELECT doc_id, sidx, substr(sent, i, 3) AS gram
               FROM sents, unnest(generate_series(1, len(sent) - 2))
                   AS g(i)
               WHERE len(sent) >= 3),
        ng AS (SELECT doc_id, sidx, greatest(len(sent) - 2, 0) AS n_grams
               FROM sents),
        mt AS (SELECT m.doc_id, m.sidx, y.lang,
                      sum(ln((y.c + 1.0) / (o.tot + 1.0 * gsz.g))) AS s,
                      count(*) AS m
               FROM sg m JOIN ty y USING (gram)
               JOIN tot o ON y.lang = o.lang CROSS JOIN gsz
               GROUP BY 1, 2, 3),
        sc AS (SELECT b.doc_id, b.sidx, l.lang,
                      l.prior_ln + coalesce(mt.s, 0.0)
                      + (b.n_grams - coalesce(mt.m, 0)) * l.floor_ln
                          AS score
               FROM ng b CROSS JOIN langs l
               LEFT JOIN mt ON mt.doc_id = b.doc_id
                           AND mt.sidx = b.sidx AND mt.lang = l.lang),
        pr AS (SELECT doc_id, sidx, lang AS pred FROM (
                   SELECT *, row_number() OVER (
                       PARTITION BY doc_id, sidx
                       ORDER BY round(score, 6) DESC, lang) AS rn
                   FROM sc) WHERE rn = 1),
        fl AS (SELECT doc_id, sidx, pred,
                      CASE WHEN lag(pred) OVER (PARTITION BY doc_id
                               ORDER BY sidx) IS NOT NULL
                            AND lag(pred) OVER (PARTITION BY doc_id
                               ORDER BY sidx) <> pred
                           THEN 1 ELSE 0 END AS sw
               FROM pr),
        dom AS (SELECT doc_id, pred AS dominant_lang FROM (
                    SELECT doc_id, pred, count(*) AS n,
                           row_number() OVER (PARTITION BY doc_id
                               ORDER BY count(*) DESC, pred) AS rd
                    FROM fl GROUP BY doc_id, pred)
                WHERE rd = 1),
        ru AS (SELECT doc_id, count(*) AS n_sentences,
                      count(DISTINCT pred) AS n_langs,
                      sum(sw) AS n_switches
               FROM fl GROUP BY doc_id)
        SELECT o.doc_id,
               CAST(coalesce(ru.n_sentences, 0) AS BIGINT) AS n_sentences,
               CAST(coalesce(ru.n_langs, 0) AS BIGINT) AS n_langs,
               CAST(coalesce(ru.n_switches, 0) AS BIGINT) AS n_switches,
               dom.dominant_lang
        FROM oddd o LEFT JOIN ru USING (doc_id)
        LEFT JOIN dom USING (doc_id)
    """
    d["host_fairness"] = """
        WITH per AS (
            SELECT source || '/' || lang AS k, sum(n_chars) AS x
            FROM documents GROUP BY 1),
        ranked AS (
            SELECT k, x, row_number() OVER (ORDER BY x ASC, k ASC) AS i,
                   row_number() OVER (ORDER BY x DESC, k ASC) AS r
            FROM per),
        agg AS (SELECT max(i) AS n_keys, sum(x) AS total,
                       sum(i * CAST(x AS DOUBLE)) AS ix,
                       sum(CASE WHEN r <= 1 THEN x ELSE 0 END) AS t1,
                       sum(CASE WHEN r <= 10 THEN x ELSE 0 END) AS t10
                FROM ranked)
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               CAST(total AS BIGINT) AS total,
               round((2.0 * ix) / (CAST(n_keys AS DOUBLE) * total)
                     - (n_keys + 1.0) / n_keys, 6) AS gini,
               round(CAST(t1 AS DOUBLE) / total, 6) AS top1_share,
               round(CAST(t10 AS DOUBLE) / total, 6) AS top10_share
        FROM agg
    """
    d["winnow_overlaps"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
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
                -- MOSS short-doc fallback: >=1 k-gram but fewer than w
                -- windows -> the single min over all k-gram hashes
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
    d["format_profile"] = """
        WITH probes AS (
            SELECT doc_id,
                   substr(text, 1, 60) || chr(10) ||
                   '- ' || substr(text, 61, 60) || chr(10) ||
                   substr(text, 121, 60) || ';' || chr(10) ||
                   'a | b | ' || substr(text, 181, 20) AS t
            FROM documents),
        ln AS (SELECT doc_id,
                      list_filter(list_transform(string_split(t, chr(10)),
                          x -> trim(x)), x -> x <> '') AS ls
               FROM probes)
        SELECT doc_id,
               CAST(len(ls) AS INT) AS n_lines,
               CASE WHEN len(ls) > 0 THEN round(
                   CAST(len(list_filter(ls, l -> regexp_matches(l,
                       '[{};]|=>|\\bdef\\b|\\bvoid\\b'))) AS DOUBLE)
                   / len(ls), 6) END AS code_frac,
               CASE WHEN len(ls) > 0 THEN round(
                   CAST(len(list_filter(ls, l ->
                       length(l) - length(replace(l, '|', '')) >= 2
                       OR length(l) - length(replace(l, chr(9), '')) >= 2))
                       AS DOUBLE) / len(ls), 6) END AS table_frac,
               CASE WHEN len(ls) > 0 THEN round(
                   CAST(len(list_filter(ls, l -> regexp_matches(l,
                       '^([-*\u2022]|[0-9]+[.)]) '))) AS DOUBLE)
                   / len(ls), 6) END AS bullet_frac
        FROM ln
    """
    from hk_housing_datahub_spark.functions.text import (
        CONFUSABLE_DST as _CF_DST,
        CONFUSABLE_SRC as _CF_SRC,
    )

    d["confusable_dedup"] = f"""
        WITH base AS (SELECT doc_id, text FROM documents),
        spoof AS (SELECT doc_id + 1000000 AS doc_id,
                         translate(text, 'aeopcyx', 'аеорсух') AS text
                  FROM base WHERE doc_id % 5 = 0),
        allrows AS (SELECT * FROM base UNION ALL SELECT * FROM spoof),
        keyed AS (SELECT doc_id,
                         md5({_norm_sql(f"translate(text, '{_CF_SRC}', '{_CF_DST}')")})
                             AS fp
                  FROM allrows)
        SELECT doc_id, fp FROM (
            SELECT doc_id, fp, row_number() OVER (
                PARTITION BY fp ORDER BY doc_id) AS rn
            FROM keyed)
        WHERE rn = 1
    """
    d["novelty_scores"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        ref AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS sh
                FROM d, unnest(generate_series(1, len(t) - 7)) AS g(i)
                WHERE doc_id % 2 = 0 AND len(t) >= 8),
        ex AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS sh
               FROM d, unnest(generate_series(1, len(t) - 7)) AS g(i)
               WHERE doc_id % 2 = 1 AND len(t) >= 8),
        per AS (SELECT e.doc_id,
                       CAST(count(*) AS BIGINT) AS n_ngrams,
                       CAST(sum(CASE WHEN r.sh IS NOT NULL THEN 1
                                ELSE 0 END) AS BIGINT) AS n_known
                FROM ex e LEFT JOIN ref r USING (sh)
                GROUP BY 1)
        SELECT o.doc_id, per.n_ngrams, per.n_known,
               round(1.0 - CAST(per.n_known AS DOUBLE) / per.n_ngrams, 6)
                   AS novelty
        FROM (SELECT doc_id FROM d WHERE doc_id % 2 = 1) o
        LEFT JOIN per USING (doc_id)
    """
    d["bm25f_search"] = """
        WITH base AS (SELECT doc_id, text FROM documents),
        fl AS (SELECT doc_id, 'title' AS f, substr(text, 1, 40) AS text
               FROM base
               UNION ALL
               SELECT doc_id, 'body', text FROM base),
        toks AS (SELECT doc_id, f, t AS term FROM (
                     SELECT doc_id, f, unnest(string_split_regex(
                         lower(text), '[^a-z0-9]+')) AS t FROM fl)
                 WHERE t <> ''),
        tf AS (SELECT doc_id, term,
                      sum(CASE WHEN f = 'body' THEN 1 ELSE 0 END) AS tf_0,
                      sum(CASE WHEN f = 'title' THEN 1 ELSE 0 END) AS tf_1
               FROM toks GROUP BY 1, 2),
        dld AS (SELECT doc_id,
                       sum(CASE WHEN f = 'body' THEN 1 ELSE 0 END) AS dl_0,
                       sum(CASE WHEN f = 'title' THEN 1 ELSE 0 END) AS dl_1
                FROM toks GROUP BY 1),
        st AS (SELECT count(*) AS n,
                      CAST(sum(dl_0) AS DOUBLE) / count(*) AS avg_0,
                      CAST(sum(dl_1) AS DOUBLE) / count(*) AS avg_1
               FROM dld),
        tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        q AS (SELECT * FROM (VALUES
                  (0, 'table merge join'),
                  (1, 'slow scan batch window')) v(qid, qtext)),
        qt AS (SELECT DISTINCT qid, t AS term FROM (
                   SELECT qid, unnest(string_split_regex(lower(qtext),
                       '[^a-z0-9]+')) AS t FROM q)
               WHERE t <> ''),
        per AS (SELECT qt.qid, tf.doc_id, tf.term,
                       ln(1.0 + (st.n - tdf.df + 0.5) / (tdf.df + 0.5))
                       * (1.0 * tf.tf_0 / (0.25 + 0.75 * dld.dl_0 / st.avg_0)
                          + 2.5 * tf.tf_1
                            / (0.25 + 0.75 * dld.dl_1 / st.avg_1))
                       / (1.2
                          + (1.0 * tf.tf_0
                               / (0.25 + 0.75 * dld.dl_0 / st.avg_0)
                             + 2.5 * tf.tf_1
                               / (0.25 + 0.75 * dld.dl_1 / st.avg_1)))
                           AS s
                FROM qt JOIN tf USING (term)
                JOIN dld ON dld.doc_id = tf.doc_id
                JOIN tdf ON tdf.term = tf.term
                CROSS JOIN st),
        folded AS (SELECT qid, doc_id,
                          CAST(list_reduce(list(s ORDER BY term),
                                           (x, y) -> x + y) AS DOUBLE)
                              AS score
                   FROM per GROUP BY qid, doc_id)
        SELECT qid, doc_id, round(score, 6) AS score,
               CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, doc_id) AS rank
            FROM folded)
        WHERE rank <= 5
    """
    d["coherence_scores"] = f"""
        WITH d AS (SELECT doc_id, text FROM documents),
        oddd AS (SELECT doc_id, substr(text, 1, 120) AS s1,
                        coalesce(lead(substr(text, 1, 120))
                                     OVER (ORDER BY doc_id),
                                 substr(text, 1, 120)) AS s2
                 FROM d WHERE doc_id % 2 = 1),
        probes AS (SELECT doc_id,
                          {_norm_sql("s1 || '. ' || s2 || '. ' || s1")}
                              AS t
                   FROM oddd),
        raw AS (SELECT doc_id, i, trim(s[i]) AS sent
                FROM (SELECT doc_id,
                             string_split_regex(t, '[.!?。！？]+') AS s
                      FROM probes),
                     unnest(generate_series(1, len(s))) AS g(i)
                WHERE trim(s[i]) <> ''),
        sents AS (SELECT doc_id,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY i) AS sidx,
                         list_distinct(string_split(sent, ' ')) AS ts
                  FROM raw),
        pairs AS (SELECT a.doc_id, a.sidx,
                         CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.ts, b.ts)))
                             AS j
                  FROM sents a JOIN sents b
                    ON a.doc_id = b.doc_id AND b.sidx = a.sidx + 1),
        agg AS (SELECT doc_id,
                       CAST(list_reduce(list(j ORDER BY sidx),
                                        (x, y) -> x + y) AS DOUBLE)
                           / count(*) AS mean_j,
                       min(j) AS min_j,
                       count(*) AS n_pairs
                FROM pairs GROUP BY doc_id),
        ns AS (SELECT doc_id, count(*) AS n_sentences
               FROM sents GROUP BY doc_id)
        SELECT o.doc_id,
               CAST(coalesce(ns.n_sentences, 0) AS INT) AS n_sentences,
               round(agg.mean_j, 6) AS mean_coherence,
               round(agg.min_j, 6) AS min_coherence
        FROM oddd o LEFT JOIN ns USING (doc_id)
        LEFT JOIN agg USING (doc_id)
    """
    # Trained NB langid: training + inference replayed relationally;
    # argmax on round(score,6) DESC, lang ASC on both engines.
    d["nb_langid_confusion"] = f"""
        WITH d AS (SELECT doc_id, lang, {_NORM} AS t FROM documents),
        dg AS (SELECT doc_id, lang, substr(t, i, 3) AS gram
               FROM d, unnest(generate_series(1, len(t) - 2)) AS g(i)
               WHERE len(t) >= 3),
        ty AS (SELECT gram, lang, count(*) AS c FROM dg
               WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        gsz AS (SELECT count(DISTINCT gram) AS g FROM ty),
        tot AS (SELECT lang, sum(c) AS tot FROM ty GROUP BY 1),
        pri AS (SELECT lang, count(*) AS n_docs FROM d
                WHERE doc_id % 2 = 0 GROUP BY 1),
        prit AS (SELECT sum(n_docs) AS n FROM pri),
        langs AS (SELECT p.lang, coalesce(t.tot, 0) AS tot,
                         ln(CAST(p.n_docs AS DOUBLE) / prit.n) AS prior_ln,
                         ln(1.0 / (coalesce(t.tot, 0) + 1.0 * gsz.g))
                             AS floor_ln
                  FROM pri p LEFT JOIN tot t USING (lang)
                  CROSS JOIN prit CROSS JOIN gsz),
        tgt AS (SELECT doc_id, lang AS true_lang,
                       greatest(len(t) - 2, 0) AS n_grams, t
                FROM d WHERE doc_id % 2 = 1),
        tgrams AS (SELECT doc_id, substr(t, i, 3) AS gram
                   FROM tgt, unnest(generate_series(1, len(t) - 2)) AS g(i)
                   WHERE len(t) >= 3),
        mt AS (SELECT m.doc_id, y.lang,
                      sum(ln((y.c + 1.0) / (o.tot + 1.0 * gsz.g))) AS s,
                      count(*) AS m
               FROM tgrams m JOIN ty y USING (gram)
               JOIN tot o ON y.lang = o.lang CROSS JOIN gsz
               GROUP BY 1, 2),
        sc AS (SELECT b.doc_id, b.true_lang, l.lang,
                      l.prior_ln + coalesce(mt.s, 0.0)
                      + (b.n_grams - coalesce(mt.m, 0)) * l.floor_ln
                          AS score
               FROM tgt b CROSS JOIN langs l
               LEFT JOIN mt ON mt.doc_id = b.doc_id AND mt.lang = l.lang),
        pr AS (SELECT doc_id, true_lang, lang AS pred_lang,
                      row_number() OVER (PARTITION BY doc_id
                          ORDER BY round(score, 6) DESC, lang) AS rn
               FROM sc)
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM pr WHERE rn = 1 GROUP BY true_lang, pred_lang
    """
    # CCMatrix margin mining: scoring, both k-NN means and the
    # per-source argmax replayed on DOUBLE[] lists.
    d["bitext_margin_pairs"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 10 = 0),
        t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 10 = 5),
        sc AS (SELECT src_id, tgt_id,
                      list_dot_product(sv, tv) /
                      (sqrt(list_dot_product(sv, sv)) *
                       sqrt(list_dot_product(tv, tv))) AS cs
               FROM s CROSS JOIN t),
        rk AS (SELECT *,
                      row_number() OVER (PARTITION BY src_id
                          ORDER BY cs DESC, tgt_id) AS rs,
                      row_number() OVER (PARTITION BY tgt_id
                          ORDER BY cs DESC, src_id) AS rt
               FROM sc),
        ks AS (SELECT src_id, avg(cs) AS ks FROM rk WHERE rs <= 4 GROUP BY 1),
        kt AS (SELECT tgt_id, avg(cs) AS kt FROM rk WHERE rt <= 4 GROUP BY 1),
        mg AS (SELECT r.src_id, r.tgt_id, r.cs,
                      r.cs / ((ks.ks + kt.kt) / 2) AS m
               FROM rk r JOIN ks USING (src_id) JOIN kt USING (tgt_id)),
        best AS (SELECT *, row_number() OVER (PARTITION BY src_id
                     ORDER BY round(m, 6) DESC, tgt_id) AS rb
                 FROM mg)
        SELECT src_id, tgt_id, round(cs, 6) AS cos_sim,
               round(m, 6) AS margin
        FROM best WHERE rb = 1 AND round(m, 6) > 1.0
    """
    d["readability_scores"] = f"""
        WITH d AS (SELECT doc_id, {_NORM} AS t, {_TOKS} AS tk
                   FROM documents),
        c AS (SELECT doc_id,
                     len(tk) AS n_words,
                     greatest(len(regexp_extract_all(t, '[.!?。！？]+')), 1)
                         AS n_sentences,
                     len(regexp_extract_all(t, '[aeiouy]+')) AS n_syllables,
                     len(list_distinct(tk)) AS n_distinct
              FROM d)
        SELECT doc_id,
               CAST(n_words AS INT) AS n_words,
               CAST(n_sentences AS INT) AS n_sentences,
               CAST(n_syllables AS INT) AS n_syllables,
               CASE WHEN n_words > 0 THEN
                   round(206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                         / n_sentences)
                       - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
               END AS flesch,
               CASE WHEN n_words > 0 THEN
                   round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                       + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                       - 15.59, 6)
               END AS fk_grade,
               CASE WHEN n_words > 0 THEN
                   round(CAST(n_distinct AS DOUBLE) / n_words, 6)
               END AS ttr
        FROM c
    """
    d["badwords_gate"] = """
        WITH ex AS (SELECT doc_id, t AS term FROM (
                        SELECT doc_id, unnest(string_split_regex(
                            lower(text), '[^a-z0-9]+')) AS t
                        FROM documents)
                    WHERE t <> ''),
        hits AS (SELECT doc_id, count(*) AS c FROM ex
                 WHERE term IN ('slow', 'dup', 'scan') GROUP BY 1)
        SELECT d.doc_id, d.lang, d.source,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_badword_hits
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE coalesce(h.c, 0) <= 2
    """
    d["quality_threshold_sweep"] = f"""
        WITH q AS (SELECT
                round(0.4 * least(len({_TOKS}) / 100.0, 1.0)
                + 0.3 * least(len(list_filter({_TOKS}, x -> x IN
                      ('the','a','of','and','to','in','is','for')))
                      * 5.0 / greatest(len({_TOKS}), 1), 1.0)
                + 0.3 * (1.0 - least((length(text) - length(regexp_replace(
                      text, '[.,;:!?''"()-]', '', 'g')))
                      * 10.0 / greatest(length(text), 1), 1.0)), 6) AS q,
                len({_TOKS}) AS n_tokens
            FROM documents),
        b AS (SELECT least(CAST(floor(q * 20) AS INT), 19) AS bucket,
                     q, n_tokens FROM q),
        per AS (SELECT bucket, count(*) AS n_docs,
                       sum(n_tokens) AS n_tokens, sum(q) AS q_sum
                FROM b GROUP BY 1)
        SELECT round(bucket / 20.0, 6) AS threshold,
               CAST(sum(n_docs) OVER w AS BIGINT) AS surviving_docs,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS surviving_tokens,
               round(sum(q_sum) OVER w / sum(n_docs) OVER w, 6)
                   AS mean_quality
        FROM per
        WINDOW w AS (ORDER BY bucket DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    # cluster-size histogram: two aggregates over the closure twin
    # (the inner query keeps its own WITH RECURSIVE inside the derived
    # table — DuckDB scopes nested CTEs per subquery)
    d["dedup_cluster_sizes"] = (
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, "
        "CAST(sum(cluster_size) AS BIGINT) AS n_docs FROM ("
        "SELECT cluster_id, count(*) AS cluster_size FROM ("
        + d["dedup_clusters"]
        + ") GROUP BY cluster_id) GROUP BY cluster_size"
    )
    d["gopher_repetition"] = _gopher_repetition_sql()
    d["link_graph_rank"] = _link_graph_rank_sql()
    d["trust_graph_rank"] = _trust_graph_rank_sql()
    d["hits_rank"] = _hits_rank_sql()
    d["harmonic_centrality"] = _harmonic_centrality_sql()
    d["host_communities"] = _host_communities_sql()
    d["structured_listing_fields"] = _structured_listing_fields_sql()
    d["opic_importance"] = _opic_importance_sql()
    d["dust_rule_mining"] = _dust_rule_mining_sql()
    d["soft404_flags"] = _soft404_flags_sql()
    d["canonical_url_per_digest"] = """
        WITH caps AS (
            SELECT u AS url_canon, md5(CAST(doc_id AS VARCHAR)) AS digest
            FROM (
                SELECT doc_id, unnest([
                    'https://h' || (doc_id % 10) || '.example.com/p/'
                        || doc_id,
                    'https://h' || (doc_id % 10) || '.example.com/p/'
                        || doc_id || '?utm=1',
                    'https://mirror' || (doc_id % 10)
                        || '.example.net/page/' || doc_id
                ]) AS u
                FROM documents)
        ),
        r AS (
            SELECT digest, url_canon,
                   row_number() OVER (PARTITION BY digest ORDER BY
                       length(url_canon),
                       CASE WHEN instr(url_canon, '?') > 0
                            THEN len(list_filter(string_split(
                                substr(url_canon,
                                       instr(url_canon, '?') + 1), '&'),
                                x -> x <> ''))
                            ELSE 0 END,
                       url_canon) AS rn,
                   count(DISTINCT url_canon) OVER (PARTITION BY digest)
                       AS n_urls
            FROM caps
        )
        SELECT digest, url_canon AS canonical_url, n_urls
        FROM r WHERE rn = 1
    """
    d["bm25_search"] = """
        WITH toks AS (
            SELECT doc_id, t FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text),
                    '[^a-z0-9]+')) AS t
                FROM documents)
            WHERE t <> ''
        ),
        postings AS (
            SELECT doc_id, t AS term, count(*) AS tf
            FROM toks GROUP BY 1, 2
        ),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
        stats AS (
            SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl
        ),
        tdf AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
        q(qid, qtext) AS (VALUES
            ('q1', 'spark window join'),
            ('q2', 'customer order batch'),
            ('q3', 'slow table scan merge')),
        qt AS (
            SELECT DISTINCT qid, t AS term FROM (
                SELECT qid, unnest(string_split_regex(lower(qtext),
                    '[^a-z0-9]+')) AS t
                FROM q)
            WHERE t <> ''
        ),
        per AS (
            SELECT qt.qid, p.doc_id, qt.term,
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                             + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(p.tf AS DOUBLE) * 2.2)
                   / (CAST(p.tf AS DOUBLE) + 1.2 * (0.25
                       + 0.75 * CAST(d.dl AS DOUBLE)
                         / (CAST(tot_dl AS DOUBLE)
                            / CAST(n_docs AS DOUBLE)))) AS s
            FROM postings p
            JOIN dl d USING (doc_id)
            JOIN qt ON p.term = qt.term
            JOIN tdf ON qt.term = tdf.term
            CROSS JOIN stats
        ),
        sc AS (
            SELECT qid, doc_id,
                   CAST(list_reduce(list(s ORDER BY term),
                                    (x, y) -> x + y) AS DOUBLE) AS score
            FROM per GROUP BY 1, 2
        ),
        r AS (
            SELECT qid, doc_id, score,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY score DESC, doc_id ASC) AS rank
            FROM sc
        )
        SELECT qid, doc_id, score, rank FROM r WHERE rank <= 5
    """
    # Phrase search: i-th phrase token at position p votes anchor p-i;
    # an anchor with all distinct offsets is one (overlap-counting) hit.
    _off = ", ".join(
        f"('{t}', {i})" for i, t in enumerate(_PHRASE.split())
    )
    _m = len(_PHRASE.split())
    d["phrase_search"] = f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                               '[^a-z0-9]+'), t -> t <> '') AS t
            FROM documents),
        post AS (
            SELECT doc_id, i - 1 AS pos, t[i] AS term
            FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
        off(term, i) AS (VALUES {_off}),
        votes AS (
            SELECT p.doc_id, p.pos - o.i AS anchor, o.i
            FROM post p JOIN off o ON p.term = o.term
            WHERE p.pos - o.i >= 0),
        hits AS (
            SELECT doc_id, anchor FROM votes
            GROUP BY doc_id, anchor HAVING count(DISTINCT i) = {_m})
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
               CAST(min(anchor) AS INT) AS first_pos
        FROM hits GROUP BY doc_id
    """
    d["domain_budget_schedule"] = """
        WITH f AS (
            SELECT 'https://s' || (o_custkey % 20) || '.farm'
                       || (o_custkey % 3) || '.co.uk/o/' || o_orderkey
                       AS url_canon,
                   's' || (o_custkey % 20) || '.farm' || (o_custkey % 3)
                       || '.co.uk' AS host,
                   'farm' || (o_custkey % 3) || '.co.uk' AS dom,
                   CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority,
                   o_orderdate AS discovered_ts
            FROM orders
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY host
                ORDER BY priority, discovered_ts, url_canon) AS host_rank
            FROM f
        ),
        s AS (SELECT *, host_rank <= 3 AS scheduled FROM r),
        d AS (
            SELECT *, row_number() OVER (PARTITION BY dom, scheduled
                ORDER BY priority, discovered_ts, url_canon) AS dr
            FROM s
        )
        SELECT url_canon, host, CAST(host_rank AS INT) AS host_rank
        FROM d WHERE scheduled AND dr <= 8
    """
    d["warc_revisits"] = """
        WITH caps AS (
            SELECT 'https://h' || (doc_id % 10) || '.example.com/d/'
                       || doc_id AS url,
                   CAST(1700000000 + doc_id*13
                        + j * (86400 + (doc_id % 7) * 3600) AS BIGINT)
                       AS epoch,
                   md5(doc_id || '#' || ((j + doc_id % 3) // 2)) AS digest
            FROM (SELECT doc_id, unnest(range(0, doc_id % 4 + 1)) AS j
                  FROM documents)
        ),
        w AS (
            SELECT url, epoch, digest,
                   row_number() OVER (
                       PARTITION BY url, digest ORDER BY epoch) AS rn,
                   min(epoch) OVER (
                       PARTITION BY url, digest) AS first_epoch
            FROM caps
        )
        SELECT url AS url_canon, epoch, digest,
               CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END
                   AS record_type,
               CASE WHEN rn > 1 THEN first_epoch END AS refers_epoch
        FROM w
    """
    d["registrable_domains"] = """
        SELECT doc_id,
               CASE doc_id % 6
                   WHEN 0 THEN 'shop' || (doc_id % 7) || '.co.uk'
                   WHEN 1 THEN 'site' || (doc_id % 5) || '.com.au'
                   WHEN 2 THEN 'example.com'
                   WHEN 3 THEN 'co.uk'
                   WHEN 4 THEN 'localhost'
                   ELSE 'site' || (doc_id % 4) || '.com'
               END AS domain
        FROM documents
    """
    d["recrawl_schedule"] = """
        WITH caps AS (
            SELECT 'https://h' || (doc_id % 10) || '.example.com/d/'
                       || doc_id AS url,
                   CAST(1700000000 + doc_id*13
                        + j * (86400 + (doc_id % 7) * 3600) AS BIGINT) AS ts,
                   md5(doc_id || '#' || ((j + doc_id % 3) // 2)) AS digest
            FROM (SELECT doc_id, unnest(range(0, doc_id % 4 + 1)) AS j
                  FROM documents)
        ),
        flagged AS (
            SELECT url, ts,
                   CASE WHEN lag(digest) OVER w IS NOT NULL
                             AND digest <> lag(digest) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM caps WINDOW w AS (PARTITION BY url ORDER BY ts, digest)
        ),
        per AS (
            SELECT url, CAST(count(*) AS BIGINT) AS n_captures,
                   CAST(sum(chg) AS BIGINT) AS n_changes,
                   CAST(min(ts) AS BIGINT) AS first_ts,
                   CAST(max(ts) AS BIGINT) AS last_ts
            FROM flagged GROUP BY url
        ),
        est AS (
            SELECT *,
                   CAST(n_captures - 1 AS DOUBLE) AS n_int,
                   CASE WHEN n_captures > 1
                        THEN (last_ts - first_ts)
                             / CAST(n_captures - 1 AS DOUBLE) END
                       AS avg_interval_s
            FROM per
        ),
        lam AS (
            SELECT *,
                   CASE WHEN n_int > 0 AND avg_interval_s > 0
                        THEN -ln((n_int - n_changes + CAST(0.5 AS DOUBLE))
                                 / (n_int + CAST(0.5 AS DOUBLE)))
                             / avg_interval_s END AS lam_s
            FROM est
        ),
        iv AS (
            SELECT *,
                   CASE WHEN lam_s > 0
                        THEN least(greatest(CAST(1.0 AS DOUBLE) / lam_s,
                                            CAST(3600 AS DOUBLE)),
                                   CAST(2592000 AS DOUBLE))
                        ELSE CAST(2592000 AS DOUBLE) END
                       AS refetch_interval_s
            FROM lam
        )
        SELECT url, n_captures, n_changes,
               round(avg_interval_s, 6) AS avg_interval_s,
               round(lam_s * 86400.0, 6) AS lambda_per_day,
               round(refetch_interval_s, 6) AS refetch_interval_s,
               CAST(last_ts + floor(refetch_interval_s) AS BIGINT)
                   AS next_fetch_epoch
        FROM iv
    """
    d["cdx_surt_keys"] = """
        SELECT doc_id,
               'com,example,host' || (doc_id % 20) ||
               CASE WHEN doc_id % 5 = 0 THEN ',sub' ELSE '' END ||
               ')/path/' || doc_id ||
               CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                    WHEN doc_id % 3 = 1 THEN '?a=1'
                    ELSE '' END AS surt,
               'https://' ||
               CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END ||
               CASE WHEN doc_id % 5 = 0 THEN 'sub.' ELSE '' END ||
               'host' || (doc_id % 20) || '.example.com/Path/' || doc_id ||
               CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                    WHEN doc_id % 3 = 1 THEN '?a=1'
                    ELSE '' END AS url_canon
        FROM documents
    """
    d["cdx_snapshot_diff"] = """
        WITH caps AS (
            SELECT 'https://h' || (doc_id % 10) || '.example.com/d/'
                       || doc_id AS url,
                   CAST(1700000000 + (doc_id % 5) * 40000 + doc_id*13
                        + j * (86400 + (doc_id % 7) * 3600) AS BIGINT) AS ts,
                   md5(doc_id || '#' || ((j + doc_id % 3) // 2)) AS digest
            FROM (SELECT doc_id, unnest(range(0, doc_id % 4 + 1)) AS j
                  FROM documents)
        ),
        le1 AS (SELECT * FROM caps WHERE ts <= 1700400000),
        s1 AS (
            SELECT url, digest AS digest_t1 FROM (
                SELECT url, digest, row_number() OVER (
                    PARTITION BY url ORDER BY ts DESC, digest DESC) AS rn
                FROM le1) WHERE rn = 1
        ),
        s0 AS (
            SELECT url, digest AS digest_t0 FROM (
                SELECT url, digest, row_number() OVER (
                    PARTITION BY url ORDER BY ts DESC, digest DESC) AS rn
                FROM le1 WHERE ts <= 1700100000) WHERE rn = 1
        ),
        cnt AS (
            SELECT url,
                   CAST(count(*) FILTER (ts > 1700100000) AS BIGINT)
                       AS captures_in_window
            FROM le1 GROUP BY url
        )
        SELECT cnt.url,
               CASE WHEN s0.digest_t0 IS NULL THEN 'new'
                    WHEN captures_in_window = 0 THEN 'stale'
                    WHEN s0.digest_t0 <> s1.digest_t1 THEN 'changed'
                    ELSE 'refreshed' END AS status,
               s0.digest_t0, s1.digest_t1, captures_in_window
        FROM cnt JOIN s1 USING (url) LEFT JOIN s0 USING (url)
    """
    _host_edges_cte = """
        e AS (
            SELECT 'com,example,h' || (doc_id % 10) AS src_host,
                   'com,example,h' || ((doc_id*7+1) % 10) AS dst_host,
                   src_page
            FROM (SELECT doc_id,
                         'https://' || CASE WHEN doc_id % 4 = 0
                                            THEN 'www.' ELSE '' END ||
                         'h' || (doc_id % 10) || '.example.com/p/'
                             || doc_id AS src_page
                  FROM documents)
            UNION ALL
            SELECT 'com,example,h' || (doc_id % 10),
                   'com,example,h' || ((doc_id*7+1) % 10),
                   'https://' || CASE WHEN doc_id % 4 = 0
                                      THEN 'www.' ELSE '' END ||
                   'h' || (doc_id % 10) || '.example.com/p/' || doc_id
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT 'com,example,h' || (doc_id % 10),
                   'com,example,h' || ((doc_id*13+5) % 12),
                   'https://' || CASE WHEN doc_id % 4 = 0
                                      THEN 'www.' ELSE '' END ||
                   'h' || (doc_id % 10) || '.example.com/p/' || doc_id
            FROM documents
            UNION ALL
            SELECT 'com,example,h' || (doc_id % 10),
                   'com,example,h' || (doc_id % 10),
                   'https://' || CASE WHEN doc_id % 4 = 0
                                      THEN 'www.' ELSE '' END ||
                   'h' || (doc_id % 10) || '.example.com/p/' || doc_id
            FROM documents
        ),
        per_page AS (
            SELECT src_host, dst_host, src_page, count(*) AS n
            FROM e GROUP BY 1, 2, 3
        ),
        hg AS (
            SELECT src_host, dst_host,
                   CAST(sum(n) AS BIGINT) AS n_links,
                   CAST(count(*) AS BIGINT) AS n_src_pages,
                   src_host = dst_host AS is_internal
            FROM per_page GROUP BY 1, 2
        )
    """
    d["host_graph_rollup"] = f"""
        WITH {_host_edges_cte}
        SELECT * FROM hg
    """
    d["host_graph_degrees"] = f"""
        WITH {_host_edges_cte}
        SELECT host,
               CAST(sum(od) AS BIGINT) AS out_degree,
               CAST(sum(ind) AS BIGINT) AS in_degree,
               CAST(sum(ol) AS BIGINT) AS out_links,
               CAST(sum(il) AS BIGINT) AS in_links,
               CAST(sum(nl) AS BIGINT) AS internal_links
        FROM (
            SELECT src_host AS host, 1 AS od, 0 AS ind,
                   n_links AS ol, 0 AS il, 0 AS nl
            FROM hg WHERE NOT is_internal
            UNION ALL
            SELECT dst_host, 0, 1, 0, n_links, 0
            FROM hg WHERE NOT is_internal
            UNION ALL
            SELECT src_host, 0, 0, 0, 0, n_links
            FROM hg WHERE is_internal
        ) GROUP BY host
    """
    def _dsir_feats_sql(src_pred: str) -> str:
        """Twin of operators/importance.py hashed_ngram_features:
        unigrams + adjacent bigrams → md5 56-bit bucket → counts."""
        return f"""
            SELECT doc_id AS id,
                   ('0x' || substr(md5(g), 1, 14))::BIGINT % 4096
                       AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT doc_id, unnest(list_concat(
                    t,
                    list_transform(range(1, greatest(len(t), 1)),
                                   i -> t[i] || ' ' || t[i+1])
                )) AS g
                FROM (SELECT doc_id, {_TOKS} AS t FROM documents
                      {src_pred})
            ) GROUP BY 1, 2
        """

    d["dsir_weights"] = f"""
        WITH rawf AS ({_dsir_feats_sql("")}),
        tgtf AS ({_dsir_feats_sql("WHERE lang = 'en'")}),
        tb AS (SELECT bucket, sum(cnt) AS tc FROM tgtf GROUP BY 1),
        rb AS (SELECT bucket, sum(cnt) AS rc FROM rawf GROUP BY 1),
        tot AS (SELECT (SELECT sum(cnt) FROM tgtf) AS t_tot,
                       (SELECT sum(cnt) FROM rawf) AS r_tot),
        lr AS (
            SELECT bucket,
                   ln((coalesce(tc, 0) + CAST(1.0 AS DOUBLE))
                      / (t_tot + CAST(4096.0 AS DOUBLE)))
                   - ln((coalesce(rc, 0) + CAST(1.0 AS DOUBLE))
                        / (r_tot + CAST(4096.0 AS DOUBLE))) AS logratio
            FROM tb FULL JOIN rb USING (bucket) CROSS JOIN tot
        ),
        w AS (
            SELECT id AS doc_id, sum(cnt * logratio) AS weight
            FROM rawf JOIN lr USING (bucket) GROUP BY 1
        ),
        keyed AS (
            SELECT doc_id, weight,
                   weight / CAST(1.0 AS DOUBLE)
                   + (-ln(-ln((('0x' || substr(md5(doc_id || '#7'), 1, 13))
                               ::BIGINT::DOUBLE + CAST(0.5 AS DOUBLE))
                              / CAST(4503599627370496.0 AS DOUBLE))))
                       AS gkey
            FROM w
        )
        SELECT doc_id, round(weight, 6) AS weight,
               row_number() OVER (ORDER BY gkey DESC, doc_id) <= 100
                   AS selected
        FROM keyed
    """
    d["host_trap_signals"] = """
        WITH u AS (
            SELECT doc_id, doc_id % 8 AS h,
                   CASE WHEN doc_id % 8 = 6
                            THEN CAST(2 * (doc_id % 4 + 1) AS BIGINT)
                        WHEN doc_id % 8 = 7 THEN CAST(1 AS BIGINT)
                        ELSE CAST(2 AS BIGINT) END AS depth,
                   CASE WHEN doc_id % 8 = 6 AND doc_id % 4 > 0
                        THEN 1.0 ELSE 0.0 END AS rep_flag,
                   CASE WHEN doc_id % 8 = 7 THEN CAST(1 AS BIGINT)
                        WHEN doc_id % 8 < 6 AND doc_id % 3 = 0
                            THEN CAST(2 AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS n_params,
                   CASE WHEN doc_id % 8 = 7 THEN 'constant'
                        ELSE md5(CAST(doc_id AS VARCHAR)) END AS digest
            FROM documents
        ),
        sig AS (
            SELECT 'h' || h || '.example.com' AS host,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   avg(CAST(depth AS DOUBLE)) AS avg_depth,
                   max(depth) AS max_depth,
                   avg(rep_flag) AS repeat_seg_share,
                   avg(CAST(n_params AS DOUBLE)) AS avg_params,
                   max(n_params) AS max_params,
                   CAST(count(DISTINCT digest) AS BIGINT) AS n_contents
            FROM u GROUP BY 1
        ),
        flagged AS (
            SELECT *,
                   CAST(n_urls AS DOUBLE) / n_contents
                       AS urls_per_content,
                   CASE WHEN n_urls >= 20 THEN concat_ws(',',
                        CASE WHEN CAST(n_urls AS DOUBLE) / n_contents
                                  > 4.0 THEN 'dup_content' END,
                        CASE WHEN avg_depth > 8.0 THEN 'deep_paths' END,
                        CASE WHEN repeat_seg_share > 0.5
                             THEN 'cyclic_paths' END,
                        CASE WHEN avg_params > 4.0
                             THEN 'param_blowup' END)
                   ELSE '' END AS trap_reasons
            FROM sig
        )
        SELECT host, n_urls, round(avg_depth, 6) AS avg_depth,
               max_depth, round(repeat_seg_share, 6) AS repeat_seg_share,
               round(avg_params, 6) AS avg_params, max_params,
               n_contents, round(urls_per_content, 6) AS urls_per_content,
               trap_reasons, trap_reasons <> '' AS is_trap_suspect
        FROM flagged
    """
    d["per_source_cap"] = """
        SELECT doc_id, source FROM (
            SELECT doc_id, source, row_number() OVER (
                PARTITION BY source
                ORDER BY substr(md5(concat_ws(chr(31), 'capv1',
                                CAST(doc_id AS VARCHAR))), 1, 8),
                         doc_id) AS rk
            FROM documents
        ) WHERE rk <= 12
    """
    d["warc_cdx_locations"] = """
        WITH recs AS (
            SELECT 'com,example,h' || (doc_id % 10) || ')/p/' || doc_id
                       AS surt,
                   'https://h' || (doc_id % 10) || '.example.com/p/'
                       || doc_id AS url,
                   CAST(1700000000 + doc_id AS BIGINT) AS epoch,
                   CAST(doc_id % 4 AS INT) AS segment,
                   CAST(octet_length(encode(text)) AS BIGINT) AS plen,
                   md5(text) AS pdigest
            FROM documents
        ),
        sized AS (
            SELECT surt, url, epoch, segment, pdigest,
                   strlen(e'WARC/1.0\r\nWARC-Type: response\r\n'
                          || 'WARC-Target-URI: ' || url || e'\r\n'
                          || 'WARC-Date: ')
                   + 20 + 2
                   + strlen('Content-Length: ' || CAST(plen AS VARCHAR))
                   + 4 + plen + 4 AS length
            FROM recs
        )
        SELECT surt, url, segment,
               CAST(coalesce(sum(length) OVER (
                   PARTITION BY segment ORDER BY surt, epoch, url, length, pdigest
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS offset,
               CAST(length AS BIGINT) AS length
        FROM sized
    """
    d["warc_write_manifest"] = """
        WITH recs AS (
            SELECT 'https://h' || (doc_id % 10) || '.example.com/p/'
                       || doc_id AS url,
                   CAST(doc_id % 4 AS INT) AS segment,
                   CAST(octet_length(encode(text)) AS BIGINT) AS plen
            FROM documents
        ),
        sized AS (
            SELECT segment,
                   strlen(e'WARC/1.0\r\nWARC-Type: response\r\n'
                          || 'WARC-Target-URI: ' || url || e'\r\n'
                          || 'WARC-Date: ')
                   + 20 + 2
                   + strlen('Content-Length: ' || CAST(plen AS VARCHAR))
                   + 4 + plen + 4 AS length
            FROM recs
        )
        SELECT segment,
               COUNT(*) AS n_records,
               CAST(SUM(length) AS BIGINT) AS n_bytes
        FROM sized
        GROUP BY segment
    """
    d["redirect_resolve"] = """
        WITH RECURSIVE e AS (
            SELECT 'u' || doc_id AS u, 'u' || (doc_id - 1) AS t
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT 'cA' || doc_id, 'cB' || doc_id
            FROM documents WHERE doc_id % 50 = 7
            UNION ALL
            SELECT 'cB' || doc_id, 'cA' || doc_id
            FROM documents WHERE doc_id % 50 = 7
        ),
        walk AS (
            SELECT u, t, CAST(1 AS BIGINT) AS hops, [u] AS path FROM e
            UNION ALL
            SELECT w.u, e.t, w.hops + 1, list_append(w.path, w.t)
            FROM walk w JOIN e ON w.t = e.u
            WHERE NOT list_contains(w.path, e.t)
        ),
        furthest AS (
            SELECT u, t, hops,
                   row_number() OVER (
                       PARTITION BY u ORDER BY hops DESC) AS rn
            FROM walk
        ),
        srcs AS (SELECT DISTINCT u FROM e)
        SELECT f.u AS url,
               CASE WHEN s.u IS NULL THEN f.t END AS target,
               CASE WHEN s.u IS NULL THEN f.hops END AS hops,
               s.u IS NOT NULL AS is_cycle
        FROM furthest f LEFT JOIN srcs s ON f.t = s.u
        WHERE f.rn = 1
    """
    d["content_type_sniff"] = """
        SELECT doc_id,
               CASE doc_id % 8
                   WHEN 0 THEN 'application/pdf'
                   WHEN 1 THEN 'image/png'
                   WHEN 2 THEN 'image/jpeg'
                   WHEN 3 THEN 'image/webp'
                   WHEN 4 THEN 'application/gzip'
                   WHEN 5 THEN 'application/zip'
                   WHEN 6 THEN 'text/html'
                   ELSE 'application/octet-stream'
               END AS mime
        FROM documents
    """
    d["cdx_latest"] = """
        WITH caps AS (
            SELECT 'https://h' || (doc_id % 10) || '.example.com/d/'
                       || doc_id AS url_canon,
                   CAST(1700000000 + doc_id*13
                        + j * (86400 + (doc_id % 7) * 3600) AS BIGINT)
                       AS epoch,
                   md5(doc_id || '#' || ((j + doc_id % 3) // 2)) AS digest
            FROM (SELECT doc_id, unnest(range(0, doc_id % 4 + 1)) AS j
                  FROM documents)
        )
        SELECT url_canon, epoch, digest FROM (
            SELECT *, row_number() OVER (
                PARTITION BY url_canon
                ORDER BY epoch DESC, url_canon DESC, digest DESC) AS rn
            FROM caps) WHERE rn = 1
    """
    d["anchor_text_rollup"] = """
        WITH p AS (
            SELECT 'https://s' || (doc_id % 50) || '.example.org/d/'
                       || doc_id AS src,
                   '<p>x</p>'
                   || '<a href="https://t' || ((doc_id*31) % 97)
                       || '.org/page">Site  ' || (doc_id % 13) || '</a>'
                   || '<a href="https://t' || ((doc_id*17) % 97)
                       || '.org/page" class="c">  read ' || (doc_id % 4)
                       || '  more </a>'
                   || CASE WHEN doc_id % 5 = 0
                           THEN '<a href="https://t' || ((doc_id*31) % 97)
                                || '.org/page">Site  ' || (doc_id % 13)
                                || '</a>'
                           ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN '<a href="https://t' || ((doc_id*31) % 97)
                                || '.org/page"></a>'
                           ELSE '' END AS html
            FROM documents
        ),
        z AS (
            SELECT src,
                   regexp_extract_all(
                       html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 1
                   ) AS hrefs,
                   regexp_extract_all(
                       html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 2
                   ) AS txts
            FROM p
        ),
        e AS (
            SELECT src, hrefs[i] AS target,
                   trim(regexp_replace(txts[i], '\\s+', ' ', 'g'))
                       AS anchor_text
            FROM z, unnest(generate_series(1, len(hrefs))) AS g(i)
        )
        SELECT target, anchor_text,
               count(*) AS n_links,
               count(DISTINCT src) AS n_sources
        FROM e GROUP BY 1, 2
    """
    d["mirror_hosts"] = """
        WITH caps AS (
            SELECT 'm' || (doc_id % 8) || '.example.org' AS host,
                   md5(CASE
                       WHEN doc_id % 8 = 0 THEN 'd0-' || (doc_id // 8)
                       WHEN doc_id % 8 = 1 THEN
                           CASE WHEN (doc_id // 8) % 10 < 9
                                THEN 'd0-' || (doc_id // 8)
                                ELSE 'd1-' || (doc_id // 8) END
                       ELSE 'd' || (doc_id % 8) || '-' || (doc_id // 8)
                   END) AS digest
            FROM documents
            UNION ALL
            SELECT 'm' || (doc_id % 8) || '.example.org', md5('boiler')
            FROM documents
        ),
        hd0 AS (SELECT DISTINCT host, digest FROM caps
                WHERE digest IS NOT NULL),
        hd1 AS (SELECT *, count(*) OVER (PARTITION BY digest) AS df
                FROM hd0),
        hd AS (SELECT host, digest,
                      count(*) OVER (PARTITION BY host) AS sz
               FROM hd1 WHERE df <= 4),
        p AS (SELECT l.host AS host_a, r.host AS host_b,
                     count(*) AS shared,
                     min(l.sz) AS size_a, min(r.sz) AS size_b
              FROM hd l JOIN hd r USING (digest)
              WHERE l.host < r.host GROUP BY 1, 2)
        SELECT host_a, host_b, shared, size_a, size_b,
               CAST(shared AS DOUBLE) / least(size_a, size_b)
                   AS containment,
               CAST(shared AS DOUBLE) / (size_a + size_b - shared)
                   AS jaccard
        FROM p
        WHERE shared >= 3
          AND CAST(shared AS DOUBLE) / least(size_a, size_b) >= 0.5
    """
    # Pipeline oracle: per-table committed row counts must equal the
    # relational twins' counts — the batched append + PK dedup is lossless
    # and duplicate-free end to end.
    d["star_pipeline_counts"] = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows "
        f"FROM ({q})"
        for t, q in _STAR_SQL.items()
    )
    # single source of truth: the exact table list the streaming sink loads
    from hk_housing_datahub_spark.star.pipeline import ESTATE_TABLES

    d["star_streaming_ingest"] = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows "
        f"FROM ({_STAR_SQL[t]})"
        for t in ESTATE_TABLES
    )
    # Tokenizer-fit statistics: the pytest DuckDB twins
    # (test_vocab.py) composed into the query's union shape — top 200
    # tokens (count desc, token tiebreak) plus top 200 first-iteration
    # BPE pairs over the min_count=2 vocabulary.
    d["token_vocab_top"] = """
        WITH toks AS (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents
          WHERE trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''),
        freq AS (
          SELECT token, count(*) AS count FROM toks GROUP BY token),
        tok_top AS (
          SELECT 'token' AS kind, token AS sym, count
          FROM freq ORDER BY count DESC, token LIMIT 200),
        vocab AS (SELECT token, count AS cnt FROM freq WHERE count >= 2),
        syms AS (SELECT token, cnt, len(token) AS n FROM vocab),
        pairs AS (
          SELECT substr(token, i, 1) AS left_,
                 CASE WHEN i < n THEN substr(token, i + 1, 1)
                      ELSE '</w>' END AS right_,
                 cnt
          FROM syms, unnest(generate_series(1, n)) AS u(i)),
        pair_counts AS (
          SELECT left_, right_, CAST(sum(cnt) AS BIGINT) AS count
          FROM pairs GROUP BY 1, 2),
        pair_top AS (
          SELECT 'pair' AS kind, left_ || '+' || right_ AS sym, count
          FROM pair_counts ORDER BY count DESC, left_, right_ LIMIT 200)
        SELECT * FROM tok_top UNION ALL SELECT * FROM pair_top
    """
    # SemDeDup: the twin unrolls the fixed Lloyd's iterations as CTEs —
    # md5-order seeds, cosine argmax (tie → lowest cid) via row_number,
    # per-dimension avg centroid update (coalesce keeps an emptied
    # cluster's previous centroid, matching the engine), then the
    # keep-the-least-typical triangular drop rule.
    d["semdedup_drop"] = _semdedup_sql(k=8, iters=2, tau=0.3)
    # C4 cleaning: the twin replays the planted page construction
    # (8-word lines, md5-hex decorations, lorem marker) then the line
    # policy (terminal punctuation, >=5 words, no 'javascript' word)
    # and the page gates (badword 'dup', lorem ipsum, curly brace,
    # >=3 sentences) — cleaned_text is hash-compared byte-for-byte.
    d["c4_clean_pages"] = r"""
        WITH d AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents),
        nl AS (
          SELECT *, greatest(1, CAST(ceil(len(toks) / 8.0) AS INT))
                    AS n_lines
          FROM d),
        lines AS (
          SELECT doc_id, lang, i,
                 array_to_string(list_slice(toks, i*8 + 1, i*8 + 8), ' ')
                     AS body,
                 substr(md5(CAST(doc_id AS VARCHAR) || ':'
                            || CAST(i AS VARCHAR)), 1, 1) AS h1
          FROM nl, unnest(generate_series(0, n_lines - 1)) AS t(i)),
        deco AS (
          SELECT doc_id, lang, i,
                 CASE WHEN h1 BETWEEN '0' AND '7' THEN body || '.'
                      WHEN h1 IN ('8','9') THEN body || '!'
                      WHEN h1 IN ('a','b') THEN body || '?'
                      WHEN h1 IN ('c','d') THEN body
                      WHEN h1 = 'e' THEN body || ' javascript.'
                      ELSE body || ' {.' END AS line
          FROM lines),
        pages AS (
          SELECT doc_id, lang,
                 string_agg(line, chr(10) ORDER BY i)
                 || CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                              = 'ab'
                         THEN chr(10) || 'lorem ipsum dolor sit amet.'
                         ELSE '' END AS text
          FROM deco GROUP BY doc_id, lang),
        plines AS (
          SELECT doc_id, generate_subscripts(ls, 1) AS j,
                 unnest(ls) AS l
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM pages)),
        clines AS (
          SELECT doc_id, j, l FROM plines
          WHERE regexp_matches(trim(l), '[.!?"]$')
            AND len(list_filter(regexp_split_to_array(trim(l), '\s+'),
                                w -> w <> '')) >= 5
            AND NOT regexp_matches(lower(l),
                  '(^|[^a-z])javascript([^a-z]|$)')),
        cleanedtab AS (
          SELECT doc_id, string_agg(l, chr(10) ORDER BY j)
                     AS cleaned_text
          FROM clines GROUP BY doc_id),
        flags AS (
          SELECT p.doc_id, p.lang, p.text,
                 coalesce(c.cleaned_text, '') AS cleaned_text,
                 regexp_matches(lower(p.text),
                     '(^|[^a-z0-9])(dup)([^a-z0-9]|$)') AS has_badword,
                 contains(lower(p.text), 'lorem ipsum') AS has_lorem,
                 contains(p.text, '{') AS has_brace
          FROM pages p LEFT JOIN cleanedtab c USING (doc_id))
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(cleaned_text, '[.!?"]'))
                    AS INT) AS n_sentences,
               has_badword, has_lorem, has_brace,
               (len(regexp_extract_all(cleaned_text, '[.!?"]')) >= 3
                AND NOT has_badword AND NOT has_lorem
                AND NOT has_brace) AS kept,
               cleaned_text
        FROM flags
    """
    # jusText-lite main-content extraction: the twin replays the page
    # assembly, the RE2-safe script/style strip + block split, and the
    # per-block (chars, words, link-chars) scoring; 0.4e0 forces the
    # same double-precision link-density compare Spark runs.
    d["main_content_extract"] = r"""
        WITH pages AS (
          SELECT doc_id,
            '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>'
            || '<p>' || substr(text, 1, 120) || '</p>'
            || '<script>var trk = "never content";</script>'
            || '<ul><li><a href="/d/' || CAST(doc_id AS VARCHAR)
            || '">doc</a></li><li><a href="/x">more links here</a></li></ul>'
            || '<footer><a href="/terms">Terms of service</a> <a href="/privacy">Privacy policy</a></footer>'
            AS html
          FROM documents),
        blk AS (
          SELECT doc_id,
            regexp_split_to_array(
              regexp_replace(regexp_replace(html,
                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
              '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|section|article|aside|header|footer|nav|blockquote|pre|figure|fieldset|form|main|br)(?:\s[^>]*)?/?>'
            ) AS blocks
          FROM pages),
        scored AS (
          SELECT doc_id,
            list_transform(blocks, b -> struct_pack(
              t := trim(regexp_replace(regexp_replace(b,
                     '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
              lc := coalesce(length(trim(regexp_replace(regexp_replace(
                      array_to_string(regexp_extract_all(b,
                        '(?is)<a[^>]*>(.*?)</a>', 1), ' '),
                      '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))), 0)
            )) AS s
          FROM blk),
        m AS (
          SELECT doc_id,
            list_transform(s, x -> struct_pack(
              t := x.t,
              c := length(x.t),
              w := CASE WHEN length(x.t) = 0 THEN 0
                        ELSE len(string_split(x.t, ' ')) END,
              l := least(x.lc, length(x.t))
            )) AS s2
          FROM scored)
        SELECT doc_id,
          array_to_string(list_transform(list_filter(s2,
            x -> x.c >= 25 AND x.w >= 5
                 AND CAST(x.l AS DOUBLE) <= 0.4e0 * CAST(x.c AS DOUBLE)),
            x -> x.t), chr(10)) AS content,
          len(s2)::int AS n_blocks,
          len(list_filter(s2,
            x -> x.c >= 25 AND x.w >= 5
                 AND CAST(x.l AS DOUBLE) <= 0.4e0 * CAST(x.c AS DOUBLE)
          ))::int AS n_content_blocks,
          COALESCE(list_sum(list_transform(list_filter(s2,
            x -> x.c >= 25 AND x.w >= 5
                 AND CAST(x.l AS DOUBLE) <= 0.4e0 * CAST(x.c AS DOUBLE)),
            x -> x.c)), 0)::int AS content_chars,
          COALESCE(list_sum(list_transform(s2, x -> x.l)), 0)::int
            AS link_chars_total
        FROM m
        ORDER BY doc_id
    """
    # crawl->corpus glue: the content twin reduced to the content
    # column, plus md5(url) ids, regexp host, and the min-chars gate.
    d["crawl_to_corpus_docs"] = r"""
        WITH pages AS (
          SELECT
            'https://s' || CAST(doc_id % 97 AS VARCHAR) || '.example.org/d/'
              || CAST(doc_id AS VARCHAR) AS url,
            '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>'
            || '<p>' || substr(text, 1, 120) || '</p>'
            || '<script>var trk = "never content";</script>'
            || '<ul><li><a href="/d/' || CAST(doc_id AS VARCHAR)
            || '">doc</a></li><li><a href="/x">more links here</a></li></ul>'
            || '<footer><a href="/terms">Terms of service</a> <a href="/privacy">Privacy policy</a></footer>'
            AS html,
            lang
          FROM documents),
        blk AS (
          SELECT url, lang,
            regexp_split_to_array(
              regexp_replace(regexp_replace(html,
                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
              '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|section|article|aside|header|footer|nav|blockquote|pre|figure|fieldset|form|main|br)(?:\s[^>]*)?/?>'
            ) AS blocks
          FROM pages),
        m AS (
          SELECT url, lang,
            list_transform(blocks, b -> struct_pack(
              t := trim(regexp_replace(regexp_replace(b,
                     '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
              lc := coalesce(length(trim(regexp_replace(regexp_replace(
                      array_to_string(regexp_extract_all(b,
                        '(?is)<a[^>]*>(.*?)</a>', 1), ' '),
                      '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))), 0)
            )) AS s
          FROM blk),
        docs AS (
          SELECT md5(url) AS doc_id,
            array_to_string(list_transform(list_filter(s,
              x -> length(x.t) >= 25
                   AND (CASE WHEN length(x.t) = 0 THEN 0
                        ELSE len(string_split(x.t, ' ')) END) >= 5
                   AND CAST(least(x.lc, length(x.t)) AS DOUBLE)
                       <= 0.4e0 * CAST(length(x.t) AS DOUBLE)),
              x -> x.t), chr(10)) AS text,
            lang,
            regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS source,
            url
          FROM m)
        SELECT doc_id, text, lang, source, url
        FROM docs
        WHERE length(text) >= 25
        ORDER BY doc_id
    """
    # WET/WAT derivative records: the full record/payload text plus all
    # three lockstep pointers rebuilt from the header grammar — one
    # response-keyed order (surt, epoch, url, warc length, digest), three
    # running length sums. Dates via make_timestamp(µs): a UTC instant
    # rendered as UTC on both engines.
    d["wet_wat_records"] = (
        """
        WITH p AS (
          SELECT 'https://h' || (doc_id % 10) || '.example.com/p/' || doc_id
                     AS url,
                 'com,example,h' || (doc_id % 10) || ')/p/' || doc_id
                     AS surt,
                 CAST(1700000000 + doc_id AS BIGINT) AS epoch,
                 CAST(doc_id % 4 AS INT) AS segment,
                 '<html><a href="https://h' || ((doc_id + 1) % 10)
                   || '.example.com/p/' || (doc_id + 1) || '">next</a>'
                   || CASE WHEN doc_id % 3 = 0
                           THEN '<a href="https://x.org/' || doc_id
                                || '">x ' || doc_id || '</a>'
                           ELSE '' END
                   || '<p>' || coalesce(text, '') || '</p></html>' AS html,
                 coalesce(text, '') AS text,
                 lang
          FROM documents),
        d AS (
          SELECT *,
                 strftime(make_timestamp(epoch * 1000000),
                          '%Y-%m-%dT%H:%M:%SZ') AS wdate,
                 md5(html) AS pdigest,
                 regexp_extract_all(html,
                     '<a href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS links
          FROM p),
        recs AS (
          SELECT *,
                 e'WARC/1.0\\r\\nWARC-Type: conversion\\r\\n'
                   || 'WARC-Target-URI: ' || url || e'\\r\\n'
                   || 'WARC-Date: ' || wdate || e'\\r\\n'
                   || 'WARC-Block-Digest: md5:' || md5(text) || e'\\r\\n'
                   || 'Content-Length: '
                   || CAST(octet_length(encode(text)) AS VARCHAR)
                   || e'\\r\\n\\r\\n' || text || e'\\r\\n\\r\\n' AS wet_rec,
                 '{"url":"' || url || '","date":"' || wdate
                   || '","digest":"md5:' || pdigest || '","length":'
                   || CAST(octet_length(encode(html)) AS VARCHAR)
                   || ',"lang":"' || lang || '","n_links":'
                   || CAST(len(links) AS VARCHAR) || ',"links":['
                   || array_to_string(
                          list_transform(links, x -> '"' || x || '"'), ',')
                   || ']}' AS wat_json
          FROM d),
        sized AS (
          SELECT *,
                 CAST(strlen(e'WARC/1.0\\r\\nWARC-Type: response\\r\\n'
                        || 'WARC-Target-URI: ' || url || e'\\r\\n'
                        || 'WARC-Date: ' || wdate || e'\\r\\n'
                        || 'Content-Length: '
                        || CAST(octet_length(encode(html)) AS VARCHAR)
                        || e'\\r\\n\\r\\n')
                      + octet_length(encode(html)) + 4 AS BIGINT)
                     AS warc_length,
                 CAST(octet_length(encode(wet_rec)) AS BIGINT) AS wet_length,
                 CAST(strlen(e'WARC/1.0\\r\\nWARC-Type: metadata\\r\\n'
                        || 'WARC-Target-URI: ' || url || e'\\r\\n'
                        || 'WARC-Date: ' || wdate || e'\\r\\n'
                        || 'Content-Length: '
                        || CAST(octet_length(encode(wat_json)) AS VARCHAR)
                        || e'\\r\\n\\r\\n')
                      + octet_length(encode(wat_json)) + 4 AS BIGINT)
                     AS wat_length
          FROM recs)
        SELECT url, segment,
               CAST(coalesce(sum(warc_length) OVER w, 0) AS BIGINT)
                   AS warc_offset,
               warc_length,
               CAST(coalesce(sum(wet_length) OVER w, 0) AS BIGINT)
                   AS wet_offset,
               wet_length,
               CAST(coalesce(sum(wat_length) OVER w, 0) AS BIGINT)
                   AS wat_offset,
               wat_length,
               wet_rec, wat_json
        FROM sized
        WINDOW w AS (
            PARTITION BY segment
            ORDER BY surt, epoch, url, warc_length, pdigest
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """
    )
    # Conditional revalidation: latest-capture ranking + the plan and
    # disposition joins replayed in SQL. Digests are md5 over the same
    # UTF-8 bytes on both engines.
    d["conditional_refetch"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        caps AS (
          SELECT i,
                 'https://h' || (i % 10) || '.example.com/p/' || i AS url,
                 j,
                 CAST(1700000000 + i * 7 + j * 86400 AS BIGINT) AS epoch,
                 md5('c' || i || '-' || j) AS digest,
                 CASE WHEN i % 4 <= 1 THEN '"e' || i || '"' END AS etag,
                 CASE WHEN i % 4 IN (1, 2)
                      THEN 'Mon, 0' || (i % 9) || ' Aug 2023 00:00:00 GMT'
                 END AS lm
          FROM d, unnest(generate_series(0, i % 2)) AS g(j)
          WHERE i % 3 <> 0),
        lat AS (
          SELECT url, digest AS prior_digest, etag, lm
          FROM caps
          QUALIFY row_number() OVER (
              PARTITION BY url ORDER BY epoch DESC) = 1),
        due AS (
          SELECT 'https://h' || (i % 10) || '.example.com/p/' || i AS url,
                 CAST(i % 5 AS INT) AS priority, i
          FROM d),
        plans AS (
          SELECT due.url, due.priority,
                 CASE WHEN lat.etag IS NOT NULL OR lat.lm IS NOT NULL
                      THEN 'conditional' ELSE 'full' END AS mode,
                 lat.etag AS if_none_match,
                 lat.lm AS if_modified_since,
                 lat.prior_digest
          FROM due LEFT JOIN lat ON due.url = lat.url),
        resp AS (
          SELECT 'https://h' || (i % 10) || '.example.com/p/' || i AS url,
                 CAST(1700000000 + i * 7 + 864000 AS BIGINT) AS epoch,
                 CAST(CASE i % 5 WHEN 0 THEN 304 WHEN 3 THEN 503
                      WHEN 4 THEN 304 ELSE 200 END AS INT) AS status,
                 CASE WHEN i % 5 = 1 THEN 'c' || i || '-' || (i % 2)
                      WHEN i % 5 = 2 THEN 'x' || i END AS payload,
                 CASE WHEN i % 5 = 2 THEN '"n' || i || '"' END AS r_etag,
                 CASE WHEN i % 5 = 1
                      THEN 'Tue, 02 Aug 2023 00:00:00 GMT' END AS r_lm
          FROM d),
        folded AS (
          SELECT r.url, r.epoch, r.status,
                 CASE WHEN r.status = 304 AND l.prior_digest IS NOT NULL
                          THEN 'not_modified'
                      WHEN r.status BETWEEN 200 AND 299
                           AND l.prior_digest IS NULL THEN 'new'
                      WHEN r.status BETWEEN 200 AND 299
                           AND md5(r.payload) = l.prior_digest
                          THEN 'unchanged_body'
                      WHEN r.status BETWEEN 200 AND 299 THEN 'modified'
                      ELSE 'error' END AS disposition
          FROM resp r LEFT JOIN lat l ON r.url = l.url),
        out AS (
          SELECT f.url, f.epoch, f.status, f.disposition,
                 f.disposition <> 'error' AS is_capture,
                 f.status BETWEEN 200 AND 299
                     AND f.disposition <> 'error' AS store_body,
                 CASE WHEN f.disposition = 'not_modified'
                          THEN l.prior_digest
                      WHEN f.status BETWEEN 200 AND 299
                          THEN md5(r.payload) END AS digest,
                 CASE WHEN f.disposition = 'not_modified' THEN l.etag
                      WHEN f.status BETWEEN 200 AND 299 THEN r.r_etag
                 END AS etag,
                 CASE WHEN f.disposition = 'not_modified' THEN l.lm
                      WHEN f.status BETWEEN 200 AND 299 THEN r.r_lm
                 END AS last_modified,
                 CASE WHEN f.disposition = 'not_modified' THEN FALSE
                      WHEN f.status BETWEEN 200 AND 299
                           AND l.prior_digest IS NOT NULL
                          THEN md5(r.payload) <> l.prior_digest
                 END AS changed
          FROM folded f
          JOIN resp r ON r.url = f.url
          LEFT JOIN lat l ON f.url = l.url)
        SELECT p.url, p.priority, p.mode, p.if_none_match,
               p.if_modified_since, p.prior_digest,
               o.epoch, o.status, o.disposition, o.is_capture,
               o.store_body, o.digest, o.etag, o.last_modified, o.changed
        FROM plans p JOIN out o ON p.url = o.url
    """
    # Shark-search scoring: anchor explode + in-row parent relevance +
    # per-target max, replayed with the byte-identical ANCHOR_RE. All
    # weights are powers of two → exact double equality, no rounding.
    d["focus_outlink_scores"] = """
        WITH p AS (
          SELECT doc_id AS i,
                 CASE WHEN doc_id % 5 = 0
                      THEN coalesce(text, '') || ' kowloon flat'
                      ELSE coalesce(text, '') END AS ptext,
                 '<a href="https://t.example.com/a/' || (doc_id % 50)
                   || '">'
                   || CASE doc_id % 3
                        WHEN 0 THEN 'kowloon flat ' || doc_id
                        WHEN 1 THEN 'nathan road walk'
                        ELSE 'football news' END
                   || '</a><a href="https://t.example.com/b/'
                   || (doc_id % 40) || '">more info</a>' AS html
          FROM documents),
        anch AS (
          SELECT i, ptext,
                 unnest(regexp_extract_all(html,
                     '<a href="([^"]*)"[^>]*>([^<]*)</a>', 1)) AS url,
                 unnest(regexp_extract_all(html,
                     '<a href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS atxt
          FROM p),
        rels AS (
          SELECT url,
                 (CAST(contains(lower(atxt), 'kowloon flat') AS INT)
                  + CAST(contains(lower(atxt), 'nathan road') AS INT))
                     / 2.0 AS arel,
                 (CAST(contains(lower(ptext), 'kowloon flat') AS INT)
                  + CAST(contains(lower(ptext), 'nathan road') AS INT))
                     / 2.0 AS prel
          FROM anch)
        SELECT url,
               max(0.5 * (0.5 * prel)
                   + 0.5 * (0.75 * arel + 0.25 * prel)) AS potential,
               count(*) AS n_parents,
               max(arel) AS best_anchor_rel
        FROM rels
        GROUP BY url
    """
    # Crawl scope verdicts stated analytically: host mode = the two
    # exact seed hosts, domain mode = the two eTLD+1 registrants across
    # all their subdomain shapes, surt_prefix = seed-2's host any path
    # (seed-1's /x/1 prefix matches no constructed path); /cal/ rows are
    # excluded everywhere.
    d["crawl_scope_filter"] = """
        WITH f AS (
          SELECT doc_id,
                 doc_id % 4 AS m,
                 doc_id % 7 AS k,
                 'https://'
                 || CASE doc_id % 4
                      WHEN 0 THEN 'a.b.shop' || (doc_id % 7) || '.co.uk'
                      WHEN 1 THEN 'shop' || (doc_id % 7) || '.co.uk'
                      WHEN 2 THEN 'sub.shop' || (doc_id % 7) || '.com'
                      ELSE 'shop' || (doc_id % 7) || '.com' END
                 || CASE WHEN doc_id % 11 = 0
                         THEN '/cal/' || doc_id
                         ELSE '/p/' || doc_id END AS url_canon
          FROM documents
          WHERE doc_id % 11 <> 0)
        SELECT doc_id, url_canon, 'host' AS mode FROM f
        WHERE (m = 1 AND k = 0) OR (m = 3 AND k = 1)
        UNION ALL
        SELECT doc_id, url_canon, 'domain' FROM f
        WHERE (m IN (0, 1) AND k = 0) OR (m IN (2, 3) AND k = 1)
        UNION ALL
        SELECT doc_id, url_canon, 'surt_prefix' FROM f
        WHERE m = 3 AND k = 1
    """
    # Seeded global training-order shuffle: the rank definition IS
    # row_number over (md5 order key, tiebreak keys) — the engine-side
    # bucket-window + offset-join construction must be bit-identical to
    # the naive global window (also pinned in test_sampling_packing.py).
    d["training_order_sample"] = """
        WITH ordered AS (
          SELECT doc_id, lang,
                 md5('epoch0' || chr(31) || CAST(doc_id AS VARCHAR))
                     AS okey
          FROM documents)
        SELECT CAST(row_number() OVER (ORDER BY okey, doc_id) - 1
                    AS BIGINT) AS order_rank,
               substr(okey, 1, 2) AS shuffle_bucket,
               doc_id, lang
        FROM ordered
        ORDER BY order_rank
        LIMIT 500
    """
    # Duplicated-span coverage: the test_spandedup.py DuckDB twin
    # (gram → count>=2 → island merge) extended with the entry's
    # lang/source/dup_frac projection.
    d["span_dedup_profile"] = """
        WITH toks AS (
          SELECT doc_id, lang, source,
                 CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ',
                                               'g')) = ''
                      THEN [] :: varchar[]
                      ELSE string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), ' ')
                 END AS t
          FROM documents),
        g AS (
          SELECT doc_id, i - 1 AS s,
                 array_to_string(t[i:i+7], chr(31)) AS gram
          FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
          WHERE len(t) >= 8),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        hits AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN dup USING (gram)),
        isl AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                      THEN 1 ELSE 0 END AS brk
          FROM hits),
        isl2 AS (
          SELECT doc_id, s, e,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
          FROM isl),
        merged AS (
          SELECT doc_id, min(s) AS s, max(e) AS e
          FROM isl2 GROUP BY doc_id, island),
        cov AS (
          SELECT doc_id, sum(e - s) AS dup_tokens
          FROM merged GROUP BY doc_id)
        SELECT t.doc_id, t.lang, t.source,
               len(t.t) :: BIGINT AS n_tokens,
               coalesce(c.dup_tokens, 0) :: BIGINT AS dup_tokens,
               round(CASE WHEN len(t.t) <= 0 THEN 0.0
                          ELSE coalesce(c.dup_tokens, 0) * 1.0 / len(t.t)
                     END, 6) AS dup_frac
        FROM toks t LEFT JOIN cov c USING (doc_id)
    """
    # Span REMOVAL twin: same gram/island CTEs, then token positions
    # anti-joined against merged intervals and re-joined in order;
    # md5 of the rebuilt text compared byte-for-byte. A fully-duplicated
    # doc rebuilds to '' (md5('') on both engines); n_kept counts the
    # survivors (0 for empty rebuilds, matching the engine's
    # size(split('',' ')) guard).
    d["span_dedup_removal"] = """
        WITH toks AS (
          SELECT doc_id, lang,
                 CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ',
                                               'g')) = ''
                      THEN [] :: varchar[]
                      ELSE string_split(trim(regexp_replace(lower(text),
                           '\\s+', ' ', 'g')), ' ')
                 END AS t
          FROM documents),
        g AS (
          SELECT doc_id, i - 1 AS s,
                 array_to_string(t[i:i+7], chr(31)) AS gram
          FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
          WHERE len(t) >= 8),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        hits AS (SELECT doc_id, s, s + 8 AS e FROM g JOIN dup USING (gram)),
        isl AS (
          SELECT doc_id, s, e,
                 CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                      THEN 1 ELSE 0 END AS brk
          FROM hits),
        isl2 AS (
          SELECT doc_id, s, e,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island
          FROM isl),
        merged AS (
          SELECT doc_id, min(s) AS s, max(e) AS e
          FROM isl2 GROUP BY doc_id, island),
        pos AS (
          SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
        kept AS (
          SELECT p.doc_id, p.p, p.tok
          FROM pos p LEFT JOIN merged m
            ON p.doc_id = m.doc_id AND p.p >= m.s AND p.p < m.e
          WHERE m.doc_id IS NULL),
        reb AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(tok, ' ' ORDER BY p) AS txt
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id, t.lang,
               coalesce(r.n_kept, 0) :: BIGINT AS n_kept,
               md5(coalesce(r.txt, '')) AS dedup_md5
        FROM toks t LEFT JOIN reb r USING (doc_id)
    """
    # RFC 9309 rules + politeness scheduler, analytic oracle: even hosts
    # carry Disallow:/ with an Allow:/listing/ carve-out (longest match
    # wins), odd hosts deny /*.pdf$ and /admin/ — so exactly the
    # doc_id%3==0 listing URLs survive on every host, and with <=21 urls
    # per host against a 1000-request budget every survivor schedules;
    # host_rank is the scheduler's (priority, ts, url_canon) issue order,
    # here reduced to the url_canon tiebreak.
    d["robots_rfc_schedule"] = """
        WITH u AS (
          SELECT 'https://h' || (doc_id % 8) || '.example.com/listing/'
                     || doc_id AS url_canon,
                 'h' || (doc_id % 8) || '.example.com' AS host
          FROM documents WHERE doc_id % 3 = 0)
        SELECT url_canon, host,
               row_number() OVER (PARTITION BY host ORDER BY url_canon)
                   AS host_rank
        FROM u
    """
    # Sitemap discovery, analytic oracle: the planted listing URLs are
    # exactly what the robots -> sitemap(-index) -> <loc> round trip must
    # emit as seeds, regardless of the leaf/index hop split.
    d["sitemap_discovery"] = """
        SELECT DISTINCT
               'https://h' || (doc_id % 8) || '.example.com/listing/'
                   || doc_id AS url,
               1 AS priority
        FROM documents WHERE doc_id < 200
        ORDER BY url
    """
    # Packed-bin rendering: the sample_pack_corpus window twin extended
    # to the rendered sequence (md5 of the sep-joined texts in id order)
    # and the exclusive offset boundaries.
    d["packed_sequences"] = """
        WITH packed AS (
          SELECT doc_id, text, n_chars AS n_tokens,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
                 CAST(floor(
                     (sum(n_chars) OVER (
                          PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 2)
                          ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                      - n_chars) / 20000.0) AS BIGINT) AS bin_id
          FROM documents),
        cums AS (
          SELECT *, CAST(sum(n_tokens) OVER (
                        PARTITION BY bucket, bin_id ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
          FROM packed)
        SELECT bucket, bin_id,
               CAST(count(*) AS INT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS fill,
               md5(string_agg(text, chr(10) || '<|eos|>' || chr(10)
                              ORDER BY doc_id)) AS seq_md5,
               '0,' || string_agg(CAST(cum AS VARCHAR), ','
                                  ORDER BY doc_id) AS offsets_csv
        FROM cums GROUP BY bucket, bin_id
    """
    # Rendezvous shard ownership: the exact md5 argmax the Spark
    # expression computes, per distinct host, re-joined to the url rows.
    d["fetch_shard_assign"] = """
        WITH u AS (
          SELECT 'h' || (o_custkey % 40) || '.example.com' AS host
          FROM orders),
        w AS (
          SELECT host, CAST(s AS INT) AS s,
                 md5(host || ':' || s || ':0') AS wt
          FROM (SELECT DISTINCT host FROM u)
          CROSS JOIN range(8) t(s)),
        own AS (
          SELECT host, arg_max(s, wt) AS fetch_shard FROM w GROUP BY host)
        SELECT u.host, own.fetch_shard, count(*) AS n_urls
        FROM u JOIN own USING (host)
        GROUP BY u.host, own.fetch_shard
        ORDER BY u.host
    """
    # Adaptive politeness: sum/count mean (exact integer sum, one double
    # division), x2 clamp to [100, 5000], floor, then the greatest-merge
    # with the robots directive over a FULL OUTER host join.
    d["adaptive_politeness"] = """
        WITH log AS (
          SELECT 'h' || (event_id % 37) || '.example.com' AS host,
                 (event_id * 7919) % 1900 + 20 AS latency_ms
          FROM events),
        robots AS (
          SELECT 'h' || i || '.example.com' AS host,
                 CAST(500 + 40 * i AS INT) AS r_ms
          FROM range(37) t(i) WHERE i % 5 = 0
          UNION ALL
          SELECT 'h99.example.com', CAST(700 AS INT)),
        a AS (
          SELECT host, count(latency_ms) AS n_fetches,
                 sum(latency_ms) / count(latency_ms) AS avg_latency_ms,
                 CAST(floor(least(5000.0, greatest(100.0,
                   2.0 * (sum(latency_ms) / count(latency_ms))))) AS BIGINT)
                   AS adaptive_ms
          FROM log GROUP BY host)
        SELECT coalesce(a.host, robots.host) AS host,
               a.n_fetches, a.avg_latency_ms,
               CAST(greatest(coalesce(r_ms, 100),
                             coalesce(adaptive_ms, 0)) AS INT)
                 AS crawl_delay_ms
        FROM a FULL OUTER JOIN robots ON a.host = robots.host
    """
    # CCNet paragraph dedup: split on blank lines, normalize (lower /
    # collapse whitespace / digits->0), keep only the globally-first
    # (doc_id, pos) copy of each normalized paragraph, rebuild in order.
    # The first-copy window runs over COUNTABLE rows only (short
    # structural paragraphs are kept unconditionally and must not steal
    # the window's first slot from an equal-norm long paragraph).
    d["paragraph_dedup"] = """
        WITH pages AS (
          SELECT doc_id,
                 'shared header class '
                   || substring('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
                   || ' for every page in this class'
                   || chr(10) || chr(10) || text || chr(10) || chr(10)
                   || 'shared footer variant '
                   || substring('xyz', CAST(doc_id % 3 AS INT) + 1, 1)
                   AS text
          FROM documents),
        p AS (
          SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, parts[g.i] AS para
          FROM (SELECT doc_id,
                       string_split(text, chr(10) || chr(10)) AS parts
                FROM pages),
               unnest(generate_series(1, len(parts))) g(i)),
        n AS (
          SELECT *,
                 regexp_replace(regexp_replace(trim(lower(para)),
                                '\\s+', ' ', 'g'), '[0-9]', '0', 'g') AS norm,
                 len(trim(para)) >= 10 AS countable
          FROM p),
        w AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY norm
                                    ORDER BY doc_id, pos) AS rn
          FROM n WHERE countable),
        k AS (
          SELECT n.doc_id, n.pos, n.para,
                 (NOT n.countable) OR w.rn = 1 AS keep
          FROM n LEFT JOIN w ON n.doc_id = w.doc_id AND n.pos = w.pos)
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN keep THEN para END,
                        chr(10) || chr(10) ORDER BY pos), '') AS text,
               count(*) AS n_paras,
               sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped_paras
        FROM k GROUP BY doc_id
    """
    # TF-IDF keywords: same tokenization as token_vocab_top, smoothed
    # idf = ln((1+N)/(1+df)) + 1, rank over round(score, 9) with
    # (tf desc, df asc, token asc) tie-breaks — the rounding makes the
    # selection immune to last-ulp ln() differences between engines.
    d["tfidf_keywords"] = """
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
          FROM documents),
        toks AS (
          SELECT doc_id, unnest(string_split(t, ' ')) AS token
          FROM norm WHERE t <> ''),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                 tf.tf * (ln((1 + n.n_docs) / (1.0 + dfreq.df)) + 1)
                   AS score
          FROM tf, dfreq, n WHERE tf.token = dfreq.token),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY round(score, 9) DESC, tf DESC, df ASC,
                            token ASC) AS rank
          FROM scored)
        SELECT doc_id, rank, token, tf, df, round(score, 6) AS score
        FROM ranked WHERE rank <= 5
    """
    # Publish-date chain: same deterministic page construction, same
    # RE2-safe regexes, try_cast validation per channel, coalesce +
    # winning-channel label — engine-vs-engine on the actual parse.
    d["publish_dates"] = """
        WITH base AS (
          SELECT doc_id,
                 2000 + doc_id % 20 AS y,
                 1 + doc_id % 12 AS mo,
                 1 + doc_id % 28 AS dd,
                 1 + (doc_id + 7) % 28 AS dd2,
                 doc_id % 5 AS c
          FROM documents),
        b1 AS (
          SELECT *, printf('%04d-%02d-%02d', y, mo, dd) AS iso,
                 printf('%04d-%02d-%02d', y, mo, dd2) AS iso2
          FROM base),
        b2 AS (
          SELECT doc_id,
            CASE WHEN c = 0 THEN
                   '<script type="application/ld+json">{"datePublished":"'
                   || iso || '"}</script>'
                   || '<meta property="article:published_time" content="'
                   || iso2 || '"/>'
                 WHEN c = 1 THEN
                   '<script type="application/ld+json">'
                   || '{"datePublished":"2021-02-30"}</script>'
                   || '<meta property="article:published_time" content="'
                   || iso || '"/>'
                 ELSE '<p>no structured date</p>' END AS html,
            CASE WHEN c = 2 THEN
                   'http://h' || (doc_id % 50) || '.example/'
                   || (CASE WHEN doc_id % 10 = 7
                            THEN printf('%04d/%02d', y, mo)
                            ELSE printf('%04d/%02d/%02d', y, mo, dd) END)
                   || '/post'
                 ELSE 'http://h' || (doc_id % 50) || '.example/page/'
                      || doc_id END AS url,
            CASE WHEN c = 3 THEN 'updated ' || iso || ' end'
                 ELSE 'no date text' END AS text
          FROM b1),
        g AS (
          SELECT url,
            regexp_extract(url,
              '/((?:19|20)\\d{2})/(\\d{2})(?:/(\\d{2}))?/', 1) AS uy,
            regexp_extract(url,
              '/((?:19|20)\\d{2})/(\\d{2})(?:/(\\d{2}))?/', 2) AS um,
            regexp_extract(url,
              '/((?:19|20)\\d{2})/(\\d{2})(?:/(\\d{2}))?/', 3) AS ud,
            try_cast(nullif(regexp_extract(html,
              '"datePublished"\\s*:\\s*"((?:19|20)\\d{2}-\\d{2}-\\d{2})', 1),
              '') AS DATE) AS c1,
            try_cast(nullif(regexp_extract(html,
              '<meta property="article:published_time" content="((?:19|20)\\d{2}-\\d{2}-\\d{2})',
              1), '') AS DATE) AS c2,
            try_cast(nullif(regexp_extract(text,
              '((?:19|20)\\d{2}-\\d{2}-\\d{2})', 1), '') AS DATE) AS c4
          FROM b2),
        ext AS (
          SELECT url, c1, c2, c4,
            try_cast(nullif(CASE WHEN uy <> '' THEN uy || '-' || um || '-'
                   || (CASE WHEN ud = '' THEN '01' ELSE ud END)
                 ELSE '' END, '') AS DATE) AS c3
          FROM g)
        SELECT url,
               CAST(coalesce(c1, c2, c3, c4) AS VARCHAR) AS publish_date,
               CASE WHEN c1 IS NOT NULL THEN 'jsonld'
                    WHEN c2 IS NOT NULL THEN 'meta'
                    WHEN c3 IS NOT NULL THEN 'url'
                    WHEN c4 IS NOT NULL THEN 'text' END AS date_source
        FROM ext
    """
    # Epoch-aware mixture upsampling: shares are embedded as exact
    # repr() doubles so (share*total)/count reproduces the engine's
    # Python arithmetic bit-for-bit; threshold = trunc(frac*16^8) as
    # %08x (rate_to_hex), membership = the same md5(salt, key) prefix
    # compare; epochs = generate_series explode.
    _ws = sum(_UPSAMPLE_W.values())
    _cfg = ", ".join(
        f"('{k}', {v / _ws!r})" for k, v in _UPSAMPLE_W.items()
    )
    d["mixture_upsample"] = f"""
        WITH cnt AS (
          SELECT source, count(*) AS n FROM documents GROUP BY 1),
        cfg(source, share) AS (VALUES {_cfg}),
        rates AS (
          SELECT c.source, (cfg.share * {_UPSAMPLE_TOTAL}) / c.n AS r
          FROM cnt c JOIN cfg ON c.source = cfg.source),
        plan AS (
          SELECT source,
                 CASE WHEN floor(r) >= 4 THEN 4
                      ELSE CAST(floor(r) AS INT) END AS n_full,
                 CASE WHEN floor(r) >= 4 THEN 0.0
                      ELSE r - floor(r) END AS frac
          FROM rates),
        thr AS (
          SELECT source, n_full,
                 CASE WHEN CAST(trunc(frac * 4294967296.0) AS BIGINT)
                           >= 4294967296 THEN 'gggggggg'
                      ELSE printf('%08x',
                             CAST(trunc(frac * 4294967296.0) AS BIGINT))
                 END AS hexthr
          FROM plan),
        m AS (
          SELECT d.doc_id, d.source,
                 t.n_full
                 + CASE WHEN substr(md5(concat_ws(chr(31), 'r4:extra',
                            CAST(d.doc_id AS VARCHAR))), 1, 8) < t.hexthr
                        THEN 1 ELSE 0 END AS n_copies
          FROM documents d JOIN thr t ON d.source = t.source)
        SELECT doc_id, source, CAST(g.epoch AS INT) AS epoch
        FROM m, unnest(generate_series(0, n_copies - 1)) g(epoch)
        WHERE n_copies > 0
    """
    # Temperature mixture, alpha=0.5: weight = sqrt(n) (IEEE-exact on
    # both engines), normalization = left-to-right fold in sorted-lang
    # order (list_sum over an ORDER BY list == Python sum over sorted
    # dict), then the identical rate -> epochs -> md5-threshold chain
    # as mixture_upsample. total=600, max_epochs=4, salt='r4t'.
    d["temperature_mixture"] = """
        WITH cnt AS (
          SELECT lang AS s, count(*) AS n FROM documents
          WHERE lang IS NOT NULL GROUP BY 1),
        tot AS (
          SELECT list_sum(list(sqrt(n::DOUBLE) ORDER BY s)) AS wsum
          FROM cnt),
        rates AS (
          SELECT c.s, ((sqrt(c.n::DOUBLE) / t.wsum) * 600) / c.n AS r
          FROM cnt c, tot t),
        plan AS (
          SELECT s,
                 CASE WHEN floor(r) >= 4 THEN 4
                      ELSE CAST(floor(r) AS INT) END AS n_full,
                 CASE WHEN floor(r) >= 4 THEN 0.0
                      ELSE r - floor(r) END AS frac
          FROM rates),
        thr AS (
          SELECT s, n_full,
                 CASE WHEN CAST(trunc(frac * 4294967296.0) AS BIGINT)
                           >= 4294967296 THEN 'gggggggg'
                      ELSE printf('%08x',
                             CAST(trunc(frac * 4294967296.0) AS BIGINT))
                 END AS hexthr
          FROM plan),
        m AS (
          SELECT d.doc_id, d.lang,
                 t.n_full
                 + CASE WHEN substr(md5(concat_ws(chr(31), 'r4t:extra',
                            CAST(d.doc_id AS VARCHAR))), 1, 8) < t.hexthr
                        THEN 1 ELSE 0 END AS n_copies
          FROM documents d JOIN thr t ON d.lang = t.s)
        SELECT doc_id, lang, CAST(g.epoch AS INT) AS epoch
        FROM m, unnest(generate_series(0, n_copies - 1)) g(epoch)
        WHERE n_copies > 0
    """
    # Per-site boilerplate: per-(source, normalized line) DF > 3 drops;
    # the cross-source bucket-marker line survives (df ~1 per source);
    # ordered rebuild md5-compared byte-for-byte.
    d["host_boilerplate_strip"] = """
        WITH pages AS (
          SELECT doc_id, source,
                 concat_ws(chr(10),
                   'shared navigation menu for ' || source,
                   'bucket marker line number '
                       || CAST(doc_id % 37 AS VARCHAR) || ' padding',
                   text,
                   'copyright footer of site ' || source) AS text
          FROM documents),
        lines AS (
          SELECT doc_id, source, i - 1 AS pos, l[i] AS line
          FROM (SELECT doc_id, source,
                       string_split(text, chr(10)) AS l FROM pages),
               unnest(generate_series(1, len(l))) AS u(i)),
        hot AS (
          SELECT source, trim(lower(line)) AS nline
          FROM lines WHERE length(trim(line)) >= 10
          GROUP BY 1, 2 HAVING count(DISTINCT doc_id) > 3),
        kept AS (
          SELECT li.doc_id, li.source, li.pos, li.line
          FROM lines li LEFT JOIN hot h
            ON li.source = h.source AND trim(lower(li.line)) = h.nline
          WHERE h.nline IS NULL OR length(trim(li.line)) < 10),
        reb AS (
          SELECT doc_id, source,
                 string_agg(line, chr(10) ORDER BY pos) AS text
          FROM kept GROUP BY 1, 2)
        SELECT p.doc_id, p.source, md5(coalesce(r.text, '')) AS text_md5
        FROM pages p LEFT JOIN reb r USING (doc_id, source)
    """
    # rel=canonical, analytic oracle: expected resolution per case
    # (absolute pass-through, base scheme for //, base origin for /,
    # base directory for plain relatives, NULL for none and '..').
    d["canonical_links"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 3
                    THEN 'https://h3.example.com/dir/page' || doc_id
                    ELSE 'https://h' || (doc_id % 6)
                         || '.example.com/a/b' || doc_id END AS url_canon,
               CASE doc_id % 6
                 WHEN 0 THEN 'https://c0.example.com/page' || (doc_id % 7)
                 WHEN 1 THEN 'https://h1.example.com/canon/' || doc_id
                 WHEN 2 THEN 'https://cdn.example.org/p/' || doc_id
                 WHEN 3 THEN 'https://h3.example.com/dir/c' || doc_id
                             || '.html'
                 ELSE NULL
               END AS canonical
        FROM documents
    """
    # Blocklist gate, analytic oracle: the nested host matches BOTH
    # entries -> longest (malware) wins; the ccTLD entry blocks its
    # subdomain; the deep entry blocks only its own id%3 slice.
    d["blocklist_gate"] = """
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'https://ads.tracker' || (doc_id % 3)
                             || '.com/x/' || doc_id
                 WHEN 1 THEN 'https://shop.example.co.uk/' || doc_id
                 WHEN 2 THEN 'https://mail.bad.example.co.uk/' || doc_id
                 ELSE 'https://clean.site' || (doc_id % 5) || '.org/'
                          || doc_id
               END AS url_canon,
               CASE
                 WHEN doc_id % 4 = 2 THEN 'malware'
                 WHEN doc_id % 4 = 1 THEN 'commerce'
                 WHEN doc_id % 4 = 0 AND doc_id % 3 = 0 THEN 'ads'
                 ELSE NULL
               END AS blocked_category
        FROM documents
    """
    # Streaming matview: three exactly-once waves + per-batch delta
    # refreshes must land exactly on the full GROUP BY.
    d["streaming_matview"] = """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source
    """
    # Incremental rollup: three delta refreshes (one folding two
    # snapshots, one a no-op) must land exactly on the full GROUP BY.
    d["incremental_rollup"] = """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM documents GROUP BY lang
    """
    # Script profile: RE2 \p{Script} classes == Java \p{IsScript}
    # (membership probed in tests); same length-difference counting,
    # same fixed dominant-script tie-break order.
    _scr = [
        "latin", "cyrillic", "greek", "arabic",
        "han", "hangul", "hiragana", "katakana",
    ]
    _cnts = ",\n                 ".join(
        f"length(text) - length(regexp_replace(text, '\\p{{{s.title()}}}',"
        f" '', 'g')) AS n_{s}"
        for s in _scr
    )
    _tot = " + ".join(f"n_{s}" for s in _scr)
    _mx = "greatest(" + ", ".join(f"n_{s}" for s in _scr) + ")"
    _dom = "CASE\n                 " + "\n                 ".join(
        f"WHEN {_mx} > 0 AND n_{s} = {_mx} THEN '{s}'" for s in _scr
    ) + "\n                 ELSE 'none' END"
    d["script_profile"] = f"""
        WITH c AS (
          SELECT doc_id, length(text) :: BIGINT AS n_chars,
                 {_cnts}
          FROM documents)
        SELECT doc_id, n_chars,
               {", ".join(f"n_{s} :: BIGINT AS n_{s}" for s in _scr)},
               ({_tot}) :: BIGINT AS n_script_chars,
               {_dom} AS dominant_script,
               CASE WHEN ({_tot}) <= 0 THEN 0.0
                    ELSE round({_mx} * 1.0 / ({_tot}), 6) END
                   AS dominant_frac
        FROM c
    """
    # Distributed BPE: the twin unrolls the 10 merge iterations
    # (_bpe_sql) — wrapped-symbol strings + one replace per merge ==
    # the engine's greedy fold, argmax under the identical tie-break.
    d["bpe_learn"] = _bpe_sql(_BPE_MERGES)
    d["bpe_vocab"] = _bpe_sql(_BPE_MERGES, final_vocab=True)
    d["bpe_fertility"] = _bpe_sql(_BPE_MERGES, final_vocab="fertility")
    d["bpe_encode_tokens"] = _bpe_sql(_BPE_MERGES, final_vocab="encode")
    d["minhash_lsh_candidates"] = f"""
        WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(t[i:i+2], ' ') AS shingle
               FROM tk, unnest(generate_series(1, len(t) - 2)) AS u(i)
               WHERE len(t) >= 3),
        hx AS (SELECT doc_id, j,
                      min(('0x' || substr(md5(shingle || '#' || j),
                           1, 14))::BIGINT) AS m
               FROM sh, unnest(generate_series(0, 63)) AS g(j)
               GROUP BY 1, 2),
        bk AS (SELECT doc_id, j // 4 AS band,
                      string_agg(m::VARCHAR, '#' ORDER BY j) AS key
               FROM hx GROUP BY doc_id, band)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bk l JOIN bk r USING (band, key)
        WHERE l.doc_id < r.doc_id
    """
    d["unigram_encode_pieces"] = _unigram_encode_sql(_UNI_VOCAB)
    d["unigram_fertility_fixed"] = _unigram_encode_sql(
        _UNI_VOCAB, fertility=True
    )
    d["cdc_payload_dedup"] = _cdc_sql()
    _SEEN_URLS_SQL = """
        SELECT 'https://h' || (doc_id % 10) || '.example.com/d/' || doc_id
                   AS url_canon,
               CAST(doc_id * 7919 AS BIGINT) AS url_hash,
               CAST(doc_id % 8 AS INT) AS bucket
        FROM documents WHERE doc_id < 400
    """
    d["streaming_stateful_dedup"] = _SEEN_URLS_SQL
    d["streaming_tws_dedup"] = _SEEN_URLS_SQL

    d["streaming_lsh_neardup"] = _stream_neardup_sql()
    _MD5GRID = ("((('0x' || substr(md5({R} || '#' || d.d), 1, 14))::BIGINT"
                " % 2001 - 1000) / 1000.0)")
    d["lsh_ann_topk"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        pl AS (SELECT r.r AS row, list({_MD5GRID.format(R='r.r')}
                          ORDER BY d.d) AS pv
               FROM unnest(generate_series(0, 59)) r(r),
                    unnest(generate_series(0, 63)) d(d)
               GROUP BY 1),
        sig AS (SELECT e.vec_id, pl.row // 5 AS tbl,
                       CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) > 0
                                THEN (1 << (pl.row % 5)) ELSE 0 END)
                            AS BIGINT) AS sig
                FROM e CROSS JOIN pl
                GROUP BY 1, 2),
        cands AS (SELECT DISTINCT qs.vec_id AS qid, vs.vec_id AS nid
                  FROM sig vs JOIN sig qs USING (tbl, sig)
                  WHERE qs.vec_id % 25 = 0 AND vs.vec_id <> qs.vec_id),
        scored AS (SELECT c.qid, c.nid,
                          round(list_dot_product(q.v, n.v) /
                                (sqrt(list_dot_product(q.v, q.v)) *
                                 sqrt(list_dot_product(n.v, n.v))), 6)
                              AS cos_sim
                   FROM cands c
                   JOIN e q ON q.vec_id = c.qid
                   JOIN e n ON n.vec_id = c.nid)
        SELECT qid, nid, cos_sim,
               CAST(rnk AS INT) AS rnk
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY cos_sim DESC, nid) AS rnk
              FROM scored)
        WHERE rnk <= 5
    """
    d["ivf_ann_topk"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        ct AS (SELECT r.r AS cell, list({_MD5GRID.format(R='r.r')}
                          ORDER BY d.d) AS cv
               FROM unnest(generate_series(0, 15)) r(r),
                    unnest(generate_series(0, 63)) d(d)
               GROUP BY 1),
        sims AS (SELECT e.vec_id, ct.cell,
                        list_dot_product(e.v, ct.cv) AS s
                 FROM e CROSS JOIN ct),
        ranked AS (SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell) AS cr
                   FROM sims),
        vcell AS (SELECT vec_id, cell FROM ranked WHERE cr = 1),
        qcell AS (SELECT vec_id AS qid, cell FROM ranked
                  WHERE cr <= 6 AND vec_id % 25 = 0),
        cands AS (SELECT DISTINCT q.qid, v.vec_id AS nid
                  FROM vcell v JOIN qcell q USING (cell)
                  WHERE v.vec_id <> q.qid),
        scored AS (SELECT c.qid, c.nid,
                          round(list_dot_product(q.v, n.v) /
                                (sqrt(list_dot_product(q.v, q.v)) *
                                 sqrt(list_dot_product(n.v, n.v))), 6)
                              AS cos_sim
                   FROM cands c
                   JOIN e q ON q.vec_id = c.qid
                   JOIN e n ON n.vec_id = c.nid)
        SELECT qid, nid, cos_sim,
               CAST(rnk AS INT) AS rnk
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY cos_sim DESC, nid) AS rnk
              FROM scored)
        WHERE rnk <= 5
    """

    d["streaming_recrawl"] = """
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400),
        c1 AS (SELECT 'https://h' || (doc_id % 10) || '.example.com/d/'
                          || doc_id AS url,
                      CAST(1700000000 + doc_id AS BIGINT) AS ts,
                      (('0x' || substr(md5('https://h' || (doc_id % 10)
                           || '.example.com/d/' || doc_id), 1, 14))::BIGINT
                       % 3 = 0) AS flip
               FROM d),
        k1 AS (SELECT url,
                      CAST(1 AS BIGINT) AS n_captures,
                      CAST(0 AS BIGINT) AS n_changes,
                      CAST(NULL AS DOUBLE) AS avg_interval_s,
                      CAST(NULL AS DOUBLE) AS lambda_per_day,
                      CAST(2592000 AS DOUBLE) AS refetch_interval_s,
                      ts + 2592000 AS next_fetch_epoch
               FROM c1),
        k2base AS (SELECT url, ts + 86400 AS last_ts,
                          CASE WHEN flip THEN 1 ELSE 0 END AS x,
                          CAST(86400 AS BIGINT)
                              / CAST(1 AS DOUBLE) AS avg_s
                   FROM c1),
        k2lam AS (SELECT *,
                         -ln((1 - x + CAST(0.5 AS DOUBLE))
                             / (1 + CAST(0.5 AS DOUBLE))) / avg_s AS lam
                  FROM k2base),
        k2 AS (SELECT url,
                      CAST(2 AS BIGINT) AS n_captures,
                      CAST(x AS BIGINT) AS n_changes,
                      avg_s AS avg_interval_s,
                      lam * 86400.0 AS lambda_per_day,
                      CASE WHEN lam > 0
                           THEN least(greatest(1.0 / lam,
                                               CAST(3600 AS DOUBLE)),
                                      CAST(2592000 AS DOUBLE))
                           ELSE CAST(2592000 AS DOUBLE) END
                          AS refetch_interval_s,
                      CAST(NULL AS BIGINT) AS next_fetch_epoch,
                      last_ts
               FROM k2lam)
        SELECT url, n_captures, n_changes,
               round(avg_interval_s, 6) AS avg_interval_s,
               round(lambda_per_day, 6) AS lambda_per_day,
               round(refetch_interval_s, 6) AS refetch_interval_s,
               next_fetch_epoch
        FROM k1
        UNION ALL
        SELECT url, n_captures, n_changes,
               round(avg_interval_s, 6) AS avg_interval_s,
               round(lambda_per_day, 6) + 0.0 AS lambda_per_day,
               round(refetch_interval_s, 6) AS refetch_interval_s,
               CAST(last_ts + floor(refetch_interval_s) AS BIGINT)
                   AS next_fetch_epoch
        FROM k2
    """

    d["streaming_windowed"] = """
        SELECT strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY 1, 2
    """
    d["streaming_corpus_ingest"] = f"""
        WITH d AS (SELECT doc_id, text, md5({_NORM}) AS fp,
                          round(0.4 * least(len({_TOKS}) / 100.0, 1.0)
                + 0.3 * least(len(list_filter({_TOKS}, x -> x IN
                      ('the','a','of','and','to','in','is','for')))
                      * 5.0 / greatest(len({_TOKS}), 1), 1.0)
                + 0.3 * (1.0 - least((length(text) - length(regexp_replace(
                      text, '[.,;:!?''"()-]', '', 'g')))
                      * 10.0 / greatest(length(text), 1), 1.0)), 6) AS quality
                   FROM documents),
        w1 AS (SELECT doc_id, fp, quality FROM d WHERE doc_id % 2 = 0),
        w2 AS (SELECT doc_id, fp, quality FROM d WHERE doc_id % 2 = 1
               UNION ALL
               SELECT doc_id + 1000000 AS doc_id, fp, quality
               FROM d WHERE doc_id % 4 = 0),
        s1 AS (SELECT doc_id, fp, quality FROM w1
               WHERE quality >= 0.0
               QUALIFY row_number() OVER (PARTITION BY fp
                   ORDER BY doc_id) = 1),
        s2 AS (SELECT doc_id, fp, quality FROM w2
               WHERE quality >= 0.0
                 AND fp NOT IN (SELECT fp FROM s1)
               QUALIFY row_number() OVER (PARTITION BY fp
                   ORDER BY doc_id) = 1)
        SELECT doc_id, fp, quality FROM s1
        UNION ALL
        SELECT doc_id, fp, quality FROM s2
    """

    d["embed_chunks"] = _embed_chunks_sql()

    d["extract_fields_replay"] = r"""
        WITH pg AS (
          SELECT doc_id,
            '<html><body><div id="content">' || text || '</div>'
            || CASE WHEN doc_id % 3 = 0
                 THEN '<span class="price">HK$ '
                      || format('{:,}', 1000000 + doc_id * 37) || '</span>'
                 ELSE '' END
            || CASE WHEN doc_id % 3 <> 2
                 THEN '<span class="address">No. ' || (doc_id % 999 + 1)
                      || ' Nathan Road</span>'
                 ELSE '' END
            || CASE WHEN doc_id % 2 = 0
                 THEN '<span class="area">' || (doc_id % 900 + 100)
                      || '.5 sq.ft</span>'
                 ELSE '' END
            || CASE WHEN doc_id % 4 = 1
                 THEN '<time class="txdate">17/05/2023</time>'
                 ELSE '<time class="txdate">2023-'
                      || lpad((doc_id % 12 + 1)::VARCHAR, 2, '0') || '-'
                      || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
                      || '</time>' END
            || '<a href="/p/' || doc_id
            || '"><a href="https://x.example/' || (doc_id % 7) || '">'
            AS html
          FROM documents),
        ex AS (
          SELECT doc_id, html,
                 NULLIF(regexp_extract(html,
                     '<time class="txdate">((?s:.*?))</time>', 1), '')
                     AS draw
          FROM pg)
        SELECT doc_id,
               md5(regexp_extract(html,
                   '<div id="content">((?s:.*?))</div>', 1)) AS text_md5,
               CAST(replace(NULLIF(regexp_extract(html,
                   '<span class="price">HK\$ ([0-9][0-9,]*)</span>', 1),
                   ''), ',', '') AS DOUBLE) AS price,
               NULLIF(regexp_extract(html,
                   '<span class="address">((?s:.*?))</span>', 1), '')
                   AS address,
               CAST(NULLIF(regexp_extract(html,
                   '<span class="area">([0-9]+(?:\.[0-9]+)?) sq\.ft</span>',
                   1), '') AS DOUBLE) AS floor_area,
               CASE WHEN regexp_matches(draw, '^\d{4}-\d{2}-\d{2}$')
                    THEN draw END AS tx_date,
               CAST(len(regexp_extract_all(html, '<a href="([^"]*)"'))
                    AS INT) AS n_outlinks
        FROM ex
    """

    d["simhash_neardup"] = f"""
        WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS tok
                    FROM documents),
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 14))::BIGINT AS hv
              FROM tk),
        votes AS (SELECT doc_id, i,
                         sum(CASE WHEN (hv >> i) & 1 = 1
                             THEN 1 ELSE -1 END) AS v
                  FROM h, unnest(generate_series(0, 55)) AS g(i)
                  GROUP BY 1, 2),
        fp AS (SELECT doc_id,
                      CAST(sum(CASE WHEN v > 0
                           THEN (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS f
               FROM votes GROUP BY 1)
        SELECT l.doc_id AS a, r.doc_id AS b,
               CAST(bit_count(xor(l.f, r.f)) AS INT) AS hamming
        FROM fp l JOIN fp r ON l.doc_id < r.doc_id
        WHERE bit_count(xor(l.f, r.f)) <= 3
    """
    return d
