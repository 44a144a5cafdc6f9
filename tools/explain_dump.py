"""Dump formatted physical plans of the headline operators → PLANS.md.

The plan properties asserted by tests/test_plans.py, made inspectable:
pushdown/pruning at the scan, broadcast fetch, single-exchange politeness
window, partial+final aggregation, one-Arrow-pass extraction.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def _star_tx(spark):
    import __spark_entry__ as E

    return E.queries()["star_transactions"](spark, SF)


def _star_trend(spark):
    import __spark_entry__ as E

    return E.queries()["star_price_trend"](spark, SF)


def _search_similar(spark):
    import __spark_entry__ as E

    return E.queries()["search_similar"](spark, SF)


def _hyperball_round(spark):
    # one round of the sketch recurrence over the rank-family synthetic
    # graph — the checkpointed loop would hide the join/agg shape, so
    # dump exactly one uncheckpointed round
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from hk_housing_datahub_spark.operators.linkgraph import _edge_set

    docs = E._t(spark, SF, "documents").select("doc_id")
    n = docs.count()
    linkers = docs.filter(F.pmod("doc_id", F.lit(11)) != 0)
    parts = [
        linkers.select(
            F.col("doc_id").alias("src"),
            F.pmod(F.col("doc_id") * a + b, F.lit(n)).alias("dst"),
        )
        for a, b in ((7, 1), (13, 5), (29, 11))
    ]
    e = _edge_set(parts[0].union(parts[1]).union(parts[2]), "src", "dst")
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
    return state.join(contrib, "node", "left").select(
        "node",
        F.hll_sketch_estimate(
            F.when(F.col("insk").isNull(), F.col("sk")).otherwise(
                F.hll_union("sk", "insk")
            )
        ).alias("est"),
    )


def _wiki_docs(spark):
    import __spark_entry__ as E

    return E.queries()["wiki_pipeline_docs"](spark, SF)


def _sample_pack(spark):
    import __spark_entry__ as E

    return E.queries()["sample_pack_corpus"](spark, SF)


def _prepare_corpus(spark):
    import __spark_entry__ as E

    return E.queries()["prepare_corpus"](spark, SF)


def _lm_score(spark):
    import __spark_entry__ as E

    return E.queries()["lm_perplexity_quality"](spark, SF)


def _span_profile(spark):
    import __spark_entry__ as E

    return E.queries()["span_dedup_profile"](spark, SF)


def _training_order(spark):
    import __spark_entry__ as E

    return E.queries()["training_order_sample"](spark, SF)


def _snapshot_diff(spark):
    import __spark_entry__ as E

    return E.queries()["cdx_snapshot_diff"](spark, SF)


def _recrawl(spark):
    import __spark_entry__ as E

    return E.queries()["recrawl_schedule"](spark, SF)


def _host_graph(spark):
    import __spark_entry__ as E

    return E.queries()["host_graph_rollup"](spark, SF)


def _dsir(spark):
    import __spark_entry__ as E

    return E.queries()["dsir_weights"](spark, SF)


def _warc_locs(spark):
    import __spark_entry__ as E

    return E.queries()["warc_cdx_locations"](spark, SF)


def _anchors(spark):
    import __spark_entry__ as E

    return E.queries()["anchor_text_rollup"](spark, SF)


def _mirrors(spark):
    import __spark_entry__ as E

    return E.queries()["mirror_hosts"](spark, SF)


def _sketches(spark):
    import __spark_entry__ as E

    return E.queries()["crawl_sketch_stats"](spark, SF)


def _revisits(spark):
    import __spark_entry__ as E

    return E.queries()["warc_revisits"](spark, SF)


def _dust(spark):
    import __spark_entry__ as E

    return E.queries()["dust_rule_mining"](spark, SF)


def _soft404(spark):
    import __spark_entry__ as E

    return E.queries()["soft404_flags"](spark, SF)


def _semdedup(spark):
    import __spark_entry__ as E

    return E.queries()["semdedup_drop"](spark, SF)


def _c4(spark):
    import __spark_entry__ as E

    return E.queries()["c4_clean_pages"](spark, SF)


def _neardup_probe(spark):
    """The steady-state cost of streaming near-dup ingestion: one batch's
    cross-batch convicting set against parquet-backed state tables."""
    import os as _os
    import tempfile

    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.streaming.neardup import (
        _band_index,
        _sig_array,
        cross_batch_drops,
    )

    docs = spark.read.parquet(_os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    state = _sig_array(
        docs.filter(F.pmod("doc_id", F.lit(2)) == 0), "doc_id", "text", 3, 64
    )
    root = tempfile.mkdtemp(prefix="hk_plan_neardup_")
    state.withColumn("bid", F.lit(0).cast("bigint")).write.parquet(
        _os.path.join(root, "sigs")
    )
    _band_index(state, 32, 64).withColumn(
        "bid", F.lit(0).cast("bigint")
    ).write.parquet(_os.path.join(root, "bands"))
    batch = _sig_array(
        docs.filter(F.pmod("doc_id", F.lit(2)) == 1), "doc_id", "text", 3, 64
    )
    return cross_batch_drops(
        batch,
        spark.read.parquet(_os.path.join(root, "bands")),
        spark.read.parquet(_os.path.join(root, "sigs")),
        64,
        32,
        0.5,
    )


def _bpe_pairs(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.bpe import (
        merge_pair,
        symbol_pair_counts,
        word_symbols,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    wf = docs.select(
        F.lit(1).alias("cnt"), word_symbols(F.col("text")).alias("syms")
    ).withColumn("syms", merge_pair(F.col("syms"), "a", "b"))
    return symbol_pair_counts(wf)


def _phrase(spark):
    from hk_housing_datahub_spark.operators.bm25 import phrase_search

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return phrase_search(docs, "table table")


def _script(spark):
    from hk_housing_datahub_spark.operators.textops import script_profile

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return script_profile(docs)


def _kn3(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.lm_quality import (
        fit_kneser_ney3,
        kn3_perplexity_score,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    lm = fit_kneser_ney3(docs.filter(F.pmod("doc_id", F.lit(2)) == 0))
    return kn3_perplexity_score(
        docs.filter(F.pmod("doc_id", F.lit(2)) == 1), lm
    )


def _nb(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.langid_nb import (
        fit_nb_langid,
        nb_language_scores,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    m = fit_nb_langid(docs.filter(F.pmod("doc_id", F.lit(2)) == 0))
    return nb_language_scores(docs.filter(F.pmod("doc_id", F.lit(2)) == 1), m)


def _winnow(spark):
    from hk_housing_datahub_spark.operators.dedup import winnow_overlap_pairs

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return winnow_overlap_pairs(docs, k=5, w=4)


def _readability(spark):
    from hk_housing_datahub_spark.operators.textops import readability_scores

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return readability_scores(docs)


def _bm25f(spark):
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.bm25 import bm25f_search

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    fields = docs.select(
        "doc_id", F.lit("title").alias("field"),
        F.substring("text", 1, 40).alias("text"),
    ).unionByName(
        docs.select("doc_id", F.lit("body").alias("field"), F.col("text"))
    )
    q = docs.sparkSession.createDataFrame(
        [(0, "table merge join")], ["qid", "qtext"]
    )
    return bm25f_search(fields, q, weights={"body": 1.0, "title": 2.5})


def _coherence(spark):
    from hk_housing_datahub_spark.operators.textops import coherence_scores

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return coherence_scores(docs)


def _dsir_select_plan(spark):
    import __spark_entry__ as E

    return E.queries()["dsir_weights"](spark, SF)


def _fairness_plan(spark):
    import __spark_entry__ as E

    return E.queries()["host_fairness"](spark, SF)


def _archive_writer_plan(spark):
    import tempfile

    from hk_housing_datahub_spark.datagen import generate_pages
    from hk_housing_datahub_spark.sources.archive_writer import (
        write_segments,
    )

    pages = generate_pages(spark, 500, n_hosts=6)
    return write_segments(
        pages, tempfile.mkdtemp(prefix="plansdump_warc_"), n_segments=4
    )


def main() -> None:
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.session import get_spark
    from hk_housing_datahub_spark.datagen import generate_pages, generate_seeds
    from hk_housing_datahub_spark.extract import extract_df
    from hk_housing_datahub_spark.frontier.scheduler import schedule_wave
    from hk_housing_datahub_spark.frontier.seen import ExactSeenSet
    from hk_housing_datahub_spark.functions.urls import with_url_columns

    spark = get_spark(app_name="explain_dump", cores=8, shuffle_partitions=8)
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))

    pages_raw = generate_pages(spark, 2000, n_hosts=8)
    pages = with_url_columns(pages_raw).select("url_canon", "warc_ts", "html", "lang")
    frontier = (
        with_url_columns(generate_seeds(spark, 200, 2000, n_hosts=8))
        .withColumn("discovered_ts", F.timestamp_seconds(F.lit(0)))
        .withColumn("depth", F.lit(0))
        .withColumn("attempt", F.lit(0))
        .select("url_canon", "host", "url_hash", "bucket", "priority",
                "discovered_ts", "depth", "attempt")
    )
    wave = frontier.select("url_canon", "host", "priority", "depth")

    sections = [
        (
            "TPC-H-style filtered aggregate (pushdown + pruning + partial agg)",
            "Look for: `PushedFilters: [LessThanOrEqual(l_shipdate,…)]`, a "
            "`ReadSchema` with only the 4 referenced columns, and "
            "HashAggregate below AND above the Exchange (map-side combine).",
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity").alias("sum_qty")),
        ),
        (
            "Fetch join (wave broadcast into the corpus scan)",
            "Look for: `BroadcastHashJoin` with the wave side under "
            "`BroadcastExchange` — html bytes never shuffle; the corpus scan "
            "is map-local at any corpus size.",
            pages.join(F.broadcast(wave), "url_canon", "inner"),
        ),
        (
            "Politeness window (single host-keyed exchange, rank-and-cut)",
            "Look for: exactly one Exchange (hashpartitioning(host…)), then "
            "Sort + Window — no global sort of the frontier.",
            schedule_wave(frontier, None, 1000),
        ),
        (
            "Seen-set anti-join (exact mode)",
            "Look for: LeftAnti join on url_hash (broadcast when the seen "
            "side is small; shuffled co-partitioned at scale).",
            ExactSeenSet(spark).filter_unseen(frontier),
        ),
        (
            "Vectorized extraction (one Arrow pass)",
            "Look for: a single `ArrowEvalPython` node evaluating the "
            "extraction struct once, then a codegen Project flattening it.",
            extract_df(pages_raw),
        ),
        (
            "Star-schema nested extraction (from_json + explode, all codegen)",
            "Look for: NO ArrowEvalPython/BatchEvalPython anywhere — the "
            "whole parse→explode→coerce→fold pipeline is JVM expressions "
            "inside Generate/Project codegen stages; the only Exchanges are "
            "the PK-dedup hash partitionings.",
            _star_tx(spark),
        ),
        (
            "Star FK-graph analytics (AQE-chosen broadcast joins, no hints)",
            "Look for: BroadcastHashJoin on every dimension hop WITHOUT any "
            "ResolvedHint upstream — size statistics pick the strategy, so "
            "a dimension that outgrows the threshold at 100× degrades to a "
            "shuffled join instead of an OOM'd forced broadcast.",
            _star_trend(spark),
        ),
        (
            "EP3 sparse text search (inverted-index cosine top-k)",
            "Look for: ONE ArrowEvalPython (the corpus chunker — norms ride "
            "a window over the weights instead of re-running the chunk "
            "lineage), the query-weights side under BroadcastExchange, and "
            "no CartesianProduct — scoring is an equi-join on the dimension "
            "index.",
            _search_similar(spark),
        ),
        (
            "EP2 composed wiki pipeline (lookup → gate → tables → chunks)",
            "Look for: exactly two ArrowEvalPython nodes (the stateful "
            "wikitable 2-D expansion and the chunker — the only "
            "non-SQL-expressible stages); variant lookup, gating and section "
            "concat are codegen Column expressions.",
            _wiki_docs(spark),
        ),
        (
            "Sample + pack (deterministic md5 sampling, bucketed offset packing)",
            "Look for: the md5-threshold Filter fused into the scan stage "
            "(sampling costs zero extra passes), a 3-column ReadSchema "
            "(text never loads), exactly ONE Exchange "
            "(hashpartitioning(bucket…)), and a NON-global Sort — packing "
            "state is one running sum per bucket partition.",
            _sample_pack(spark),
        ),
        (
            "Bigram-LM perplexity scoring (fit + score, all JVM)",
            "Look for: NO Python nodes and no CartesianProduct — bigrams "
            "are a HOF transform, the model tables are pre-aggregated "
            "count tables, scoring is a compact-key join plus one per-doc "
            "mean; AQE broadcasts the model side when it fits.",
            _lm_score(spark),
        ),
        (
            "Duplicated-span dedup (rolling k-gram counts → interval merge)",
            "Look for: NO ResolvedHint (the duplicated-gram set is "
            "corpus-dependent — AQE sizes the gram join), HashAggregate "
            "below and above the gram-count Exchange (map-side combine on "
            "8-byte xxhash64 keys), and no Python nodes — the interval "
            "merge is a sort_array + aggregate HOF fold per doc.",
            _span_profile(spark),
        ),
        (
            "Training-order global shuffle (bucketed rank, no global sort)",
            "Look for: one data-side Exchange (hashpartitioning("
            "shuffle_bucket…)) feeding the per-bucket rank Window, the "
            "256-row offset table under BroadcastExchange, and no "
            "SortMergeJoin or global Sort.",
            _training_order(spark),
        ),
        (
            "Corpus-preparation funnel (dedup → gates → scrub → pack)",
            "Look for: ZERO ArrowEvalPython/BatchEvalPython nodes — the "
            "entire funnel (dedup windows + min-label propagation, quality "
            "score, PII regexes, packing window) is JVM Column expressions "
            "riding whole-stage codegen; exchanges are only the dedup and "
            "packing keys.",
            _prepare_corpus(spark),
        ),
        (
            "Crawl-to-crawl snapshot diff (single compact-key aggregate)",
            "Look for: ONE Exchange (hashpartitioning(url…)), struct-max "
            "partial aggregates below it, and NO Window or Join — the "
            "snapshot selection happens inside the map-side combine.",
            _snapshot_diff(spark),
        ),
        (
            "Recrawl change-rate schedule (window + agg share one exchange)",
            "Look for: exactly ONE Exchange — the lag window and the "
            "per-URL aggregate key on the same column, so Catalyst reuses "
            "the partitioning; everything after is codegen arithmetic.",
            _recrawl(spark),
        ),
        (
            "Host-graph rollup (two-level agg, exchanges on compact keys)",
            "Look for: exchanges keyed on (src_host, dst_host[, src_page]) "
            "— never on raw URLs — and HashAggregate pairs around each "
            "(map-side combine); no Python nodes.",
            _host_graph(spark),
        ),
        (
            "DSIR importance weights (dim-bounded model broadcast)",
            "Look for: BroadcastHashJoin with the log-ratio table side "
            "under BroadcastExchange (the model is ≤dim rows no matter the "
            "corpus), one doc-keyed Exchange for the weight sum, and no "
            "Python nodes — featurization is explode/HOF codegen.",
            _dsir(spark),
        ),
        (
            "WARC pointer table (per-segment running-sum window)",
            "Look for: ONE Exchange (hashpartitioning(segment…)) feeding a "
            "Sort + Window running sum; record lengths are computed from "
            "the header grammar without materializing record bytes.",
            _warc_locs(spark),
        ),
        (
            "Anchor-text rollup (shuffle-free extraction, one pair-key agg)",
            "Look for: the regexp/zip/posexplode extraction fused into the "
            "scan's codegen stage (no Exchange until the aggregate, no "
            "Python nodes), then HashAggregate pairs around the "
            "(target, anchor_text)-keyed Exchange with the distinct-source "
            "expansion riding the same keys.",
            _anchors(spark),
        ),
        (
            "Mirror-host pairs (DF-capped digest postings self-join)",
            "Look for: the digest-df Window BEFORE the self-join (hot "
            "boilerplate digests are dropped pre-join, bounding per-key "
            "fan-out), the join keyed on digest with no ResolvedHint, and "
            "pair aggregation on compact (host_a, host_b) keys.",
            _mirrors(spark),
        ),
        (
            "Mergeable sketch statistics (DataSketches partial aggregates)",
            "Look for: ObjectHashAggregate pairs below and above each "
            "host-keyed Exchange — HLL/KLL partials combine map-side like "
            "any sum, so the exchange carries kilobyte sketch state, never "
            "raw urls; the wave merge aggregates sketch rows, not data.",
            _sketches(spark),
        ),
        (
            "WARC revisit classification (one (url, digest) exchange)",
            "Look for: a single Exchange hashpartitioning(url, digest) "
            "feeding Sort + Window (the revisit ranking and the first-"
            "capture referent share it); record byte costs are computed "
            "from the header grammar as codegen expressions — no payload "
            "bytes move for revisits.",
            _revisits(spark),
        ),
        (
            "DUST rule mining (url-keyed validation join, AQE-sized)",
            "Look for: NO ResolvedHint (both the rewrite-vs-capture join "
            "and any downstream rule join are corpus-dependent), no Python "
            "nodes, and HashAggregate pairs around the (host, rule)-keyed "
            "Exchange — verdict counting combines map-side.",
            _dust(spark),
        ),
        (
            "Soft-404 flags (one (host, digest) exchange + AQE signature join)",
            "Look for: hashpartitioning(host, digest…) under the dominance "
            "aggregate with partial+final HashAggregate, the per-probed-"
            "host signature side joined WITHOUT a hint, and the vocabulary "
            "regex riding codegen — no Python nodes.",
            _soft404(spark),
        ),
        (
            "SemDeDup (literal-centroid assignment + cluster pair join)",
            "Look for: NO Python nodes and NO CartesianProduct — the "
            "k-means assignment is a codegen projection against literal "
            "centroid arrays (no n×k explode), the keep-rank Window and "
            "the intra-cluster pair join both key on the cluster id, and "
            "the drop set folds back through one equi-join.",
            _semdedup(spark),
        ),
        (
            "Streaming near-dup cross-batch probe (band equi-join + "
            "signature estimator)",
            "Look for: the committed state entering through plain parquet "
            "scans (ReadSchema pruned to did/band/key and did/sig), the "
            "candidate join keyed hashpartitioning(band, key…), the "
            "signature verify as a codegen zip_with/aggregate filter (no "
            "Python nodes), and NO scan of committed text anywhere.",
            _neardup_probe(spark),
        ),
        (
            "HyperBall harmonic centrality (one sketch round)",
            "Look for: the per-round shape PageRank shares — ONE edge-"
            "state equi-join keyed on the node, then hll_union_agg with "
            "partial+final HashAggregate pairs (the exchange carries one "
            "partially-merged sketch per (partition, node), never one per "
            "edge) — and NO Python nodes; per-round localCheckpoint keeps "
            "this plan O(1) in rounds.",
            _hyperball_round(spark),
        ),
        (
            "C4 cleaning rules (map-only line + page policy)",
            "Look for: ZERO Exchange — the planted page construction, the "
            "line policy (terminal punctuation / min-words / javascript) "
            "and every page gate (badword regex, lorem, brace, sentence "
            "count) ride one whole-stage-codegen projection over the scan.",
            _c4(spark),
        ),
        (
            "BPE pair counting (one merge iteration's distributed half)",
            "Look for: partial+final HashAggregate around ONE Exchange "
            "keyed on the (left, right) pair — the shuffle carries one row "
            "per distinct pair per partition, never per occurrence — and "
            "the char-split/fold/transform symbol work as codegen "
            "Generate/Project with NO Python nodes.",
            _bpe_pairs(spark),
        ),
        (
            "Exact phrase search (positional index votes/anchor)",
            "Look for: the phrase-offset VALUES side under "
            "BroadcastExchange (bounded by the query), the postings "
            "restricted by the broadcast join BEFORE any wide shuffle, and "
            "one hashpartitioning(doc_id, anchor…) aggregate pair.",
            _phrase(spark),
        ),
        (
            "Unicode script profile (pure projection)",
            "Look for: ZERO Exchange and no Python nodes — eight "
            "length-difference regex counts, the dominant-script CASE and "
            "the fraction all inside one whole-stage-codegen Project.",
            _script(spark),
        ),
        (
            "Trigram Kneser–Ney scoring (compact-key model joins)",
            "Look for: five left joins on (w1,w2,w3)/(w1,w2)/(w2,w3)/(w2)/"
            "(w3) string keys — every model side a pre-aggregated "
            "Zipf-bounded table — no CartesianProduct, no Python nodes.",
            _kn3(spark),
        ),
        (
            "NB language-ID scoring (gram equi-join + langs fan-out)",
            "Look for: a plain equi-join on gram (no forced broadcast — "
            "AQE decides), one (id,lang)-keyed aggregate, and the tiny "
            "langs-rollup broadcast for the fan-out base.",
            _nb(spark),
        ),
        (
            "Winnowing fingerprints (in-row selection, one pair join)",
            "Look for: the k-gram hashing and window minima as array "
            "expressions inside a Project (no per-fingerprint shuffle "
            "until the inverted-index groupBy/join).",
            _winnow(spark),
        ),
        (
            "BM25F fielded ranking (one fielded aggregate + query broadcast)",
            "Look for: ONE (doc, term) aggregate carrying per-field "
            "conditional counts (no per-field shuffle), the query-bounded "
            "term table under BroadcastExchange, and the shared salt-banded "
            "top-k tail.",
            _bm25f(spark),
        ),
        (
            "Sentence-coherence scores (map-only array algebra)",
            "Look for: ZERO Exchange, no joins — sentence split, distinct "
            "token sets and adjacent-pair Jaccards all inside one Project.",
            _coherence(spark),
        ),
        (
            "Readability battery (map-only projection)",
            "Look for: ZERO Exchange, no joins — words/sentences/"
            "syllables/TTR all in one codegen Project over the scan.",
            _readability(spark),
        ),
        (
            "Banded DSIR Gumbel top-k selection (round 5: no "
            "single-partition stage)",
            "Look for: NO 'Exchange SinglePartition' and NO "
            "unpartitioned Window anywhere — the selection cut is a "
            "per-band window over the quantile-banded key plus a "
            "bounded broadcast offset theta-join (operators/banded.py), "
            "then a semi-join back to the corpus.",
            _dsir_select_plan(spark),
        ),
        (
            "Fairness Gini/top-share over banded ranks (round 5)",
            "Look for: the rank window partitioned by the quantile "
            "band; the only SinglePartition exchanges are the bounded "
            "partial->final scalar aggregates of the one-row output.",
            _fairness_plan(spark),
        ),
        (
            "Executor-side WARC segment writer (round 5)",
            "Look for: exactly ONE Exchange (hash on segment), an "
            "in-task Sort reproducing cdxj record order, and the "
            "MapInPandas writer on top — segments render inside their "
            "tasks, nothing is collected.",
            _archive_writer_plan(spark),
        ),
    ]

    out = [
        "# PLANS — formatted physical plans of the headline operators",
        "",
        f"Generated by `python tools/explain_dump.py` at {SF} "
        "(plan-shape invariants are asserted by tests/test_plans.py).",
    ]
    for title, note, df in sections:
        out += ["", f"## {title}", "", note, "", "```", plan_of(df), "```"]
    text = "\n".join(out) + "\n"
    # WARC header literals put raw CR/control bytes into plan text —
    # escape them so the doc stays valid markdown/text
    text = text.replace("\r", "\\r").replace("\x01", "\\x01").replace(
        "\x02", "\\x02"
    )
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(text)
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
