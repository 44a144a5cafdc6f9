"""Benchmark driver — prints ONE JSON line.

Headline: frontier throughput (URLs scheduled+extracted/sec) on a
deterministic Common-Crawl-style pages corpus (BASELINE.json metric),
plus wall-clock for each headline operator query at $SPARK_GRAFT_SF_DIR.

Environment:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_PAGES         crawl corpus size (default 120000)

Scaling evidence (north rule, N vs 4N): run twice —
  SPARK_GRAFT_CPUS=8 python bench.py   and   SPARK_GRAFT_CPUS=32 python bench.py
and compare `frontier_urls_per_sec` (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 480k pages / 120k seeds: large enough that per-wave fixed overhead
# (scheduling, checkpoint writes, JVM job round-trips) amortizes into a
# throughput-representative headline (~2x the urls/s of a 240k corpus at
# only ~+2s wall); corpus generation stays untimed.
N_PAGES = int(os.environ.get("BENCH_PAGES", "480000"))
N_SEEDS = int(os.environ.get("BENCH_SEEDS", "120000"))
N_WAVES = int(os.environ.get("BENCH_WAVES", "3"))
WAVE_MS = int(os.environ.get("BENCH_WAVE_MS", "600000"))
# "full" = crawl + operator suite; "frontier" = crawl headline only (the
# N-vs-4N scaling runs use this so both parallelism levels time the same job).
MODE = os.environ.get("BENCH_MODE", "full")
# When set, the pages corpus is materialized here once and reused across
# invocations — the two scaling runs must read byte-identical input.
CORPUS_DIR = os.environ.get("BENCH_CORPUS_DIR", "")
N_HOSTS = int(os.environ.get("BENCH_HOSTS", "200"))
# Extra listing rows per page (page ≈ 600 B + 150 B × filler). The scale runs
# use ~30 so per-page extraction work resembles real Common-Crawl-size pages.
FILLER = int(os.environ.get("BENCH_FILLER", "0"))


def _host_health() -> dict:
    """~4s single-process probe of the VM's memory + compute health, reported
    (untimed) alongside every bench run. The machine's fresh-allocation
    bandwidth swings 3x between windows on this VM (measured 15.6 vs 5.0
    GB/s on the same day — see BENCH/BASELINE.md); allocation-heavy stages
    (Arrow batches, shuffle buffers, parquet codecs) track it directly, so
    throughput numbers are only comparable across runs with similar probes."""
    import numpy as np

    # Back-to-back idle-machine samples have measured 0.01 / 6.3 / 2.9 GB/s
    # (hypervisor-side page-fault stalls), so one sample is meaningless:
    # take 3, report max (achievable bandwidth) and median (typical).
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        total = 0
        while time.perf_counter() - t0 < 1.5:
            a = np.empty(50_000_000 // 8)
            a[:: 4096 // 8] = 1.0  # touch every page
            total += a.nbytes
            del a
        samples.append(total / (time.perf_counter() - t0) / 1e9)
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i * i
    alu = 20_000_000 / (time.perf_counter() - t0)
    return {
        "host_alloc_gb_per_sec_max": round(max(samples), 2),
        "host_alloc_gb_per_sec_med": round(sorted(samples)[1], 2),
        "host_alu_ops_per_sec": round(alu),
    }


def _await_healthy_window() -> tuple[dict, dict]:
    """Probe-gate the run: the VM's allocation bandwidth swings ~3x between
    windows (see BENCH/BASELINE.md), which moved the round-3 suite ~2x with
    zero engine change. Before timing anything, re-probe (bounded) until the
    median allocation bandwidth clears BENCH_PROBE_MIN_GBPS, so recorded
    numbers land on comparable windows. Every attempt is recorded in the
    output; if the budget runs out the bench proceeds anyway with
    ``probe_gate_passed: false`` — an honest degraded-window record beats
    no record. Set BENCH_PROBE_MIN_GBPS=0 to disable."""
    min_gbps = float(os.environ.get("BENCH_PROBE_MIN_GBPS", "10"))
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "8"))
    sleep_s = float(os.environ.get("BENCH_PROBE_SLEEP_S", "20"))
    health = _host_health()
    attempts = [health["host_alloc_gb_per_sec_med"]]
    while (
        health["host_alloc_gb_per_sec_med"] < min_gbps
        and len(attempts) <= retries
    ):
        time.sleep(sleep_s)
        health = _host_health()
        attempts.append(health["host_alloc_gb_per_sec_med"])
    return health, {
        "probe_gate_gbps": min_gbps,
        "probe_attempts_med": attempts,
        "probe_gate_passed": health["host_alloc_gb_per_sec_med"] >= min_gbps,
    }


def main() -> None:
    from hk_housing_datahub_spark.session import get_spark

    health, gate = _await_healthy_window()

    spark = get_spark(app_name="hk_bench", cores=CPUS, shuffle_partitions=max(8, CPUS))
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    import __spark_entry__ as E
    from hk_housing_datahub_spark.datagen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )
    from hk_housing_datahub_spark.frontier import CrawlEngine

    timings: dict[str, float] = {}
    tmp_root = tempfile.mkdtemp(prefix="hk_bench_")

    # ---- corpus materialization (untimed: stands in for the stored table).
    # Write partitioning is fixed (64) so the stored input is identical no
    # matter which parallelism level this process runs at.
    pages_path = os.path.join(CORPUS_DIR or tmp_root, "pages")
    params = {"pages": N_PAGES, "hosts": N_HOSTS, "filler": FILLER}
    params_path = pages_path + ".params.json"
    reusable = os.path.exists(os.path.join(pages_path, "_SUCCESS"))
    if reusable and os.path.exists(params_path):
        with open(params_path) as f:
            reusable = json.load(f) == params  # stale corpus → regenerate
    elif reusable:
        reusable = False
    if not reusable:
        generate_pages(
            spark, N_PAGES, n_hosts=N_HOSTS, partitions=64,
            filler_listings=FILLER,
        ).write.mode("overwrite").parquet(pages_path)
        with open(params_path, "w") as f:
            json.dump(params, f)
    pages = spark.read.parquet(pages_path)
    robots = generate_robots(spark, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, N_SEEDS, N_PAGES, n_hosts=N_HOSTS)

    # ---- optional JIT warm-up (same plan shapes, tiny seed set) so the
    # timed run measures steady-state throughput, not one-time codegen. A
    # production crawler is a long-running job; its waves are all "warm".
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        weng = CrawlEngine(
            spark, pages, robots, os.path.join(tmp_root, "warm"),
            seen_mode="exact", wave_ms=WAVE_MS, max_depth=2, n_buckets=1024,
        )
        weng.run(generate_seeds(spark, 2000, N_PAGES, n_hosts=N_HOSTS), max_waves=2)

    # ---- headline: frontier crawl throughput
    ckpt = os.path.join(tmp_root, "crawl")
    t0 = time.perf_counter()
    eng = CrawlEngine(
        spark, pages, robots, ckpt,
        seen_mode="exact", wave_ms=WAVE_MS, max_depth=2, n_buckets=1024,
        verbose=os.environ.get("BENCH_VERBOSE", "0") == "1",
    )
    res = eng.run(seeds, max_waves=N_WAVES)
    crawl_sec = time.perf_counter() - t0
    n_urls = res.n_seen  # scheduled (incl. dead links) — extraction ⊆ this
    timings["crawl_frontier"] = round(crawl_sec, 3)
    urls_per_sec = round(n_urls / crawl_sec, 1)
    # window context for the headline alone (the window can degrade
    # mid-run; this separates "crawl window" from "suite window")
    mid_probe = _host_health()["host_alloc_gb_per_sec_med"]

    n_ex = 0
    if MODE == "full":
        # ---- pure extraction throughput (vectorized UDF over the corpus)
        from hk_housing_datahub_spark.extract import extract_df
        import pyspark.sql.functions as F

        t0 = time.perf_counter()
        n_ex = extract_df(pages).filter(F.col("price").isNotNull()).count()
        timings["extract_corpus"] = round(time.perf_counter() - t0, 3)

        # ---- operator headline queries at SF_DIR
        bench_queries = [
            "q1_pricing_summary",
            "monthly_rollup",
            "topk_orders_per_customer",
            "sessionize_events",
            "ngram_jaccard_pairs",
            "minhash_lsh_candidates",
            "corpus_lang_profile",
            "ann_topk_cosine",
            "quality_by_source",
            "chunk_documents",
            # round-3 composed pipelines
            "search_similar",
            "wiki_pipeline_docs",
            "lsh_dedup_drop",
            "sample_pack_corpus",
            "prepare_corpus",
            # round-4 additions
            "lm_perplexity_quality",
            "packed_sequences",
            "span_dedup_profile",
            "gopher_repetition",
            "link_graph_rank",
            # round-4 web-archive + selection battery
            "cdx_snapshot_diff",
            "recrawl_schedule",
            "host_graph_rollup",
            "host_trap_signals",
            "dsir_weights",
            # round-4 closing batch
            "anchor_text_rollup",
            "mirror_hosts",
            "crawl_sketch_stats",
            "trust_graph_rank",
            "registrable_domains",
            "warc_revisits",
            "domain_budget_schedule",
            "quality_classifier_gate",
            "canonical_url_per_digest",
            # round-4 final batch (rank family + URL hygiene)
            "hits_rank",
            "opic_importance",
            "dust_rule_mining",
            "soft404_flags",
            "bm25_search",
            "semdedup_drop",
            "c4_clean_pages",
            # round-4 wrap: incremental streaming near-dup ingestion +
            # jusText-style main-content extraction
            "streaming_lsh_neardup",
            "main_content_extract",
            # round-4 session C: tokenizer training + text/search battery
            "bpe_learn",
            "phrase_search",
            "script_profile",
            "span_dedup_removal",
            "ngram_containment_pairs",
            "temperature_mixture",
            "bpe_fertility",
            "host_boilerplate_strip",
            "blocklist_gate",
            "incremental_rollup",
            "streaming_matview",
            # round-4 session D: smoothing/classifier/tokenizer/mining
            "kn_perplexity",
            "kn3_perplexity",
            "nb_langid_confusion",
            "bitext_margin_pairs",
            "unigram_lm_vocab",
            "readability_scores",
            "badwords_gate",
            "quality_threshold_sweep",
            "sentence_code_switch",
            "host_fairness",
            "winnow_overlaps",
            "format_profile",
            "confusable_dedup",
            "dedup_cluster_sizes",
            "cdc_payload_dedup",
            "novelty_scores",
            "bm25f_search",
            "coherence_scores",
            # round-5: extractor replay, archive writer manifest, the
            # newly oracle-backed ANN/tokenizer/streaming batteries
            "extract_fields_replay",
            "warc_write_manifest",
            "minhash_lsh_candidates",
            "simhash_neardup",
            "embed_chunks",
            "bpe_encode_tokens",
            "unigram_encode_pieces",
            "lsh_ann_topk",
            "ivf_ann_topk",
            "streaming_windowed",
            "streaming_corpus_ingest",
            "streaming_recrawl",
        ]
        qs = E.queries()
        for name in bench_queries:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)

        # Production-hash twins of the two md5_56-mode oracle entries:
        # the driver-checked queries above run the PORTABLE md5 hash so
        # DuckDB can replay them, which costs ~5x the JVM xxhash64 the
        # production path uses — time the default-mode operators too so
        # the engine's real cost stays visible next to the oracle tax.
        from hk_housing_datahub_spark.operators import dedup as _DD

        docs_prod = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        )
        t0 = time.perf_counter()
        _DD.minhash_lsh_pairs(docs_prod).count()
        timings["minhash_lsh_candidates_prod"] = round(
            time.perf_counter() - t0, 3
        )

        from hk_housing_datahub_spark.sources import TableCatalog as _TC
        from hk_housing_datahub_spark.streaming.neardup import (
            stream_neardup_ingest as _sni,
        )

        _root = os.path.join(tmp_root, "neardup_prod")
        _src = os.path.join(_root, "src")
        d2 = docs_prod.select("doc_id", "text")
        d2.filter(F.pmod("doc_id", F.lit(2)) == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(_src, "w1"))
        _re = d2.filter(F.pmod("doc_id", F.lit(4)) == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
        d2.filter(F.pmod("doc_id", F.lit(2)) == 1).unionByName(
            _re
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(_src, "w2")
        )
        t0 = time.perf_counter()
        _sni(
            spark, _src, _TC(spark, os.path.join(_root, "cat")), "docs",
            checkpoint=os.path.join(_root, "ck"),
        )
        timings["streaming_lsh_neardup_prod"] = round(
            time.perf_counter() - t0, 3
        )

        # star-schema surface, measured in its two halves: the RENDER
        # (bench harness: base tables → nested JSON response docs,
        # materialized once) and the EXTRACTOR (the product under test:
        # from_json → explode ×2 → coercions + folds over ~10× lineitem).
        from hk_housing_datahub_spark.star import (
            extract_building_tables,
            render_building_responses,
        )

        orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        resp_path = os.path.join(tmp_root, "bld_resp")
        t0 = time.perf_counter()
        render_building_responses(orders, li).write.parquet(resp_path)
        timings["star_tx_render"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_tx = extract_building_tables(spark.read.parquet(resp_path))[
            "transactions"
        ].count()
        timings["star_transactions_extract"] = round(
            time.perf_counter() - t0, 3
        )
        assert n_tx > 0

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "frontier throughput (URLs scheduled+extracted/sec) + operator suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "pages": N_PAGES,
        "mode": MODE,
        "seeds": N_SEEDS,
        "waves": res.waves_run,
        "frontier_urls_per_sec": urls_per_sec,
        "frontier_urls": n_urls,
        "frontier_extracted": res.n_extracted,
        "extract_rows": n_ex,
        **health,
        **gate,
        "host_alloc_gb_per_sec_med_after_crawl": mid_probe,
        # the window can degrade mid-run: a closing probe bounds when
        "host_alloc_gb_per_sec_med_end": _host_health()[
            "host_alloc_gb_per_sec_med"
        ],
    }
    print(json.dumps(out))
    shutil.rmtree(tmp_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
