"""sf1-scale sample of the most expensive suite entries (VERDICT r4 #8).

There is no driver-provided sf1 parquet, so this tool synthesizes one
deterministically: the sf0.1 documents table expanded 10x with the same
transform the funnel probe uses (odd copies near-duplicates, even
copies fresh-text rewrites — tools/funnel_scale_probe.py `expanded`),
n_chars recomputed, every other table symlinked from sf0.1 (the
sampled entries are documents-driven). Each entry runs once at sf0.1
and once at pseudo-sf1 in the same session; per-entry wall clock plus
the window's peak and total shuffle-write bytes (scraped from the
Spark UI REST API) land in one JSON line. An entry whose sf1/sf0.1
wall ratio exceeds 15x at 10x rows is the O(n^2)-smell the verdict
asked to flag.

Usage: python tools/sf1_sample.py [--sf /root/testdata/sf0.1]
       [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

ENTRIES = [
    "winnow_overlaps",
    "quality_classifier_gate",
    "unigram_lm_vocab",
    "bpe_learn",
    "prepare_corpus",
    "nb_langid_confusion",
    "lsh_dedup_drop",
    "ngram_jaccard_pairs",
    "sentence_code_switch",
    "dedup_cluster_sizes",
    "streaming_lsh_neardup",
]


def _stages(ui: str) -> list[dict]:
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=5)
        )
        app = apps[0]["id"]
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete",
                timeout=10,
            )
        )
    except Exception:
        return []


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    import __spark_entry__ as E
    from hk_housing_datahub_spark.session import get_spark

    from funnel_scale_probe import expanded

    spark = get_spark(
        app_name="sf1_sample",
        cores=args.cpus,
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4040"

    from pyspark.sql import functions as F

    sf1 = tempfile.mkdtemp(prefix="sf1_")
    try:
        docs = spark.read.parquet(
            os.path.join(args.sf, "documents.parquet")
        )
        (
            expanded(docs, 10)
            .withColumn("n_chars", F.length("text").cast("long"))
            .write.parquet(os.path.join(sf1, "documents.parquet"))
        )
        for name in os.listdir(args.sf):
            if name != "documents.parquet":
                os.symlink(
                    os.path.join(args.sf, name), os.path.join(sf1, name)
                )

        qs = E.queries()
        out: dict = {"sf_small": args.sf, "sf1_rows": spark.read.parquet(
            os.path.join(sf1, "documents.parquet")).count(),
            "cpus": args.cpus, "entries": {}}
        for name in ENTRIES:
            row: dict = {}
            for tag, sfd in (("sf0.1", args.sf), ("sf1", sf1)):
                before = {s["stageId"] for s in _stages(ui)}
                t0 = time.perf_counter()
                n = qs[name](spark, sfd).count()
                sec = round(time.perf_counter() - t0, 2)
                stages = [
                    s for s in _stages(ui) if s["stageId"] not in before
                ]
                sw = [s.get("shuffleWriteBytes", 0) for s in stages]
                row[tag] = {
                    "sec": sec,
                    "rows": n,
                    "shuffle_total_mb": round(sum(sw) / 1e6, 1),
                    "shuffle_peak_stage_mb": round(
                        max(sw, default=0) / 1e6, 1
                    ),
                }
            row["ratio"] = (
                round(row["sf1"]["sec"] / row["sf0.1"]["sec"], 2)
                if row["sf0.1"]["sec"] > 0
                else None
            )
            row["flag_superlinear"] = bool(
                row["ratio"] and row["ratio"] > 15
            )
            out["entries"][name] = row
            print(
                f"[{name}] sf0.1 {row['sf0.1']['sec']}s "
                f"sf1 {row['sf1']['sec']}s ratio {row['ratio']}",
                file=sys.stderr,
            )
        print(json.dumps(out))
    finally:
        shutil.rmtree(sf1, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
