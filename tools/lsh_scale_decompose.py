"""Decompose the LSH dedup stage at 1x vs 10x (VERDICT r4 item #4).

The round-4 funnel probe showed every stage growing 0.5-1.6x at 10x
rows EXCEPT lsh_dedup at 2.4x. This tool answers WHICH sub-stage and
WHY: it times and counts each leg of minhash_lsh_dedup separately —
signatures, banded candidate pairs, exact verification, connected
components (with edge and component counts) — on the same 1x corpus
and the same deterministic 10x expansion funnel_scale_probe.py uses
(odd copies = near-duplicates, even copies = fresh text), AFTER the
exact-dedup stage, matching the funnel order.

The driving quantity to look at is candidate PAIRS: the 10x corpus is
built so every base doc gains mult/2 near-dup copies, so true-pair
count grows ~(mult/2)^2/2 per dup cluster — quadratic IN THE DUPLICATE
CLUSTER SIZE by construction, not a join pathology. If pairs grow like
clusters^2 while verify sec/pair stays flat, the 2.4x ratio is
duplicate density (expected); a superlinear sec/pair or band-bucket
blowup would be a plan problem.

Usage: python tools/lsh_scale_decompose.py [--sf /root/testdata/sf0.1]
       [--mult 10] [--cpus 32]
Prints one JSON line; the table goes into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def decompose(spark, docs_path: str) -> dict:
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.dedup import (
        _components,
        minhash_lsh_pairs,
        minhash_signatures,
        verify_pairs_jaccard,
    )

    docs = spark.read.parquet(docs_path)
    out: dict = {"rows": docs.count()}

    t0 = time.perf_counter()
    n_sigs = minhash_signatures(docs).count()
    out["signatures"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": n_sigs
    }

    # persist each leg's output so the next leg's wall clock is ITS
    # cost, not a recompute of everything upstream — without this the
    # verify leg re-runs candidate generation inside its own timing and
    # the per-leg table stops being additive
    t0 = time.perf_counter()
    cands = minhash_lsh_pairs(docs).persist()
    n_cands = cands.count()
    out["candidate_pairs"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": n_cands
    }

    t0 = time.perf_counter()
    verified = verify_pairs_jaccard(
        docs, cands, "doc_id", "text", 3, 0.5, 50
    ).persist()
    n_edges = verified.count()
    out["verified_edges"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "rows": n_edges,
        "sec_per_kcand": round(
            (time.perf_counter() - t0) / max(n_cands / 1000.0, 1e-9), 3
        ),
    }

    t0 = time.perf_counter()
    cc = _components(verified, "label").persist()
    n_nodes = cc.count()
    n_comp = cc.select("component").distinct().count()
    out["components"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "nodes": n_nodes,
        "components": n_comp,
    }
    verified.unpersist()
    cc.unpersist()
    cands.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from hk_housing_datahub_spark.operators.dedup import drop_exact_dups
    from hk_housing_datahub_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from funnel_scale_probe import expanded

    spark = get_spark(
        app_name="lsh_decompose", cores=args.cpus,
        shuffle_partitions=args.cpus,
    )
    tmp = tempfile.mkdtemp(prefix="lsh_decomp_")
    try:
        docs = spark.read.parquet(
            os.path.join(args.sf, "documents.parquet")
        ).select("doc_id", "lang", "source", "text")
        p1 = os.path.join(tmp, "base")
        drop_exact_dups(docs).write.parquet(p1)
        p10 = os.path.join(tmp, "big")
        drop_exact_dups(expanded(docs, args.mult)).write.parquet(p10)

        res = {
            "sf": args.sf,
            "mult": args.mult,
            "x1": decompose(spark, p1),
            "x10": decompose(spark, p10),
        }
        for leg in ("signatures", "candidate_pairs", "verified_edges",
                    "components"):
            a, b = res["x1"][leg]["sec"], res["x10"][leg]["sec"]
            res.setdefault("sec_ratio", {})[leg] = (
                round(b / a, 2) if a > 0 else None
            )
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
