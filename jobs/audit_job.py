"""Cluster entry point for the corpus-quality audit — the dashboard
numbers a curation run reads before (and after) building a training
corpus, assembled from the already-oracled operator battery:

    spark-submit --master <cluster> --py-files <pkg.zip> jobs/audit_job.py \
        --input /data/docs.parquet --output /reports/audit

Writes one parquet per section under --output:
  lang_profile/      per-language doc/token/quality rollup
  quality_sweep/     quality-vs-quantity threshold curve (one pass)
  fairness/          Gini + top-share of bytes across (source) keys
  readability/       corpus-level readability moments per language
  format/            corpus-level format-shape fractions per source
  dedup_hist/        near-dup cluster-size histogram (optional, costs
                     the pair join — enable with --dedup-hist)

and prints ONE summary JSON line. Every section is a bounded rollup
(key-table-sized outputs); only the corpus scans are data-scale.

Non-default input schemas map in with --id-col/--lang-col/--source-col/
--text-col: the frame is renamed to the canonical (doc_id, lang,
source, text) vocabulary ONCE up front, so every section — including
the profile/lang rollups — reads the same columns; a missing column
fails fast at argument time instead of as a mid-job AnalysisException.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="", help="parquet path of documents")
    ap.add_argument(
        "--input-table", default="",
        help="read documents from this catalog table instead of --input",
    )
    ap.add_argument("--catalog", default="", help="table-catalog root")
    ap.add_argument("--output", required=True, help="report directory")
    ap.add_argument(
        "--dedup-hist", action="store_true",
        help="also compute the near-dup cluster-size histogram "
             "(runs the pair join — the one non-rollup section)",
    )
    ap.add_argument("--dedup-threshold", type=float, default=0.5)
    ap.add_argument("--max-shingle-df", type=int, default=50)
    # input-schema mapping: the sections all speak the canonical
    # (doc_id, lang, source, text) vocabulary; the input frame is
    # renamed ONCE up front so a non-default text/id/lang/source column
    # feeds EVERY section consistently (not just the ones that happened
    # to take a text_col parameter)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--source-col", default="source")
    args = ap.parse_args()
    if bool(args.input) == bool(args.input_table):
        ap.error("pass exactly one of --input / --input-table")
    if args.input_table and not args.catalog:
        ap.error("--input-table needs --catalog")

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.rollups import (
        allocation_fairness,
    )
    from hk_housing_datahub_spark.operators.textops import (
        format_profile,
        quality_by_source,
        quality_threshold_sweep,
        readability_scores,
    )
    from hk_housing_datahub_spark.session import get_spark

    spark = get_spark(app_name="hk_audit_job")
    if args.input_table:
        from hk_housing_datahub_spark.sources import TableCatalog

        docs = TableCatalog(spark, args.catalog).read(args.input_table)
    else:
        docs = spark.read.parquet(args.input)
    for flag, col in (
        ("--id-col", args.id_col),
        ("--lang-col", args.lang_col),
        ("--source-col", args.source_col),
        ("--text-col", args.text_col),
    ):
        if col not in docs.columns:
            ap.error(f"{flag} {col!r} not in input columns {docs.columns}")
    docs = docs.select(
        F.col(args.id_col).alias("doc_id"),
        F.col(args.lang_col).alias("lang"),
        F.col(args.source_col).alias("source"),
        F.col(args.text_col).alias("text"),
    )
    docs = docs.persist()  # every section scans the same frame once

    out = args.output
    os.makedirs(out, exist_ok=True)
    summary: dict = {}

    def section(name, df):
        path = os.path.join(out, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        summary[name] = spark.read.parquet(path).count()

    from hk_housing_datahub_spark.operators.textops import profile_documents

    prof = profile_documents(docs, passthrough=("source",))
    section(
        "lang_profile",
        prof.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        ),
    )
    section("quality_sweep", quality_threshold_sweep(docs))
    section(
        "fairness",
        allocation_fairness(
            docs.select("source", F.length("text").alias("n_bytes")),
            "source",
            weight_col="n_bytes",
        ),
    )
    section(
        "readability",
        readability_scores(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.round(F.avg("flesch"), 4).alias("avg_flesch"),
            F.round(F.avg("fk_grade"), 4).alias("avg_fk_grade"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        ),
    )
    section(
        "format",
        format_profile(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.round(F.avg("code_frac"), 6).alias("avg_code_frac"),
            F.round(F.avg("table_frac"), 6).alias("avg_table_frac"),
            F.round(F.avg("bullet_frac"), 6).alias("avg_bullet_frac"),
        ),
    )
    section("quality_by_source", quality_by_source(docs))
    if args.dedup_hist:
        from hk_housing_datahub_spark.operators.dedup import dedup_clusters

        clusters = dedup_clusters(
            docs,
            threshold=args.dedup_threshold,
            max_shingle_df=args.max_shingle_df,
        )
        sizes = clusters.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        section(
            "dedup_hist",
            sizes.groupBy("cluster_size").agg(
                F.count(F.lit(1)).alias("n_clusters")
            ),
        )
    print(json.dumps({"sections": summary, "docs": docs.count()}))


if __name__ == "__main__":
    main()
