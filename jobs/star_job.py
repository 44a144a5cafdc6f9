"""Cluster entry point for the batched star-schema ETL — the spark-submit
deployment path for the reference's orchestrator flow:

    spark-submit --master <cluster> \
        --py-files "$(python -c 'from hk_housing_datahub_spark.session import package_zip; print(package_zip())')" \
        jobs/star_job.py --tables-dir <sf_dir> --catalog <dir> --batches 8

Reads the base tables, renders/ingests nested responses, and runs the
two-stage batched load (extract → PK-dedup → append with per-batch
lineage, resumable). Same script on local[N], local-cluster[W,C,M], or a
real master — no driver-side row loops; the only driver loop is over
batches, each a bounded distributed job.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables-dir", default="/root/testdata/sf0.001",
                    help="dir with customer/orders/lineitem parquet")
    ap.add_argument("--catalog", required=True, help="TableCatalog root")
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from hk_housing_datahub_spark.session import get_spark
    from hk_housing_datahub_spark.sources.tables import TableCatalog
    from hk_housing_datahub_spark.star import (
        maintain_monthly_rollup,
        render_building_responses,
        render_estate_responses,
        render_monthly_responses,
        run_star_pipeline,
    )

    spark = get_spark(app_name="hk_star_job")
    t = lambda n: spark.read.parquet(os.path.join(args.tables_dir, f"{n}.parquet"))  # noqa: E731
    cat = TableCatalog(spark, args.catalog)
    appended = run_star_pipeline(
        spark,
        cat,
        render_estate_responses(t("customer")),
        render_monthly_responses(t("orders")),
        render_building_responses(t("orders"), t("lineitem")),
        n_batches=args.batches,
    )
    # downstream incremental view: refresh the monthly rollup from the
    # snapshots this run appended (O(delta); replay-safe no-op if caught up)
    rollup_delta = maintain_monthly_rollup(spark, cat)
    print(
        json.dumps(
            {
                "appended": appended,
                "rollup_delta_rows": rollup_delta,
                "catalog": args.catalog,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
