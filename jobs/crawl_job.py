"""Cluster entry point for the frontier crawl — the spark-submit deployment
path from the north rule:

    spark-submit --master <cluster> \
        --py-files "$(python -c 'from hk_housing_datahub_spark.session import package_zip; print(package_zip())')" \
        jobs/crawl_job.py --pages-table <path> --seeds <n> --checkpoint <dir>

The session comes from spark-submit (SPARK_SUBMIT_MODE=1 keeps the builder
from pinning a local master); all engine knobs are CLI flags. The same
script runs unmodified on local[N], local-cluster[W,C,M] (separate executor
JVMs — see tools/spark_submit_demo.sh) and a real standalone/YARN/k8s
master, because the engine contains no driver-side row loops and ships
itself via --py-files.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-table", default="", help="parquet pages corpus; generated if empty")
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--hosts", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=5_000)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--seen-mode", default="bloom", choices=["exact", "bloom", "cuckoo"])
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--wave-ms", type=int, default=600_000)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--max-attempts", type=int, default=1)
    ap.add_argument("--politeness-salt", type=int, default=0)
    ap.add_argument(
        "--catalog",
        default="",
        help="table-catalog root: publish each wave's listings as a catalog "
        "snapshot (metadata-only add_files) and the seen-set as a "
        "replace-mode snapshot of <table>_seen",
    )
    ap.add_argument("--catalog-table", default="listings")
    ap.add_argument(
        "--blocklist", default="",
        help="parquet of (domain, category) rows; outlinks on listed "
        "domains (subdomains inherited, any depth) never enter the "
        "frontier",
    )
    ap.add_argument(
        "--audit-price-rate",
        type=float,
        default=None,
        help="WAP gate: stage each wave, publish only if the fraction of "
        "rows with a non-null extracted price is >= this; else discard "
        "(rejected waves never become visible)",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from hk_housing_datahub_spark.session import get_spark
    from hk_housing_datahub_spark.datagen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )
    from hk_housing_datahub_spark.frontier import CrawlEngine

    spark = get_spark(app_name="hk_crawl_job")
    if args.pages_table:
        pages = spark.read.parquet(args.pages_table)
    else:
        pages = generate_pages(spark, args.pages, n_hosts=args.hosts)
    robots = generate_robots(spark, n_hosts=args.hosts)
    seeds = generate_seeds(spark, args.seeds, args.pages, n_hosts=args.hosts)

    eng = CrawlEngine(
        spark,
        pages,
        robots,
        args.checkpoint,
        seen_mode=args.seen_mode,
        wave_ms=args.wave_ms,
        max_depth=args.max_depth,
        max_attempts=args.max_attempts,
        politeness_salt=args.politeness_salt,
        blocklist=(
            spark.read.parquet(args.blocklist) if args.blocklist else None
        ),
    )
    out: dict = {}
    if args.catalog:
        from hk_housing_datahub_spark.frontier import publish_crawl
        from hk_housing_datahub_spark.sources import TableCatalog

        cat = TableCatalog(spark, args.catalog)
        audit = None
        if args.audit_price_rate is not None:
            from pyspark.sql import functions as F

            def audit(df, _r=args.audit_price_rate):
                n, ok = df.agg(
                    F.count(F.lit(1)), F.count("price")
                ).first()
                return n > 0 and ok / n >= _r

        pres = publish_crawl(
            eng, seeds, cat, args.catalog_table, max_waves=args.waves,
            audit=audit,
        )
        out["published_waves"] = pres.waves_published
        out["rejected_waves"] = pres.waves_rejected
        out["catalog_snapshots"] = pres.snapshots
        try:
            out["catalog_rows"] = cat.read(args.catalog_table).count()
        except FileNotFoundError:
            out["catalog_rows"] = 0  # crawl published no waves
        res = eng.run(seeds, max_waves=0)  # summary from the manifest
    else:
        res = eng.run(seeds, max_waves=args.waves)
    print(
        json.dumps(
            {
                "waves": res.waves_run,
                "n_seen": res.n_seen,
                "n_extracted": res.n_extracted,
                "checkpoint": res.checkpoint_dir,
                **out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
