#!/usr/bin/env bash
# End-to-end north-rule demo, one command:
#
#   seeds → politeness-budgeted crawl (bloom seen-set, resumable) →
#   every wave published as an Iceberg-style catalog snapshot (WAP-gated,
#   seen-set checkpointed as replace snapshots) →
#   training-corpus preparation from the published listings (dedup →
#   quality gate → PII scrub → token-budget packing) → tagged corpus table
#
# Runs via spark-submit --py-files on a multi-executor-JVM local-cluster
# (the closest single-machine stand-in for a real cluster), then prints
# the catalog's snapshot ledger — the full lineage of what just happened.
#
# Usage: tools/north_rule_demo.sh [workers] [cores] [mem_mb]
set -euo pipefail
cd "$(dirname "$0")/.."

W="${1:-2}" C="${2:-4}" MEM="${3:-4096}"
PKG_ZIP=$(python -c "from hk_housing_datahub_spark.session import package_zip; print(package_zip())")
CKPT=$(mktemp -d /tmp/hk_demo_crawl.XXXXXX)
WAREHOUSE=$(mktemp -d /tmp/hk_demo_warehouse.XXXXXX)
SUBMIT=(spark-submit --master "local-cluster[${W},${C},${MEM}]"
        --driver-memory 4g
        --conf spark.sql.adaptive.enabled=true
        --conf "spark.sql.shuffle.partitions=$((W * C))"
        --py-files "${PKG_ZIP}")

echo "== 1/3 crawl → WAP-gated catalog snapshots =="
SPARK_SUBMIT_MODE=1 "${SUBMIT[@]}" jobs/crawl_job.py \
  --pages 20000 --hosts 50 --seeds 2000 --waves 3 --seen-mode bloom \
  --checkpoint "${CKPT}" \
  --catalog "${WAREHOUSE}" --catalog-table listings \
  --audit-price-rate 0.05

echo "== 2/3 published listings → training corpus (tagged) =="
SPARK_SUBMIT_MODE=1 "${SUBMIT[@]}" jobs/corpus_job.py \
  --input-table listings --catalog "${WAREHOUSE}" \
  --id-col url_canon --text-col extracted_text \
  --output-table corpus --dedup exact --min-quality 0.2 \
  --budget 2048 --tag demo-v1

echo "== 3/3 catalog ledger =="
python - "$WAREHOUSE" <<'EOF'
import json, sys
from hk_housing_datahub_spark.session import get_spark
from hk_housing_datahub_spark.sources import TableCatalog
spark = get_spark(app_name="demo_ledger", cores=4, shuffle_partitions=4)
cat = TableCatalog(spark, sys.argv[1])
for t in ("listings", "listings_seen", "corpus"):
    print(f"\n-- {t}: {json.dumps(cat.describe(t), default=str)}")
    for h in cat.history(t):
        print(
            "   snap=%s op=%-8s rows=%-6s wave=%s%s"
            % (
                h["snapshot"], h["op"], h.get("rows", "-"),
                h.get("lineage", {}).get("wave", "-") if isinstance(h.get("lineage"), dict) else "-",
                " [" + h["resolved"] + "]" if h.get("resolved") else "",
            )
        )
spark.stop()
EOF
echo
echo "warehouse: ${WAREHOUSE}   crawl checkpoint: ${CKPT}"
