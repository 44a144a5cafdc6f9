#!/usr/bin/env bash
# spark-submit --py-files deployment demo (north_rule): runs the crawl job on
# a multi-executor-JVM master (local-cluster[W,C,MEM_MB] — W separate worker
# JVMs, the closest single-machine stand-in for a W-executor cluster).
# Executors import the engine ONLY from the shipped zip, exactly as on a real
# cluster.
#
# Usage: tools/spark_submit_demo.sh [workers] [cores_per_worker] [mem_mb]
set -euo pipefail
cd "$(dirname "$0")/.."

W="${1:-2}" C="${2:-4}" MEM="${3:-4096}"
shift $(( $# > 3 ? 3 : $# ))  # consume the positionals; the rest goes to the job
PKG_ZIP=$(python -c "from hk_housing_datahub_spark.session import package_zip; print(package_zip())")
CKPT=$(mktemp -d /tmp/hk_submit_crawl.XXXXXX)

SPARK_SUBMIT_MODE=1 spark-submit \
  --master "local-cluster[${W},${C},${MEM}]" \
  --driver-memory 4g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=$((W * C)) \
  --py-files "${PKG_ZIP}" \
  jobs/crawl_job.py \
  --pages 20000 --hosts 50 --seeds 2000 \
  --seen-mode bloom --checkpoint "${CKPT}" "$@"

echo "checkpoint: ${CKPT}"
