"""SparkSession factory with scale-appropriate defaults.

Local-mode testing stands in for a multi-executor cluster; every config here
is also the right default for a real 1000-executor deployment (AQE on, skew
join handling on, Arrow on, UTC session timezone for oracle comparability).
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_zip(dest_dir: str = "/tmp") -> str:
    """Zip this package for `--py-files` shipping to executor JVMs.

    A real deployment runs `spark-submit --py-files hk_pkg.zip job.py`
    (north_rule); in-process we set `spark.submit.pyFiles` to the same zip so
    multi-JVM masters (local-cluster / standalone) resolve imports inside
    executor-side Python UDF workers identically.
    """
    import tempfile

    pkg_root = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(dest_dir, "hk_pkg.zip")
    # Unique temp name per builder: two sessions zipping concurrently must
    # not interleave writes into one .tmp file (os.replace stays atomic).
    fd, tmp = tempfile.mkstemp(prefix="hk_pkg_", suffix=".zip", dir=dest_dir)
    os.close(fd)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "hk_housing_datahub_spark", os.path.relpath(full, pkg_root)
                )
                zf.write(full, rel)
    os.replace(tmp, out)
    return out


_GAE_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _protobuf_shim() -> None:
    """transformWithState's state-server protocol imports ``google.protobuf``
    in every spawned Python worker. This sandbox ships no protobuf wheel, but
    its Google Cloud SDK bundles a pure-Python protobuf runtime (6.32): when
    protobuf is missing and that bundle exists, expose it on PYTHONPATH so
    the JVM's Python children inherit it (must happen BEFORE the JVM starts),
    and disable protobuf's gencode/runtime minor-version gate (pyspark's
    gencode is 6.33; one minor apart, wire-compatible). On a real deployment
    protobuf is pip-installed and this is a no-op."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_GAE_SDK, "google", "protobuf")):
        return
    pp = os.environ.get("PYTHONPATH", "")
    if _GAE_SDK not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep if pp else "") + _GAE_SDK
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


def get_spark(
    app_name: str = "hk_housing_datahub_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS or *]``. On a real cluster the
    master comes from spark-submit and this builder only layers SQL confs.
    """
    # SPARK_GRAFT_MASTER overrides the master entirely — e.g.
    # "local-cluster[4,8,6144]" runs 4 separate executor JVMs × 8 cores, the
    # closest local stand-in for a real N-executor cluster (and the mode the
    # N-vs-4N scaling evidence uses, since executor JVMs are isolated exactly
    # as they are under spark-submit).
    _protobuf_shim()
    master_env = os.environ.get("SPARK_GRAFT_MASTER", "")
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cores_env}]"
        n_cores = os.cpu_count() or 8 if cores_env == "*" else int(cores_env)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    ship_pkg = False
    if master_env:
        master = master_env
        if master.startswith("local-cluster["):
            w, c, _ = master[len("local-cluster["):].rstrip("]").split(",")
            n_cores = int(w) * int(c)
        # Any non-local[...] master runs executors in separate JVMs whose
        # Python workers need the package shipped (spark-submit --py-files).
        ship_pkg = not master.startswith("local[")
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n_cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # v2 commit renames files in tasks, not serially on the driver — with
        # many small writes per crawl wave the v1 driver-side rename loop is
        # measurable dead time.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Split sizing: html/text pages compress ~10× in parquet, and Spark
        # sizes splits by COMPRESSED file bytes — the 128 MB default therefore
        # yields ~1.5 GB of decoded work per task and starves parallelism on
        # page-size corpora. 16 MB compressed ≈ 150-200 MB decoded per task.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96: INT96
        # carries no usable parquet footer min/max, which blinds both the
        # catalog's manifest-stats file skipping and parquet row-group
        # skipping on every timestamp column (warc_ts, tx_date).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    # Only pin the master when we are not running under spark-submit.
    if "SPARK_SUBMIT_MODE" not in os.environ:
        builder = builder.master(master)
    if ship_pkg:
        builder = builder.config("spark.submit.pyFiles", package_zip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
