"""K4 debug JSON export + P6 file filter (read-option) coverage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources.export import export_debug_json


def test_debug_json_export_roundtrip(spark, sf_small, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_small, "documents.parquet"))
    out = str(tmp_path / "debug_docs")
    n = export_debug_json(docs.select("doc_id", "lang"), out, limit=25)
    assert n == 25
    back = spark.read.json(out)
    assert back.count() == 25
    assert set(back.columns) == {"doc_id", "lang"}
    # single_file: exactly one data shard
    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == 1


def test_file_filter_read_option(spark, sf_small, tmp_path):
    """P6: pathGlobFilter confines the scan to matching file names — a
    corrupt decoy in the same directory is never touched."""
    docs = spark.read.parquet(os.path.join(sf_small, "documents.parquet"))
    out = str(tmp_path / "json_dir")
    export_debug_json(docs.select("doc_id"), out, limit=10)
    with open(os.path.join(out, "decoy.txt"), "w") as f:
        f.write("this is not json {{{")
    filtered = (
        spark.read.schema("doc_id long")
        .option("pathGlobFilter", "*.json")
        .json(out)
    )
    assert filtered.count() == 10
    assert filtered.agg(F.min("doc_id")).collect()[0][0] is not None
