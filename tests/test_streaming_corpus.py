"""Streaming corpus ingestion (streaming/corpus.py): cross-batch dedup,
quality gate, exactly-once appends, crash-ordering safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.sources.pkbloom import PKBloomIndex
from hk_housing_datahub_spark.sources.tables import TableCatalog
from hk_housing_datahub_spark.streaming.corpus import (
    ingest_corpus_batch,
    stream_corpus_ingest,
)


def _write_wave(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.parquet(
        path
    )


def test_stream_corpus_ingest_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # wave 1: 40 docs; wave 2: 20 repeats (same text, new ids) + 20 fresh
    _write_wave(
        spark,
        os.path.join(src, "w1"),
        [(i, f"document body number {i} with plenty of the usual words")
         for i in range(40)],
    )
    _write_wave(
        spark,
        os.path.join(src, "w2"),
        [(100 + i, f"document body number {i} with plenty of the usual words")
         for i in range(20)]
        + [(200 + i, f"fresh second wave content {i} and more of the words")
           for i in range(20)],
    )
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    res = stream_corpus_ingest(
        spark, src, cat, "corpus", checkpoint=str(tmp_path / "ck")
    )
    assert res["rows_appended"] == 60  # 40 + 20 fresh; 20 repeats dropped
    got = cat.read("corpus")
    assert got.count() == 60
    assert got.select("fp").distinct().count() == 60
    # repeats kept the FIRST (lowest-id) copy
    assert got.filter(F.col("doc_id").between(100, 199)).count() == 0

    # resume with the same checkpoint: input drained → nothing new
    res2 = stream_corpus_ingest(
        spark, src, cat, "corpus", checkpoint=str(tmp_path / "ck")
    )
    assert res2["rows_appended"] == 0
    assert cat.read("corpus").count() == 60

    # a third wave arrives: only its unique docs land
    _write_wave(
        spark,
        os.path.join(src, "w3"),
        [(300, "fresh second wave content 0 and more of the words"),
         (301, "a genuinely new third wave document with words")],
    )
    res3 = stream_corpus_ingest(
        spark, src, cat, "corpus", checkpoint=str(tmp_path / "ck")
    )
    assert res3["rows_appended"] == 1
    assert cat.read("corpus").count() == 61


def test_ingest_batch_replay_and_crash_ordering(spark, tmp_path):
    """The two failure windows: (a) a replayed already-committed batch is
    a no-op; (b) a crash BETWEEN bloom update and append (bloom knows the
    keys, table doesn't) self-heals — the retried batch routes the false
    positives through the exact anti-join and appends them."""
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    docs = spark.createDataFrame(
        [(i, f"crash ordering doc {i} of the words") for i in range(10)],
        ["doc_id", "text"],
    )
    from hk_housing_datahub_spark.functions.text import fingerprint

    out_schema = (
        docs.withColumn("fp", F.lit("x")).withColumn("quality", F.lit(0.0))
    ).schema
    cat.create("corpus", out_schema)
    bloom = PKBloomIndex(cat).ensure("corpus", ["fp"])

    # simulate the crash: bloom learns the fingerprints, append never ran
    bloom.update(
        "corpus", docs.select(fingerprint(F.col("text")).alias("fp")), ["fp"]
    )
    n = ingest_corpus_batch(cat, "corpus", bloom, docs, batch_id=0)
    assert n == 10  # false positives exact-verified and appended
    assert cat.read("corpus").count() == 10
    # replay of the SAME batch id: exactly-once no-op
    assert ingest_corpus_batch(cat, "corpus", bloom, docs, batch_id=0) == 0
    # same rows under a NEW batch id: all duplicate fingerprints → nothing
    assert ingest_corpus_batch(cat, "corpus", bloom, docs, batch_id=1) == 0
    assert cat.read("corpus").count() == 10


def test_ingest_quality_gate(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    good = "the cat sat on the mat and the dog is in the house for a while"
    docs = spark.createDataFrame(
        [(0, good), (1, "!!!! ???? ;;;; ::::"), (2, "")],
        ["doc_id", "text"],
    )
    out_schema = (
        docs.withColumn("fp", F.lit("x")).withColumn("quality", F.lit(0.0))
    ).schema
    cat.create("corpus", out_schema)
    bloom = PKBloomIndex(cat).ensure("corpus", ["fp"])
    # empty text scores exactly 0.3 (no tokens, no punct) — gate above it
    n = ingest_corpus_batch(
        cat, "corpus", bloom, docs, batch_id=0, min_quality=0.35
    )
    assert n == 1
    assert [r.doc_id for r in cat.read("corpus").collect()] == [0]
