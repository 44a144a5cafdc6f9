"""Custom stateful streaming: the URL-seen set as a streaming operator.

The batch crawl keeps its seen-set as salted-bucket DataFrame state
(frontier/seen.py). This module is the *streaming* expression of the same
state machine: a stream of discovered URLs → first occurrence emitted,
duplicates dropped, per-bucket state persisted across micro-batches via
``applyInPandasWithState`` (the Spark-native analog of the reference's
cross-partition pk_sets, /root/reference/src/processors/agency/
estates.py:87-93 "deduplication across partitions").

State per bucket = the bloom-filter byte array from frontier.seen (shared
code — the batch and streaming paths use the same filter kernels, so the
property tests there cover this operator's state transitions too). Bucket
count bounds per-key state (128 KiB each); hot hosts spread across buckets
because bucketing keys on url_hash, not host (salted-hash partitioning).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frontier.seen import _bloom_add, _bloom_contains

URL_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("filter", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)


def _dedup_func_factory(m_bits: int, k: int):
    def dedup(
        key: Any, pdfs: Iterable[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            filt_bytes, n = state.get
            filt = np.frombuffer(filt_bytes, dtype=np.uint8).copy()
        else:
            filt, n = np.zeros(m_bits // 8, dtype=np.uint8), 0
        for pdf in pdfs:
            # within-batch first-occurrence, then probe persisted state
            pdf = pdf.drop_duplicates(subset=["url_hash"])
            hashes = pdf["url_hash"].to_numpy(np.uint64)
            seen = _bloom_contains(filt, hashes, m_bits, k)
            fresh = pdf.loc[~seen]
            if len(fresh):
                _bloom_add(filt, fresh["url_hash"].to_numpy(np.uint64),
                           m_bits, k)
                n += len(fresh)
                yield fresh[["url_canon", "url_hash", "bucket"]]
        state.update((filt.tobytes(), n))

    return dedup


def streaming_seen_dedup(
    urls_stream: DataFrame, m_bits: int = 1 << 20, k: int = 7
) -> DataFrame:
    """First occurrence of every url_hash across the whole stream; state =
    one bloom filter per bucket, carried across micro-batches."""
    return urls_stream.groupBy("bucket").applyInPandasWithState(
        _dedup_func_factory(m_bits, k),
        outputStructType=URL_EVENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_streaming_dedup(
    spark: SparkSession,
    urls_dir: str,
    n_buckets: int = 32,
    query_name: str = "seen_dedup",
) -> DataFrame:
    """Drive the stateful dedup over a parquet dir of (url_canon, url_hash,
    bucket) files — one micro-batch per file — and return the deduped rows."""
    stream = (
        spark.readStream.schema(URL_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(urls_dir)
    )
    out = streaming_seen_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT url_canon, url_hash, bucket FROM {query_name}")
