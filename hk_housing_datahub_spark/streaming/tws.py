"""URL-seen dedup on Spark 4's transformWithStateInPandas.

Second streaming expression of the crawl's seen-set state machine
(first: ``stateful.streaming_seen_dedup`` on ``applyInPandasWithState``),
on the arbitrary-stateful-processing API that adds what the older one
cannot express:

- **native state TTL** — per-bucket bloom state expires ``ttl_ms`` after
  its last write, giving the bounded-state / re-crawl-after-expiry
  semantics a long-lived frontier needs (the reference re-visits listings
  on later runs, /root/reference/src/orchestrators/agency.py re-run loop;
  an expiring seen-set is how a streaming frontier forgets),
- **warm start from the batch crawl** — ``initialState`` accepts the
  (bucket, filter, n_items) checkpoint a batch ``CrawlEngine`` run wrote
  (frontier/seen.py layout), so a streaming dedup resumes EXACTLY where a
  batch crawl stopped: urls the crawl saw are never re-emitted.

State layout and filter kernels are shared with the batch seen-set
(``_bloom_add`` / ``_bloom_contains`` from frontier/seen.py), so the
property tests there (no false negatives, FPR bounds, restore) cover this
operator's transitions too. Keying is per salted ``bucket`` — state per
key is one bounded blob (m_bits/8 bytes), hot hosts spread across buckets
because bucketing keys on url_hash, not host (salted-hash partitioning).

Runtime notes (verified in this sandbox):
- transformWithState requires the RocksDB state store provider (multiple
  column families); the runner scopes that conf to its own query.
- Its state-server protocol needs ``google.protobuf`` in every Python
  worker — ``session._protobuf_shim`` provides it here (pip-installed on
  a real cluster).
- ``timeMode="ProcessingTime"`` (required for TTL) keeps scheduling
  batches to advance the TTL clock, so even ``availableNow`` triggers
  never self-terminate; the TTL runner instead polls progress for input
  completion and stops the query. Without TTL, ``timeMode="None"`` +
  ``availableNow`` terminates normally.

Scale: at 10^10 URLs state volume is n_buckets x m_bits/8 bytes
regardless of URL count, each micro-batch touches only the buckets
present in that batch, and RocksDB snapshots/changelogs checkpoint the
blobs incrementally.
"""

from __future__ import annotations

import time
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from ..frontier.seen import _bloom_add, _bloom_contains
from .stateful import _STATE_SCHEMA, URL_EVENT_SCHEMA

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


class BloomSeenProcessor(StatefulProcessor):
    """Per-bucket bloom seen-state; emits first occurrences only."""

    def __init__(self, m_bits: int = 1 << 20, k: int = 7, ttl_ms: int | None = None):
        self.m_bits, self.k, self.ttl_ms = m_bits, k, ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "bloom", _STATE_SCHEMA, ttlDurationMs=self.ttl_ms
        )

    def _load(self) -> tuple[np.ndarray, int]:
        cur = self._state.get() if self._state.exists() else None
        if cur is None:  # absent or TTL-expired
            return np.zeros(self.m_bits // 8, dtype=np.uint8), 0
        blob, n = cur
        return np.frombuffer(blob, dtype=np.uint8).copy(), int(n)

    def handleInitialState(
        self, key: Any, initialState: pd.DataFrame, timerValues
    ) -> None:
        # One row per bucket: the (filter, n_items) blob a batch crawl
        # checkpointed. Stored verbatim — same kernels, same layout.
        if len(initialState):
            row = initialState.iloc[0]
            self._state.update((bytes(row["filter"]), int(row["n_items"])))

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        filt, n = self._load()
        dirty = False
        for pdf in rows:
            pdf = pdf.drop_duplicates(subset=["url_hash"])
            hashes = pdf["url_hash"].to_numpy(np.uint64)
            seen = _bloom_contains(filt, hashes, self.m_bits, self.k)
            fresh = pdf.loc[~seen]
            if len(fresh):
                _bloom_add(
                    filt, fresh["url_hash"].to_numpy(np.uint64), self.m_bits, self.k
                )
                n += len(fresh)
                dirty = True
                yield fresh[["url_canon", "url_hash", "bucket"]]
        if dirty:
            self._state.update((filt.tobytes(), n))

    def close(self) -> None:
        pass


def streaming_seen_dedup_tws(
    urls_stream: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 7,
    ttl_ms: int | None = None,
    initial_state: DataFrame | None = None,
) -> DataFrame:
    """First occurrence of every url_hash across the stream, with optional
    state TTL and warm start from a batch seen-set checkpoint
    (``spark.read.parquet(<ckpt>/seen_vN)`` → pass as ``initial_state``)."""
    return urls_stream.groupBy("bucket").transformWithStateInPandas(
        BloomSeenProcessor(m_bits, k, ttl_ms),
        outputStructType=URL_EVENT_SCHEMA,
        outputMode="append",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
        initialState=initial_state.groupBy("bucket")
        if initial_state is not None
        else None,
    )


def run_streaming_dedup_tws(
    spark: SparkSession,
    urls_dir: str,
    query_name: str = "seen_dedup_tws",
    ttl_ms: int | None = None,
    initial_state: DataFrame | None = None,
    m_bits: int = 1 << 20,
    expect_input_rows: int | None = None,
    timeout_s: float = 180.0,
) -> DataFrame:
    """Drive the TWS dedup over a parquet dir of (url_canon, url_hash,
    bucket) files — one micro-batch per file — and return deduped rows.

    Without TTL the query self-terminates (availableNow). With TTL the
    engine keeps running batches to advance the TTL clock, so the runner
    stops the query once all input is consumed: at ``expect_input_rows``
    cumulative rows when given, else after the progress log goes quiet.
    """
    stream = (
        spark.readStream.schema(URL_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(urls_dir)
    )
    out = streaming_seen_dedup_tws(
        stream, m_bits=m_bits, ttl_ms=ttl_ms, initial_state=initial_state
    )
    try:
        prev = spark.conf.get(_PROVIDER_CONF)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        writer = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
        )
        if ttl_ms is None:
            q = writer.trigger(availableNow=True).start()
            try:
                q.awaitTermination(timeout_s)
            finally:
                q.stop()
        else:
            q = writer.start()
            try:
                # accumulate rows incrementally keyed by batchId, draining
                # BOTH recentProgress (catches micro-batches faster than
                # the poll interval — maxFilesPerTrigger=1 batches finish
                # in well under 0.5s) and lastProgress each poll. The
                # cumulative set fixes recentProgress's bounded-buffer
                # undercount on long runs; draining the buffer fixes the
                # fast-batch undercount a lastProgress-only poll has.
                deadline = time.time() + timeout_s
                got = 0
                seen_batches: set[int] = set()
                quiet = 0
                # with a row target, give slow producers more empty-batch
                # slack before concluding the input is drained; without
                # one, 3 empty batches is the drain signal (and the exit
                # for an all-empty input, which would otherwise always
                # wait the full timeout)
                quiet_limit = 3 if expect_input_rows is None else 10
                while time.time() < deadline:
                    progs = list(q.recentProgress)
                    last = q.lastProgress
                    if last is not None:
                        progs.append(last)
                    for p in sorted(progs, key=lambda p: p["batchId"]):
                        if p["batchId"] in seen_batches:
                            continue
                        seen_batches.add(p["batchId"])
                        rows = int(p["numInputRows"])
                        got += rows
                        quiet = quiet + 1 if rows == 0 else 0
                    if expect_input_rows is not None and got >= (
                        expect_input_rows
                    ):
                        break
                    if quiet >= quiet_limit:
                        break
                    time.sleep(0.5)
            finally:
                q.stop()
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    return spark.sql(f"SELECT url_canon, url_hash, bucket FROM {query_name}")
