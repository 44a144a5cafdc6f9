"""Streaming recrawl scheduler — the freshness loop as a stateful operator.

The batch path (operators/recrawl.py) recomputes the Cho/Garcia-Molina
change-rate schedule from the full capture history; a live crawler wants
the schedule maintained INCREMENTALLY as captures stream in. This module
keeps per-URL sufficient statistics — (n_captures, n_changes, first_ts,
last_ts, last_digest) is all the estimator needs, so state per URL is a
fixed handful of scalars no matter how long the history — in salted
url-hash buckets via ``applyInPandasWithState`` (the same state layout
as streaming/stateful.py's seen-set), and emits a refreshed schedule row
for every URL captured in a micro-batch.

Parity contract (pinned by tests/test_streaming_recrawl.py): feeding the
same captures through any micro-batch slicing that preserves per-URL
time order yields EXACTLY the batch ``recrawl_schedule`` of their union
— the closed-form math below is the same formula, applied to the same
sufficient statistics.

Scale: state is ~100 bytes/URL spread over ``n_buckets`` groups; the
only shuffle keys on the bucket. 10^10 URLs = ~1 TB of RocksDB state on
a real cluster — the regime Spark's state store is built for.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.recrawl import (
    DEFAULT_MAX_INTERVAL_S,
    DEFAULT_MIN_INTERVAL_S,
)

CAPTURE_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("ts", T.LongType()),  # capture epoch seconds
        T.StructField("digest", T.StringType()),
    ]
)

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_captures", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("avg_interval_s", T.DoubleType()),
        T.StructField("lambda_per_day", T.DoubleType()),
        T.StructField("refetch_interval_s", T.DoubleType()),
        T.StructField("next_fetch_epoch", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("x", T.ArrayType(T.LongType())),
        T.StructField("first", T.ArrayType(T.LongType())),
        T.StructField("last", T.ArrayType(T.LongType())),
        T.StructField("dg", T.ArrayType(T.StringType())),
    ]
)


def schedule_row(
    url: str,
    n: int,
    x: int,
    first: int,
    last: int,
    min_interval_s: int = DEFAULT_MIN_INTERVAL_S,
    max_interval_s: int = DEFAULT_MAX_INTERVAL_S,
) -> tuple:
    """The CGM closed form over the sufficient statistics — the scalar
    twin of operators/recrawl.py's Column expressions (and the property
    tests' reference)."""
    n_int = n - 1
    avg = (last - first) / n_int if n_int > 0 else None
    lam = None
    if n_int > 0 and avg and avg > 0:
        lam = -math.log((n_int - x + 0.5) / (n_int + 0.5)) / avg
    if lam and lam > 0:
        interval = min(max(1.0 / lam, float(min_interval_s)),
                       float(max_interval_s))
    else:
        interval = float(max_interval_s)
    return (
        url,
        n,
        x,
        avg,
        lam * 86400.0 if lam is not None else None,
        interval,
        last + math.floor(interval),
    )


def _recrawl_func_factory(min_interval_s: int, max_interval_s: int):
    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            urls, ns, xs, firsts, lasts, dgs = state.get
            st = {
                u: [ns[i], xs[i], firsts[i], lasts[i], dgs[i]]
                for i, u in enumerate(urls)
            }
        else:
            st = {}
        touched: set[str] = set()
        # ONE sort over the whole micro-batch group: Arrow may deliver a
        # big group as several chunks, and sorting them independently
        # would process a later chunk's earlier capture out of order;
        # na_position='first' matches the batch lag window's NULLS FIRST
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(
                ["url_canon", "ts", "digest"], na_position="first"
            )
            for u, ts, dg in zip(
                batch["url_canon"], batch["ts"], batch["digest"]
            ):
                ts = int(ts)
                dg = None if pd.isna(dg) else dg
                cur = st.get(u)
                if cur is None:
                    st[u] = [1, 0, ts, ts, dg]
                else:
                    cur[0] += 1
                    # EXACT batch semantics (recrawl.py's lag window):
                    # a NULL on either side is never a change — SQL's
                    # `digest != prev` is NULL there
                    if (
                        cur[4] is not None
                        and dg is not None
                        and dg != cur[4]
                    ):
                        cur[1] += 1
                    cur[3] = ts
                    cur[4] = dg
                touched.add(u)
        if touched:
            yield pd.DataFrame(
                [
                    schedule_row(
                        u, *[st[u][0], st[u][1], st[u][2], st[u][3]],
                        min_interval_s=min_interval_s,
                        max_interval_s=max_interval_s,
                    )
                    for u in sorted(touched)
                ],
                columns=[f.name for f in SCHEDULE_SCHEMA.fields],
            )
        items = sorted(st.items())
        state.update(
            (
                [u for u, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
                [v[2] for _, v in items],
                [v[3] for _, v in items],
                [v[4] for _, v in items],
            )
        )

    return update


def streaming_recrawl_schedule(
    captures: DataFrame,
    min_interval_s: int = DEFAULT_MIN_INTERVAL_S,
    max_interval_s: int = DEFAULT_MAX_INTERVAL_S,
) -> DataFrame:
    """Maintain the recrawl schedule over a capture stream; emits the
    refreshed schedule row of every URL captured in each micro-batch
    (update semantics — the LAST row per URL is its current schedule)."""
    return captures.groupBy("bucket").applyInPandasWithState(
        _recrawl_func_factory(min_interval_s, max_interval_s),
        outputStructType=SCHEDULE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_streaming_recrawl(
    spark: SparkSession,
    captures_dir: str,
    query_name: str = "recrawl_stream",
) -> DataFrame:
    """Drive the scheduler over a parquet dir of capture files — one
    micro-batch per file — and return every emitted schedule row.
    ``n_captures`` is monotone per URL, so a URL's CURRENT schedule is
    its max-``n_captures`` row (the parity test selects exactly so)."""
    stream = (
        spark.readStream.schema(CAPTURE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(captures_dir)
    )
    out = streaming_recrawl_schedule(stream)
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
    return spark.sql(f"SELECT * FROM {query_name}")
