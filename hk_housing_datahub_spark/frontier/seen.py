"""URL-seen set — the scale-critical dedup state.

Rebuilds the reference's persistent PK-seen-sets
(/root/reference/src/processors/agency/estates.py:87-93 "deduplication
across partitions"; buildings.py:54-58) as distributed state:

- **ExactSeenSet** — a DataFrame of url_hash keys; membership = broadcast-able
  ``left_anti`` join. Exact, used for correctness tests and small crawls.
- **BloomSeenSet** — salted-bucket bloom state: one row per bucket
  ``(bucket:int, filter:binary, n_items:long)``; probe/update via
  ``applyInPandas`` over buckets (Arrow-batched numpy, no per-row Python).
  Buckets are keyed by url-hash (NOT host), so a Zipf-hot host spreads over
  all buckets — this is the salted-hash partitioning from the north rule.

Sizing: with the default 8192 buckets × 2^20 bits (128 KiB) × k=7, total
state is 1 GiB for ~10^9 keys at <1% FPR; at 10^10 keys raise buckets to
131072 (16 GiB spread across the cluster — each task touches only its
bucket's 128 KiB slice). False positives skip a URL (acceptable for crawl);
false negatives are impossible (property-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEEN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("filter", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

_MASK64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic second hash derived from the 64-bit url hash."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK64)
    return z ^ (z >> np.uint64(31))


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions; double hashing h1 + i*h2 (Kirsch–Mitzenmacher)."""
    h1 = hashes.astype(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)  # odd → full-period stepping
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _bloom_contains(filt: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(hashes, m_bits, k)
    bytes_idx, bit_idx = pos >> 3, pos & 7
    bits = (filt[bytes_idx] >> bit_idx) & 1
    return bits.all(axis=1)


def _bloom_add(filt: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    if hashes.size == 0:
        return filt
    pos = _positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(filt, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return filt


class ExactSeenSet:
    """Exact distributed seen-set: a keyed DataFrame + anti-join membership."""

    def __init__(self, spark: SparkSession, seen_df: DataFrame | None = None):
        self.spark = spark
        self.df = (
            seen_df
            if seen_df is not None
            else spark.createDataFrame([], "url_hash long")
        )

    def filter_unseen(self, candidates: DataFrame) -> DataFrame:
        """Rows of `candidates` whose url_hash is not in the set.

        Catalyst/AQE picks broadcast for a small seen side automatically; at
        scale this is a shuffled anti-join co-partitioned on url_hash.
        """
        return candidates.join(self.df, "url_hash", "left_anti")

    def add(self, new_keys: DataFrame) -> None:
        self.df = self.df.unionByName(
            new_keys.select("url_hash").distinct()
        ).distinct()

    def checkpoint(self, path: str) -> None:
        self.df.write.mode("overwrite").parquet(path)
        self.df = self.spark.read.parquet(path)  # cut lineage across waves

    @classmethod
    def restore(cls, spark: SparkSession, path: str) -> "ExactSeenSet":
        return cls(spark, spark.read.parquet(path))

    def count(self) -> int:
        return self.df.count()


class BloomSeenSet:
    """Salted-bucket bloom seen-set held as a (bucket, filter, n_items) DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        state_df: DataFrame | None = None,
        n_buckets: int = 256,
        m_bits: int = 1 << 20,
        k: int = 7,
    ):
        self.spark = spark
        self.n_buckets, self.m_bits, self.k = n_buckets, m_bits, k
        self.df = (
            state_df
            if state_df is not None
            else spark.createDataFrame([], SEEN_STATE_SCHEMA)
        )

    def _cogroup_probe(self, candidates: DataFrame, out_schema) -> DataFrame:
        m_bits, k = self.m_bits, self.k
        cand_cols = candidates.columns

        def probe(key, cands: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
            if len(state):
                filt = np.frombuffer(state["filter"].iloc[0], dtype=np.uint8).copy()
                seen = _bloom_contains(
                    filt, cands["url_hash"].to_numpy(np.uint64), m_bits, k
                )
                return cands.loc[~seen, cand_cols]
            return cands[cand_cols]

        return (
            candidates.groupBy("bucket")
            .cogroup(self.df.groupBy("bucket"))
            .applyInPandas(probe, out_schema)
        )

    def filter_unseen(self, candidates: DataFrame) -> DataFrame:
        """Definitely-unseen candidates (bloom may drop a few false positives;
        never returns an already-seen url). `candidates` must carry `bucket`
        and `url_hash` columns (see functions.urls.with_url_columns)."""
        return self._cogroup_probe(candidates, candidates.schema)

    def add(self, new_keys: DataFrame) -> None:
        """Merge (bucket, url_hash) rows into the per-bucket filters."""
        m_bits, k = self.m_bits, self.k

        def merge(key, keys: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
            bucket = int(key[0])
            if len(state):
                filt = np.frombuffer(state["filter"].iloc[0], dtype=np.uint8).copy()
                n = int(state["n_items"].iloc[0])
            else:
                filt = np.zeros(m_bits // 8, dtype=np.uint8)
                n = 0
            hashes = keys["url_hash"].to_numpy(np.uint64)
            _bloom_add(filt, hashes, m_bits, k)
            return pd.DataFrame(
                {
                    "bucket": [bucket],
                    "filter": [filt.tobytes()],
                    "n_items": [n + len(hashes)],
                }
            )

        merged = (
            new_keys.select("bucket", "url_hash")
            .groupBy("bucket")
            .cogroup(self.df.groupBy("bucket"))
            .applyInPandas(merge, SEEN_STATE_SCHEMA)
        )
        untouched = self.df.join(
            new_keys.select("bucket").distinct(), "bucket", "left_anti"
        )
        self.df = merged.unionByName(untouched)

    def checkpoint(self, path: str) -> None:
        self.df.write.mode("overwrite").parquet(path)
        self.df = self.spark.read.parquet(path)

    @classmethod
    def restore(
        cls, spark: SparkSession, path: str, n_buckets: int, m_bits: int, k: int
    ) -> "BloomSeenSet":
        return cls(spark, spark.read.parquet(path), n_buckets, m_bits, k)

    def count(self) -> int:
        row = self.df.agg(F.sum("n_items")).first()
        return int(row[0] or 0)
