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
- **CuckooSeenSet** — same distributed layout, cuckoo-filter bytes (the
  structure the north star names); supports deletion-capable fingerprints
  and bounded per-key slots.

Both filter sets share ``_BucketStateSeenSet``: the distributed scaffolding
(cogrouped probe, cogrouped merge, checkpoint, count) is identical and only
the pure-numpy filter bytes differ.

Sizing (bloom): with the default 8192 buckets × 2^20 bits (128 KiB) × k=7,
total state is 1 GiB for ~10^9 keys at <1% FPR; at 10^10 keys raise buckets
to 131072 (16 GiB spread across the cluster — each task touches only its
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

    def checkpoint(self, path: str) -> int:
        """Materialize state to `path`, cut lineage, and return the set size
        (observed during the write — no separate count job)."""
        from pyspark.sql import Observation

        obs = Observation()
        self.df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        self.df = self.spark.read.parquet(path)  # cut lineage across waves
        return int(obs.get["n"])

    @classmethod
    def restore(cls, spark: SparkSession, path: str) -> "ExactSeenSet":
        return cls(spark, spark.read.parquet(path))

    def count(self) -> int:
        return self.df.count()


class _BucketStateSeenSet:
    """Distributed scaffolding shared by the filter-typed seen sets.

    State = one row per salted bucket ``(bucket, filter:binary, n_items)``.
    Subclasses supply only the pure-numpy filter behavior:

    - ``_cfg() -> tuple[int, ...]`` — picklable config for the UDF closures
    - ``_probe_mask(blob, hashes, cfg) -> bool[n]`` (staticmethod)
    - ``_merge_blob(blob | None, hashes, cfg) -> (bytes, n_new)`` (staticmethod)

    The UDF closures capture only the class object (picklable by reference)
    and the config tuple — never ``self`` (which holds the SparkSession).

    ``cogroup(...).applyInPandas`` is a FULL cogroup: the merge function is
    also invoked for buckets present only in the state side (empty key
    batch) and passes their row through unchanged. Do NOT union an
    anti-joined "untouched" remainder on top — that duplicates every
    state-only bucket row once per add() (regression-tested in
    tests/test_seen.py).
    """

    def __init__(self, spark: SparkSession, state_df: DataFrame | None = None):
        self.spark = spark
        self.df = (
            state_df
            if state_df is not None
            else spark.createDataFrame([], SEEN_STATE_SCHEMA)
        )

    def _cfg(self) -> tuple:  # pragma: no cover - abstract
        raise NotImplementedError

    def filter_unseen(self, candidates: DataFrame) -> DataFrame:
        """Definitely-unseen candidates (a filter may drop a few false
        positives; it never returns an already-seen url). `candidates` must
        carry `bucket` and `url_hash` columns (functions.urls.with_url_columns).
        """
        cls, cfg = type(self), self._cfg()
        cand_cols = candidates.columns

        def probe(key, cands: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
            if len(state):
                seen = cls._probe_mask(
                    state["filter"].iloc[0],
                    cands["url_hash"].to_numpy(np.uint64),
                    cfg,
                )
                return cands.loc[~seen, cand_cols]
            return cands[cand_cols]

        return (
            candidates.groupBy("bucket")
            .cogroup(self.df.groupBy("bucket"))
            .applyInPandas(probe, candidates.schema)
        )

    def add(self, new_keys: DataFrame) -> None:
        """Merge (bucket, url_hash) rows into the per-bucket filter bytes.

        ``n_items`` counts keys genuinely new to the filter (batch-deduped
        and checked against the existing bytes), so repeated adds of the
        same keys do not inflate the count.
        """
        cls, cfg = type(self), self._cfg()

        def merge(key, keys: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
            bucket = int(key[0])
            blob = bytes(state["filter"].iloc[0]) if len(state) else None
            n = int(state["n_items"].iloc[0]) if len(state) else 0
            hashes = (
                np.unique(keys["url_hash"].to_numpy(np.uint64))
                if len(keys)
                else np.array([], dtype=np.uint64)
            )
            new_blob, n_new = cls._merge_blob(blob, hashes, cfg)
            return pd.DataFrame(
                {"bucket": [bucket], "filter": [new_blob], "n_items": [n + n_new]}
            )

        self.df = (
            new_keys.select("bucket", "url_hash")
            .groupBy("bucket")
            .cogroup(self.df.groupBy("bucket"))
            .applyInPandas(merge, SEEN_STATE_SCHEMA)
        )

    def checkpoint(self, path: str) -> int:
        """Materialize bucket state, cut lineage, and return the item count
        (sum of per-bucket n_items, observed during the write)."""
        from pyspark.sql import Observation

        obs = Observation()
        self.df.observe(
            obs, F.coalesce(F.sum("n_items"), F.lit(0)).alias("n")
        ).write.mode("overwrite").parquet(path)
        self.df = self.spark.read.parquet(path)
        return int(obs.get["n"])

    def count(self) -> int:
        row = self.df.agg(F.sum("n_items")).first()
        return int(row[0] or 0)


class BloomSeenSet(_BucketStateSeenSet):
    """Salted-bucket bloom seen-set held as a (bucket, filter, n_items) DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        state_df: DataFrame | None = None,
        n_buckets: int = 256,
        m_bits: int = 1 << 20,
        k: int = 7,
    ):
        super().__init__(spark, state_df)
        self.n_buckets, self.m_bits, self.k = n_buckets, m_bits, k

    def _cfg(self) -> tuple:
        return (self.m_bits, self.k)

    @staticmethod
    def _probe_mask(blob: bytes, hashes: np.ndarray, cfg: tuple) -> np.ndarray:
        m_bits, k = cfg
        filt = np.frombuffer(blob, dtype=np.uint8)
        return _bloom_contains(filt, hashes, m_bits, k)

    @staticmethod
    def _merge_blob(blob: bytes | None, hashes: np.ndarray, cfg: tuple):
        m_bits, k = cfg
        filt = (
            np.frombuffer(blob, dtype=np.uint8).copy()
            if blob is not None
            else np.zeros(m_bits // 8, dtype=np.uint8)
        )
        # count only keys the filter did not already contain (a false
        # positive undercounts by its tiny FPR — n_items is an estimate)
        fresh = hashes[~_bloom_contains(filt, hashes, m_bits, k)]
        _bloom_add(filt, fresh, m_bits, k)
        return filt.tobytes(), int(len(fresh))

    @classmethod
    def restore(
        cls, spark: SparkSession, path: str, n_buckets: int, m_bits: int, k: int
    ) -> "BloomSeenSet":
        return cls(spark, spark.read.parquet(path), n_buckets, m_bits, k)


class CuckooSeenSet(_BucketStateSeenSet):
    """Salted-bucket cuckoo-filter seen-set — the structure the north rule
    names. Same distributed layout as BloomSeenSet, different filter bytes:

    per bucket, a (m × 4)-slot table of uint16 fingerprints (0 = empty).
    key → fp = nonzero 16-bit digest; i1 = h mod m; i2 = i1 XOR perm(fp).
    Membership: fp present in row i1 or i2 (vectorized ``take`` over the
    batch). Insert: vectorized empty-slot placement at i1 then i2 covers the
    overwhelming bulk at ≤50% load; the rare remainder goes through the
    classic bounded eviction loop (loops over EVICTION ROUNDS and the tiny
    leftover vector, never over the batch). When an eviction chain exhausts
    max_kicks, the homeless (row, fingerprint) pair is kept in a tiny
    overflow list inside the same state row — false negatives stay
    impossible, matching the reference's exact PK-set semantics
    (/root/reference/src/processors/agency/estates.py:87-93).

    vs. bloom: ~same memory at 1% FPR, but supports deletion and bounded
    per-key slots; at 10^10 urls both shard identically across buckets.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_df: DataFrame | None = None,
        n_buckets: int = 256,
        m_rows: int = 1 << 14,
    ):
        super().__init__(spark, state_df)
        if m_rows <= 0 or (m_rows & (m_rows - 1)) != 0:
            # The XOR alternate-row mapping in _i2 is an involution only for
            # power-of-two tables; anything else silently breaks the eviction
            # chain and would produce false negatives.
            raise ValueError(f"m_rows must be a power of two, got {m_rows}")
        self.n_buckets, self.m_rows = n_buckets, m_rows

    def _cfg(self) -> tuple:
        return (self.m_rows,)

    # ---- pure-numpy filter ops -------------------------------------------
    @staticmethod
    def _fp(h: np.ndarray) -> np.ndarray:
        f = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)

    @staticmethod
    def _i2(i1: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
        # m must be a power of two: the XOR alternate-row mapping is then an
        # involution (alt(alt(i)) == i), which the eviction loop relies on.
        odd = np.uint64(0x5BD1E995)
        alt = i1.astype(np.uint64) ^ ((fp.astype(np.uint64) * odd) % np.uint64(m))
        return (alt % np.uint64(m)).astype(np.int64)

    @classmethod
    def _contains(cls, table: np.ndarray, overflow: set, h: np.ndarray) -> np.ndarray:
        m = table.shape[0]
        fp = cls._fp(h)
        i1 = (h % np.uint64(m)).astype(np.int64)
        i2 = cls._i2(i1, fp, m)
        hit = (table[i1] == fp[:, None]).any(axis=1) | (
            table[i2] == fp[:, None]
        ).any(axis=1)
        if overflow:
            # overflow holds homeless (row << 16 | fp) entries; a key matches
            # if either of its candidate rows carries its fingerprint there.
            ov = np.fromiter(overflow, dtype=np.uint64)
            e1 = (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
            e2 = (i2.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
            hit |= np.isin(e1, ov) | np.isin(e2, ov)
        return hit

    @classmethod
    def _insert(cls, table: np.ndarray, overflow: set, h: np.ndarray,
                max_kicks: int = 64) -> int:
        """Insert keys; returns how many were not already present."""
        m = table.shape[0]
        fp = cls._fp(h)
        i1 = (h % np.uint64(m)).astype(np.int64)
        i2 = cls._i2(i1, fp, m)
        already = cls._contains(table, overflow, h)
        fp, i1, i2 = fp[~already], i1[~already], i2[~already]
        n_new = int(len(fp))
        # vectorized placement rounds: for each candidate row, claim the
        # first empty slot; index collisions within the batch are serialized
        # by np.unique (first occurrence wins a round, rest retry next round)
        pending = np.arange(len(fp))
        for idx_arr in (i1, i2, i1, i2):
            if not len(pending):
                return n_new
            rows = idx_arr[pending]
            uniq, first = np.unique(rows, return_index=True)
            cand = pending[first]
            placed = np.zeros(len(cand), dtype=bool)
            for slot in range(4):
                free = (table[idx_arr[cand], slot] == 0) & ~placed
                table[idx_arr[cand[free]], slot] = fp[cand[free]]
                placed |= free
            done = set(cand[placed].tolist())
            pending = np.array([p for p in pending if p not in done])
        # eviction loop for the tiny remainder (rare at sane load factors)
        for p in pending.tolist():
            cur_fp, cur_i = fp[p], int(i1[p])
            ok = False
            for _ in range(max_kicks):
                row = table[cur_i]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    table[cur_i, empty[0]] = cur_fp
                    ok = True
                    break
                slot = int(cur_fp) & 3
                cur_fp, table[cur_i, slot] = table[cur_i, slot], cur_fp
                cur_i = int(
                    cls._i2(np.array([cur_i]), np.array([cur_fp], np.uint16), m)[0]
                )
            if not ok:
                # The homeless fingerprint after max_kicks is the LAST evicted
                # victim's, not necessarily this key's — record (row, fp) so
                # whichever key owns it still probes positive (cur_i is one of
                # that fingerprint's two valid rows by the chain invariant).
                overflow.add((int(cur_i) << 16) | int(cur_fp))
        return n_new

    # ---- state (de)serialization ------------------------------------------
    @staticmethod
    def _unpack(blob: bytes, m_rows: int) -> tuple[np.ndarray, set]:
        n_over = int.from_bytes(blob[:4], "little")
        over_bytes = blob[4 : 4 + 8 * n_over]
        overflow = set(np.frombuffer(over_bytes, dtype=np.uint64).tolist())
        table = (
            np.frombuffer(blob[4 + 8 * n_over :], dtype=np.uint16)
            .reshape(m_rows, 4)
            .copy()
        )
        return table, overflow

    @staticmethod
    def _pack(table: np.ndarray, overflow: set) -> bytes:
        over = np.fromiter(overflow, dtype=np.uint64) if overflow else np.array(
            [], dtype=np.uint64
        )
        return (
            len(overflow).to_bytes(4, "little") + over.tobytes() + table.tobytes()
        )

    # ---- base-class hooks -------------------------------------------------
    @staticmethod
    def _probe_mask(blob: bytes, hashes: np.ndarray, cfg: tuple) -> np.ndarray:
        table, overflow = CuckooSeenSet._unpack(blob, cfg[0])
        return CuckooSeenSet._contains(table, overflow, hashes)

    @staticmethod
    def _merge_blob(blob: bytes | None, hashes: np.ndarray, cfg: tuple):
        m_rows = cfg[0]
        table, overflow = (
            CuckooSeenSet._unpack(blob, m_rows)
            if blob is not None
            else (np.zeros((m_rows, 4), dtype=np.uint16), set())
        )
        n_new = CuckooSeenSet._insert(table, overflow, hashes)
        return CuckooSeenSet._pack(table, overflow), n_new

    @classmethod
    def restore(
        cls, spark: SparkSession, path: str, n_buckets: int, m_rows: int
    ) -> "CuckooSeenSet":
        return cls(spark, spark.read.parquet(path), n_buckets, m_rows)
