"""Committed-PK bloom index: O(batch) dedup probes for incremental loads.

The batched star load's exact PK anti-join re-shuffles the ENTIRE
committed key set of every table on every batch: across B batches the
probe work is O(B·|committed|) — at 100× scale that is a full shuffle of
the transactions PK side per batch × 13 tables (the round-2 scale
watch-item). This index keeps a bucket-sharded bloom filter of every
committed PK next to the table's manifest — the role an Iceberg puffin
sidecar plays — so a batch append becomes:

- **probe** — classify the batch's rows into DEFINITELY-NEW (bloom miss;
  bloom filters have no false negatives, so the row cannot already be
  committed) and MAYBE-COMMITTED (bloom hit). Only the maybe rows —
  typically none; a crash-replayed batch at most — go through the exact
  anti-join. When the maybe set is empty the committed table is not
  scanned at all: per-batch probe cost is O(batch), not O(committed).
- **update BEFORE append-commit** — the correctness invariant is
  ``bloom ⊇ committed PKs`` at every instant. A crash between the bloom
  update and the append's manifest commit leaves harmless false
  positives (keys in the bloom but not in the table): the replayed batch
  routes exactly those rows through the exact anti-join, which appends
  them. The reverse order would manufacture false NEGATIVES → silent
  duplicates.

Sharding: keys are hashed JVM-side (``xxhash64`` over the PK columns)
and split into ``n_buckets`` sub-filters by ``hash mod n_buckets``
(``n_buckets`` must be a power of two so signed-pmod and uint64-mod
agree). Updates build per-bucket partial bitmaps DISTRIBUTED — one
``applyInPandas`` group per bucket, Arrow-batched numpy using the same
bit math as ``frontier/seen.py``'s BloomSeenSet — so only bitmaps
(``n_buckets × m_bits/8`` bytes, independent of batch row count) reach
the driver, which ORs each into its stored shard one file at a time
(tmp+rename, atomic). Probes broadcast the shard blobs once per batch.

Sizing: the defaults (64 × 2^20 bits = 8 MiB/table, k=7) hold ~10^7 keys
per table at <1% FPR. At 10^9+ committed keys, scale ``m_bits`` (the
driver never holds more than one shard during update) or promote the
shards to the distributed bucket-state table ``frontier/seen.py``
already implements — probe/update contract unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frontier.seen import _bloom_add, _bloom_contains
from .tables import TableCatalog


class PKBloomIndex:
    def __init__(
        self,
        catalog: TableCatalog,
        n_buckets: int = 64,
        m_bits: int = 1 << 20,
        k: int = 7,
    ):
        if n_buckets & (n_buckets - 1):
            raise ValueError(
                f"n_buckets must be a power of two (got {n_buckets}) — "
                "signed pmod and uint64 modulo must pick the same shard"
            )
        self.catalog = catalog
        self.n_buckets, self.m_bits, self.k = n_buckets, m_bits, k

    # ---------------------------------------------------------------- layout
    def _dir(self, table: str) -> str:
        return os.path.join(self.catalog.root, table, "_pkbloom")

    def _meta_path(self, table: str) -> str:
        return os.path.join(self._dir(table), "meta.json")

    def _shard_path(self, table: str, bucket: int) -> str:
        return os.path.join(self._dir(table), f"shard_{bucket:04d}.bin")

    def exists(self, table: str) -> bool:
        return os.path.exists(self._meta_path(table))

    def n_items(self, table: str) -> int:
        with open(self._meta_path(table)) as f:
            return json.load(f)["n_items"]

    def ensure(self, table: str, pk_cols: list[str]) -> "PKBloomIndex":
        """Create the index if missing. A pre-existing non-empty table
        (catalog created before the index) is backfilled with one full
        scan of its committed PKs — paid once, amortized over every
        subsequent batch."""
        if self.exists(table):
            with open(self._meta_path(table)) as f:
                meta = json.load(f)
            cfg = (meta["n_buckets"], meta["m_bits"], meta["k"])
            if cfg != (self.n_buckets, self.m_bits, self.k):
                raise ValueError(
                    f"pk-bloom for {table} was written with "
                    f"(n_buckets, m_bits, k)={cfg}; reopening with "
                    f"{(self.n_buckets, self.m_bits, self.k)} would probe "
                    "the wrong bits"
                )
            return self
        os.makedirs(self._dir(table), exist_ok=True)
        self._write_meta(table, 0)
        committed = self.catalog.read(table).select(*pk_cols)
        if not committed.isEmpty():
            self.update(table, committed, pk_cols)
        return self

    def _write_meta(self, table: str, n_items: int) -> None:
        tmp = self._meta_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "n_buckets": self.n_buckets,
                    "m_bits": self.m_bits,
                    "k": self.k,
                    "n_items": n_items,
                },
                f,
            )
        os.replace(tmp, self._meta_path(table))

    # ------------------------------------------------------------------- api
    @staticmethod
    def _hash(pk_cols: list[str]):
        return F.xxhash64(*[F.col(c) for c in pk_cols])

    def probe(self, table: str, rows: DataFrame, pk_cols: list[str]) -> DataFrame:
        """``rows`` + boolean ``_pk_maybe`` column: False ⇒ the PK is
        definitely not committed (no-false-negative guarantee); True ⇒
        maybe committed, verify with the exact anti-join."""
        shards: dict[int, bytes] = {}
        for b in range(self.n_buckets):
            p = self._shard_path(table, b)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    shards[b] = f.read()
        if not shards:
            return rows.withColumn("_pk_maybe", F.lit(False))
        bc = self.catalog.spark.sparkContext.broadcast(shards)
        n, m_bits, k = self.n_buckets, self.m_bits, self.k

        @F.pandas_udf("boolean")
        def _maybe(h: pd.Series) -> pd.Series:
            hh = h.to_numpy(np.int64).astype(np.uint64)
            buckets = hh % np.uint64(n)
            out = np.zeros(len(hh), dtype=bool)
            shmap = bc.value
            for b in np.unique(buckets):
                blob = shmap.get(int(b))
                if blob is None:
                    continue
                mask = buckets == b
                out[mask] = _bloom_contains(
                    np.frombuffer(blob, dtype=np.uint8), hh[mask], m_bits, k
                )
            return pd.Series(out, index=h.index)

        return rows.withColumn("_pk_maybe", _maybe(self._hash(pk_cols)))

    def update(self, table: str, rows: DataFrame, pk_cols: list[str]) -> int:
        """Fold ``rows``'s PKs into the stored shards. Distributed partial
        bitmaps; driver ORs them file-at-a-time (bounded memory). Returns
        the number of rows folded in — callers appending PK-unique frames
        use it as the exact batch row count, saving a separate count job."""
        m_bits, k = self.m_bits, self.k
        hdf = rows.select(self._hash(pk_cols).alias("h")).withColumn(
            "b", F.pmod("h", F.lit(self.n_buckets))
        )

        def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            h = pdf["h"].to_numpy(np.int64).astype(np.uint64)
            filt = np.zeros(m_bits // 8, dtype=np.uint8)
            _bloom_add(filt, h, m_bits, k)
            return pd.DataFrame(
                {"b": [key[0]], "blob": [filt.tobytes()], "n": [len(pdf)]}
            )

        parts = (
            hdf.groupBy("b")
            .applyInPandas(build, "b int, blob binary, n long")
            .collect()
        )
        added = 0
        for row in parts:
            p = self._shard_path(table, row["b"])
            cur = np.frombuffer(bytes(row["blob"]), dtype=np.uint8).copy()
            if os.path.exists(p):
                with open(p, "rb") as f:
                    cur |= np.frombuffer(f.read(), dtype=np.uint8)
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                f.write(cur.tobytes())
            os.replace(tmp, p)
            added += row["n"]
        self._write_meta(table, self.n_items(table) + added)
        return added
