"""Text → embedding generation (EP3 parity).

Rebuilds the reference's embedding stage
(/root/reference/src/processors/rag/embedding.py:184-193,243-262:
SentenceTransformer.encode over batches of 100, L2-normalized, 384-dim,
model loaded once per process) as an **iterator pandas UDF**: the encoder is
constructed once per executor task (outside the batch loop — the Spark
analog of the reference's load-once model), then applied to whole Arrow
batches.

The real sentence-transformers dependency is not available in this sandbox,
so the encoder is a deterministic stand-in: hashed character-n-gram features
projected into ``dim`` buckets and L2-normalized. It is a *real* vectorized
encoder (numpy over the batch, stable across executors/partitions) with the
exact production UDF shape — swapping in a genuine model is a one-line
change inside ``_make_encoder``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 384  # reference: src/config/config.yml:47-51
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Rolling FNV-1a over char n-grams → uint64 bucket ids."""
    if not text:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8", errors="replace"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)))
    h = np.full(len(b) - n + 1, _FNV_OFFSET, dtype=np.uint64)
    for i in range(n):
        h = (h ^ b[i : len(b) - n + 1 + i].astype(np.uint64)) * _FNV_PRIME
    return h


def _make_encoder(dim: int):
    """Build the encoder once (per executor task). Deterministic: same text
    → same vector on every executor, any partitioning."""
    signs = np.array([1.0, -1.0])

    def encode(texts: pd.Series) -> list:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            v = np.zeros(dim, dtype=np.float64)
            h = _hash_ngrams(str(t))
            if h.size:
                np.add.at(v, (h % np.uint64(dim)).astype(np.int64),
                          signs[((h >> np.uint64(32)) & np.uint64(1)).astype(np.int64)])
            nrm = float(np.linalg.norm(v))
            if nrm > 0:
                v /= nrm
            out.append(v.astype(np.float32).tolist())
        return out

    return encode


def embed_udf(dim: int = EMBED_DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encode = _make_encoder(dim)  # once per task, like load-once model
        for texts in it:
            yield pd.Series(encode(texts), index=texts.index)

    return _embed


def embed_documents(docs: DataFrame, text_col: str = "chunk",
                    id_col: str = "chunk_id", dim: int = EMBED_DIM) -> DataFrame:
    """(id, embedding, embedding_norm) — the vector-store sink shape
    (reference K5: embedding.py:195-213)."""
    from ..operators.similarity import norm

    return docs.select(
        F.col(id_col),
        embed_udf(dim)(F.col(text_col)).alias("embedding"),
    ).withColumn("embedding_norm", F.round(norm(F.col("embedding")), 4))
