"""Sentence-aware text chunking (vectorized) + chunk explosion.

Rebuilds the reference's RAG chunker semantics
(/root/reference/src/processors/rag/embedding.py:95-140: chunk_size 500,
overlap 50, prefer a sentence boundary — CJK terminators 。！？； and
newline — within a 100-char lookback window) as a pandas UDF returning
``array<string>``; downstream ``posexplode`` yields (chunk_index, chunk)
exactly like the reference's enumerate() (embedding.py:164-165).

The chunker is Python-per-document (not per-row-per-char), batched via
Arrow; document counts, not sizes, drive the UDF call overhead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_SIZE = 500
OVERLAP = 50
LOOKBACK = 100
TERMINATORS = "。！？；\n.!?;"


def chunk_text_py(text: str | None, chunk_size: int = CHUNK_SIZE,
                  overlap: int = OVERLAP, lookback: int = LOOKBACK) -> list[str]:
    """Pure-Python chunker (ground truth; also used inside the UDF)."""
    if not text:
        return []
    chunks: list[str] = []
    start = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            window = text[max(start, end - lookback):end]
            cut = max(window.rfind(t) for t in TERMINATORS)
            if cut != -1:
                end = end - (len(window) - cut) + 1
        chunks.append(text[start:end])
        if end >= n:
            break
        start = max(end - overlap, start + 1)
    return chunks


@F.pandas_udf(T.ArrayType(T.StringType()))
def chunk_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in it:
        yield texts.map(chunk_text_py)


def chunk_documents(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_index, chunk, chunk_id) — chunk_id mirrors the
    reference's f"{id}_{i}" synthesis (embedding.py:164-165)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(chunk_udf(F.col(text_col))).alias("chunk_index", "chunk"),
    ).withColumn(
        "chunk_id",
        F.concat_ws("_", F.col(id_col).cast("string"), F.col("chunk_index")),
    )
