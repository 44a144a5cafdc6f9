"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata —
the same pattern the pages table uses for ``html:binary``. The Spark-side
plumbing (schema, Arrow batch shape, mapInPandas signature, partitioning)
is real and tested; the actual media decode is STUBBED because no
image/audio libraries exist in this container:

- if PIL/librosa were importable, ``_decode_real`` would run them;
- otherwise a deterministic fake decoder derives metadata from the bytes
  (so tests exercise the full distributed path with stable outputs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)



def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column (UTF-8 bytes of the text — a
    deterministic stand-in for image bytes) + media_type."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type",
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image/png")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio/wav")
        .otherwise("video/mp4"),
    )


def _decode_real(payload: bytes, media_type: str) -> tuple[int, int]:  # pragma: no cover
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg — not available in this "
        "container; the deterministic fake below exercises the same "
        "distributed plumbing"
    )


def _decode_fake(n_bytes: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Deterministic fake dimensions derived from payload size."""
    width = (n_bytes % 1920 + 16).astype("int32")
    height = (n_bytes * 7 % 1080 + 16).astype("int32")
    return width, height


def decode_payload_meta(
    docs_with_payload: DataFrame, use_real_decoder: bool = False
) -> DataFrame:
    """mapInPandas media "decode": binary in → typed metadata out.

    Batch shape: each Arrow batch is a pandas DataFrame with the payload
    column as bytes objects; output conforms to PAYLOAD_META_SCHEMA. The
    deterministic fake decoder always works (it exercises the identical
    distributed plumbing); ``use_real_decoder=True`` routes through
    ``_decode_real``, which is an explicit NotImplementedError stub until a
    media library is wired in — opt-in, never triggered by whatever happens
    to be importable on the cluster.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["n_bytes"].astype("int64")
            if use_real_decoder:
                dims = [
                    _decode_real(b, mt)
                    for b, mt in zip(pdf["payload"], pdf["media_type"])
                ]
                width = pd.Series([d[0] for d in dims], index=pdf.index)
                height = pd.Series([d[1] for d in dims], index=pdf.index)
            else:
                width, height = _decode_fake(n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "checksum": pdf["checksum"],
                }
            )

    # Byte length and md5 are JVM Column expressions — free inside codegen;
    # the Python batch only does the (stubbed) media decode itself. The raw
    # payload bytes cross the Arrow boundary ONLY when the real decoder
    # needs them — the fake decoder works from n_bytes alone, so the
    # dominant column stays JVM-side entirely.
    cols = [
        F.col("doc_id"),
        F.col("media_type"),
        F.coalesce(F.length("payload").cast("long"), F.lit(0).cast("long")).alias("n_bytes"),
        F.md5(F.coalesce(F.col("payload"), F.lit(b""))).alias("checksum"),
    ]
    if use_real_decoder:
        cols.insert(1, F.col("payload"))
    return docs_with_payload.select(*cols).mapInPandas(op, PAYLOAD_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(docs_with_payload: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: one payload → ``n_frames`` evenly-spaced
    byte slices, each a (doc_id, frame_index, frame_bytes, checksum) row.

    The Arrow batch shape, explode fan-out, and binary-column handling are
    the real distributed path a video frame sampler rides; the "decode" is
    a deterministic slice stand-in (slice k = code points
    [⌊k·L/n⌋, ⌊(k+1)·L/n⌋) of the UTF-8 payload, re-encoded) since no
    media codec ships in this container — swap the slice for an
    ffmpeg/PyAV call without touching the dataflow. Code points, not raw
    bytes, so an engine-independent oracle (character substring + md5)
    can recompute every frame byte-for-byte.

    The stand-in slicer assumes UTF-8 payloads (``attach_payload``
    synthesizes them); genuinely binary payloads are decoded with
    ``errors="replace"`` so a non-UTF-8 byte degrades that document's
    frames to replacement characters instead of failing the whole Spark
    task. A real codec works on raw bytes and has no such assumption.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"doc_id": [], "frame_index": [], "frame_bytes": [],
                    "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = bytes(payload or b"").decode("utf-8", errors="replace")
                length = len(s)
                for k in range(n_frames):
                    lo = (k * length) // n_frames
                    hi = ((k + 1) * length) // n_frames
                    fb = s[lo:hi].encode("utf-8")
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(k)
                    rows["frame_bytes"].append(fb)
                    rows["frame_checksum"].append(hashlib.md5(fb).hexdigest())
            yield pd.DataFrame(rows)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, FRAME_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_checksum", T.StringType()),
    ]
)


def resize_payload(
    docs_with_payload: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize plumbing: payload → (doc_id, width, height, checksum of the
    "resized" bytes). Deterministic stand-in (checksum of payload + the
    target-geometry tag) — a real PIL ``Image.resize`` drops in without
    touching the batch shape."""
    tag = f"_{width}x{height}".encode()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized_checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b or b"") + tag).hexdigest()
                    ),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, RESIZE_SCHEMA
    )


def extract_payload_features(
    docs_with_payload: DataFrame, dim: int = 32
) -> DataFrame:
    """Feature extraction plumbing: payload → L2-normalized float vector
    (doc_id, features array<float>). The featurizer is a deterministic
    hashed byte-histogram (bytes bucketed into ``dim`` bins by value) —
    the stand-in for a CNN/CLIP encoder; batches arrive as Arrow, the
    vector math is numpy over the whole batch, and a real model swaps in
    behind the same iterator (load-once-per-executor, like the text
    embedder in functions/embedding.py)."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "features": feats}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, out_schema
    )


# ---------------------------------------------------------------------------
# content-type sniffing (magic numbers)
# ---------------------------------------------------------------------------

# (mime, hex prefix) — longest-prefix-first within a shared first byte so
# the CASE chain below is order-correct (e.g. WEBP before generic RIFF).
MAGIC_PREFIXES = [
    ("application/pdf", "255044462d"),           # %PDF-
    ("image/png", "89504e470d0a1a0a"),           # \x89PNG\r\n\x1a\n
    ("image/gif", "474946383961"),               # GIF89a
    ("image/gif", "474946383761"),               # GIF87a
    ("image/jpeg", "ffd8ff"),
    ("image/webp", "52494646"),                  # RIFF....WEBP (guarded below)
    ("audio/wav", "52494646"),                   # RIFF....WAVE (guarded below)
    ("application/gzip", "1f8b"),
    ("application/zip", "504b0304"),
    ("audio/mpeg", "494433"),                    # ID3
    ("audio/mpeg", "fffb"),
]


def sniff_content_type(payload: Column) -> Column:
    """MIME type from leading payload bytes (magic numbers) — the crawl
    can't trust Content-Type headers, so type routing (multimodal decode
    vs text extraction) keys on the bytes themselves. Pure Columns: one
    hex() of the first 16 bytes, then a literal CASE chain; RIFF
    containers disambiguate on bytes 8-12 (WEBP vs WAVE); an HTML/text
    fallback sniffs a case-folded '<' prefix. Unknown bytes →
    'application/octet-stream'."""
    head = F.lower(F.hex(F.substring(payload, 1, 16)))
    riff_kind = F.substring(head, 17, 8)  # bytes 8..11 in hex chars
    text_head = F.lower(
        F.decode(F.substring(payload, 1, 64), "ISO-8859-1")
    )
    c = F.when(F.length(payload) == 0, F.lit("application/x-empty"))
    for mime, hx in MAGIC_PREFIXES:
        cond = head.startswith(hx)
        if hx == "52494646":
            kind = "57454250" if mime == "image/webp" else "57415645"
            cond = cond & (riff_kind == kind)
        c = c.when(cond, F.lit(mime))
    return (
        c.when(
            F.ltrim(text_head).startswith("<!doctype html")
            | F.ltrim(text_head).startswith("<html"),
            F.lit("text/html"),
        )
        .when(F.ltrim(text_head).startswith("<?xml"), F.lit("text/xml"))
        .otherwise(F.lit("application/octet-stream"))
    )
