"""Sequence packing — assign documents to fixed-budget training bins.

LLM pre-training wants examples packed head-to-tail into fixed token
budgets (constant-length batches, no padding waste). True first-fit-
decreasing is inherently sequential; the distributed re-statement here is
**offset packing within salted buckets**:

1. bucket each doc by a hash prefix of its id (256 buckets — uniform,
   deterministic, engine-agnostic);
2. within a bucket, lay docs head-to-tail in id order and give each doc
   the bin its START offset falls in: ``bin = floor(cum_before / budget)``.

Properties: fully parallel (each bucket is an independent window — one
shuffle on the bucket key, no global sort); deterministic (same input →
same bins, any cluster size); every bin except a bucket's last is filled
to >= budget once its straddling doc lands (waste is bounded by one doc
per bin boundary, the usual packing trade); oversized docs own their bins.
At 10^10 docs the window state is one running sum per bucket partition —
nothing driver-side.

Oracle twin: the same two expressions (md5 prefix, windowed running sum)
in DuckDB SQL — bit-identical assignment, which is the point: bin
membership is re-derivable by any engine, so a training run's data layout
is auditable after the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    bucket_hex: int = 2,
) -> DataFrame:
    """Add ``bucket`` (hash stratum) and ``bin_id`` (packing bin within the
    bucket) to ``df``. ``weight_col`` is the doc's cost (tokens, chars);
    ``budget`` the bin capacity; ``16**bucket_hex`` buckets."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, bucket_hex)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(weight_col).over(w) - F.col(weight_col)
    return (
        df.withColumn("bucket", bucket)
        .withColumn(
            "bin_id", F.floor(start / F.lit(float(budget))).cast("bigint")
        )
    )


def bin_stats(packed: DataFrame, weight_col: str) -> DataFrame:
    """Per-bin fill metrics — the packing-quality audit (bins short of
    budget are the waste; only each bucket's tail bin should be short)."""
    return packed.groupBy("bucket", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("fill"),
    )


def render_bins(
    packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str = "n_tokens",
    sep: str = "\n<|eos|>\n",
) -> DataFrame:
    """Materialize each packing bin as ONE training sequence: the bin's
    documents laid head-to-tail in id order (the same order the offset
    packer counted them in), joined by ``sep``, with the document ids and
    the exclusive token-offset boundaries riding along — what a trainer
    needs to build attention masks that stop at document boundaries.

    Output: (bucket, bin_id, n_docs, fill, doc_ids array, offsets array —
    offsets[i] is where doc i starts, offsets[n] == fill — and seq_text).

    Scale shape: one aggregation keyed on (bucket, bin_id) — compact key,
    map-side combined collect, each group bounded by the pack budget (a
    bin holds ~budget tokens by construction, so no group can blow up a
    task); the offsets are a pure HOF prefix sum over the sorted group.
    All JVM Column expressions; deterministic given the pack assignment.
    """
    docs = F.array_sort(
        F.collect_list(F.struct(
            F.col(id_col).alias("i"),
            F.col(text_col).alias("t"),
            F.col(weight_col).alias("w"),
        ))
    )
    g = packed.groupBy("bucket", "bin_id").agg(docs.alias("_docs"))
    offsets = F.aggregate(
        "_docs",
        F.array(F.lit(0).cast("long")),
        lambda acc, d: F.concat(
            acc, F.array(F.element_at(acc, -1) + d["w"].cast("long"))
        ),
    )
    return g.select(
        "bucket",
        "bin_id",
        F.size("_docs").alias("n_docs"),
        F.aggregate(
            "_docs", F.lit(0).cast("long"), lambda a, d: a + d["w"]
        ).alias("fill"),
        F.transform("_docs", lambda d: d["i"]).alias("doc_ids"),
        offsets.alias("offsets"),
        F.concat_ws(sep, F.transform("_docs", lambda d: d["t"])).alias(
            "seq_text"
        ),
    )


def training_order(
    df: DataFrame,
    key_cols: list[str],
    seed: str = "",
    bucket_hex: int = 2,
    rank: bool = True,
) -> DataFrame:
    """Seeded deterministic GLOBAL shuffle of training examples.

    Trainers consume the packed corpus in a pseudo-random order that must
    be reproducible (same seed → same order on any engine or cluster
    size, resumable mid-epoch by rank). The order key is
    ``md5(seed ⊕ keys)`` — change ``seed`` for an independent epoch
    permutation; the global order is (order_key, *key_cols), the key
    columns breaking the astronomically-unlikely md5 tie.

    Scale shape: NO global sort or single-partition window anywhere.
    ``shuffle_bucket`` is the order key's hex prefix, so sorting by
    (bucket, key) IS the global order: writers emit
    ``.repartitionByRange(...).sortWithinPartitions(...)`` on those
    columns and read back in order. The optional global ``order_rank``
    (0-based) is one shuffle on the bucket key: rank-within-bucket via a
    per-bucket window plus a 16**bucket_hex-row cumulative-offset table
    joined back broadcast (bounded at 256 rows by construction — unlike a
    corpus-dependent set, this one is SAFE to broadcast).

    DuckDB twin: ``row_number() OVER (ORDER BY md5(...), keys) - 1`` —
    bit-identical ranks (pytest-pinned in test_sampling_packing.py).
    """
    keys = [F.col(c).cast("string") for c in key_cols]
    okey = F.md5(F.concat_ws(chr(31), F.lit(seed), *keys))
    out = df.withColumn("order_key", okey).withColumn(
        "shuffle_bucket", F.substring("order_key", 1, bucket_hex)
    )
    if not rank:
        return out
    from .banded import cumulative_offsets

    w = Window.partitionBy("shuffle_bucket").orderBy("order_key", *key_cols)
    ranked = out.withColumn("_r", F.row_number().over(w))
    counts = out.groupBy("shuffle_bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # cumulative offsets over the ≤ 16**bucket_hex count rows via the
    # shared bounded theta-join (operators/banded.py): the row count
    # made a running-sum window SAFE, but the theta-join keeps
    # WindowExec-single-partition out of the plan entirely
    counts = cumulative_offsets(counts, "shuffle_bucket", "_n", "_off")
    return (
        ranked.join(F.broadcast(counts), "shuffle_bucket")
        .withColumn("order_rank", (F.col("_off") + F.col("_r") - 1).cast("long"))
        .drop("_r", "_off")
    )
