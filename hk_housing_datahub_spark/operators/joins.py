"""Join parity operators (SURVEY.md §2.4).

- bilingual pair join (J1): the reference zips zh/en responses per estate
  (/root/reference/src/models/agency/outputs.py:110-126,320-337, guarded by
  id equality). Re-expressed as a hash self-join after pivoting on lang.
- frontier anti-join (J3/SO1): discovery minus seen
  (/root/reference/src/processors/agency/estates.py:195-204 →
  orchestrators/agency.py:86-97).
- variant lookup join (J2): functions/variants.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def bilingual_pair_join(
    docs: DataFrame,
    key_col: str = "source",
    lang_a: str = "en",
    lang_b: str = "zh",
) -> DataFrame:
    """Pair the i-th lang_a doc with the i-th lang_b doc per key.

    The synthetic `documents` table has no shared item id across langs, so
    the pairing key is (key, rank-within-(key,lang) by doc_id) — exactly the
    reference's positional zip (outputs.py:289-291 zips phase lists
    positionally). Equi-join, both sides shuffled on (key, rank); broadcast
    if one lang is small.
    """
    w = W.partitionBy(key_col, "lang").orderBy("doc_id")
    ranked = docs.filter(F.col("lang").isin(lang_a, lang_b)).withColumn(
        "rk", F.row_number().over(w)
    )
    a = ranked.filter(F.col("lang") == lang_a).select(
        F.col(key_col),
        F.col("rk"),
        F.col("doc_id").alias("doc_id_a"),
        F.col("n_chars").alias("n_chars_a"),
    )
    b = ranked.filter(F.col("lang") == lang_b).select(
        F.col(key_col),
        F.col("rk"),
        F.col("doc_id").alias("doc_id_b"),
        F.col("n_chars").alias("n_chars_b"),
    )
    return a.join(b, [key_col, "rk"], "inner").select(
        key_col, "rk", "doc_id_a", "doc_id_b", "n_chars_a", "n_chars_b"
    )


def unseen_anti_join(
    candidates: DataFrame, seen: DataFrame, key: str
) -> DataFrame:
    """candidates \\ seen on `key` — the frontier-minus-seen primitive.

    left_anti: Catalyst broadcasts `seen` when it fits (the common case for
    per-wave increments); otherwise a co-partitioned shuffle join. AQE
    converts to broadcast at runtime if the build side turns out small.
    """
    return candidates.join(seen, key, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``ts_col`` ≤ its own, per ``key`` (NULLs when no prior right row).

    Spark has no native ASOF JOIN; the naive range join explodes to
    O(|L|·|R|) per key. This is the scalable union+window composition:
    tag both sides, union, one window per key ordered by (ts, side-tag)
    carrying ``last(right_col, ignorenulls=True)`` forward, keep left rows.
    ONE shuffle on `key`, linear in |L|+|R| — survives 100× scale-up where
    a range join would not. The right side must be unique per (key, ts)
    (pre-aggregate if not — ties would otherwise be ambiguous, which is
    also what makes DuckDB's native ASOF JOIN well-defined as the oracle).

    Right tag sorts BEFORE left at equal ts so a same-timestamp right row
    is visible to the left row (ts_r ≤ ts_l inclusive semantics).
    """
    clash = (set(right_value_cols) | {"_side"}) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left already has column(s) {sorted(clash)} — the "
            "carried right columns (and the internal '_side' tag) must not "
            "collide with left columns, or left data would be silently lost; "
            "rename them on one side first"
        )
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        key, ts_col, *right_value_cols
    ).withColumn("_side", F.lit(0))
    for c in right_value_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in right_value_cols],
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
