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
