"""Vectorized (Arrow-batched) twin of the reference extractor.

One scalar pandas UDF over the ``html`` binary column → a struct of listing
fields. All regex work is pandas ``.str`` ops over whole Arrow batches — no
per-row Python loop (input_hint mandate). The patterns are the *same
compiled regexes* as ``reference.extract_one`` (both run CPython ``re``), so
text extraction is byte-identical by construction; pytest proves it on the
adversarial corpus (CJK, control chars, empty, malformed, NULL html).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .reference import (
    _RE_ADDR,
    _RE_AREA,
    _RE_DATE,
    _RE_HREF,
    _RE_ISO,
    _RE_PRICE,
    _RE_TEXT,
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("address", T.StringType()),
        T.StructField("floor_area", T.DoubleType()),
        T.StructField("transaction_date", T.TimestampType()),
        T.StructField("outlinks", T.ArrayType(T.StringType())),
    ]
)


def _extract_batch(html: pd.Series) -> pd.DataFrame:
    """Extract all fields from one Arrow batch of html bytes."""
    s = html.str.decode("utf-8", errors="replace")
    # .str.decode leaves None for null inputs; fill with "" so .str ops stay
    # vectorized, and mask nulls back in at the end.
    null_mask = s.isna()
    s = s.fillna("")

    text = s.str.extract(_RE_TEXT, expand=False)
    price = (
        s.str.extract(_RE_PRICE, expand=False)
        .str.replace(",", "", regex=False)
        .astype("float64")
    )
    address = s.str.extract(_RE_ADDR, expand=False)
    area = s.str.extract(_RE_AREA, expand=False).astype("float64")
    date_raw = s.str.extract(_RE_DATE, expand=False)
    date_ok = date_raw.where(date_raw.str.match(_RE_ISO, na=False))
    tx_date = pd.to_datetime(date_ok, format="%Y-%m-%d", errors="coerce", utc=True)
    outlinks = s.str.findall(_RE_HREF)

    out = pd.DataFrame(
        {
            "text": text,
            "price": price,
            "address": address,
            "floor_area": area,
            "transaction_date": tx_date,
            "outlinks": outlinks,
        }
    )
    if null_mask.any():
        out.loc[null_mask, ["text", "price", "address", "floor_area"]] = None
        out.loc[null_mask, "transaction_date"] = pd.NaT
        out.loc[null_mask, "outlinks"] = pd.Series(
            [[] for _ in range(int(null_mask.sum()))], index=out.index[null_mask]
        )
    # Missing-match NaN → None for string columns (Arrow wants None, not NaN).
    out["text"] = out["text"].where(out["text"].notna(), None)
    out["address"] = out["address"].where(out["address"].notna(), None)
    return out


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for html in it:
        yield _extract_batch(html)


def extract_df(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(… html …) → pages + flattened listing fields + outlinks.

    The struct is projected once then flattened so Catalyst evaluates the UDF
    a single time per row (check the plan: one ArrowEvalPython node).
    """
    with_struct = pages.withColumn("_x", extract_udf(F.col(html_col)))
    return with_struct.select(
        *[c for c in pages.columns],
        F.col("_x.text").alias("extracted_text"),
        F.col("_x.price").alias("price"),
        F.col("_x.address").alias("address"),
        F.col("_x.floor_area").alias("floor_area"),
        F.col("_x.transaction_date").alias("transaction_date"),
        F.col("_x.outlinks").alias("outlinks"),
    )
