"""Nested-JSON ingress → relational star schema (P7/S3/J4 parity).

Rebuilds the reference's response-parsing layer — pydantic models with
``extra="ignore"`` + string→numeric coercion + flatten-to-FK-tables
(/root/reference/src/models/agency/responses.py:5-6,30-146;
outputs.py:33-488; utils.py:35-48 parse_response returning None on
mismatch) — as declarative Spark ops:

- ``from_json`` with an **explicit** StructType (never inferred — §1.3
  discipline); fields present in the payload but absent from the schema are
  dropped, mirroring ``extra="ignore"``; an unparseable payload yields a
  NULL struct, mirroring parse_response→None (filtered like P5 null-guards).
- string-typed numerics in the payload (upstream sends ``"price":
  "6800000"``) are declared ``StringType`` then ``cast`` — NULL on garbage,
  never an error (outputs.py:47-55 date discipline likewise → to_timestamp).
- nested arrays ``explode`` into child rows carrying the parent key — the
  J4 join-avoidance-by-lineage-columns pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The "order response" payload schema, as an upstream API would send it:
# numerics as strings, one extra field (`channel`) our schema ignores.
ORDER_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("total", T.StringType()),  # string-typed numeric
        T.StructField(
            "lines",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("line_no", T.IntegerType()),
                        T.StructField("qty", T.StringType()),  # coerced
                        T.StructField("ship", T.StringType()),  # ISO date
                    ]
                )
            ),
        ),
    ]
)


def render_order_json(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(o_orderkey, payload:string) — deterministic JSON documents built from
    the flat tables; stands in for the upstream API body. Includes an extra
    ``channel`` field the parse schema must ignore."""
    lines = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("line_no"),
                        F.col("l_quantity").cast("string").alias("qty"),
                        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship"),
                    )
                )
            ).alias("lines")
        )
    )
    doc = orders.join(lines, orders.o_orderkey == lines.l_orderkey, "inner")
    return doc.select(
        F.col("o_orderkey"),
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("string").alias("total"),
                F.lit("web").alias("channel"),  # extra → ignored on parse
                F.col("lines"),
            )
        ).alias("payload"),
    )


def parse_order_response(responses: DataFrame,
                         payload_col: str = "payload") -> DataFrame:
    """payload JSON → exploded child rows with parent lineage columns.

    Output: (order_id, status, total:double, line_no, qty:double,
    ship_date:date-string) — one row per line item, parent fields carried
    (J4), coercions applied (F2/F14 semantics: bad value → NULL)."""
    parsed = responses.select(
        F.from_json(F.col(payload_col), ORDER_RESPONSE_SCHEMA).alias("r")
    ).filter(F.col("r").isNotNull())  # P5 null-guard: unparseable → dropped
    # try_cast / try_to_timestamp: ANSI-mode-safe "bad value → NULL, never
    # fail" (the reference's pydantic/validator discipline, outputs.py:47-55).
    return (
        parsed.select(
            F.col("r.order_id").alias("order_id"),
            F.col("r.status").alias("status"),
            F.round(F.col("r.total").try_cast("double"), 2).alias("total"),
            F.explode("r.lines").alias("ln"),
        )
        .select(
            "order_id",
            "status",
            "total",
            F.col("ln.line_no").alias("line_no"),
            F.round(F.col("ln.qty").try_cast("double"), 2).alias("qty"),
            F.date_format(
                F.try_to_timestamp(F.col("ln.ship"), F.lit("yyyy-MM-dd")),
                "yyyy-MM-dd",
            ).alias("ship_date"),
        )
    )


def nested_json_explode(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """End-to-end ingress parity query: render → parse → explode.

    The flat oracle (orders ⋈ lineitem directly) must match exactly — the
    JSON round trip is semantically the identity on the extracted fields."""
    return parse_order_response(render_order_json(orders, lineitem))
