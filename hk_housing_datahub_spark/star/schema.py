"""Payload + table schemas for the star-schema extraction surface.

The reference declares its data model twice — pydantic response models
(/root/reference/src/models/agency/responses.py:30-146) and a SQLAlchemy
star schema (sql_db.py:16-158). Here both live as explicit StructTypes:

- ``*_RESPONSE_SCHEMA``: the shape ``from_json`` parses. Fields present in
  the payload but absent here are silently dropped — the Spark twin of
  pydantic ``extra="ignore"`` (responses.py:5-6). String-typed numerics in
  the upstream payload (``"price": "6800000"``,
  docs/api_responses/transactions.json) are declared StringType and
  coerced later with ``try_cast`` (NULL on garbage, never an error).
- ``STAR_TABLES``: the 14 output tables keyed by name, mirroring
  sql_db.py's columns, types, and nullability one-for-one.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, dtype, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_ID_NAME = T.StructType([_s("id", T.StringType()), _s("name", T.StringType())])
_NAME_ONLY = T.StructType([_s("name", T.StringType())])

# responses.py:40-86 SingleEstateInfoResponse (both langs share the shape)
ESTATE_RESPONSE_SCHEMA = T.StructType(
    [
        _s("id", T.StringType()),
        _s(
            "name",
            T.StructType([_s("chi", T.StringType()), _s("en", T.StringType())]),
        ),
        _s("region", _ID_NAME),
        _s("subregion", _ID_NAME),
        _s("district", _ID_NAME),
        _s("mtr_line", T.ArrayType(_NAME_ONLY)),
        _s("address", T.StringType()),
        # ISO strings parsed with try_to_timestamp → NULL on garbage
        # (outputs.py:47-55 parse_date validator)
        _s("first_op_date", T.StringType()),
        _s("last_op_date", T.StringType()),
        _s("facilityGroup", T.ArrayType(_ID_NAME)),
        _s(
            "school_net",
            T.StructType(
                [
                    _s("primary", T.StructType([_s("id", T.StringType())])),
                    _s("secondary", _NAME_ONLY),
                ]
            ),
        ),
        _s("latitude", T.DoubleType()),
        _s("longitude", T.DoubleType()),
        # responses.py:58-66: phase entries with is_phase=false carry the
        # buildings of a phase-less estate (id/name null → nullable FK)
        _s(
            "phase",
            T.ArrayType(
                T.StructType(
                    [
                        _s("is_phase", T.BooleanType()),
                        _s("id", T.StringType()),
                        _s("name", T.StringType()),
                        _s("buildings", T.ArrayType(_ID_NAME)),
                    ]
                )
            ),
        ),
    ]
)

# responses.py:92-117 EstateMonthlyMarketInfoResponse
_MONTHLY_RECORD = T.StructType(
    [
        _s("date", T.StringType()),
        _s("avg_ft_price", T.DoubleType()),
        _s("avg_net_ft_price", T.DoubleType()),
        _s("max_ft_price", T.DoubleType()),
        _s("max_net_ft_price", T.DoubleType()),
        _s("min_ft_price", T.DoubleType()),
        _s("min_net_ft_price", T.DoubleType()),
        _s("avg_ft_rent", T.DoubleType()),
        _s("avg_net_ft_rent", T.DoubleType()),
        _s("max_ft_rent", T.DoubleType()),
        _s("max_net_ft_rent", T.DoubleType()),
        _s("min_ft_rent", T.DoubleType()),
        _s("min_net_ft_rent", T.DoubleType()),
        _s("total_tx_count", T.IntegerType()),
        _s("total_rent_tx_count", T.IntegerType()),
        _s("total_tx_amount", T.DoubleType()),
        _s("total_rent_tx_amount", T.DoubleType()),
    ]
)
MONTHLY_RESPONSE_SCHEMA = T.StructType(
    [_s("id", T.StringType()), _s("monthly", T.ArrayType(_MONTHLY_RECORD))]
)

# responses.py:122-146 BuildingInfoResponse; string-typed numerics per
# docs/api_responses/transactions.json ("price": "6800000", "gain": "-2.86",
# "bedroom": "3")
_TRANSACTION = T.StructType(
    [
        _s("id", T.StringType()),
        _s("tx_date", T.StringType()),
        _s("feature", T.ArrayType(_ID_NAME)),
        _s("price", T.StringType()),
        _s("last_tx_date", T.StringType()),
        _s("gain", T.StringType()),
        _s("bedroom", T.StringType()),
        _s("sitting_room", T.StringType()),
        _s("net_ft_price", T.DoubleType()),
    ]
)
_UNIT = T.StructType(
    [
        _s("unit_id", T.StringType()),
        _s("floor", T.StringType()),
        _s("flat", T.StringType()),
        _s("area", T.DoubleType()),
        _s("net_area", T.DoubleType()),
        _s("transactions", T.ArrayType(_TRANSACTION)),
    ]
)
BUILDING_RESPONSE_SCHEMA = T.StructType(
    [_s("building", _ID_NAME), _s("data", T.ArrayType(_UNIT))]
)


# ---------------------------------------------------------------------------
# The 14-table star schema (sql_db.py:16-158), column-for-column.
# ---------------------------------------------------------------------------

STAR_TABLES: dict[str, T.StructType] = {
    "regions": T.StructType(
        [
            _s("region_id", T.StringType(), False),
            _s("region_name_zh", T.StringType(), False),
            _s("region_name_en", T.StringType(), False),
        ]
    ),
    "subregions": T.StructType(
        [
            _s("subregion_id", T.StringType(), False),
            _s("subregion_name_zh", T.StringType(), False),
            _s("subregion_name_en", T.StringType(), False),
            _s("region_id", T.StringType(), False),
        ]
    ),
    "districts": T.StructType(
        [
            _s("district_id", T.StringType(), False),
            _s("district_name_zh", T.StringType(), False),
            _s("district_name_en", T.StringType(), False),
            _s("subregion_id", T.StringType()),
        ]
    ),
    "estates": T.StructType(
        [
            _s("estate_id", T.StringType(), False),
            _s("estate_name_zh", T.StringType()),
            _s("estate_name_en", T.StringType(), False),
            _s("region_id", T.StringType(), False),
            _s("subregion_id", T.StringType()),
            _s("district_id", T.StringType()),
            _s("address_zh", T.StringType()),
            _s("address_en", T.StringType()),
            _s("first_op_date", T.TimestampType()),
            _s("last_op_date", T.TimestampType()),
            _s("latitude", T.DoubleType()),
            _s("longitude", T.DoubleType()),
        ]
    ),
    "estate_school_nets": T.StructType(
        [
            _s("estate_id", T.StringType(), False),
            _s("school_net_id", T.StringType(), False),
            _s("school_net_name_zh", T.StringType(), False),
            _s("school_net_name_en", T.StringType(), False),
        ]
    ),
    "estate_facilities": T.StructType(
        [
            _s("estate_id", T.StringType(), False),
            _s("facility_id", T.StringType(), False),
        ]
    ),
    "facilities": T.StructType(
        [
            _s("facility_id", T.StringType(), False),
            _s("facility_name_zh", T.StringType()),
            _s("facility_name_en", T.StringType(), False),
        ]
    ),
    "estate_mtr_lines": T.StructType(
        [
            _s("estate_id", T.StringType(), False),
            _s("mtr_line_name_zh", T.StringType()),
            _s("mtr_line_name_en", T.StringType(), False),
        ]
    ),
    "phases": T.StructType(
        [
            _s("phase_id", T.StringType(), False),
            _s("phase_name_zh", T.StringType()),
            _s("phase_name_en", T.StringType()),
            _s("estate_id", T.StringType(), False),
        ]
    ),
    "buildings": T.StructType(
        [
            _s("building_id", T.StringType(), False),
            _s("building_name_zh", T.StringType()),
            _s("building_name_en", T.StringType()),
            _s("estate_id", T.StringType(), False),
            _s("phase_id", T.StringType()),  # nullable FK (sql_db.py:102)
        ]
    ),
    "estate_monthly_market_info": T.StructType(
        [
            _s("estate_id", T.StringType(), False),
            _s("record_date", T.TimestampType(), False),
            _s("avg_ft_price", T.DoubleType()),
            _s("avg_net_ft_price", T.DoubleType()),
            _s("max_ft_price", T.DoubleType()),
            _s("min_ft_price", T.DoubleType()),
            _s("max_net_ft_price", T.DoubleType()),
            _s("min_net_ft_price", T.DoubleType()),
            _s("avg_ft_rent", T.DoubleType()),
            _s("avg_net_ft_rent", T.DoubleType()),
            _s("max_ft_rent", T.DoubleType()),
            _s("min_ft_rent", T.DoubleType()),
            _s("max_net_ft_rent", T.DoubleType()),
            _s("min_net_ft_rent", T.DoubleType()),
            _s("total_tx_count", T.IntegerType()),
            _s("total_rent_tx_count", T.IntegerType()),
            _s("total_tx_amount", T.DoubleType()),
            _s("total_rent_tx_amount", T.DoubleType()),
        ]
    ),
    "units": T.StructType(
        [
            _s("unit_id", T.StringType(), False),
            _s("floor", T.StringType()),
            _s("flat", T.StringType(), False),
            _s("area", T.DoubleType()),
            _s("net_area", T.DoubleType()),
            _s("bedroom", T.IntegerType()),
            _s("sitting_room", T.IntegerType()),
            _s("building_id", T.StringType(), False),
        ]
    ),
    "unit_features": T.StructType(
        [
            _s("unit_id", T.StringType(), False),
            _s("feature_id", T.StringType(), False),
            _s("feature_name_zh", T.StringType()),
            _s("feature_name_en", T.StringType(), False),
        ]
    ),
    "transactions": T.StructType(
        [
            _s("tx_id", T.StringType(), False),
            _s("tx_date", T.TimestampType(), False),
            _s("price", T.DoubleType(), False),
            _s("last_tx_date", T.TimestampType()),
            _s("gain", T.DoubleType()),
            _s("net_ft_price", T.DoubleType()),
            _s("unit_id", T.StringType(), False),
        ]
    ),
}

# Primary keys per table (sql_db.py PrimaryKeyConstraint declarations) —
# the reference's per-table pk_sets dedup (processors/agency/buildings.py:54-58)
# becomes dropDuplicates(PK) in the extractor.
STAR_PRIMARY_KEYS: dict[str, list[str]] = {
    "regions": ["region_id"],
    "subregions": ["subregion_id"],
    "districts": ["district_id"],
    "estates": ["estate_id"],
    "estate_school_nets": ["estate_id", "school_net_id"],
    "estate_facilities": ["estate_id", "facility_id"],
    "facilities": ["facility_id"],
    "estate_mtr_lines": ["estate_id", "mtr_line_name_en"],
    "phases": ["phase_id"],
    "buildings": ["building_id"],
    "estate_monthly_market_info": ["estate_id", "record_date"],
    "units": ["unit_id"],
    "unit_features": ["unit_id", "feature_id"],
    "transactions": ["tx_id"],
}


def create_star_tables(catalog) -> None:
    """Declare all 14 tables in a TableCatalog (CREATE if absent) — the
    reference's ``Base.metadata.create_all`` (processors/agency/buildings.py:52)."""
    for name, schema in STAR_TABLES.items():
        catalog.create(name, schema)
