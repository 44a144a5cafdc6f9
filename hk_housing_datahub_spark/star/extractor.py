"""Nested-response JSON → 14 FK-linked star-schema tables, one
from_json + multi-explode pass per response family.

Spark re-expression of the reference's 12 table models
(/root/reference/src/models/agency/outputs.py:33-488) and per-table PK
dedup (processors/agency/buildings.py:54-58, 122-125):

- pydantic ``extra="ignore"``      → explicit StructType (absent = dropped)
- ``parse_date`` validator        → ``try_to_timestamp`` (garbage → NULL)
- string-typed numerics           → ``try_cast`` (garbage → NULL)
- positional zh/en ``zip`` guards → ``arrays_zip`` + both-sides-non-null
  filter (zip truncates at the shorter list; arrays_zip pads with NULL)
- ``name if name else None``      → ``nullif(name, '')``
- last-non-null bedroom fold over a unit's transactions
  (buildings.py:106-117)         → ``try_element_at(filter(...), -1)``
- per-table pk_set dedup          → ``dropDuplicates(PK)``

Everything is JVM Column expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import (
    BUILDING_RESPONSE_SCHEMA,
    ESTATE_RESPONSE_SCHEMA,
    MONTHLY_RESPONSE_SCHEMA,
)


def _ts(col: Column) -> Column:
    """ISO-or-NULL date discipline (outputs.py:47-55): unparseable → NULL."""
    return F.try_to_timestamp(col)


def _nn(col: Column) -> Column:
    """Falsy-name → NULL (outputs.py:122-123,296-297,331)."""
    return F.nullif(col, F.lit(""))


def _parse(responses: DataFrame, schema, payload_col: str = "payload") -> DataFrame:
    """from_json with the explicit schema; unparseable payloads are dropped
    (the reference's parse_response→None, utils.py:35-48)."""
    return responses.withColumn(
        "r", F.from_json(F.col(payload_col), schema)
    ).filter(F.col("r").isNotNull())


# ---------------------------------------------------------------------------
# estate responses (bilingual) → 10 tables
# ---------------------------------------------------------------------------

def extract_estate_tables(responses: DataFrame) -> dict[str, DataFrame]:
    """(estate_id, lang, payload) → the estate-side star tables.

    The zh/en pair join mirrors ``from_both_responses`` (outputs.py:57-76):
    both language documents parse independently, then join on the estate id
    — an equi-join on the natural key, broadcastable when one language
    side is a dimension-sized increment.
    """
    parsed = _parse(responses, ESTATE_RESPONSE_SCHEMA)
    zh = parsed.filter(F.col("lang") == "zh").select(F.col("r").alias("z"))
    en = parsed.filter(F.col("lang") == "en").select(F.col("r").alias("e"))
    both = zh.join(en, F.col("z.id") == F.col("e.id"))

    z, e = F.col("z"), F.col("e")

    estates = both.select(
        z["id"].alias("estate_id"),
        z["name"]["chi"].alias("estate_name_zh"),
        e["name"]["en"].alias("estate_name_en"),
        z["region"]["id"].alias("region_id"),
        z["subregion"]["id"].alias("subregion_id"),
        z["district"]["id"].alias("district_id"),
        z["address"].alias("address_zh"),
        e["address"].alias("address_en"),
        _ts(z["first_op_date"]).alias("first_op_date"),
        _ts(z["last_op_date"]).alias("last_op_date"),
        z["latitude"].alias("latitude"),
        z["longitude"].alias("longitude"),
    ).dropDuplicates(["estate_id"])

    regions = both.select(
        z["region"]["id"].alias("region_id"),
        z["region"]["name"].alias("region_name_zh"),
        e["region"]["name"].alias("region_name_en"),
    ).dropDuplicates(["region_id"])

    subregions = (
        both.filter(z["subregion"].isNotNull() & e["subregion"].isNotNull())
        .select(
            z["subregion"]["id"].alias("subregion_id"),
            z["subregion"]["name"].alias("subregion_name_zh"),
            e["subregion"]["name"].alias("subregion_name_en"),
            z["region"]["id"].alias("region_id"),
        )
        .dropDuplicates(["subregion_id"])
    )

    districts = (
        both.filter(z["district"].isNotNull() & e["district"].isNotNull())
        .select(
            z["district"]["id"].alias("district_id"),
            z["district"]["name"].alias("district_name_zh"),
            e["district"]["name"].alias("district_name_en"),
            # nullable FK: subregion may be absent (outputs.py:267-269)
            z["subregion"]["id"].alias("subregion_id"),
        )
        .dropDuplicates(["district_id"])
    )

    # facilities: positional zip with id-equality guard (outputs.py:110-126)
    fac_zip = both.select(
        z["id"].alias("estate_id"),
        F.explode(
            F.arrays_zip(
                z["facilityGroup"].alias("zf"), e["facilityGroup"].alias("ef")
            )
        ).alias("fz"),
    ).select(
        "estate_id",
        F.col("fz")["zf"].alias("zf"),
        F.col("fz")["ef"].alias("ef"),
    )
    fac_zip = fac_zip.filter(
        F.col("zf").isNotNull()
        & F.col("ef").isNotNull()
        & (F.col("zf")["id"] == F.col("ef")["id"])
    )
    facilities = fac_zip.select(
        F.col("zf")["id"].alias("facility_id"),
        _nn(F.col("zf")["name"]).alias("facility_name_zh"),
        _nn(F.col("ef")["name"]).alias("facility_name_en"),
    ).dropDuplicates(["facility_id"])

    # estate_facilities: single-response explode (outputs.py:79-96)
    estate_facilities = (
        zh.select(
            F.col("z")["id"].alias("estate_id"),
            F.explode(F.col("z")["facilityGroup"]).alias("f"),
        )
        .select("estate_id", F.col("f")["id"].alias("facility_id"))
        .dropDuplicates(["estate_id", "facility_id"])
    )

    school_nets = (
        both.filter(z["school_net"].isNotNull() & e["school_net"].isNotNull())
        .select(
            z["id"].alias("estate_id"),
            z["school_net"]["primary"]["id"].alias("school_net_id"),
            # secondary-name-or-"" (outputs.py:146-155)
            F.coalesce(z["school_net"]["secondary"]["name"], F.lit("")).alias(
                "school_net_name_zh"
            ),
            F.coalesce(e["school_net"]["secondary"]["name"], F.lit("")).alias(
                "school_net_name_en"
            ),
        )
        .dropDuplicates(["estate_id", "school_net_id"])
    )

    # first MTR line only (outputs.py:170-177)
    mtr = (
        both.filter((F.size(z["mtr_line"]) > 0) & (F.size(e["mtr_line"]) > 0))
        .select(
            z["id"].alias("estate_id"),
            z["mtr_line"][0]["name"].alias("mtr_line_name_zh"),
            e["mtr_line"][0]["name"].alias("mtr_line_name_en"),
        )
        .dropDuplicates(["estate_id", "mtr_line_name_en"])
    )

    # phases: zip, keep is_phase entries only (outputs.py:280-301)
    ph_zip = both.select(
        z["id"].alias("estate_id"),
        F.explode(
            F.arrays_zip(z["phase"].alias("zp"), e["phase"].alias("ep"))
        ).alias("pz"),
    ).select(
        "estate_id",
        F.col("pz")["zp"].alias("zp"),
        F.col("pz")["ep"].alias("ep"),
    ).filter(F.col("zp").isNotNull() & F.col("ep").isNotNull())
    phases = (
        ph_zip.filter(F.col("zp")["is_phase"] & F.col("ep")["is_phase"])
        .select(
            F.col("zp")["id"].alias("phase_id"),
            _nn(F.col("zp")["name"]).alias("phase_name_zh"),
            _nn(F.col("ep")["name"]).alias("phase_name_en"),
            "estate_id",
        )
        .dropDuplicates(["phase_id"])
    )

    # buildings: nested zip carrying the (nullable) phase id
    # (outputs.py:311-337; phase_id NULL for is_phase=false pseudo-phases)
    bld_zip = (
        ph_zip.filter(
            (F.size(F.col("zp")["buildings"]) > 0)
            & (F.size(F.col("ep")["buildings"]) > 0)
        )
        .select(
            "estate_id",
            F.col("zp")["id"].alias("phase_id"),
            F.explode(
                F.arrays_zip(
                    F.col("zp")["buildings"].alias("zb"),
                    F.col("ep")["buildings"].alias("eb"),
                )
            ).alias("bz"),
        )
        .select(
            "estate_id",
            "phase_id",
            F.col("bz")["zb"].alias("zb"),
            F.col("bz")["eb"].alias("eb"),
        )
    )
    buildings = (
        bld_zip.filter(
            F.col("zb").isNotNull()
            & F.col("eb").isNotNull()
            & (F.col("zb")["id"] == F.col("eb")["id"])
        )
        .select(
            F.col("zb")["id"].alias("building_id"),
            _nn(F.col("zb")["name"]).alias("building_name_zh"),
            _nn(F.col("eb")["name"]).alias("building_name_en"),
            "estate_id",
            "phase_id",
        )
        .dropDuplicates(["building_id"])
    )

    return {
        "estates": estates,
        "regions": regions,
        "subregions": subregions,
        "districts": districts,
        "facilities": facilities,
        "estate_facilities": estate_facilities,
        "estate_school_nets": school_nets,
        "estate_mtr_lines": mtr,
        "phases": phases,
        "buildings": buildings,
    }


# ---------------------------------------------------------------------------
# monthly market responses → 1 table
# ---------------------------------------------------------------------------

def extract_monthly_market(responses: DataFrame) -> DataFrame:
    """(payload) → estate_monthly_market_info (outputs.py:343-406): one
    explode of the monthly array, estate FK carried through (J4)."""
    parsed = _parse(responses, MONTHLY_RESPONSE_SCHEMA)
    rec = parsed.select(
        F.col("r")["id"].alias("estate_id"),
        F.explode(F.col("r")["monthly"]).alias("m"),
    )
    m = F.col("m")
    out = rec.select(
        "estate_id",
        _ts(m["date"]).alias("record_date"),
        *[
            m[c].alias(c)
            for c in [
                "avg_ft_price", "avg_net_ft_price", "max_ft_price",
                "min_ft_price", "max_net_ft_price", "min_net_ft_price",
                "avg_ft_rent", "avg_net_ft_rent", "max_ft_rent",
                "min_ft_rent", "max_net_ft_rent", "min_net_ft_rent",
                "total_tx_count", "total_rent_tx_count",
                "total_tx_amount", "total_rent_tx_amount",
            ]
        ],
    )
    return out.filter(F.col("record_date").isNotNull()).dropDuplicates(
        ["estate_id", "record_date"]
    )


# ---------------------------------------------------------------------------
# building transaction responses → 3 tables
# ---------------------------------------------------------------------------

def extract_building_tables(responses: DataFrame) -> dict[str, DataFrame]:
    """(payload) → units / unit_features / transactions
    (processors/agency/buildings.py:60-167).

    The bedroom/sitting_room fold ("keep overwriting if non-null over the
    transaction list", buildings.py:106-117) is the last-non-null element:
    ``try_element_at(filter(tx, t -> t.field IS NOT NULL), -1)``. The unit's
    feature list is the LAST transaction's (unconditional overwrite,
    buildings.py:109).
    """
    parsed = _parse(responses, BUILDING_RESPONSE_SCHEMA)
    units_raw = parsed.filter(F.col("r")["building"]["id"].isNotNull()).select(
        F.col("r")["building"]["id"].alias("building_id"),
        F.explode(F.col("r")["data"]).alias("u"),
    ).filter(F.col("u")["unit_id"].isNotNull())

    u = F.col("u")
    tx = u["transactions"]

    def last_non_null(field: str) -> Column:
        present = F.filter(tx, lambda t: t[field].isNotNull())
        return F.try_element_at(present, F.lit(-1))[field]

    units = units_raw.select(
        u["unit_id"].alias("unit_id"),
        u["floor"].alias("floor"),
        u["flat"].alias("flat"),
        u["area"].alias("area"),
        u["net_area"].alias("net_area"),
        last_non_null("bedroom").try_cast("int").alias("bedroom"),
        last_non_null("sitting_room").try_cast("int").alias("sitting_room"),
        "building_id",
    ).dropDuplicates(["unit_id"])

    # feature list of the LAST transaction (buildings.py:109: unconditional
    # overwrite per transaction → the final one wins)
    unit_features = (
        units_raw.select(
            u["unit_id"].alias("unit_id"),
            F.explode(F.try_element_at(tx, F.lit(-1))["feature"]).alias("f"),
        )
        .select(
            "unit_id",
            F.col("f")["id"].alias("feature_id"),
            # "IDs are english names" (buildings.py:160, outputs.py:450-453)
            F.col("f")["name"].alias("feature_name_zh"),
            F.col("f")["id"].alias("feature_name_en"),
        )
        .dropDuplicates(["unit_id", "feature_id"])
    )

    t = F.col("t")
    transactions = (
        units_raw.select(
            u["unit_id"].alias("unit_id"), F.explode(tx).alias("t")
        )
        .select(
            t["id"].alias("tx_id"),
            _ts(t["tx_date"]).alias("tx_date"),
            t["price"].try_cast("double").alias("price"),
            _ts(t["last_tx_date"]).alias("last_tx_date"),
            t["gain"].try_cast("double").alias("gain"),
            t["net_ft_price"].alias("net_ft_price"),
            "unit_id",
        )
        .filter(F.col("tx_date").isNotNull() & F.col("price").isNotNull())
        .dropDuplicates(["tx_id"])
    )

    return {
        "units": units,
        "unit_features": unit_features,
        "transactions": transactions,
    }
