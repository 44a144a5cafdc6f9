"""Deterministic nested-response documents, derived from the flat testdata
tables.

Stands in for the reference's upstream API bodies
(docs/api_responses/single_estate_info_has_phases.json / _no_phases.json /
transactions.json / estate_monthly_market_info.json): every structural
variant those fixtures exhibit is generated here as a pure function of the
base tables, so the DuckDB oracle can compute the expected extraction
output relationally and the JSON render→parse round trip must be the
identity on every extracted field.

Variants covered (reference file:line that motivates each):
- has_phases vs no_phases estates (responses.py:58-66): ``k % 3 == 0``
  estates carry one pseudo-phase entry ``is_phase=false, id=null`` holding
  the buildings → nullable buildings.phase_id (sql_db.py:102).
- empty-string names → NULL (outputs.py:296-297 ``name if name else None``).
- absent optional branches: subregion, district, school_net (± secondary),
  mtr_line, facilityGroup.
- unparseable date strings → NULL (outputs.py:47-55).
- string-typed numerics in transactions ("price": "6800000", "gain":
  "-2.86", "bedroom": "3" — docs/api_responses/transactions.json) and
  extra fields the parse schema must ignore (responses.py:5-6).
- 1-or-2 transactions per unit, exercising the last-non-null
  bedroom/sitting_room fold and last-transaction feature list
  (processors/agency/buildings.py:106-117).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_IDS = ["balcony", "utility_platform", "sea_view", "garden", "duplex", "rooftop"]
FEATURE_NAMES_ZH = ["連露台", "連工作平台", "海景", "花園", "複式", "天台"]


def _cat(*parts) -> Column:
    cols = [p if isinstance(p, Column) else F.lit(p) for p in parts]
    return F.concat(*[c.cast("string") for c in cols])


def _fmt_ts(y: Column, m: Column, d: Column) -> Column:
    return F.date_format(F.make_date(y, m, d), "yyyy-MM-dd HH:mm:ss")


def _id_name(id_col: Column, name_col: Column) -> Column:
    return F.struct(id_col.alias("id"), name_col.alias("name"))


def render_estate_responses(customer: DataFrame) -> DataFrame:
    """(estate_id, lang, payload) — one zh + one en JSON document per
    customer row, shaped like single_estate_info_*.json."""
    k = F.col("c_custkey")
    n = F.col("c_nationkey")
    out = []
    for lang in ("zh", "en"):
        zh = lang == "zh"

        def nm(en_txt: str, zh_txt: str, suffix: Column) -> Column:
            return _cat(zh_txt if zh else en_txt, suffix)

        region_x = F.pmod(n, F.lit(5))
        # district id embeds the nation key so every district row's
        # subregion FK is functionally dependent on the district PK —
        # dedup by PK is then deterministic (all duplicate rows identical)
        district_x = _cat(n, "_", F.pmod(k, F.lit(5)))
        sn_x = F.pmod(k, F.lit(12))

        # facilities: k % 4 of the 3 candidates (slice len 0 → empty array)
        fac = F.slice(
            F.array(
                *[
                    _id_name(
                        _cat("F", F.pmod(k + i, F.lit(30))),
                        F.when(
                            F.pmod(F.pmod(k + i, F.lit(30)), F.lit(6)) == 0,
                            F.lit("") if zh else _cat("Facility ", F.pmod(k + i, F.lit(30))),
                        ).otherwise(
                            nm("Facility ", "設施", F.pmod(k + i, F.lit(30)))
                        ),
                    )
                    for i in range(3)
                ]
            ),
            1,
            F.pmod(k, F.lit(4)),
        )

        def bld(j: int) -> Column:
            return _id_name(_cat("B", k, "_", j), nm("Tower ", "座", F.lit(j)))

        def phase(p: int, blds: list[int]) -> Column:
            pname = F.when(F.pmod(k, F.lit(7)) == 0, F.lit("")).otherwise(
                nm("Phase ", "期數", F.lit(p))
            )
            return F.struct(
                F.lit(True).alias("is_phase"),
                _cat("P", k, "_", p).alias("id"),
                pname.alias("name"),
                F.array(*[bld(j) for j in blds]).alias("buildings"),
            )

        pseudo_phase = F.struct(
            F.lit(False).alias("is_phase"),
            F.lit(None).cast("string").alias("id"),
            F.lit(None).cast("string").alias("name"),
            F.array(bld(1)).alias("buildings"),
        )
        # (k%3, k%2) → phase layout; k%3==0 is the no_phases variant and
        # always has exactly 1 building (n_bld = 1 + k%3)
        phases = (
            F.when(F.pmod(k, F.lit(3)) == 0, F.array(pseudo_phase))
            .when(
                (F.pmod(k, F.lit(3)) == 1) & (F.pmod(k, F.lit(2)) == 0),
                F.array(phase(1, [1, 2])),
            )
            .when(
                (F.pmod(k, F.lit(3)) == 1) & (F.pmod(k, F.lit(2)) == 1),
                F.array(phase(1, [1]), phase(2, [2])),
            )
            .when(
                (F.pmod(k, F.lit(3)) == 2) & (F.pmod(k, F.lit(2)) == 0),
                F.array(phase(1, [1, 2, 3])),
            )
            .otherwise(F.array(phase(1, [1, 3]), phase(2, [2])))
        )

        doc = F.struct(
            _cat("E", k).alias("id"),
            F.struct(
                F.when(F.pmod(k, F.lit(17)) == 0, F.lit(None).cast("string"))
                .otherwise(_cat("屋苑", k))
                .alias("chi"),
                _cat("Estate ", k).alias("en"),
            ).alias("name"),
            k.cast("long").alias("sell_count"),  # extra field → ignored on parse
            _id_name(_cat("R", region_x), nm("Region ", "區", region_x)).alias("region"),
            F.when(
                F.pmod(n, F.lit(4)) != 0,
                _id_name(_cat("SR", n), nm("Subregion ", "分區", n)),
            ).alias("subregion"),
            F.when(
                F.pmod(k, F.lit(11)) != 0,
                _id_name(_cat("D", district_x), nm("District ", "地區", district_x)),
            ).alias("district"),
            F.when(
                F.pmod(k, F.lit(6)) != 0,
                F.array(F.struct(nm("Line ", "線", F.pmod(k, F.lit(9))).alias("name"))),
            ).otherwise(F.array().cast("array<struct<name:string>>")).alias("mtr_line"),
            F.when(F.pmod(k, F.lit(13)) == 0, F.lit(None).cast("string"))
            .otherwise(
                _cat("皇后大道", k, "號") if zh else _cat("No. ", k, " Queen's Road")
            )
            .alias("address"),
            F.when(F.pmod(k, F.lit(19)) == 0, F.lit("not-a-date"))
            .otherwise(
                _fmt_ts(
                    (F.lit(1960) + F.pmod(k, F.lit(60))).cast("int"),
                    (F.lit(1) + F.pmod(k, F.lit(12))).cast("int"),
                    (F.lit(1) + F.pmod(k, F.lit(28))).cast("int"),
                )
            )
            .alias("first_op_date"),
            F.when(F.pmod(k, F.lit(23)) == 0, F.lit(None).cast("string"))
            .otherwise(
                _fmt_ts(
                    (F.lit(1980) + F.pmod(k, F.lit(40))).cast("int"),
                    (F.lit(1) + F.pmod(k + 5, F.lit(12))).cast("int"),
                    (F.lit(1) + F.pmod(k + 7, F.lit(28))).cast("int"),
                )
            )
            .alias("last_op_date"),
            fac.alias("facilityGroup"),
            F.when(
                F.pmod(k, F.lit(5)) != 0,
                F.struct(
                    F.struct(_cat("SN", sn_x).alias("id")).alias("primary"),
                    F.when(
                        F.pmod(k, F.lit(10)) != 0,
                        F.struct(nm("Net ", "校網", sn_x).alias("name")),
                    ).alias("secondary"),
                ),
            ).alias("school_net"),
            F.round(F.lit(22.2) + F.pmod(k, F.lit(1000)) / 10000.0, 4).alias("latitude"),
            F.round(F.lit(113.8) + F.pmod(k, F.lit(1500)) / 10000.0, 4).alias("longitude"),
            phases.alias("phase"),
        )
        out.append(
            customer.select(
                _cat("E", k).alias("estate_id"),
                F.lit(lang).alias("lang"),
                F.to_json(doc).alias("payload"),
            )
        )
    return out[0].unionByName(out[1])


def render_monthly_responses(orders: DataFrame) -> DataFrame:
    """(estate_id, payload) — one estate_monthly_market_info.json-shaped
    document per customer, monthly records aggregated from their orders."""
    k = F.col("o_custkey")
    month = F.date_trunc("month", F.col("o_orderdate"))
    per_month = (
        orders.groupBy(k.alias("ck"), month.alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.max("o_totalprice").alias("max_p"),
            F.min("o_totalprice").alias("min_p"),
            F.sum("o_totalprice").alias("sum_p"),
        )
    )
    rent = F.col("n_tx") >= 2
    # Rounding precision ≥ the exact value's decimal digits (prices have 2
    # decimals; /1000 → 5-6, /50000 → ≤7, /10 → 3): the round is then the
    # identity on the decimal value, never a half-way case — so Spark's
    # HALF_UP-on-string-repr and DuckDB's bit-level rounding agree exactly.
    # Averages are the exception (sum/n over n≥3 two-decimal prices is a
    # non-terminating decimal, so ANY fixed rounding precision can land on
    # an ulp-sensitive boundary): the avg fields are therefore emitted as
    # the RAW IEEE result of round(sum, 2) / n — the dividend is recovered
    # to its exact decimal first, so the division (and the subsequent
    # *0.8 / 10^k steps, same operation order on both engines) is
    # bit-identical across Spark and DuckDB at every SF.
    avg2 = F.round(F.col("sum_p"), 2) / F.col("n_tx")
    record = F.struct(
        F.date_format("m", "yyyy-MM-dd").alias("date"),
        (avg2 / 1000).alias("avg_ft_price"),
        (avg2 * 0.8 / 1000).alias("avg_net_ft_price"),
        F.round(F.col("max_p") / 1000, 6).alias("max_ft_price"),
        F.round(F.col("max_p") * 0.8 / 1000, 6).alias("max_net_ft_price"),
        F.round(F.col("min_p") / 1000, 6).alias("min_ft_price"),
        F.round(F.col("min_p") * 0.8 / 1000, 6).alias("min_net_ft_price"),
        F.when(rent, avg2 / 50000).alias("avg_ft_rent"),
        F.when(rent, avg2 * 0.8 / 50000).alias("avg_net_ft_rent"),
        F.when(rent, F.round(F.col("max_p") / 50000, 8)).alias("max_ft_rent"),
        F.when(rent, F.round(F.col("max_p") * 0.8 / 50000, 8)).alias("max_net_ft_rent"),
        F.when(rent, F.round(F.col("min_p") / 50000, 8)).alias("min_ft_rent"),
        F.when(rent, F.round(F.col("min_p") * 0.8 / 50000, 8)).alias("min_net_ft_rent"),
        F.col("n_tx").cast("int").alias("total_tx_count"),
        F.floor(F.col("n_tx") / 2).cast("int").alias("total_rent_tx_count"),
        F.round(F.col("sum_p"), 2).alias("total_tx_amount"),
        F.when(rent, F.round(F.col("sum_p") / 10, 4)).alias("total_rent_tx_amount"),
    )
    monthly = per_month.groupBy("ck").agg(
        F.sort_array(F.collect_list(record)).alias("monthly")
    )
    return monthly.select(
        _cat("E", F.col("ck")).alias("estate_id"),
        F.to_json(
            F.struct(_cat("E", F.col("ck")).alias("id"), F.col("monthly").alias("monthly"))
        ).alias("payload"),
    )


def render_building_responses(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(building_id, payload) — one transactions.json-shaped document per
    order: units = the order's lineitems, 1-2 transactions per unit with
    string-typed numerics and feature arrays. building_id references the
    owning estate's building list (j ≤ n_bld by construction)."""
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")

    # The synthetic lineitem table has duplicate (orderkey, linenumber)
    # pairs; unit/tx ids derive from that pair, so dedup deterministically
    # first: min(struct(consumed columns)) per key picks the same row a
    # rank-1 window would (struct comparison = the window's lexicographic
    # orderBy) but as a hash aggregate with map-side partial min — no sort,
    # and only one row per key ever crosses the shuffle.
    _cols = ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity",
             "l_discount", "l_shipdate"]
    lineitem = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.min(F.struct(*_cols)).alias("_b"))
        .select("l_orderkey", "l_linenumber",
                *[F.col("_b")[c].alias(c) for c in _cols])
    )

    def feat(shift: Column, count: Column) -> Column:
        ids = F.array(*[F.lit(x) for x in FEATURE_IDS])
        names = F.array(*[F.lit(x) for x in FEATURE_NAMES_ZH])
        idx = [F.pmod(shift + i, F.lit(6)) + 1 for i in range(2)]
        return F.slice(
            F.array(
                *[
                    _id_name(F.element_at(ids, x.cast("int")), F.element_at(names, x.cast("int")))
                    for x in idx
                ]
            ),
            1,
            count,
        )

    tx1 = F.struct(
        _cat("T", ok, "_", ln, "a").alias("id"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("tx_date"),
        feat(pk, F.pmod(pk, F.lit(3))).alias("feature"),
        F.round(F.col("l_extendedprice"), 2).cast("string").alias("price"),
        F.when(F.pmod(ln, F.lit(4)) == 0, F.lit(None).cast("string"))
        .when(F.pmod(pk, F.lit(23)) == 0, F.lit("garbage"))
        .otherwise(
            F.date_format(
                F.timestamp_add("DAY", -(F.lit(100) + ln * 17), F.col("l_shipdate")),
                "yyyy-MM-dd HH:mm:ss",
            )
        )
        .alias("last_tx_date"),
        F.round(F.col("l_discount") * 100 - 5, 2).cast("string").alias("gain"),
        F.when(F.pmod(pk, F.lit(5)) == 0, F.lit(None).cast("string"))
        .otherwise((F.pmod(ln, F.lit(4)) + 1).cast("string"))
        .alias("bedroom"),
        F.when(F.pmod(pk, F.lit(7)) == 0, F.lit(None).cast("string"))
        .otherwise(F.pmod(ln, F.lit(3)).cast("string"))
        .alias("sitting_room"),
        # raw IEEE division (no round): 2-decimal/(q*10) lands on exact
        # .xx5 halves whenever q divides cleanly, where Spark's HALF_UP and
        # DuckDB's bit-level rounding disagree; the unrounded double is
        # bit-identical in both engines and survives the JSON round trip
        (F.col("l_extendedprice") / (F.col("l_quantity") * 10.0)).alias(
            "net_ft_price"
        ),
        F.lit("NORM").alias("transaction_type"),  # extra → ignored on parse
    )
    tx2 = F.struct(
        _cat("T", ok, "_", ln, "b").alias("id"),
        F.date_format(
            F.timestamp_add("DAY", F.lit(11) + ln, F.col("l_shipdate")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("tx_date"),
        feat(pk + 1, F.pmod(pk + 1, F.lit(3))).alias("feature"),
        # round 4 = identity (2-decimal × 1.05 has exactly 4 decimals and
        # always ends in 0/5 — round 2 would be a systematic half-way case)
        F.round(F.col("l_extendedprice") * 1.05, 4).cast("string").alias("price"),
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("last_tx_date"),
        F.lit(None).cast("string").alias("gain"),
        F.when(F.pmod(sk, F.lit(3)) == 0, F.lit(None).cast("string"))
        .otherwise((F.pmod(ln, F.lit(3)) + 2).cast("string"))
        .alias("bedroom"),
        F.lit(None).cast("string").alias("sitting_room"),
        F.lit(None).cast("double").alias("net_ft_price"),
        F.lit("NORM").alias("transaction_type"),
    )
    unit = F.struct(
        _cat("U", ok, "_", ln).alias("unit_id"),
        (F.pmod(ln * 7, F.lit(60)) + 2).cast("string").alias("floor"),
        F.element_at(
            F.split(F.lit("A,B,C,D,E,F,G,H"), ","),
            (F.pmod(pk, F.lit(8)) + 1).cast("int"),
        ).alias("flat"),
        F.when(F.pmod(pk, F.lit(10)) == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("l_quantity") * 13.5, 1))
        .alias("area"),
        F.when(F.pmod(pk, F.lit(10)) == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("l_quantity") * 10.8, 1))
        .alias("net_area"),
        F.when(F.pmod(sk, F.lit(2)) == 0, F.array(tx1, tx2))
        .otherwise(F.array(tx1))
        .alias("transactions"),
    )
    per_order = (
        lineitem.select(ok.alias("okey"), unit.alias("u"))
        .groupBy("okey")
        .agg(F.sort_array(F.collect_list("u")).alias("data"))
    )
    j = F.pmod(F.col("o_orderkey"), 1 + F.pmod(F.col("o_custkey"), F.lit(3))) + 1
    bid = _cat("B", F.col("o_custkey"), "_", j)
    return (
        orders.join(per_order, orders.o_orderkey == per_order.okey)
        .select(
            bid.alias("building_id"),
            F.to_json(
                F.struct(
                    _id_name(bid, _cat("座 ", j)).alias("building"),
                    F.col("data").alias("data"),
                )
            ).alias("payload"),
        )
    )
