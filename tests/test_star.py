"""Star-schema extraction surface: golden-fixture-shaped parity tests.

The payloads below are schema-identical synthetic twins of the reference's
golden fixtures (docs/api_responses/single_estate_info_has_phases.json,
_no_phases.json, transactions.json) — same nesting, same structural
variants, same string-typed numerics and extra fields, different values.
They pin the branch behavior the reference's 12 table models exhibit
(/root/reference/src/models/agency/outputs.py:33-488):

- has_phases vs no_phases → phases rows vs nullable buildings.phase_id
- absent optional branches → NULL columns (P5)
- unparseable dates → NULL (outputs.py:47-55)
- extra payload fields → ignored (responses.py:5-6 extra="ignore")
- empty-string names → NULL (outputs.py:296-297)
- string-typed numerics → coerced, garbage → NULL
- bedroom/sitting_room last-non-null fold + last-transaction features
  (processors/agency/buildings.py:100-128)
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.star import (
    STAR_TABLES,
    create_star_tables,
    extract_building_tables,
    extract_estate_tables,
    extract_monthly_market,
)
from hk_housing_datahub_spark.star.schema import STAR_PRIMARY_KEYS
from hk_housing_datahub_spark.sources.tables import TableCatalog


def _estate_doc(eid: str, lang: str, *, has_phases: bool) -> dict:
    """Twin of single_estate_info_{has,no}_phases.json: full estate doc
    with the extra fields the reference fixtures carry (news_name,
    market_stat, sell_count, sm_district, ...) that parsing must ignore."""
    zh = lang == "zh"
    doc = {
        "id": eid,
        "name": {"chi": f"屋苑{eid}" if zh else f"屋苑{eid}", "en": f"Estate {eid}"},
        "is_phase": False,  # extra
        "news_name": "ignored",  # extra
        "sell_count": 1259,  # extra
        "recommendation_sell": True,  # extra
        "market_stat": {  # present in fixture; unused by any table model
            "net_ft_price": 12134,
            "pre_net_ft_price": 11172.11,
            "tx_count": 46,
        },
        "no_of_blocks": "83 Blocks",  # extra
        "region": {"id": "20", "name": "九龍" if zh else "Kowloon"},
        "subregion": {"id": "2006", "name": "深水埗" if zh else "Sham Shui Po"},
        "district": {
            "id": "200602",
            "name": "長沙灣" if zh else "Cheung Sha Wan",
            "neighborhood_district": False,  # extra
        },
        "sm_district": {"top_estate": [{"name": "x"}]},  # extra
        "mtr_line": [{"name": "屯馬綫" if zh else "Tuen Ma Line"}],
        "mtr": [],  # extra
        "address": f"{eid} 福華街" if zh else f"{eid} Fuk Wa Street",
        "first_op_date": "1964-02-09T16:00:00",
        "last_op_date": "not-a-real-date",  # → NULL (outputs.py:47-55)
        "facilityGroup": [
            {"id": "pool", "name": "泳池" if zh else "Pool"},
            {"id": "gym", "name": "" if zh else "Gym"},  # '' → NULL zh name
        ],
        "misc": [],  # extra
        "school_net": {
            "kindergarten": {"id": "SSP"},  # extra sub-branch
            "primary": {"id": "40"},
            "secondary": {"name": "九龍城區" if zh else "Kowloon City"},
        },
        "latitude": 22.3368,
        "longitude": 114.1654,
    }
    if has_phases:
        doc["phase"] = [
            {
                "is_phase": True,
                "id": "P1",
                "name": "首都" if zh else "Capitol",
                "buildings": [
                    {"id": "B1", "name": "1座" if zh else "Tower 1"},
                    {"id": "B2", "name": "2座" if zh else "Tower 2"},
                ],
            },
            {
                "is_phase": True,
                "id": "P2",
                "name": "",  # '' → NULL phase name
                "buildings": [{"id": "B3", "name": "3座" if zh else "Tower 3"}],
            },
        ]
    else:
        doc["phase"] = [
            {
                "is_phase": False,
                "buildings": [{"id": "B9", "name": "大廈" if zh else "Block"}],
            }
        ]
    return doc


def _building_doc() -> dict:
    """Twin of transactions.json: string-typed numerics, feature arrays,
    two transactions on one unit (exercising the fold) and extra fields."""
    return {
        "building": {
            "id": "B000063458",
            "name": "1座 L",
            "bldg_type": "APARTMENT",  # extra
            "estate": {"id": "E1", "name": "日出康城"},  # extra
            "phase": {"id": "P1", "name": "首都"},  # extra
        },
        "data": [
            {
                "unit_id": "U1",
                "unit_type": "APARTMENT",  # extra
                "floor": "70",
                "floor_seq": 53,  # extra
                "flat": "B",
                "area": 903,
                "net_area": 681,
                "transactions": [
                    {
                        "id": "TX1",
                        "tx_type": "S",  # extra
                        "tx_date": "2017-02-20T16:00:00",
                        "feature": [
                            {"id": "balcony", "name": "連露台"},
                            {"id": "utility_platform", "name": "連工作平台"},
                        ],
                        "area": "903",  # string extra → ignored (not in model)
                        "price": "5100000",
                        "gain": "not-a-number",  # → NULL
                        "bedroom": "2",
                        "sitting_room": "1",
                        "net_ft_price": 7489,
                    },
                    {
                        "id": "TX2",
                        "tx_date": "2025-04-09T16:00:00",
                        "feature": [{"id": "sea_view", "name": "海景"}],
                        "price": "6800000",
                        "last_tx_date": "2017-02-20T16:00:00",
                        "gain": "-2.86",
                        "bedroom": "3",
                        "sitting_room": None,  # fold falls back to TX1's 1
                        "net_ft_price": 9985,
                    },
                ],
            },
            {
                "unit_id": "U2",
                "floor": "3",
                "flat": "C",
                "transactions": [
                    {
                        "id": "TX3",
                        "tx_date": "bad-date",  # required-date garbage → row dropped
                        "price": "1000000",
                    },
                    {
                        "id": "TX4",
                        "tx_date": "2020-01-05T00:00:00",
                        "price": "garbage",  # required-price garbage → row dropped
                    },
                ],
            },
        ],
    }


@pytest.fixture(scope="module")
def estate_tables(spark):
    rows = []
    for eid, hp in [("E1", True), ("E2", False)]:
        for lang in ("zh", "en"):
            rows.append((eid, lang, json.dumps(_estate_doc(eid, lang, has_phases=hp))))
    # E3: minimal doc — every optional branch absent
    for lang in ("zh", "en"):
        rows.append(
            (
                "E3",
                lang,
                json.dumps(
                    {
                        "id": "E3",
                        "name": {"en": "Bare Estate"},
                        "region": {"id": "30", "name": "NT"},
                        "district": {"id": "300101", "name": "Tsuen Wan"},
                        "phase": [],
                    }
                ),
            )
        )
    df = spark.createDataFrame(rows, "estate_id string, lang string, payload string")
    return {k: v.cache() for k, v in extract_estate_tables(df).items()}


def test_fixture_estates_row(estate_tables):
    e = {r["estate_id"]: r for r in estate_tables["estates"].collect()}
    assert set(e) == {"E1", "E2", "E3"}
    r = e["E1"]
    assert r["estate_name_en"] == "Estate E1"
    assert r["region_id"] == "20"
    assert r["subregion_id"] == "2006"
    assert r["district_id"] == "200602"
    assert str(r["first_op_date"]).startswith("1964-02-09")
    assert r["last_op_date"] is None  # unparseable → NULL
    assert r["latitude"] == pytest.approx(22.3368)
    # minimal doc: every optional column NULL
    b = e["E3"]
    assert b["estate_name_zh"] is None
    assert b["subregion_id"] is None
    assert b["address_zh"] is None and b["address_en"] is None
    assert b["first_op_date"] is None and b["latitude"] is None


def test_fixture_has_phases_vs_no_phases(estate_tables):
    phases = {r["phase_id"]: r for r in estate_tables["phases"].collect()}
    # only E1's is_phase=true entries; the '' name maps to NULL
    assert set(phases) == {"P1", "P2"}
    assert phases["P1"]["phase_name_en"] == "Capitol"
    assert phases["P2"]["phase_name_en"] is None
    blds = {r["building_id"]: r for r in estate_tables["buildings"].collect()}
    assert set(blds) == {"B1", "B2", "B3", "B9"}
    assert blds["B1"]["phase_id"] == "P1"
    assert blds["B3"]["phase_id"] == "P2"
    # no_phases variant: nullable FK (sql_db.py:100-102)
    assert blds["B9"]["phase_id"] is None
    assert blds["B9"]["estate_id"] == "E2"


def test_fixture_optional_link_tables(estate_tables):
    fac = {r["facility_id"]: r for r in estate_tables["facilities"].collect()}
    assert fac["gym"]["facility_name_zh"] is None  # '' → NULL
    assert fac["pool"]["facility_name_zh"] == "泳池"
    ef = estate_tables["estate_facilities"].collect()
    assert {(r["estate_id"], r["facility_id"]) for r in ef} == {
        ("E1", "pool"), ("E1", "gym"), ("E2", "pool"), ("E2", "gym"),
    }
    sn = {r["estate_id"]: r for r in estate_tables["estate_school_nets"].collect()}
    assert set(sn) == {"E1", "E2"}  # E3 has no school_net
    assert sn["E1"]["school_net_id"] == "40"
    assert sn["E1"]["school_net_name_en"] == "Kowloon City"
    mtr = {r["estate_id"]: r for r in estate_tables["estate_mtr_lines"].collect()}
    assert set(mtr) == {"E1", "E2"}  # E3 has no mtr_line
    assert mtr["E1"]["mtr_line_name_en"] == "Tuen Ma Line"


def test_fixture_building_coercions_and_fold(spark):
    df = spark.createDataFrame(
        [(json.dumps(_building_doc()),)], "payload string"
    )
    t = extract_building_tables(df)
    units = {r["unit_id"]: r for r in t["units"].collect()}
    assert set(units) == {"U1", "U2"}
    u1 = units["U1"]
    # string "3" → int 3 from the LAST non-null transaction (TX2)
    assert u1["bedroom"] == 3
    # TX2 sitting_room is null → fold falls back to TX1's "1"
    assert u1["sitting_room"] == 1
    assert u1["area"] == pytest.approx(903.0)
    u2 = units["U2"]
    assert u2["area"] is None and u2["bedroom"] is None

    tx = {r["tx_id"]: r for r in t["transactions"].collect()}
    # TX3 (bad tx_date) and TX4 (bad price) dropped — required fields
    assert set(tx) == {"TX1", "TX2"}
    assert tx["TX2"]["price"] == pytest.approx(6800000.0)
    assert tx["TX2"]["gain"] == pytest.approx(-2.86)
    assert tx["TX1"]["gain"] is None  # "not-a-number" → NULL
    assert tx["TX1"]["last_tx_date"] is None
    assert str(tx["TX2"]["last_tx_date"]).startswith("2017-02-20")

    # features come from the LAST transaction only (buildings.py:109)
    feats = {(r["unit_id"], r["feature_id"]): r for r in t["unit_features"].collect()}
    assert set(feats) == {("U1", "sea_view")}
    assert feats[("U1", "sea_view")]["feature_name_zh"] == "海景"
    assert feats[("U1", "sea_view")]["feature_name_en"] == "sea_view"


def test_fixture_monthly_market(spark):
    doc = {
        "id": "E1",
        "monthly": [
            {"date": "2024-01-01", "avg_ft_price": 11.5, "total_tx_count": 3},
            {"date": "2024-02-01", "max_ft_rent": 0.5},
        ],
    }
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    out = extract_monthly_market(df).orderBy("record_date").collect()
    assert len(out) == 2
    assert out[0]["avg_ft_price"] == pytest.approx(11.5)
    assert out[0]["total_tx_count"] == 3
    assert out[0]["max_ft_rent"] is None
    assert str(out[1]["record_date"]).startswith("2024-02-01")


def test_unparseable_payload_dropped(spark):
    df = spark.createDataFrame(
        [("{not valid json",), ('{"id": "E1"',)], "payload string"
    )
    t = extract_building_tables(df)
    assert t["units"].count() == 0


def test_star_ddl_catalog_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    create_star_tables(cat)
    # all 14 tables declared; empty read yields the declared schema
    for name, schema in STAR_TABLES.items():
        df = cat.read(name)
        assert df.schema.fieldNames() == schema.fieldNames()
        assert df.count() == 0
    # append + snapshot read honors the DDL'd table
    est = spark.createDataFrame(
        [("E1", None, "Estate 1", "R1", None, None, None, None, None, None, 22.3, 114.1)],
        STAR_TABLES["estates"],
    )
    cat.create("estates", STAR_TABLES["estates"])  # idempotent: no-op
    cat.append("estates", est)
    assert cat.read("estates").count() == 1
    assert [h["op"] for h in cat.history("estates")] == ["create", "append"]


def test_primary_keys_cover_all_tables():
    assert set(STAR_PRIMARY_KEYS) == set(STAR_TABLES)
    for name, pk in STAR_PRIMARY_KEYS.items():
        cols = STAR_TABLES[name].fieldNames()
        assert all(c in cols for c in pk), name


# ----------------------------------------------------------------- pipeline

def _pipeline_inputs(spark, sf_small):
    import os as _os
    from hk_housing_datahub_spark.star import (
        render_building_responses,
        render_estate_responses,
        render_monthly_responses,
    )

    cust = spark.read.parquet(_os.path.join(sf_small, "customer.parquet"))
    orders = spark.read.parquet(_os.path.join(sf_small, "orders.parquet"))
    li = spark.read.parquet(_os.path.join(sf_small, "lineitem.parquet"))
    return (
        render_estate_responses(cust),
        render_monthly_responses(orders),
        render_building_responses(orders, li),
    )


def test_pipeline_batched_load_equals_oneshot(spark, sf_small, tmp_path):
    from hk_housing_datahub_spark.star import run_star_pipeline
    from hk_housing_datahub_spark.star.extractor import extract_estate_tables

    est, monthly, bld = _pipeline_inputs(spark, sf_small)
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    run_star_pipeline(spark, cat, est, monthly, bld, n_batches=3)

    oneshot = extract_estate_tables(est)
    # dims appear in EVERY batch; the PK anti-join must land them once
    assert cat.read("regions").count() == oneshot["regions"].count()
    assert cat.read("facilities").count() == oneshot["facilities"].count()
    # full-table equality on a keyed table (batching must lose nothing)
    got = {tuple(r) for r in cat.read("phases").collect()}
    want = {tuple(r) for r in oneshot["phases"].collect()}
    assert got == want
    # per-batch lineage: one append snapshot per non-empty batch
    assert len([h for h in cat.history("phases") if h["op"] == "append"]) >= 2


def test_pipeline_rerun_is_idempotent(spark, sf_small, tmp_path):
    from hk_housing_datahub_spark.star import run_star_pipeline

    est, monthly, bld = _pipeline_inputs(spark, sf_small)
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    first = run_star_pipeline(spark, cat, est, monthly, bld, n_batches=2)
    n_units = cat.read("units").count()
    # resume manifest says everything is done → second run appends nothing
    second = run_star_pipeline(spark, cat, est, monthly, bld, n_batches=2)
    assert sum(second.values()) == 0
    assert cat.read("units").count() == n_units
    assert first["units"] == n_units


def test_pipeline_parallel_appends_match_sequential(spark, sf_small, tmp_path):
    """Concurrent per-table appends (driver threads submitting independent
    Spark jobs) must commit byte-identical table contents to the strictly
    sequential path — per-table manifests/bloom shards are independent, so
    parallelism may only change wall-clock, never state."""
    from hk_housing_datahub_spark.star import run_star_pipeline
    from hk_housing_datahub_spark.star.schema import STAR_TABLES

    est, monthly, bld = _pipeline_inputs(spark, sf_small)
    seq = TableCatalog(spark, str(tmp_path / "seq"))
    par = TableCatalog(spark, str(tmp_path / "par"))
    run_star_pipeline(
        spark, seq, est, monthly, bld, n_batches=2, max_parallel_tables=1
    )
    run_star_pipeline(
        spark, par, est, monthly, bld, n_batches=2, max_parallel_tables=8
    )
    for t in STAR_TABLES:
        got = {tuple(r) for r in par.read(t).collect()}
        want = {tuple(r) for r in seq.read(t).collect()}
        assert got == want, t


def test_append_deduped_drops_null_pk_rows(spark, tmp_path):
    """A NULL-keyed row never matches the anti-join's committed side, so
    without the guard it would re-append on every replay; the guard drops
    it (it violates the declared non-null key schema anyway)."""
    from hk_housing_datahub_spark.star.pipeline import _append_deduped
    from hk_housing_datahub_spark.star.schema import create_star_tables

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    create_star_tables(cat)
    rows = spark.createDataFrame(
        [("R1", "一", "one"), (None, "二", "two")],
        "region_id string, region_name_zh string, region_name_en string",
    )
    assert _append_deduped(cat, "regions", rows) == 1
    # replay: nothing new — in particular the NULL row is NOT re-appended
    assert _append_deduped(cat, "regions", rows) == 0
    assert cat.read("regions").count() == 1


def test_pipeline_resumes_after_partial_run(spark, sf_small, tmp_path):
    """Crash-after-append-before-mark: re-running the batch must not
    duplicate rows (the PK anti-join makes appends idempotent)."""
    import json as _json

    from hk_housing_datahub_spark.star import run_star_pipeline

    est, monthly, bld = _pipeline_inputs(spark, sf_small)
    root = str(tmp_path / "cat")
    cat = TableCatalog(spark, root)
    run_star_pipeline(spark, cat, est, monthly, bld, n_batches=2)
    done_tables = {t: cat.read(t).count() for t in ("estates", "units", "transactions")}

    # simulate the crash: drop the LAST completed mark from the manifest
    ppath = f"{root}/_pipeline_progress.json"
    with open(ppath) as f:
        state = _json.load(f)
    state["done"].remove("buildings/1")
    with open(ppath, "w") as f:
        _json.dump(state, f)

    rerun = run_star_pipeline(spark, cat, est, monthly, bld, n_batches=2)
    assert sum(rerun.values()) == 0  # batch re-ran; anti-join found nothing new
    for t, n in done_tables.items():
        assert cat.read(t).count() == n


# ---------------------------------------------------------------- streaming

def test_streaming_star_ingestion_exactly_once(spark, sf_small, tmp_path):
    """Two waves of response files through the foreachBatch ingest: final
    tables equal the one-shot extraction; replaying the stream from a fresh
    checkpoint against the SAME catalog appends nothing (PK idempotence)."""
    import os as _os

    from hk_housing_datahub_spark.star import render_estate_responses
    from hk_housing_datahub_spark.star.streaming import stream_estate_responses
    from hk_housing_datahub_spark.star.extractor import extract_estate_tables

    cust = spark.read.parquet(_os.path.join(sf_small, "customer.parquet"))
    resp = render_estate_responses(cust.filter(F.col("c_custkey") < 60))
    src = str(tmp_path / "stream_src")
    # wave 1: first half of the estates; wave 2: the rest
    resp.filter(F.col("estate_id") < "E3").coalesce(1).write.mode(
        "overwrite"
    ).parquet(_os.path.join(src, "w1"))

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    q = stream_estate_responses(
        spark, _os.path.join(src, "*"), cat, str(tmp_path / "ckpt"),
        query_name="star_ingest_t",
    )
    try:
        q.processAllAvailable()
        n_after_w1 = cat.read("estates").count()
        resp.filter(F.col("estate_id") >= "E3").coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(src, "w2"))
        q.processAllAvailable()
    finally:
        q.stop()

    oneshot = extract_estate_tables(resp)
    assert n_after_w1 > 0
    assert cat.read("estates").count() == oneshot["estates"].count()
    got = {tuple(r) for r in cat.read("buildings").collect()}
    want = {tuple(r) for r in oneshot["buildings"].collect()}
    assert got == want

    # replay with a FRESH checkpoint into the same catalog → no duplicates
    q2 = stream_estate_responses(
        spark, _os.path.join(src, "*"), cat, str(tmp_path / "ckpt2"),
        query_name="star_ingest_t2",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cat.read("estates").count() == oneshot["estates"].count()
    assert cat.read("regions").count() == oneshot["regions"].count()


def test_streaming_pending_is_bounded_by_ttl_dead_letter(spark, sf_small, tmp_path):
    """A half whose partner NEVER arrives (the reference's None-returning
    fetch) must not grow the pending state forever: after
    ``pending_ttl_batches`` micro-batches it moves to the dead-letter
    table, pending stays bounded, and the output tables are unaffected."""
    import os as _os

    from hk_housing_datahub_spark.star import render_estate_responses
    from hk_housing_datahub_spark.star.streaming import (
        DEAD_LETTER_TABLE,
        PENDING_TABLE,
        stream_estate_responses,
    )

    cust = spark.read.parquet(_os.path.join(sf_small, "customer.parquet"))
    resp1 = render_estate_responses(cust.filter(F.col("c_custkey") < 40))
    orphan = resp1.select(F.min("estate_id")).first()[0]
    src = str(tmp_path / "src")
    # wave 1: everything EXCEPT the orphan's en half
    resp1.filter(
        ~((F.col("estate_id") == orphan) & (F.col("lang") == "en"))
    ).coalesce(1).write.parquet(_os.path.join(src, "w1"))
    # waves 2-4: unrelated complete pairs, advancing the batch clock
    n_late = 0
    for i, lo in enumerate((40, 44, 48)):
        wave = render_estate_responses(
            cust.filter(
                (F.col("c_custkey") >= lo) & (F.col("c_custkey") < lo + 4)
            )
        )
        n_late += wave.select("estate_id").distinct().count()
        wave.coalesce(1).write.parquet(_os.path.join(src, f"w{i + 2}"))

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    q = stream_estate_responses(
        spark, _os.path.join(src, "*"), cat, str(tmp_path / "ckpt"),
        query_name="star_ttl_t", max_files_per_trigger=1,
        pending_ttl_batches=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the orphan aged out of pending into the dead-letter table …
    assert cat.read(PENDING_TABLE).count() == 0
    dead = cat.read(DEAD_LETTER_TABLE).collect()
    assert [(r.estate_id, r.lang) for r in dead] == [(orphan, "zh")]
    assert dead[0].gave_up_batch - dead[0].parked_batch >= 2
    # … lineage records the give-up wave …
    appends = [h for h in cat.history(DEAD_LETTER_TABLE) if h["op"] == "append"]
    assert sum(h["rows"] for h in appends) == 1
    # … and every PAIRED estate extracted exactly once, orphan excluded
    n_paired = (
        resp1.filter(F.col("estate_id") != orphan)
        .select("estate_id")
        .distinct()
        .count()
        + n_late
    )
    assert cat.read("estates").count() == n_paired


def test_streaming_pairs_straddle_batches_via_pending_state(spark, sf_small, tmp_path):
    """All zh halves arrive in wave 1, all en halves in wave 2: nothing can
    extract until the pair completes, the unpaired halves park in the
    catalog's pending table (no source re-read), and wave 2 drains them."""
    import os as _os

    from hk_housing_datahub_spark.star import render_estate_responses
    from hk_housing_datahub_spark.star.extractor import extract_estate_tables
    from hk_housing_datahub_spark.star.streaming import (
        PENDING_TABLE,
        stream_estate_responses,
    )

    cust = spark.read.parquet(_os.path.join(sf_small, "customer.parquet"))
    resp = render_estate_responses(cust.filter(F.col("c_custkey") < 40))
    src = str(tmp_path / "src")
    resp.filter(F.col("lang") == "zh").coalesce(1).write.parquet(
        _os.path.join(src, "w1")
    )
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    q = stream_estate_responses(
        spark, _os.path.join(src, "*"), cat, str(tmp_path / "ckpt"),
        query_name="star_pending_t", max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
        assert cat.read("estates").count() == 0  # no pair complete yet
        n_pending = cat.read(PENDING_TABLE).count()
        assert n_pending == resp.filter(F.col("lang") == "zh").count()
        resp.filter(F.col("lang") == "en").coalesce(1).write.parquet(
            _os.path.join(src, "w2")
        )
        q.processAllAvailable()
    finally:
        q.stop()
    oneshot = extract_estate_tables(resp)
    assert cat.read("estates").count() == oneshot["estates"].count()
    assert cat.read(PENDING_TABLE).count() == 0  # fully drained


def test_incremental_rollup_exactly_once(spark, tmp_path):
    """Incrementally-maintained monthly rollup: O(delta) refreshes, cursor
    stored inside the rollup rows (atomic with the data), replay-safe,
    bit-identical to a full recompute (decimal sums)."""
    from hk_housing_datahub_spark.star.consumer import (
        ROLLUP_TABLE,
        maintain_monthly_rollup,
        rollup_vs_full_recompute,
    )

    cat = TableCatalog(spark, str(tmp_path / "cat"))

    def tx(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("T"), "id").alias("tx_id"),
            F.timestamp_seconds(
                F.lit(1500000000) + F.col("id") * 86400 * 3
            ).alias("tx_date"),
            (F.col("id") * 1000 + 0.25).alias("price"),
            F.lit(None).cast("timestamp").alias("last_tx_date"),
            F.lit(None).cast("double").alias("gain"),
            F.lit(None).cast("double").alias("net_ft_price"),
            F.concat(F.lit("U"), F.pmod("id", F.lit(7))).alias("unit_id"),
        )

    cat.append("transactions", tx(0, 50))
    assert maintain_monthly_rollup(spark, cat) == 50
    # two appends, one refresh catches both snapshots' delta
    cat.append("transactions", tx(50, 120))
    cat.append("transactions", tx(120, 150))
    assert maintain_monthly_rollup(spark, cat) == 100
    # caught-up / replayed refresh is a no-op
    assert maintain_monthly_rollup(spark, cat) == 0
    inc, full = rollup_vs_full_recompute(spark, cat)
    assert {tuple(r) for r in inc.collect()} == {
        tuple(r) for r in full.collect()
    }
    # the cursor the rollup claims is exactly the head it aggregates
    as_of = cat.read(ROLLUP_TABLE).select(F.max("as_of_snapshot")).first()[0]
    assert int(as_of) == cat.current_snapshot("transactions")


def test_rollup_rebuilds_after_upstream_merge(spark, tmp_path):
    """A merge-upsert on the transactions table (re-crawl correcting
    committed listings) breaks append-only incremental maintenance; the
    consumer detects it, rebuilds from a full scan, re-pins its cursor,
    and subsequent appends go back to O(delta) refreshes."""
    from hk_housing_datahub_spark.star.consumer import (
        maintain_monthly_rollup,
        rollup_vs_full_recompute,
    )

    cat = TableCatalog(spark, str(tmp_path / "cat"))

    def tx(lo, hi, price_bump=0.25):
        return spark.range(lo, hi).select(
            F.concat(F.lit("T"), "id").alias("tx_id"),
            F.timestamp_seconds(
                F.lit(1500000000) + F.col("id") * 86400 * 3
            ).alias("tx_date"),
            (F.col("id") * 1000 + price_bump).alias("price"),
            F.lit(None).cast("timestamp").alias("last_tx_date"),
            F.lit(None).cast("double").alias("gain"),
            F.lit(None).cast("double").alias("net_ft_price"),
            F.concat(F.lit("U"), F.pmod("id", F.lit(7))).alias("unit_id"),
        )

    cat.append("transactions", tx(0, 60))
    assert maintain_monthly_rollup(spark, cat) == 60
    # re-crawl corrects 10 committed transactions' prices
    cat.merge_upsert("transactions", tx(20, 30, price_bump=999.75), keys=["tx_id"])
    assert maintain_monthly_rollup(spark, cat) == -1  # rebuilt, not incremental
    inc, full = rollup_vs_full_recompute(spark, cat)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}
    # back to incremental after the rebuild
    cat.append("transactions", tx(60, 80))
    assert maintain_monthly_rollup(spark, cat) == 20
    inc, full = rollup_vs_full_recompute(spark, cat)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}


def test_pipeline_clustered_transactions_prune_serving_reads(
    spark, sf_small, tmp_path
):
    """cluster_keys range-sorts each transactions append on tx_date, so a
    time-bounded serving read skips non-covering files from manifest stats
    alone — and returns exactly what an unpruned filter would."""
    from hk_housing_datahub_spark.star import run_star_pipeline

    est, monthly, bld = _pipeline_inputs(spark, sf_small)
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    run_star_pipeline(
        spark,
        cat,
        est,
        monthly,
        bld,
        n_batches=2,
        cluster_keys={"transactions": (["tx_date"], 4)},
    )
    lo = cat.read("transactions").agg(F.min("tx_date")).first()[0]
    hi = cat.read("transactions").agg(F.max("tx_date")).first()[0]
    cut = lo + (hi - lo) * 7 // 8
    rep = cat.scan_report("transactions", [("tx_date", ">=", cut)])
    assert rep["parts_total"] >= 8  # 2 batches × 4 clustered files
    assert 0 < rep["parts_kept"] < rep["parts_total"]
    pruned = cat.read("transactions", where=[("tx_date", ">=", cut)])
    full = cat.read("transactions").filter(F.col("tx_date") >= cut)
    assert pruned.count() == full.count() > 0
    assert {r.tx_id for r in pruned.collect()} == {
        r.tx_id for r in full.collect()
    }
