from __future__ import annotations

from hk_housing_datahub_spark.operators.traps import (
    flag_trap_hosts,
    host_trap_signals,
    url_trap_features,
)


def test_url_trap_features(spark):
    rows = [
        ("https://a.com/x/y/z?b=2&a=1",),
        ("https://a.com/",),
        ("https://a.com/x/y/x/y",),
        ("https://a.com/p?sid=1",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r["url"]: r.asDict() for r in url_trap_features(df).collect()}
    f = got["https://a.com/x/y/z?b=2&a=1"]
    assert (f["depth"], f["has_repeat_seg"], f["n_params"]) == (3, False, 2)
    f = got["https://a.com/"]
    assert (f["depth"], f["n_params"]) == (0, 0)
    f = got["https://a.com/x/y/x/y"]
    assert f["has_repeat_seg"] is True and f["depth"] == 4
    assert got["https://a.com/p?sid=1"]["n_params"] == 1


def test_trap_hosts_flagged_with_reasons(spark):
    rows = []
    # healthy host: 30 distinct shallow pages, distinct content
    rows += [(f"https://ok.com/p/{i}", f"c{i}") for i in range(30)]
    # session-id trap: 30 URL variants of ONE page
    rows += [(f"https://sid.com/page?sid={i}", "same") for i in range(30)]
    # cyclic-path trap: repeated segments on most URLs
    rows += [
        ("https://loop.com/" + "/".join(["a", "b"] * (2 + i % 3)), f"l{i}")
        for i in range(30)
    ]
    # too-small host: pathological but under min_urls -> never flagged
    rows += [(f"https://tiny.com/x/x/x/x?p={i}&q={i}", "t") for i in range(5)]
    df = spark.createDataFrame(rows, ["url", "digest"])
    out = {
        r["host"]: r.asDict()
        for r in flag_trap_hosts(
            host_trap_signals(df, digest_col="digest"), min_urls=20
        ).collect()
    }
    assert out["ok.com"]["is_trap_suspect"] is False
    assert out["ok.com"]["trap_reasons"] == []
    assert out["sid.com"]["is_trap_suspect"] is True
    assert "dup_content" in out["sid.com"]["trap_reasons"]
    assert out["sid.com"]["urls_per_content"] == 30.0
    assert out["loop.com"]["is_trap_suspect"] is True
    assert "cyclic_paths" in out["loop.com"]["trap_reasons"]
    assert out["tiny.com"]["is_trap_suspect"] is False


def test_signals_without_digest_have_null_content_ratio(spark):
    df = spark.createDataFrame(
        [(f"https://a.com/p/{i}",) for i in range(3)], ["url"]
    )
    row = host_trap_signals(df).collect()[0]
    assert row["n_contents"] is None
    assert row["urls_per_content"] is None
    assert row["n_urls"] == 3
