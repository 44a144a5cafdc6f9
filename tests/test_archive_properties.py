"""Property-based invariants for the web-archive battery.

A pure-Python model of the snapshot-diff classifier and the WARC record
grammar lets hypothesis sweep capture histories and payload bytes; the
Spark implementations are run against the generated cases in one batch
per example set (module-scoped session, small frames).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# snapshot diff vs a pure-Python model
# ---------------------------------------------------------------------------

T0, T1 = 100, 200

_histories = st.lists(
    st.tuples(
        st.integers(0, 7),          # url id
        st.integers(0, 300),        # epoch
        st.sampled_from(["A", "B", "C", None]),  # digest (None = null body)
    ),
    min_size=1,
    max_size=40,
)


def _model(rows):
    """The docstring's semantics, executed naively."""
    by_url: dict[str, list] = {}
    for uid, ts, dg in rows:
        by_url.setdefault(f"u{uid}", []).append((ts, dg))
    out = {}
    for url, caps in by_url.items():
        le1 = [c for c in caps if c[0] <= T1]
        if not le1:
            continue
        # struct-max order: (ts, digest) with None < any string
        def key(c):
            return (c[0], c[1] is not None, c[1] or "")
        s1 = max(le1, key=key)
        le0 = [c for c in le1 if c[0] <= T0]
        s0 = max(le0, key=key) if le0 else None
        n_win = sum(1 for c in le1 if c[0] > T0)
        if s0 is None:
            status = "new"
        elif n_win == 0:
            status = "stale"
        elif s0[1] != s1[1]:
            status = "changed"
        else:
            status = "refreshed"
        out[url] = (status, s0[1] if s0 else None, s1[1], n_win)
    return out


@given(_histories)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_diff_matches_model(spark, rows):
    from hk_housing_datahub_spark.sources.cdx import cdx_snapshot_diff

    caps = spark.createDataFrame(
        [(f"u{uid}", ts, dg) for uid, ts, dg in rows],
        "url_canon string, epoch long, digest string",
    ).select(
        "url_canon",
        F.timestamp_seconds("epoch").alias("warc_ts"),
        "digest",
    )
    got = {
        r["url"]: (
            r["status"],
            r["digest_t0"],
            r["digest_t1"],
            r["captures_in_window"],
        )
        for r in cdx_snapshot_diff(caps, T0, T1).collect()
    }
    assert got == _model(rows)


# ---------------------------------------------------------------------------
# WARC record grammar round-trip on arbitrary payload bytes
# ---------------------------------------------------------------------------


@given(
    st.lists(st.binary(max_size=200), min_size=1, max_size=8, unique=True)
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_warc_roundtrip_arbitrary_bytes(spark, payloads):
    from hk_housing_datahub_spark.sources.warc import (
        parse_warc_record,
        warc_record,
        warc_record_length,
    )

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "i long, payload binary",
    ).select(
        F.concat(F.lit("https://h.com/p/"), F.col("i")).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("i")).alias(
            "ts"
        ),
        "payload",
    )
    rec = warc_record(F.col("url"), F.col("ts"), F.col("payload"))
    out = df.select(
        "url",
        "payload",
        rec.alias("rec"),
        warc_record_length(F.col("url"), F.col("ts"), F.col("payload"))
        .alias("rlen"),
        parse_warc_record(rec).alias("p"),
    ).collect()
    for r in out:
        assert len(bytes(r["rec"])) == r["rlen"]
        assert r["p"]["url"] == r["url"]
        assert bytes(r["p"]["payload"]) == bytes(r["payload"])


# ---------------------------------------------------------------------------
# redirect resolution vs a pure-Python walker
# ---------------------------------------------------------------------------

_edge_sets = st.dictionaries(
    st.integers(0, 15),              # src node id
    st.integers(0, 15),              # dst node id (functional graph)
    min_size=1,
    max_size=16,
)


def _walk_model(edges: dict):
    out = {}
    e = {f"n{u}": f"n{v}" for u, v in edges.items() if u != v}
    for u in e:
        seen, cur, hops = {u}, e[u], 1
        while cur in e and cur not in seen:
            seen.add(cur)
            cur, hops = e[cur], hops + 1
        if cur in seen and cur in e:
            out[u] = (None, None, True)
        else:
            out[u] = (cur, hops, False)
    return out


@given(_edge_sets)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_redirect_resolution_matches_walker(spark, edges):
    from hk_housing_datahub_spark.operators.redirects import (
        resolve_redirects,
    )

    model = _walk_model(edges)
    rows = [(f"n{u}", f"n{v}") for u, v in edges.items()]
    df = spark.createDataFrame(rows, ["src_url", "dst_url"])
    got = {
        r["url"]: (r["target"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(df).collect()
    }
    assert got == model
