"""Deterministic hash sampling + per-bucket offset packing properties."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.packing import bin_stats, pack_greedy
from hk_housing_datahub_spark.operators.sampling import (
    hash_sample,
    mixture_sample,
    rate_to_hex,
    stratified_hash_sample,
)


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_rate_to_hex_bounds():
    assert rate_to_hex(0.0) == "00000000"
    # keep-all sorts after EVERY hex string — strict '<' against 'ffffffff'
    # would drop rows whose md5 prefix is exactly 'ffffffff'
    assert rate_to_hex(1.0) == "gggggggg"
    assert rate_to_hex(0.5) == "80000000"


def test_rate_one_keeps_ffffffff_prefixed_rows(spark):
    # contrived key whose md5 prefix is maximal via direct check of the
    # predicate: every hex prefix, including 'ffffffff', passes rate 1.0
    df = spark.range(0, 2000)
    assert hash_sample(df, ["id"], 1.0).count() == 2000


def test_stratified_requires_row_keys(spark, sf_small):
    import pytest

    d = _docs(spark, sf_small)
    with pytest.raises(ValueError, match="key_cols"):
        stratified_hash_sample(d, "lang", {"en": 0.5})


def test_null_keys_hash_distinctly(spark):
    # (a, NULL, b) must not collide with (a, b, NULL), and NULL-keyed rows
    # must not share one hash with each other's non-null twins
    from hk_housing_datahub_spark.operators.sampling import _key_hash

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None), (None, "a", "b")],
        ["x", "y", "z"],
    )
    hashes = [r[0] for r in df.select(_key_hash(["x", "y", "z"], "")).collect()]
    assert len(set(hashes)) == 3


def test_hash_sample_deterministic_and_partition_invariant(spark, sf_small):
    d = _docs(spark, sf_small)
    a = {r.doc_id for r in hash_sample(d, ["doc_id"], 0.3).collect()}
    b = {
        r.doc_id
        for r in hash_sample(d.repartition(13), ["doc_id"], 0.3).collect()
    }
    assert a == b and a  # same membership under any partitioning
    # monotone in rate: a smaller sample is a subset of a larger one
    small = {r.doc_id for r in hash_sample(d, ["doc_id"], 0.1).collect()}
    assert small <= a
    # rate is approximately honored (md5 uniformity)
    n = d.count()
    assert abs(len(a) / n - 0.3) < 0.08
    # a different salt draws a genuinely different sample
    c = {r.doc_id for r in hash_sample(d, ["doc_id"], 0.3, salt="x").collect()}
    assert c != a


def test_stratified_rates_and_default(spark, sf_small):
    d = _docs(spark, sf_small)
    s = stratified_hash_sample(
        d, "lang", {"en": 0.8, "zh": 0.2}, default_rate=0.0,
        key_cols=["doc_id"],
    )
    got = {r["lang"]: r["n"] for r in
           s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in
           d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {"en", "zh"}  # default 0 drops other strata entirely
    assert abs(got["en"] / tot["en"] - 0.8) < 0.15
    assert abs(got.get("zh", 0) / tot["zh"] - 0.2) < 0.15


def test_pack_greedy_matches_sequential_recompute(spark, sf_small):
    d = _docs(spark, sf_small).select("doc_id", "n_chars")
    budget = 20_000
    packed = pack_greedy(d, "doc_id", "n_chars", budget).toPandas()
    # sequential twin: per bucket, lay docs head-to-tail in id order
    for bucket, g in packed.groupby("bucket"):
        g = g.sort_values("doc_id")
        start = g["n_chars"].cumsum() - g["n_chars"]
        expect = (start // budget).astype("int64")
        assert list(g["bin_id"]) == list(expect), f"bucket {bucket}"
    # bins within a bucket are dense from 0 — holds here because no doc
    # exceeds the budget (an oversized straddler may skip whole bins; that
    # general case is pinned by hypothesis in test_sampling_properties.py)
    assert (packed["n_chars"] <= budget).all()
    for _, g in packed.groupby("bucket"):
        bins = sorted(set(g["bin_id"]))
        assert bins[0] == 0 and bins == list(range(len(bins)))


def test_bin_stats_fill_audit(spark, sf_small):
    d = _docs(spark, sf_small).select("doc_id", "n_chars")
    budget = 20_000
    packed = pack_greedy(d, "doc_id", "n_chars", budget)
    stats = bin_stats(packed, "n_chars").toPandas()
    # every non-tail bin of a bucket reaches the budget once its straddling
    # doc lands: fill >= budget - (weight that spilled into the next bin)
    tail = stats.sort_values("bin_id").groupby("bucket").tail(1)
    tail_keys = set(zip(tail["bucket"], tail["bin_id"]))
    non_tail = stats[
        ~stats.apply(lambda r: (r["bucket"], r["bin_id"]) in tail_keys, axis=1)
    ]
    max_w = d.agg(F.max("n_chars")).first()[0]
    assert (non_tail["fill"] + max_w >= budget).all()


def test_mixture_sample_hits_target_proportions(spark, sf_small):
    d = _docs(spark, sf_small)
    srcs = [r["source"] for r in d.select("source").distinct().collect()]
    assert len(srcs) >= 2
    a, b = sorted(srcs)[:2]
    total = 300
    m = mixture_sample(
        d, "source", {a: 0.7, b: 0.3}, total, key_cols=["doc_id"]
    )
    got = {r["source"]: r["n"] for r in
           m.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {a, b}
    n = sum(got.values())
    counts = {r["source"]: r["n"] for r in
              d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # a stratum can only be short if it was under-supplied (rate capped)
    if counts[a] >= 0.7 * total and counts[b] >= 0.3 * total:
        assert abs(n - total) / total < 0.25
        assert abs(got.get(a, 0) / n - 0.7) < 0.15
    # determinism: same call → same membership
    ids1 = {r.doc_id for r in m.collect()}
    ids2 = {r.doc_id for r in mixture_sample(
        d, "source", {a: 0.7, b: 0.3}, total, key_cols=["doc_id"]).collect()}
    assert ids1 == ids2


def test_mixture_sample_caps_undersupplied_stratum(spark, sf_small):
    d = _docs(spark, sf_small)
    counts = {r["source"]: r["n"] for r in
              d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    rare = min(counts, key=counts.get)
    # demand far more of the rare stratum than exists → rate caps at 1.0:
    # every rare row is kept, none duplicated, and the result is short
    m = mixture_sample(
        d, "source", {rare: 1.0}, counts[rare] * 10, key_cols=["doc_id"]
    )
    assert m.count() == counts[rare]
    assert m.select("source").distinct().collect()[0][0] == rare


def test_hash_split_partitions_and_is_stable(spark, sf_small):
    from hk_housing_datahub_spark.operators.sampling import hash_split

    d = _docs(spark, sf_small)
    s = hash_split(d, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["split"]: r["n"] for r in
           s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = d.count()
    assert set(got) == {"train", "val", "test"}  # fractions sum to 1: no NULL
    assert sum(got.values()) == n
    assert abs(got["train"] / n - 0.8) < 0.1
    # stability: same key → same split across calls and partitionings
    a = {(r.doc_id, r.split) for r in s.select("doc_id", "split").collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(
            d.repartition(17), ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
        ).select("doc_id", "split").collect()
    }
    assert a == b
    # splits are disjoint with the SAME salt as a sample: a 0.8-rate sample
    # is exactly the train split (band structure is shared)
    from hk_housing_datahub_spark.operators.sampling import hash_sample

    train_ids = {r.doc_id for r in s.filter("split = 'train'").collect()}
    samp_ids = {r.doc_id for r in hash_sample(d, ["doc_id"], 0.8).collect()}
    assert train_ids == samp_ids


def test_drop_boilerplate_lines(spark):
    from hk_housing_datahub_spark.operators.textops import (
        drop_boilerplate_lines,
    )

    footer = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (i, f"unique line {i} alpha\n{footer}\nunique line {i} beta")
            for i in range(10)
        ]
        + [(99, "short\n-\nonly unique content here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in
           drop_boilerplate_lines(docs, max_line_df=5).collect()}
    assert len(out) == 11
    for i in range(10):
        assert footer not in out[i]  # boilerplate gone everywhere
        assert f"unique line {i} alpha" in out[i]  # order + content kept
        assert out[i].index("alpha") < out[i].index("beta")
    assert out[99] == "short\n-\nonly unique content here"  # untouched


def test_drop_boilerplate_large_hot_set_shuffle_path(spark):
    """The web-scale case the broadcast hint used to break: a LARGE hot
    set (thousands of distinct lines each above max_line_df) must
    produce identical output whether the hot-set join broadcasts or
    shuffles — so the operator is correct when AQE declines to broadcast
    a corpus-dependent set that would OOM the driver at 100 TB."""
    from hk_housing_datahub_spark.operators.textops import (
        drop_boilerplate_lines,
    )

    # 2000 distinct boilerplate lines, each appearing in 4 docs (> df 2);
    # every doc also keeps one unique line
    rows = []
    for j in range(2000):
        for rep in range(4):
            i = (j * 4 + rep) % 800
            rows.append((i, j))
    docs = (
        spark.createDataFrame(rows, ["doc_id", "j"])
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.array_insert(
                    F.array_sort(
                        F.collect_list(
                            F.format_string(
                                "boilerplate navigation row %08d", "j"
                            )
                        )
                    ),
                    1,
                    F.format_string("unique content kept %08d", "doc_id"),
                ),
            ).alias("text")
        )
    )
    expected = {
        r.doc_id: r.text
        for r in drop_boilerplate_lines(docs, max_line_df=2).collect()
    }
    assert len(expected) == 800
    assert all(t == f"unique content kept {i:08d}" for i, t in expected.items())
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    prev = {}
    for key in keys:
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
        spark.conf.set(key, "-1")
    try:
        df = drop_boilerplate_lines(docs, max_line_df=2)
        got = {r.doc_id: r.text for r in df.collect()}
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in final  # genuinely the shuffle path
    finally:
        for key in keys:
            if prev[key] is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev[key])
    assert got == expected


def test_render_bins_sequences_and_offsets(spark):
    """render_bins: docs concatenate in id order with the separator,
    offsets are the exclusive prefix sums of weights (offsets[-1] == the
    bin fill), and every packed doc lands in exactly one sequence."""
    from hk_housing_datahub_spark.operators.packing import (
        pack_greedy,
        render_bins,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body", 10 + i % 4) for i in range(200)],
        ["doc_id", "text", "n_tokens"],
    )
    packed = pack_greedy(docs, "doc_id", "n_tokens", 64)
    out = render_bins(packed).collect()
    seen_ids: list[int] = []
    for r in out:
        assert r.n_docs == len(r.doc_ids) == len(r.offsets) - 1
        assert r.offsets[0] == 0 and r.offsets[-1] == r.fill
        widths = [r.offsets[i + 1] - r.offsets[i] for i in range(r.n_docs)]
        assert widths == [10 + i % 4 for i in r.doc_ids]
        assert r.doc_ids == sorted(r.doc_ids)
        assert r.seq_text == "\n<|eos|>\n".join(
            f"doc {i} body" for i in r.doc_ids
        )
        seen_ids += list(r.doc_ids)
    assert sorted(seen_ids) == list(range(200))


def test_render_bins_duckdb_parity(spark, sf_small):
    """Engine parity on the real corpus: per-bin sequence text and offset
    arrays identical to DuckDB's string_agg/window recomputation."""
    import duckdb

    from hk_housing_datahub_spark.operators.packing import (
        pack_greedy,
        render_bins,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text", F.col("n_chars").alias("n_tokens")
    )
    out = render_bins(pack_greedy(docs, "doc_id", "n_tokens", 20000))
    got = {
        (r.bucket, r.bin_id): (list(r.doc_ids), list(r.offsets), r.seq_text)
        for r in out.collect()
    }
    want = {}
    for b, bid, ids, offs, txt in duckdb.sql(
        f"""
        WITH p AS (
            SELECT doc_id, text, n_chars AS w,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM '{sf_small}/documents.parquet'),
        q AS (
            SELECT *, CAST(floor(
                (sum(w) OVER (PARTITION BY bucket ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - w) / 20000.0) AS BIGINT) AS bin_id
            FROM p),
        q2 AS (
            SELECT *, sum(w) OVER (
                PARTITION BY bucket, bin_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
            FROM q)
        SELECT bucket, bin_id,
               list(doc_id ORDER BY doc_id),
               [0] || list(run ORDER BY doc_id),
               string_agg(text, '\n<|eos|>\n' ORDER BY doc_id)
        FROM q2 GROUP BY bucket, bin_id
        """
    ).fetchall():
        want[(b, bid)] = (ids, offs, txt)
    assert got == want


def test_training_order_duckdb_parity_and_properties(spark, sf_small):
    """Global shuffle order: ranks are a 0..n-1 permutation, bit-identical
    to the DuckDB global-window twin, seed changes the permutation, and
    the bucketed rank equals the global-sort rank."""
    import duckdb

    from hk_housing_datahub_spark.operators.packing import training_order

    d = _docs(spark, sf_small).select("doc_id")
    got = (
        training_order(d, ["doc_id"], seed="ep0")
        .select("doc_id", "order_rank")
        .orderBy("doc_id")
        .toPandas()
    )
    n = len(got)
    assert sorted(got["order_rank"]) == list(range(n))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    want = con.execute(
        """
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY md5(concat_ws(chr(31), 'ep0',
                                          CAST(doc_id AS VARCHAR))),
                            CAST(doc_id AS VARCHAR)) - 1 AS order_rank
        FROM documents ORDER BY doc_id
        """
    ).df()
    assert got["order_rank"].astype("int64").tolist() == want[
        "order_rank"
    ].astype("int64").tolist()
    # a different seed is a different permutation (overwhelmingly)
    other = (
        training_order(d, ["doc_id"], seed="ep1")
        .select("doc_id", "order_rank")
        .orderBy("doc_id")
        .toPandas()
    )
    assert other["order_rank"].tolist() != got["order_rank"].tolist()
    # rank=False path: just the sortable key columns, no rank join
    keyed = training_order(d, ["doc_id"], seed="ep0", rank=False)
    assert "order_rank" not in keyed.columns
    assert {"order_key", "shuffle_bucket"} <= set(keyed.columns)


def test_cap_per_group_deterministic_uniform_cap(spark):
    from hk_housing_datahub_spark.operators.sampling import cap_per_group

    rows = [(f"h{i % 3}", i) for i in range(90)] + [("h_small", 999)]
    df = spark.createDataFrame(rows, ["host", "doc_id"])
    capped = cap_per_group(df, ["host"], ["doc_id"], 10)
    per = {
        r["host"]: r["n"]
        for r in capped.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # big groups cut to the cap; small groups untouched
    assert per == {"h0": 10, "h1": 10, "h2": 10, "h_small": 1}
    # deterministic: same rows every run, a different salt moves them
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_group(df, ["host"], ["doc_id"], 10).collect()
    )
    c = sorted(
        r["doc_id"]
        for r in cap_per_group(
            df, ["host"], ["doc_id"], 10, salt="other"
        ).collect()
    )
    assert a == b and a != c


def test_funnel_cap_per_source_stage(spark, sf_small):
    from hk_housing_datahub_spark.pipelines.corpus import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = prepare_training_corpus(
        docs, CorpusRecipe(dedup="exact", cap_per_source=3)
    )
    worst = (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert worst <= 3


def test_upsample_exact_integer_rate_repeats_without_extra(spark):
    from hk_housing_datahub_spark.operators.sampling import (
        upsample_to_mixture,
    )

    df = spark.createDataFrame(
        [(i, "wiki" if i < 10 else "web") for i in range(110)],
        ["doc_id", "source"],
    )
    # wiki: 10 rows, target 0.3/1.0*100 = 30 -> r=3.0 exactly: every row
    # appears 3 times (epochs 0,1,2), never 4
    out = upsample_to_mixture(
        df, "source", {"wiki": 0.3, "web": 0.7}, total=100,
        key_cols=["doc_id"],
    )
    wiki = [r for r in out.collect() if r.source == "wiki"]
    assert len(wiki) == 30
    by_doc = {}
    for r in wiki:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    assert all(sorted(v) == [0, 1, 2] for v in by_doc.values())
    # web: 100 rows, target 70 -> r=0.7 downsample, epoch always 0
    web = [r for r in out.collect() if r.source == "web"]
    assert all(r.epoch == 0 for r in web)
    assert 0 < len(web) < 100


def test_upsample_fractional_epoch_and_epoch_cap(spark):
    from hk_housing_datahub_spark.operators.sampling import (
        upsample_to_mixture,
    )

    df = spark.createDataFrame(
        [(i, "books") for i in range(100)], ["doc_id", "source"]
    )
    # target 180 over 100 rows -> r=1.8: every row >=1 epoch, ~80% get 2
    out = upsample_to_mixture(
        df, "source", {"books": 1.0}, total=180, key_cols=["doc_id"]
    ).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
    assert len(per_doc) == 100  # every row survives an upsampled stratum
    assert all(sorted(v) == list(range(len(v))) for v in per_doc.values())
    n_two = sum(1 for v in per_doc.values() if len(v) == 2)
    assert 60 <= n_two <= 95  # ~80 expected
    # cap: target 1000 -> r=10 but max_epochs=4 wins, frac dropped
    capped = upsample_to_mixture(
        df, "source", {"books": 1.0}, total=1000, key_cols=["doc_id"],
        max_epochs=4,
    ).collect()
    assert len(capped) == 400
    assert max(r.epoch for r in capped) == 3


def test_temperature_alpha_one_keeps_natural_shares(spark):
    from hk_housing_datahub_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "en" if i < 400 else "fr") for i in range(500)],
        ["doc_id", "lang"],
    )
    # alpha=1: shares stay natural (0.8/0.2); total == supply -> r = 1.0
    # for both strata, so the output is exactly one epoch of everything
    out = temperature_mixture(
        df, "lang", alpha=1.0, total=500, key_cols=["doc_id"]
    ).collect()
    assert len(out) == 500
    assert all(r.epoch == 0 for r in out)


def test_temperature_smoothing_moves_head_down_tail_up(spark):
    import math

    from hk_housing_datahub_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "en" if i < 900 else "yo") for i in range(1000)],
        ["doc_id", "lang"],
    )
    out = temperature_mixture(
        df, "lang", alpha=0.5, total=1000, key_cols=["doc_id"]
    ).collect()
    n_en = sum(1 for r in out if r.lang == "en")
    n_yo = sum(1 for r in out if r.lang == "yo")
    # alpha=0.5 shares: sqrt(900)=30, sqrt(100)=10 -> en 750, yo 250
    ws = 30.0 + 10.0
    assert abs(n_en - (30.0 / ws) * 1000) < 40  # downsampled from 900
    exp_yo = (10.0 / ws) * 1000  # 250 = 2 full epochs + 50% extra
    assert abs(n_yo - exp_yo) < 25
    yo_epochs = [r.epoch for r in out if r.lang == "yo"]
    assert max(yo_epochs) == 2 and min(yo_epochs) == 0
    # the weights are literally sqrt(n): correctly-rounded IEEE doubles
    assert math.sqrt(900) == 30.0 and math.sqrt(100) == 10.0


def test_temperature_alpha_zero_is_uniform_and_empty_in_empty_out(spark):
    from hk_housing_datahub_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        ["doc_id", "lang"],
    )
    # alpha=0: both weights 1.0 -> 50/50 target. small (10 rows) needs
    # 50 -> capped at max_epochs=4 -> exactly 40 rows; big ~50 of 90.
    out = temperature_mixture(
        df, "lang", alpha=0.0, total=100, key_cols=["doc_id"]
    ).collect()
    n_small = sum(1 for r in out if r.lang == "small")
    assert n_small == 40
    n_big = sum(1 for r in out if r.lang == "big")
    assert 35 <= n_big <= 65
    empty = temperature_mixture(
        df.where("doc_id < 0"), "lang", alpha=0.5, total=10,
        key_cols=["doc_id"],
    )
    assert empty.count() == 0 and "epoch" in empty.columns


def test_upsample_drops_unweighted_and_is_partition_invariant(spark):
    from hk_housing_datahub_spark.operators.sampling import (
        upsample_to_mixture,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "junk") for i in range(60)],
        ["doc_id", "source"],
    )
    out = upsample_to_mixture(
        df, "source", {"a": 1.0}, total=45, key_cols=["doc_id"]
    )
    rows = out.collect()
    assert all(r.source == "a" for r in rows)  # junk has no target
    again = upsample_to_mixture(
        df.repartition(7), "source", {"a": 1.0}, total=45,
        key_cols=["doc_id"],
    ).collect()
    assert sorted((r.doc_id, r.epoch) for r in rows) == sorted(
        (r.doc_id, r.epoch) for r in again
    )


def test_per_host_boilerplate_scopes_the_hot_set(spark):
    from hk_housing_datahub_spark.operators.textops import (
        drop_boilerplate_lines,
    )

    nav = "site navigation header line"
    rows = []
    # host A: 5 docs sharing a nav line (hot within A at max_line_df=3)
    for i in range(5):
        rows.append((i, "a", f"{nav}\nunique content line {i} aaaa"))
    # host B: 2 docs with the SAME nav line (cold within B)
    for i in range(5, 7):
        rows.append((i, "b", f"{nav}\nother content line {i} bbbb"))
    df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    out = {
        r.doc_id: r.text
        for r in drop_boilerplate_lines(
            df, max_line_df=3, per_col="host"
        ).collect()
    }
    for i in range(5):  # stripped on host A
        assert out[i] == f"unique content line {i} aaaa"
    for i in range(5, 7):  # kept on host B — per-site scoping
        assert out[i].startswith(nav)
    # corpus-global mode would strip it everywhere (7 > 3)
    glob = {
        r.doc_id: r.text
        for r in drop_boilerplate_lines(df, max_line_df=3).collect()
    }
    assert all(not t.startswith(nav) for t in glob.values())
