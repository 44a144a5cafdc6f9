"""add_files metadata-only import + crawl-wave → catalog-snapshot publish.

The north rule's "frontier over Iceberg tables" integration: every crawl
wave becomes a catalog snapshot (zero data copied), downstream consumers
read waves incrementally, and crash-replay at any point never doubles rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.datagen import (
    generate_pages,
    generate_robots,
    generate_seeds,
)
from hk_housing_datahub_spark.frontier import CrawlEngine
from hk_housing_datahub_spark.frontier.publish import (
    publish_crawl,
    _published_waves,
)
from hk_housing_datahub_spark.sources import TableCatalog
from hk_housing_datahub_spark.sources.tables import IncrementalConsumer


@pytest.fixture()
def cat(spark):
    d = tempfile.mkdtemp(prefix="cat_")
    yield TableCatalog(spark, d)
    shutil.rmtree(d)


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(spark, 600, n_hosts=10).cache()
    seeds = generate_seeds(spark, 10, 600, n_hosts=10)
    robots = generate_robots(spark, n_hosts=10)
    pages.count()
    return pages, seeds, robots


def _engine(spark, corpus, tmp, **kw):
    pages, seeds, robots = corpus
    return CrawlEngine(spark, pages, robots, tmp, wave_ms=800, max_depth=2, **kw)


def test_add_files_is_metadata_only_and_guarded(spark, cat):
    ext = tempfile.mkdtemp(prefix="ext_")
    try:
        src = os.path.join(ext, "batch0")
        spark.range(0, 100).withColumn(
            "k", (F.col("id") % 4).cast("int")
        ).coalesce(2).write.parquet(src)
        before = {  # no file under the table's data/ root may appear
            os.path.join(dp, f)
            for dp, _, fs in os.walk(cat.root)
            for f in fs
        }
        s1 = cat.add_files("t", src)
        after = {
            os.path.join(dp, f)
            for dp, _, fs in os.walk(cat.root)
            for f in fs
        }
        # metadata only: exactly the manifest (+lock) changed, no parquet
        assert not any(p.endswith(".parquet") for p in after - before)
        assert cat.read("t").count() == 100
        h = cat.history("t")[-1]
        assert h["external"] and h["rows"] == 100 and h["snapshot"] == s1
        # footer stats folded → pruning works on imported files
        rep = cat.scan_report("t", [("id", "=", 5)])
        assert rep["parts_total"] == 2 and rep["parts_kept"] == 1
        assert sorted(
            r.id for r in cat.read("t", where=[("id", "<", 3)]).collect()
        ) == [0, 1, 2]
        # duplicate-import guard: replaying the same dir is rejected
        with pytest.raises(ValueError, match="already imported"):
            cat.add_files("t", src)
        # imported files are referenced, not owned: vacuum leaves them
        cat.replace("t", spark.range(0, 5).withColumn("k", F.lit(0)))
        cat.vacuum("t")
        assert os.path.isdir(src) and len(os.listdir(src)) > 0
        # schema evolution fold applies to imports too
        src2 = os.path.join(ext, "batch1")
        spark.range(100, 110).withColumn("k", F.lit(1)).withColumn(
            "extra", F.lit("x")
        ).coalesce(1).write.parquet(src2)
        cat.add_files("t", src2)
        got = cat.read("t")
        assert "extra" in got.columns
        assert got.filter(F.col("extra").isNull()).count() == 5
    finally:
        shutil.rmtree(ext)


def test_publish_crawl_wave_snapshots_incremental_and_replay(spark, cat, corpus):
    tmp = tempfile.mkdtemp(prefix="crawlpub_")
    try:
        eng = _engine(spark, corpus, tmp)
        res = publish_crawl(eng, corpus[1], cat, "listings", max_waves=4)
        assert res.waves_published == sorted(res.waves_published)
        assert len(res.waves_published) >= 2
        # one catalog snapshot per wave, lineage carried on the entry
        ext_entries = [h for h in cat.history("listings") if h.get("external")]
        assert [h["lineage"]["wave"] for h in ext_entries] == res.waves_published
        # catalog read == the engine's own listings output, row for row
        cat_rows = cat.read("listings").count()
        eng_rows = spark.read.parquet(os.path.join(tmp, "listings")).count()
        assert cat_rows == eng_rows > 0
        # incremental consumer sees exactly the post-cursor waves
        w0 = res.waves_published[0]
        delta = cat.read_changes("listings", since=res.snapshots[w0])
        later = sum(h["rows"] for h in ext_entries[1:])
        assert delta.count() == later
        # seen-set checkpointed to the catalog: current snapshot == the
        # latest wave's state; time travel reads the seen-set as of wave 0
        seen_hist = [h for h in cat.history("listings_seen") if h.get("external")]
        assert [h["lineage"]["wave"] for h in seen_hist] == res.waves_published
        assert all(h["op"] == "replace" for h in seen_hist)
        last_w = res.waves_published[-1]
        live = spark.read.parquet(os.path.join(tmp, f"seen_v{last_w}"))
        assert cat.read("listings_seen").count() == live.count()
        w0_seen = spark.read.parquet(os.path.join(tmp, f"seen_v{w0}"))
        assert (
            cat.read("listings_seen", snapshot=seen_hist[0]["snapshot"]).count()
            == w0_seen.count()
            < live.count()
        )
        # re-running resumes the crawl: only NEW waves publish, committed
        # ones are never re-imported (exactly-once), rows stay in lockstep
        res2 = publish_crawl(eng, corpus[1], cat, "listings", max_waves=4)
        assert not set(res2.waves_published) & set(res.waves_published)
        assert cat.read("listings").count() == spark.read.parquet(
            os.path.join(tmp, "listings")
        ).count()
        seen_hist2 = [h for h in cat.history("listings_seen") if h.get("external")]
        assert [h["lineage"]["wave"] for h in seen_hist2] == sorted(
            res.waves_published + res2.waves_published
        )
    finally:
        shutil.rmtree(tmp)


def test_publish_reconciles_engine_committed_unpublished_wave(
    spark, cat, corpus
):
    """Crash between the engine's wave commit and the catalog publish:
    the next publish_crawl run imports the orphan wave FIRST, then
    continues crawling — no wave lost, none doubled."""
    tmp = tempfile.mkdtemp(prefix="crawlrec_")
    try:
        eng = _engine(spark, corpus, tmp)
        eng.run(corpus[1], max_waves=1)  # wave 0 committed, never published
        assert _published_waves(cat, "listings") == set()
        res = publish_crawl(eng, corpus[1], cat, "listings", max_waves=3)
        assert res.waves_published[0] == 0  # reconciled before new waves
        ext_entries = [h for h in cat.history("listings") if h.get("external")]
        waves = [h["lineage"]["wave"] for h in ext_entries]
        assert waves == sorted(set(waves))  # each wave exactly once
        cat_rows = cat.read("listings").count()
        eng_rows = spark.read.parquet(os.path.join(tmp, "listings")).count()
        assert cat_rows == eng_rows
    finally:
        shutil.rmtree(tmp)


def test_incremental_consumer_over_published_waves(spark, cat, corpus):
    """The star-consumer pattern over crawl output: a durable consumer
    polls per-wave deltas; host totals folded from deltas == full read."""
    tmp = tempfile.mkdtemp(prefix="crawlcons_")
    try:
        eng = _engine(spark, corpus, tmp)
        publish_crawl(eng, corpus[1], cat, "listings", max_waves=4)
        cons = IncrementalConsumer(cat, "host_counts")
        totals: dict[str, int] = {}
        for _ in range(3):  # poll → fold → commit, repeatedly
            delta, head = cons.poll("listings")
            for r in delta.groupBy("host").count().collect():
                totals[r["host"]] = totals.get(r["host"], 0) + r["count"]
            cons.commit("listings", head)
        full = {
            r["host"]: r["count"]
            for r in cat.read("listings").groupBy("host").count().collect()
        }
        assert totals == full
    finally:
        shutil.rmtree(tmp)


def test_midwave_crash_replay_does_not_double_listings(spark, corpus):
    """Crash AFTER the wave's listings write but BEFORE its manifest
    commit: the resumed wave rewrites the wave dir (overwrite semantics),
    so neither the engine's listings view nor a later catalog import sees
    doubled rows."""
    import os

    tmp = tempfile.mkdtemp(prefix="crawlmw_")
    try:
        eng = _engine(spark, corpus, tmp)
        eng.run(corpus[1], max_waves=1)
        rows = spark.read.parquet(os.path.join(tmp, "listings")).count()
        sched = spark.read.parquet(os.path.join(tmp, "schedule")).count()
        # simulate the crash: the data writes survive, the commit is lost
        os.remove(os.path.join(tmp, "manifest.json"))
        eng2 = _engine(spark, corpus, tmp)
        eng2.run(corpus[1], max_waves=1)
        assert spark.read.parquet(os.path.join(tmp, "listings")).count() == rows
        assert spark.read.parquet(os.path.join(tmp, "schedule")).count() == sched
    finally:
        shutil.rmtree(tmp)


def test_audited_publish_gates_bad_waves(spark, cat, corpus):
    """WAP over crawl waves: an audit rejects waves whose extraction null
    rate is too high; rejected waves never become visible, accepted ones
    land normally, and a replay re-audits nothing (decisions are
    history)."""
    tmp = tempfile.mkdtemp(prefix="crawlwap_")
    try:
        eng = _engine(spark, corpus, tmp)
        seen_waves = []

        def audit(df):
            # every wave is audited on exactly its staged rows; reject the
            # first wave to prove discarded rows never surface
            n = df.count()
            seen_waves.append(n)
            return len(seen_waves) > 1

        res = publish_crawl(
            eng, corpus[1], cat, "listings", max_waves=3, audit=audit
        )
        assert res.waves_rejected == [0]
        assert 0 not in res.waves_published and res.waves_published
        # the rejected wave's rows are absent from every read path
        w0 = spark.read.parquet(os.path.join(tmp, "listings", "wave=0"))
        total = cat.read("listings").count()
        eng_total = spark.read.parquet(os.path.join(tmp, "listings")).count()
        assert total == eng_total - w0.count()
        # the rejection is QUANTIFIED: the result and the history's discard
        # entry both carry the rejected row count and the wave's lineage
        assert res.rows_rejected == {0: w0.count()}
        discards = [h for h in cat.history("listings") if h["op"] == "discard"]
        assert len(discards) == 1
        assert discards[0]["rows"] == w0.count()
        assert discards[0]["lineage"]["wave"] == 0
        # decisions recorded: one stage entry per wave, resolution marked
        stages = [h for h in cat.history("listings") if h["op"] == "stage"]
        assert [h.get("resolved") for h in stages] == ["discarded"] + [
            "published"
        ] * len(res.waves_published)
        # replay: nothing re-audited, nothing re-imported
        n_calls = len(seen_waves)
        res2 = publish_crawl(
            eng, corpus[1], cat, "listings", max_waves=0, audit=audit
        )
        assert len(seen_waves) == n_calls
        assert res2.waves_published == [] and res2.waves_rejected == []
        assert cat.read("listings").count() == total
    finally:
        shutil.rmtree(tmp)


def test_orphaned_stage_resolves_on_replay(spark, cat, corpus):
    """Crash between staging a wave and its audit decision: the next
    publish run finds the unresolved stage and resolves it (no re-import,
    no lost wave)."""
    tmp = tempfile.mkdtemp(prefix="crawlorph_")
    try:
        eng = _engine(spark, corpus, tmp)
        eng.run(corpus[1], max_waves=1)
        # simulate the crashed publisher: staged, never resolved
        s = cat.add_files(
            "listings",
            os.path.join(tmp, "listings", "wave=0"),
            lineage={"wave": 0},
            mode="stage",
        )
        # invisible: the staged-only table has no committed visible data
        with pytest.raises(FileNotFoundError, match="no committed snapshot"):
            cat.read("listings", snapshot=s)
        res = publish_crawl(
            eng, corpus[1], cat, "listings", max_waves=0,
            audit=lambda df: True,
        )
        assert res.waves_published == [0] and res.waves_rejected == []
        w0 = spark.read.parquet(os.path.join(tmp, "listings", "wave=0"))
        assert cat.read("listings").count() == w0.count() > 0
        stage = [h for h in cat.history("listings") if h["op"] == "stage"]
        assert len(stage) == 1 and stage[0]["resolved"] == "published"
    finally:
        shutil.rmtree(tmp)


def test_catalog_stream_sink_exactly_once(spark, cat, sf_small):
    """Streaming → catalog with batch-id idempotence: a real file-source
    stream appends one snapshot per micro-batch; a crash-replayed batch
    (same id) is a no-op; total rows == source rows exactly."""
    import os

    from hk_housing_datahub_spark.streaming.catalog_sink import (
        CatalogStreamSink,
    )

    src = tempfile.mkdtemp(prefix="sink_src_")
    ckpt = tempfile.mkdtemp(prefix="sink_ck_")
    try:
        events = spark.read.parquet(f"{sf_small}/events.parquet").limit(300)
        events.repartition(3).write.mode("overwrite").parquet(src)
        n_src = spark.read.parquet(src).count()
        schema = spark.read.parquet(src).schema
        sink = CatalogStreamSink(cat, "events_live")
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert cat.read("events_live").count() == n_src
        batches = [
            h["batch_id"] for h in cat.history("events_live")
            if "batch_id" in h
        ]
        assert len(batches) == len(set(batches)) >= 2  # one snapshot/batch
        # crash-replay: re-deliver an already-committed batch id by hand
        replay = spark.read.parquet(src).limit(5)
        sink(replay, batches[0])
        assert sink.skipped_replays == 1
        assert cat.read("events_live").count() == n_src  # unchanged
        # a NEW batch id still lands
        sink(replay, max(batches) + 1)
        assert cat.read("events_live").count() == n_src + 5
    finally:
        shutil.rmtree(src)
        shutil.rmtree(ckpt)


def test_two_stream_sinks_do_not_collide(spark, cat, sf_small):
    """Batch ids are per-query: a second stream (fresh checkpoint, ids
    restarting at 0) into the same table is a producer, not a replay."""
    from hk_housing_datahub_spark.streaming.catalog_sink import (
        CatalogStreamSink,
    )

    rows = spark.read.parquet(f"{sf_small}/events.parquet").limit(10)
    a = CatalogStreamSink(cat, "ev", sink_id="live")
    b = CatalogStreamSink(cat, "ev", sink_id="backfill")
    a(rows, 0)
    b(rows, 0)  # same batch id, different query → must land
    assert cat.read("ev").count() == 20
    assert b.skipped_replays == 0
    a(rows, 0)  # true replay of A's batch 0 → no-op
    assert a.skipped_replays == 1
    assert cat.read("ev").count() == 20
