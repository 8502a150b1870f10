"""Streaming e2e: replay the fixture event stream through a file source
micro-batch by micro-batch (availableNow) and assert the ingest gate,
routing, snapshot, and window sinks — mirroring dashboard.py's observed
behavior on the FIXTURES.md §B8 edge cases."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.streaming import ingest, replay, snapshot, windows
from tests.fixtures import nem


@pytest.fixture(scope="module")
def event_lines():
    return nem.event_stream()


@pytest.fixture(scope="module")
def parsed_batch(spark, event_lines):
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    return ingest.parse_events(raw)


def test_routing_and_validation(parsed_batch, event_lines):
    fac = ingest.facility_branch(parsed_batch)
    mkt = ingest.market_branch(parsed_batch)
    quar = ingest.quarantine_branch(parsed_batch)
    n_fac, n_mkt, n_quar = fac.count(), mkt.count(), quar.count()
    # every input line lands in exactly one branch
    assert n_fac + n_mkt + n_quar == len(event_lines)
    reasons = {r.reason for r in quar.collect()}
    assert "warm_start_sentinel" in reasons  # publisher.py:29-37 → dropped
    assert "malformed_json" in reasons  # dashboard.py:407-408
    assert "empty_id" in reasons  # Pydantic min_length=1
    assert "short_or_null_timestamp" in reasons  # min_length=20
    assert "unparseable_timestamp" in reasons  # dashboard.py:26-27


def test_empty_facility_id_with_valid_region_quarantined(spark):
    """facility_id='' (non-null, length<1) + valid region_id must land in
    quarantine as empty_id: facility_branch rejects length<1 and
    market_branch requires facility_id IS NULL, so the quarantine gate —
    the exact negation of the two routing predicates — must catch it
    (round-4 advisor finding: mkt_ok omitted facility_id.isNull())."""
    line = json.dumps(
        {
            "facility_id": "",
            "region_id": "NSW1",
            "timestamp": "2024-01-01T00:00:00+10:00",
            "price_dmwh": 50.0,
            "demand_mw": 7000.0,
        }
    )
    raw = spark.createDataFrame([(line,)], "value string")
    parsed = ingest.parse_events(raw)
    n_fac = ingest.facility_branch(parsed).count()
    n_mkt = ingest.market_branch(parsed).count()
    quar = ingest.quarantine_branch(parsed).collect()
    assert n_fac == 0 and n_mkt == 0
    assert len(quar) == 1 and quar[0].reason == "empty_id"


def test_missing_measures_default_zero(parsed_batch):
    # FIXTURES.md B8: event missing power_mw/co2_tonnes accepted with 0.0
    fac = ingest.facility_branch(parsed_batch)
    row = fac.filter((F.col("facility_id") == "FAC001") & (F.col("power_mw") == 0.0))
    assert row.count() >= 1


def test_negative_power_accepted(parsed_batch):
    fac = ingest.facility_branch(parsed_batch)
    assert fac.filter(F.col("power_mw") < 0).count() > 0


def test_enrichment_drops_unknown_facility(spark, parsed_batch):
    from assignment_2_dataengineering_spark.plans import nem_etl
    from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA

    facs = nem.facilities_raw()
    fdf = nem_etl.load_facilities_json(spark, facs)
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(fdf, fuel)
    fac_events = ingest.facility_branch(parsed_batch)
    enriched = ingest.enrich_facility_events(fac_events, lookup)
    assert enriched.filter(F.col("facility_id") == "UNKNOWN9").count() == 0
    assert "region" in enriched.columns and "facility_name" in enriched.columns


def test_dedup_suppresses_duplicate_events(parsed_batch):
    fac = ingest.facility_branch(parsed_batch)
    deduped = windows.dedup_events(fac, ["facility_id"])
    dup_key = fac.groupBy("facility_id", "ts").count().filter(F.col("count") > 1)
    assert dup_key.count() >= 1  # fixture injects a duplicate
    assert deduped.groupBy("facility_id", "ts").count().filter(F.col("count") > 1).count() == 0


def test_streaming_e2e_file_replay(spark, tmp_path_factory, event_lines):
    """availableNow file-source replay → snapshot (foreachBatch merge) +
    windowed sums (memory sink) — asserts end-state equals the batch
    goldens computed from the same lines."""
    src = str(tmp_path_factory.mktemp("replay"))
    n_files = replay.write_replay_chunks(event_lines, src, events_per_file=150)
    assert n_files > 1

    stream = replay.file_replay_stream(spark, src)
    parsed = ingest.parse_events(stream)
    fac = ingest.facility_branch(parsed)

    state: dict = {}
    q = (
        fac.writeStream.outputMode("append")
        .foreachBatch(snapshot.merge_snapshot_batch(state, "facility_id"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt1")))
        .start()
    )
    q.awaitTermination(120)
    snap = state["df"]

    # golden: batch latest-per-key over the same lines
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    golden = snapshot.latest_snapshot_batch(
        ingest.facility_branch(ingest.parse_events(raw)), "facility_id"
    )
    g = {r.facility_id: (r.power_mw, r.co2_tonnes) for r in golden.collect()}
    s = {r.facility_id: (r.power_mw, r.co2_tonnes) for r in snap.collect()}
    assert s == g

    # windowed sums: streaming (update mode, memory sink) vs batch
    stream2 = replay.file_replay_stream(spark, src)
    fac2 = ingest.facility_branch(ingest.parse_events(stream2))
    win = windows.tumbling_window_sums(fac2, "facility_id", ["power_mw"])
    q2 = (
        win.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt2")))
        .start()
    )
    q2.awaitTermination(120)
    got = spark.sql("select * from win_sink")
    want = windows.tumbling_window_sums(
        ingest.facility_branch(ingest.parse_events(raw)), "facility_id", ["power_mw"]
    )
    assert got.count() == want.count()
    assert got.join(want, ["bucket", "facility_id", "sum_power_mw"], "inner").count() == want.count()


def test_stateful_snapshot_applyinpandas(spark, tmp_path_factory, event_lines):
    """applyInPandasWithState latest-per-key: end state must equal the
    batch golden (same semantics as the foreachBatch merge, but state
    lives in Spark's checkpointed store instead of a driver table)."""
    src = str(tmp_path_factory.mktemp("replay_st"))
    replay.write_replay_chunks(event_lines, src, events_per_file=150)
    stream = replay.file_replay_stream(spark, src)
    fac = ingest.facility_branch(ingest.parse_events(stream)).select(
        "facility_id", "ts", "power_mw", "co2_tonnes"
    )
    snap = snapshot.stateful_latest_snapshot(fac, "facility_id", ["power_mw", "co2_tonnes"])
    q = (
        snap.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_st")))
        .start()
    )
    q.awaitTermination(120)
    # update-mode memory sink appends every emission; latest row per key wins
    got = spark.sql(
        """select facility_id, power_mw, co2_tonnes from (
             select *, row_number() over (partition by facility_id order by last_ts desc) rn
             from state_sink) where rn = 1"""
    )
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    golden = snapshot.latest_snapshot_batch(
        ingest.facility_branch(ingest.parse_events(raw)), "facility_id"
    )
    g = {r.facility_id: (r.power_mw, r.co2_tonnes) for r in golden.collect()}
    s = {r.facility_id: (r.power_mw, r.co2_tonnes) for r in got.collect()}
    assert s == g


def test_dashboard_pipeline_end_to_end(spark, tmp_path_factory, event_lines):
    """The assembled four-sink pipeline over the fixture replay: every
    sink populated, snapshots keyed correctly, quarantine catches the
    known bad lines, window sums reconcile with the batch computation."""
    from assignment_2_dataengineering_spark.plans import nem_etl
    from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA
    from assignment_2_dataengineering_spark.streaming import pipeline

    src = str(tmp_path_factory.mktemp("replay_pipe"))
    replay.write_replay_chunks(event_lines, src, events_per_file=200)
    facs = nem_etl.load_facilities_json(spark, nem.facilities_raw())
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(facs, fuel)

    p = pipeline.run_dashboard_pipeline(
        replay.file_replay_stream(spark, src),
        lookup,
        str(tmp_path_factory.mktemp("ckpt_pipe")),
        sink_prefix="t_dash",
    )
    p.await_all(180)

    fac_snap = spark.sql("select * from t_dash_facility_snapshot")
    mkt_snap = spark.sql("select * from t_dash_market_snapshot")
    quar = spark.sql("select * from t_dash_quarantine")
    win = spark.sql("select * from t_dash_facility_windows")

    # update-mode memory sink appends re-emissions; resolve per key
    latest_fac = fac_snap.groupBy("facility_id").agg(F.max("last_ts").alias("last_ts"))
    assert latest_fac.count() > 30  # enriched operating facilities
    assert mkt_snap.select("region_id").distinct().count() == 5
    assert {r.reason for r in quar.select("reason").distinct().collect()} >= {
        "warm_start_sentinel",
        "malformed_json",
        "empty_id",
    }
    # The windows branch shares the snapshot branch's enriched + deduped
    # stream. Every fixture ts sits on a 5-min boundary, so each emitted
    # (facility, bucket) row sums exactly one (facility, ts) group — and
    # after dedup, ONE surviving reading. Its sum must therefore equal a
    # single reading from that group: re-delivered events count once
    # (not value + 2 re-deliveries), and conflicting same-instant
    # readings collapse to one.
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    fac_batch = ingest.enrich_facility_events(
        ingest.facility_branch(ingest.parse_events(raw)), lookup
    )
    groups = (
        fac_batch.groupBy("facility_id", "ts")
        .agg(
            F.collect_set(F.round("power_mw", 4)).alias("p"),
            F.collect_set(F.round("co2_tonnes", 4)).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    allowed = {(g.facility_id, g.ts): (set(g.p), set(g.c), g.n) for g in groups}
    emitted = win.collect()
    assert emitted  # watermark closed at least the early buckets
    for r in emitted:
        p, c, _ = allowed[(r.facility_id, r.bucket)]
        assert r.sum_power_mw in p, (r.facility_id, r.bucket, r.sum_power_mw, p)
        assert r.sum_co2_tonnes in c
    # the fixture's re-delivered event (3 rows at one (key, ts), 2
    # distinct readings) lives in a watermark-closed bucket, so the
    # count-once property above was actually exercised on it
    redelivered = {kt for kt, (_, _, n) in allowed.items() if n >= 3}
    assert redelivered
    assert redelivered & {(r.facility_id, r.bucket) for r in emitted}


def test_rate_paced_replay_emits_in_index_order(spark, event_lines):
    """T1 true-pacing variant: the rate source joined to the indexed
    replay table emits exactly the replay rows, paced by rowsPerSecond.
    The replay table carries its own `timestamp` and `value` columns —
    they must survive (only the rate source's columns are dropped)."""
    lines = event_lines[:40]
    tbl = spark.createDataFrame(
        [(l, f"t{i}", i * 10) for i, l in enumerate(lines)],
        "payload string, timestamp string, value long",
    )
    stream = replay.rate_paced_replay(spark, tbl, events_per_second=200)
    assert set(stream.columns) == {"payload", "timestamp", "value"}
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_sink")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time as _t

    deadline = _t.time() + 30
    while _t.time() < deadline:
        if spark.sql("select count(*) n from rate_sink").first().n >= len(lines):
            break
        _t.sleep(0.5)
    q.stop()
    got = [r.payload for r in spark.sql("select payload from rate_sink").collect()]
    assert sorted(got) == sorted(lines)


def test_stream_stream_interval_join(spark, tmp_path_factory, event_lines):
    """Stream-stream join: the enriched facility stream joined to the
    market stream on region within ±5 min event time — both sides
    watermarked (state stays bounded), inner matches emitted as found.
    End state must equal the identical batch join over the same lines.
    (Watermark set beyond the fixture's span so no fixture row is
    late-dropped; the bound, not the watermark, defines the result.)"""
    from assignment_2_dataengineering_spark.plans import nem_etl
    from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA
    from assignment_2_dataengineering_spark.streaming import joins

    facs = nem_etl.load_facilities_json(spark, nem.facilities_raw())
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(facs, fuel)

    src = str(tmp_path_factory.mktemp("ssj_replay"))
    replay.write_replay_chunks(event_lines, src, events_per_file=200)

    def fac_side(df):
        return ingest.enrich_facility_events(
            ingest.facility_branch(ingest.parse_events(df)), lookup
        ).select("facility_id", "ts", "region")

    def mkt_side(df):
        return ingest.market_branch(ingest.parse_events(df)).select(
            "region_id", F.col("ts").alias("m_ts"), "price_dmwh"
        )

    joined = joins.stream_interval_join(
        fac_side(replay.file_replay_stream(spark, src)),
        mkt_side(replay.file_replay_stream(spark, src)),
        "region",
        "region_id",
        "ts",
        "m_ts",
        bound="5 minutes",
        watermark="6 hours",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_ssj")))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from ssj_sink")

    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    want = joins.stream_interval_join(
        fac_side(raw), mkt_side(raw), "region", "region_id", "ts", "m_ts", bound="5 minutes"
    )
    cols = ["facility_id", "ts", "region", "region_id", "m_ts", "price_dmwh"]
    got_rows = sorted(tuple(r) for r in got.select(*cols).collect())
    want_rows = sorted(tuple(r) for r in want.select(*cols).collect())
    assert len(want_rows) > 0
    # exact multiset equality (the fixture's colliding instants make
    # duplicate rows legitimate, so a join-based compare would inflate)
    assert got_rows == want_rows


def test_mqtt_sink_requires_paho(monkeypatch):
    """S8 gating: constructing the MQTT sink without paho-mqtt raises at
    plan time, not inside executors."""
    import builtins

    real_import = builtins.__import__

    def no_paho(name, *a, **kw):
        if name.startswith("paho"):
            raise ImportError("paho not installed")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_paho)
    with pytest.raises(ImportError, match="paho-mqtt is required"):
        replay.MqttForeachSink("broker.example", 1883, "topic/x")


def test_totals_timeseries_horizon(spark, parsed_batch):
    fac = ingest.facility_branch(parsed_batch)
    ts = windows.totals_timeseries(fac, ["power_mw", "co2_tonnes"], horizon_minutes=60)
    rows = ts.collect()
    # 60-min horizon over 5-min buckets anchored at max ts → ≤ 13 buckets
    assert 1 <= len(rows) <= 13
    assert rows == sorted(rows, key=lambda r: r.bucket)


def test_sliding_window_streaming_matches_batch(spark, tmp_path_factory, event_lines):
    """T5 sliding windows: the streaming (complete-mode) result over a
    file replay equals the batch evaluation of the same plan, and each
    event lands in window/slide = 2 overlapping buckets."""
    src = str(tmp_path_factory.mktemp("slide_replay"))
    replay.write_replay_chunks(event_lines, src, events_per_file=200)
    stream = replay.file_replay_stream(spark, src)
    fac = ingest.facility_branch(ingest.parse_events(stream))
    win = windows.sliding_window_sums(
        fac, "facility_id", ["power_mw"], window="10 minutes", slide="5 minutes"
    )
    q = (
        win.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_slide")))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from slide_sink")

    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    batch_fac = ingest.facility_branch(ingest.parse_events(raw))
    want = windows.sliding_window_sums(
        batch_fac, "facility_id", ["power_mw"], window="10 minutes", slide="5 minutes"
    )
    key = ["bucket_start", "bucket_end", "facility_id", "sum_power_mw"]
    assert got.count() == want.count() > 0
    assert got.join(want, key, "inner").count() == want.count()

    # overlap factor: every event contributes to exactly 2 sliding buckets,
    # so Σ sliding sums = 2 × Σ tumbling sums (same 5-min grid).
    tumb = windows.tumbling_window_sums(batch_fac, "facility_id", ["power_mw"])
    s_slide = want.agg(F.sum("sum_power_mw")).first()[0]
    s_tumb = tumb.agg(F.sum("sum_power_mw")).first()[0]
    assert abs(s_slide - 2 * s_tumb) < 1e-6


def test_dedup_bounded_suppresses_within_watermark(spark, tmp_path_factory, event_lines):
    """dropDuplicatesWithinWatermark path: the fixture's QoS-1 duplicate
    arrives within the watermark delay and is suppressed; state stays
    bounded by eviction (batch fallback stays exact dropDuplicates)."""
    src = str(tmp_path_factory.mktemp("ddw_replay"))
    replay.write_replay_chunks(event_lines, src, events_per_file=150)
    stream = replay.file_replay_stream(spark, src)
    fac = ingest.facility_branch(ingest.parse_events(stream))
    deduped = windows.dedup_events_bounded(fac, ["facility_id"], watermark="60 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("ddw_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_ddw")))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select facility_id, ts from ddw_sink")
    # no (facility_id, ts) appears twice post-dedup
    assert got.groupBy("facility_id", "ts").count().filter(F.col("count") > 1).count() == 0
    # and the batch fallback agrees on the surviving multiset
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    batch = windows.dedup_events_bounded(
        ingest.facility_branch(ingest.parse_events(raw)), ["facility_id"]
    )
    assert got.count() == batch.count()


def test_replay_stream_datasource(spark, tmp_path_factory, event_lines):
    """oe_replay Python streaming source: line-index offsets, bounded
    micro-batches, end state equals the batch golden on the same lines."""
    from assignment_2_dataengineering_spark.sources.python_datasource import (
        ReplayStreamDataSource,
    )

    try:
        spark.dataSource.register(ReplayStreamDataSource)
    except Exception:
        pass
    root = tmp_path_factory.mktemp("oe_replay")
    path = str(root / "events.jsonl")
    with open(path, "w") as f:
        f.write("\n".join(event_lines))

    stream = (
        spark.readStream.format("oe_replay")
        .option("path", path)
        .option("events_per_batch", "150")
        .load()
    )
    assert stream.isStreaming
    fac = ingest.facility_branch(ingest.parse_events(stream))
    # Python streaming sources don't support Trigger.AvailableNow
    # (falls back to ONE micro-batch); drain with processAllAvailable.
    q = (
        fac.writeStream.outputMode("append")
        .format("memory")
        .queryName("oe_replay_sink")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_oe")))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from oe_replay_sink")

    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    want = ingest.facility_branch(ingest.parse_events(raw))
    assert got.count() == want.count() > 0
    cols = ["facility_id", "ts", "power_mw"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_restart_from_checkpoint_exactly_once(spark, tmp_path_factory, event_lines):
    """Crash/deploy recovery: a query processes half the replay into a
    parquet file sink and stops; more files land while it is down; a
    NEW query object with the SAME checkpoint + sink path resumes and
    processes only the unseen files. The checkpoint's source offsets +
    the file sink's transaction log make the final sink identical (as a
    multiset) to one uninterrupted run — Structured Streaming's
    end-to-end exactly-once contract, which replaces the reference's
    QoS-1 at-least-once + client dedup (SURVEY §2.9 T8)."""
    import os

    src = str(tmp_path_factory.mktemp("replay_restart"))
    out = str(tmp_path_factory.mktemp("restart_out"))
    ckpt = str(tmp_path_factory.mktemp("restart_ckpt"))
    half = len(event_lines) // 2
    replay.write_replay_chunks(event_lines[:half], src, events_per_file=100)

    def run_once():
        stream = replay.file_replay_stream(spark, src, max_files_per_trigger=10)
        fac = ingest.facility_branch(ingest.parse_events(stream))
        q = (
            fac.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_phase1 = spark.read.parquet(out).count()
    assert n_phase1 > 0

    # new chunks arrive while the query is down
    late = os.path.join(src, "chunk-late.jsonl")
    with open(late, "w") as f:
        f.write("\n".join(event_lines[half:]) + "\n")

    run_once()  # restart: same checkpoint, fresh query object

    got = spark.read.parquet(out)
    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    want = ingest.facility_branch(ingest.parse_events(raw))
    assert got.count() == want.count() > n_phase1
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_stream_left_outer_join_emits_null_matches(
    spark, tmp_path_factory, event_lines
):
    """Stream-stream LEFT OUTER interval join: facility events with no
    market row within the bound must still emit (market side null) —
    but only once the watermark passes ts + bound, so the test appends
    far-future sentinel events on BOTH sides (the global watermark is
    the min across inputs) to flush every pending outer row. End state
    ≡ the identical batch left join over the same (non-sentinel)
    lines."""
    import json as _json

    from assignment_2_dataengineering_spark.plans import nem_etl
    from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA
    from assignment_2_dataengineering_spark.streaming import joins

    facs = nem_etl.load_facilities_json(spark, nem.facilities_raw())
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(facs, fuel)

    fac_code = next(
        f["code"]
        for f in nem.facilities_raw()
        if f["network_region"] != "WEM"
        and any(u["status_id"] == "operating" for u in f["units"])
    )
    far = "2025-10-17T10:00:00+10:00"  # 2 days past the fixture span
    sentinels = [
        _json.dumps(
            {"facility_id": fac_code, "timestamp": far, "power_mw": 1.0, "co2_tonnes": 1.0}
        ),
        _json.dumps(
            {"region_id": "NSW1", "timestamp": far, "price_dmwh": 1.0, "demand_mw": 1.0}
        ),
    ]
    lines = list(event_lines) + sentinels

    src = str(tmp_path_factory.mktemp("ssj_outer_replay"))
    replay.write_replay_chunks(lines, src, events_per_file=200)

    def fac_side(df):
        return ingest.enrich_facility_events(
            ingest.facility_branch(ingest.parse_events(df)), lookup
        ).select("facility_id", "ts", "region")

    def mkt_side(df):
        # restrict the market side to one region so most facility rows
        # genuinely have no match — the outer path is the subject here
        return (
            ingest.market_branch(ingest.parse_events(df))
            .filter(F.col("region_id") == "NSW1")
            .select("region_id", F.col("ts").alias("m_ts"), "price_dmwh")
        )

    joined = joins.stream_interval_join(
        fac_side(replay.file_replay_stream(spark, src)),
        mkt_side(replay.file_replay_stream(spark, src)),
        "region",
        "region_id",
        "ts",
        "m_ts",
        bound="5 minutes",
        watermark="6 hours",  # beyond the fixture span: no late-drops;
        # the +2d sentinel still pushes the watermark far enough to
        # flush every pending outer row
        how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_ssj_outer")))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from ssj_outer_sink").filter(
        F.col("ts") < "2025-10-16"  # exclude only the sentinel rows
    )

    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    want = joins.stream_interval_join(
        fac_side(raw),
        mkt_side(raw),
        "region",
        "region_id",
        "ts",
        "m_ts",
        bound="5 minutes",
        how="left_outer",
    )
    cols = ["facility_id", "ts", "region", "region_id", "m_ts", "price_dmwh"]
    got_rows = sorted(tuple(r) for r in got.select(*cols).collect())
    want_rows = sorted(tuple(r) for r in want.select(*cols).collect())
    # the outer path must actually fire: non-NSW1 facilities have no match
    assert any(r[3] is None for r in want_rows)
    assert got_rows == want_rows


def test_streaming_ohlc_bars_match_batch(spark, tmp_path_factory, event_lines):
    """Streaming OHLC bars (windows.ohlc_window_bars) over the deduped
    facility stream must equal the identical batch aggregation on the
    same lines — open/close come from min_by/max_by on event time, so
    the bars are incremental (no ranking window) yet arrival-order
    independent once (facility, ts) duplicates are suppressed."""
    src = str(tmp_path_factory.mktemp("ohlc_replay"))
    replay.write_replay_chunks(event_lines, src, events_per_file=150)

    def bars(df):
        fac = ingest.facility_branch(ingest.parse_events(df))
        deduped = windows.dedup_events(fac, ["facility_id"], watermark="6 hours")
        return windows.ohlc_window_bars(
            deduped, "facility_id", "power_mw", window="15 minutes", watermark=None
        )

    q = (
        bars(replay.file_replay_stream(spark, src))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlc_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_ohlc")))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from ohlc_sink")

    raw = spark.createDataFrame([(l,) for l in event_lines], "value string")
    want = bars(raw)
    cols = ["bucket", "facility_id", "open", "high", "low", "close", "n"]
    got_rows = sorted(tuple(r) for r in got.select(*cols).collect())
    want_rows = sorted(tuple(r) for r in want.select(*cols).collect())
    assert len(want_rows) > 0
    # complete mode exposes the full bar state (append would hold every
    # window open: the fixture sits inside the 6h watermark delay)
    assert got_rows == want_rows
    # bars are internally consistent: low <= open/close <= high
    for r in want_rows:
        _, _, o, h, lo, c, n = r
        assert lo <= o <= h and lo <= c <= h and n >= 1


def test_progress_recorder_accounts_every_input_row(
    spark, tmp_path_factory, event_lines
):
    """streaming/monitor.ProgressRecorder: the listener's per-batch
    progress must account for EXACTLY the rows fed through the query —
    the observability contract a production rows/sec panel relies on."""
    from assignment_2_dataengineering_spark.streaming.monitor import ProgressRecorder

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        src = str(tmp_path_factory.mktemp("mon_replay"))
        n_files = replay.write_replay_chunks(event_lines, src, events_per_file=300)
        q = (
            replay.file_replay_stream(spark, src, max_files_per_trigger=1)
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_mon")))
            .start()
        )
        q.awaitTermination(180)
        import time as _time

        qid = str(q.id)
        # listener delivery is async — poll briefly for the last event
        for _ in range(60):
            if rec.summary(qid)["input_rows"] >= len(event_lines):
                break
            _time.sleep(0.5)
        s = rec.summary(qid)
        assert s["input_rows"] == len(event_lines)
        assert s["n_batches"] >= n_files  # one file per trigger
        assert not s["terminated_with_error"]
        assert s["max_batch_ms"] > 0
    finally:
        spark.streams.removeListener(rec)
