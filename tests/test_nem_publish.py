"""Publisher-plan parity: wide cache → JSON replay payloads → back
through the streaming ingest gate must reproduce the facility/market
facts (the full extractor → publisher → dashboard loop, offline)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.plans import nem_etl, nem_publish
from assignment_2_dataengineering_spark.schemas import (
    FACILITY_READING_SCHEMA,
    MARKET_READING_SCHEMA,
)
from assignment_2_dataengineering_spark.streaming import ingest
from tests.fixtures import nem


@pytest.fixture(scope="module")
def etl(spark):
    facs = nem.facilities_raw()
    readings = spark.createDataFrame(nem.facility_readings(facs), FACILITY_READING_SCHEMA)
    market = spark.createDataFrame(nem.market_readings(), MARKET_READING_SCHEMA)
    return nem_etl.run_batch_etl(spark, facs, nem.fueltech_map(), readings, market)


@pytest.fixture(scope="module")
def payloads(etl):
    return [r.payload for r in nem_publish.replay_payloads(etl["consolidate_wide"]).collect()]


def test_sentinel_first_and_all_valid_json(payloads):
    head = json.loads(payloads[0])
    assert head["timestamp"] == "starting..."  # publisher.py:29-37
    for p in payloads:
        json.loads(p)  # valid JSON — incl. the NaN→0.0 divergence


def test_replay_order_facilities_before_regions(payloads):
    events = [json.loads(p) for p in payloads[1:]]
    ts_seen = []
    for e in events:
        ts = e["timestamp"]
        if not ts_seen or ts_seen[-1] != ts:
            ts_seen.append(ts)
    assert ts_seen == sorted(ts_seen)
    by_ts: dict = {}
    for e in events:
        by_ts.setdefault(e["timestamp"], []).append("fac" if "facility_id" in e else "mkt")
    for kinds in by_ts.values():
        assert kinds == sorted(kinds, key=lambda k: k != "fac")  # fac block first


def test_roundtrip_through_ingest_gate(spark, etl, payloads):
    """publish → parse → branch must reproduce the rollup (nulls → 0.0
    per the documented divergence) and the market facts."""
    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    parsed = ingest.parse_events(raw)
    fac = ingest.facility_branch(parsed)
    got = {
        (r.facility_id, r.ts): (round(r.power_mw, 4), round(r.co2_tonnes, 4))
        for r in fac.collect()
    }
    want = {
        (r.facility_code, r.ts): (round(r.power, 4), round(r.emission, 4))
        for r in etl["facility_rollup"].collect()
    }
    # every original fact survives the round trip
    for k, v in want.items():
        assert got[k] == v
    # extra emitted events are exactly the null-cell → 0.0 fills
    extras = set(got) - set(want)
    assert all(got[k] == (0.0, 0.0) for k in extras)

    mkt = ingest.market_branch(parsed)
    got_m = {
        (r.region_id, r.ts): (round(r.price_dmwh, 4), round(r.demand_mw, 4))
        for r in mkt.collect()
    }
    # the wide cache is fac LEFT JOIN mkt on the facility pivot's
    # timestamps (extractor.py:307): market facts at instants absent
    # from the facility side never enter the cache, so they can't
    # round-trip — reference-faithful loss, not an engine bug
    cache_ts = {r.timestamp for r in etl["consolidate_wide"].select("timestamp").collect()}
    want_m = {
        (r.region_code, r.ts): (round(r.price, 4), round(r.demand, 4))
        for r in etl["market_long"].collect()
        if r.ts in cache_ts
    }
    assert want_m  # the filter must not trivialize the check
    for k, v in want_m.items():
        assert got_m[k] == v


def test_publish_to_files_feeds_replay_source(spark, etl, tmp_path):
    n = nem_publish.publish_to_files(etl["consolidate_wide"], str(tmp_path / "replay"), 100)
    assert n > 1
    from assignment_2_dataengineering_spark.streaming import replay

    stream = replay.file_replay_stream(spark, str(tmp_path / "replay"))
    assert stream.isStreaming
