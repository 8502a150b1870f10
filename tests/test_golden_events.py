"""Golden replay regression (SURVEY.md §5): the 56 real events the
reference's view_published_events.ipynb captured from the live MQTT
topic, re-serialized as JSONL (tests/fixtures/golden_events.jsonl).
Pins the ingest gate against actual production payload shapes — not
just the synthetic fixture generator's idea of them."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.streaming import ingest, snapshot

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_events.jsonl")


@pytest.fixture(scope="module")
def golden_lines():
    with open(GOLDEN) as f:
        return [l.strip() for l in f if l.strip()]


@pytest.fixture(scope="module")
def golden_parsed(spark, golden_lines):
    raw = spark.createDataFrame([(l,) for l in golden_lines], "value string")
    return ingest.parse_events(raw)


def test_golden_events_all_route_to_facility_branch(golden_parsed, golden_lines):
    """Every captured event is a well-formed facility reading: none
    quarantined, none routed to market."""
    assert ingest.facility_branch(golden_parsed).count() == len(golden_lines) == 56
    assert ingest.market_branch(golden_parsed).count() == 0
    assert ingest.quarantine_branch(golden_parsed).count() == 0


def test_golden_events_parse_values_exactly(spark, golden_parsed, golden_lines):
    """Timestamps and measures survive the parse bit-exactly: the +10:00
    offset lands at 2025-10-28T14:05:00 UTC, and every (facility,
    power, co2) triple matches the raw JSON."""
    fac = ingest.facility_branch(golden_parsed)
    rows = {r.facility_id: r for r in fac.collect()}
    want = [json.loads(l) for l in golden_lines]
    assert len(rows) == len(want)  # one event per facility in the capture
    for w in want:
        r = rows[w["facility_id"]]
        assert r.power_mw == w["power_mw"]
        assert r.co2_tonnes == w["co2_tonnes"]
        # session TZ is UTC (sources.tables pins it): +10:00 → 14:05 prior day
        assert r.ts.isoformat() == "2025-10-28T14:05:00"


def test_golden_events_snapshot_shape(spark, golden_parsed):
    """The latest-per-key snapshot over the capture is one row per
    facility with the captured reading (single-instant capture → the
    snapshot IS the event set)."""
    fac = ingest.facility_branch(golden_parsed).select(
        "facility_id", "ts", "power_mw", "co2_tonnes"
    )
    snap = snapshot.latest_snapshot_batch(fac, "facility_id")
    assert snap.count() == 56
    assert snap.filter(F.col("power_mw").isNull()).count() == 0
