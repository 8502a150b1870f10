"""Batch ETL parity tests against the reference's semantics
(extractor.py:58-309), on the deterministic NEM fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.plans import nem_etl
from assignment_2_dataengineering_spark.schemas import (
    FACILITY_READING_SCHEMA,
    MARKET_READING_SCHEMA,
)
from tests.fixtures import nem


@pytest.fixture(scope="module")
def etl(spark):
    facs = nem.facilities_raw()
    readings = spark.createDataFrame(nem.facility_readings(facs), FACILITY_READING_SCHEMA)
    market = spark.createDataFrame(nem.market_readings(), MARKET_READING_SCHEMA)
    return nem_etl.run_batch_etl(spark, facs, nem.fueltech_map(), readings, market)


def test_flatten_filters_non_operating_and_wem(etl):
    lookup = etl["facility_lookup"].collect()
    ids = {r.facility_id for r in lookup}
    assert "FAC007" not in ids  # no operating units (extractor.py:77-87)
    # WEM-region facility STAYS in the lookup: the reference's 419-row
    # lookup filters on operating units only (BASELINE.md facilities row)
    assert "FAC003" in ids
    assert "FAC011" in ids  # null location is kept (lat/lon null)
    row11 = next(r for r in lookup if r.facility_id == "FAC011")
    assert row11.lat is None and row11.lon is None


def test_fuel_labels_deduped_and_dash_dropped(etl):
    # extractor.py:94: set-dedup, drop '-' labels
    for r in etl["facility_lookup"].collect():
        assert "-" not in r.fuel_tech
        assert r.fuel_tech == sorted(set(r.fuel_tech))


def test_unit_dim_only_operating_nem(etl):
    units = etl["unit_to_facility"].collect()
    ids = {u.facility_id for u in units}
    # extractor.py:72-85 has no network filter: WEM-region FAC003's
    # operating units ARE in the map; FAC007 (no operating units) is not
    assert "FAC003" in ids
    assert "FAC007" not in ids
    assert len({u.unit_code for u in units}) == len(units)  # PK


def test_rollup_drops_orphans_and_sums_units(etl, spark):
    roll = etl["facility_rollup"]
    assert roll.filter(F.col("facility_code") == "GHOST").count() == 0  # P3 semi-join
    # rollup = sum of per-unit readings for a multi-unit facility
    facs = nem.facilities_raw()
    readings = spark.createDataFrame(nem.facility_readings(facs), FACILITY_READING_SCHEMA)
    multi = (
        readings.filter(F.col("facility_code") != "GHOST")
        .groupBy("facility_code")
        .agg(F.countDistinct("unit_code").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    assert multi, "fixture should contain a multi-unit facility"
    fac = multi[0].facility_code
    manual = (
        readings.filter(F.col("facility_code") == fac)
        .withColumn("ts", F.try_to_timestamp("timestamp"))
        .groupBy("ts")
        .agg(F.round(F.sum("power"), 4).alias("power"))
    )
    got = {r.ts: r.power for r in roll.filter(F.col("facility_code") == fac).collect()}
    for r in manual.collect():
        assert got[r.ts] == r.power


def test_mixed_offsets_normalize_to_instants(etl):
    # 21 timestamps stay +10:00; 4 (i=3,10,17,24) are +11:00. Shifting
    # by -1h makes i=17 collide with i=5's instant and i=24 with i=12's,
    # while i=3 and i=10 land on new instants: 21 + 2 = 23 distinct.
    # pandas (tz-aware to_datetime) would compute the same set.
    n_ts = etl["facility_rollup"].select("ts").distinct().count()
    assert n_ts == 23


def test_wide_cache_shape_and_left_join_nulls(etl):
    wide = etl["consolidate_wide"]
    cols = wide.columns
    assert "timestamp" in cols
    assert any(c.startswith("power_") for c in cols)
    assert any(c.startswith("emission_") for c in cols)
    assert any(c.startswith("price_") for c in cols)
    assert any(c.startswith("demand_") for c in cols)
    # null price_TAS1 cells: the genuine (TAS1, i=13) hole at
    # 2025-10-15T01:05Z, plus the two +11:00-shifted facility instants
    # (i=3 → 23:15Z, i=10 → 23:50Z) that no market row matches
    import datetime as dt

    hole_ts = sorted(r.timestamp for r in wide.filter(F.col("price_TAS1").isNull()).collect())
    assert len(hole_ts) == 3
    assert dt.datetime(2025, 10, 15, 1, 5) in hole_ts
    assert wide.count() == 23


def test_pivot_unpivot_roundtrip(etl, spark):
    """extractor pivot → publisher unpivot is lossless for the facility
    metrics (modulo the long/wide null convention)."""
    from assignment_2_dataengineering_spark.operators.reshape import (
        unpivot_long,
        wide_columns_to_codes,
    )

    wide = etl["consolidate_wide"]
    codes = wide_columns_to_codes(wide, "power")
    assert codes == sorted(codes)
    power_cols = [f"power_{c}" for c in codes]
    long_again = unpivot_long(
        wide.select("timestamp", *power_cols), ["timestamp"], power_cols, "metric", "power"
    ).filter(F.col("power").isNotNull())
    back = long_again.withColumn("facility_code", F.expr("substring(metric, 7)")).drop("metric")
    orig = etl["facility_rollup"].select(
        F.col("ts").alias("timestamp"), "facility_code", "power"
    )
    assert back.count() == orig.count()
    assert (
        back.join(orig, ["timestamp", "facility_code", "power"], "inner").count() == orig.count()
    )
