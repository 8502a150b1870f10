"""Dashboard analytics library: filters, scalar tiles, legend, marker
scaling — computed over snapshot frames built from the fixture stream,
checked against hand-computed values. Plus the J8 fallback-enrichment
upsert closure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.plans import dashboard as DB
from assignment_2_dataengineering_spark.plans import nem_etl
from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA
from assignment_2_dataengineering_spark.streaming import ingest, snapshot
from tests.fixtures import nem


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame([(l,) for l in nem.event_stream()], "value string")
    parsed = ingest.parse_events(raw)
    facs = nem_etl.load_facilities_json(spark, nem.facilities_raw())
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(facs, fuel)
    fac_snap = snapshot.latest_snapshot_batch(
        ingest.facility_branch(parsed), "facility_id"
    ).join(F.broadcast(lookup), "facility_id", "inner")
    mkt_snap = snapshot.latest_snapshot_batch(ingest.market_branch(parsed), "region_id")
    return {"fac": fac_snap.cache(), "mkt": mkt_snap.cache(), "lookup": lookup}


def test_filter_snapshot_region_and_fuel(frames):
    fac = frames["fac"]
    only_nsw = DB.filter_snapshot(fac, regions=["NSW1"])
    assert only_nsw.count() > 0
    assert {r.region for r in only_nsw.collect()} == {"NSW1"}
    hydro = DB.filter_snapshot(fac, fuels=["Hydro"])
    for r in hydro.collect():
        assert "Hydro" in r.fuel_tech
    assert DB.filter_snapshot(fac).count() == fac.count()


def test_facility_metrics_sums_snapshot(frames):
    fac = frames["fac"]
    row = DB.facility_metrics(fac).collect()[0]
    rows = fac.collect()
    assert row.n_facilities == len(rows)
    assert abs(row.total_power_mw - round(sum(r.power_mw for r in rows), 4)) < 1e-6
    assert abs(row.total_co2_tonnes - round(sum(r.co2_tonnes for r in rows), 4)) < 1e-6
    # modal last_ts with min tie-break
    from collections import Counter

    c = Counter(r.last_ts for r in rows)
    best = min([t for t, n in c.items() if n == max(c.values())])
    assert row.last_updated == best


def test_market_metrics_handles_empty(frames, spark):
    mkt = frames["mkt"]
    row = DB.market_metrics(mkt).collect()[0]
    rows = mkt.collect()
    assert abs(row.avg_price_dmwh - round(sum(r.price_dmwh for r in rows) / len(rows), 4)) < 1e-6
    empty = DB.market_metrics(mkt.filter(F.lit(False)))
    r0 = empty.collect()[0]
    assert r0.avg_price_dmwh == 0.0 and r0.total_demand_mw == 0.0  # NaN guard


def test_fuel_legend_sorted_distinct(frames):
    fuels = DB.fuel_legend(frames["lookup"]).collect()[0].fuels
    assert fuels == sorted(set(fuels))
    assert "-" not in fuels


def test_marker_sizes_bounded(frames):
    out = DB.marker_sizes(frames["fac"]).collect()
    for r in out:
        assert 12.0 <= r.marker_px <= 36.0 + 1e-9
    assert max(r.marker_px for r in out) == 36.0  # p95-clipped rows hit the cap


def test_enrichment_upsert_batch_appends_misses(spark, frames):
    """J8: unknown keys fetched from the fallback source exactly once,
    appended insert-if-absent; known keys never re-fetched."""
    lookup = frames["lookup"].select("facility_id", "facility_name")
    dim_state = {"df": lookup}
    fetched_keys: list[str] = []

    def fetch_missing(keys_df):
        keys = [r.facility_id for r in keys_df.collect()]
        fetched_keys.extend(keys)
        if not keys:
            return None
        return spark.createDataFrame(
            [(k, f"fetched {k}") for k in keys], "facility_id string, facility_name string"
        )

    batch = spark.createDataFrame(
        [("FAC000",), ("UNKNOWN9",), ("UNKNOWN9",), ("NEW1",)], "facility_id string"
    )
    apply = snapshot.enrichment_upsert_batch(dim_state, fetch_missing)
    apply(batch, 0)
    assert sorted(fetched_keys) == ["NEW1", "UNKNOWN9"]  # known key not fetched
    dim = dim_state["df"]
    assert dim.filter(F.col("facility_id") == "UNKNOWN9").count() == 1
    assert dim.filter(F.col("facility_id") == "NEW1").count() == 1
    assert dim.count() == lookup.count() + 2
    # idempotent: a second batch with the same keys fetches nothing new is
    # NOT guaranteed (dim grew), but the insert stays if-absent
    apply(batch, 1)
    assert dim_state["df"].filter(F.col("facility_id") == "UNKNOWN9").count() == 1


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path_factory):
    """ORC sink/scan: values survive a roundtrip and the scan prunes
    columns + pushes predicates like the Parquet path."""
    from assignment_2_dataengineering_spark.sources import io as eio
    from assignment_2_dataengineering_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path_factory.mktemp("orc") / "customer_orc")
    eio.write_orc(cust, path)
    back = eio.read_orc(spark, path)
    assert sorted(back.columns) == sorted(cust.columns)
    assert back.count() == cust.count()
    a = sorted(tuple(r) for r in cust.select("c_custkey", "c_acctbal").collect())
    b = sorted(tuple(r) for r in back.select("c_custkey", "c_acctbal").collect())
    assert a == b
    pruned = back.filter(back.c_custkey < 10).select("c_name")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    # column pruning: the ORC scan reads only the referenced columns
    import re
    m = re.search(r"ReadSchema: ([^\n]*)", pruned._jdf.queryExecution().toString() or "")
    if m:
        assert "c_acctbal" not in m.group(1)


def test_cli_list_run_oracle(spark, sf_dir, capsys):
    """__main__ CLI: list shows every registered query; run emits JSON
    lines; oracle reproduces the driver's per-query gate (and must not
    stop the caller's session)."""
    import json as _json

    from assignment_2_dataengineering_spark.__main__ import main
    from assignment_2_dataengineering_spark.plans.registry import all_specs

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in all_specs():
        assert name in out

    assert main(["run", "q_count", "--sf-dir", sf_dir, "-n", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 1 <= len(lines) <= 5
    assert all(isinstance(_json.loads(l), dict) for l in lines)

    assert main(["oracle", "q_count", "--sf-dir", sf_dir]) == 0
    verdict = _json.loads(capsys.readouterr().out.strip())
    assert verdict["match"] is True
    assert spark.sparkContext._jsc is not None  # session survived

    assert main(["run", "nope"]) == 2
