"""Extraction layer: query-string building, retry, batching, nested
API-response normalization (zip→equi-join parity with the long fixture
rows), alignment checks, and the S5-S7 file sinks/scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from assignment_2_dataengineering_spark.sources import extract as EX
from assignment_2_dataengineering_spark.sources import io as IO
from tests.fixtures import nem


def test_query_string_repeats_list_params():
    qs = EX.build_query_string(
        interval="5m",
        metrics=["power", "emissions"],
        facility_code=["A", "B"],
        date_start="2025-10-08",
        date_end="2025-10-15",
    )
    assert qs.startswith("?interval=5m")
    assert qs.count("metrics=") == 2
    assert "facility_code=A&facility_code=B" in qs
    assert EX.build_query_string() == ""


def test_fetch_with_retry_recovers_and_gives_up():
    calls, sleeps = [], []
    responses = iter([(500, None), (503, None), (200, {"ok": 1})])

    def transport(url):
        calls.append(url)
        return next(responses)

    out = EX.fetch_with_retry(transport, "u", retry_limit=3, backoff_s=10, sleep=sleeps.append)
    assert out == {"ok": 1}
    assert len(calls) == 3
    assert sleeps == [10, 10]

    always_bad = lambda url: (500, None)  # noqa: E731
    assert EX.fetch_with_retry(always_bad, "u", retry_limit=3, sleep=lambda s: None) is None


def test_batching_and_facility_fetch_covers_all_codes():
    codes = [f"FAC{i:03d}" for i in range(60)]
    batches = EX.batch_codes(codes, 25)
    assert [len(b) for b in batches] == [25, 25, 10]

    seen = []

    def transport(url):
        seen.append(url)
        return 200, {"data": []}

    out = EX.fetch_facility_data(transport, "http://x/v4", codes, "2025-10-08", "2025-10-15")
    assert len(out) == 3 and len(seen) == 3
    joined = "&".join(seen)
    assert all(f"facility_code={c}" in joined for c in codes)


@pytest.fixture(scope="module")
def readings():
    return nem.facility_readings(nem.facilities_raw())


def test_facility_zip_join_parity(spark, readings):
    """Nested response → long must reproduce the exact fixture rows the
    response was built from (the reference's positional zips, as joins)."""
    responses = EX.responses_to_df(spark, nem.facility_api_responses(readings))
    long = EX.facility_responses_to_long(responses)
    got = {(r.unit_code, r.timestamp): (r.power, r.emission) for r in long.collect()}
    want = {(r["unit_code"], r["timestamp"]): (r["power"], r["emission"]) for r in readings}
    assert got == want


def test_market_zip_join_parity_and_prefix_strip(spark):
    market = nem.market_readings()
    responses = EX.responses_to_df(spark, [nem.market_api_response(market)])
    long = EX.market_responses_to_long(responses)
    got = {(r.region_code, r.timestamp): (r.price, r.demand) for r in long.collect()}
    want = {(r["region_code"], r["timestamp"]): (r["price"], r["demand"]) for r in market}
    assert got == want
    assert set(long.select("region_code").distinct().toPandas().region_code) == set(nem.REGIONS)


def test_alignment_check_counts_one_sided_rows(spark, readings):
    responses = EX.responses_to_df(spark, nem.facility_api_responses(readings))
    pts = EX.facility_responses_to_long(responses)
    power = pts.select("unit_code", "timestamp")
    # drop one unit from the "emission side" → left_only rows appear
    emis = pts.filter(F.col("unit_code") != "GHOSTU0").select("unit_code", "timestamp")
    chk = EX.alignment_check(power, emis, ["unit_code", "timestamp"])
    assert chk["left_only"] == 25 and chk["right_only"] == 0
    assert chk["matched"] == power.count() - 25


def test_csv_array_codec_roundtrip(spark, tmp_path):
    from assignment_2_dataengineering_spark.plans import nem_etl
    from assignment_2_dataengineering_spark.schemas import FUELTECH_SCHEMA

    facs = nem_etl.load_facilities_json(spark, nem.facilities_raw())
    fuel = spark.createDataFrame(nem.fueltech_map(), FUELTECH_SCHEMA)
    lookup = nem_etl.flatten_facilities(facs, fuel)
    path = str(tmp_path / "lookup_csv")
    IO.write_csv_with_array_codec(lookup, path)
    back = IO.read_csv_with_array_codec(spark, path, lookup.schema)
    a = {r.facility_id: (r.fuel_tech, r.region) for r in lookup.collect()}
    b = {r.facility_id: (r.fuel_tech, r.region) for r in back.collect()}
    assert a == b


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Same-key same-count bucketed tables must join with zero Exchange:
    the write-time shuffle replaces every query-time shuffle."""
    from assignment_2_dataengineering_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    IO.write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, str(tmp_path / "b_li"))
    IO.write_bucketed(orders, "b_orders", ["o_orderkey"], 8, str(tmp_path / "b_ord"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_parquet_by_day_partitions_and_prunes(spark, tmp_path):
    df = spark.range(0, 96).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1_760_486_400) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.5).alias("v"),
    )
    path = str(tmp_path / "facts")
    IO.write_parquet_by_day(df, path)
    back = IO.read_parquet(spark, path)
    assert back.count() == 96
    one_day = back.filter(F.col("event_date") == "2025-10-15")
    assert one_day.count() == 24
    # partition pruning is visible in the scan's partition filters
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan


class TestPythonDataSource:
    """S1 as a Spark 4 Python Data Source: partition-per-batch fetch on
    executors, raw landing schema, identical downstream normalization."""

    def _read(self, spark, codes, batch_size=2):
        from assignment_2_dataengineering_spark.sources.python_datasource import (
            RestBatchDataSource,
        )

        try:
            spark.dataSource.register(RestBatchDataSource)
        except Exception:
            pass  # already registered in this session
        return (
            spark.read.format("oe_rest")
            .option("codes", ",".join(codes))
            .option("batch_size", str(batch_size))
            .option("transport", "fake:7")
            .load()
        )

    def test_partition_per_batch_and_landing_schema(self, spark):
        codes = ["U1", "U2", "U3", "U4", "U5"]
        df = self._read(spark, codes, batch_size=2)
        rows = df.collect()
        assert len(rows) == 3  # ceil(5/2) batches -> one landing row each
        assert df.columns == ["batch_index", "url", "status", "body"]
        assert {r.batch_index for r in rows} == {0, 1, 2}
        assert all(r.status == 200 for r in rows)
        assert all("facility_code=U" in r.url for r in rows)
        # the fetch fan-out IS the partitioning: one task per batch
        assert df.rdd.getNumPartitions() == 3

    def test_normalizes_through_existing_plan(self, spark):
        from pyspark.sql import functions as F

        from assignment_2_dataengineering_spark.sources import extract as EX

        codes = ["U1", "U2", "U3"]
        df = self._read(spark, codes, batch_size=2)
        parsed = df.select(
            F.from_json("body", EX.RESPONSE_SCHEMA).alias("resp")
        ).select("resp.*")
        long = EX.facility_responses_to_long(parsed)
        rows = long.collect()
        # 3 codes x 3 intervals, power and emissions equi-joined
        assert len(rows) == 9
        assert {r.unit_code for r in rows} == set(codes)
        assert all(r.power is not None and r.emission is not None for r in rows)
        # deterministic: same seed -> same values
        again = EX.facility_responses_to_long(
            self._read(spark, codes, batch_size=2)
            .select(F.from_json("body", EX.RESPONSE_SCHEMA).alias("resp"))
            .select("resp.*")
        )
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    def test_file_transport_missing_batch_lands_404(self, spark, tmp_path_factory):
        import json as _json

        from assignment_2_dataengineering_spark.sources.python_datasource import (
            RestBatchDataSource,
            _fake_body,
        )

        root = tmp_path_factory.mktemp("landed")
        (root / "batch_00000.json").write_text(_json.dumps(_fake_body(1, 0, ["U1", "U2"])))
        try:
            spark.dataSource.register(RestBatchDataSource)
        except Exception:
            pass
        df = (
            spark.read.format("oe_rest")
            .option("codes", "U1,U2,U3")
            .option("batch_size", "2")
            .option("transport", f"file:{root}")
            .load()
        )
        by_idx = {r.batch_index: r for r in df.collect()}
        assert by_idx[0].status == 200 and by_idx[0].body
        assert by_idx[1].status == 404 and by_idx[1].body is None
