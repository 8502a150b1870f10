"""S10 JDBC path against a REAL database: Spark's bundled embedded
Derby (no external service). Covers the bulk scan wrapper, the
pushed-down point-lookup fetch, and the full streaming
fallback-enrichment upsert (reference dashboard.py:277-307: Postgres
point query + ON CONFLICT DO NOTHING insert)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.sources import jdbc
from assignment_2_dataengineering_spark.streaming import replay, snapshot

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
DIM_SCHEMA = "facility_id string, facility_name string"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Embedded Derby DB seeded with the secondary facilities table."""
    db = str(tmp_path_factory.mktemp("derby")) + "/dimdb"
    url = f"jdbc:derby:{db};create=true"
    secondary = spark.createDataFrame(
        [
            ("UNKNOWN9", "Fetched Unknown Nine"),
            ("NEW1", "Fetched New One"),
            ("OTHER", "Never Requested"),
        ],
        DIM_SCHEMA,
    )
    # explicit VARCHAR: Derby's default StringType mapping is CLOB,
    # which cannot appear in comparison predicates
    secondary.write.option(
        "createTableColumnTypes", "facility_id VARCHAR(64), facility_name VARCHAR(256)"
    ).jdbc(url, "facilities", properties=DERBY_PROPS)
    return url


def test_read_jdbc_table_roundtrip(spark, derby_url):
    full = jdbc.read_jdbc_table(spark, derby_url, "facilities", DERBY_PROPS)
    assert full.count() == 3
    assert set(full.columns) == {"facility_id", "facility_name"}


def test_fetch_missing_pushes_point_lookup(spark, derby_url):
    """Only requested keys come back — the IN predicate runs database-
    side, so unrequested rows never cross the wire."""
    fetch = jdbc.fetch_missing_jdbc(spark, derby_url, "facilities", "facility_id", DERBY_PROPS)
    got = fetch(spark.createDataFrame([("UNKNOWN9",), ("ABSENT",)], "facility_id string"))
    rows = {r.facility_id: r.facility_name for r in got.collect()}
    assert rows == {"UNKNOWN9": "Fetched Unknown Nine"}
    assert fetch(spark.createDataFrame([], "facility_id string")) is None


def test_streaming_upsert_with_jdbc_secondary(spark, derby_url, tmp_path_factory):
    """J8 e2e with a non-stub secondary source: a streaming foreachBatch
    upsert fetches unknown keys from Derby via spark.read.jdbc and
    appends them insert-if-absent; known keys are never re-fetched and
    keys absent from the secondary stay absent."""
    lookup = spark.createDataFrame([("FAC000", "Known Zero")], DIM_SCHEMA)
    dim_state = {"df": lookup}
    fetch = jdbc.fetch_missing_jdbc(spark, derby_url, "facilities", "facility_id", DERBY_PROPS)

    src = str(tmp_path_factory.mktemp("ids"))
    replay.write_replay_chunks(
        ["FAC000", "UNKNOWN9", "UNKNOWN9", "NEW1", "ABSENT"], src, events_per_file=2
    )
    stream = replay.file_replay_stream(spark, src).select(F.col("value").alias("facility_id"))
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(snapshot.enrichment_upsert_batch(dim_state, fetch))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_jdbc")))
        .start()
    )
    q.awaitTermination(120)

    dim = {r.facility_id: r.facility_name for r in dim_state["df"].collect()}
    assert dim["FAC000"] == "Known Zero"  # never re-fetched/overwritten
    assert dim["UNKNOWN9"] == "Fetched Unknown Nine"
    assert dim["NEW1"] == "Fetched New One"
    assert "ABSENT" not in dim  # not in the secondary either
    assert "OTHER" not in dim  # secondary rows never requested stay put
    assert len(dim) == 3


def test_streaming_upsert_writes_back_to_primary_jdbc(
    spark, derby_url, tmp_path_factory
):
    """The INSERT half of the reference's upsert (dashboard.py:298-303,
    ON CONFLICT DO NOTHING): rows fetched from the secondary land in
    the primary JDBC table exactly once — across duplicate keys within
    the stream AND across a replayed batch (the write-back's anti-join
    is the idempotence guard)."""
    primary_table = "primary_facilities"
    spark.createDataFrame([("FAC000", "Known Zero")], DIM_SCHEMA).write.option(
        "createTableColumnTypes",
        "facility_id VARCHAR(64), facility_name VARCHAR(256)",
    ).jdbc(derby_url, primary_table, properties=DERBY_PROPS)

    lookup = jdbc.read_jdbc_table(spark, derby_url, primary_table, DERBY_PROPS)
    dim_state = {"df": lookup}
    fetch = jdbc.fetch_missing_jdbc(
        spark, derby_url, "facilities", "facility_id", DERBY_PROPS
    )
    write_back = jdbc.jdbc_write_back(
        derby_url, primary_table, "facility_id", DERBY_PROPS
    )
    worker = snapshot.enrichment_upsert_batch(dim_state, fetch, write_back)

    src = str(tmp_path_factory.mktemp("ids_wb"))
    replay.write_replay_chunks(
        ["FAC000", "UNKNOWN9", "UNKNOWN9", "NEW1", "ABSENT"], src, events_per_file=2
    )
    stream = replay.file_replay_stream(spark, src).select(
        F.col("value").alias("facility_id")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(worker)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_wb")))
        .start()
    )
    q.awaitTermination(120)

    table = {
        r.facility_id: r.facility_name
        for r in jdbc.read_jdbc_table(
            spark, derby_url, primary_table, DERBY_PROPS
        ).collect()
    }
    assert table == {
        "FAC000": "Known Zero",
        "UNKNOWN9": "Fetched Unknown Nine",
        "NEW1": "Fetched New One",
    }

    # replayed batch: re-apply the same keys against a RESET in-memory
    # dim (simulating a restart that lost driver state but not the DB):
    # the write-back's anti-join must keep the table unchanged
    dim_state["df"] = spark.createDataFrame([("FAC000", "Known Zero")], DIM_SCHEMA)
    worker(
        spark.createDataFrame(
            [("UNKNOWN9",), ("NEW1",)], "facility_id string"
        ),
        99,
    )
    counts = (
        jdbc.read_jdbc_table(spark, derby_url, primary_table, DERBY_PROPS)
        .groupBy("facility_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in counts), counts
    assert len(counts) == 3
