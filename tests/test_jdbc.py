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
