"""Exact incremental rollup (streaming/rollup_maintain.py): folding any
batch partitioning of the stream equals the one-shot batch aggregate
(count/min/max exactly, sums to FP fold-order tolerance), replays are
no-ops, and the version pointer only ever exposes complete states.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from assignment_2_dataengineering_spark.sources.tables import load_table
from assignment_2_dataengineering_spark.streaming.rollup_maintain import (
    current_rollup,
    incremental_rollup_batch,
)


def test_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    table_dir = str(tmp_path / "rollup")
    ev = load_table(spark, sf_dir, "events")
    worker = incremental_rollup_batch(table_dir, ["event_type"])
    for bid, (lo, hi) in enumerate([(0, 2500), (2500, 6000), (6000, 10**12)]):
        batch = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        worker(batch, bid)
        worker(batch, bid)  # replay must be a no-op

    got = {
        (r["event_type"], r["day"]): r
        for r in current_rollup(spark, table_dir).collect()
    }
    want = {
        (r["event_type"], r["day"]): r
        for r in ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(want) and got
    for k, w in want.items():
        g = got[k]
        assert g["n_rows"] == w["n_rows"]
        assert g["min_value"] == w["min_value"]
        assert g["max_value"] == w["max_value"]
        assert abs(g["sum_value"] - w["sum_value"]) < 1e-6, k
        assert abs(g["avg_value"] - w["sum_value"] / w["n_rows"]) < 1e-9


def test_pointer_survives_unpublished_write(spark, sf_dir, tmp_path):
    """A data directory without a pointer flip is invisible: readers
    keep seeing the previous complete version."""
    import os

    table_dir = str(tmp_path / "rollup2")
    ev = load_table(spark, sf_dir, "events")
    worker = incremental_rollup_batch(table_dir, ["event_type"])
    worker(ev.filter(F.col("event_id") < 5000), 0)
    before = sorted(
        tuple(r) for r in current_rollup(spark, table_dir).collect()
    )
    # simulate a crash AFTER data write, BEFORE pointer flip
    ev.filter(F.col("event_id") >= 5000).withColumn("day", F.to_date("ts")).groupBy(
        "event_type", "day"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ).write.mode("overwrite").parquet(os.path.join(table_dir, "data_v99"))
    after = sorted(tuple(r) for r in current_rollup(spark, table_dir).collect())
    assert after == before


def test_wired_into_real_stream(spark, sf_dir, tmp_path):
    """The worker composes with an actual Structured Streaming query:
    a parquet file source split into micro-batches drives foreachBatch,
    and the published rollup equals the one-shot batch aggregate."""
    import os

    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "rollup_stream")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # several input files → several micro-batches (maxFilesPerTrigger=1)
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_rollup_batch(table_dir, ["event_type"])
        )
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_type"], r["day"]): (r["n_rows"], r["min_value"], r["max_value"])
        for r in current_rollup(spark, table_dir).collect()
    }
    want = {
        (r["event_type"], r["day"]): (r["n_rows"], r["min_value"], r["max_value"])
        for r in ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want and got
