"""Incremental sketch-table maintenance (streaming/sketch_maintain.py):
the maintained table must answer exactly like one-shot batch sketching
of everything seen — HLL estimates equal, CMS blobs BIT-identical —
and replayed batches must be no-ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from assignment_2_dataengineering_spark.operators.sketch import (
    estimate_freq,
    rollup_freq,
    sketch_distinct,
    sketch_freq,
    rollup_sketch,
)
from assignment_2_dataengineering_spark.sources.tables import load_table
from assignment_2_dataengineering_spark.streaming.sketch_maintain import (
    incremental_sketch_batch,
    maintained_distinct,
    maintained_freq,
)

EPS = 0.005


def _run_batches(spark, sf_dir, table_dir, replay=False):
    ev = load_table(spark, sf_dir, "events")
    worker = incremental_sketch_batch(table_dir, ["event_type"], "user_id", eps=EPS)
    bounds = [(0, 3000), (3000, 7000), (7000, 10**12)]
    for bid, (lo, hi) in enumerate(bounds):
        batch = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        worker(batch, bid)
        if replay:
            worker(batch, bid)  # replayed delivery must be a no-op
    return ev


def test_maintained_equals_one_shot(spark, sf_dir, tmp_path):
    table_dir = str(tmp_path / "sktbl")
    ev = _run_batches(spark, sf_dir, table_dir, replay=True)

    # HLL: maintained rollup == direct one-shot sketch estimates.
    got = {
        r["event_type"]: r["n_distinct"]
        for r in maintained_distinct(spark, table_dir, ["event_type"]).collect()
    }
    want = {
        r["event_type"]: int(r["n"])
        for r in rollup_sketch(
            sketch_distinct(ev, ["event_type"], "user_id"), ["event_type"], "n"
        ).collect()
    }
    assert got == want and got

    # CMS: maintained merge is bit-identical to sketching in one pass.
    got_cms = {
        r["event_type"]: bytes(r["cms"])
        for r in maintained_freq(spark, table_dir, ["event_type"]).collect()
    }
    want_cms = {
        r["event_type"]: bytes(r["cms"])
        for r in sketch_freq(ev, ["event_type"], "user_id", eps=EPS).collect()
    }
    assert got_cms == want_cms


def test_frequency_estimates_from_maintained_table(spark, sf_dir, tmp_path):
    table_dir = str(tmp_path / "sktbl2")
    ev = _run_batches(spark, sf_dir, table_dir)
    merged = maintained_freq(spark, table_dir, ["event_type"])
    est = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in estimate_freq(
            spark, merged, [0, 1, 2], ["event_type"], "user_id", "n"
        ).collect()
    }
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.filter(F.col("user_id") < 3)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = ev.count()
    for k, e in est.items():
        true = exact.get(k, 0)
        assert true <= e <= true + EPS * total + 1, (k, e, true)


def test_sketch_crash_before_hwm_commit_then_redelivery_is_clean(spark, tmp_path):
    """CMS counters SUM on merge, so the crash window between the
    sketch write and the high-water-mark commit must not double-count:
    redelivery overwrites batch_id={N} instead of appending."""
    import datetime as dt
    import os

    from assignment_2_dataengineering_spark.streaming.sketch_maintain import (
        incremental_sketch_batch,
        maintained_distinct,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i % 7, t0, "click") for i in range(50)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    d = str(tmp_path / "sk")
    worker = incremental_sketch_batch(d)
    worker(df, 0)
    before = maintained_distinct(spark, d, ["event_type"]).collect()
    n_rows_before = (
        spark.read.parquet(os.path.join(d, "sketches")).agg(F.sum("n_rows")).first()[0]
    )
    os.remove(os.path.join(d, "_last_batch.json"))  # "crash"
    worker(df, 0)  # redelivery
    after = maintained_distinct(spark, d, ["event_type"]).collect()
    n_rows_after = (
        spark.read.parquet(os.path.join(d, "sketches")).agg(F.sum("n_rows")).first()[0]
    )
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    assert n_rows_after == n_rows_before  # no double-counted partials
