"""Incremental join-view maintenance: the delta rule must reproduce
the full recompute row-for-row for ANY base/delta split — including
empty deltas, delta-delta matches, and duplicate join keys (which
multiply; the delta rule must multiply identically)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.sources.tables import load_table
from assignment_2_dataengineering_spark.streaming.view_maintain import (
    join_view_delta,
    refresh_join_view,
)


def _assert_same_rows(got, want):
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


@pytest.mark.parametrize(
    "split_a, split_b",
    [
        (3, 5),  # both sides get deltas
        (1, 1),  # everything is delta
        (0, 4),  # only B splits
    ],
)
def test_refresh_equals_full_recompute(spark, sf_dir, split_a, split_b):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a_all = orders.withColumnRenamed("o_custkey", "k")
    b_all = cust.withColumnRenamed("c_custkey", "k")

    a_old = a_all.filter(F.col("o_orderkey") % 7 >= split_a)
    da = a_all.filter(F.col("o_orderkey") % 7 < split_a)
    b_old = b_all.filter(F.col("k") % 9 >= split_b)
    db = b_all.filter(F.col("k") % 9 < split_b)

    view = a_old.join(b_old, "k")
    got = refresh_join_view(view, a_old, b_old, da, db, ["k"])
    want = a_all.join(b_all, "k")
    _assert_same_rows(got, want)


def test_empty_deltas_no_write(spark):
    a = spark.createDataFrame([(1, "x")], "k long, va string")
    b = spark.createDataFrame([(1, "y")], "k long, vb string")
    assert join_view_delta(a, b, None, None, ["k"]) is None
    view = a.join(b, "k")
    assert refresh_join_view(view, a, b, None, None, ["k"]) is view


def test_duplicate_keys_multiply_identically(spark):
    # 2 A-rows × 2 B-rows on the same key; one of each arrives as delta
    a_old = spark.createDataFrame([(1, "a1")], "k long, va string")
    da = spark.createDataFrame([(1, "a2")], "k long, va string")
    b_old = spark.createDataFrame([(1, "b1")], "k long, vb string")
    db = spark.createDataFrame([(1, "b2")], "k long, vb string")
    view = a_old.join(b_old, "k")
    got = refresh_join_view(view, a_old, b_old, da, db, ["k"])
    want = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    assert got.count() == 4
    _assert_same_rows(got, want)


def test_streaming_foreachbatch_maintains_join_view(spark, tmp_path_factory):
    """Fact deltas arrive as micro-batches; each batch appends
    ΔA ⋈ dim to the stored view (static dim ⇒ the other delta terms
    vanish). After the stream drains, the accumulated view equals the
    one-shot join."""
    import shutil

    d = tmp_path_factory.mktemp("jv_stream")
    rows1 = [(k, f"o{k}") for k in range(6)]
    rows2 = [(k, f"p{k}") for k in range(3, 9)]
    spark.createDataFrame(rows1, "k long, payload string").coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(rows2, "k long, payload string").coalesce(1).write.parquet(
        str(d / "b2")
    )
    src = d / "src"
    src.mkdir()
    n = 0
    for sub in ("b1", "b2"):
        for f in sorted((d / sub).glob("*.parquet")):
            shutil.copy(f, src / f"{n:03d}.parquet")
            n += 1
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 8, 2)], "k long, attr string"
    )
    out_dir = str(d / "view")

    def apply_batch(da, batch_id):
        delta = join_view_delta(da.sparkSession.createDataFrame([], da.schema), dim, da, None, ["k"])
        if delta is not None:
            delta.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema("k long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(d / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    want = (
        spark.createDataFrame(rows1 + rows2, "k long, payload string").join(dim, "k")
    )
    _assert_same_rows(got.select("k", "payload", "attr"), want.select("k", "payload", "attr"))


def test_join_view_delta_shuffle_path_equivalent(spark):
    """broadcast_deltas=False (the catch-up path) must produce the same
    rows through shuffle joins, with no forced BroadcastExchange of
    the delta sides in the plan."""
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, va string")
    b = spark.createDataFrame([(1, "b1"), (3, "b3")], "k long, vb string")
    da = spark.createDataFrame([(3, "a3")], "k long, va string")
    db = spark.createDataFrame([(2, "b2")], "k long, vb string")
    from assignment_2_dataengineering_spark.streaming.view_maintain import (
        join_view_delta,
    )

    want = {
        tuple(r)
        for r in join_view_delta(a, b, da, db, ["k"]).collect()
    }
    got_df = join_view_delta(a, b, da, db, ["k"], broadcast_deltas=False)
    assert {tuple(r) for r in got_df.collect()} == want
