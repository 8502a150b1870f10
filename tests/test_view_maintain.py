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
