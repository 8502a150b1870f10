"""Invariants for the mergeable HLL distinct-count tier
(operators/sketch.py): estimate accuracy against exact distincts, and
the property that makes sketches worth persisting — unioning
fine-grained sketches gives the same answer as sketching the coarse
grain directly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from assignment_2_dataengineering_spark.operators.sketch import (
    rollup_sketch,
    sketch_distinct,
)
from assignment_2_dataengineering_spark.sources.tables import load_table

REL_ERR = 0.05  # lg_k=12 → ~1.6% standard error; 5% is a ≥3-sigma bound


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_rollup_estimate_within_error_of_exact(events):
    daily = sketch_distinct(events, ["event_type", "day"], "user_id")
    est = {
        r["event_type"]: r["n"]
        for r in rollup_sketch(daily, ["event_type"], "n").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n_exact in exact.items():
        assert abs(est[k] - n_exact) <= max(2, REL_ERR * n_exact), (
            k,
            est[k],
            n_exact,
        )


def test_union_of_fine_sketches_equals_direct_coarse_sketch(events):
    # The mergeability contract: rollup(day-grain sketches) must agree
    # with sketching the coarse grain in one pass — same algorithm,
    # same lg_k, associative union.
    via_days = rollup_sketch(
        sketch_distinct(events, ["event_type", "day"], "user_id"),
        ["event_type"],
        "n",
    )
    direct = rollup_sketch(
        sketch_distinct(events, ["event_type"], "user_id"), ["event_type"], "n"
    )
    a = {r["event_type"]: r["n"] for r in via_days.collect()}
    b = {r["event_type"]: r["n"] for r in direct.collect()}
    assert a == b


def test_global_rollup_reuses_group_sketches(events):
    # One more union level: global distinct users from the same daily
    # sketch table, no event rescans.
    daily = sketch_distinct(events, ["event_type", "day"], "user_id")
    est = rollup_sketch(daily.withColumn("__all", F.lit(1)), ["__all"], "n").collect()[0]["n"]
    exact = events.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(est - exact) <= max(2, REL_ERR * exact)
