"""Invariants for the mergeable count-min-sketch frequency tier
(operators/sketch.py): the one-sided CMS error contract against exact
counts, and the property that makes the day-grain sketch table worth
persisting — the numpy union of fine sketches is BIT-IDENTICAL to
sketching the coarse grain in one pass (same seed ⇒ same hash rows ⇒
additive counters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from assignment_2_dataengineering_spark.operators.sketch import (
    estimate_freq,
    rollup_freq,
    sketch_freq,
)
from assignment_2_dataengineering_spark.sources.tables import load_table

EPS = 0.005  # width ≈ e/eps ≈ 544; over-count ≤ eps·N w.p. ≥ 0.99


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_estimates_bound_exact_counts(spark, events):
    daily = sketch_freq(events, ["event_type", "day"], "user_id", eps=EPS)
    merged = rollup_freq(daily, ["event_type"])
    users = list(range(10))
    est = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in estimate_freq(
            spark, merged, users, ["event_type"], "user_id", "n"
        ).collect()
    }
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in events.filter(F.col("user_id") < 10)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for (etype, uid), e in est.items():
        true = exact.get((etype, uid), 0)
        assert e >= true, ((etype, uid), e, true)
        assert e <= true + EPS * totals[etype] + 1, ((etype, uid), e, true)


def test_union_of_fine_sketches_is_bit_identical_to_direct(events):
    via_days = rollup_freq(
        sketch_freq(events, ["event_type", "day"], "user_id", eps=EPS),
        ["event_type"],
    )
    direct = sketch_freq(events, ["event_type"], "user_id", eps=EPS)
    a = {r["event_type"]: bytes(r["cms"]) for r in via_days.collect()}
    b = {r["event_type"]: bytes(r["cms"]) for r in direct.collect()}
    assert a == b


def test_incompatible_shapes_refused(spark, events):
    from assignment_2_dataengineering_spark.operators.sketch import _merge_cms_blobs

    a = sketch_freq(events, ["event_type"], "user_id", eps=EPS).collect()[0]["cms"]
    b = sketch_freq(events, ["event_type"], "user_id", eps=EPS / 5).collect()[0]["cms"]
    with pytest.raises(ValueError):
        _merge_cms_blobs([bytes(a), bytes(b)])
