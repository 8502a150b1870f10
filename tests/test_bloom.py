"""Bloom membership-sketch tier invariants (operators/sketch.py
sketch_bloom / rollup_bloom / member_bloom), cited from
plans/queries_scale.py q_bloom_membership: no false negatives, merge ≡
one-shot bit-identical, bounded false-positive rate, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.sketch import (
    member_bloom,
    rollup_bloom,
    sketch_bloom,
)
from assignment_2_dataengineering_spark.sources.tables import load_table

M, K = 8192, 5


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
        .cache()
    )


def test_no_false_negatives(spark, events):
    """Every (event_type, user_id) actually present must probe true."""
    sk = sketch_bloom(events, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    present = events.select("event_type", "user_id").distinct()
    res = member_bloom(present, sk, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    assert res.count() == present.count()
    assert res.filter(~F.col("maybe_present")).count() == 0


def test_rollup_bit_identical_to_oneshot(spark, events):
    """bit_or is associative: merging day-grain sketches to event_type
    grain must produce byte-for-byte the same words as sketching at
    event_type grain directly."""
    fine = sketch_bloom(events, ["event_type", "day"], "user_id", m_bits=M, k_hashes=K)
    merged = rollup_bloom(fine, ["event_type"])
    oneshot = sketch_bloom(events, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    a = {(r.event_type, r.word_idx): r.word for r in merged.collect()}
    b = {(r.event_type, r.word_idx): r.word for r in oneshot.collect()}
    assert a == b


def test_false_positive_rate_bounded(spark, events):
    """Probe 2000 user_ids guaranteed absent (beyond the id domain):
    the observed FP rate must stay within ~3x of the analytic
    (1 - e^(-kn/m))^k bound for the largest group."""
    import math

    sk = sketch_bloom(events, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    n_max = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    bound = (1.0 - math.exp(-K * n_max / M)) ** K
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    absent = spark.range(10_000_000, 10_002_000).select(
        F.col("id").alias("user_id")
    )
    probes = absent.crossJoin(spark.createDataFrame([(t,) for t in types], ["event_type"]))
    res = member_bloom(probes, sk, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    fp = res.filter(F.col("maybe_present")).count() / res.count()
    assert fp <= max(3.0 * bound, 0.02)


def test_deterministic_and_sparse(spark, events):
    sk1 = sketch_bloom(events, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    sk2 = sketch_bloom(events, ["event_type"], "user_id", m_bits=M, k_hashes=K)
    a = sorted(map(tuple, sk1.collect()))
    assert a == sorted(map(tuple, sk2.collect()))
    # only set words are stored: never more than m/64 rows per group
    per_group = sk1.groupBy("event_type").count().collect()
    assert all(r["count"] <= M // 64 for r in per_group)
