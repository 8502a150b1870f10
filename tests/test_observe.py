"""Observation metrics: exact one-pass quality counters that ride the
action already being run — verified against explicit second-pass
aggregation on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.observe import with_quality_observation
from assignment_2_dataengineering_spark.sources.tables import load_table


def test_observation_matches_second_pass(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -3.0, None),
        (3, None, "c"),
        (4, -1.0, None),
        (5, 7.5, "e"),
    ]
    df = spark.createDataFrame(rows, "id long, value double, tag string")
    observed, obs = with_quality_observation(
        df,
        not_null=["value", "tag"],
        non_negative=["value"],
        extra={"sum_value": F.round(F.sum("value"), 2)},
    )
    # the metric rides the consuming action — here a filter+count that
    # still scans every row
    assert observed.count() == 5
    got = obs.get
    assert got["n_rows"] == 5
    assert got["null_value"] == 1
    assert got["null_tag"] == 2
    assert got["neg_value"] == 2
    assert got["sum_value"] == 13.5


def test_observation_on_real_table_pipeline(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    observed, obs = with_quality_observation(ev, not_null=["ts", "user_id"], non_negative=["value"])
    # downstream aggregation consumes all rows; no second scan happens
    n_types = observed.select("event_type").distinct().count()
    assert n_types >= 1
    got = obs.get
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_value"),
    ).first()
    assert got["n_rows"] == want["n"]
    assert got["null_ts"] == want["null_ts"]
    assert got["neg_value"] == want["neg_value"]


def test_kanonymity_audit_flags_exactly_the_small_classes(spark):
    from assignment_2_dataengineering_spark.operators.observe import kanonymity_audit

    rows = [("a", "x")] * 7 + [("a", "y")] * 3 + [("b", "x")] * 1 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    out = {(r.q1, r.q2): r.class_size for r in kanonymity_audit(df, ["q1", "q2"], k=5).collect()}
    assert out == {("a", "y"): 3, ("b", "x"): 1}
    # suppressing the flagged classes leaves a k-anonymous release
    survivors = df.join(
        kanonymity_audit(df, ["q1", "q2"], k=5), ["q1", "q2"], "left_anti"
    )
    sizes = [r.n for r in survivors.groupBy("q1", "q2").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sizes and all(s >= 5 for s in sizes)


def test_dq_report_flags_planted_violations(spark):
    from assignment_2_dataengineering_spark.operators.observe import dq_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 3.0), (3, None)], "id long, v double"
    )
    one = F.count(F.lit(1)).alias("n_violations")
    checks = {
        "v_not_null": df.filter(F.col("v").isNull()).agg(one),
        "v_non_negative": df.filter(F.col("v") < 0).agg(one),
        "id_unique": df.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_violations")),
    }
    got = {r.constraint: (r.n_violations, r.status) for r in dq_report(checks).collect()}
    assert got == {
        "id_unique": (1, "FAIL"),
        "v_non_negative": (1, "FAIL"),
        "v_not_null": (1, "FAIL"),
    }
    clean = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    checks2 = {"v_not_null": clean.filter(F.col("v").isNull()).agg(one)}
    assert dq_report(checks2).collect()[0].status == "PASS"


def test_quality_observation_zero_rows_reports_zero_not_null(spark):
    """sum(when) over zero rows is NULL; the counters must come back 0
    on an empty observed plan or `== 0` quality gates break."""
    from assignment_2_dataengineering_spark.operators.observe import (
        with_quality_observation,
    )

    df = spark.createDataFrame([], "ts timestamp, value double").filter(F.lit(False))
    observed, obs = with_quality_observation(
        df, not_null=["ts"], non_negative=["value"]
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 0
    assert got["null_ts"] == 0
    assert got["neg_value"] == 0


def test_dq_report_null_violation_count_is_pass_and_empty_rejected(spark):
    """A sum-shaped check over zero rows yields NULL — that is zero
    violations (PASS), not FAIL-with-NULL; an empty checks dict raises
    instead of IndexError."""
    import pytest as _pytest

    from assignment_2_dataengineering_spark.operators.observe import dq_report

    empty = spark.createDataFrame([], "x long").agg(
        F.sum("x").alias("n_violations")
    )
    rows = dq_report({"sum_over_empty": empty}).collect()
    assert [(r["constraint"], r["n_violations"], r["status"]) for r in rows] == [
        ("sum_over_empty", 0, "PASS")
    ]
    with _pytest.raises(ValueError):
        dq_report({})
