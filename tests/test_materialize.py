"""The round-11 materialization chokepoint: both policy forms must be
value-neutral (they change where the plan is cut, never what a consumer
computes), the env dial must fail loudly on junk, and the q_psi_drift
tier gate must flip exactly at its documented threshold."""

from __future__ import annotations

import pytest

from assignment_2_dataengineering_spark.operators.materialize import (
    MAT_DISK_PERSIST_MIN_BYTES,
    materialize,
    select_materialize_mode,
)
from assignment_2_dataengineering_spark.plans.queries_analytic import (
    PSI_MATERIALIZE_MIN_BYTES,
    select_psi_materialization,
)


def _base(spark):
    return spark.range(100).selectExpr("id", "id % 7 AS k")


def test_local_checkpoint_and_disk_persist_are_value_identical(
    spark, monkeypatch
):
    expected = sorted(map(tuple, _base(spark).collect()))
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    lc = materialize(_base(spark))
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "disk_persist")
    dp = materialize(_base(spark))
    try:
        assert sorted(map(tuple, lc.collect())) == expected
        assert sorted(map(tuple, dp.collect())) == expected
        # downstream consumers see the same aggregates through either cut
        assert (
            lc.groupBy("k").count().collect()
            == dp.groupBy("k").count().collect()
        )
    finally:
        dp.unpersist()


def test_unknown_mode_fails_loudly(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "replicated_checkpoint")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        materialize(_base(spark))


def test_materialize_mode_selector_boundary():
    # local_checkpoint strictly below the documented threshold,
    # disk_persist at it
    assert (
        select_materialize_mode(MAT_DISK_PERSIST_MIN_BYTES - 1)
        == "local_checkpoint"
    )
    assert select_materialize_mode(MAT_DISK_PERSIST_MIN_BYTES) == "disk_persist"
    # the measured calibration envelopes fall on the right sides:
    # every sf0.1 site estimate was <= 1.5e6, every sf10 site >= 2.9e7
    assert select_materialize_mode(1_500_000) == "local_checkpoint"
    assert select_materialize_mode(29_000_000) == "disk_persist"


def test_per_site_prefer_beats_auto_but_not_env(spark, monkeypatch):
    from pyspark.sql import DataFrame

    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    # prefer pins the form regardless of the selector...
    lc = materialize(_base(spark), prefer="local_checkpoint")
    assert lc.storageLevel.useMemory is False and not lc.storageLevel.useDisk
    # ...but the explicit env override still wins over prefer
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "disk_persist")
    dp = materialize(_base(spark), prefer="local_checkpoint")
    try:
        assert dp.storageLevel.useDisk and not dp.storageLevel.useMemory
        assert isinstance(dp, DataFrame)
    finally:
        dp.unpersist()


def test_psi_both_gate_forms_value_identical(spark, sf_dir, monkeypatch):
    """The q_psi_drift tier gate changes the plan only: forcing the
    materialized form at the lazy tier must produce exactly the lazy
    form's rows (the r10 exact-match A/B, pinned as a boundary test)."""
    from assignment_2_dataengineering_spark.plans import queries_analytic as qa
    from assignment_2_dataengineering_spark.plans.registry import get_spec

    spec = get_spec("q_psi_drift")
    lazy = spec.fn(spark, sf_dir).collect()
    monkeypatch.setattr(qa, "select_psi_materialization", lambda est: True)
    mat = spec.fn(spark, sf_dir).collect()
    assert sorted(map(tuple, lazy)) == sorted(map(tuple, mat))


def test_psi_gate_boundary():
    # lazy strictly below the documented threshold, materialized at it
    assert select_psi_materialization(PSI_MATERIALIZE_MIN_BYTES - 1) is False
    assert select_psi_materialization(PSI_MATERIALIZE_MIN_BYTES) is True
    # the measured calibration points fall on the right sides
    assert select_psi_materialization(1_125_169) is False  # sf0.1 plan stat
    assert select_psi_materialization(108_053_139) is True  # sf10 plan stat
