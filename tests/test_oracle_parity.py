"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names,
and order-insensitive values (after per-cell normalization).

This is the same comparison shape the driver applies at sf=0.01
(CORRECTNESS_r{N}.json), run here at sf0.001 for speed.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pytest

from assignment_2_dataengineering_spark.plans.registry import all_specs


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and residual representation noise
        return f"{v + 0.0:.6f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in idx) for r in rows)


ORACLE_SPECS = [s for s in all_specs().values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in all_specs().values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spec, spark, duck, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{spec.name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{spec.name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _norm_rows(spark_cols, spark_rows)
    d_norm = _norm_rows(duck_cols, duck_rows)
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mism, f"{spec.name}: {len(mism)} value mismatches; first: {mism[0]}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spec, spark, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    assert sdf.columns  # stable schema
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
