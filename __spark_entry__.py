"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 plus the
                training-data-pipeline extensions, one callable each.
oracle_sql()  — matching DuckDB SQL per query (omitted only for the
                randomized-banding ops, which get rows-only checks).

The implementations live in assignment_2_dataengineering_spark.plans;
this module is a thin adapter over its registry so the Spark plan and
its oracle can never drift (they are registered together).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from assignment_2_dataengineering_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the A1 rollup (reference extractor.py:242-246
    re-expressed as the TPC-H-Q1-shaped group-agg) on sf0.001."""
    spec = registry.get_spec("q_groupby_sum")
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.query_map()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_map()
