"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

This is the 100 TB pre-aggregation pattern approx_count_distinct alone
cannot give you: approx_count_distinct yields a NUMBER, which cannot be
re-aggregated across dimensions (distinct counts don't add). A SKETCH
column is mergeable — materialize fine-grained sketches once (per key ×
day), persist them as a tiny rollup table, and answer any coarser
distinct-count question by unioning sketches, never rescanning the
fact table. The fact scan is paid once; every subsequent rollup reads
kilobytes.

No reference analog (the reference counts exact distinct in pandas);
engine extension per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct `value_col` values.

    One shuffle on group_cols with map-side partial sketches (each
    partition ships a ≤2^lg_k-byte sketch, not its values). The output
    `sketch` binary column is the persistable artifact: write it
    partitioned by the finest grouping and every coarser rollup comes
    from `rollup_sketch` without touching the source again."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def rollup_sketch(
    sketches: DataFrame,
    group_cols: list[str],
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Merge fine-grained sketches up to `group_cols` and estimate.

    hll_union_agg is associative and commutative — the rollup is a
    plain hash aggregate over kilobyte blobs; lgK is carried inside
    the sketch so unions stay consistent. The estimate lands within
    HLL's standard relative error (~1.04/sqrt(2^lg_k), ≈1.6% at
    lg_k=12) of the exact distinct count (pinned in
    tests/test_sketch.py)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(estimate_col)
    )
