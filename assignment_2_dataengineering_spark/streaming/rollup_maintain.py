"""Incrementally-maintained EXACT rollup table — the materialized-view
pattern for additive aggregates, completing the maintenance tier:
sketch_maintain.py keeps approximate (HLL/CMS) summaries append-only;
this keeps exact (count/sum/min/max) summaries by read-merge-publish,
because exact aggregates are not append-only — each batch must fold
into the running totals.

Publication is ATOMIC: each batch writes a new versioned directory
(`data_v{batch_id}`) and then flips a JSON pointer file; readers resolve
the pointer first, so they always see a complete version, never a
half-written one (the same swap discipline a lakehouse commit log
provides, reduced to one pointer because there is one writer). Replays
are no-ops via the batch high-water mark, which rides in the SAME
pointer file as the version flip — state and progress commit together,
so a crash between "data written" and "pointer flipped" replays the
batch into a dead directory and publishes nothing twice.

Additivity is the correctness core: count and sum fold by +, min/max by
min/max — all associative+commutative, so any batch partitioning of the
stream folds to the one-shot answer (pinned in
tests/test_rollup_maintain.py; sums to FP tolerance since fold order
differs, count/min/max exactly).

No reference analog (the reference recomputes its dashboard aggregates
from the 5000-event buffer every 3 s); engine extension per SURVEY §2.12.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .publish import already_applied, publish_version, read_meta as _read_meta


def incremental_rollup_batch(
    table_dir: str,
    group_cols: list[str] | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
):
    """Returns a (batch_df, batch_id) foreachBatch worker maintaining
    the exact (group × day) rollup under `table_dir`."""
    group_cols = list(group_cols or ["event_type"])

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_meta(table_dir)
        if already_applied(table_dir, batch_id):
            return  # replayed batch — already folded
        spark = batch_df.sparkSession
        delta = (
            batch_df.withColumn("day", F.to_date(ts_col))
            .groupBy(*group_cols, "day")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(value_col).alias("sum_value"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value"),
            )
        )
        if meta is not None:
            current = spark.read.parquet(os.path.join(table_dir, meta["version"]))
            delta = (
                current.unionByName(delta)
                .groupBy(*group_cols, "day")
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        publish_version(delta, table_dir, batch_id)

    return worker


def current_rollup(spark, table_dir: str) -> DataFrame:
    """The published rollup — resolves the pointer, reads one complete
    version. Derived metrics (mean) belong here, at read time."""
    meta = _read_meta(table_dir)
    if meta is None:
        raise FileNotFoundError(f"no published rollup under {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, meta["version"])).withColumn(
        "avg_value", F.col("sum_value") / F.col("n_rows")
    )
