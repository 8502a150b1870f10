"""Incremental sketch-table maintenance — the streaming tier feeding
the mergeable-sketch tier (operators/sketch.py): events arrive in
micro-batches and each batch appends its own (event_type, day) HLL +
CMS partial sketches to a persisted table. Nothing is read-modify-
written: sketches are mergeable, so maintenance is append-only and any
later question (distinct users, user frequencies, at any grain coarser
than the stored one) is answered by unioning stored blobs — the fact
stream is touched exactly once, when it flows past.

Exactly-once: foreachBatch re-runs batches after failures; the worker
records a batch high-water mark and turns replays into no-ops (same
idempotence contract as streaming/dedup_index.py). State growth is the
sketch table itself — kilobytes per (group × batch), compactable with
io.compact_parquet; correctness of compaction is the associativity the
tier already pins (union of partials ≡ one-shot, tests/test_cms.py,
test_sketch.py, test_sketch_maintain.py).

No reference analog (the reference counts inside its 5000-event buffer
and forgets); engine extension per SURVEY.md §2.12.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .publish import HWM_NAME as _META
from .publish import already_applied, commit_meta


def incremental_sketch_batch(
    table_dir: str,
    group_cols: list[str] | None = None,
    value_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
    eps: float = 0.005,
    confidence: float = 0.99,
    seed: int = 42,
):
    """Returns a (batch_df, batch_id) foreachBatch worker that appends
    per-batch (group × day) HLL and CMS partial sketches to
    `table_dir`. One aggregate per batch computes BOTH sketch kinds —
    a single shuffle on the storage grain."""
    group_cols = list(group_cols or ["event_type"])

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        if already_applied(table_dir, batch_id, name=_META):
            return  # replayed batch — already applied
        sketches = (
            batch_df.withColumn("day", F.to_date(ts_col))
            .groupBy(*group_cols, "day")
            .agg(
                F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll"),
                F.count_min_sketch(
                    F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
                ).alias("cms"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        # batch-scoped partition OVERWRITE, not append: CMS counters
        # SUM on merge, so the crash window between an append and the
        # high-water-mark commit would double-count the redelivered
        # batch permanently (round-4 review finding); overwriting
        # batch_id={N} replaces partial output instead
        sketches.write.mode("overwrite").parquet(
            os.path.join(table_dir, "sketches", f"batch_id={batch_id}")
        )
        commit_meta(table_dir, {"last_batch": batch_id}, name=_META)

    return worker


def maintained_distinct(spark, table_dir: str, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimates at any grain ≥ the stored one, from the
    maintained table only (no fact rescan): hll_union_agg over however
    many per-batch partials accumulated."""
    df = spark.read.parquet(os.path.join(table_dir, "sketches"))
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll")))
        .cast("long")
        .alias("n_distinct")
    )


def maintained_freq(spark, table_dir: str, group_cols: list[str]) -> DataFrame:
    """Merged CMS blobs at any grain ≥ the stored one — feed to
    operators/sketch.estimate_freq for point estimates."""
    from ..operators.sketch import rollup_freq

    df = spark.read.parquet(os.path.join(table_dir, "sketches")).select(
        *group_cols, "cms"
    )
    return rollup_freq(df, group_cols)
