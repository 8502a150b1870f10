"""Incrementally-maintained CDC snapshot — the streaming form of
operators/relational.py apply_changelog, completing the maintenance
tier (sketch_maintain: approximate append-only; rollup_maintain: exact
additive; this: exact LAST-WRITE-WINS with deletes).

Semantics: the maintained table is the post-image of the changelog —
for each key, the change with the highest sequence number wins; a
winning delete removes the key from the readable snapshot. Two design
points make the maintained state equal the ONE-SHOT batch apply under
ANY batching of the stream (pinned in tests/test_cdc_maintain.py):

1. **Sequence guard, not arrival order.** The snapshot stores each
   key's applied sequence number; a batch's trailing change replaces
   the stored row only if its seq is HIGHER. Without this, a change
   delivered out of order across batch boundaries (late redelivery,
   source retries) would wrongly win by recency of arrival.
2. **Tombstones are rows, not absences.** A winning delete keeps
   (key, seq, deleted=true) in the table; `current_snapshot` filters
   it out. If deletes were dropped entirely, an older out-of-order
   upsert arriving later would resurrect the key. Tombstone retention
   is the standard compaction knob at scale — correctness first,
   retention policy second.

Publication reuses rollup_maintain's atomic version-pointer discipline:
data directory per batch + one JSON pointer carrying BOTH the current
version and the batch high-water mark, flipped with os.replace — state
and progress commit together, replays fold into dead directories.

At 100 TB the per-batch work is one keyed window over the (small)
batch + one key-partitioned merge join against the current version;
a bucketed table layout drops the snapshot-side exchange.

No reference analog (the reference's JDBC upsert, dashboard.py:277-307,
is insert-if-absent with no deletes or ordering); engine extension per
SURVEY §2.12.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .publish import (
    already_applied,
    committed_version_path,
    publish_version,
    read_meta as _read_meta,
)


def cdc_apply_batch(
    table_dir: str,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
):
    """Returns a foreachBatch worker maintaining the CDC snapshot under
    `table_dir`. Changelog rows carry key cols + value cols + a
    globally-unique monotone `seq_col` + `op_col` (upsert/delete)."""

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        meta = _read_meta(table_dir)
        if already_applied(table_dir, batch_id):
            return  # replayed batch — already applied
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        last = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__deleted", F.col(op_col) == delete_op)
            .drop(op_col)
        )
        if meta is not None:
            current = spark.read.parquet(os.path.join(table_dir, meta["version"]))
            # seq guard: per key, the higher-seq row wins regardless of
            # which side (stored state vs incoming batch) it came from
            merged = (
                current.unionByName(last)
                .withColumn(
                    "__rk",
                    F.row_number().over(
                        Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
                    ),
                )
                .filter(F.col("__rk") == 1)
                .drop("__rk")
            )
        else:
            merged = last
        publish_version(merged, table_dir, batch_id)

    return worker


def current_snapshot(spark, table_dir: str) -> DataFrame:
    """The readable post-image: resolves the pointer, reads one complete
    version, hides tombstones and maintenance columns."""
    meta = _read_meta(table_dir)
    if meta is None:
        raise FileNotFoundError(f"no published snapshot under {table_dir}")
    df = spark.read.parquet(os.path.join(table_dir, meta["version"]))
    return df.filter(~F.col("__deleted")).drop("__deleted")


def snapshot_at(spark, table_dir: str, batch_id: int) -> DataFrame:
    """Time travel: the post-image AS OF a given batch — every batch
    publishes an immutable `data_v{batch}` directory and the pointer
    only ever moves forward, so historical versions remain readable
    until a retention job removes them (the lakehouse time-travel
    contract, at one-pointer scale). Raises FileNotFoundError for a
    version that never COMMITTED — a data_v directory can exist
    without its pointer flip (crash mid-publish) and may be torn, so
    existence alone is not commit (publish.committed_version_path)."""
    df = spark.read.parquet(committed_version_path(table_dir, batch_id))
    return df.filter(~F.col("__deleted")).drop("__deleted")
