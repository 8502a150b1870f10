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

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_META = "_current.json"


def _read_meta(table_dir: str) -> dict | None:
    p = os.path.join(table_dir, _META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


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
        if meta is not None and batch_id <= meta["last_batch"]:
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
        version = f"data_v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(table_dir, version))
        tmp = os.path.join(table_dir, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"last_batch": batch_id, "version": version}, f)
        os.replace(tmp, os.path.join(table_dir, _META))

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
    version that never committed."""
    import os

    p = os.path.join(table_dir, f"data_v{batch_id}")
    if not os.path.isdir(p):
        raise FileNotFoundError(f"no committed version data_v{batch_id} under {table_dir}")
    df = spark.read.parquet(p)
    return df.filter(~F.col("__deleted")).drop("__deleted")
