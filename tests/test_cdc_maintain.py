"""Incremental CDC snapshot maintenance (streaming/cdc_maintain.py):
the maintained post-image must equal the one-shot batch apply_changelog
under any batching — including out-of-order delivery across batch
boundaries — and replays must be no-ops."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.relational import apply_changelog
from assignment_2_dataengineering_spark.streaming.cdc_maintain import (
    cdc_apply_batch,
    current_snapshot,
)

SCHEMA = "k long, v string, seq long, op string"

CHANGES = [
    # (k, v, seq, op)
    (1, "a1", 1, "U"),
    (2, "b1", 2, "U"),
    (3, "c1", 3, "U"),
    (1, "a2", 5, "U"),
    (2, None, 6, "D"),
    (4, "d1", 7, "U"),
    (3, "c2", 9, "U"),
    (4, None, 10, "D"),
    (5, "e1", 11, "U"),
]


def _one_shot(spark, changes):
    empty = spark.createDataFrame([], "k long, v string")
    chg = spark.createDataFrame(changes, SCHEMA)
    out = apply_changelog(empty, chg, keys=["k"], order=["seq"])
    return {r.k: r.v for r in out.collect()}


def _run_batches(spark, table_dir, batches):
    worker = cdc_apply_batch(str(table_dir), keys=["k"])
    for i, rows in enumerate(batches):
        worker(spark.createDataFrame(rows, SCHEMA), i)


def _snap(spark, table_dir):
    df = current_snapshot(spark, str(table_dir)).select("k", "v")
    return {r.k: r.v for r in df.collect()}


def test_maintained_equals_oneshot_in_order(spark, tmp_path):
    batches = [CHANGES[:3], CHANGES[3:6], CHANGES[6:]]
    _run_batches(spark, tmp_path, batches)
    assert _snap(spark, tmp_path) == _one_shot(spark, CHANGES)


def test_out_of_order_across_batches_seq_guard(spark, tmp_path):
    """A later batch delivering EARLIER-seq changes (redelivery, source
    retry) must not win: the stored seq guards the merge. Includes the
    tombstone case — an old upsert for a deleted key must NOT
    resurrect it."""
    batches = [
        [(1, "a2", 5, "U"), (2, None, 6, "D"), (3, "c2", 9, "U")],
        # stale changes arriving late: older upsert for 1, older upsert
        # for deleted 2, older value for 3, plus a genuinely new key
        [(1, "a1", 1, "U"), (2, "b1", 2, "U"), (3, "c1", 3, "U"), (5, "e1", 11, "U")],
    ]
    _run_batches(spark, tmp_path, batches)
    flat = [c for b in batches for c in b]
    assert _snap(spark, tmp_path) == _one_shot(spark, flat)
    assert 2 not in _snap(spark, tmp_path)  # tombstone held


def test_replayed_batch_is_noop(spark, tmp_path):
    worker = cdc_apply_batch(str(tmp_path), keys=["k"])
    b0 = spark.createDataFrame(CHANGES[:5], SCHEMA)
    worker(b0, 0)
    before = _snap(spark, tmp_path)
    worker(b0, 0)  # foreachBatch redelivery after a crash
    assert _snap(spark, tmp_path) == before
    meta = json.load(open(tmp_path / "_current.json"))
    assert meta["last_batch"] == 0


def test_publication_is_versioned_and_atomic(spark, tmp_path):
    _run_batches(spark, tmp_path, [CHANGES[:5], CHANGES[5:]])
    meta = json.load(open(tmp_path / "_current.json"))
    assert meta == {"last_batch": 1, "version": "data_v1"}
    # the previous version remains a complete readable directory
    assert (tmp_path / "data_v0").exists()
    old = spark.read.parquet(str(tmp_path / "data_v0"))
    assert old.count() > 0


def test_streaming_end_to_end_with_foreachbatch(spark, tmp_path):
    """Drive the worker from a real readStream over chunked JSONL files
    (availableNow): maintained snapshot ≡ one-shot apply over all
    lines."""
    src = tmp_path / "chg"
    src.mkdir()
    for i, chunk in enumerate([CHANGES[:3], CHANGES[3:6], CHANGES[6:]]):
        with open(src / f"part-{i:04d}.jsonl", "w") as f:
            for k, v, seq, op in chunk:
                f.write(json.dumps({"k": k, "v": v, "seq": seq, "op": op}) + "\n")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    table = tmp_path / "table"
    q = (
        stream.writeStream.foreachBatch(cdc_apply_batch(str(table), keys=["k"]))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    assert _snap(spark, table) == _one_shot(spark, CHANGES)


def test_time_travel_reads_historical_post_images(spark, tmp_path):
    """snapshot_at: each committed batch's post-image stays readable —
    version directories are immutable once the pointer moves on."""
    from assignment_2_dataengineering_spark.streaming.cdc_maintain import snapshot_at

    batches = [CHANGES[:3], CHANGES[3:6], CHANGES[6:]]
    _run_batches(spark, tmp_path, batches)
    for i in range(3):
        flat = [c for b in batches[: i + 1] for c in b]
        got = {r.k: r.v for r in snapshot_at(spark, str(tmp_path), i).select("k", "v").collect()}
        assert got == _one_shot(spark, flat), f"batch {i}"
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        snapshot_at(spark, str(tmp_path), 99)


def test_snapshot_at_refuses_uncommitted_version(spark, tmp_path):
    """A data_v{N} directory without its pointer flip (crash
    mid-publish) must NOT be served as time travel — existence alone
    is not commit."""
    import os

    import pytest as _pytest

    from assignment_2_dataengineering_spark.streaming.cdc_maintain import (
        cdc_apply_batch,
        snapshot_at,
    )

    d = str(tmp_path / "cdc")
    worker = cdc_apply_batch(d, ["k"])
    worker(
        spark.createDataFrame([(1, "x", 1, "U")], "k long, v string, seq long, op string"),
        0,
    )
    # simulate a crash mid-publish of batch 1: directory exists,
    # pointer never flipped
    os.makedirs(os.path.join(d, "data_v1"), exist_ok=True)
    spark.createDataFrame(
        [(9, "torn", 9, False)], "k long, v string, seq long, __deleted boolean"
    ).write.mode("overwrite").parquet(os.path.join(d, "data_v1"))
    assert snapshot_at(spark, d, 0).count() == 1  # committed version fine
    with _pytest.raises(FileNotFoundError):
        snapshot_at(spark, d, 1)
