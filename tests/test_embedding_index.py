"""Incremental streaming embedding near-dup index: cross-batch
detection, replay idempotence, and the headline equivalence — the
incremental worker over any batch partitioning of a vector corpus finds
exactly the pairs a one-shot embedding_near_dupes run finds on the full
corpus (same banding code, same cosine verify)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.similarity import (
    embedding_near_dupes,
)
from assignment_2_dataengineering_spark.streaming.embedding_index import (
    incremental_embedding_near_dup_batch,
)

PARAMS = dict(dim=64, n_planes=16, bands=8, seed=42, threshold=0.35)


def _vectors(spark, sf_dir):
    from assignment_2_dataengineering_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _pairs(spark, index_dir):
    p = os.path.join(index_dir, "pairs")
    if not os.path.exists(p):
        return set()
    return {(r["id_a"], r["id_b"]) for r in spark.read.parquet(p).collect()}


def test_incremental_equals_one_shot_batch(spark, sf_dir, tmp_path):
    """Three arbitrary batches of the embeddings table through the
    worker == one-shot embedding_near_dupes on the full table. A pair
    is found in the batch where its LATER member arrives, so the union
    over batches must be exactly the batch-operator pair set."""
    vecs = _vectors(spark, sf_dir)
    index_dir = str(tmp_path / "embidx")
    worker = incremental_embedding_near_dup_batch(
        index_dir, max_bucket_size=None, **PARAMS
    )
    for bid, pred in enumerate(
        [F.col("vec_id") % 3 == 0, F.col("vec_id") % 3 == 1, F.col("vec_id") % 3 == 2]
    ):
        worker(vecs.filter(pred), bid)

    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dupes(vecs, **PARAMS).collect()
    }
    assert _pairs(spark, index_dir) == want
    assert want, "fixture must produce at least one near-dup pair"
    # vector store holds the full corpus exactly once
    n = spark.read.parquet(os.path.join(index_dir, "vecs")).count()
    assert n == vecs.count()


def test_replayed_batch_is_noop(spark, sf_dir, tmp_path):
    """foreachBatch redelivery: re-running an already-applied batch_id
    must change neither the pairs log nor the index state."""
    vecs = _vectors(spark, sf_dir)
    index_dir = str(tmp_path / "embidx2")
    worker = incremental_embedding_near_dup_batch(
        index_dir, max_bucket_size=None, **PARAMS
    )
    b0 = vecs.filter(F.col("vec_id") % 2 == 0)
    b1 = vecs.filter(F.col("vec_id") % 2 == 1)
    worker(b0, 0)
    worker(b1, 1)
    before = _pairs(spark, index_dir)
    n_before = spark.read.parquet(os.path.join(index_dir, "vecs")).count()
    worker(b1, 1)  # replay
    worker(b0, 0)  # out-of-order replay
    assert _pairs(spark, index_dir) == before
    assert spark.read.parquet(os.path.join(index_dir, "vecs")).count() == n_before
    with open(os.path.join(index_dir, "_last_batch.json")) as f:
        assert json.load(f)["last_batch"] == 1


def test_streaming_foreachbatch_end_to_end(spark, sf_dir, tmp_path):
    """Drive the worker from a real streaming query: parquet chunk
    files → readStream → foreachBatch(worker) — end state equals the
    one-shot batch run."""
    vecs = _vectors(spark, sf_dir)
    src = tmp_path / "vec_stream"
    src.mkdir()
    for bid in range(3):
        vecs.filter(F.col("vec_id") % 3 == bid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{bid}"))
    n = 0
    import shutil

    flat = tmp_path / "src_flat"
    flat.mkdir()
    for bid in range(3):
        for fn in sorted((src / f"b{bid}").glob("*.parquet")):
            shutil.copy(fn, flat / f"{n:03d}.parquet")
            n += 1

    index_dir = str(tmp_path / "embidx3")
    worker = incremental_embedding_near_dup_batch(
        index_dir, max_bucket_size=None, **PARAMS
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        stream.writeStream.foreachBatch(worker)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dupes(vecs, **PARAMS).collect()
    }
    assert _pairs(spark, index_dir) == want


def test_crash_before_hwm_commit_then_redelivery_is_clean(spark, sf_dir, tmp_path):
    """Crash window: outputs written, HWM not committed (meta deleted).
    Redelivery overwrites batch-scoped partitions — no double-append in
    pairs, vecs, or buckets."""
    vecs = _vectors(spark, sf_dir)
    index_dir = str(tmp_path / "embidx4")
    worker = incremental_embedding_near_dup_batch(
        index_dir, max_bucket_size=None, **PARAMS
    )
    b0 = vecs.filter(F.col("vec_id") % 2 == 0)
    b1 = vecs.filter(F.col("vec_id") % 2 == 1)
    worker(b0, 0)
    worker(b1, 1)
    before = _pairs(spark, index_dir)
    n_vecs = spark.read.parquet(os.path.join(index_dir, "vecs")).count()
    os.remove(os.path.join(index_dir, "_last_batch.json"))  # "crash"
    worker(b1, 1)  # redelivery
    assert _pairs(spark, index_dir) == before
    assert spark.read.parquet(os.path.join(index_dir, "vecs")).count() == n_vecs
