"""Incremental streaming near-dup index: cross-batch detection, replay
idempotence, and the headline equivalence — incrementally processing
any batch partitioning of a corpus finds exactly the pairs a one-shot
batch LSH run finds on the full corpus."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.dedup import minhash_lsh_pairs
from assignment_2_dataengineering_spark.streaming.dedup_index import (
    incremental_near_dup_batch,
)

_B1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
_B12 = "red orange yellow green blue indigo violet pink black white silver gold bronze copper iron tin"
_B2 = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
DOCS = {
    1: _B1,
    2: _B2,
    3: _B1.replace("pi", "rho"),  # ~1
    11: _B1.replace("omicron pi", "omicron sigma"),  # ~1, ~3 (cross-batch)
    12: _B12,
    21: _B2,  # == 2 (cross-batch exact)
    22: "completely different words with no overlap at all here now and forever more in this test",
    23: _B12.replace("tin", "zinc"),  # ~12 (cross-batch)
}
BATCHES = [[1, 2, 3], [11, 12], [21, 22, 23]]
PARAMS = dict(n=3, num_hashes=32, bands=8, threshold=0.3, seed=42)


def _mkdf(spark, ids):
    return spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], "doc_id long, text string"
    )


def _pairs(spark, index_dir):
    p = os.path.join(index_dir, "pairs")
    if not os.path.exists(p):
        return set()
    return {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(p).collect()
    }


def test_incremental_matches_one_shot_batch(spark, tmp_path):
    index_dir = str(tmp_path / "ndidx")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    for bid, ids in enumerate(BATCHES):
        worker(_mkdf(spark, ids), bid)

    got = _pairs(spark, index_dir)
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            _mkdf(spark, list(DOCS)), **PARAMS
        ).collect()
    }
    assert got == want
    # sanity on content: the engineered relations are all present
    assert {(1, 3), (1, 11), (3, 11), (2, 21), (12, 23)} <= got


def test_cross_batch_pairs_found_at_arrival(spark, tmp_path):
    index_dir = str(tmp_path / "ndidx2")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    worker(_mkdf(spark, BATCHES[0]), 0)
    after0 = _pairs(spark, index_dir)
    assert (1, 3) in after0 and not any(11 in p for p in after0)
    worker(_mkdf(spark, BATCHES[1]), 1)
    after1 = _pairs(spark, index_dir)
    assert (1, 11) in after1 and (3, 11) in after1


def test_replayed_batch_is_noop(spark, tmp_path):
    index_dir = str(tmp_path / "ndidx3")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    worker(_mkdf(spark, BATCHES[0]), 0)
    worker(_mkdf(spark, BATCHES[1]), 1)
    n_pairs = len(_pairs(spark, index_dir))
    n_docs = spark.read.parquet(os.path.join(index_dir, "docs")).count()
    # failure-replay of batch 1: same id, must change nothing
    worker(_mkdf(spark, BATCHES[1]), 1)
    assert len(_pairs(spark, index_dir)) == n_pairs
    assert spark.read.parquet(os.path.join(index_dir, "docs")).count() == n_docs
    with open(os.path.join(index_dir, "_last_batch.json")) as f:
        assert json.load(f)["last_batch"] == 1


def test_streaming_foreachbatch_end_to_end(spark, tmp_path):
    """Drive the worker from a real streaming query: JSONL doc files →
    readStream → foreachBatch(worker) — end state equals the one-shot
    batch run."""
    src = tmp_path / "docs_stream"
    src.mkdir()
    for bid, ids in enumerate(BATCHES):
        with open(src / f"b{bid}.jsonl", "w") as f:
            for i in ids:
                f.write(json.dumps({"doc_id": i, "text": DOCS[i]}) + "\n")

    index_dir = str(tmp_path / "ndidx4")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(worker)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = _pairs(spark, index_dir)
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(_mkdf(spark, list(DOCS)), **PARAMS).collect()
    }
    assert got == want


def test_crash_before_hwm_commit_then_redelivery_is_clean(spark, tmp_path):
    """The crash window between the batch's output writes and the
    high-water-mark commit: redelivery must overwrite the batch-scoped
    partitions (no double-append) and must not pair a redelivered doc
    with its own stale indexed copy."""
    import os

    index_dir = str(tmp_path / "ndidx_crash")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    worker(_mkdf(spark, BATCHES[0]), 0)
    worker(_mkdf(spark, BATCHES[1]), 1)
    before = _pairs(spark, index_dir)
    n_docs = spark.read.parquet(os.path.join(index_dir, "docs")).count()
    os.remove(os.path.join(index_dir, "_last_batch.json"))  # "crash"
    worker(_mkdf(spark, BATCHES[1]), 1)  # redelivery
    assert _pairs(spark, index_dir) == before
    assert spark.read.parquet(os.path.join(index_dir, "docs")).count() == n_docs


def test_unreadable_index_fails_batch_instead_of_empty_probe(spark, tmp_path):
    """Round-4 advisor finding: a transiently unreadable/corrupt bucket
    store must FAIL the batch (so streaming retries) — a blanket
    'no history' fallback would verify against an empty index, commit
    the high-water-mark, and permanently miss every new-vs-old pair.
    Only a genuinely missing path means no history."""
    import pytest

    from assignment_2_dataengineering_spark.streaming.publish import (
        read_table_or_none,
    )

    # missing path → None (first batch ever)
    assert read_table_or_none(spark, str(tmp_path / "nope")) is None

    index_dir = str(tmp_path / "ndidx_corrupt")
    worker = incremental_near_dup_batch(index_dir, **PARAMS)
    worker(_mkdf(spark, BATCHES[0]), 0)
    # corrupt every parquet footer in the bucket store
    bdir = os.path.join(index_dir, "buckets")
    for root, _, files in os.walk(bdir):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "r+b") as fh:
                    fh.seek(-4, os.SEEK_END)
                    fh.write(b"XXXX")
    with pytest.raises(Exception):
        worker(_mkdf(spark, BATCHES[1]), 1)
    # the HWM must NOT have advanced past the failed batch
    with open(os.path.join(index_dir, "_last_batch.json")) as f:
        assert json.load(f)["last_batch"] == 0


def test_first_write_crash_temporary_only_dir_is_no_history(spark, tmp_path):
    """Round-5 advisor finding: a hard crash during the FIRST-ever bucket
    write can leave buckets/batch_id=0 holding only _temporary — the dir
    exists but has no committed data file, so a naive spark.read.parquet
    raises on every redelivery (permanent fail/retry loop). Underscore-
    only content means 'no history yet' → None; a dir with real data
    still reads."""
    from assignment_2_dataengineering_spark.streaming.publish import (
        read_table_or_none,
    )

    d = tmp_path / "buckets"
    (d / "batch_id=0" / "_temporary" / "0" / "task").mkdir(parents=True)
    (d / "batch_id=0" / "_temporary" / "0" / "task" / "part-0.parquet").write_bytes(
        b"torn"
    )
    assert read_table_or_none(spark, str(d)) is None

    # and after a real commit, the same path reads normally
    spark.range(3).write.mode("overwrite").parquet(str(d / "batch_id=1"))
    got = read_table_or_none(spark, str(d))
    assert got is not None and got.count() == 3


def test_read_table_or_none_remote_scheme_raises(spark):
    """Round-5 advisor finding: os.path.isdir is local-FS-only — a remote
    index_dir would always probe as None, silently reinstating the
    verify-against-empty-index data loss. Non-local schemes must fail
    loudly (mirroring compact_parquet's guard)."""
    import pytest

    from assignment_2_dataengineering_spark.streaming.publish import (
        read_table_or_none,
    )

    with pytest.raises(ValueError, match="local-FS only"):
        read_table_or_none(spark, "hdfs://nn:8020/indexes/minhash")
