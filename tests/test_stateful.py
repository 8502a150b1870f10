"""E2E for the custom stateful tier (streaming/stateful.py): running
bounded top-k over a two-batch file stream must equal the batch top-k
over the union — associativity of the merge, and state bounded at k
values per key. The transformWithStateInPandas twin is a gated seam
(protobuf absent in this container) — pinned to raise cleanly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.streaming import stateful

K = 3


@pytest.fixture()
def two_batch_dir(spark, tmp_path_factory):
    """Two parquet files -> two micro-batches (maxFilesPerTrigger=1)."""
    import shutil

    d = tmp_path_factory.mktemp("topk_stream")
    rows1 = [(u, float(u * 100 + i)) for u in range(4) for i in range(6)]
    rows2 = [(u, float(u * 100 + 50 + i)) for u in range(4) for i in range(6)]
    spark.createDataFrame(rows1, "user_id long, value double").coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(rows2, "user_id long, value double").coalesce(1).write.parquet(
        str(d / "b2")
    )
    src = d / "src"
    src.mkdir()
    n = 0
    for sub in ("b1", "b2"):
        for f in sorted((d / sub).glob("*.parquet")):
            shutil.copy(f, src / f"{n:03d}.parquet")
            n += 1
    return d


def test_running_topk_matches_batch_oracle(spark, two_batch_dir):
    d = two_batch_dir
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "src"))
    )
    out = stateful.running_topk(stream, key="user_id", value_col="value", k=K)
    q = (
        out.writeStream.format("memory")
        .queryName("topk_sink")
        .outputMode("update")
        .option("checkpointLocation", str(d / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sink = spark.table("topk_sink")
    # update mode re-emits per batch; the row with max n_seen per key is
    # the final state
    final = (
        sink.groupBy("key")
        .agg(F.max_by("topk", "n_seen").alias("topk"), F.max("n_seen").alias("n_seen"))
        .collect()
    )
    got = {r["key"]: (list(r["topk"]), r["n_seen"]) for r in final}

    batch = spark.read.parquet(str(d / "src")).collect()
    expect = {}
    for r in batch:
        expect.setdefault(r["user_id"], []).append(r["value"])
    expect = {u: sorted(vs, reverse=True)[:K] for u, vs in expect.items()}

    assert set(got) == set(expect)
    for u, (topk, n_seen) in got.items():
        assert topk == expect[u], (u, topk, expect[u])
        assert len(topk) == K  # state bounded at k
        assert n_seen == 12  # both batches counted exactly once


def test_tws_variant_gated_without_protobuf(spark, two_batch_dir):
    if stateful.HAS_PROTOBUF:
        pytest.skip("protobuf present; gate not exercised")
    stream = (
        spark.readStream.schema("user_id long, value double")
        .parquet(str(two_batch_dir / "src"))
    )
    with pytest.raises(ImportError, match="protobuf"):
        stateful.running_topk_tws(stream, key="user_id", value_col="value", k=K)
