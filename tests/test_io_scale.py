"""I/O scale utilities: small-file compaction and binaryFile ingest."""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.sources.io import (
    compact_parquet,
    read_binary_files,
)


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in globmod.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f).startswith("part-")
    ]


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # simulate a streaming sink's droppings: 64 tiny files
    df.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    files = compact_parquet(spark.read.parquet(src), dst, target_rows_per_file=4_000)
    assert files == 3  # ceil(10000 / 4000)
    assert len(_parquet_files(dst)) == 3
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_parquet_clustered_files_own_key_ranges(spark, tmp_path):
    dst = str(tmp_path / "clustered")
    df = spark.range(0, 9_000).withColumn("k", F.col("id") % 3_000)
    compact_parquet(df, dst, target_rows_per_file=3_000, cluster_by=["k"])
    # each physical file must own a disjoint contiguous range of k so
    # parquet min/max stats can prune whole files on k-predicates
    per_file = (
        spark.read.parquet(dst)
        .select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) >= 2
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file key ranges: {spans}"


def test_read_binary_files_roundtrip_and_glob(spark, tmp_path):
    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"clip{i}.bin": bytes([i] * (10 + i)) for i in range(4)}
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    (media / "notes.txt").write_text("not media")

    df = read_binary_files(spark, str(media), glob="*.bin")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name]["content"]) == data
        assert rows[name]["length"] == len(data)
