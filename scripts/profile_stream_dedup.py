#!/usr/bin/env python
"""Per-trigger cost breakdown for the persisted-LSH incremental
near-dup index (round-9 judge item #6: stream_dedup_dps ~1,000 docs/s
at sf0.1 is ~45x below plain stateful ingest — is that per-doc
signature work, fixed per-trigger cost, or an unpruned history probe?).

Replays the EXACT shape of streaming/dedup_index.incremental_near_dup_batch
on one with-history trigger, but with a wall-clock fence around each of
the worker's five sections (the worker itself interleaves them inside
one foreachBatch call, so this is the only way to attribute time):

  band_write   - minhash banding of the batch + bucket-partition write
                 (the CPU-heavy narrow stage, runs once per batch)
  docs_write   - the raw doc-store write (concurrent with band_write in
                 the shipped worker; timed separately here, so the two
                 sum to MORE than the shipped wall — noted in output)
  probe        - history root read + (band,bucket) semi-join +
                 fused flagged pair-gen, materialized via candidates
                 persist+count (the section an unpruned index read
                 would inflate)
  verify       - exact-Jaccard over candidates + pairs write
  hwm          - the high-water-mark commit (control plane)

Usage: python scripts/profile_stream_dedup.py [SF_DIR] [--docs N]
Batch layout mirrors bench.py's _dedup_index_bench: the table is split
in two file-partitions; batch 0 populates the index (untimed here
beyond its wall), batch 1 is the measured with-history trigger.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from assignment_2_dataengineering_spark.operators.dedup import band_buckets
    from assignment_2_dataengineering_spark.functions.text import shingles
    from assignment_2_dataengineering_spark.session import get_spark
    from assignment_2_dataengineering_spark.streaming.dedup_index import (
        _bucket_pairs_flagged,
        incremental_near_dup_batch,
    )

    spark = get_spark(app_name="profile-stream-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    half = docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")

    # ---- warm pass on a throwaway index: compile both codegen shapes
    warm_dir = tempfile.mkdtemp(prefix="psd_warm_")
    warm = incremental_near_dup_batch(warm_dir)
    warm(half[0].limit(200), 0)
    warm(half[1].limit(200), 1)

    # ---- shipped-worker reference walls (what bench.py measures)
    index_dir = tempfile.mkdtemp(prefix="psd_idx_")
    worker = incremental_near_dup_batch(index_dir)
    t0 = time.perf_counter()
    worker(half[0], 0)
    t_b0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    worker(half[1], 1)
    t_b1 = time.perf_counter() - t0
    print(
        f"WALL shipped batch0={t_b0:.2f}s batch1={t_b1:.2f}s "
        f"docs={n_docs} dps_b1={n_docs / 2 / t_b1:,.0f}",
        flush=True,
    )

    # ---- instrumented replay of a with-history trigger (fresh index,
    # same data): section fences around the worker's five stages
    idx2 = tempfile.mkdtemp(prefix="psd_idx2_")
    worker2 = incremental_near_dup_batch(idx2)
    worker2(half[0], 0)  # populate history

    batch_df = half[1].select("doc_id", "text")
    banded_in = batch_df.repartition(8)
    buckets_path = os.path.join(idx2, "buckets")
    docs_path = os.path.join(idx2, "docs")
    bid = 1

    t0 = time.perf_counter()
    band_buckets(banded_in, "text", "doc_id", 3, 32, 8, 42).write.mode(
        "overwrite"
    ).parquet(f"{buckets_path}/batch_id={bid}")
    t_band = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch_df.write.mode("overwrite").parquet(f"{docs_path}/batch_id={bid}")
    t_docs = time.perf_counter() - t0

    t0 = time.perf_counter()
    nb = spark.read.parquet(f"{buckets_path}/batch_id={bid}")
    new_docs = spark.read.parquet(f"{docs_path}/batch_id={bid}")
    batch_ids = new_docs.select("doc_id")
    old_buckets = (
        spark.read.option("basePath", buckets_path)
        .parquet(buckets_path)
        .filter(F.col("batch_id") != bid)
        .drop("batch_id")
    )
    old_docs = (
        spark.read.option("basePath", docs_path)
        .parquet(docs_path)
        .filter(F.col("batch_id") != bid)
        .drop("batch_id")
    )
    colliding_old = (
        old_buckets.join(nb.select("band", "bucket"), ["band", "bucket"], "left_semi")
        .join(batch_ids, "doc_id", "left_anti")
        .withColumn("__new", F.lit(False))
    )
    probe = nb.withColumn("__new", F.lit(True)).unionByName(colliding_old)
    corpus = new_docs.unionByName(old_docs.join(batch_ids, "doc_id", "left_anti"))
    candidates = _bucket_pairs_flagged(probe, "doc_id", 64).persist()
    n_cand = candidates.count()
    t_probe = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand_ids = candidates.select(F.col("id_a").alias("doc_id")).unionByName(
        candidates.select(F.col("id_b").alias("doc_id"))
    )
    doc_sh = (
        corpus.join(cand_ids, "doc_id", "left_semi")
        .select(
            "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("sh")
        )
        .persist()
    )
    a_sh = doc_sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b_sh = doc_sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - shared
    confirmed = (
        candidates.join(a_sh, "id_a")
        .join(b_sh, "id_b")
        .withColumn("shared", shared)
        .withColumn(
            "jaccard",
            F.when(union > 0, F.round(F.col("shared") / union, 4)).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    confirmed.write.mode("overwrite").parquet(
        os.path.join(idx2, "pairs", f"batch_id={bid}")
    )
    t_verify = time.perf_counter() - t0
    candidates.unpersist()
    doc_sh.unpersist()

    total = t_band + t_docs + t_probe + t_verify
    print(
        f"SECTIONS band_write={t_band:.2f} docs_write={t_docs:.2f} "
        f"probe={t_probe:.2f} verify={t_verify:.2f} "
        f"serial_total={total:.2f} candidates={n_cand} "
        f"(shipped wall overlaps band/docs writes; serial total > wall "
        f"is expected)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
