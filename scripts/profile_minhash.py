#!/usr/bin/env python
"""Stage attribution for q_dedup_minhash_lsh (round-10: at 11.2 s it is
the #2 sf10 query behind PageRank). Hypothesis from the streaming
worker's round-6 profiling (streaming/dedup_index.py): in
verify_pairs_exact the candidate subtree feeds THREE branches (cand_ids
twice + the verify join) and the shingle-set frame feeds TWO (a-side /
b-side), and alias-differing subplans defeat exchange reuse — so the
banding groupBy and the candidate-doc shingling may execute 2-3x per
action. The incremental worker persists both for exactly this reason;
the batch operator does not.

Stages (each a fresh JVM via --child, min of first/post-GC-repeat):
  sig      - minhash_signatures only (narrow expression tier)
  cand     - band_buckets + bucket_pairs materialized (candidate gen)
  full     - shipped minhash_lsh_pairs (unpersisted verify inputs)
  full_ckpt- same pipeline with candidates + doc_sh localCheckpointed
             (the streaming worker's fix, batch-shaped)

Usage: python scripts/profile_minhash.py [SF_DIR] [stage ...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("sig", "cand", "full", "full_ckpt")


def _child(stage: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from assignment_2_dataengineering_spark.functions.text import shingles
    from assignment_2_dataengineering_spark.operators import dedup as DD
    from assignment_2_dataengineering_spark.session import get_spark

    spark = get_spark(app_name=f"profile-minhash-{stage}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def build():
        if stage == "sig":
            return DD.minhash_signatures(docs)
        if stage == "cand":
            return DD.bucket_pairs(
                DD.band_buckets(docs), "doc_id", max_bucket_size=None
            )
        if stage == "full":
            return DD.minhash_lsh_pairs(docs, threshold=0.3)
        # full_ckpt: the operator pipeline with the two multi-branch
        # intermediates eagerly materialized, mirroring the streaming
        # worker's persist fix
        buckets = DD.band_buckets(docs)
        candidates = DD.bucket_pairs(buckets, "doc_id").localCheckpoint()
        cand_ids = (
            candidates.select(F.col("id_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        doc_sh = (
            docs.join(cand_ids, "doc_id", "left_semi")
            .select(
                "doc_id",
                F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
            )
            .localCheckpoint()
        )
        a_sh = doc_sh.select(
            F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")
        )
        b_sh = doc_sh.select(
            F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")
        )
        shared = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - shared
        return (
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

    def _run() -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    first = _run()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    repeat = _run()
    print(
        f"STAGE={stage} first={first:.2f} repeat={repeat:.2f} "
        f"min={min(first, repeat):.2f}",
        flush=True,
    )
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        _child(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.benchdata/sf10"
    stages = sys.argv[2:] or list(STAGES)
    from bench import prime_page_cache

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "96g")
    env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
    for stage in stages:
        prime_page_cache(sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", stage, sf_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, timeout=1800,
        )
        got = False
        for line in out.stdout.splitlines():
            if line.startswith("STAGE="):
                print(line, flush=True)
                got = True
        if not got:
            print(f"STAGE={stage} FAILED rc={out.returncode}", flush=True)


if __name__ == "__main__":
    main()
