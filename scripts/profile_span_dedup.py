#!/usr/bin/env python
"""Stage-level profile of q_span_dedup's sf100 variance (round-8
follow-up to the boilerplate profile): the query reads 43.8-135.2 s on
identical code/data across same-day isolated sweeps — the repo's
largest remaining JIT-lottery spread. Same discipline as
profile_boilerplate.py: fresh JVM per stage, primed cache, first +
post-GC repeat both printed, so a stage whose FIRST/REPEAT spread is
large identifies where the lottery lives.

Stages (cumulative prefixes of the registered plan, q_corpus_pipeline's
span_dedup defaults: n=10, no freq cap in q_span_dedup):
  occurrences - tokenize + posexplode shingles + xxhash64 keys (narrow)
  window      - + the per-shingle first-occurrence window (the shuffle)
  spans       - + duplicate spans collected per doc
  full        - the registered q_span_dedup

Usage: python scripts/profile_span_dedup.py [SF_DIR] [stage ...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("occurrences", "window", "spans", "full")
_N = 10


def _child(stage: str, sf_dir: str) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from assignment_2_dataengineering_spark.functions.text import (
        shingles_from_tokens,
        tokens_ws,
    )
    from assignment_2_dataengineering_spark.operators.dedup import span_dedup
    from assignment_2_dataengineering_spark.session import get_spark

    spark = get_spark(app_name=f"profile-span-{stage}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def build():
        if stage == "full":
            return span_dedup(docs, n=_N)
        toks = docs.select(F.col("doc_id"), tokens_ws(F.col("text")).alias("__w"))
        sh = toks.select(
            "doc_id",
            F.posexplode(shingles_from_tokens(F.col("__w"), _N)).alias(
                "pos", "__sh_txt"
            ),
        ).select("doc_id", "pos", F.xxhash64(F.col("__sh_txt")).alias("sh"))
        if stage == "occurrences":
            return sh
        w_first = Window.partitionBy("sh")
        dup = (
            sh.withColumn(
                "__first", F.min(F.struct(F.col("doc_id"), F.col("pos"))).over(w_first)
            )
            .filter(
                (F.col("__first")["doc_id"] != F.col("doc_id"))
                | (F.col("__first")["pos"] != F.col("pos"))
            )
            .select("doc_id", "pos")
        )
        if stage == "window":
            return dup
        return dup.groupBy("doc_id").agg(F.collect_list("pos").alias("__spans"))

    def _run() -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    first = _run()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    repeat = _run()
    print(f"STAGE={stage} first={first:.2f} repeat={repeat:.2f} "
          f"min={min(first, repeat):.2f}", flush=True)
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        _child(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.benchdata/sf100"
    stages = sys.argv[2:] or list(STAGES)
    from bench import prime_page_cache

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "96g")
    env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
    for stage in stages:
        prime_page_cache(sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", stage, sf_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("STAGE="):
                print(line, flush=True)


if __name__ == "__main__":
    main()
