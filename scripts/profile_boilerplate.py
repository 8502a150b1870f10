#!/usr/bin/env python
"""Stage-level profile of q_boilerplate at large SF (round-8 judge item #1).

The r7 ledger shows 106-138 s at sf100 across all four measurement
protocols vs r6's 55.8 s on untouched code. Hypothesis (VERDICT r7):
the ~25M-distinct-STRING-key gram document-frequency aggregate
(operators/cleaning.py dfreq groupBy) dominates and is the
JIT-lottery shape. This script times each plan stage in a FRESH JVM
(page cache primed by the parent, warm="scale" min-of-two discipline)
so the expensive stage is identified by measurement, not guess.

Stages:
  scan    - docs parquet scan + count (control: I/O floor)
  shingle - gram-array build + explode, count only (no aggregate)
  dfreq   - the gram string-key groupBy count (the suspect)
  full    - the whole registered query

Usage: python scripts/profile_boilerplate.py [SF_DIR] [stage ...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("scan", "shingle", "dfreq", "dfreq_hash", "full", "full_exact")


def _child(stage: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from assignment_2_dataengineering_spark.functions import text as TX
    from assignment_2_dataengineering_spark.operators.cleaning import (
        boilerplate_scores,
    )
    from assignment_2_dataengineering_spark.session import get_spark

    spark = get_spark(app_name=f"profile-boilerplate-{stage}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def build():
        toks = docs.select(
            "doc_id", F.explode(F.array(TX.tokens_ws(F.col("text")))).alias("__w")
        )
        gram_arr = toks.select(
            "doc_id",
            F.explode(
                F.array(F.array_distinct(TX.shingles_from_tokens(F.col("__w"), 3)))
            ).alias("__g"),
        )
        if stage == "shingle":
            return gram_arr.select(F.explode("__g").alias("gram"))
        if stage == "dfreq":
            return (
                gram_arr.select(F.explode("__g").alias("gram"))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).alias("df"))
            )
        if stage == "dfreq_hash":
            return (
                gram_arr.select(F.explode("__g").alias("gram"))
                .select(F.xxhash64("gram").alias("gram"))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).alias("df"))
            )
        if stage == "full":
            return boilerplate_scores(docs, "text", "doc_id", 3, 1, 5)
        if stage == "full_exact":
            return boilerplate_scores(
                docs, "text", "doc_id", 3, 1, 5, exact_keys=True
            )
        return docs

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
