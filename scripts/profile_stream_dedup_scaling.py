#!/usr/bin/env python
"""Batch-size scaling of the incremental near-dup index (round-10):
is the ~850 docs/s at sf0.1 a per-doc cost or a per-trigger fixed cost?

Runs the shipped foreachBatch worker on triggers of increasing size
(history batch of N docs, then ONE measured with-history trigger of N
docs) drawn deterministically from a documents table. If wall grows
sublinearly in N, the cost is per-trigger scheduling latency and
throughput amortizes with batch size — the 100 TB-relevant number is
docs/s at production trigger sizes, not at the bench's 2,500-doc
micro-trigger.

Usage: python scripts/profile_stream_dedup_scaling.py [DOCS_PARQUET] [N ...]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    docs_parquet = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".benchdata", "sf10", "documents.parquet")
    )
    sizes = [int(a) for a in sys.argv[2:]] or [2500, 10000, 40000]

    from assignment_2_dataengineering_spark.session import get_spark
    from assignment_2_dataengineering_spark.streaming.dedup_index import (
        incremental_near_dup_batch,
    )

    spark = get_spark(app_name="profile-stream-dedup-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_parquet).select("doc_id", "text")

    # warm both codegen shapes once on a throwaway index
    warm_dir = tempfile.mkdtemp(prefix="psds_warm_")
    warm = incremental_near_dup_batch(warm_dir)
    warm(docs.limit(400).filter("doc_id % 2 = 0"), 0)
    warm(docs.limit(400).filter("doc_id % 2 = 1"), 1)

    for n in sizes:
        pool = docs.filter(f"doc_id % 2 = 0").limit(n), docs.filter(
            f"doc_id % 2 = 1"
        ).limit(n)
        idx = tempfile.mkdtemp(prefix=f"psds_{n}_")
        worker = incremental_near_dup_batch(idx)
        worker(pool[0], 0)  # history
        t0 = time.perf_counter()
        worker(pool[1], 1)  # measured with-history trigger
        wall = time.perf_counter() - t0
        print(
            f"SCALING n={n} wall={wall:.2f}s dps={n / wall:,.0f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
