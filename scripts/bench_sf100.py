#!/usr/bin/env python
"""Single-run sweep of a representative query subset at a very large
scale factor (default sf100 = 1000x sf0.1 rows) — the third decade of
the SCALE.md scaling study.

Methodology (aligned with bench.py v2's child protocol since round 7):

- FRESH JVM per query (subprocess). The first single-session sweep at
  this SF measured q_corpus_pipeline at 206 s in-session vs 36 s
  isolated on identical code/data/partitions — minute-scale queries
  leave enough JVM state (JIT profile pollution across regex shapes,
  heap/GC pressure) to distort successors by ~6x. Per-query isolation
  costs ~15 s of untimed startup each and removes the cross-query
  variable entirely.
- The PARENT primes the OS page cache before EACH child (re-reading
  still-cached pages costs seconds; the join tier's scans and spills
  evict earlier-primed document files otherwise); each child then
  times its FIRST run, forces a JVM GC, times a REPEAT, and reports
  the MIN (bench.py's _child warm="scale", shared). Three measured
  wrong ways bracket this design: (a) no priming silently measures
  cache history (cold-cache q_groupby_sum 25.8 s vs ~4 s warm at
  sf100 — the round-6 region.parquet-only warm-up left this
  uncontrolled); (b) timing only the FIRST run measures cold JIT —
  up to 2x on the text tier (q_tfidf 84 s first vs 42 s repeat);
  (c) timing only a REPEAT hits in-session distortions — un-GC'd
  checkpoint-block accumulation on iterative queries (q_pagerank
  69 s first, 116 s un-GC'd repeat, 67-73 s GC'd) and intermittent
  hot-regex deopt on the text tier (q_span_dedup 67 s first vs 234 s
  repeat). The two failure modes never hit the same run, so min() is
  robust to both.

The subset spans every expensive plan family (count-table joins,
shingle window, cell-quadratic, graph supersteps, TPC-H joins) plus
scan-bound controls.

Usage: python scripts/bench_sf100.py [SF_DIR]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Canonical subset lives in bench.py (its sf10 block measures the same
# queries every round); this sweep is the sf100 decade of the same curve.
from bench import SCALE_SUBSET as QUERIES  # noqa: E402

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.benchdata/sf100"
    from bench import prime_page_cache

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "96g")
    # Production-style shuffle sizing (SCALE.md §7): high initial
    # count, AQE coalesces per stage. The 32-partition test default
    # spills at this SF — measured 2-6x blowups on the join tier.
    env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")

    timings: dict[str, float] = {}
    for name in QUERIES:
        # re-prime BEFORE EACH child, not once per sweep: the join
        # tier's ~25 GB scans + shuffle spills evict earlier-primed
        # document files, which inflated late-running text queries
        # ~2x mid-sweep (q_decontaminate 112 s in-sweep vs 58-64 s
        # primed). Re-reading still-cached pages costs seconds; only
        # the evicted parts touch disk.
        prime_page_cache(sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--child", name, sf_dir, "1", "scale"],
            env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("BENCHCHILD_MEDIAN="):
                wall = round(float(line.split("=", 1)[1]), 2)
        if out.returncode != 0 or wall is None:
            print(f"{name}: FAILED rc={out.returncode}", file=sys.stderr, flush=True)
            timings[name] = -1.0
            continue
        timings[name] = wall
        print(f"{name}: {wall}s", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "metric": "sf100_subset_wall",
                "value": round(sum(t for t in timings.values() if t > 0), 2),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
                "timed_runs_per_query": 1,
                "isolation": "fresh JVM per query",
                "warm": "page cache primed; min(first run, post-GC repeat)",
                "shuffle_partitions": env["SPARK_GRAFT_SHUFFLE_PARTITIONS"],
            }
        )
    )


if __name__ == "__main__":
    main()
