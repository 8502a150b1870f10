#!/usr/bin/env python
"""Single-run sweep of a representative query subset at a very large
scale factor (default sf100 = 1000x sf0.1 rows) — the third decade of
the SCALE.md scaling study.

Methodology differs from bench.py deliberately, twice:

- ONE warm-up-free timed run per query. At minute-scale walls the
  launch variance that makes median-of-3 necessary at sub-second scale
  is a rounding error, and a 3x repeat of the heavy tier would cost
  hours for no information.
- FRESH JVM per query (subprocess). The first single-session sweep at
  this SF measured q_corpus_pipeline at 206 s in-session vs 36 s
  isolated on identical code/data/partitions — minute-scale queries
  leave enough JVM state (JIT profile pollution across regex shapes,
  heap/GC pressure) to distort successors by ~6x. Per-query isolation
  costs ~15 s of untimed startup each and removes the cross-query
  variable entirely. The in-JVM warm-up read before the timed run
  keeps codegen/classloading out of the clock as before.

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

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from assignment_2_dataengineering_spark.plans.registry import get_spec
from assignment_2_dataengineering_spark.session import get_spark
spark = get_spark(app_name="a2de-bench-sf100")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet({sf_dir!r} + "/region.parquet").count()  # JVM warm-up
t0 = time.perf_counter()
get_spec({name!r}).fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print("WALL_S=%.2f" % (time.perf_counter() - t0), flush=True)
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.benchdata/sf100"
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "96g")
    # Production-style shuffle sizing (SCALE.md §7): high initial
    # count, AQE coalesces per stage. The 32-partition test default
    # spills at this SF — measured 2-6x blowups on the join tier.
    env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")

    timings: dict[str, float] = {}
    for name in QUERIES:
        child = _CHILD.format(repo=REPO, sf_dir=sf_dir, name=name)
        out = subprocess.run(
            [sys.executable, "-c", child], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("WALL_S="):
                wall = float(line.split("=", 1)[1])
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
                "shuffle_partitions": env["SPARK_GRAFT_SHUFFLE_PARTITIONS"],
            }
        )
    )


if __name__ == "__main__":
    main()
