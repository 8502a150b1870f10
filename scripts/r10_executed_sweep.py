#!/usr/bin/env python
"""Round-10 EXECUTED-plan sweep: run every registered query to a noop
sink and read the FINAL adaptive plan (isFinalPlan=true), counting
Exchange vs ReusedExchange and parquet-scan nodes that actually
executed.

Why this exists (optimization guide §2.4/§3.3): the static sweep
(r10_plan_sweep.py) counts re-PLANNED subtrees, but Spark's runtime
exchange reuse dedups canonically-identical ones — the static count
over-reports physical work (measured on q_dedup_minhash_lsh: 19
static exchanges, most reused at runtime; measured the other way on
q_triangle_count before its r10 fix: alias-renamed branches defeated
canonicalization and the 206 static exchanges were real). The
executed plan is the ground truth for which duplicated subtrees
actually cost scans/shuffles, so the re-planned-subtree fix
(localCheckpoint the shared intermediate) is applied only where this
sweep shows physical duplication.

Prints one line per query:
  name wall_s exch=<final-plan Exchanges> reused=<ReusedExchange>
  scan=<final-plan parquet scans> rdd=<checkpointed RDD scans>
A query is a candidate when scan exceeds its distinct input tables
(some input is physically re-scanned through a non-reused subtree)
and the duplicated subtree contains shuffles/aggregations.

Usage: python scripts/r10_executed_sweep.py [SF_DIR] [name ...]
"""
from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from assignment_2_dataengineering_spark.plans.registry import all_specs  # noqa: E402
from assignment_2_dataengineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark(app_name="r10-executed-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in sorted(all_specs().items()):
        if only is not None and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            t0 = time.perf_counter()
            # Execute the DataFrame's OWN QueryExecution (a noop write
            # builds a new one whose final plan we could not read back):
            # AdaptiveSparkPlanExec finalizes during execute(), and the
            # RDD count pipes every row through the full plan without
            # collecting to the driver.
            qe.executedPlan().execute().count()
            wall = time.perf_counter() - t0
            plan = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name} ERROR {str(ex)[:120]}", flush=True)
            continue
        # keep only the Final Plan tree (the formatted string appends
        # the Initial Plan section, which would double-count)
        final = plan.split("== Initial Plan ==")[0]
        # anchor counts on the formatted plan's numbered node listing —
        # "(N) NodeName" lines list each executed node exactly once, so
        # a root-position Exchange is counted and tree-prefix artifacts
        # ("+- "/":- ") can't skew the audit (r10 ADVICE)
        exch = len(re.findall(r"^\(\d+\) Exchange\b", final, re.M))
        reused = len(re.findall(r"^\(\d+\) ReusedExchange\b", final, re.M))
        scans = len(re.findall(r"^\(\d+\) Scan parquet\b", final, re.M))
        # checkpointed intermediates surface as in-memory RDD scans
        rdd_scans = len(re.findall(r"^\(\d+\) Scan ExistingRDD\b", final, re.M))
        print(
            f"{name} {wall:.2f}s exch={exch} reused={reused} "
            f"scan={scans} rdd={rdd_scans}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
