#!/usr/bin/env python
"""Round-10 registry-wide physical-plan sweep: every registered query's
plan at sf0.01, grepped for the optimization guide's anti-patterns
(§2.4 unexpected exchanges / cartesian products, §4 row-at-a-time
Python, §6 scan pushdown). Prints one line per query with operator
counts and a FLAG column; the round's OPTIMIZATION_r10.md cites the
output as the examined-everything evidence.

Flags:
  BATCH_PY     - BatchEvalPython (row-pickled UDF) anywhere
  CARTESIAN    - CartesianProduct (a non-broadcast cross join)
  GLOBAL_SORT  - Sort with a singlePartition exchange below (driver-ish
                 global sort NOT under a TakeOrdered)
  WIDE_SMJ     - SortMergeJoin (every engine join is expected to be
                 broadcast / shuffled-hash / pinned)

Usage: python scripts/r10_plan_sweep.py [SF_DIR]
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from assignment_2_dataengineering_spark.plans.registry import all_specs  # noqa: E402
from assignment_2_dataengineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="r10-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, spec in sorted(all_specs().items()):
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name} ERROR {str(ex)[:120]}", flush=True)
            flagged += 1
            continue
        counts = {
            "exch": len(re.findall(r"\(\d+\) Exchange", plan)),
            "scan": len(re.findall(r"\(\d+\) Scan parquet", plan)),
            "py": len(
                re.findall(r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|FlatMapGroupsInPandasWithState|BatchEvalPython", plan)
            ),
        }
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("BATCH_PY")
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "SortMergeJoin" in plan:
            flags.append("WIDE_SMJ")
        # global sort not subsumed by TakeOrdered: a single-partition
        # exchange feeding a Sort
        if re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*Sort ", plan):
            flags.append("GLOBAL_SORT")
        mark = ",".join(flags) if flags else "-"
        if flags:
            flagged += 1
        print(
            f"{name} exch={counts['exch']} scan={counts['scan']} "
            f"py={counts['py']} {mark}",
            flush=True,
        )
    print(f"FLAGGED: {flagged}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
