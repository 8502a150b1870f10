#!/usr/bin/env python
"""Capture .explain("formatted") for bench-tagged (or named) queries
into plans/<round>/<query>_<suffix>.txt — the optimization round's
plan-claim evidence (the judge reads these files, not a live Spark).

Usage: python scripts/capture_plans.py SUFFIX [q_name,q_name,...]
  SUFFIX: "before" | "after" (file name suffix)
  names : optional comma-list; default = all bench-tagged queries.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment_2_dataengineering_spark.plans.registry import all_specs  # noqa: E402
from assignment_2_dataengineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    specs = all_specs()
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        names = [s.name for s in specs.values() if s.bench]

    spark = get_spark(app_name="a2de-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure in the file
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
