#!/usr/bin/env python
"""Round-9 measurement queue (serialized so readings don't contend):

0. Calibration statistics for the scale-aware strategy selectors
   (plan-stat bytes of the document scan, distinct edge counts) at
   sf10 and sf100 — the numbers that pin SPAN_AUTO_JOIN_MIN_BYTES and
   PR_CADENCE_AUTO_MIN_EDGES between the measured decades.
1. Inverted shingle-index key-width A/B (hash vs exact) at sf10 and
   sf100, two sweeps at sf100 (round-8 judge item #3).
2. sf10 ambient-drift adjudication: isolated matched-condition
   re-reads of q_dedup_exact and q_window_agg (round-8 judge item #4).
3. Maintenance curves for rollup_maintain and the stateful bounded
   top-k at sf1 and sf10 (round-8 judge item #5).
4. Scale-aware default validation at sf100: q_span_dedup and
   q_pagerank with NO env dials (auto must pick the measured winner),
   plus two q_decontaminate sweeps (round-8 judge item #8 lottery
   tracking).

Each phase uses the established fresh-JVM + primed-cache discipline.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from bench import prime_page_cache  # noqa: E402

ENV = dict(os.environ)
ENV["SPARK_DRIVER_MEMORY"] = "96g"
ENV["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "256"


def child_bench(name, sf_dir, extra_env=None):
    env = dict(ENV)
    env.update(extra_env or {})
    prime_page_cache(sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--child", name, sf_dir, "1", "scale"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("BENCHCHILD_MEDIAN="):
            return float(line.split("=", 1)[1])
    return -1.0


def phase0_stats(sf10, sf100):
    """Run the calibration reads in a SUBPROCESS: spark.stop() does not
    end the py4j JVM — it lives until the owning python exits, and the
    round-9 run measured the damage of letting it linger under the
    later phases (a 9.4 GB resident JVM quadrupled sweep-1's sf100
    index readings vs the clean sweep 2; see SCALE.md §6l)."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from assignment_2_dataengineering_spark.operators.dedup import "
        "_plan_stat_bytes\n"
        "from assignment_2_dataengineering_spark.plans.queries_graph import "
        "_user_edges\n"
        "from assignment_2_dataengineering_spark.session import get_spark\n"
        "from assignment_2_dataengineering_spark.sources.tables import "
        "load_table\n"
        "spark = get_spark(app_name='r9-calibration')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "for name, d in (('sf10', %r), ('sf100', %r)):\n"
        "    docs = load_table(spark, d, 'documents')"
        ".select('doc_id', 'text')\n"
        "    print(f'calib {name} docs_plan_bytes="
        "{_plan_stat_bytes(docs)}', flush=True)\n"
        "    print(f'calib {name} distinct_edges="
        "{_user_edges(spark, d).count()}', flush=True)\n"
    ) % (REPO, sf10, sf100)
    out = subprocess.run(
        [sys.executable, "-c", code], env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("calib "):
            print(line, flush=True)


def main():
    sf100 = os.path.join(REPO, ".benchdata", "sf100")
    sf10 = os.path.join(REPO, ".benchdata", "sf10")
    sf1 = os.path.join(REPO, ".benchdata", "sf1")
    phases = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
        "0", "1", "2", "3", "4"}

    if "0" in phases:
        print("== phase 0: selector calibration statistics", flush=True)
        phase0_stats(sf10, sf100)

    if "1" in phases:
        print("== phase 1: shingle-index key-width A/B", flush=True)
        # sf10 runs the full uncapped consumers; at sf100 the uncapped
        # pair join's Σdf² fan-out dwarfs the index term under BOTH key
        # policies (sf10 already reads 76-181 s), so the sf100 A/B uses
        # the index build plus the capped Jaccard form — the fan-out
        # guard a 100 TB run uses anyway (see profile_shingle.py).
        from scripts.profile_shingle import SF100_STAGES

        for sf_name, sf_dir, sweeps, stages in (
            ("sf10", sf10, 1, ()),
            ("sf100", sf100, 2, SF100_STAGES),
        ):
            for sweep in range(1, sweeps + 1):
                out = subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "scripts/profile_shingle.py"),
                     sf_dir, *stages],
                    env=ENV, stdout=subprocess.PIPE,
                    stderr=subprocess.DEVNULL, text=True)
                for line in out.stdout.splitlines():
                    if line.startswith("STAGE="):
                        print(f"shingle {sf_name} sweep{sweep} {line}",
                              flush=True)

    if "2" in phases:
        print("== phase 2: sf10 ambient-drift re-reads", flush=True)
        for name in ("q_dedup_exact", "q_window_agg"):
            for rep in (1, 2, 3):
                t = child_bench(name, sf10)
                print(f"drift {name} sf10 rep{rep}: {t:.2f}s", flush=True)

    if "3" in phases:
        print("== phase 3: rollup/topk maintenance curves", flush=True)
        for sf_name, sf_dir in (("sf1", sf1), ("sf10", sf10)):
            out = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/bench_streams_scale.py"),
                 sf_dir, "rollup_maintain,stateful_topk"],
                env=ENV, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True)
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(f"streams {sf_name}: {line}", flush=True)

    if "4" in phases:
        print("== phase 4: scale-aware defaults at sf100 (no dials set)",
              flush=True)
        for env_check in ("SPARK_GRAFT_SPAN_FIRST_OCC",
                          "SPARK_GRAFT_PR_CHECKPOINT_EVERY"):
            assert env_check not in ENV, f"{env_check} set — not an auto run"
        for name, reps in (("q_span_dedup", 2), ("q_pagerank", 2),
                           ("q_decontaminate", 2)):
            for rep in range(1, reps + 1):
                t = child_bench(name, sf100)
                print(f"auto {name} sf100 rep{rep}: {t:.2f}s", flush=True)


if __name__ == "__main__":
    main()
