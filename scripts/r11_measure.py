#!/usr/bin/env python
"""Round-11 measurement phases. Each phase is independently runnable:

  phase cores   — fewer-cores-is-faster adjudication (r10 verdict #3):
                  ALTERNATE fresh-JVM children at 32 and 8 cores for the
                  four inverted queries (minhash 0.39, bpe_merges 0.65,
                  media_features 0.70, ann_bruteforce 0.73 low/high-core
                  ratios in BENCH_r10 vs BENCH_r10_c8), interleaved so
                  ambient waves hit both arms. 3 reps per (query, cores).
  phase durability — per-site localCheckpoint vs persist(DISK_ONLY) A/B
                  (r10 verdict #4): fresh-JVM children per (query, mode)
                  alternated, at the given SF dir, for every query whose
                  plan contains a round-10 materialize() site.
  phase psi     — q_psi_drift tier-gate calibration: prints the
                  optimizer's plan-stat bytes for the 3-column events
                  projection at the given SF dir, and times the lazy vs
                  materialized forms (SPARK_GRAFT wiring not needed: the
                  gate is monkeypatched per child via env
                  R11_PSI_FORCE=lazy|mat).

Children reuse bench.py's fresh-JVM + untimed-warm-up + median-of-3
discipline via `--child` mode below (bench.py's protocol, inlined so a
phase can add env knobs per child).

Usage:
  python scripts/r11_measure.py cores [SF_DIR] [reps]
  python scripts/r11_measure.py durability [SF_DIR] [reps]
  python scripts/r11_measure.py psi [SF_DIR] [reps]
"""
from __future__ import annotations

import os
import signal
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INVERTED = [
    "q_dedup_minhash_lsh", "q_bpe_merges", "q_media_features",
    "q_ann_bruteforce",
]

# every registered query whose plan runs through a materialize() site
DURABILITY_QUERIES = [
    "q_triangle_count",      # queries_graph.py ud + o
    "q_boilerplate",         # cleaning.py gram_keys
    "q_corpus_pipeline_v2",  # queries_corpus.py capped
    "q_cooccurrence",        # queries_analytic.py ue
    "q_user_similarity",     # queries_analytic.py items
    "q_balance_audit",       # queries_analytic.py obs
    "q_psi_drift",           # queries_analytic.py bounds + cells (sf10 tier)
    "q_prob_linkage",        # linkage.py histograms (sf0.1 only: the demo
                             # blocking key is quadratic at sf10 — guarded)
]


def _child(name: str, sf_dir: str, timed_runs: int) -> None:
    from assignment_2_dataengineering_spark.plans.registry import get_spec
    from assignment_2_dataengineering_spark.session import get_spark

    force = os.environ.get("R11_PSI_FORCE")
    if force:
        from assignment_2_dataengineering_spark.plans import queries_analytic as qa

        qa.select_psi_materialization = lambda est: force == "mat"

    spark = get_spark(app_name=f"r11-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = get_spec(name)

    def one() -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one()  # untimed warm-up (codegen, JIT, page cache)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    runs = [one() for _ in range(timed_runs)]
    print(f"R11CHILD_MEDIAN={statistics.median(runs):.6f} "
          f"runs={[round(r, 3) for r in runs]}", flush=True)
    spark.stop()


def _run_child(name: str, sf_dir: str, timed_runs: int,
               extra_env: dict[str, str], timeout: int = 900) -> float:
    env = dict(os.environ)
    env.update(extra_env)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", name, sf_dir,
         str(timed_runs)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=True,
    )
    try:
        stdout, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.communicate()
        return -1.0
    for line in stdout.splitlines():
        if line.startswith("R11CHILD_MEDIAN="):
            print(f"    {line}", flush=True)
            return float(line.split("=", 1)[1].split()[0])
    return -1.0


def _prime(sf_dir: str) -> None:
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            try:
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
            except OSError:
                pass


def phase_cores(sf_dir: str, reps: int) -> None:
    print(f"== cores phase @ {sf_dir}, {reps} interleaved reps ==", flush=True)
    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for name in INVERTED:
            for cpus in ("32", "8"):
                _prime(sf_dir)
                print(f"  rep{rep} {name} cpus={cpus}", flush=True)
                t = _run_child(name, sf_dir, 3, {"SPARK_GRAFT_CPUS": cpus})
                results.setdefault((name, cpus), []).append(t)
    print("\n== cores summary (median of medians) ==", flush=True)
    for name in INVERTED:
        r32 = [t for t in results[(name, "32")] if t > 0]
        r8 = [t for t in results[(name, "8")] if t > 0]
        m32 = statistics.median(r32) if r32 else -1
        m8 = statistics.median(r8) if r8 else -1
        print(f"{name}: c32={m32:.3f}s {sorted(round(x,3) for x in r32)} "
              f"c8={m8:.3f}s {sorted(round(x,3) for x in r8)} "
              f"ratio8/32={m8 / m32 if m32 > 0 else float('nan'):.2f}",
              flush=True)


def phase_durability(sf_dir: str, reps: int) -> None:
    print(f"== durability phase @ {sf_dir}, {reps} interleaved reps ==",
          flush=True)
    queries = [q for q in DURABILITY_QUERIES
               if not (q == "q_prob_linkage" and "sf10" in sf_dir)]
    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for name in queries:
            for mode in ("local_checkpoint", "disk_persist"):
                _prime(sf_dir)
                print(f"  rep{rep} {name} mode={mode}", flush=True)
                t = _run_child(name, sf_dir, 3,
                               {"SPARK_GRAFT_MATERIALIZE": mode})
                results.setdefault((name, mode), []).append(t)
    print("\n== durability summary (median of medians) ==", flush=True)
    for name in queries:
        lc = [t for t in results[(name, "local_checkpoint")] if t > 0]
        dp = [t for t in results[(name, "disk_persist")] if t > 0]
        mlc = statistics.median(lc) if lc else -1
        mdp = statistics.median(dp) if dp else -1
        print(f"{name}: local_checkpoint={mlc:.3f}s "
              f"{sorted(round(x,3) for x in lc)} disk_persist={mdp:.3f}s "
              f"{sorted(round(x,3) for x in dp)} "
              f"delta={100 * (mdp - mlc) / mlc if mlc > 0 else float('nan'):+.1f}%",
              flush=True)


def phase_psi(sf_dir: str, reps: int) -> None:
    from assignment_2_dataengineering_spark.operators.dedup import _plan_stat_bytes
    from assignment_2_dataengineering_spark.session import get_spark
    from assignment_2_dataengineering_spark.sources.tables import load_table

    spark = get_spark(app_name="r11-psi-stat")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    print(f"plan-stat bytes of 3-col events projection @ {sf_dir}: "
          f"{_plan_stat_bytes(ev)}", flush=True)
    spark.stop()
    results: dict[str, list[float]] = {}
    for rep in range(reps):
        for form in ("lazy", "mat"):
            _prime(sf_dir)
            print(f"  rep{rep} q_psi_drift form={form}", flush=True)
            t = _run_child("q_psi_drift", sf_dir, 3, {"R11_PSI_FORCE": form})
            results.setdefault(form, []).append(t)
    print("\n== psi summary ==", flush=True)
    for form, ts in results.items():
        ok = [t for t in ts if t > 0]
        print(f"{form}: median={statistics.median(ok):.3f}s "
              f"{sorted(round(x,3) for x in ok)}", flush=True)


def main() -> None:
    if sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    phase = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    {"cores": phase_cores, "durability": phase_durability,
     "psi": phase_psi}[phase](sf_dir, reps)


if __name__ == "__main__":
    main()
