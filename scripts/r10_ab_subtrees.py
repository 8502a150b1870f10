#!/usr/bin/env python
"""Old-vs-new equivalence + interleaved timing A/B for the round-10
re-planned-subtree fixes.

OLD implementations come from a git worktree of the pre-change HEAD
(passed as argv[1]); NEW from the live repo. For each query:

  1. EXACT-MATCH check: collect both results, canonicalize (sorted
     tuples, repr of every cell so -0.0/0.0 and NaN differences would
     surface), assert equality at the given SF.
  2. Interleaved timing: alternate old/new noop executions in ONE
     warmed JVM (the round's binding A/B discipline — this host's
     fresh-JVM scheduling variance is documented at baseline), report
     per-variant medians.

Usage:
  python scripts/r10_ab_subtrees.py OLD_REPO SF_DIR [reps] [q ...]
"""
from __future__ import annotations

import importlib
import statistics
import sys
import time

NEW_REPO = "/root/repo"

QUERIES = [
    "q_balance_audit",
    "q_psi_drift",
    "q_cooccurrence",
    "q_user_similarity",
    "q_prob_linkage",
    "q_funnel",
    "q_funnel_latency",
    "q_matryoshka",
    "q_join_cardinality",
    "q_dataset_card",
]


def _load_registry(repo: str):
    """Import the registry rooted at `repo`, evicting any previously
    imported copy of the package so module state does not leak between
    the two variants."""
    for mod in list(sys.modules):
        if mod.startswith("assignment_2_dataengineering_spark"):
            del sys.modules[mod]
    sys.path.insert(0, repo)
    try:
        reg = importlib.import_module(
            "assignment_2_dataengineering_spark.plans.registry"
        )
        return {n: s.fn for n, s in reg.all_specs().items()}
    finally:
        sys.path.remove(repo)


def canon(df):
    return sorted(tuple(repr(c) for c in row) for row in df.collect())


def main() -> None:
    old_repo = sys.argv[1]
    sf_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4:] or QUERIES

    old_fns = _load_registry(old_repo)
    new_fns = _load_registry(NEW_REPO)

    from assignment_2_dataengineering_spark.session import get_spark

    spark = get_spark(app_name="r10-ab-subtrees")
    spark.sparkContext.setLogLevel("ERROR")

    def run_noop(fn):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        # 1. exact match
        a = canon(old_fns[name](spark, sf_dir))
        b = canon(new_fns[name](spark, sf_dir))
        match = a == b
        print(f"{name} EXACT_MATCH={match} rows={len(a)}/{len(b)}", flush=True)
        if not match:
            diff_printed = False
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}: {x} vs {y}", flush=True)
                    diff_printed = True
                    break
            if not diff_printed:
                # all shared-prefix rows equal: the mismatch is a length
                # difference (r10 ADVICE — zip alone showed no diagnostic)
                longer, label = (a, "old") if len(a) > len(b) else (b, "new")
                print(
                    f"  len mismatch: old={len(a)} new={len(b)}; first "
                    f"extra {label} row: {longer[min(len(a), len(b))]}",
                    flush=True,
                )
            continue
        if reps == 0:  # equivalence-only mode
            continue
        # 2. interleaved timing (warm-up one run each, untimed)
        run_noop(old_fns[name]); run_noop(new_fns[name])
        olds, news = [], []
        for _ in range(reps):
            olds.append(run_noop(old_fns[name]))
            news.append(run_noop(new_fns[name]))
        print(
            f"{name} old_med={statistics.median(olds):.3f}s "
            f"new_med={statistics.median(news):.3f}s "
            f"olds={[round(x,3) for x in olds]} news={[round(x,3) for x in news]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
