#!/usr/bin/env python
"""Round-8 measurement queue (serialized so readings don't contend):
1. q_boilerplate key-width A/B at sf100 (hash vs exact, staged).
2. q_pagerank checkpoint-cadence A/B at sf10 and sf100 (k=1 vs k=2).
3. sketch/embedding maintenance curves at sf1 and sf10.
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


def profile_stage(stage, sf_dir):
    prime_page_cache(sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/profile_boilerplate.py"),
         "--child", stage, sf_dir],
        env=ENV, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("STAGE="):
            return line
    return f"STAGE={stage} FAILED"


def main():
    sf100 = os.path.join(REPO, ".benchdata", "sf100")
    sf10 = os.path.join(REPO, ".benchdata", "sf10")
    sf1 = os.path.join(REPO, ".benchdata", "sf1")

    print("== phase 1: boilerplate key-width A/B at sf100", flush=True)
    for sweep in (1, 2):
        for stage in ("dfreq_hash", "full", "full_exact"):
            print(f"sweep{sweep} {profile_stage(stage, sf100)}", flush=True)

    print("== phase 2: pagerank checkpoint cadence A/B", flush=True)
    for sf_name, sf_dir in (("sf10", sf10), ("sf100", sf100)):
        for k in ("1", "2"):
            for rep in (1, 2):
                t = child_bench("q_pagerank", sf_dir,
                                {"SPARK_GRAFT_PR_CHECKPOINT_EVERY": k})
                print(f"pagerank {sf_name} k={k} rep{rep}: {t:.2f}s", flush=True)

    print("== phase 3: maintenance curves", flush=True)
    for sf_name, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/bench_streams_scale.py"),
             sf_dir, "sketch_maintain,embedding_index"],
            env=ENV, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(f"streams {sf_name}: {line}", flush=True)


if __name__ == "__main__":
    main()
