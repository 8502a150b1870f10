#!/usr/bin/env python
"""Run bench.py at several scale-factor directories and print the
SCALE.md scaling table (per-query walls side by side + ratio columns).

This makes the above-sf0.1 scaling study (SCALE.md §6g) reproducible:
    python scripts/bench_scale.py /root/testdata/sf0.1 \
        /root/repo/.benchdata/sf1 /root/repo/.benchdata/sf10

Each SF runs in a FRESH interpreter (bench.py subprocess) so JVM heap
state from a smaller SF never flatters a bigger one. Ratios are
reported against the FIRST directory. Output: the markdown table on
stdout plus one bench JSON line per SF echoed as it lands.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    # single-JVM local mode: driver heap is executor heap — size it for
    # the largest SF instead of the 8g test default
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith('{"metric"')][-1]
    print(line, flush=True)
    return json.loads(line)


def main() -> None:
    dirs = sys.argv[1:]
    if len(dirs) < 2:
        sys.exit("usage: bench_scale.py BASE_SF_DIR BIGGER_SF_DIR [...]")
    results = [run_bench(d) for d in dirs]
    base = results[0]
    names = [os.path.basename(d.rstrip("/")) for d in dirs]

    hdr = ["query", f"{names[0]} s"]
    for n in names[1:]:
        hdr += [f"{n} s", f"ratio vs {names[0]}"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    rows = []
    for q, t0 in base["queries"].items():
        row = [q, f"{t0:.3f}"]
        worst = 0.0
        for r in results[1:]:
            t = r["queries"].get(q)
            if t is None:
                row += ["—", "—"]
                continue
            ratio = t / t0 if t0 else float("inf")
            worst = max(worst, ratio)
            row += [f"{t:.3f}", f"{ratio:.2f}×"]
        rows.append((worst, row))
    for _, row in sorted(rows, reverse=True):
        print("| " + " | ".join(row) + " |")

    for key in ("value", "core11_wall", "stream_eps", "stream_state_eps",
                "stream_dedup_dps"):
        vals = " / ".join(
            f"{n}={r.get(key)}" for n, r in zip(names, results)
        )
        print(f"{key}: {vals}")


if __name__ == "__main__":
    main()
