#!/usr/bin/env python
"""Round-10 measurement queue (serialized; fresh-JVM subprocess per
reading — the r9 lesson that a lingering py4j JVM distorts later
phases, SCALE.md §6l):

0. Graph-bucket granularity calibration (round-9 judge item #8): the
   two-phase global lead's bucket dial (SPARK_GRAFT_GRAPH_BUCKET,
   default "hour") is the last hand-set strategy knob. Measure the
   edge derivation at sf10 and sf100 under minute/hour/day buckets
   plus the per-bucket row statistics, derive the rows-per-bucket
   threshold, make the default scale-aware.
1. sf100 capped containment key-width A/B, two sweeps (round-9 judge
   item #4): r9 recorded sf100 capped numbers for Jaccard only; this
   confirms (or bounds) the hashed-key win on the second consumer
   under matched conditions.
2. PageRank sf100 variance chase (round-9 judge item #5): the r9
   same-config reps read 82.0 vs 43.8 s. Isolated fresh-JVM reps at
   sf100 under cadence k=2 (auto) and k=1, each reporting wall AND
   total JVM GC pause from the collector MXBeans — if the spread rides
   the GC column under k=2 and collapses under k=1, the churn is
   localCheckpoint block turnover (the §6k mechanism); if the spread
   persists with flat GC, it is ambient.
3. Streaming near-dup per-trigger cost breakdown (round-9 judge item
   #6) at sf0.1 and sf1 via scripts/profile_stream_dedup.py: attribute
   the ~1,000 docs/s to banding / writes / history probe / verify.
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


def run_child(code: str, extra_env: dict | None = None, timeout: int = 2400) -> None:
    env = dict(ENV)
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith(("calib ", "pr ", "WALL", "SECTIONS")):
            print(line, flush=True)


def phase0_graph_bucket(tiers) -> None:
    """Timed edge derivation per bucket granularity + the statistics
    that calibrate the selector. One fresh JVM per (tier, bucket)."""
    stats_code = """
import sys; sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from assignment_2_dataengineering_spark.session import get_spark
from assignment_2_dataengineering_spark.sources.tables import load_table
spark = get_spark(app_name='r10-graph-stats')
spark.sparkContext.setLogLevel('ERROR')
ev = load_table(spark, %(sf_dir)r, 'events').select('event_type', 'ts')
n = ev.count()
span = ev.agg((F.unix_timestamp(F.max('ts')) - F.unix_timestamp(F.min('ts'))).alias('s')).first()['s']
for b in ('minute', 'hour', 'day'):
    g = ev.groupBy('event_type', F.date_trunc(b, 'ts')).count()
    r = g.agg(F.count('*').alias('nb'), F.max('count').alias('mx'), F.avg('count').alias('av')).first()
    print(f"calib %(name)s bucket={b} n_buckets={r['nb']} max_rows={r['mx']} avg_rows={r['av']:.0f}", flush=True)
print(f"calib %(name)s n_events={n} span_hours={span/3600:.0f}", flush=True)
spark.stop()
"""
    timed_code = """
import sys, time; sys.path.insert(0, %(repo)r)
from assignment_2_dataengineering_spark.plans.queries_graph import _user_edges
from assignment_2_dataengineering_spark.session import get_spark
spark = get_spark(app_name='r10-graph-bucket')
spark.sparkContext.setLogLevel('ERROR')
def run():
    t0 = time.perf_counter()
    _user_edges(spark, %(sf_dir)r, bucket=%(bucket)r).write.format('noop').mode('overwrite').save()
    return time.perf_counter() - t0
first = run()
spark.sparkContext._jvm.System.gc(); import time as _t; _t.sleep(2)
repeat = run()
print(f"calib %(name)s edges bucket=%(bucket)s first={first:.2f} repeat={repeat:.2f} min={min(first, repeat):.2f}", flush=True)
spark.stop()
"""
    for name, sf_dir in tiers:
        prime_page_cache(sf_dir)
        run_child(stats_code % {"repo": REPO, "sf_dir": sf_dir, "name": name})
        for bucket in ("minute", "hour", "day"):
            prime_page_cache(sf_dir)
            run_child(
                timed_code
                % {"repo": REPO, "sf_dir": sf_dir, "name": name, "bucket": bucket}
            )


def phase2_pagerank_variance(sf100: str, sweeps: int = 2) -> None:
    code = """
import sys, time; sys.path.insert(0, %(repo)r)
from assignment_2_dataengineering_spark.plans.registry import all_specs
from assignment_2_dataengineering_spark.session import get_spark
spark = get_spark(app_name='r10-pr-variance')
spark.sparkContext.setLogLevel('ERROR')
def gc_ms():
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
q = all_specs()['q_pagerank'].fn
g0 = gc_ms(); t0 = time.perf_counter()
q(spark, %(sf_dir)r).write.format('noop').mode('overwrite').save()
wall = time.perf_counter() - t0; gc = gc_ms() - g0
print(f"pr k=%(k)s rep=%(rep)d wall={wall:.1f}s gc={gc/1000:.1f}s", flush=True)
spark.stop()
"""
    for sweep in range(1, sweeps + 1):
        for k in ("auto", "1"):
            prime_page_cache(sf100)
            run_child(
                code % {"repo": REPO, "sf_dir": sf100, "k": k, "rep": sweep},
                extra_env={"SPARK_GRAFT_PR_CHECKPOINT_EVERY": k},
            )


def main() -> None:
    sf100 = os.path.join(REPO, ".benchdata", "sf100")
    sf10 = os.path.join(REPO, ".benchdata", "sf10")
    sf1 = os.path.join(REPO, ".benchdata", "sf1")
    phases = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
        "0", "1", "2", "3"}

    if "0" in phases:
        print("== phase 0: graph-bucket granularity calibration", flush=True)
        phase0_graph_bucket((("sf10", sf10), ("sf100", sf100)))

    if "1" in phases:
        print("== phase 1: sf100 capped containment key-width A/B", flush=True)
        from scripts.profile_shingle import SF100_CONT_STAGES

        for sweep in (1, 2):
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts/profile_shingle.py"),
                 sf100, *SF100_CONT_STAGES],
                env=ENV, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True)
            for line in out.stdout.splitlines():
                if line.startswith("STAGE="):
                    print(f"cont sf100 sweep{sweep} {line}", flush=True)

    if "2" in phases:
        print("== phase 2: pagerank sf100 variance (wall + GC)", flush=True)
        phase2_pagerank_variance(sf100)

    if "3" in phases:
        print("== phase 3: stream-dedup per-trigger breakdown", flush=True)
        for name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            prime_page_cache(sf_dir)
            out = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/profile_stream_dedup.py"), sf_dir],
                env=ENV, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, timeout=2400)
            for line in out.stdout.splitlines():
                if line.startswith(("WALL", "SECTIONS")):
                    print(f"sdedup {name} {line}", flush=True)


if __name__ == "__main__":
    main()
