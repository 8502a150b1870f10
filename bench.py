#!/usr/bin/env python
"""Headline benchmark: run the bench-tagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Materialization is a noop-format write: the full plan executes on the
cluster but nothing crosses back to the driver, so the number measures
the engine, not result transfer.

Methodology: each query runs once untimed (JIT/codegen/Arrow warm-up),
then once timed. The timed window covers plan CONSTRUCTION plus
execution — the iterative operators (IVF/PQ training) execute eagerly
during construction, and excluding that understated them. Reported
numbers are steady-state engine cost, not first-run cold cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from assignment_2_dataengineering_spark.plans.registry import all_specs
    from assignment_2_dataengineering_spark.session import get_spark

    spark = get_spark(app_name="a2de-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the measured window
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    specs = [s for s in all_specs().values() if s.bench]
    timings: dict[str, float] = {}
    for spec in specs:
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)

    # Streaming throughput: ~100k fixture events through the real
    # ingest pipeline (file stream → parse → route → watermarked
    # window sums, noop sink, availableNow). The reference's producer
    # paces 10 events/s (publisher.py:27) — this is the engine-side
    # number to hold against it. Guarded: a streaming failure must not
    # take down the batch bench line.
    stream_eps = None
    try:
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from fixtures import nem

        from assignment_2_dataengineering_spark.streaming import (
            ingest,
            replay,
            windows,
        )

        lines = nem.event_stream() * 100
        src = tempfile.mkdtemp(prefix="bench_stream_")
        replay.write_replay_chunks(lines, src, events_per_file=50_000)
        t0 = time.perf_counter()
        stream = replay.file_replay_stream(spark, src, max_files_per_trigger=100)
        agg = windows.tumbling_window_sums(
            ingest.facility_branch(ingest.parse_events(stream)),
            "facility_id",
            ["power_mw", "co2_tonnes"],
            watermark="6 hours",
        )
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="bench_ckpt_"))
            .start()
        )
        q.awaitTermination(600)
        stream_eps = round(len(lines) / (time.perf_counter() - t0))
    except Exception:
        pass
    # The headline set GROWS round over round as operators land, so the
    # total is not longitudinally comparable. core11_wall is the fixed
    # round-1 query set — the stable cross-round trend line.
    core11 = [
        "q_groupby_sum", "q_window_agg", "q_join_broadcast", "q_left_join",
        "q_latest_per_key", "q_pivot", "q_unpivot", "q_text_quality",
        "q_dedup_exact", "q_dedup_minhash_lsh", "q_ann_bruteforce",
    ]
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "core11_wall": round(
                    sum(timings[q] for q in core11 if q in timings), 3
                ),
                "stream_eps": stream_eps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
