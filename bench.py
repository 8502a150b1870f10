#!/usr/bin/env python
"""Headline benchmark: run the bench-tagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Materialization is a noop-format write: the full plan executes on the
cluster but nothing crosses back to the driver, so the number measures
the engine, not result transfer.

Methodology: each query runs once untimed (JIT/codegen/Arrow warm-up),
then THREE timed runs; the reported per-query number is the MEDIAN —
with 36 headline queries in one session, a single timed run cannot
separate a real regression from JIT/GC/cache variance (round-3 verdict:
six queries "regressed" 24-50% on sub-second absolute deltas that were
all noise). The timed window covers plan CONSTRUCTION plus execution —
the iterative operators (IVF/PQ training) execute eagerly during
construction, and excluding that understated them. Reported numbers are
steady-state engine cost, not first-run cold cost.

Streaming: three throughput numbers over ~100k fixture events each,
covering the three maintenance shapes — watermarked window aggregation
(stream_eps), applyInPandasWithState latest-snapshot (stream_state_eps),
and the persisted LSH dedup-index foreachBatch path (stream_dedup_dps,
in docs/s over the sf documents table). Each is guarded: a streaming
failure must not take down the batch bench line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TIMED_RUNS = 3


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
        runs = []
        for _ in range(TIMED_RUNS):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[spec.name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)

    # ---- streaming throughput -------------------------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

    def _run_stream(build, warm_up: bool = True):
        """build(spark) -> (streaming_writer_ready_to_start, n_events);
        returns events/sec through the started query, or None. The
        clock starts AFTER build() returns: fixture generation (replay
        chunk writes, the documents re-partition) is setup, not engine
        throughput — timing it understated the stream numbers.

        warm_up runs one full UNTIMED pass of the same stream first,
        mirroring the batch queries' untimed first run: the first
        streaming query in a session pays Python-worker spawn, state
        store init, and codegen — measured cold-vs-warm spread on the
        stateful path was 9.5k vs 40k+ ev/s on identical code, which
        made single-cold-run numbers pure launch-noise round over
        round. The dedup bench manages its own warm-up inside build()
        (the index dir must differ between warm and timed runs)."""
        try:
            if warm_up:
                w_writer, _ = build(spark)
                wq = w_writer.option(
                    "checkpointLocation", tempfile.mkdtemp(prefix="bench_ckpt_warm_")
                ).start()
                wq.awaitTermination(600)
            writer, n = build(spark)
            t0 = time.perf_counter()
            q = writer.option(
                "checkpointLocation", tempfile.mkdtemp(prefix="bench_ckpt_")
            ).start()
            q.awaitTermination(600)
            return round(n / (time.perf_counter() - t0))
        except Exception:
            return None

    def _event_source(spark):
        """~101k NEM fixture events as a file-replay stream."""
        from fixtures import nem

        from assignment_2_dataengineering_spark.streaming import replay

        lines = nem.event_stream() * 100
        src = tempfile.mkdtemp(prefix="bench_stream_")
        replay.write_replay_chunks(lines, src, events_per_file=50_000)
        stream = replay.file_replay_stream(spark, src, max_files_per_trigger=100)
        return stream, len(lines)

    def _window_bench(spark):
        # parse → route → watermarked tumbling sums: the reference's
        # whole dashboard pipeline (its producer paces 10 events/s,
        # publisher.py:27 — this is the engine-side number against it)
        from assignment_2_dataengineering_spark.streaming import ingest, windows

        stream, n = _event_source(spark)
        agg = windows.tumbling_window_sums(
            ingest.facility_branch(ingest.parse_events(stream)),
            "facility_id",
            ["power_mw", "co2_tonnes"],
            watermark="6 hours",
        )
        return (
            agg.writeStream.outputMode("update")
            .format("noop")
            .trigger(availableNow=True)
        ), n

    def _stateful_bench(spark):
        # applyInPandasWithState latest-per-key snapshot with
        # field-level backfill — the custom stateful operator path
        from assignment_2_dataengineering_spark.streaming import ingest, snapshot

        stream, n = _event_source(spark)
        snap = snapshot.stateful_latest_snapshot(
            ingest.facility_branch(ingest.parse_events(stream)),
            "facility_id",
            ["power_mw", "co2_tonnes"],
        )
        return (
            snap.writeStream.outputMode("update")
            .format("noop")
            .trigger(availableNow=True)
        ), n

    def _dedup_index_bench(spark):
        # persisted-LSH incremental near-dup index: docs stream through
        # foreachBatch, each batch probed against all history
        from assignment_2_dataengineering_spark.streaming.dedup_index import (
            incremental_near_dup_batch,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        src = tempfile.mkdtemp(prefix="bench_docs_")
        # two micro-batches: the second probes the first's persisted
        # index, so the incremental path is exercised, while the
        # trigger is sized for throughput like the other stream
        # benches (which process their ~100k events in 1-3 triggers —
        # r5's 4 tiny probes measured per-trigger fixed overhead, not
        # the engine; batch size is the standard streaming
        # throughput/latency dial and this picks the throughput end)
        docs.repartition(2).write.mode("overwrite").parquet(src)
        # untimed warm-up, mirroring the batch queries' untimed first
        # run (docstring: reported numbers are steady-state engine
        # cost): two worker batches on a THROWAWAY index compile the
        # cold and with-history codegen shapes once, outside the clock
        warm = incremental_near_dup_batch(
            tempfile.mkdtemp(prefix="bench_ndidx_warm_"), max_bucket_size=64
        )
        warm_docs = docs.limit(400)
        warm(warm_docs.filter("doc_id % 2 = 0"), 0)
        warm(warm_docs.filter("doc_id % 2 = 1"), 1)
        worker = incremental_near_dup_batch(
            tempfile.mkdtemp(prefix="bench_ndidx_"), max_bucket_size=64
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream.writeStream.foreachBatch(worker).trigger(availableNow=True), n

    stream_eps = _run_stream(_window_bench)
    stream_state_eps = _run_stream(_stateful_bench)
    stream_dedup_dps = _run_stream(_dedup_index_bench, warm_up=False)

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
                "timed_runs_per_query": TIMED_RUNS,
                "core11_wall": round(
                    sum(timings[q] for q in core11 if q in timings), 3
                ),
                "stream_eps": stream_eps,
                "stream_state_eps": stream_state_eps,
                "stream_dedup_dps": stream_dedup_dps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
