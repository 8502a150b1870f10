"""Model-checked invariants for the temporal/graph operators: as-of
join vs a pandas-merge_asof-style Python model, sessionization vs a
linear-scan model, connected components vs a known graph, and the
streaming session_window variant vs its batch recomputation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators import dedup as DD
from assignment_2_dataengineering_spark.operators import temporal as TP
from assignment_2_dataengineering_spark.streaming import ingest, replay, windows


def test_asof_join_matches_python_model(spark):
    """asof_join == latest right row with ts <= left ts per key,
    inclusive ties, null when no prior right row exists."""
    rng = random.Random(11)
    keys = ["a", "b", "c"]
    left = [(k, rng.randrange(0, 100), i) for i, k in enumerate(keys * 8)]
    right = [(k, rng.randrange(0, 100), 1000 + i) for i, k in enumerate(keys * 6)]
    # force an exact-tie case and a no-match key
    left.append(("a", 50, 777))
    right.append(("a", 50, 2000))
    left.append(("z", 10, 888))
    ldf = spark.createDataFrame(left, "k string, ts int, lv int")
    rdf = spark.createDataFrame(right, "k string, ts int, rv int")
    out = TP.asof_join(ldf, rdf, ["k"], right_cols=["rv"])
    got = {(r.k, r.ts, r.lv): (r.rv_right, r.ts_right) for r in out.collect()}
    assert len(got) == len(left)
    for k, ts, lv in left:
        cands = [(rts, rv) for rk, rts, rv in right if rk == k and rts <= ts]
        if not cands:
            assert got[(k, ts, lv)] == (None, None)
        else:
            best_ts = max(rts for rts, _ in cands)
            best_rvs = {rv for rts, rv in cands if rts == best_ts}
            rv, rts = got[(k, ts, lv)]
            assert rts == best_ts and rv in best_rvs


def test_asof_tie_is_inclusive(spark):
    """A right row at exactly the left timestamp matches (>= semantics,
    like DuckDB ASOF and pandas.merge_asof)."""
    ldf = spark.createDataFrame([("a", 10, 1)], "k string, ts int, lv int")
    rdf = spark.createDataFrame([("a", 10, 99)], "k string, ts int, rv int")
    row = TP.asof_join(ldf, rdf, ["k"], right_cols=["rv"]).first()
    assert row.rv_right == 99 and row.ts_right == 10


def test_range_join_matches_python_model(spark):
    """Binned range join == brute-force |Δt| ≤ tol, boundary inclusive,
    no duplicate pairs from the 3-bucket explode."""
    rng = random.Random(5)
    lts = [rng.randrange(0, 2000) for _ in range(60)]
    rts = [rng.randrange(0, 2000) for _ in range(60)]
    lts.append(500)
    rts.append(600)  # exactly tol apart (tol=100) — must match
    ldf = spark.createDataFrame([(i, t) for i, t in enumerate(lts)], "lid int, lt_s long").select(
        "lid", F.timestamp_seconds("lt_s").alias("lt")
    )
    rdf = spark.createDataFrame([(i, t) for i, t in enumerate(rts)], "rid int, rt_s long").select(
        "rid", F.timestamp_seconds("rt_s").alias("rt")
    )
    out = [(r.lid, r.rid) for r in TP.range_join(ldf, rdf, "lt", "rt", 100).collect()]
    model = [
        (li, ri)
        for li, lt in enumerate(lts)
        for ri, rt in enumerate(rts)
        if abs(lt - rt) <= 100
    ]
    assert sorted(out) == sorted(model)  # equality also catches duplicates
    assert (len(lts) - 1, len(rts) - 1) in out  # the exact-boundary pair


def test_sessionize_matches_python_model(spark):
    """Session boundaries, counts, and durations equal a linear scan."""
    rng = random.Random(3)
    rows = []
    for u in range(4):
        t = 0
        for _ in range(25):
            t += rng.choice([60, 300, 2000, 4000])  # mix of intra/inter-gap steps
            rows.append((u, t))
    df = spark.createDataFrame(rows, "user_id int, ts_s long").select(
        "user_id", F.timestamp_seconds("ts_s").alias("ts")
    )
    out = TP.sessionize(df, ["user_id"], gap_minutes=30)
    got = {
        (r.user_id, r.session_id): (
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
            r.duration_s,
        )
        for r in out.collect()
    }
    model = {}
    for u in range(4):
        ts = sorted(t for uu, t in rows if uu == u)
        sid, start, prev, n = 0, ts[0], ts[0], 0
        for t in ts:
            if t - prev > 1800:
                model[(u, sid)] = (start, prev, n, prev - start)
                sid, start, n = sid + 1, t, 0
            n += 1
            prev = t
        model[(u, sid)] = (start, prev, n, prev - start)
    assert got == model


def test_dedup_clusters_transitive_closure(spark):
    """(1,2),(2,3) collapse into one cluster labeled 1; disjoint pair
    and singletons keep their own labels."""
    ids = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in DD.dedup_clusters(pairs, ids).collect()}
    want = {i: i for i in range(1, 13)}
    want.update({2: 1, 3: 1, 11: 10})
    assert got == want


def test_dedup_clusters_long_chain_converges(spark):
    """A 15-node path graph (worst-case diameter for label propagation)
    still converges to a single min-labeled cluster."""
    n = 15
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in DD.dedup_clusters(pairs, ids).collect()}
    assert got == {i: 0 for i in range(n)}


def test_streaming_session_window_vs_batch(spark, tmp_path_factory):
    """Streaming session_window (availableNow replay, append mode) emits
    only watermark-closed sessions, and every emitted session equals the
    batch recomputation over the same events."""
    lines = __import__("tests.fixtures.nem", fromlist=["nem"]).event_stream()
    src = str(tmp_path_factory.mktemp("sess_replay"))
    replay.write_replay_chunks(lines, src, events_per_file=200)
    stream = replay.file_replay_stream(spark, src)
    fac = ingest.facility_branch(ingest.parse_events(stream))
    sess = windows.session_window_sums(fac, "facility_id", ["power_mw"], gap="6 minutes")
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_sess")))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sess_sink")
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    batch = windows.session_window_sums(
        ingest.facility_branch(ingest.parse_events(raw)), "facility_id", ["power_mw"], gap="6 minutes"
    )
    emitted = got.count()
    assert emitted > 0
    joined = got.join(
        batch,
        ["session_start", "session_end", "facility_id", "n_events", "sum_power_mw"],
    ).count()
    assert joined == emitted


def test_windowed_funnel_timestamp_tied_purchase_does_not_mask(spark, tmp_path):
    """A purchase at the EXACT click microsecond must neither convert
    (contract is strictly-after) nor mask a later within-hour purchase.
    Historically the inclusive forward as-of carried the tied purchase
    (gap 0 → conv 0) and hid the converting one; the +1 µs probe fixes
    it. Also pins: tied purchase with NO later one → not converted."""
    import datetime as dt

    from assignment_2_dataengineering_spark.plans.queries_temporal import (
        q_windowed_funnel,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click + purchase at same instant + purchase 10 min later
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0, 1, "purchase", 5.0, "{}"),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 5.0, "{}"),
        # user 2: click + ONLY a timestamp-tied purchase -> no conversion
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0, 2, "purchase", 5.0, "{}"),
        # user 3: click + purchase 2h later -> outside horizon
        (6, t0, 3, "click", 1.0, "{}"),
        (7, t0 + dt.timedelta(hours=2), 3, "purchase", 5.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_windowed_funnel(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_clicks"] == 3
    assert r["n_converted"] == 1  # only user 1
    assert abs(r["conversion_rate"] - round(1 / 3, 6)) < 1e-9


def test_asof_join_carries_whole_rows_not_torn_columns(spark):
    """A NULL field in the LATEST right row must come through as NULL —
    not be back-filled from an older right row (whole-row carry, the
    merge_asof/DuckDB ASOF contract). Historically each payload column
    was carried independently with last(ignorenulls), producing a row
    that never existed."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rdf = spark.createDataFrame(
        [(1, t(1), 5.0, 10.0), (1, t(2), None, 20.0)],
        "k long, ts timestamp, a double, b double",
    )
    ldf = spark.createDataFrame([(1, t(3))], "k long, ts timestamp")
    row = TP.asof_join(ldf, rdf, ["k"], right_cols=["a", "b"]).first()
    assert row["ts_right"] == t(2)
    assert row["b_right"] == 20.0
    assert row["a_right"] is None  # NOT 5.0 from the older row
    # forward direction: same contract
    ldf2 = spark.createDataFrame([(1, t(0))], "k long, ts timestamp")
    fwd = TP.asof_join(
        ldf2, rdf, ["k"], right_cols=["a", "b"], direction="forward"
    ).first()
    assert fwd["ts_right"] == t(1) and fwd["a_right"] == 5.0


def test_range_join_exact_buckets_beyond_2_53_and_pre_epoch(spark):
    """Bucket arithmetic must stay exact for far-future sentinel
    timestamps (9999-12-31 ≈ 2.5e17 µs > 2^53, where double division
    rounds) and floor correctly for pre-1970 timestamps (truncating
    division would shift negative buckets)."""
    import datetime as dt

    far = dt.datetime(9999, 12, 30, 23, 59, 59)
    near_far = far + dt.timedelta(seconds=30)
    pre = dt.datetime(1969, 12, 31, 23, 59, 40)
    pre2 = dt.datetime(1970, 1, 1, 0, 0, 10)
    ldf = spark.createDataFrame(
        [(1, far), (2, pre)], "lid long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        [(10, near_far), (20, pre2), (30, dt.datetime(2024, 1, 1))],
        "rid long, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in TP.range_join(ldf, rdf, "lts", "rts", tolerance_s=60).collect()
    }
    assert got == {(1, 10), (2, 20)}
