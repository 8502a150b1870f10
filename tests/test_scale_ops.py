"""Unit invariants for the scale-pattern operators (queries_scale /
queries_corpus): salted-join equivalence under skew, merge-upsert
semantics, sequence-packing invariants, decontamination soundness,
entropy bounds. The oracle-parity test covers exact cross-engine
values; these pin the operator CONTRACTS on adversarial inputs the
synthetic tables don't contain (hot keys, null fields, deletes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.relational import (
    merge_upsert,
    salted_join,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestSaltedJoin:
    def test_equivalent_to_plain_join_under_skew(self, spark):
        # 90% of fact rows hit one hot key — the case salting exists for.
        big = spark.range(1000).select(
            F.col("id").alias("rid"),
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 5).alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        small = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e")], ["k2", "label"]
        )
        plain = big.join(small, big["k"] == small["k2"]).select("rid", "label")
        salted = salted_join(big, small, "k", "k2", salt_from="rid", salts=8).select(
            "rid", "label"
        )
        assert _rows(salted, "rid", "label") == _rows(plain, "rid", "label")

    def test_spreads_hot_key_across_salts(self, spark):
        big = spark.range(512).select(F.col("id").alias("rid"), F.lit(1).alias("k"))
        small = spark.createDataFrame([(1,)], ["k2"])
        salted_big = big.withColumn("__salt", F.pmod(F.xxhash64("rid"), F.lit(8)))
        n_salts = salted_big.select("__salt").distinct().count()
        assert n_salts == 8  # one hot key fans into all 8 sub-keys
        # and the join still returns every row exactly once
        assert salted_join(big, small, "k", "k2", salt_from="rid", salts=8).count() == 512

    def test_left_join_preserves_unmatched(self, spark):
        big = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "v"])
        small = spark.createDataFrame([(1, "x")], ["k2", "label"])
        out = salted_join(big, small, "k", "k2", salt_from="v", salts=4, how="left")
        assert out.count() == 3
        assert out.filter(F.col("label").isNull()).count() == 2


class TestMergeUpsert:
    def test_update_insert_persist(self, spark):
        target = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "bal"]
        )
        source = spark.createDataFrame(
            [(2, "b2", 99.0), (4, "d", 40.0)], ["k", "name", "bal"]
        )
        out = _rows(merge_upsert(target, source, ["k"]), "k", "name", "bal")
        assert out == [(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)]

    def test_null_source_field_keeps_target_value(self, spark):
        # F15 null-safe field-merge semantics (streaming/snapshot.py parity)
        target = spark.createDataFrame([(1, "a", 10.0)], ["k", "name", "bal"])
        source = spark.createDataFrame(
            [(1, None, 99.0)], schema="k int, name string, bal double"
        )
        out = _rows(merge_upsert(target, source, ["k"]), "k", "name", "bal")
        assert out == [(1, "a", 99.0)]

    def test_source_derived_from_target_lineage(self, spark):
        # The CDC extract usually derives from the target frame itself;
        # must not trip the ambiguous-self-join analyzer.
        target = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "bal"])
        source = target.filter(F.col("k") == 1).withColumn("bal", F.col("bal") + 5)
        out = _rows(merge_upsert(target, source, ["k"]), "k", "bal")
        assert out == [(1, 15.0), (2, 20.0)]


class TestSequencePack:
    def test_invariants(self, spark, sf_dir):
        from assignment_2_dataengineering_spark.plans.queries_corpus import (
            _PACK_BUDGET,
            q_sequence_pack,
        )

        out = q_sequence_pack(spark, sf_dir)
        rows = out.collect()
        assert len(rows) > 0
        by_source: dict[str, list] = {}
        for r in rows:
            by_source.setdefault(r.source, []).append(r)
        for docs in by_source.values():
            docs.sort(key=lambda r: r.doc_id)
            # offsets are the exclusive running sum, chunk ids monotone
            run = 0
            for r in docs:
                assert r.start_offset == run
                assert r.chunk_id == run // _PACK_BUDGET
                run += r.n_tokens

    def test_chunks_contiguous(self, spark, sf_dir):
        from assignment_2_dataengineering_spark.plans.queries_corpus import (
            q_sequence_pack,
        )

        out = q_sequence_pack(spark, sf_dir)
        chunks = (
            out.groupBy("source", "chunk_id")
            .count()
            .groupBy("source")
            .agg(F.min("chunk_id").alias("lo"), F.max("chunk_id").alias("hi"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in chunks:
            assert r.lo == 0 and r.n == r.hi - r.lo + 1  # no gaps


class TestDecontaminate:
    def test_no_eval_docs_in_output_and_overlap_real(self, spark, sf_dir):
        from assignment_2_dataengineering_spark.plans.queries_corpus import (
            _DECON_N,
            _EVAL_MOD,
            q_decontaminate,
        )
        from assignment_2_dataengineering_spark.functions.text import (
            shingles_from_tokens,
            tokens_ws,
        )
        from assignment_2_dataengineering_spark.sources.tables import load_table

        out = q_decontaminate(spark, sf_dir)
        flagged = out.collect()
        assert all(r.doc_id % _EVAL_MOD != 0 for r in flagged)
        assert all(r.n_shared >= 1 for r in flagged)
        if not flagged:
            return
        # spot-verify one flagged doc truly shares a 5-gram with the eval set
        docs = load_table(spark, sf_dir, "documents")
        sh = docs.select(
            "doc_id",
            F.explode(shingles_from_tokens(tokens_ws(F.col("text")), _DECON_N)).alias("s"),
        )
        probe = flagged[0].doc_id
        ev = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select("s").distinct()
        n = sh.filter(F.col("doc_id") == probe).join(ev, "s").select("s").distinct().count()
        assert n == flagged[0].n_shared


class TestCharEntropy:
    def test_bounds_and_known_values(self, spark):
        from assignment_2_dataengineering_spark.plans import queries_corpus  # noqa: F401

        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "ab"), (3, "abcd")], ["doc_id", "text"]
        )
        chars = df.select(
            "doc_id", F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch")
        )
        cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
        total = F.sum("c")
        s = F.sum(F.col("c") * F.log2("c"))
        ent = cnt.groupBy("doc_id").agg(
            F.round((total * F.log2(total) - s) / total, 4).alias("entropy")
        )
        got = {r.doc_id: r.entropy for r in ent.collect()}
        assert got == {1: 0.0, 2: 1.0, 3: 2.0}  # uniform over 2^k chars → k bits


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's skew posture has two tiers: deterministic salting
    (salted_join, oracle-pinned) and AQE's runtime skew split. This
    pins the second: a join with one hot key (83% of rows) under
    production-shaped thresholds gets its hot partition SPLIT at
    runtime — the executed plan says SortMergeJoin(skew=true) with a
    'skewed' AQEShuffleRead — and returns exactly the rows the plain
    join returns. Broadcast is disabled to force the shuffle join
    (AQE's broadcast conversion would otherwise dodge the skew
    entirely, which is tier zero)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") < 250000, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
        # semantics unchanged by the split (250000 hot + 50 ids ≥ 250000
        # whose id % 1000 == 0 also land on key 0)
        assert len(rows) == 300000
        assert sum(1 for r in rows if r["k"] == 0) == 250050
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


class TestScd2Merge:
    """operators/relational.scd2_merge — version-chain semantics across
    sequential CDC batches (the oracle covers one batch; this pins the
    chain)."""

    def _dim(self, spark, rows):
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
            TimestampType,
        )

        schema = StructType(
            [
                StructField("k", LongType()),
                StructField("bal", DoubleType()),
                StructField("valid_from", TimestampType()),
                StructField("valid_to", TimestampType()),
            ]
        )
        return spark.createDataFrame(rows, schema)

    def test_two_batch_version_chain(self, spark):
        import datetime as dt

        from assignment_2_dataengineering_spark.operators.relational import (
            scd2_merge,
        )

        t0 = dt.datetime(2020, 1, 1)
        t1 = dt.datetime(2021, 1, 1)
        t2 = dt.datetime(2022, 1, 1)
        target = self._dim(spark, [(1, 10.0, t0, None), (2, 20.0, t0, None)])
        upd = lambda rows: spark.createDataFrame(rows, "k long, bal double, ts timestamp")

        # batch 1: key 1 changes, key 2 no-op, key 3 inserts
        v1 = scd2_merge(
            target, upd([(1, 11.0, t1), (2, 20.0, t1), (3, 30.0, t1)]),
            keys=["k"], attrs=["bal"],
        )
        # batch 2: key 1 changes again
        v2 = scd2_merge(v1, upd([(1, 12.0, t2)]), keys=["k"], attrs=["bal"])
        rows = sorted(
            (r["k"], r["bal"], r["valid_from"], r["valid_to"]) for r in v2.collect()
        )
        assert rows == [
            (1, 10.0, t0, t1),   # closed by batch 1
            (1, 11.0, t1, t2),   # closed by batch 2
            (1, 12.0, t2, None),  # current
            (2, 20.0, t0, None),  # no-op never versioned
            (3, 30.0, t1, None),  # inserted current
        ]
        # exactly one current row per key, and chains are contiguous
        cur = [r for r in rows if r[3] is None]
        assert sorted(r[0] for r in cur) == [1, 2, 3]


class TestApplyChangelog:
    """operators/relational.apply_changelog — tombstone-aware CDC fold
    (cited from plans/queries_scale.py q_cdc_apply)."""

    def _apply(self, spark, snap_rows, chg_rows):
        from assignment_2_dataengineering_spark.operators.relational import (
            apply_changelog,
        )

        snap = spark.createDataFrame(snap_rows, "k long, v string")
        chg = spark.createDataFrame(chg_rows, "k long, v string, seq long, op string")
        out = apply_changelog(snap, chg, keys=["k"], order=["seq"])
        return {r.k: r.v for r in out.collect()}

    def test_upsert_delete_insert_passthrough(self, spark):
        got = self._apply(
            spark,
            [(1, "a"), (2, "b"), (3, "c")],
            [
                (1, "a2", 10, "U"),   # update existing
                (2, None, 11, "D"),   # delete existing
                (4, "d", 12, "U"),    # insert new key
            ],
        )
        assert got == {1: "a2", 3: "c", 4: "d"}

    def test_only_trailing_change_wins(self, spark):
        # key 1: U then D => gone; key 2: D then U => resurrected
        got = self._apply(
            spark,
            [(1, "a"), (2, "b")],
            [
                (1, "a2", 1, "U"),
                (1, None, 2, "D"),
                (2, None, 1, "D"),
                (2, "b2", 2, "U"),
            ],
        )
        assert got == {2: "b2"}

    def test_delete_of_absent_key_is_noop(self, spark):
        got = self._apply(spark, [(1, "a")], [(9, None, 1, "D")])
        assert got == {1: "a"}

    def test_upsert_row_wins_wholesale(self, spark):
        # unlike merge_upsert's per-column coalesce, a CDC post-image
        # replaces the row: a NULL attr in the last change IS the value
        got = self._apply(spark, [(1, "a")], [(1, None, 1, "U")])
        assert got == {1: None}


def test_snapshot_diff_roundtrip_and_delta_sized(spark, sf_dir):
    """apply_changelog(old, diff) == new — the diff/apply round-trip
    law, plus: the diff contains only changed keys."""
    from assignment_2_dataengineering_spark.operators.relational import (
        apply_changelog,
        snapshot_diff,
    )
    from assignment_2_dataengineering_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v_old = orders.filter(F.col("o_orderkey") % 97 != 3)
    v_new = orders.filter(F.col("o_orderkey") % 89 != 7).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 31 == 5, F.lit("R"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    diff = snapshot_diff(v_old, v_new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])

    # adapt the diff to apply_changelog's changelog contract: post-image
    # columns + op (I/U are upserts, D deletes), one change per key
    changes = diff.select(
        "o_orderkey",
        F.col("new_o_orderstatus").alias("o_orderstatus"),
        F.col("new_o_totalprice").alias("o_totalprice"),
        F.col("change_type").alias("op"),
        F.lit(1).alias("seq"),
    )
    rebuilt = apply_changelog(
        v_old, changes, ["o_orderkey"], ["seq"], op_col="op", delete_op="D"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")

    assert rebuilt.exceptAll(v_new).count() == 0
    assert v_new.exceptAll(rebuilt).count() == 0

    # delta-sized: every diff key really changed between the versions
    n_diff = diff.count()
    assert 0 < n_diff < v_new.count()
    unchanged_in_diff = (
        diff.filter(F.col("change_type") == "U")
        .filter(
            F.col("old_o_orderstatus").eqNullSafe(F.col("new_o_orderstatus"))
            & F.col("old_o_totalprice").eqNullSafe(F.col("new_o_totalprice"))
        )
        .count()
    )
    assert unchanged_in_diff == 0


def test_skyline2d_hand_cases(spark):
    from assignment_2_dataengineering_spark.operators.relational import skyline2d

    rows = [
        (1, 1.0, 10),  # frontier (cheapest)
        (2, 2.0, 20),  # frontier (more avail, pricier)
        (3, 2.0, 15),  # dominated by 2 (same cost, less avail)
        (4, 3.0, 20),  # dominated by 2 (pricier, same avail)
        (5, 1.5, 5),   # dominated by 1
        (6, 2.0, 20),  # duplicate of 2 -> both survive (no strict edge)
        (7, 4.0, 30),  # frontier (max avail)
    ]
    df = spark.createDataFrame(rows, "id long, cost double, avail long")
    got = {r.id for r in skyline2d(df, "cost", "avail").collect()}
    assert got == {1, 2, 6, 7}
    # orientation flip: maximize cost, minimize avail -> mirrored frontier
    # (5 dominates 1 now; 3 beats 2/6 on avail at equal cost)
    flipped = {
        r.id
        for r in skyline2d(df, "cost", "avail", minimize_x=False, maximize_y=False).collect()
    }
    assert flipped == {3, 4, 5, 7}


def test_exact_quantile_matches_sorted_rank_definition(spark, sf_dir):
    import math

    from assignment_2_dataengineering_spark.operators.quantile import exact_quantile_int
    from assignment_2_dataengineering_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100)
    vals = sorted(r[0] for r in li.select(cents.cast("long")).collect())
    for q in (0.01, 0.5, 0.95, 1.0):
        got = exact_quantile_int(li, cents, q)
        want = vals[max(1, math.ceil(q * len(vals))) - 1]
        assert got == want, (q, got, want)
    # tiny buckets force many refinement passes; answer unchanged
    assert exact_quantile_int(li, cents, 0.5, buckets=8) == vals[
        max(1, math.ceil(0.5 * len(vals))) - 1
    ]
    # empty input
    assert exact_quantile_int(li.filter(F.lit(False)), cents, 0.5) is None


def test_exact_quantile_range_wider_than_2_53(spark):
    """Pin the integer-DIV bucket fix: with a value range wider than 2^53,
    double division rounds values across bucket boundaries (v = 1000*w - 1
    with w ~ 4.5e15 buckets to 1000 instead of 999), which historically
    desynchronized the histogram from the integer range filters and either
    returned a wrong quantile or tripped the rank assertion. Integer DIV
    keeps every pass exact over the full 64-bit domain."""
    import math

    from assignment_2_dataengineering_spark.operators.quantile import exact_quantile_int

    lo, hi = -(2**62), 2**62  # range ~ 9.2e18 >> 2^53
    w = (hi - lo + 1024) // 1024
    # values chosen to straddle bucket boundaries where double math rounds
    raw = sorted(
        [lo, hi, 0, lo + 1000 * w - 1, lo + 1000 * w, lo + 999 * w + w // 2]
        + [lo + k * w - 1 for k in (1, 7, 512)]
        + [lo + k * w for k in (1, 7, 512)]
    )
    df = spark.createDataFrame([(v,) for v in raw], "v long")
    for q in (0.01, 0.25, 0.5, 0.9, 1.0):
        got = exact_quantile_int(df, F.col("v"), q)
        want = raw[max(1, math.ceil(q * len(raw))) - 1]
        assert got == want, (q, got, want)


def test_two_phase_global_rank_equals_window_row_number(spark):
    """two_phase_global_rank must equal the single-partition
    row_number() window EXACTLY for any total order, partition count,
    and direction mix — including partitions > rows."""
    from assignment_2_dataengineering_spark.operators.sampling import (
        two_phase_global_rank,
    )

    rows = [(i, (i * 37) % 11, float((i * 13) % 7)) for i in range(57)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    from pyspark.sql import Window

    for order in ([("a", True), ("id", True)], [("b", False), ("a", True), ("id", False)]):
        cols = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
        want = {
            r["id"]: r["rk"]
            for r in df.select(
                "id", F.row_number().over(Window.orderBy(*cols)).alias("rk")
            ).collect()
        }
        for parts in (1, 4, 100):
            got = {
                r["id"]: r["rank"]
                for r in two_phase_global_rank(df, order, "rank", partitions=parts).collect()
            }
            assert got == want, (order, parts)


def test_ntile_from_rank_matches_sql_ntile(spark, duck):
    """ntile_from_rank(rank, n, k) must reproduce SQL ntile(k) for
    every n (including n < k) — first n%k tiles get ceil(n/k) rows."""
    from assignment_2_dataengineering_spark.operators.sampling import ntile_from_rank

    for n in (1, 2, 3, 4, 5, 7, 8, 10, 13, 100):
        want = [
            r[0]
            for r in duck.sql(
                f"SELECT ntile(4) OVER (ORDER BY i) FROM range({n}) t(i) ORDER BY i"
            ).fetchall()
        ]
        df = spark.createDataFrame([(i + 1, n) for i in range(n)], "rk long, n long")
        got = [
            r["t"]
            for r in df.select("rk", ntile_from_rank("rk", "n", 4).alias("t"))
            .orderBy("rk")
            .collect()
        ]
        assert got == want, (n, got, want)


def test_two_phase_prefix_sum_equals_window(spark):
    from pyspark.sql import Window

    from assignment_2_dataengineering_spark.operators.sampling import (
        two_phase_prefix_sum,
    )

    rows = [(i, (i * 31) % 13, (i % 5) + 1) for i in range(61)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    order = [("k", True), ("id", False)]
    cols = [F.col("k").asc(), F.col("id").desc()]
    w = Window.orderBy(*cols).rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["c"]
        for r in df.select(
            "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    for parts in (1, 5, 200):
        got = {
            r["id"]: r["cum_before"]
            for r in two_phase_prefix_sum(df, order, "v", partitions=parts).collect()
        }
        assert got == want, parts


def test_auc_rank_formula_against_pairwise_definition(spark, tmp_path):
    """AUC == P(score_pos > score_neg) + 0.5*P(tie), brute-forced over
    all pos x neg pairs on a small hand set with heavy ties — pins the
    tie-averaged rank formula independent of the SQL oracle. Also the
    two degenerate anchors: perfect separation -> 1.0, identical
    scores -> 0.5."""
    import datetime as dt
    import itertools

    from assignment_2_dataengineering_spark.plans.queries_analytic import q_auc_rank

    def run(scores_pos, scores_neg):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0, 1, "purchase", float(s), "{}")
            for i, s in enumerate(scores_pos)
        ] + [
            (1000 + i, t0, 2, "click", float(s), "{}")
            for i, s in enumerate(scores_neg)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        import tempfile

        d = tempfile.mkdtemp(prefix="auc_")
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        return q_auc_rank(spark, d).collect()[0]["auc"]

    pos = [0.9, 0.8, 0.8, 0.5, 0.5, 0.3]
    neg = [0.8, 0.5, 0.5, 0.5, 0.2, 0.1, 0.1]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    assert abs(run(pos, neg) - round(wins / (len(pos) * len(neg)), 6)) < 1e-9
    assert run([2.0, 3.0], [0.5, 1.0]) == 1.0
    assert run([1.0, 1.0], [1.0, 1.0, 1.0]) == 0.5


def test_scd2_merge_multiple_updates_per_key_last_write_wins(spark):
    """A batch carrying several changes for one key must apply ONLY the
    latest (same last-write-wins contract as apply_changelog) — the
    un-reduced left join historically closed the current row at two
    timestamps and opened two concurrent current versions."""
    import datetime as dt

    from assignment_2_dataengineering_spark.operators.relational import scd2_merge

    t = lambda m: dt.datetime(2021, m, 1)
    target = spark.createDataFrame(
        [(1, 100.0, t(1), None)],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(1, 200.0, t(3)), (1, 300.0, t(6))],
        "k long, bal double, ts timestamp",
    )
    out = scd2_merge(target, updates, ["k"], ["bal"]).collect()
    rows = sorted(((r["bal"], r["valid_from"], r["valid_to"]) for r in out))
    # exactly 2 rows: the original closed at the LATEST ts, one new current
    assert rows == [(100.0, t(1), t(6)), (300.0, t(6), None)]


def test_scd2_merge_null_key_update_applies(spark):
    """eqNullSafe joins NULL keys; the matched-update marker must be a
    literal flag, not keys[0].isNotNull (which classified a matched
    NULL-key row as unmatched and silently dropped the change)."""
    import datetime as dt

    from assignment_2_dataengineering_spark.operators.relational import scd2_merge

    t = lambda m: dt.datetime(2022, m, 1)
    target = spark.createDataFrame(
        [(None, 1.0, t(1), None)],
        "k string, bal double, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(None, 9.0, t(5))], "k string, bal double, ts timestamp"
    )
    out = scd2_merge(target, updates, ["k"], ["bal"]).collect()
    rows = sorted(((r["bal"], r["valid_to"]) for r in out), key=str)
    assert rows == [(1.0, t(5)), (9.0, None)]


def test_salted_join_rejects_outer_joins(spark):
    import pytest as _pytest

    big = spark.createDataFrame([(1, "x1")], "k long, rid string")
    small = spark.createDataFrame([(1, "m")], "k2 long, v string")
    with _pytest.raises(ValueError, match="outer joins"):
        salted_join(big, small, "k", "k2", salt_from="rid", how="full_outer")
