"""Scale-pattern queries: the operators whose whole point is surviving
a 1000-executor / 100 TB run — skew-salted join, batch MERGE upsert,
and dataset profiling. Each is oracle-paired: salting and merge are
semantics-preserving, so their oracles are the PLAIN SQL forms and the
hash-match proves the scale machinery changes the plan, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import merge_upsert, salted_join
from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_salted_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "scale"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders↔customer revenue by market segment through the
    skew-salted join (operators/relational.salted_join): the fact side
    is salted 8 ways on xxhash64(o_orderkey), the dim side replicated
    per salt, so a hot customer key spreads across 8 reducers. The
    oracle is the PLAIN join — the hash match proves salting is
    semantics-preserving. (With healthy keys broadcast/AQE wins; this
    pins the explicit fallback for skew AQE can't see, e.g. streaming.)"""
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(orders, cust, "o_custkey", "c_custkey", salt_from="o_orderkey", salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH src AS (
        SELECT c_custkey, c_name, round(c_acctbal + 100, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'new-' || c_name, 0.0
        FROM customer WHERE c_custkey % 1000 = 7
    )
    SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
           coalesce(s.c_name, t.c_name) AS c_name,
           round(coalesce(s.c_acctbal, t.c_acctbal), 2) AS c_acctbal
    FROM (SELECT c_custkey, c_name, c_acctbal FROM customer) t
    FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    """,
    tags=("join", "scale"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (CDC upsert) via operators/relational.merge_upsert:
    a derived change-set (10% balance updates + a handful of inserts
    with shifted keys) merged into the customer snapshot — updates
    override, inserts append, untouched rows persist. One full-outer
    shuffle on the key; bucketing the target on c_custkey removes even
    that at scale. Oracle is the equivalent FULL OUTER JOIN + COALESCE."""
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100, 2))
    )
    inserts = cust.filter(F.col("c_custkey") % 1000 == 7).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), keys=["c_custkey"])
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 2))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@register(
    "q_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               round(min({c}), 4) AS min_val,
               round(max({c}), 4) AS max_val,
               round(avg({c}), 4) AS avg_val,
               round(stddev_samp({c}), 4) AS stddev_val
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    tags=("agg", "scale"),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the pre-flight every pipeline runs before
    touching 100 TB): per-column row/null counts, min/max/mean/stddev,
    emitted long-form one row per column. ALL columns profile in ONE
    scan + ONE partial-agg shuffle (a single Aggregate node computes
    every statistic); the wide 1-row result is then unpivoted
    driver-free with stack(). Compare: per-column DESCRIBE loops scan
    the table N times."""
    li = T(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
            F.round(F.stddev_samp(c), 4).alias(f"{c}__std"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__min, {c}__max, {c}__avg, {c}__std"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, min_val, max_val, avg_val, stddev_val)"
        )
    )


def _zorder_oracle() -> str:
    from ..operators.layout import zorder_sql

    z = zorder_sql("l_partkey", "l_suppkey", "mn_a", "mx_a", "mn_b", "mx_b")
    return f"""
    WITH mm AS (
        SELECT min(l_partkey) AS mn_a, max(l_partkey) AS mx_a,
               min(l_suppkey) AS mn_b, max(l_suppkey) AS mx_b
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, {z} AS zkey
    FROM lineitem, mm
    """


@register(
    "q_zorder",
    oracle=_zorder_oracle(),
    tags=("scale", "layout"),
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey):
    rank-normalize each key to 16 bits against broadcast min/max, then
    bit-interleave — the write-time layout key that makes parquet
    min/max stats prune files for BOTH dimensions
    (operators/layout.py; file-skip demonstrated in
    tests/test_io_scale.py). Pure integer codegen, one broadcast of a
    1-row min/max aggregate, no shuffle; the oracle reproduces the key
    bit-for-bit via the same exact-integer arithmetic."""
    from ..operators.layout import rank_scale, zvalue2

    li = T(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_partkey").alias("mn_a"),
        F.max("l_partkey").alias("mx_a"),
        F.min("l_suppkey").alias("mn_b"),
        F.max("l_suppkey").alias("mx_b"),
    )
    j = li.crossJoin(F.broadcast(mm))
    ra = rank_scale(F.col("l_partkey"), F.col("mn_a"), F.col("mx_a"))
    rb = rank_scale(F.col("l_suppkey"), F.col("mn_b"), F.col("mx_b"))
    return j.select("l_orderkey", "l_linenumber", zvalue2(ra, rb).alias("zkey"))


_HIST_BINS = 10


@register(
    "q_histogram",
    oracle=f"""
    WITH mm AS (
        SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents
    )
    SELECT LEAST(((n_chars - mn) * {_HIST_BINS}) // (mx - mn + 1), {_HIST_BINS - 1}) AS bin,
           count(*) AS n,
           min(n_chars) AS lo,
           max(n_chars) AS hi
    FROM documents, mm
    GROUP BY 1
    """,
    tags=("scale", "profile"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of document length: 10 bins over the
    observed [min, max], all integer arithmetic (exact in both
    engines — operators/layout.py intdiv). One 1-row min/max broadcast
    + one map-side-combined count: two scans or one-plus-cached at
    100 TB, never a sort. The per-bin observed lo/hi double as the
    bin-boundary check."""
    from ..operators.layout import intdiv

    d = T(spark, sf_dir, "documents")
    mm = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    j = d.crossJoin(F.broadcast(mm))
    bin_ = F.least(
        intdiv((F.col("n_chars") - F.col("mn")) * _HIST_BINS, F.col("mx") - F.col("mn") + 1),
        F.lit(_HIST_BINS - 1).cast("long"),
    )
    return (
        j.select(bin_.alias("bin"), "n_chars")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )


@register(
    "q_scd2",
    oracle="""
    WITH target AS (
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '2020-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, c_acctbal + 100 AS c_acctbal,
               TIMESTAMP '2021-06-01' AS ts
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, TIMESTAMP '2021-06-01'
        FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_acctbal, TIMESTAMP '2021-06-01'
        FROM customer WHERE c_custkey < 3
    ),
    changed AS (
        SELECT t.c_custkey, u.c_acctbal AS new_bal, u.ts
        FROM target t JOIN upd u USING (c_custkey)
        WHERE t.c_acctbal IS DISTINCT FROM u.c_acctbal
    )
    SELECT t.c_custkey, t.c_acctbal, t.valid_from, ch.ts AS valid_to
    FROM target t JOIN changed ch USING (c_custkey)
    UNION ALL
    SELECT t.* FROM target t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey, new_bal, ts, CAST(NULL AS TIMESTAMP) FROM changed
    UNION ALL
    SELECT u.c_custkey, u.c_acctbal, u.ts, CAST(NULL AS TIMESTAMP)
    FROM upd u
    WHERE u.c_custkey NOT IN (SELECT c_custkey FROM target)
    """,
    tags=("scale", "merge"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 MERGE (operators/relational.scd2_merge): the
    history-preserving upsert merge_upsert's type-1 overwrite cannot
    express. A deterministic CDC batch against the customer dim —
    1/3 of keys change balance (old version closed, new opened),
    1/5 deliver no-op re-extracts (MUST create no version), and three
    brand-new keys insert. Historical rows never enter the join
    (filtered before the shuffle); the whole merge is one keyed join +
    anti-join + unions — bucket the target on the key and the target
    exchange disappears."""
    from ..operators.relational import scd2_merge

    c = T(spark, sf_dir, "customer")
    ts = F.lit("2021-06-01").cast("timestamp")
    target = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", (F.col("c_acctbal") + 100).alias("c_acctbal"), ts.alias("ts"))
        .unionByName(
            c.filter((F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 3 != 0))
            .select("c_custkey", "c_acctbal", ts.alias("ts"))
        )
        .unionByName(
            c.filter(F.col("c_custkey") < 3).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
                ts.alias("ts"),
            )
        )
    )
    return scd2_merge(
        target, updates, keys=["c_custkey"], attrs=["c_acctbal"], ts_col="ts"
    )


@register(
    "q_cdc_apply",
    oracle="""
    WITH base AS (
        SELECT user_id, value, ts FROM (
            SELECT user_id, value, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_id % 2 = 0)
        WHERE rn = 1
    ),
    last_chg AS (
        SELECT user_id, value, ts, op FROM (
            SELECT user_id, value, ts,
                   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_id % 2 = 1)
        WHERE rn = 1
    )
    SELECT coalesce(l.user_id, b.user_id) AS user_id,
           round(CASE WHEN l.op IS NOT NULL THEN l.value ELSE b.value END, 4)
               AS value,
           CASE WHEN l.op IS NOT NULL THEN l.ts ELSE b.ts END AS ts
    FROM base b FULL OUTER JOIN last_chg l ON b.user_id = l.user_id
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
    tags=("scale", "merge", "cdc"),
    bench=True,  # merge/upsert family
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-aware CDC apply (operators/relational.py
    apply_changelog) — the delete-capable third of the merge family
    (merge_upsert upserts only; scd2_merge versions history). The
    changelog is derived deterministically from `events`: odd event_ids
    are changes ordered by (ts, event_id), `error` events are delete
    tombstones, everything else upserts; the snapshot is latest-per-key
    over the even half. Per key only the trailing change survives the
    keyed window; one full-outer join applies it, with tombstones
    filtered post-join so the snapshot is scanned once. The oracle is
    the same fold in plain SQL — the hash match proves upsert/delete/
    passthrough semantics, not just row counts."""
    from ..operators.relational import apply_changelog, latest_per_key

    ev = T(spark, sf_dir, "events")
    base = latest_per_key(
        ev.filter(F.col("event_id") % 2 == 0).select("user_id", "value", "ts", "event_id"),
        ["user_id"],
        "ts",
        tiebreak=["event_id"],
    ).select("user_id", "value", "ts")
    changes = (
        ev.filter(F.col("event_id") % 2 == 1)
        .select(
            "user_id",
            "value",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )
    applied = apply_changelog(
        base, changes, keys=["user_id"], order=["ts", "event_id"]
    )
    return applied.select(
        "user_id", F.round("value", 4).alias("value"), "ts"
    )


@register(
    "q_bloom_membership",
    oracle=None,  # probabilistic membership (false positives possible) → rows-only; bounds in tests/test_bloom.py
    tags=("scale", "sketch"),
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom membership tier (operators/sketch.py
    sketch_bloom/rollup_bloom/member_bloom) — the third sketch leg
    beside HLL cardinality (q_hll_rollup) and CMS frequency
    (q_cms_freq): day-grain per-event-type bitmaps built by a pure
    bit_or aggregate, merged to event_type grain (bit-identical to a
    one-shot build — associativity pinned in tests/test_bloom.py), then
    probed for the first 20 user ids plus 5 absent ids. Probes join
    sketch words on (group, word_idx); no false negatives, FP rate
    bounded in tests. At 100 TB this is the "seen-keys" summary a
    dedup/join stage ships instead of rescanning last month's facts."""
    from ..operators.sketch import member_bloom, rollup_bloom, sketch_bloom

    ev = T(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    fine = sketch_bloom(ev, ["event_type", "day"], "user_id")
    merged = rollup_bloom(fine, ["event_type"])
    types = ev.select("event_type").distinct()
    probes = types.crossJoin(
        F.broadcast(
            spark.range(0, 20)
            .select(F.col("id").alias("user_id"))
            .unionByName(
                spark.range(10_000_000, 10_000_005).select(
                    F.col("id").alias("user_id")
                )
            )
        )
    )
    return member_bloom(probes, merged, ["event_type"], "user_id").orderBy(
        "event_type", "user_id"
    )


@register(
    "q_key_skew",
    oracle="""
    WITH k1 AS (SELECT count(*) AS n FROM orders GROUP BY o_custkey),
    k2 AS (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey),
    k3 AS (SELECT count(*) AS n FROM events GROUP BY user_id),
    s AS (
        SELECT 'orders.o_custkey' AS join_key, count(*) AS n_keys,
               sum(n) AS total_rows, max(n) AS max_rows,
               avg(n) AS avg_rows, quantile_cont(n, 0.95) AS p95_rows
        FROM k1
        UNION ALL
        SELECT 'lineitem.l_orderkey', count(*), sum(n), max(n),
               avg(n), quantile_cont(n, 0.95) FROM k2
        UNION ALL
        SELECT 'events.user_id', count(*), sum(n), max(n),
               avg(n), quantile_cont(n, 0.95) FROM k3
    )
    SELECT join_key, CAST(n_keys AS BIGINT) AS n_keys,
           CAST(total_rows AS BIGINT) AS total_rows,
           CAST(max_rows AS BIGINT) AS max_rows,
           round(avg_rows, 4) AS avg_rows,
           round(p95_rows, 4) AS p95_rows,
           round(max_rows / avg_rows, 4) AS skew_ratio
    FROM s ORDER BY join_key
    """,
    tags=("scale", "profile"),
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report — the diagnostic you run BEFORE picking a
    join strategy at 100 TB (salted_join's `salt` parameter and AQE's
    skew-split thresholds are tuned from exactly these numbers): per
    candidate key, cardinality, hottest-key row count, p95, and the
    max/avg skew ratio. Each key costs one keyed count aggregate plus
    a scalar summary — the per-key table never leaves the cluster and
    the summaries are 1-row unions. Exact interpolated p95 (Spark
    `percentile` ≡ DuckDB `quantile_cont`)."""

    def summarize(df: DataFrame, key: str, label: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        return per_key.agg(
            F.lit(label).alias("join_key"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("total_rows"),
            F.max("n").cast("long").alias("max_rows"),
            F.round(F.avg("n"), 4).alias("avg_rows"),
            F.round(F.percentile("n", F.lit(0.95)), 4).alias("p95_rows"),
            F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
        )
    parts = [
        summarize(T(spark, sf_dir, "orders"), "o_custkey", "orders.o_custkey"),
        summarize(T(spark, sf_dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey"),
        summarize(T(spark, sf_dir, "events"), "user_id", "events.user_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("join_key")


@register(
    "q_salted_collect",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           md5(array_to_string(list_sort(list(DISTINCT user_id)), ',')) AS users_hash
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("scale", "agg"),
)
def q_salted_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted exact distinct-collection (operators/relational.py
    salted_collect_set): the 5 event types are genuinely hot keys
    (~2000 rows each at sf0.01 — at 100 TB, billions), and a plain
    collect_set funnels each type's whole payload through one reducer;
    the salted two-stage build parallelizes it across 16 partial sets
    per key. The oracle is the PLAIN distinct aggregation — the hash
    match proves salting changes the plan, not the answer (the same
    discipline as q_salted_join). Output is scalar (count + md5 of the
    sorted member list) so the driver canonicalizer never sees an
    array cell."""
    from ..operators.relational import salted_collect_set

    ev = T(spark, sf_dir, "events").select("event_type", "user_id")
    sets = salted_collect_set(ev, "event_type", "user_id", salts=16)
    return sets.select(
        "event_type",
        F.size("items").cast("long").alias("n_users"),
        F.md5(F.concat_ws(",", F.col("items").cast("array<string>"))).alias(
            "users_hash"
        ),
    ).orderBy("event_type")


@register(
    "q_snapshot_diff",
    oracle="""
    WITH v_old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 3
    ),
    v_new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 31 = 5 THEN 'R' ELSE o_orderstatus END
                 AS o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0
                    THEN round(o_totalprice + 1, 2) ELSE o_totalprice END
                 AS o_totalprice
        FROM orders WHERE o_orderkey % 89 <> 7
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS change_type,
           o.o_orderstatus AS old_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus,
           n.o_totalprice AS new_o_totalprice
    FROM v_old o FULL OUTER JOIN v_new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    tags=("cdc", "relational"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog generation between two snapshot versions of orders
    (operators.relational.snapshot_diff): deterministic synthetic drift
    — keys ≡3 mod 97 absent from v_old (inserts), ≡7 mod 89 absent
    from v_new (deletes), ≡0 mod 13 repriced and ≡5 mod 31 re-statused
    (updates). One full-outer join on the key, delta-sized output; the
    apply_changelog round-trip law is pinned in tests/test_scale_ops.py."""
    from ..operators.relational import snapshot_diff

    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v_old = orders.filter(F.col("o_orderkey") % 97 != 3)
    v_new = orders.filter(F.col("o_orderkey") % 89 != 7).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 31 == 5, F.lit("R"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(
        v_old, v_new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@register(
    "q_bitemporal_asof",
    oracle="""
    WITH target AS (
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '2020-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, c_acctbal + 100 AS c_acctbal,
               TIMESTAMP '2021-06-01' AS ts
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, TIMESTAMP '2021-06-01'
        FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_acctbal, TIMESTAMP '2021-06-01'
        FROM customer WHERE c_custkey < 3
    ),
    changed AS (
        SELECT t.c_custkey, u.c_acctbal AS new_bal, u.ts
        FROM target t JOIN upd u USING (c_custkey)
        WHERE t.c_acctbal IS DISTINCT FROM u.c_acctbal
    ),
    scd2 AS (
        SELECT t.c_custkey, t.c_acctbal, t.valid_from, ch.ts AS valid_to
        FROM target t JOIN changed ch USING (c_custkey)
        UNION ALL
        SELECT t.* FROM target t
        WHERE t.c_custkey NOT IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT c_custkey, new_bal, ts, CAST(NULL AS TIMESTAMP) FROM changed
        UNION ALL
        SELECT u.c_custkey, u.c_acctbal, u.ts, CAST(NULL AS TIMESTAMP)
        FROM upd u
        WHERE u.c_custkey NOT IN (SELECT c_custkey FROM target)
    )
    SELECT c_custkey, c_acctbal, valid_from
    FROM scd2
    WHERE valid_from <= TIMESTAMP '2021-01-01'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2021-01-01')
    """,
    tags=("scale", "temporal"),
)
def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read over the SCD2 history (q_scd2's merge output):
    'what did the customer dimension look like on 2021-01-01?' — the
    half-open validity predicate valid_from ≤ t < valid_to (open
    current rows qualify via NULL). A pure filter over the versioned
    table: at 100 TB, partition the history by valid_from date and the
    as-of scan prunes to the qualifying partitions."""
    from ..operators.relational import scd2_merge

    c = T(spark, sf_dir, "customer")
    ts = F.lit("2021-06-01").cast("timestamp")
    target = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", (F.col("c_acctbal") + 100).alias("c_acctbal"), ts.alias("ts"))
        .unionByName(
            c.filter((F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 3 != 0))
            .select("c_custkey", "c_acctbal", ts.alias("ts"))
        )
        .unionByName(
            c.filter(F.col("c_custkey") < 3).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
                ts.alias("ts"),
            )
        )
    )
    hist = scd2_merge(target, updates, keys=["c_custkey"], attrs=["c_acctbal"], ts_col="ts")
    asof = F.lit("2021-01-01").cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
    ).select("c_custkey", "c_acctbal", "valid_from")


@register(
    "q_scd2_lookup",
    oracle="""
    WITH target AS (
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '2020-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, c_acctbal + 100 AS c_acctbal,
               TIMESTAMP '2021-06-01' AS ts
        FROM customer WHERE c_custkey % 3 = 0
    ),
    changed AS (
        SELECT t.c_custkey, u.c_acctbal AS new_bal, u.ts
        FROM target t JOIN upd u USING (c_custkey)
        WHERE t.c_acctbal IS DISTINCT FROM u.c_acctbal
    ),
    hist AS (
        SELECT t.c_custkey, t.c_acctbal, t.valid_from, ch.ts AS valid_to
        FROM target t JOIN changed ch USING (c_custkey)
        UNION ALL
        SELECT t.* FROM target t
        WHERE t.c_custkey NOT IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT c_custkey, new_bal, ts, CAST(NULL AS TIMESTAMP) FROM changed
    ),
    probes AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 2 = 0 THEN TIMESTAMP '2020-07-01'
                    ELSE TIMESTAMP '2022-01-01' END AS event_ts
        FROM orders WHERE o_orderkey < 2000
    )
    SELECT p.o_orderkey, p.o_custkey, p.event_ts, h.c_acctbal AS bal_at_event
    FROM probes p LEFT JOIN hist h
      ON p.o_custkey = h.c_custkey
     AND h.valid_from <= p.event_ts
     AND (h.valid_to IS NULL OR h.valid_to > p.event_ts)
    """,
    tags=("scale", "temporal", "join"),
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time dimension lookup: each order probe joined to the
    customer-history VERSION valid at its event timestamp — the join
    that makes reprocessed facts reproduce historical enrichment
    instead of leaking today's attributes backward (the latest-value
    join's silent correctness bug). Half of the probes predate the
    2021-06-01 balance change and must see the OLD balance. The
    version predicate is an equi-join on the key plus the half-open
    validity filter — with few versions per key the fan-out is
    bounded by version count, and a valid_from-partitioned history
    prunes by the probe's time range."""
    from ..operators.relational import scd2_merge

    c = T(spark, sf_dir, "customer")
    ts = F.lit("2021-06-01").cast("timestamp")
    target = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100).alias("c_acctbal"), ts.alias("ts")
    )
    hist = scd2_merge(target, updates, keys=["c_custkey"], attrs=["c_acctbal"], ts_col="ts")
    probes = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 2 == 0, F.lit("2020-07-01").cast("timestamp")
            )
            .otherwise(F.lit("2022-01-01").cast("timestamp"))
            .alias("event_ts"),
        )
    )
    return probes.join(
        hist,
        (probes["o_custkey"] == hist["c_custkey"])
        & (hist["valid_from"] <= probes["event_ts"])
        & (hist["valid_to"].isNull() | (hist["valid_to"] > probes["event_ts"])),
        "left",
    ).select(
        "o_orderkey", "o_custkey", "event_ts", F.col("c_acctbal").alias("bal_at_event")
    )


@register(
    "q_exact_quantile",
    oracle="""
    WITH s AS (
        SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ),
    n AS (SELECT count(*) AS n FROM s)
    SELECT v AS p95_cents FROM s, n
    ORDER BY v
    LIMIT 1 OFFSET (SELECT CAST(ceil(0.95 * n) AS BIGINT) - 1 FROM n)
    """,
    tags=("scale", "agg"),
)
def q_exact_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p95 of lineitem price (integer cents) by three-pass
    histogram refinement (operators/quantile.py) — the quantile path
    that stays exact when Spark's `percentile` aggregate's per-group
    value map won't fit an executor: each pass is one 1024-bucket
    count aggregate, only the kilobyte histogram reaches the driver,
    and the range shrinks 1024× per pass. The oracle is the rank
    definition itself (ORDER BY … OFFSET ceil(q·n)−1)."""
    from ..operators.quantile import exact_quantile_int

    li = T(spark, sf_dir, "lineitem")
    p95 = exact_quantile_int(li, F.floor(F.col("l_extendedprice") * 100), 0.95)
    return spark.createDataFrame([(p95,)], "p95_cents bigint")
