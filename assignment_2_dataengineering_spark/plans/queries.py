"""Core relational query library — one oracle-paired entry per operator
in SURVEY.md §2 (scan/filter/project/join/agg/window/sort/reshape).

Conventions that make the DuckDB value-hash comparison deterministic:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (2dp money, 4dp ratios/avgs, 6dp cosines)
  on BOTH sides, so cross-engine summation-order noise in the last bits
  can't flip the hash;
- DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT,
  Spark stays long);
- all timestamp bucketing is epoch arithmetic (session-TZ independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalar as SC
from ..operators import relational as R
from ..operators import reshape
from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@register(
    "q_groupby_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                         AS sum_qty,
           round(sum(l_extendedprice), 2)                    AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4)                         AS avg_qty,
           round(avg(l_discount), 4)                         AS avg_disc,
           count(*)                                          AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 hash group-agg multi-sum: the reference's unit→facility rollup
    `groupby([facility_code, timestamp]).agg(sum, sum)` (extractor.py:242-246)
    expressed as the TPC-H-Q1-shaped rollup on lineitem. Partial (map-side)
    + final hash aggregation; one shuffle on the group keys."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_scalar_agg",
    oracle="""
    SELECT round(sum(value), 2)   AS total_value,
           round(avg(value), 4)   AS avg_value,
           round(min(value), 2)   AS min_value,
           round(max(value), 2)   AS max_value,
           count(*)               AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("agg",),
)
def q_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A10/A11 scalar aggregates: dashboard totals sum(power_mw),
    avg(price_dmwh) over the filtered snapshot (dashboard.py:716-727),
    plus distinct-count (not in the reference — engine extension)."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.agg(
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_window_agg",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS TIMESTAMP) AS bucket,
           event_type,
           round(sum(value), 2) AS sum_value,
           count(*)             AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "window"),
    bench=True,
)
def q_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 tumbling 5-minute window sum: dashboard.py:554-555's
    `dt.floor('5min')` bucket aggregation. Epoch arithmetic (not
    date_trunc) so buckets are identical in any session timezone; in
    streaming form this is groupBy(window('ts','5 minutes')) + watermark
    (streaming.windows)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", R.time_bucket(F.col("ts"), 300))
        .groupBy("bucket", "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q_mode",
    oracle="""
    WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
    SELECT event_type AS mode_event_type
    FROM c ORDER BY n DESC, event_type ASC LIMIT 1
    """,
    tags=("agg",),
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 mode: dashboard.py:719's most-frequent-timestamp with the
    engine's deterministic tie-break (highest count, then smallest value;
    SURVEY.md §7.4 item 6)."""
    return R.mode_value(T(spark, sf_dir, "events"), "event_type", "mode_event_type")


@register(
    "q_percentile",
    oracle="""
    SELECT event_type, round(quantile_cont(value, 0.95), 4) AS p95_value
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 p95 percentile (marker scaling, dashboard.py:104-107). Exact
    interpolated percentile to match the continuous-quantile oracle; the
    streaming/at-scale variant would use percentile_approx."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.round(F.percentile("value", 0.95), 4).alias("p95_value"))


@register(
    "q_collect_set",
    oracle="""
    SELECT user_id, string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS event_types
    FROM events GROUP BY user_id
    """,
    tags=("agg", "array"),
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 distinct-set collection: sorted unique fuel labels
    (dashboard.py:471-475) — collect_set → array_sort, joined to a pipe
    string so the oracle compares a scalar."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), "|").alias("event_types")
    )


@register(
    "q_count",
    oracle="""
    SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'events', count(*) FROM events
    """,
    tags=("agg",),
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 counts (progress logging, extractor.py:239) across tables via
    unionByName (§2.7 set-op coverage)."""
    parts = [
        T(spark, sf_dir, n).agg(F.count(F.lit(1)).alias("n")).select(F.lit(n).alias("tbl"), "n")
        for n in ("lineitem", "orders", "customer", "events")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Filters / projections / predicates (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@register(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) AS net_price_cents,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity > 25.0
    """,
    tags=("filter",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 projection+rename (facility-row build, extractor.py:88-95) with
    a pushed-down predicate; .explain shows PushedFilters on l_quantity
    and a 6-column ReadSchema."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 25.0).select(
        "l_orderkey",
        "l_linenumber",
        # floor-to-cents: per-row 2dp money products land exactly on
        # half-cent boundaries where engines' round() semantics differ;
        # floor over the identical IEEE double is unambiguous.
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100
        ).alias("net_price_cents"),
        F.upper("l_returnflag").alias("flag"),
    )


@register(
    "q_isin",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type
    """,
    tags=("filter",),
)
def q_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P8 isin membership filter (region multiselect,
    dashboard.py:527-529)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "q_null_filter",
    oracle="""
    SELECT event_type, count(*) AS n_valid, round(avg(k), 4) AS avg_k
    FROM (
        SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events
    )
    WHERE k IS NOT NULL AND k > 50
    GROUP BY event_type
    """,
    tags=("filter", "json"),
)
def q_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/T2 validity filter after lossy parse: from_json yields null on
    malformed payloads exactly like `errors='coerce'`+Pydantic rejection
    (dashboard.py:312-322); nulls are filtered, survivors aggregated."""
    ev = T(spark, sf_dir, "events")
    parsed = ev.select("event_type", F.from_json("props", "k INT").getField("k").alias("k"))
    return (
        parsed.filter(F.col("k").isNotNull() & (F.col("k") > 50))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_valid"), F.round(F.avg("k"), 4).alias("avg_k"))
    )


@register(
    "q_scan_nested",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           event_type
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) BETWEEN 10 AND 20
    """,
    tags=("json", "scan"),
)
def q_scan_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 nested scan: JSON payload column decoded with an explicit
    schema and predicated on an inner field — the engine's stand-in for
    the reference's nested facility-doc scan (context.py:33)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.from_json("props", "k INT").getField("k").alias("k"), "event_type")
        .filter(F.col("k").between(10, 20))
    )


@register(
    "q_time_horizon",
    oracle="""
    SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 60 MINUTE
    """,
    tags=("filter", "time"),
)
def q_time_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/A6 rolling horizon anchored at max(ts), not wall-clock
    (dashboard.py:546-549): broadcast scalar-max join, no collect."""
    ev = T(spark, sf_dir, "events")
    return R.time_horizon(ev, "ts", 60).select(
        "event_id", "user_id", "event_type", "ts", F.round("value", 2).alias("value")
    )


@register(
    "q_route",
    oracle="""
    SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'quarantine'
                ELSE 'engagement' END AS route,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("filter",),
)
def q_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/T3 payload routing: the reference dispatches on payload shape
    (dashboard.py:341/376) and quarantines the rest — here as a
    when/otherwise router feeding per-branch aggregates."""
    ev = T(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin("purchase", "signup"), F.lit("conversion"))
        .when(F.col("event_type") == "error", F.lit("quarantine"))
        .otherwise(F.lit("engagement"))
    )
    return (
        ev.withColumn("route", route)
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "q_filter_exists",
    oracle="""
    SELECT l_orderkey, count(*) AS n_items
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(*) FILTER (WHERE l_quantity > 45 AND l_returnflag = 'R') > 0
    """,
    tags=("filter", "array"),
)
def q_filter_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 exists-over-nested-collection: facility kept iff ≥1 unit is
    operating (extractor.py:77-87). Items are collected per order and
    predicated with the higher-order `exists` over array<struct>."""
    li = T(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_returnflag")).alias("items")
    )
    keep = F.exists("items", lambda x: (x["l_quantity"] > 45) & (x["l_returnflag"] == "R"))
    return nested.filter(keep).select("l_orderkey", F.size("items").alias("n_items"))


@register(
    "q_array_overlap",
    oracle="""
    SELECT user_id, count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    HAVING len(list_intersect(list(DISTINCT event_type), ['error', 'signup'])) > 0
    """,
    tags=("filter", "array"),
)
def q_array_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 array-overlap predicate: fuel_tech ∩ selected fuels
    (dashboard.py:539-543) as arrays_overlap on collect_set."""
    ev = T(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(F.collect_set("event_type").alias("types"))
    return g.filter(
        F.arrays_overlap(F.col("types"), F.array(F.lit("error"), F.lit("signup")))
    ).select("user_id", F.size("types").alias("n_types"))


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@register(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join",),
    bench=True,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 dimension lookup join (unit→facility map probe,
    extractor.py:216-230): explicit broadcast of the small side — the
    fact table never shuffles for the join, only for the final agg."""
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "q_enrich_join",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name,
           count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
    tags=("join",),
)
def q_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/J7 multi-hop dimension enrichment (facility & region lookups,
    dashboard.py:350-359): chained broadcast-hash joins — the same plan a
    stream-static enrichment compiles to per micro-batch."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


@register(
    "q_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
    tags=("join",),
    bench=True,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 left outer merge (wide-cache LEFT JOIN on timestamp,
    extractor.py:307) with the NaN→0 gap-fill decision the engine makes
    explicit via coalesce (SURVEY.md §7.4 item 3)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey, c.c_name)
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "q_semi_anti",
    oracle="""
    SELECT CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                THEN 'with_match' ELSE 'without_match' END AS bucket,
           count(*) AS n
    FROM customer c
    GROUP BY 1
    """,
    tags=("join",),
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 semi/anti membership (drop units not in the operating map,
    extractor.py:216-218): left_semi + left_anti branches unioned."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    split = R.semi_anti_split(c, o, "c_custkey")
    return split.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_zip_join",
    oracle="""
    WITH q AS (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem),
         p AS (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem)
    SELECT q.l_orderkey, q.l_linenumber,
           CAST(floor(p.l_extendedprice * 100 / q.l_quantity) AS BIGINT) AS unit_price_cents
    FROM q JOIN p ON q.l_orderkey = p.l_orderkey AND q.l_linenumber = p.l_linenumber
    WHERE q.l_quantity > 0
    """,
    tags=("join",),
)
def q_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4 positional zip as composite-key equi-join: the reference
    zips power↔emission series asserting aligned codes/timestamps
    (extractor.py:206-227); the assert IS the join key."""
    li = T(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_linenumber", "l_quantity")
    p = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_linenumber").alias("r_linenumber"),
        "l_extendedprice",
    )
    return (
        q.filter(F.col("l_quantity") > 0)
        .join(p, (q.l_orderkey == p.r_orderkey) & (q.l_linenumber == p.r_linenumber))
        .select(
            "l_orderkey",
            "l_linenumber",
            # floor-to-cents, not round: both engines see the identical
            # IEEE division result, and floor is unambiguous on it
            # (round() half-boundary semantics differ across engines).
            F.floor(F.col("l_extendedprice") * 100 / F.col("l_quantity")).alias("unit_price_cents"),
        )
    )


@register(
    "q_join_dedup_labels",
    oracle="""
    SELECT r_name AS region_name,
           string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
    tags=("join", "array"),
)
def q_join_dedup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 code→label join with set-dedup (fueltech labels,
    extractor.py:94): broadcast join → collect_set → array_sort →
    pipe-join (scalar output for the oracle)."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.array_join(F.array_sort(F.collect_set("n_name")), "|").alias("nations"))
    )


# ---------------------------------------------------------------------------
# Window functions / sorts / top-k (SURVEY.md §2.5-2.6)
# ---------------------------------------------------------------------------


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_type, round(value, 2) AS last_value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("window",),
    bench=True,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 last-value-per-key snapshot (latest_by_facility maps,
    dashboard.py:364-365): ranking window, tie-broken on event_id. The
    streaming twin lives in streaming.snapshot."""
    ev = T(spark, sf_dir, "events")
    return R.latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"]).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
    )


@register(
    "q_topk_retention",
    oracle="""
    SELECT user_id, event_id, ts
    FROM (
        SELECT user_id, event_id, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn <= 20
    """,
    tags=("window",),
)
def q_topk_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 bounded retention: deque(maxlen=5000) (dashboard.py:266-267) as
    newest-K-per-key rank filter (WindowGroupLimit pushes the limit into
    the sort)."""
    ev = T(spark, sf_dir, "events")
    return R.topk_per_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()], 20
    ).select("user_id", "event_id", "ts")


@register(
    "q_sort",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
    tags=("sort",),
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 global sort + limit (time-ordered replay, publisher.py:58):
    ordering on the *rounded* measure with full tie-break keys makes the
    LIMIT frontier engine-independent. Spark runs TakeOrderedAndProject —
    no full global sort materialization."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Reshape (SURVEY.md §2.4 A2 pivot, §2.9 T1 unpivot)
# ---------------------------------------------------------------------------


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_F,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_O,
           round(avg(l_discount) FILTER (WHERE l_linestatus = 'F'), 4) AS disc_F,
           round(avg(l_discount) FILTER (WHERE l_linestatus = 'O'), 4) AS disc_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("reshape",),
    bench=True,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 pivot long→wide (consolidated cache, extractor.py:302-305) with
    the reference's `{metric}_{code}` column flattening. Pivot values are
    passed explicitly — at scale that skips the distinct-values pre-job."""
    li = T(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.avg("l_discount"), 4).alias("disc"),
        )
    )
    renames = {f"{v}_{m}": f"{m}_{v}" for v in ("F", "O") for m in ("qty", "disc")}
    return wide.withColumnsRenamed(renames)


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
    tags=("reshape",),
    bench=True,  # 180k-row stack: the wide->long reshape path
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-inverse unpivot wide→long (publisher melts the wide cache back
    into per-entity events, publisher.py:49-80): built-in DataFrame
    .unpivot — a narrow transform, no shuffle."""
    li = T(spark, sf_dir, "lineitem")
    return reshape.unpivot_long(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
        ids=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="metric",
        value_name="value",
    )


# ---------------------------------------------------------------------------
# Scalar-function surface (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@register(
    "q_scalar_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_u,
           regexp_replace(p_name, ' ', '_', 'g')            AS slug,
           substring(p_type, 1, 5)                          AS type5,
           length(p_name)                                   AS name_len,
           concat_ws('|', p_brand, p_type)                  AS brand_type,
           round(sqrt(p_retailprice), 4)                    AS sqrt_price,
           least(p_size, 25)                                AS size_capped,
           greatest(CAST(p_size AS INTEGER), 10)            AS size_floored,
           CASE WHEN abs(p_retailprice) < 1000
                THEN printf('%.1f', CAST(p_retailprice AS DOUBLE))
                ELSE format('{:,}', CAST(printf('%.0f', CAST(p_retailprice AS DOUBLE)) AS BIGINT))
           END || ' MW'                                     AS price_label
    FROM part
    """,
    tags=("scalar",),
)
def q_scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F9/F11/F12 string+math scalar surface (prefix strip, concat,
    sqrt/clip, substring, conditional metric formatting) — all
    whole-stage-codegen expressions. The F11 oracle mirrors
    format_number's half-even rounding with printf and adds thousands
    separators integer-side (DuckDB's float format lacks them)."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.regexp_replace("p_name", " ", "_").alias("slug"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.least("p_size", F.lit(25)).alias("size_capped"),
        F.greatest("p_size", F.lit(10)).alias("size_floored"),
        SC.format_metric(F.col("p_retailprice")).alias("price_label"),
    )


@register(
    "q_date_fns",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d-%b-%Y')                    AS order_label,
           CAST(year(o_orderdate) AS INTEGER)                   AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                  AS order_month,
           CAST(o_orderdate + INTERVAL 7 DAY AS DATE)           AS due_date,
           CAST(date_trunc('month', o_orderdate) AS DATE)       AS order_month_start
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    """,
    tags=("scalar", "time"),
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4-F7 date/time scalar surface: format (publisher.py:60 log
    labels), arithmetic (`today-7d` API ranges, extractor.py:145-146),
    truncation."""
    o = T(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")).select(
        "o_orderkey",
        F.date_format("o_orderdate", "dd-MMM-yyyy").alias("order_label"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_add("o_orderdate", 7).alias("due_date"),
        F.trunc("o_orderdate", "month").alias("order_month_start"),
    )
