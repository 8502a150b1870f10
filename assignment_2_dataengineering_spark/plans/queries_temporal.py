"""Temporal + graph engine extensions over the `events` / `documents`
tables: as-of join (attribution), sessionization (gaps-and-islands),
and dedup cluster resolution (connected components over near-dup
pairs). No reference analog — these are the operators a training-data /
event-analytics pipeline needs that Spark lacks as primitives, each
expressed as a shuffle-minimal DataFrame plan with an exact DuckDB
oracle (ASOF JOIN, window functions, recursive CTE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import temporal as TP
from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_asof_join",
    oracle="""
    WITH p AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, round(max(value), 2) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.user_id, p.event_id, p.ts,
           round(p.value, 2) AS purchase_value,
           c.click_value     AS last_click_value,
           c.ts              AS last_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "temporal"),
    bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase attributed to the user's most
    recent prior (or simultaneous) click. The union+window merge plan
    (operators/temporal.py) — one shuffle on user_id, linear per key —
    against DuckDB's native ASOF LEFT JOIN. Clicks pre-aggregated per
    (user, ts) so tie resolution is deterministic in both engines."""
    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("click_value"))
    )
    out = TP.asof_join(purchases, clicks, ["user_id"], right_cols=["click_value"])
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.round("value", 2).alias("purchase_value"),
        F.col("click_value_right").alias("last_click_value"),
        F.col("ts_right").alias("last_click_ts"),
    )


@register(
    "q_range_join",
    oracle="""
    WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase')
    SELECT e.event_id, CAST(count(p.p_id) AS BIGINT) AS n_nearby
    FROM e LEFT JOIN p
      ON abs(epoch_us(e.ts) - epoch_us(p.p_ts)) <= 300000000
    GROUP BY 1
    """,
    tags=("join", "temporal"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal co-occurrence: purchases within ±5 min of each error
    event (zero-count errors kept). The binned-bucket range join
    (operators/temporal.py range_join) — hash equi-join on the time
    bucket with 3× bounded fan-out — against DuckDB's literal
    inequality join, which is only feasible because the oracle corpus
    is small; the inequality form IS the cartesian blow-up the binning
    avoids."""
    ev = T(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    pairs = TP.range_join(errors, purchases, "ts", "p_ts", 300)
    counts = pairs.groupBy("event_id").agg(F.count("p_id").alias("n_nearby"))
    return (
        errors.join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"))
    )


@register(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
    FROM sess GROUP BY 1, 2
    """,
    tags=("window", "temporal"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) per user:
    lag → boundary flag → running-sum session index → session agg, all
    on ONE shuffle (the agg keys extend the window keys, so no second
    exchange). Streaming analog: session_window_sums
    (streaming/windows.py) with watermark-based session closure."""
    ev = T(spark, sf_dir, "events")
    return TP.sessionize(ev.select("user_id", "ts"), ["user_id"], gap_minutes=30)


@register(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM words WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
    jp AS (SELECT id_a, id_b
           FROM prs JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
           WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.3),
    edges AS (SELECT id_a AS a, id_b AS b FROM jp
              UNION ALL SELECT id_b, id_a FROM jp),
    reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
    """,
    tags=("dedup", "graph"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact 3-gram-Jaccard near-dup
    pairs: transitive duplicates (A~B, B~C) collapse to one cluster
    keyed by its min doc_id; singletons label themselves. Iterative
    min-label propagation (operators/dedup.py dedup_clusters) vs a
    DuckDB recursive-CTE transitive closure — an exact oracle for an
    iterative distributed algorithm."""
    docs = T(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.3)
    return DD.dedup_clusters(pairs, docs.select("doc_id"))


@register(
    "q_gap_fill",
    oracle="""
    WITH obs AS (
        SELECT user_id,
               CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS TIMESTAMP) AS bucket,
               round(sum(value), 4) AS observed
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
    grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 300 SECOND)) AS bucket
        FROM span
    )
    SELECT g.user_id, g.bucket, o.observed,
           last_value(o.observed IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket ROWS UNBOUNDED PRECEDING
           ) AS filled,
           CASE WHEN o.observed IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
    """,
    tags=("temporal", "window"),
    bench=True,  # densify + forward-fill family
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (time_bucket_gapfill/locf):
    per-user 5-minute grid densified between first and last observation
    with sequence()+explode (JVM-side, no driver loop), gaps left-joined
    against the observed per-bucket sums, then last(ignorenulls) carries
    values forward. Leading gaps stay NULL (nothing to carry). One
    shuffle for the bucket agg, a tiny span agg, one co-partitioned
    window pass (operators/temporal.gap_fill)."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return TP.gap_fill(ev, ["user_id"], ts_col="ts", value_col="value", bucket_s=300)


@register(
    "q_interval_window",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 2) AS sum_1h
    FROM events
    WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("temporal", "window"),
)
def q_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window: per-user rolling 1-hour event count
    and value sum — the "how much in the trailing hour, as of every
    event" shape rate limiting and anomaly scoring need, where ROWS
    frames are wrong because event spacing is irregular. The frame is
    anchored on exact epoch-microsecond integers (sub-second timestamps
    make seconds truncation lossy; micros are exact int64 in both
    engines, so the 1h boundary admits the same rows). One shuffle on
    user_id, then a single ordered pass per partition — Spark's window
    operator keeps only the trailing hour buffered, which is what makes
    this viable on an unbounded-ish event history at 100 TB."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )
