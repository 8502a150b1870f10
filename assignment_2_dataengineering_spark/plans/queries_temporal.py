"""Temporal + graph engine extensions over the `events` / `documents`
tables: as-of join (attribution), sessionization (gaps-and-islands),
and dedup cluster resolution (connected components over near-dup
pairs). No reference analog — these are the operators a training-data /
event-analytics pipeline needs that Spark lacks as primitives, each
expressed as a shuffle-minimal DataFrame plan with an exact DuckDB
oracle (ASOF JOIN, window functions, recursive CTE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           round((SELECT count(*) FROM c) * 1.0
                 / (SELECT count(*) FROM v), 4) AS view_to_click,
           round((SELECT count(*) FROM p) * 1.0
                 / (SELECT count(*) FROM c), 4) AS click_to_purchase
    """,
    tags=("temporal", "analytics"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage
    counts users whose stage event happened STRICTLY AFTER their
    previous stage's first event — the ordering constraint that
    separates a funnel from three independent counts. Three stage
    aggregates, each keyed on user_id so the per-user partitioning is
    reused; stage k joins only stage k−1's survivors (monotonically
    shrinking). The scalar summary row makes the conversion rates.

    Round-10 measured non-change (guide §2.4 vs §5): checkpointing the
    twice-consumed v/c stage tables (events scans 5 → 3) LOST the
    interleaved A/B at BOTH tiers (sf0.1 0.41→0.54 s, sf10 1.80→2.21 s)
    — the duplicated subtrees are cheap filtered scans plus user-grain
    aggregates that execute as parallel stages of one job, while the
    eager checkpoints serialize them into a job chain (the same
    mechanism as q_lm_score's materialization A/B). Left lazy
    deliberately; the measurement is in OPTIMIZATION_r10.md."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase"))))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") * 1.0 / F.col("n_view"), 4).alias(
                "view_to_click"
            ),
            F.round(F.col("n_purchase") * 1.0 / F.col("n_click"), 4).alias(
                "click_to_purchase"
            ),
        )
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
               AS week_n,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY f.cohort_week, week_n
    ORDER BY f.cohort_week, week_n
    """,
    tags=("temporal", "analytics"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted as active for each subsequent week they appear — the
    standard growth-analytics rollup. Both engines truncate to ISO
    Monday weeks, and week_n is exact integer day arithmetic. Two
    keyed aggregates (first-seen per user, distinct user-week) and one
    join on user_id; the triangle itself is a tiny final rollup."""
    ev = load_table(spark, sf_dir, "events")
    # to_date: DuckDB's week date_trunc yields DATE, Spark's TIMESTAMP —
    # align the output type (weeks are dates; midnight carries nothing).
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_n")
    )


@register(
    "q_dedup_representative",
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
    ),
    clusters AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY a),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, length(d.text) AS n_chars,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY length(d.text) DESC, c.doc_id ASC) AS rn,
               count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
        FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, doc_id AS rep_doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "graph"),
)
def q_dedup_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection — the half of dedup that
    q_dedup_clusters stops short of: after transitive near-dup
    resolution, each cluster keeps its best member (longest text, tie →
    lowest doc_id — the "keep longest duplicate" rule corpus pipelines
    standardize on) and records how many documents it absorbed. One
    ranking window over the (doc, cluster) table joined to doc lengths;
    the oracle extends q_dedup_clusters' recursive-CTE closure with the
    same argmax, so the hash match pins selection, not just clustering.
    At 100 TB the window shuffles (cluster_id, n_chars) pairs only —
    text stays in the scan."""
    docs = T(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.3)
    clusters = DD.dedup_clusters(pairs, docs.select("doc_id"))
    sized = clusters.join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        sized.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


@register(
    "q_ohlc",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP) AS bucket,
               value, ts, event_id
        FROM events
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts ASC, event_id ASC) AS rn_open,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM b
    )
    SELECT event_type, bucket,
           round(min(CASE WHEN rn_open = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(min(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM r GROUP BY event_type, bucket
    """,
    tags=("temporal", "agg"),
    bench=True,  # windowed endpoint-selection family
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling — the canonical time-series compaction
    (open/high/low/close + tick count per key × hour). First/last are
    defined by the TOTAL order (ts, event_id), never arrival order:
    two ranking windows mark the endpoints, one aggregate folds the
    bar, deterministic cross-engine. Both windows and the aggregate
    share the same (event_type, bucket-aligned) partitioning, so at
    100 TB this is one shuffle wide — and the streaming analog is the
    same expression over a tumbling window."""
    ev = T(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.timestamp_seconds(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
        ).alias("bucket"),
        "value",
        "ts",
        "event_id",
    )
    w_open = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_close = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return r.groupBy("event_type", "bucket").agg(
        F.round(F.min(F.when(F.col("rn_open") == 1, F.col("value"))), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.min(F.when(F.col("rn_close") == 1, F.col("value"))), 4).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "q_transition_matrix",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS DOUBLE) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    totals AS (SELECT from_type, sum(n) AS total FROM trans GROUP BY 1)
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           round(t.n / x.total, 4) AS p
    FROM trans t JOIN totals x USING (from_type)
    ORDER BY from_type, to_type
    """,
    tags=("temporal", "stats"),
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types — the
    behavioral-flow summary behind funnel design and next-action
    prediction: order each user's events by the total (ts, event_id)
    order, pair consecutive events with lead(), count and normalize
    per source state. One shuffle on user_id for the lead window, one
    tiny keyed aggregate (|types|² rows) after — at 100 TB the
    per-user ordered pass is the only fact-sized work, and it reuses
    the partitioning sessionization/funnel analysis already need.
    Probabilities divide a double count by a double sum both engines
    compute from exact integers."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = ordered.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("total"), 4).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "q_rolling_zscore",
    oracle="""
    WITH scored AS (
        SELECT event_id, user_id, ts, value,
               count(*) OVER w AS n_base,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sigma
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, round(value, 4) AS value,
           CAST(n_base AS BIGINT) AS n_base,
           round((value - mu) / nullif(sigma, 0.0), 4) AS rolling_z
    FROM scored
    WHERE n_base >= 5
    """,
    tags=("temporal", "window", "stats"),
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly signal: each event scored against the
    mean/stddev of the SAME user's trailing 3 days, EXCLUDING the
    current row (frame ends at 1 microsecond preceding — scoring a
    point against a baseline that contains it dilutes exactly the
    anomalies you want). Time-based RANGE frame on exact epoch micros
    (companion to q_interval_window), with a minimum-baseline guard
    (n ≥ 5) so cold-start rows don't emit garbage z. One shuffle on
    user_id, one ordered pass; Spark buffers only the trailing frame.
    This is q_outliers' global gate made temporal — drift-aware."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-259_200_000_000, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("n_base"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )
    return scored.filter(F.col("n_base") >= 5).select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("value"),
        F.col("n_base").cast("long").alias("n_base"),
        F.round(
            (F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)), 4
        ).alias("rolling_z"),
    )


@register(
    "q_funnel_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1, min(v.t0) AS t0
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2, min(c.t1) AS t1
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT 'view_to_click' AS step,
               (epoch_us(t1) - epoch_us(t0)) / 1000000.0 AS lat_s
        FROM c
        UNION ALL
        SELECT 'click_to_purchase',
               (epoch_us(t2) - epoch_us(t1)) / 1000000.0
        FROM p
    )
    SELECT step, CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
           round(quantile_cont(lat_s, 0.9), 4) AS p90_s,
           round(max(lat_s), 4) AS max_s
    FROM lat GROUP BY step ORDER BY step
    """,
    tags=("temporal", "analytics"),
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution per funnel step — q_funnel says
    HOW MANY convert; this says HOW LONG conversion takes (p50/p90/max
    seconds between a user's first qualifying stage events), the number
    an attribution window or a re-engagement trigger is actually tuned
    from. The stage tables reuse q_funnel's shrinking user-keyed joins;
    latencies are exact epoch-microsecond differences (int64 in both
    engines) divided once into seconds, and percentiles are exact
    interpolated (Spark `percentile` ≡ DuckDB `quantile_cont`). Output
    is 2 summary rows — everything wide stays cluster-side.

    Round-10 measured non-change: checkpointing the twice-consumed c
    stage table lost the interleaved A/B at both tiers (sf0.1
    0.51→0.60 s, sf10 4.11→4.80 s) for the same job-serialization
    reason as q_funnel — see that docstring; left lazy
    deliberately."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.min("t0").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    lat_c = c.select(
        F.lit("view_to_click").alias("step"),
        ((F.unix_micros(F.col("t1").cast("timestamp")) - F.unix_micros(F.col("t0").cast("timestamp"))) / 1_000_000.0).alias("lat_s"),
    )
    lat_p = p.select(
        F.lit("click_to_purchase").alias("step"),
        ((F.unix_micros(F.col("t2").cast("timestamp")) - F.unix_micros(F.col("t1").cast("timestamp"))) / 1_000_000.0).alias("lat_s"),
    )
    return (
        lat_c.unionByName(lat_p)
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.round(F.percentile("lat_s", F.lit(0.5)), 4).alias("p50_s"),
            F.round(F.percentile("lat_s", F.lit(0.9)), 4).alias("p90_s"),
            F.round(F.max("lat_s"), 4).alias("max_s"),
        )
        .orderBy("step")
    )


@register(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               round(sum(value), 4) AS revenue
        FROM events GROUP BY 1, 2
    ),
    f AS (
        SELECT event_type, day, revenue,
               lag(revenue, 7) OVER (PARTITION BY event_type ORDER BY day)
                   AS forecast
        FROM daily
    )
    SELECT event_type,
           CAST(count(forecast) AS BIGINT) AS n_scored,
           round(avg(abs(revenue - forecast) / nullif(abs(revenue), 0.0)), 4)
               AS mape,
           round(avg(abs(revenue - forecast)), 4) AS mae
    FROM f GROUP BY event_type ORDER BY event_type
    """,
    tags=("temporal", "forecast"),
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every real
    forecasting pipeline must beat, and the backtest harness shape
    (predict day d from day d−7, score MAPE/MAE over the history)
    that a fancier model plugs into unchanged. The daily aggregate and
    the lag-7 window share the event_type partitioning — one shuffle;
    scoring is a second tiny aggregate on the same keys. Revenue is
    4dp-rounded BEFORE differencing so both engines subtract identical
    doubles; zero-revenue days drop out of MAPE via nullif."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("day")
    f = daily.withColumn("forecast", F.lag("revenue", 7).over(w))
    err = F.abs(F.col("revenue") - F.col("forecast"))
    return (
        f.groupBy("event_type")
        .agg(
            F.count("forecast").cast("long").alias("n_scored"),
            F.round(
                F.avg(err / F.nullif(F.abs(F.col("revenue")), F.lit(0.0))), 4
            ).alias("mape"),
            F.round(F.avg(err), 4).alias("mae"),
        )
        .orderBy("event_type")
    )


@register(
    "q_growth_accounting",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    flagged AS (
        SELECT user_id, week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
               lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week,
               min(week) OVER (PARTITION BY user_id) AS first_week
        FROM uw
    ),
    states AS (
        SELECT week,
               CASE WHEN week = first_week THEN 'new'
                    WHEN prev_week = week - 7 THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM flagged
    ),
    churn AS (
        SELECT week + 7 AS week, count(*) AS n_churned
        FROM flagged
        WHERE next_week IS NULL OR next_week <> week + 7
        GROUP BY 1
    ),
    weekly AS (
        SELECT week,
               CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM states GROUP BY week
    )
    SELECT w.week, w.n_new, w.n_retained, w.n_resurrected,
           CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned
    FROM weekly w LEFT JOIN churn c USING (week)
    ORDER BY w.week
    """,
    tags=("temporal", "analytics"),
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the new / retained / resurrected /
    churned decomposition (the 'quick ratio' inputs) every growth team
    reports, and the stricter sibling of q_cohort_retention: a user is
    NEW in their first active week, RETAINED if active the immediately
    previous week, RESURRECTED otherwise; users who fail to return the
    following week count as CHURNED in that week. One shuffle on
    user_id carries the lag/lead/min windows; the weekly rollups and
    the churn attribution join are week-keyed and tiny. Calendar math
    is exact DATE arithmetic on ISO Monday weeks — no float, no tz
    ambiguity under the pinned UTC session."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("week")
    wp = Window.partitionBy("user_id")
    flagged = uw.select(
        "user_id",
        "week",
        F.lag("week").over(wu).alias("prev_week"),
        F.lead("week").over(wu).alias("next_week"),
        F.min("week").over(wp).alias("first_week"),
    )
    states = flagged.select(
        "week",
        F.when(F.col("week") == F.col("first_week"), "new")
        .when(F.col("prev_week") == F.date_sub("week", 7), "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    weekly = states.groupBy("week").agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        flagged.filter(
            F.col("next_week").isNull()
            | (F.col("next_week") != F.date_add("week", 7))
        )
        .select(F.date_add("week", 7).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        weekly.join(churn, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


@register(
    "q_user_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 10
    """,
    tags=("temporal", "analytics"),
)
def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys — the path-analysis view behind
    funnel DISCOVERY (q_funnel checks a hypothesized path; this ranks
    the paths users actually take). Two leads over the same per-user
    total order produce each consecutive event triple with no
    self-joins — the window shuffle on user_id is the only fact-sized
    exchange, and the path table collapses to ≤ |types|³ rows before
    the TakeOrdered top-10 cut (count, then path lexicographic —
    a total order, so the cut is deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(10)
    )


@register(
    "q_attribution",
    oracle="""
    WITH marked AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS e_us,
               CASE WHEN event_type IN ('click', 'view')
                    THEN struct_pack(e_us := epoch_us(ts),
                                     event_id := event_id,
                                     event_type := event_type) END AS touch
        FROM events
    ),
    attributed AS (
        SELECT event_id, user_id, event_type,
               max(touch) OVER w AS last_touch,
               min(touch) OVER w AS first_touch
        FROM marked
        WINDOW w AS (PARTITION BY user_id ORDER BY e_us
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id,
           last_touch.event_id AS last_touch_id,
           last_touch.event_type AS last_touch_type,
           first_touch.event_id AS first_touch_id,
           first_touch.event_type AS first_touch_type
    FROM attributed WHERE event_type = 'purchase'
    """,
    tags=("temporal", "window"),
    bench=True,  # the value-range window frame path
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch marketing attribution: each purchase is
    credited to the earliest and latest click/view by the same user in
    a trailing 7-day RANGE window. The touch is a (epoch, event_id,
    type) STRUCT so min/max order lexicographically — deterministic
    even when two touches share a timestamp, with no second sort key
    in the frame (RANGE frames admit only one ORDER BY expression).
    One hash exchange on user_id serves both window aggregates; the
    frame is value-based, so state per user is bounded by the 7-day
    horizon, not history length — the streaming-watermark analog in a
    batch plan."""
    ev = T(spark, sf_dir, "events")
    e_us = TP._us("ts")
    touch = F.when(
        F.col("event_type").isin("click", "view"),
        F.struct(
            e_us.alias("e_us"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(e_us)
        .rangeBetween(-604_800_000_000, 0)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.max(touch).over(w).alias("last_touch"),
        F.min(touch).over(w).alias("first_touch"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("last_touch.event_id").alias("last_touch_id"),
        F.col("last_touch.event_type").alias("last_touch_type"),
        F.col("first_touch.event_id").alias("first_touch_id"),
        F.col("first_touch.event_type").alias("first_touch_type"),
    )


@register(
    "q_decay_agg",
    oracle="""
    WITH anchor AS (SELECT max(epoch_us(ts)) AS a_us FROM events),
         w AS (
           SELECT user_id,
                  CAST(floor(value * 100) AS BIGINT)
                    * pow(2.0, -((a_us - epoch_us(ts)) // 86400000000)) AS dv
           FROM events, anchor
           WHERE event_type = 'purchase'
         )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(dv) / 100, 6) AS decayed_cents
    FROM w GROUP BY user_id
    """,
    tags=("temporal", "agg"),
)
def q_decay_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay purchase score per user (half-life one
    day, anchored at the corpus max timestamp): the recency weighting
    behind engagement scores and decayed LTV. Engineered for
    cross-engine exactness — values floor to integer cents, the decay
    weight is a POWER OF TWO (2^-age_days, exactly representable; a
    libm exp() would drift in the last ulp), so every addend is a
    dyadic rational m/2^k and the double sum is EXACT and
    order-independent at any parallelism. The anchor rides a 1-row
    broadcast cross-join; one hash aggregate on user_id."""
    ev_all = T(spark, sf_dir, "events")
    ev = ev_all.filter(F.col("event_type") == "purchase")
    anchor = ev_all.agg(F.max(TP._us("ts")).alias("a_us"))
    age_days = F.expr("(a_us - __e_us) DIV 86400000000")
    dv = F.floor(F.col("value") * 100).cast("long") * F.pow(
        F.lit(2.0), -age_days
    )
    return (
        ev.withColumn("__e_us", TP._us("ts"))
        .crossJoin(F.broadcast(anchor))
        .select("user_id", dv.alias("dv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("dv") / 100, 6).alias("decayed_cents"),
        )
    )


@register(
    "q_concurrency",
    oracle="""
    WITH pts AS (
        SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, epoch_us(ts) + 300000000, -1 FROM events
    ),
    run AS (
        SELECT event_type, t, delta,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM pts
    )
    SELECT event_type, CAST(max(live) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY event_type
    """,
    tags=("temporal",),
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type with each event live for 5
    minutes: the sweep-line classic — +1/−1 boundary points, running
    sum in boundary order, max. The (t, delta) sort puts an expiry at
    the same instant BEFORE the arrival (delta −1 < +1), so touching
    intervals don't double-count — that tie rule is what makes the
    result well-defined and cross-engine identical. One exchange on
    event_type; the running sum buffers one row."""
    ev = T(spark, sf_dir, "events")
    t_us = TP._us("ts")
    pts = ev.select(
        "event_type", t_us.alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "event_type", (t_us + 300_000_000).alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pts.withColumn("live", F.sum("delta").over(w))
        .groupBy("event_type")
        .agg(F.max("live").cast("long").alias("peak_concurrency"))
    )


@register(
    "q_event_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           min(ts) AS first_match_ts
    FROM seq
    WHERE event_type = 'click' AND e2 = 'view' AND e3 = 'purchase'
    GROUP BY user_id
    """,
    tags=("temporal", "window"),
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence pattern matching (MATCH_RECOGNIZE-lite): users
    whose stream contains click→view→purchase as CONSECUTIVE events —
    stricter than the funnel's eventually-ordered semantics. Two lead()
    offsets in one window pass; one exchange on user_id; the pattern
    predicate is pure codegen. Longer patterns extend with more leads;
    regex-over-events compiles to exactly this shape."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "click")
            & (F.col("e2") == "view")
            & (F.col("e3") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("ts").alias("first_match_ts"),
        )
    )


@register(
    "q_asof_forward",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'error'),
         p AS (SELECT user_id, ts, round(max(value), 2) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT e.user_id, e.event_id, e.ts,
           p.purchase_value AS next_purchase_value,
           p.ts             AS next_purchase_ts
    FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
    tags=("join", "temporal"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each error attributed to the same user's
    next purchase at-or-after it — time-to-recovery / time-to-convert
    analysis. Same union+carry plan as the backward form run in
    descending time order (operators/temporal.asof_join
    direction='forward'); DuckDB's native forward ASOF (l.ts <= r.ts)
    is the oracle. Purchases pre-aggregated per (user, ts) for
    deterministic ties."""
    ev = T(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )
    out = TP.asof_join(
        errors, purchases, ["user_id"], right_cols=["purchase_value"],
        direction="forward",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("purchase_value_right").alias("next_purchase_value"),
        F.col("ts_right").alias("next_purchase_ts"),
    )


@register(
    "q_watermark_audit",
    oracle="""
    WITH arr AS (
        SELECT event_type,
               epoch_us(ts) AS t,
               max(epoch_us(ts)) OVER (PARTITION BY event_type
                                       ORDER BY event_id + (event_id * 37) % 7,
                                                event_id
                                       ROWS UNBOUNDED PRECEDING) AS high_water
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CASE WHEN high_water - t > 300000000 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS late_5m,
           round(sum(CASE WHEN high_water - t > 900000000 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS late_15m,
           round(sum(CASE WHEN high_water - t > 1800000000 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS late_30m
    FROM arr GROUP BY event_type
    """,
    tags=("temporal", "streaming"),
)
def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay tuning audit: how many events would arrive
    LATER than a 5/15/30-minute watermark (event-time high-water minus
    own timestamp)? The number that chooses `withWatermark`'s delay
    before any stream runs — too small drops data, too large bloats
    state (streaming/windows.py). The fixture's event_id is perfectly
    time-ordered (zero lateness, a degenerate audit), so arrival order
    is simulated with a deterministic local jitter of 0-6 positions
    (event_id + 37·event_id mod 7) — yielding ~11%/3%/0.3% late at the
    three delays. One running-max window per event_type and one
    aggregate on the same partitioning; all three candidate delays
    measured in a single pass. Fractions divide exact integer
    counts."""
    ev = T(spark, sf_dir, "events")
    t_us = TP._us("ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy(
            F.col("event_id") + (F.col("event_id") * 37) % 7, F.col("event_id")
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    arr = ev.select(
        "event_type",
        t_us.alias("t"),
        F.max(t_us).over(w).alias("high_water"),
    )
    late = lambda us: F.round(
        F.sum(F.when(F.col("high_water") - F.col("t") > us, 1).otherwise(0))
        / F.count(F.lit(1)),
        6,
    )
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        late(300_000_000).alias("late_5m"),
        late(900_000_000).alias("late_15m"),
        late(1_800_000_000).alias("late_30m"),
    )


@register(
    "q_twap",
    oracle="""
    WITH seg AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - epoch_us(ts)
                 AS dur_us
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           round(sum(cents * dur_us) / CAST(sum(dur_us) AS DOUBLE) / 100, 6)
             AS twap
    FROM seg WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
    tags=("temporal", "agg"),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each observation holds
    until the next one, weight = holding duration. The metric that
    makes irregularly-sampled series comparable (a plain mean
    over-weights chatty periods). Engineered exact: integer cents ×
    integer microsecond durations summed as LONGS (no float
    accumulation order anywhere), one double division at the end. One
    lead() window and one aggregate on the same user partitioning —
    a single exchange."""
    ev = T(spark, sf_dir, "events")
    t_us = TP._us("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        (F.lead(t_us).over(w) - t_us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur_us").cast("long").alias("total_us"),
        F.round(
            F.sum(F.col("cents") * F.col("dur_us"))
            / F.sum("dur_us").cast("double")
            / 100,
            6,
        ).alias("twap"),
    )


@register(
    "q_windowed_funnel",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS t FROM events
        WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, epoch_us(ts) AS pt FROM events
        WHERE event_type = 'purchase'
    )
    SELECT CAST(c.ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM purchases p
                 WHERE p.user_id = c.user_id
                   AND p.pt > c.t AND p.pt <= c.t + 3600000000)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           round(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM purchases p
                 WHERE p.user_id = c.user_id
                   AND p.pt > c.t AND p.pt <= c.t + 3600000000)
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS conversion_rate
    FROM clicks c GROUP BY 1
    """,
    tags=("temporal", "funnel"),
)
def q_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: clicks converting to a purchase WITHIN
    ONE HOUR (the plain funnel counts eventual conversion; product
    questions are almost always windowed). The engine computes the
    existence test as a FORWARD as-of join (next purchase per click,
    operators/temporal.asof_join direction='forward') + a horizon
    predicate — linear per key, no range join — where the oracle's
    EXISTS subquery is the quadratic form. Edge semantics: the as-of
    probes from click_ts + 1 µs, so it carries the earliest STRICTLY
    LATER purchase — exactly the oracle's `pt > c.t`; a purchase tied
    to the click microsecond neither converts nor masks a later
    within-hour one. Conversion rates divide exact counts per day."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "ts",
        # probe 1 µs after the click: the inclusive forward as-of then
        # implements the strictly-after contract at microsecond grain
        (F.col("ts") + F.expr("INTERVAL 1 MICROSECOND")).alias("ts_probe"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("user_id", "ts")
    )
    nxt = TP.asof_join(
        clicks,
        purchases,
        ["user_id"],
        left_ts="ts_probe",
        right_cols=[],
        direction="forward",
    )
    gap_us = TP._us(F.col("ts_right")) - TP._us(F.col("ts"))
    converted = (
        F.col("ts_right").isNotNull() & (gap_us <= 3_600_000_000)
    ).cast("int")
    return (
        nxt.select(F.col("ts").cast("date").alias("day"), converted.alias("conv"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum("conv").cast("long").alias("n_converted"),
            F.round(F.sum("conv") / F.count(F.lit(1)), 6).alias("conversion_rate"),
        )
    )


@register(
    "q_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pre AS (
        SELECT day, cents, n,
               sum(cents) OVER w AS c1, sum(cents * cents) OVER w AS c2,
               sum(n) OVER w AS cn,
               (SELECT sum(cents) FROM daily) AS t1,
               (SELECT sum(cents * cents) FROM daily) AS t2,
               (SELECT sum(n) FROM daily) AS tn,
               row_number() OVER (ORDER BY day) AS rn,
               (SELECT count(*) FROM daily) AS nd
        FROM daily
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
        SELECT day,
               (c2 - c1 * (c1 / CAST(cn AS DOUBLE)))
               + ((t2 - c2) - (t1 - c1) * ((t1 - c1) / CAST(tn - cn AS DOUBLE)))
                 AS sse,
               round(c1 / CAST(cn AS DOUBLE) / 100, 6) AS mean_before,
               round((t1 - c1) / CAST(tn - cn AS DOUBLE) / 100, 6) AS mean_after
        FROM pre WHERE rn < nd
    )
    SELECT day AS split_day, mean_before, mean_after
    FROM scored ORDER BY sse ASC, day ASC LIMIT 1
    """,
    tags=("temporal", "stats"),
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point by binary segmentation: the day split that
    minimizes total within-segment sum of squares of daily purchase
    volume — computed for every candidate split from ONE pass of
    prefix sums (Σx, Σx², Σn as exact longs over integer cents), so
    the whole search is a ~30-row window pass, not 30 re-aggregations.
    The SSE comparison runs on doubles derived from identical exact
    integers — deterministic argmin with a day tie-break. The
    fact-sized work is one daily aggregate; everything after is
    calendar-sized."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.sum("cents").alias("t1"),
        F.sum(F.col("cents") * F.col("cents")).alias("t2"),
        F.sum("n").alias("tn"),
        F.count(F.lit(1)).alias("nd"),
    )
    pre = (
        daily.select(
            "day",
            F.sum("cents").over(w).alias("c1"),
            F.sum(F.col("cents") * F.col("cents")).over(w).alias("c2"),
            F.sum("n").over(w).alias("cn"),
            F.row_number().over(Window.orderBy("day")).alias("rn"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("rn") < F.col("nd"))
    )
    cn_d = F.col("cn").cast("double")
    rn_d = (F.col("tn") - F.col("cn")).cast("double")
    sse = (
        F.col("c2") - F.col("c1") * (F.col("c1") / cn_d)
    ) + (
        (F.col("t2") - F.col("c2"))
        - (F.col("t1") - F.col("c1")) * ((F.col("t1") - F.col("c1")) / rn_d)
    )
    return (
        pre.select(
            F.col("day").alias("split_day"),
            sse.alias("sse"),
            F.round(F.col("c1") / cn_d / 100, 6).alias("mean_before"),
            F.round((F.col("t1") - F.col("c1")) / rn_d / 100, 6).alias("mean_after"),
        )
        .orderBy(F.col("sse").asc(), F.col("split_day").asc())
        .limit(1)
        .drop("sse")
    )


@register(
    "q_tail_latency",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) - epoch_us(ts)
                 AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.50) / 1e6, 4) AS p50_s,
           round(quantile_cont(gap_us, 0.95) / 1e6, 4) AS p95_s,
           round(quantile_cont(gap_us, 0.99) / 1e6, 4) AS p99_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=("temporal", "observability"),
)
def q_tail_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival tail latency per stream: p50/p95/p99 of the gap
    between consecutive events of each type — the freshness-SLO
    companion to q_freshness_audit (that says how STALE; this says how
    BURSTY). Gaps are exact integer microseconds from one lead()
    window; three interpolated percentiles in one aggregate (at 100 TB
    the exact-quantile histogram path, operators/quantile.py, replaces
    the value-map percentile per the documented trade-off)."""
    ev = T(spark, sf_dir, "events")
    t_us = TP._us("ts")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (F.lead(t_us).over(w) - t_us).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile("gap_us", 0.50) / 1e6, 4).alias("p50_s"),
        F.round(F.percentile("gap_us", 0.95) / 1e6, 4).alias("p95_s"),
        F.round(F.percentile("gap_us", 0.99) / 1e6, 4).alias("p99_s"),
    )
