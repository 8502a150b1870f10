"""Temporal operators Spark's DataFrame API lacks as primitives:
as-of join and sessionization — both expressed as single-shuffle
window plans, never as range cross-joins.

These are engine extensions (no reference analog): the reference's
dashboard implicitly "as-ofs" by holding latest state in a dict;
a pipeline that backfills or attributes needs the set-based form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_ts(col: str | Column) -> Column:
    # unix_micros / cast-to-long reject TIMESTAMP_NTZ (what Spark 4
    # infers from tz-naive parquet); route through TIMESTAMP first —
    # the session tz is pinned UTC (sources/tables.py _pin_utc) so the
    # reinterpretation is deterministic, and it is a no-op for LTZ.
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def _us(col: str | Column) -> Column:
    """Integer epoch microseconds, NTZ-tolerant."""
    return F.unix_micros(_as_ts(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts ≤ left_ts per key (backward as-of, inclusive — DuckDB /
    pandas.merge_asof semantics); direction="forward" attaches the
    EARLIEST right row with right_ts ≥ left_ts instead (time-to-next
    -event analysis), by running the same carry pass in descending
    time order.

    Plan shape — the 100 TB-safe one: UNION the two sides tagged, one
    shuffle on the key, one ordered window pass carrying each right
    payload forward with last(ignorenulls). No range predicate ever
    reaches a join: a naive `l.key = r.key AND r.ts <= l.ts` +
    row_number plan explodes to |L|·|R| per key before pruning, which
    at skewed keys is quadratic; this is linear in |L|+|R| per key.

    Ties: a right row at exactly left_ts matches (sorted ahead of the
    left row); multiple right rows on the same (key, ts) resolve to the
    window's last — pre-aggregate the right side if that matters.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]

    # The right payload travels as ONE struct, carried atomically by a
    # single last(ignorenulls): carrying each column independently
    # would back-fill a NULL field of the latest right row from an
    # OLDER right row — a torn row mixing two right matches, which is
    # not merge_asof/DuckDB ASOF semantics (whole-row carry).
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(right_ts).alias("__rts"),
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__t"),
        F.lit(None)
        .cast(
            right.select(payload.alias("__p")).schema["__p"].dataType
        )
        .alias("__p"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__t"),
        payload.alias("__p"),
    )

    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows (side 1) at equal ts →
    # an exactly-simultaneous right row is visible to the left row;
    # forward direction = the same carry in reverse time order
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = Window.partitionBy(*on).orderBy(t_order, F.col("__side").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col("__side"),
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__p.{c}").alias(f"{c}{suffix}") for c in right_cols],
            F.col("__p.__rts").alias(f"{right_ts}{suffix}"),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Pairs within |left_ts − right_ts| ≤ tolerance (plus optional
    equality keys): the temporal co-occurrence join.

    Plan shape — binned equi-join, not an inequality join: each side is
    bucketed to floor(ts / tolerance); a row can only match rows in its
    own or an adjacent bucket, so the right side explodes into
    {b−1, b, b+1} and the join is a plain hash equi-join on (keys,
    bucket) with the exact |Δt| ≤ tol filter after. A raw inequality
    predicate gives Catalyst nothing to hash on — without keys it is a
    cartesian product, with keys it is a per-key cross product; binning
    bounds the fan-out to 3 buckets per row at any scale. Timestamp
    math is integer microseconds end-to-end (no float boundary
    wobble). Column names must be disjoint across the two sides."""
    tol_us = int(tolerance_s) * 1_000_000
    on = on or []

    def _bucket(ts_col: str):
        # exact integer FLOOR division, all in long arithmetic (pmod
        # makes truncating DIV a floor for negative pre-1970 micros):
        # double division rounds past 2^53, so a far-future sentinel ts
        # (9999-12-31 ≈ 2.5e17 µs) near a boundary could land one
        # bucket off and silently miss in-tolerance pairs — the
        # "integer microseconds end-to-end" claim made real
        t = f"unix_micros(cast({ts_col} as timestamp))"
        return F.expr(f"({t} - pmod({t}, {tol_us})) DIV {tol_us}")

    lb = _bucket(left_ts)
    rb = _bucket(right_ts)
    l2 = left.withColumn("__b", lb)
    r2 = right.withColumn("__b", F.explode(F.array(rb - 1, rb, rb + 1)))
    within = F.abs(_us(left_ts) - _us(right_ts)) <= tol_us
    return l2.join(r2, on + ["__b"]).filter(within).drop("__b")


def gap_fill(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 300,
) -> DataFrame:
    """Regularize an irregular time series onto a fixed grid with
    forward fill — the hypertable/timeseries-DB `time_bucket_gapfill +
    locf` operator.

    Per key: observed buckets aggregate (sum) onto the floor(ts/bucket)
    grid; the full dense grid min..max bucket is generated JVM-side with
    sequence()+explode (no driver loop, no UDF); a left join marks gaps;
    last(ignorenulls) over the bucket order carries the previous
    observed value forward. Leading gaps (before the first observation)
    stay NULL — they have no "last" to carry.

    Scale: one shuffle for the per-bucket agg, one for the per-key
    min/max (tiny), one window pass on the same key partitioning. The
    dense grid is |keys| × horizon/bucket rows — generated, never
    shuffled pre-join (the join key includes the key columns, so it
    co-partitions with the observed aggregate). A key spanning years at
    second granularity explodes its own grid only.
    """
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s).cast("long") * bucket_s
    )
    observed = (
        events.select(*keys, bucket.alias("bucket"), F.col(value_col))
        .groupBy(*keys, "bucket")
        .agg(F.round(F.sum(value_col), 4).alias("observed"))
    )
    spans = observed.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {bucket_s} SECONDS"))
        ).alias("bucket"),
    )
    joined = grid.join(observed, [*keys, "bucket"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "bucket",
        "observed",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
        F.when(F.col("observed").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def sessionize(
    events: DataFrame,
    keys: list[str],
    gap_minutes: int = 30,
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    per-key gap since the previous event exceeds `gap_minutes`. Returns
    one row per (keys, session_id) with start/end/duration/event count.

    One shuffle on the key: lag → boundary flag → running sum (the
    session index) → session agg reuses the same partitioning (no
    second exchange — the groupBy keys extend the window keys).
    Streaming analog: `streaming.windows.session_window_sums` (Spark's
    native session_window with watermark-based closure)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    flagged = events.withColumn(
        "__new_session",
        F.when(
            _as_ts(ts_col).cast("long") - F.lag(_as_ts(ts_col).cast("long")).over(w) > gap_s,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        flagged.groupBy(*keys, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_s",
            _as_ts("session_end").cast("long") - _as_ts("session_start").cast("long"),
        )
    )
