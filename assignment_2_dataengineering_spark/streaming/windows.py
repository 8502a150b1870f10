"""Watermarked tumbling-window aggregation + duplicate suppression
(SURVEY.md §2.9 T5/T6/T7).

The reference buffers 5000 events in deques and re-aggregates 5-minute
buckets over the last 60 minutes on every render (dashboard.py:500-561).
The engine computes the same windows incrementally: watermark bounds
state (eviction = the deque's maxlen, but time-based and correct), and
dropDuplicates implements the dedup the reference describes but never
built (readme.md:157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(events: DataFrame, keys: list[str], watermark: str | None = "60 minutes", ts_col: str = "ts") -> DataFrame:
    """T7 duplicate suppression on (key, event-time). With a watermark
    the state store evicts old keys; QoS-1 at-least-once delivery (T8)
    composes with this into effective exactly-once."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return events.dropDuplicates(keys + [ts_col])


def tumbling_window_sums(
    events: DataFrame,
    key: str,
    measures: list[str],
    window: str = "5 minutes",
    watermark: str | None = "60 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """T5/A3: per-key 5-minute tumbling sums. Streaming: watermarked
    (late events beyond 60 min dropped — the reference trusts order and
    would silently miscount, SURVEY.md §7.4 item 2); batch: same code
    without watermark, windows computed over all data. Pass
    watermark=None when the stream is already watermarked upstream
    (e.g. after dedup_events — Spark disallows redefining it across
    chained stateful operators)."""
    if events.isStreaming and watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), F.col(key))
        .agg(*[F.round(F.sum(m), 4).alias(f"sum_{m}") for m in measures])
        .select(F.col("w.start").alias("bucket"), key, *[f"sum_{m}" for m in measures])
    )


def session_window_sums(
    events: DataFrame,
    key: str,
    measures: list[str],
    gap: str = "30 minutes",
    watermark: str | None = "60 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessionization, streaming-native: Spark's session_window merges
    events within `gap` of each other into one growing window per key;
    the watermark closes a session once no in-order event can extend it.
    Batch form of the same semantics (with an exact oracle):
    operators.temporal.sessionize."""
    if events.isStreaming and watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[F.round(F.sum(m), 4).alias(f"sum_{m}") for m in measures],
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
            *[f"sum_{m}" for m in measures],
        )
    )


def totals_timeseries(
    events: DataFrame,
    measures: list[str],
    horizon_minutes: int = 60,
    bucket: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """The dashboard's time-series query (totals_timeseries,
    dashboard.py:500-561): filter to the last `horizon_minutes` anchored
    at max(ts), bucket into tumbling windows, sum across all keys, sort
    by bucket. Batch form (the render plane re-queries a snapshot)."""
    from ..operators.relational import time_horizon

    recent = time_horizon(events, ts_col, horizon_minutes)
    return (
        recent.groupBy(F.window(ts_col, bucket).alias("w"))
        .agg(*[F.round(F.sum(m), 4).alias(f"sum_{m}") for m in measures])
        .select(F.col("w.start").alias("bucket"), *[f"sum_{m}" for m in measures])
        .orderBy("bucket")
    )
