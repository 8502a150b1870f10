"""Stream-stream joins (Structured Streaming surface the reference
never had — its dashboard correlates facility and market data only
through driver-side dict snapshots, dashboard.py:363-380).

Spark buffers both sides in watermark-bounded state and emits matches
as they arrive; the interval bound is what makes state finite — an
unbounded-time stream-stream equi-join would buffer both streams
forever."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    bound: str = "5 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on key equality within
    ±`bound` event time. Streaming: both sides watermarked, so each
    side's buffered state is bounded by watermark + bound; late rows
    beyond the watermark drop instead of growing state. Batch: the
    identical plan degenerates to a normal join + range filter, which
    is what the e2e test compares against.

    Columns resolve against their OWN frame (l[...], r[...]) — bare
    F.col raised AMBIGUOUS_REFERENCE for the natural call where both
    sides carry the ingest-standard 'ts' name."""
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(ts_left, watermark)
    if r.isStreaming:
        r = r.withWatermark(ts_right, watermark)
    cond = (l[key_left] == r[key_right]) & r[ts_right].between(
        l[ts_left] - F.expr(f"INTERVAL {bound}"),
        l[ts_left] + F.expr(f"INTERVAL {bound}"),
    )
    return l.join(r, cond, how)
