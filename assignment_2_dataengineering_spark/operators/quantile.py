"""Exact distributed quantiles by histogram refinement.

Spark's exact `percentile` aggregate materializes a per-group
value-count map in executor memory — fine at test scale, a liability
when one group holds 10¹¹ distinct values. The classic scalable exact
algorithm needs only COUNTS: bucket the value range, count per bucket
(one scan, map-side combined), walk the tiny histogram on the driver to
find the bucket containing the target rank, recurse INTO that bucket.
With 1024 buckets, each pass shrinks the candidate range 1024× — three
passes pin an exact 64-bit value over any data distribution, at the
cost of three scans that are each cheaper than a shuffle (the histogram
is a 1024-row aggregate; only it ever reaches the driver).

Values must be integers (cents, micros, bytes): integer arithmetic is
what makes the bucket boundaries, ranks, and the final answer exact and
engine-independent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_quantile_int(
    df: DataFrame, value: Column, q: float, buckets: int = 1024
) -> int | None:
    """The exact q-quantile (smallest value v such that at least
    ceil(q·n) rows are ≤ v) of an integer-valued column. Returns a
    Python int (this is an ACTION — it runs the passes), or None on an
    empty input. Driver traffic per pass: one `buckets`-row histogram."""
    d = df.select(value.cast("long").alias("v")).filter(F.col("v").isNotNull())
    stats = d.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not n:
        return None
    target = max(1, math.ceil(q * n))  # 1-based rank among ascending values

    while hi - lo + 1 > buckets:
        w = (hi - lo + buckets) // buckets  # ceil width, ≥ 1
        # Bucket index in exact integer arithmetic: Spark's `/` on longs is
        # DOUBLE division, which rounds across bucket boundaries once the
        # range exceeds 2^53 (e.g. v = 1000·w − 1 with w ≈ 4.5e15 lands in
        # bucket 1000 instead of 999), desynchronizing the histogram from
        # the integer range filters below. `DIV` truncates exactly; the
        # subtraction runs in DECIMAL(38,0) because v − lo itself overflows
        # BIGINT when the range spans most of the 64-bit domain. v ≥ lo
        # makes truncation equal floor; the quotient is ≤ buckets, so the
        # BIGINT cast of the result is safe.
        hist = dict(
            d.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(
                F.expr(
                    f"CAST((CAST(v AS DECIMAL(38,0)) - {lo}) DIV {w} AS BIGINT)"
                ).alias("b")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        cum = 0
        for b in range(buckets):
            c = hist.get(b, 0)
            if cum + c >= target:
                target -= cum
                lo, hi = lo + b * w, min(hi, lo + b * w + w - 1)
                break
            cum += c
        else:  # pragma: no cover — rank accounting guarantees a break
            raise AssertionError("rank exceeded histogram mass")

    # final range fits one histogram: count per exact value
    vals = sorted(
        (r["v"], r["c"])
        for r in d.filter((F.col("v") >= lo) & (F.col("v") <= hi))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cum = 0
    for v, c in vals:
        cum += c
        if cum >= target:
            return int(v)
    raise AssertionError("rank exceeded value mass")  # pragma: no cover
