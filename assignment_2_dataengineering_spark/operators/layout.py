"""Physical-layout operators: Z-order (Morton) clustering keys.

Sorting a table on one column makes parquet min/max stats prune files
for predicates on THAT column only; a 2-D query (e.g. partkey range ×
suppkey range) then touches every file. Interleaving the bits of both
rank-normalized keys into one Morton key and range-clustering on it
(io.compact_parquet cluster_by=["zkey"]) gives every file a small
rectangle of the key space, so BOTH dimensions skip files — the same
trick Delta/Iceberg expose as OPTIMIZE ZORDER BY, here as a pure
Catalyst expression usable with any parquet writer.

All arithmetic is integer-exact and engine-portable: the rank
normalization uses (x - mn) * scale with an exact integer division
((a - a % b) / b — no float rounding at bucket boundaries), and the
interleave is shifts/masks, so a SQL oracle can reproduce the key
bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def intdiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative longs via the modulo
    identity (a - a%b is an exact multiple, so the double division is
    exact for |a| < 2^53) — avoids float-boundary drift vs SQL `//`."""
    return ((a - a % b) / b).cast("long")


def rank_scale(x: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Min-max normalize an integer column into [0, 2^bits): floor((x -
    mn) · (2^bits - 1) / (mx - mn)). Degenerate mx == mn maps to 0."""
    span = mx.cast("long") - mn.cast("long")
    # LONG literal: an IntegerType lit keeps the multiply in 32-bit,
    # which overflows (ANSI crash) for int32 keys with span > 32767
    top = F.lit((1 << bits) - 1).cast("long")
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(
        intdiv((x.cast("long") - mn.cast("long")) * top, span)
    )


def zvalue2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two `bits`-wide non-negative ints: bit i of `a`
    lands at position 2i, bit i of `b` at 2i+1. A flat OR-reduction of
    2·bits shift/mask terms — pure codegen, no UDF, ~scan speed."""
    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i) for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms).cast("long")


def zorder_sql(a: str, b: str, mn_a: str, mx_a: str, mn_b: str, mx_b: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of rank_scale+zvalue2 (for oracle pairing):
    emits the identical integer arithmetic as a SQL expression."""
    top = (1 << bits) - 1

    def rank(x: str, mn: str, mx: str) -> str:
        return (
            f"(CASE WHEN ({mx} - {mn}) <= 0 THEN 0 "
            f"ELSE (({x} - {mn}) * {top}) // ({mx} - {mn}) END)"
        )

    ra, rb = rank(a, mn_a, mx_a), rank(b, mn_b, mx_b)
    terms = [f"((({ra} >> {i}) & 1) << {2 * i})" for i in range(bits)] + [
        f"((({rb} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"
