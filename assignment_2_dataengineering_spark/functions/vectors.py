"""Vector math over array<float> embedding columns — pure Catalyst
expressions (zip_with + aggregate fold), JVM-side, no UDF.

Doubles are folded left-to-right in array order, so results are
bit-reproducible run-to-run (and match a sequential-sum oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe via nullif on zero norms (ANSI)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def hyperplane_sign_bits(vec: Column, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature as array<int> of sign bits.

    Hyperplane components are derived deterministically from
    (seed, plane, dim-index) via a splitmix-style integer hash mapped to
    [-1, 1] — no RNG state, so every executor and every run agrees.
    """

    def coef(p: int, d: int) -> float:
        x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        return ((x % 2_000_001) / 1_000_000.0) - 1.0

    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(coef(p, d)) for d in range(dim)])
        # fold-based dot product: evaluated as a loop, not an unrolled
        # dim-node expression tree (which chokes codegen at dim×planes).
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)
