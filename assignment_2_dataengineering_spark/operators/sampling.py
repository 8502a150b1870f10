"""Deterministic sampling for corpus pipelines.

Training-data pipelines need samples that are (a) reproducible across
runs and engines — a rerun must pick the SAME rows, or downstream
caches/evals silently drift — and (b) stratified, because corpus
composition (per-language, per-source mixing ratios) is a modeling
decision, not an accident of row order. Spark's df.sample() is
seeded-random per partition split — not stable under repartitioning —
so sampling here is a pure hash of the row id: a narrow, shuffle-free
scan predicate.

The bucket hash is a 32-bit LCG step — exactly representable in int64
arithmetic in any engine, hence DuckDB-oracle-able. At production
scale, swap `hash_bucket` for xxhash64(id) % 100 (same structure,
better mixing); the operators are agnostic to the choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# glibc LCG constants; doc_id * A + C stays far under int64 overflow for
# any realistic id space (id < 8.4e9).
_A, _C, _M = 1103515245, 12345, 2_147_483_648


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from a numeric id."""
    return ((id_col.cast("long") * _A + _C) % _M) % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Keep `rates_pct[stratum]`% of each stratum, deterministically:
    row kept iff hash_bucket(id) < rate. One scan, no shuffle, no state;
    the same row set on every run, every partitioning, every engine."""
    bucket = hash_bucket(F.col(id_col))
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.withColumn("sample_bucket", bucket).filter(F.col("sample_bucket") < rate)
