"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

This is the 100 TB pre-aggregation pattern approx_count_distinct alone
cannot give you: approx_count_distinct yields a NUMBER, which cannot be
re-aggregated across dimensions (distinct counts don't add). A SKETCH
column is mergeable — materialize fine-grained sketches once (per key ×
day), persist them as a tiny rollup table, and answer any coarser
distinct-count question by unioning sketches, never rescanning the
fact table. The fact scan is paid once; every subsequent rollup reads
kilobytes.

No reference analog (the reference counts exact distinct in pandas);
engine extension per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct `value_col` values.

    One shuffle on group_cols with map-side partial sketches (each
    partition ships a ≤2^lg_k-byte sketch, not its values). The output
    `sketch` binary column is the persistable artifact: write it
    partitioned by the finest grouping and every coarser rollup comes
    from `rollup_sketch` without touching the source again."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def rollup_sketch(
    sketches: DataFrame,
    group_cols: list[str],
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Merge fine-grained sketches up to `group_cols` and estimate.

    hll_union_agg is associative and commutative — the rollup is a
    plain hash aggregate over kilobyte blobs; lgK is carried inside
    the sketch so unions stay consistent. The estimate lands within
    HLL's standard relative error (~1.04/sqrt(2^lg_k), ≈1.6% at
    lg_k=12) of the exact distinct count (pinned in
    tests/test_sketch.py)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(estimate_col)
    )


# ---------------------------------------------------------------------------
# Count-min sketch tier: mergeable FREQUENCY sketches, the heavy-hitter
# companion to the HLL cardinality tier above. Spark 4 exposes the
# count_min_sketch aggregate (binary, Spark's public sketch library format)
# but no union aggregate for it — so the rollup merges sketches itself.
# A CMS merge needs no hashing: same (eps, confidence, seed) ⇒ same depth ×
# width × hash row constants, and counters are additive, so union is an
# element-wise int64 sum of the tables. That keeps the merge a pure
# numpy kernel over kilobyte blobs, format-preserving: merging the
# day-grain sketches is BIT-IDENTICAL to sketching the whole fact table in
# one pass (pinned in tests/test_cms.py).
#
# Serialization (big-endian, from Spark's public writeTo): int version=1,
# long totalCount, int depth, int width, depth×long hashA, depth·width×long
# counters.
# ---------------------------------------------------------------------------

_CMS_HEADER = ">iqii"


def sketch_freq(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float = 0.005,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-group count-min sketch of `value_col` frequencies. Same
    shuffle shape as sketch_distinct: map-side partial sketches, each
    partition ships one ~8·depth·width-byte blob (≈22 KB at the
    defaults), never its values. Persist at the finest grain (key ×
    day); any coarser frequency question merges blobs instead of
    rescanning the fact table."""
    return df.groupBy(*group_cols).agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )


def _merge_cms_blobs(blobs) -> bytes:
    """Element-wise union of same-shape CMS blobs (numpy, big-endian)."""
    import struct

    import numpy as np

    first = blobs[0]
    ver, _, depth, width = struct.unpack(_CMS_HEADER, bytes(first[:20]))
    hash_a = bytes(first[20 : 20 + 8 * depth])
    total = 0
    table = np.zeros(depth * width, dtype=np.int64)
    for b in blobs:
        ver_i, cnt, depth_i, width_i = struct.unpack(_CMS_HEADER, bytes(b[:20]))
        if (ver_i, depth_i, width_i) != (ver, depth, width):
            raise ValueError("incompatible CMS shapes — differing eps/confidence")
        if bytes(b[20 : 20 + 8 * depth]) != hash_a:
            # same shape but different hash functions (differing seed):
            # summing those counters yields a meaningless table that
            # estimate_freq would silently query with the first blob's
            # hashes — shape checks alone cannot catch this
            raise ValueError("incompatible CMS hash functions — differing seed")
        total += cnt
        table += np.frombuffer(b, dtype=">i8", count=depth * width, offset=20 + 8 * depth)
    return (
        struct.pack(_CMS_HEADER, ver, total, depth, width)
        + hash_a
        + table.astype(">i8").tobytes()
    )


def rollup_freq(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge fine-grained CMS blobs up to `group_cols` — a grouped-map
    applyInPandas whose kernel is one numpy sum over kilobyte arrays.
    The shuffle moves the fine-grain sketch TABLE (kilobytes per row),
    never the fact table; that table is orders of magnitude smaller
    than the facts it summarizes, which is the entire point of
    persisting it."""
    import pandas as pd
    from pyspark.sql.types import StructType

    schema = StructType(
        [sketches.schema[c] for c in group_cols] + [sketches.schema["cms"]]
    )

    def _union(pdf: pd.DataFrame) -> pd.DataFrame:
        row = [pdf[c].iloc[0] for c in group_cols]
        row.append(_merge_cms_blobs([bytes(b) for b in pdf["cms"]]))
        return pd.DataFrame([row], columns=group_cols + ["cms"])

    return sketches.groupBy(*group_cols).applyInPandas(_union, schema)


def estimate_freq(
    spark,
    merged: DataFrame,
    items: list[int],
    group_cols: list[str],
    item_col: str = "item",
    est_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for `items` from each merged sketch.

    Deliberately driver-side: `merged` is the COARSE rollup — one row
    per reporting group (kilobytes each), not fact-grain — and the
    estimates come from Spark's own public CountMinSketch.readFrom, so
    the hash functions are exactly the ones that built the sketch.
    Guarantees: estimate ≥ true count, ≤ true + eps·totalCount with
    probability ≥ confidence (pinned in tests/test_cms.py)."""
    jvm = spark._jvm
    rows = []
    for r in merged.collect():
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(r["cms"]))
        for it in items:
            rows.append(
                tuple(r[g] for g in group_cols) + (it, cms.estimateCount(it))
            )
    return spark.createDataFrame(rows, group_cols + [item_col, est_col])


# ---------------------------------------------------------------------------
# Bloom filter tier: mergeable MEMBERSHIP sketches — the third leg of the
# sketch family (HLL: how many distinct; CMS: how often; Bloom: have we
# seen this key at all). The bitmap lives as 64-bit words in ROWS
# ((group, word_idx, word)), not a blob: building is a pure Catalyst
# bit_or aggregate, merging is the SAME bit_or aggregate one level up
# (associative ⇒ day-grain merge is bit-identical to a one-shot build),
# and membership probes are a keyed join — no Python, no driver round-trip.
# The classic uses at 100 TB: shipping a compact "seen keys" summary
# between pipeline stages (e.g. dedup against last month without
# rescanning it), and pre-filtering a join's big side against the small
# side's key set.
# ---------------------------------------------------------------------------


def _bloom_positions(value, m_bits: int, k_hashes: int, seed: int):
    """k hash positions in [0, m_bits): double hashing h1 + i·h2 (Kirsch
    & Mitzenmacher 2006 — two xxhash64 evaluations give k independent-
    enough probes; h2 forced odd so it cycles the full table when
    m_bits is a power of two)."""
    h1 = F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(m_bits))
    # reduce mod m BEFORE combining (ANSI mode rejects the h1 + i·h2
    # long overflow); forcing h2 odd after the mod keeps the full-cycle
    # property for power-of-two m_bits
    h2 = F.pmod(F.xxhash64(value, F.lit(seed + 1)), F.lit(m_bits)).bitwiseOR(F.lit(1))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k_hashes)]
    )


def sketch_bloom(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m_bits: int = 8192,
    k_hashes: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Per-group Bloom bitmap as (group..., word_idx, word) rows.

    One shuffle on (group, word_idx) with map-side partial bit_or —
    each partition ships ≤ m_bits/64 long rows per group, never its
    values. Only SET words are stored (absent word_idx = zero word), so
    a sparse group costs rows proportional to its distinct keys, not
    m_bits. Persist at the finest grain; coarser membership tables come
    from `rollup_bloom` without rescanning facts."""
    pos = F.explode(_bloom_positions(F.col(value_col), m_bits, k_hashes, seed))
    return (
        df.select(*group_cols, pos.alias("__pos"))
        .select(
            *group_cols,
            (F.col("__pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__bit"),
        )
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def rollup_bloom(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge fine-grained Bloom words up to `group_cols`: the identical
    bit_or aggregate one level coarser. Because bit_or is associative
    and commutative, the rollup is BIT-IDENTICAL to sketching the
    merged scope in one pass (pinned in tests/test_bloom.py) — same
    (m_bits, k_hashes, seed) required, same contract as the CMS tier."""
    return sketches.groupBy(*group_cols, "word_idx").agg(
        F.bit_or("word").alias("word")
    )


def member_bloom(
    probes: DataFrame,
    sketch: DataFrame,
    group_cols: list[str],
    value_col: str,
    m_bits: int = 8192,
    k_hashes: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Membership probe: for each (probe row × its sketch group), true
    iff ALL k bit positions are set. Guarantees: never a false negative
    for an inserted key; false-positive probability ≈ (1−e^(−k·n/m))^k
    (both pinned in tests/test_bloom.py). Plan: probes explode to k
    (group, word_idx, bit) rows, LEFT join the sketch words (missing
    word ⇒ bit unset), groupBy probe — the probe side is typically tiny
    and broadcastable; the sketch side never exceeds groups × m/64
    rows."""
    pos = F.explode(_bloom_positions(F.col(value_col), m_bits, k_hashes, seed))
    want = probes.select(*group_cols, value_col, pos.alias("__pos")).select(
        *group_cols,
        value_col,
        (F.col("__pos") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__bit"),
    )
    hit = F.when(
        F.col("word").isNotNull()
        & (F.col("word").bitwiseAND(F.col("__bit")) != 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        want.join(sketch, [*group_cols, "word_idx"], "left")
        .groupBy(*group_cols, value_col)
        .agg((F.min(hit) == 1).alias("maybe_present"))
    )
