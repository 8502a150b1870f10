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

# glibc LCG constants.
_A, _C, _M = 1103515245, 12345, 2_147_483_648


def _lcg(id_col: Column) -> Column:
    """(id * A + C) mod M, overflow-safe for EVERY int64 id: the id is
    reduced mod M BEFORE the multiply, so the product is bounded by
    (M-1)*A ≈ 2.4e18 < 2^63. Congruence makes this value-identical to
    the naive form — (id mod M)*A ≡ id*A (mod M) — so every existing
    DuckDB oracle (which computes the naive form in HUGEINT) still
    matches. The naive Spark form raised ARITHMETIC_OVERFLOW under ANSI
    mode for ids ≥ ~8.4e9 — found by the round-6 sf1 scaling run, whose
    key-shifted replication produces exactly the >1e10 id space a
    100 TB corpus would have (SCALE.md §6g)."""
    return ((id_col.cast("long") % _M) * _A + _C) % _M


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from a numeric id."""
    return _lcg(id_col) % buckets


def split_label(id_col: Column, train_pct: int = 98, val_pct: int = 1) -> Column:
    """Deterministic train/val/test assignment from the id hash: bucket
    < train_pct → 'train', next val_pct buckets → 'val', rest → 'test'.
    A pure scan predicate — the same row lands in the same split on
    every run, every partitioning, every engine, which is what keeps a
    held-out set held out across pipeline reruns."""
    b = hash_bucket(id_col)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def global_shuffle_rank(df: DataFrame, id_col: str = "doc_id", buckets: int = 1024) -> DataFrame:
    """Deterministic global shuffle order for training-data emission:
    appends `shuffle_rank` = row_number over (lcg_hash(id), id) — a
    reproducible pseudo-random permutation of the corpus.

    Computed in TWO phases so no single task ever sees the full corpus
    (a naive global row_number() window collapses everything to one
    partition — the classic scale killer):
      1. range-bucket rows by hash (bucket = h // (M/buckets), monotone
         in h so bucket order == hash order), count rows per bucket,
         prefix-sum the counts into per-bucket offsets (a `buckets`-row
         window — trivially small, broadcast back);
      2. row_number within each bucket partition (distributed window)
         + the bucket's offset.
    Equivalent to ORDER BY (h, id) exactly; at 100 TB this is one
    shuffle on a well-mixed key plus a broadcast of `buckets` longs.
    """
    from pyspark.sql import Window

    chunk = _M // buckets
    h = _lcg(F.col(id_col))
    df2 = df.withColumn("_h", h).withColumn(
        "_b", F.floor(F.col("_h") / F.lit(chunk)).cast("long")
    )
    counts = df2.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_b").orderBy("_h", id_col)
    return (
        df2.join(F.broadcast(offsets), "_b")
        .withColumn("shuffle_rank", F.row_number().over(w_in) + F.col("_off"))
        .drop("_h", "_b", "_off")
    )


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


def weighted_sample(
    df: DataFrame, weight_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws u from its id hash and
    competes with key = -ln(u) / weight; the k smallest keys are the
    sample, and inclusion probability is proportional to weight. The
    uniform u = (lcg(id) + 0.5) / M is exact in FP in any engine
    (integer numerator, power-of-two denominator); the key is rounded
    to 9dp so a last-ulp ln() difference between libms cannot reorder
    it, with id as the total-order tiebreak.

    Scale shape: the key is a scan-local expression and the k-smallest
    cut is orderBy+limit — Spark lowers that to TakeOrderedAndProject
    (per-partition top-k then a k-row driver merge), never a global
    sort. Reruns, repartitions, and other engines pick the SAME rows —
    the property corpus-mixture reproducibility depends on."""
    u = (_lcg(F.col(id_col)) + F.lit(0.5)) / F.lit(float(_M))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    return df.withColumn("sample_key", key).orderBy("sample_key", id_col).limit(k)


def cap_per_group(
    df: DataFrame, group_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Per-group document cap (the per-domain cap every web-corpus
    pipeline applies so one giant domain can't dominate training data):
    keep at most k rows per group, chosen by deterministic hash order —
    NOT arrival order, which changes under repartitioning. One window
    pass over the group partitioning; at 100 TB a skewed domain still
    fits this shape because row_number short-circuits after k within
    each partition's sort, and the alternative (groupBy + collect_list)
    would materialize the whole domain."""
    from pyspark.sql import Window

    h = _lcg(F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= k)
    )


def two_phase_global_rank(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    rank_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number over a TOTAL order, computed without a
    single-partition window (the classic scale killer: `row_number()
    OVER (ORDER BY ...)` funnels every row through one task — fatal at
    |users|- or |vocabulary|-cardinality on the 100 TB target).

    Two phases, same shape as global_shuffle_rank but for arbitrary
    sort keys:
      1. `repartitionByRange` on the sort order (range partitions are
         contiguous in the total order), count rows per range
         partition, prefix-sum into per-partition offsets (a
         ≤`partitions`-row window — trivially small, broadcast back);
      2. row_number within each range partition (distributed window)
         + the partition's offset.

    `order_by` is [(column, ascending), ...] and MUST be a total order
    (include a unique tiebreak column): ties that straddle a range
    boundary would otherwise rank nondeterministically. Equivalent to
    the global window exactly; costs one range shuffle + one hash
    shuffle on `_pid` instead of a 1-task sort."""
    from pyspark.sql import Window

    sort_cols = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]
    if partitions is None:
        partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # EAGER localCheckpoint: repartitionByRange picks boundaries by
    # SAMPLING, and the offsets aggregate and the windowed main stream
    # are two separately-planned subtrees — each instance samples its
    # own boundaries, and unless runtime exchange reuse dedupes them
    # the offsets describe a different partitioning than the window
    # reads (observed: wrong prefix sums at some partition counts).
    # Checkpointing pins ONE partition assignment for both consumers;
    # the result is boundary-placement invariant, so this also makes
    # the output run-deterministic.
    ranged = (
        df.repartitionByRange(partitions, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.row_number().over(w_in) + F.col("_off"))
        .drop("_pid", "_off")
    )


def ntile_from_rank(rank_col: str, n_col: str, tiles: int) -> Column:
    """SQL ntile(k) reconstructed from an exact global rank column and
    the total row count — first (n mod k) tiles get ceil(n/k) rows, the
    rest floor(n/k), identical to the window function's contract. Pure
    integer arithmetic (ceil(a/b) = (a+b-1) DIV b; CASE short-circuits,
    so the DIV-by-q branch never evaluates when q = 0, i.e. n < k).
    Combining this with two_phase_global_rank replaces a
    single-partition ntile window with two distributed shuffles and a
    broadcast scalar count."""
    r = f"({n_col} % {tiles})"
    q = f"({n_col} DIV {tiles})"
    big = f"({r} * ({q} + 1))"  # rows covered by the ceil-sized tiles
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {big}"
        f" THEN ({rank_col} + {q}) DIV ({q} + 1)"
        f" ELSE {r} + ({rank_col} - {big} + {q} - 1) DIV {q} END AS INT)"
    )


def two_phase_prefix_sum(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    value_col: str,
    out_col: str = "cum_before",
    partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of `value_col` over a total order, without
    a single-partition window — the prefix-sum sibling of
    two_phase_global_rank: range-partition on the sort order, sum each
    range partition's total, prefix-sum the ≤|partitions| totals into
    broadcast offsets, then a distributed within-partition running sum
    + offset. `out_col` = Σ value over all rows STRICTLY BEFORE the row
    in the total order (0 for the first row). `order_by` must be a
    total order for a deterministic result."""
    from pyspark.sql import Window

    sort_cols = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by]
    if partitions is None:
        partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # EAGER localCheckpoint: repartitionByRange picks boundaries by
    # SAMPLING, and the offsets aggregate and the windowed main stream
    # are two separately-planned subtrees — each instance samples its
    # own boundaries, and unless runtime exchange reuse dedupes them
    # the offsets describe a different partitioning than the window
    # reads (observed: wrong prefix sums at some partition counts).
    # Checkpointing pins ONE partition assignment for both consumers;
    # the result is boundary-placement invariant, so this also makes
    # the output run-deterministic.
    ranged = (
        df.repartitionByRange(partitions, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w_in), F.lit(0)) + F.col("_off"),
        )
        .drop("_pid", "_off")
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    ctx: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    layout: documents are laid end-to-end in a deterministic total
    order (ascending `id_col`) and the token stream is cut into
    fixed-`ctx` sequences; documents straddle cuts. Emits one row per
    (sequence × document-span): `seq_id`, the document, `span_start`
    (token offset within the document) and `span_len` — exactly what a
    data loader needs to assemble sequence `seq_id` by slicing its
    member documents.

    Scale shape: the only global state is the exclusive prefix sum of
    token counts, computed by two_phase_prefix_sum (range shuffle +
    broadcast offsets — never a single-partition window); the
    span/sequence expansion is a narrow per-row sequence() explode
    bounded by ceil(n_tokens/ctx)+1 rows per document. Total output
    rows = |docs| + |cut-straddles| ≤ |docs| + total_tokens/ctx."""
    with_start = two_phase_prefix_sum(
        df.select(id_col, tokens_col), [(id_col, True)], tokens_col, "tok_start"
    )
    seq_first = F.expr(f"tok_start DIV {ctx}")
    seq_last = F.expr(f"(tok_start + {tokens_col} - 1) DIV {ctx}")
    e = with_start.select(
        id_col,
        tokens_col,
        "tok_start",
        F.explode(F.sequence(seq_first, seq_last)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * ctx
    seq_hi = seq_lo + ctx
    doc_lo = F.col("tok_start")
    doc_hi = doc_lo + F.col(tokens_col)
    return e.select(
        "seq_id",
        F.col(id_col),
        F.greatest(F.lit(0), seq_lo - doc_lo).alias("span_start"),
        (F.least(doc_hi, seq_hi) - F.greatest(doc_lo, seq_lo)).alias("span_len"),
    )


def mix_epochs(
    df: DataFrame,
    full_epochs: Column,
    frac_pct: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus mixing with epoch upsampling — the
    composition step of a training-data pipeline: each row is emitted
    `full_epochs` times (epoch = 0..full_epochs-1) plus one more epoch
    for the `frac_pct`% of rows whose id hash falls under the
    fractional remainder (weight 2.25 → full_epochs=2, frac_pct=25).
    The partial epoch is a CONSISTENT deterministic subset (same id
    hash as all engine sampling), so reruns and engines agree row for
    row; weight 0 drops the source entirely. Narrow plan: per-row
    bounded array explode, no shuffle, no state."""
    epochs = F.when(
        F.col("__full") > 0, F.sequence(F.lit(0), F.col("__full") - 1)
    ).otherwise(F.array().cast("array<int>"))
    partial = F.when(
        hash_bucket(F.col(id_col)) < F.col("__frac"), F.array(F.col("__full"))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("__full", full_epochs.cast("int"))
        .withColumn("__frac", frac_pct.cast("int"))
        .withColumn("epoch", F.explode(F.concat(epochs, partial)))
        .drop("__full", "__frac")
    )
