"""Reusable relational operators (SURVEY.md §2.2-2.6).

Each helper is a pure DataFrame→DataFrame transform built from Catalyst
expressions; no collect(), no Python row loops. Reference citations point
at the pandas/paho construct each one re-expresses.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], ts_col: str, tiebreak: list[str] | None = None) -> DataFrame:
    """Last-value-per-key snapshot (A9): the reference's
    `latest_by_facility[fid] = {**prev, **validated}` maps
    (dashboard.py:364-365, dashboard.py:391-392) as a ranking window.

    Scale note: the window shuffles once on `keys`; at 100 TB this is a
    single hash-partitioned pass (no global sort), and AQE splits skewed
    keys. `max_by`-style agg would also work but loses the full row.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_key(df: DataFrame, keys: list[str], order: list[Column], k: int) -> DataFrame:
    """Bounded per-key retention (O3): the reference's deque(maxlen=5000)
    (dashboard.py:266-267) as rank-and-filter. Map-side partial top-k is
    handled by Spark's WindowGroupLimit pushdown (rank<=k filter)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def time_horizon(df: DataFrame, ts_col: str, minutes: int) -> DataFrame:
    """Keep rows within `minutes` of the data's max timestamp (P7/A6):
    dashboard.py:546-549 anchors the horizon to max(ts) in state, not
    wall-clock. Implemented as a broadcast scalar join — one extra
    map-stage, no driver collect, safe at any scale."""
    mx = df.agg(F.max(ts_col).alias("__max_ts"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(ts_col) >= F.col("__max_ts") - F.expr(f"INTERVAL {minutes} MINUTES"))
        .drop("__max_ts")
    )


def time_bucket(ts: Column, seconds: int) -> Column:
    """Tumbling-window bucket (A3/F5): dashboard.py:554's
    `dt.floor('5min')`. Pure epoch arithmetic so the result is identical
    in any session timezone (date_trunc would not be)."""
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / seconds).cast("long") * seconds)


def semi_anti_split(left: DataFrame, right: DataFrame, on: Column, labels=("with_match", "without_match")) -> DataFrame:
    """Semi/anti membership split (P3): extractor.py:216-218 drops unit
    records absent from the operating map; this returns both branches
    tagged so callers can route (keep / quarantine / log)."""
    semi = left.join(right, on, "left_semi").withColumn("bucket", F.lit(labels[0]))
    anti = left.join(right, on, "left_anti").withColumn("bucket", F.lit(labels[1]))
    return semi.unionByName(anti)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_from: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side into `salts` sub-keys and
    replicate the small side across every salt, so one hot key spreads
    over `salts` reducers instead of melting a single task.

    The salt derives from xxhash64 of a big-side unique column
    (`salt_from`), so the assignment is deterministic across runs and
    partitionings. The small side is replicated with explode(sequence)
    — `salts` copies, which is why this is for MB-scale dims that are
    skewed-hot rather than broadcast-able (broadcast needs no salt at
    all; AQE skew-join handles sort-merge cases — this operator is the
    explicit form for when neither applies, e.g. a streaming join where
    AQE is unavailable).

    Result is row-identical to the plain join (pinned by the
    q_salted_join oracle) for `how` in {inner, left}. Other join types
    are REJECTED: with a right/full outer join the replicated small
    side's non-matching salt copies would surface as `salts`× spurious
    null-extended rows.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer joins would emit the small side's replicated salt "
            "copies as spurious null-extended rows"
        )
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(salt_from), F.lit(salts)))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return joined.drop("__salt")


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Batch MERGE (CDC upsert): source rows override matching target
    rows per-column (null-safe — a NULL source field keeps the target
    value, same F15 semantics as streaming/snapshot.py), unmatched
    source rows insert, unmatched target rows persist.

    Implemented as one full-outer shuffle join on `keys` + coalesce
    projection — the lakehouse MERGE INTO shape without requiring a
    table format. At 100 TB both sides hash-partition on the key once;
    if the target is bucketed on `keys` (sources/io.py bucketed
    writer), the target-side exchange disappears entirely.

    PRECONDITION (same as SQL MERGE, which errors on multiple source
    matches): `source` must hold at most ONE row per key — a CDC batch
    with several changes per key must be reduced first
    (apply_changelog's seq-guarded last-write-wins, or latest_per_key),
    or the full-outer join fans the target row out once per source
    duplicate and the output holds duplicate keys.
    """
    # Alias-qualified F.col refs (not df[...] attribute refs): the source
    # is typically DERIVED FROM the target (CDC extract), and attribute
    # refs on two lineage-sharing frames trip Spark's ambiguous-self-join
    # analyzer; string refs bind to the join-side alias instead.
    t, s = target.alias("__t"), source.alias("__s")
    cond = None
    for k in keys:
        c = F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
        cond = c if cond is None else (cond & c)
    out_cols = [
        F.coalesce(F.col(f"__s.{k}"), F.col(f"__t.{k}")).alias(k)
        for k in target.columns
    ]
    return t.join(s, cond, "full_outer").select(*out_cols)


def mode_value(df: DataFrame, col: str, alias: str | None = None) -> DataFrame:
    """Deterministic mode (A5): dashboard.py:719's `.mode()[0]` is
    pandas-order-dependent; the engine defines ties → smallest value
    (SURVEY.md §7.4 item 6)."""
    alias = alias or f"mode_{col}"
    return (
        df.groupBy(col)
        .count()
        .orderBy(F.col("count").desc(), F.col(col).asc())
        .limit(1)
        .select(F.col(col).alias(alias))
    )


def scd2_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 MERGE: history-preserving
    upsert. `target` carries versioned rows (`to_col` NULL = current);
    `updates` carries (keys, attrs, ts). For each key whose current
    attrs DIFFER from the update: the current row is closed
    (`to_col` = update ts) and a new current row opens
    (`from_col` = update ts). No-op updates (identical attrs) create
    NO version — the guard that keeps re-delivered CDC extracts from
    exploding history. Historical (already-closed) rows and untouched
    keys pass through. New keys insert as current rows.

    Plan shape: one equi-join of current rows to updates on the keys
    (historical rows never join — they filter out before the shuffle),
    a null-safe any-attr-changed predicate, and a 3-way unionByName.
    Same single-key-shuffle economics as merge_upsert; bucket the
    target on `keys` and the target-side exchange disappears. The
    merge is deterministic row arithmetic — oracle-paired in
    q_scd2 (queries_scale.py)."""
    current = target.filter(F.col(to_col).isNull()).alias("__c")
    history = target.filter(F.col(to_col).isNotNull())
    # ONE update per key per merge: a batch carrying several changes
    # for a key would fan the current row out in the left join below,
    # closing it at two timestamps and opening multiple concurrent
    # versions. Deterministic reduction: latest ts wins, exact-ts ties
    # broken by the attr values ascending (total order). Intermediate
    # same-batch versions are intentionally skipped — the same
    # last-write-wins contract as apply_changelog.
    w_latest = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(a).asc_nulls_last() for a in attrs]
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # literal marker: keys[0].isNotNull misclassifies a matched
    # NULL-key row (eqNullSafe joins NULL keys) as unmatched
    u = updates.withColumn("__upd", F.lit(1)).alias("__u")

    cond = None
    for k in keys:
        c = F.col(f"__c.{k}").eqNullSafe(F.col(f"__u.{k}"))
        cond = c if cond is None else (cond & c)
    changed_pred = None
    for a in attrs:
        c = ~F.col(f"__c.{a}").eqNullSafe(F.col(f"__u.{a}"))
        changed_pred = c if changed_pred is None else (changed_pred | c)

    joined = current.join(u, cond, "left")
    upd_marker = F.col("__u.__upd").isNotNull()

    # Current rows: closed if a differing update arrived, else unchanged.
    kept_current = joined.select(
        *[F.col(f"__c.{c}").alias(c) for c in target.columns if c != to_col],
        F.when(upd_marker & changed_pred, F.col(f"__u.{ts_col}"))
        .otherwise(F.lit(None).cast(target.schema[to_col].dataType))
        .alias(to_col),
    )
    # New current versions: differing updates on existing keys.
    new_versions = joined.filter(upd_marker & changed_pred).select(
        *[F.col(f"__u.{k}").alias(k) for k in keys],
        *[F.col(f"__u.{a}").alias(a) for a in attrs],
        F.col(f"__u.{ts_col}").alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
    )
    # Brand-new keys insert as current rows.
    inserts = u.join(current, cond, "left_anti").select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(a).alias(a) for a in attrs],
        F.col(ts_col).alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
    )
    return (
        history.unionByName(kept_current)
        .unionByName(new_versions)
        .unionByName(inserts)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Changelog GENERATION — the inverse of apply_changelog: diff two
    snapshot versions into (keys..., change_type I/U/D, old_<col>,
    new_<col>) rows. Insert = key only in `new`, delete = only in
    `old`, update = present in both with any compared column differing
    (null-safe comparison, so NULL→value and value→NULL both register).
    Unchanged keys are dropped — the output is delta-sized, which is
    the point: shipping a changelog beats re-shipping a 100 TB
    snapshot.

    Plan: ONE full-outer sort-merge join on the key (both sides
    bucketed on the key drop their exchanges, SCALE.md §1); presence is
    tracked by literal flags (not value-null probes, which would
    misread all-NULL rows), and the change classification is pure
    codegen. apply_changelog(old, diff) reproducing `new` is the
    round-trip law pinned in tests/test_scale_ops.py."""
    o = old.select(
        *keys,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols],
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Tombstone-aware CDC apply — the missing third of the merge
    family (merge_upsert has no deletes; scd2_merge keeps history):
    fold an ordered changelog of upserts and deletes into a snapshot,
    producing the post-image. Per key, only the LAST change (by
    `order`, a total order within key — include a unique sequence
    column) matters: a trailing delete removes the key, a trailing
    upsert's row wins wholesale; keys untouched by the changelog pass
    through.

    Plan: latest-per-key over the changelog (one keyed window shuffle —
    earlier changes for a key never join anything), then ONE full-outer
    join against the snapshot with the delete filter applied after the
    join (an anti-join + union form would scan the snapshot twice).
    At 100 TB both sides hash-partition on the key once; a bucketed
    snapshot drops its exchange. Changelog columns must cover snapshot
    columns plus `op_col`."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    t, s = snapshot.alias("__t"), last.alias("__s")
    cond = None
    for k in keys:
        c = F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}"))
        cond = c if cond is None else (cond & c)
    out_cols = [
        F.coalesce(F.col(f"__s.{k}"), F.col(f"__t.{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col(f"__s.{op_col}").isNotNull(), F.col(f"__s.{c}"))
        .otherwise(F.col(f"__t.{c}"))
        .alias(c)
        for c in snapshot.columns
        if c not in keys
    ]
    return (
        t.join(s, cond, "full_outer")
        .filter(
            F.col(f"__s.{op_col}").isNull() | (F.col(f"__s.{op_col}") != delete_op)
        )
        .select(*out_cols)
    )


def salted_collect_set(
    df: DataFrame, key: str, col: str, salts: int = 16
) -> DataFrame:
    """Skew-tolerant exact distinct-collection — the aggregation-side
    counterpart to salted_join. A plain groupBy(key).collect_set over a
    hot key builds one giant array in one reducer task; salting splits
    the build into `salts` partial sets per key (stage 1, where the
    heavy lifting parallelizes), then merges the few partial arrays
    (stage 2, rows = keys × salts, each already deduped within its
    salt). Sum-like aggregates don't need this (map-side partials
    handle them); payload-accumulating aggregates (collect_set/list,
    exact percentile) are where the hot-key reducer becomes THE
    straggler at 100 TB. Output arrays are sorted — deterministic under
    any partitioning."""
    stage1 = df.groupBy(
        F.col(key), (F.crc32(F.col(col).cast("string")) % salts).alias("__salt")
    ).agg(F.collect_set(col).alias("__partial"))
    return stage1.groupBy(key).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__partial")))).alias(
            "items"
        )
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """2-D skyline (Pareto-optimal set): rows not dominated by any
    other row, where `a` dominates `b` iff a.x ≤ b.x AND a.y ≥ b.y
    with at least one strict (for the minimize-x / maximize-y
    orientation; flips handled by sign). Duplicates on both dims
    survive together (no strict edge).

    Plan: per-x-group max y (one keyed aggregate), a strict-prefix
    running max over the DISTINCT-x table (ROWS .. 1 PRECEDING on the
    x ordering — a RANGE -1 frame would be a VALUE offset on numeric
    x, silently wrong for non-integer gaps), broadcast back, then a
    codegen filter. A row survives iff its y tops its own x group AND
    beats every strictly-cheaper group's max. NO pairwise join: the
    NOT EXISTS dominance definition the oracle uses is O(n²); this is
    one aggregate plus a distinct-x-sized window. That window is the
    single-partition caveat — at 100 TB, range-bucket x and broadcast
    per-bucket prefix maxima first (the global_shuffle_rank two-phase
    pattern), same algebra."""
    sx = 1 if minimize_x else -1
    sy = 1 if maximize_y else -1
    d = df.withColumn("__x", F.col(x_col) * sx).withColumn("__y", F.col(y_col) * sy)
    grp = d.groupBy("__x").agg(F.max("__y").alias("__grp_max"))
    w_pfx = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    grp = grp.withColumn("__pfx_max", F.max("__grp_max").over(w_pfx))
    out = d.join(F.broadcast(grp), "__x").filter(
        (F.col("__y") == F.col("__grp_max"))
        & (F.col("__pfx_max").isNull() | (F.col("__y") > F.col("__pfx_max")))
    )
    return out.drop("__x", "__y", "__grp_max", "__pfx_max")
