"""Incremental JOIN-view maintenance — the third materialized-view
tier (rollup_maintain keeps aggregates, cdc_maintain keeps snapshots;
this keeps equi-join views) under append-only deltas.

The delta rule for J = A ⋈ B with appends ΔA, ΔB:

    ΔJ = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

so each refresh touches |Δ| × matching keys, never |A| × |B| — the
reason a 100 TB join view refreshes in delta time. The old sides join
against the DELTAS (delta side broadcast when small); the only
full-size work is the keyed lookup into the stored sides, which a
bucketed layout serves without a shuffle (SCALE.md §1).

Equivalence law (pinned in tests/test_view_maintain.py):
refresh(J, A, B, ΔA, ΔB) ≡ (A ∪ ΔA) ⋈ (B ∪ ΔB), row-for-row, for any
split of the inputs into base + delta — including empty deltas and
keys appearing on both sides of the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame | None,
    db: DataFrame | None,
    keys: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame | None:
    """The new rows a batch of appends adds to the inner-join view:
    ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB. Returns None when both deltas are empty
    plans (callers skip the write). Each term is one keyed join whose
    small side is the delta; `broadcast_deltas=True` (the steady-state
    micro-batch case) pins the delta as the broadcast side. Pass
    False for CATCH-UP refreshes replaying a large delta — a forced
    broadcast of a multi-GB delta hits Spark's 8 GB broadcast limit or
    OOMs, where a shuffle join (with AQE free to choose broadcast if
    the delta turns out small) succeeds."""
    wrap = F.broadcast if broadcast_deltas else (lambda d: d)
    parts = []
    if da is not None:
        parts.append(wrap(da).join(b_old, keys))
    if db is not None:
        parts.append(a_old.join(wrap(db), keys))
    if da is not None and db is not None:
        parts.append(wrap(da).join(db, keys))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=False)
    return out


def refresh_join_view(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame | None,
    db: DataFrame | None,
    keys: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Append the delta rows to the stored view — the incremental
    refresh. The caller persists the result (or writes the delta
    partition); this function only assembles the plan."""
    delta = join_view_delta(a_old, b_old, da, db, keys, broadcast_deltas)
    return view if delta is None else view.unionByName(delta)
