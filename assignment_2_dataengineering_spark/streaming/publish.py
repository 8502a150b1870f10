"""The shared commit protocol for foreachBatch-maintained tables —
one implementation of the pointer-flip / high-water-mark discipline
the maintenance modules (cdc_maintain, rollup_maintain,
sketch_maintain; the near-dup indexes use the same batch-scoped
overwrite idea inline) previously each hand-rolled:

- versioned tables (CDC snapshot, rollup MV): each batch writes an
  immutable `data_v{batch}` directory, then atomically flips the
  `_current.json` pointer (tmp + os.replace). A crash before the flip
  leaves an unreferenced directory the redelivered batch OVERWRITES;
  readers resolve the pointer so they never see a torn version.
- append-shaped tables (sketch partials): each batch lands in a
  `batch_id={batch}` partition directory with OVERWRITE, so the
  crash-then-redeliver window replaces partial output instead of
  double-appending.
- both record `last_batch` so LATE replays (after a successful
  commit) are no-ops.

Centralizing this is not cosmetic: a protocol fix (commit validation,
fsync discipline, retention) must hold everywhere at once — three
drifting copies was a round-4 review finding.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

META_NAME = "_current.json"
# high-water-mark file for append-shaped / index tables (the near-dup
# indexes and sketch partials) — distinct from the versioned-table
# pointer so a directory can never be read as both
HWM_NAME = "_last_batch.json"


def read_meta(table_dir: str, name: str = META_NAME) -> dict | None:
    p = os.path.join(table_dir, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def already_applied(table_dir: str, batch_id: int, name: str = META_NAME) -> bool:
    meta = read_meta(table_dir, name)
    return meta is not None and batch_id <= meta["last_batch"]


def commit_meta(table_dir: str, payload: dict, name: str = META_NAME) -> None:
    """Atomic pointer/high-water-mark flip: tmp file + os.replace."""
    tmp = os.path.join(table_dir, name + ".tmp")
    os.makedirs(table_dir, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(table_dir, name))


def read_table_or_none(
    spark: SparkSession, path: str, cols: list[str] | None = None
) -> DataFrame | None:
    """Read a (possibly batch_id-partitioned) maintained table,
    projecting away the partition column so unions with in-flight batch
    frames line up. ONLY a missing path means "no history yet" — a
    genuine read failure (corrupt footer, permissions, transient FS
    error) PROPAGATES so the batch fails and retries, instead of
    silently verifying against an empty index and committing the
    high-water-mark, which would permanently drop every new-vs-old pair
    for the batch (round-4 advisor finding: a blanket `except
    Exception: return None` did exactly that).

    Two edges hardened per the round-5 advisory:
    - LOCAL-FS ONLY, loudly: `os.path.isdir` always returns False for a
      remote URI (hdfs://, s3a://), which would silently reinstate the
      verify-against-empty-index data loss — so a non-local scheme
      raises (mirroring compact_parquet's guard) instead of returning
      None.
    - A directory containing ONLY underscore/dot-prefixed entries
      (`_temporary` from a crash during the first-ever write,
      `_last_batch.json`, `._compact_*`) has no committed data files —
      that is "no history yet", not a read error; without this, the
      first-write crash left spark.read.parquet raising on every
      redelivery, a permanent fail/retry loop."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme not in ("", "file"):
        raise ValueError(
            f"read_table_or_none({path!r}): maintained-table probes are "
            "local-FS only (os.path.isdir cannot see a "
            f"{scheme}:// path, and returning None here would silently "
            "probe an empty index) — mount the index locally or extend "
            "the helper with a real FileSystem listing"
        )
    if not os.path.isdir(path):
        return None

    def _has_data(d: str) -> bool:
        for entry in os.listdir(d):
            if entry.startswith(("_", ".")):
                continue
            p = os.path.join(d, entry)
            if os.path.isdir(p):
                if _has_data(p):
                    return True
            else:
                return True
        return False

    if not _has_data(path):
        return None
    df = spark.read.parquet(path)
    return df.select(*cols) if cols else df


def publish_version(df: DataFrame, table_dir: str, batch_id: int) -> str:
    """Versioned-table commit: write the immutable data_v{batch}
    directory (overwrite — crash-redelivery replaces a torn attempt),
    then flip the pointer. Returns the version directory name."""
    version = f"data_v{batch_id}"
    df.write.mode("overwrite").parquet(os.path.join(table_dir, version))
    commit_meta(table_dir, {"last_batch": batch_id, "version": version})
    return version


def committed_version_path(
    table_dir: str, batch_id: int
) -> str:
    """Resolve a historical version for time travel, refusing versions
    that never COMMITTED: a data_v{batch} directory can exist without
    its pointer flip (crash mid-publish), and may be torn — existence
    alone is not commit (round-4 review finding)."""
    meta = read_meta(table_dir)
    p = os.path.join(table_dir, f"data_v{batch_id}")
    if (
        meta is None
        or batch_id > meta["last_batch"]
        or not os.path.isdir(p)
    ):
        raise FileNotFoundError(
            f"no committed version data_v{batch_id} under {table_dir}"
        )
    return p
