"""JDBC scan + secondary-source point lookup (SURVEY.md §2.1 S10).

The reference's dashboard runs a Postgres point query per unknown
facility and an `ON CONFLICT DO NOTHING` insert (dashboard.py:277-307).
The Spark shape: `spark.read.jdbc` with the lookup pushed down as a
dbtable subquery — the database does the point filtering, Spark never
scans the full remote table — feeding `enrichment_upsert_batch`'s
insert-if-absent merge. Bulk dimension loads go through
`read_jdbc_table`, which exposes the partition-split knobs (a JDBC
read without partitionColumn is a single-task scan — fine for a dim,
wrong for a fact backfill).

Driver-agnostic: anything on the JVM classpath works; the tests use
Spark's bundled embedded Derby so the path runs with zero extra
dependencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S10 scan: `spark.read.jdbc` with the parallelism knobs surfaced.
    With `partition_column` (+ bounds + num_partitions) Spark issues one
    range-predicate query per partition — the only way a big JDBC load
    isn't a single-executor bottleneck."""
    props = dict(properties or {})
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or 4,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def fetch_missing_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    properties: dict | None = None,
    max_keys: int = 1000,
):
    """`fetch_missing` factory for `enrichment_upsert_batch`: the
    reference's per-key `SELECT ... WHERE code = %s` (dashboard.py:283)
    batched into ONE pushed-down `IN` query per micro-batch.

    The miss set is collected to the driver — bounded by construction
    (misses are keys never seen before; `max_keys` caps a pathological
    first batch) — and inlined into a dbtable subquery, so the database
    answers the point lookup and only matching rows cross the wire."""
    props = dict(properties or {})

    def fetch(missing_keys: DataFrame) -> DataFrame | None:
        keys = [r[0] for r in missing_keys.limit(max_keys).collect()]
        if not keys:
            return None
        in_list = ", ".join("'" + str(k).replace("'", "''") + "'" for k in keys)
        # ANSI-quote the key column: Spark's JDBC writer creates quoted
        # (case-sensitive) column identifiers, so an unquoted reference
        # would resolve to the uppercased name and miss
        subquery = f'(SELECT * FROM {table} WHERE "{key_col}" IN ({in_list})) q'
        return spark.read.jdbc(url, subquery, properties=props)

    return fetch


def jdbc_write_back(
    url: str,
    table: str,
    key_col: str,
    properties: dict | None = None,
):
    """`write_back` factory for `enrichment_upsert_batch`: the INSERT
    half of the reference's upsert (dashboard.py:298-303, `INSERT ...
    ON CONFLICT DO NOTHING` into the primary lookup table after a
    secondary fetch).

    Plain JDBC has no portable ON CONFLICT, so insert-if-absent is an
    anti-join against the table's current keys (a pushed-down
    single-column projection — only keys cross the wire) followed by a
    `mode="append"` write. That read-check-append is exact here because
    foreachBatch serializes micro-batches within one streaming query
    (single-writer); it is also what makes a REPLAYED batch a no-op —
    the rows it inserted last time are found by the anti-join and
    skipped, the same idempotence contract as the reference's ON
    CONFLICT DO NOTHING."""
    props = dict(properties or {})

    def write(rows: DataFrame) -> None:
        if rows.isEmpty():
            return
        spark = rows.sparkSession
        existing = spark.read.jdbc(
            url, f'(SELECT "{key_col}" FROM {table}) k', properties=props
        )
        rows.join(existing, [key_col], "left_anti").write.jdbc(
            url, table, mode="append", properties=props
        )

    return write
