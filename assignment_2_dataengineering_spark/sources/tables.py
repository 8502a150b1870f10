"""Parquet scan layer for the driver's synthetic star schema.

Replaces the reference's scan zoo (CSV + JSON batch files + embedded
module data, SURVEY.md §2.1 S4-S7) with one declarative Parquet reader.
Catalyst pushes filters and prunes columns into these scans for free —
the reference had to hand-copy "only needed fields" (extractor.py:229-235).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _pin_utc(spark: SparkSession) -> None:
    # Event-time determinism: all timestamp bucketing/formatting in the
    # query library assumes UTC wall-clock (see session.get_spark).
    # Runtime-mutable, so it also holds when the driver owns the session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan with nanosecond-timestamp repair.

    Spark has no TIMESTAMP(NANOS) parquet type; the driver's `events`
    table stores ts as timestamp[ns]. We read nanos as long (legacy conf)
    and rebuild TimestampType via integer epoch math — truncation to
    micros is lossless for this data and tz-independent. The footer probe
    is plan-time-only (driver side, one file metadata read).
    """
    _pin_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq

        for field in pq.read_schema(path):
            if str(field.type) == "timestamp[ns]":
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
                )
    except Exception:
        pass  # non-local or footer-less source: leave schema as read
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Expose the star schema as temp views for spark.sql() plans."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
