"""The reference's batch ETL (extractor.py:291-309) as one lazy DataFrame
DAG — SURVEY.md §3.1 "Spark shape":

    read nested JSON → explode/filter → join dims → groupBy.sum
    → (optional pivot) → write parquet

Where the reference runs four eager pandas stages with materialized
intermediates (lists → DataFrame → CSV), here every step is declarative;
Catalyst fuses the narrow ones and the only shuffles are the rollup
groupBy and the optional pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.reshape import pivot_wide
from ..schemas import FACILITY_SCHEMA, FUELTECH_SCHEMA


def load_facilities_json(spark: SparkSession, data: list[dict]) -> DataFrame:
    """S4 nested scan: in production `spark.read.json(path, schema=...)`;
    fixtures arrive as parsed docs (the reference embeds them in a .py
    module, context.py:33)."""
    return spark.createDataFrame(data, FACILITY_SCHEMA)


def flatten_facilities(facilities: DataFrame, fueltech: DataFrame) -> DataFrame:
    """batch_facilities (extractor.py:58-113) as explode→filter→join→agg:

    - keep NEM facilities with ≥1 operating unit (P1: the reference's
      per-facility loop + `status_id == "operating"` filter,
      extractor.py:77-87);
    - fueltech label join with `'-'` drop + set-dedup (J2/A8,
      extractor.py:94);
    - project/rename to the facility_lookup shape (P2,
      extractor.py:88-95).

    Output: facility_id, facility_name, lat, lon, region, fuel_tech[].
    """
    units = facilities.filter(F.col("network_id") == "NEM").select(
        F.col("code").alias("facility_id"),
        F.col("name").alias("facility_name"),
        F.col("location.lat").alias("lat"),
        F.col("location.lng").alias("lon"),
        F.col("network_region").alias("region"),
        F.explode("units").alias("u"),
    )
    operating = units.filter(F.col("u.status_id") == "operating")
    labeled = operating.join(
        F.broadcast(fueltech), operating["u.fueltech_id"] == fueltech["fueltech_id"], "left"
    )
    return (
        labeled.groupBy("facility_id", "facility_name", "lat", "lon", "region")
        .agg(
            F.array_sort(
                F.array_remove(
                    F.array_distinct(F.collect_list(F.coalesce("label", F.lit("-")))), "-"
                )
            ).alias("fuel_tech")
        )
    )


def unit_to_facility(facilities: DataFrame) -> DataFrame:
    """The unit→facility dimension (extractor.py:72/85): operating units
    of NEM facilities only."""
    return (
        facilities.filter(F.col("network_id") == "NEM")
        .select(F.col("code").alias("facility_id"), F.explode("units").alias("u"))
        .filter(F.col("u.status_id") == "operating")
        .select(F.col("u.code").alias("unit_code"), "facility_id")
    )


def rollup_readings(readings: DataFrame, unit_dim: DataFrame) -> DataFrame:
    """transform_facility_data (extractor.py:192-248):

    - broadcast INNER join to the operating unit dim (P3 drop of
      unknown units AND the unit→facility MAPPING in one step,
      extractor.py:216-218) — the dim's facility_id is authoritative;
      grouping on the fact row's own denormalized facility_code would
      silently misattribute readings whose embedded code is
      null/stale, and would break entirely on sources (like
      extract.facility_responses_to_long) that carry no facility
      column at all;
    - tz-aware timestamp parse (F3) with null-drop (P6);
    - unit→facility rollup: groupBy(facility, ts).sum (A1,
      extractor.py:242-246) — the single shuffle.
    """
    kept = readings.join(
        F.broadcast(unit_dim.select("unit_code", "facility_id")), "unit_code"
    )
    parsed = kept.withColumn("ts", F.try_to_timestamp(F.col("timestamp"))).filter(
        F.col("ts").isNotNull()
    )
    return parsed.groupBy(
        F.col("facility_id").alias("facility_code"), F.col("ts")
    ).agg(
        F.round(F.sum("power"), 4).alias("power"),
        F.round(F.sum("emission"), 4).alias("emission"),
    )


def market_long(readings: DataFrame) -> DataFrame:
    """transform_market_data (extractor.py:251-288): parse + project; the
    reference's positional zips are already equi-joined in the long form."""
    return (
        readings.withColumn("ts", F.try_to_timestamp(F.col("timestamp")))
        .filter(F.col("ts").isNotNull())
        .select("region_code", "ts", "price", "demand")
    )


def consolidate_wide(facility_rollup: DataFrame, market: DataFrame) -> DataFrame:
    """The wide cache (extractor.py:302-308): two pivots flattened to
    `{metric}_{code}`, left-joined on timestamp. Kept as a compatibility
    operator — long + Parquet is the engine's canonical layout
    (SURVEY.md §4.1: Parquet's dictionary/RLE encoding subsumes the
    reference's −75% compression trick)."""
    fac_wide = pivot_wide(
        facility_rollup.withColumnRenamed("ts", "timestamp"),
        index=["timestamp"],
        pivot_col="facility_code",
        value_cols=["power", "emission"],
        agg="avg",  # pandas pivot_table's implicit mean on duplicates
    )
    mkt_wide = pivot_wide(
        market.withColumnRenamed("ts", "timestamp"),
        index=["timestamp"],
        pivot_col="region_code",
        value_cols=["price", "demand"],
        agg="avg",
    )
    return fac_wide.join(mkt_wide, "timestamp", "left")


def run_batch_etl(
    spark: SparkSession,
    facilities_data: list[dict],
    fueltech_data: list[dict],
    facility_readings: DataFrame,
    market_readings: DataFrame,
) -> dict[str, DataFrame]:
    """Full extractor.main() equivalent, returning every artifact the
    reference persists (facility_lookup CSV, long facts, wide cache)."""
    facs = load_facilities_json(spark, facilities_data)
    fuel = spark.createDataFrame(fueltech_data, FUELTECH_SCHEMA)
    lookup = flatten_facilities(facs, fuel)
    unit_dim = unit_to_facility(facs)
    rollup = rollup_readings(facility_readings, unit_dim)
    market = market_long(market_readings)
    wide = consolidate_wide(rollup, market)
    return {
        "facility_lookup": lookup,
        "unit_to_facility": unit_dim,
        "facility_rollup": rollup,
        "market_long": market,
        "consolidate_wide": wide,
    }
