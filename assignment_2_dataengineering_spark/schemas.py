"""Schema registry: every StructType in the engine (SURVEY.md §1.2).

The reference mixes Pydantic models (stream boundary, dashboard.py:312-322),
pandas dtype inference, and convention-encoded wide columns; the engine
declares everything once, here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# --- Nested facility document (context.py:33 nem_facilities_json) -----------

UNIT_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("fueltech_id", StringType()),
        StructField("status_id", StringType()),
        StructField("capacity_registered", DoubleType()),
        StructField("capacity_maximum", DoubleType()),
        StructField("capacity_storage", DoubleType()),
        StructField("emissions_factor_co2", DoubleType()),
        StructField("dispatch_type", StringType()),
        StructField("data_first_seen", StringType()),
        StructField("data_last_seen", StringType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
    ]
)

LOCATION_SCHEMA = StructType(
    [StructField("lat", DoubleType()), StructField("lng", DoubleType())]
)

FACILITY_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("name", StringType()),
        StructField("network_id", StringType()),
        StructField("network_region", StringType()),
        StructField("description", StringType()),
        StructField("location", LOCATION_SCHEMA),
        StructField("units", ArrayType(UNIT_SCHEMA)),
    ]
)

# --- Dimensions (extractor.py:108-110; dashboard.py:236-245; context.py:4) --

FUELTECH_SCHEMA = StructType(
    [
        StructField("fueltech_id", StringType()),
        StructField("label", StringType()),
        StructField("renewable", BooleanType()),
    ]
)

FACILITY_LOOKUP_SCHEMA = StructType(
    [
        StructField("facility_id", StringType()),
        StructField("facility_name", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("region", StringType()),
        StructField("fuel_tech", ArrayType(StringType())),
    ]
)

REGION_LOOKUP_SCHEMA = StructType(
    [
        StructField("region_id", StringType()),
        StructField("region_name", StringType()),
    ]
)

# --- Long facts (extractor.py:192-199, extractor.py:251-258) ----------------

FACILITY_READING_SCHEMA = StructType(
    [
        StructField("facility_code", StringType()),
        StructField("unit_code", StringType()),
        StructField("timestamp", StringType()),  # ISO-8601 with offset at ingest
        StructField("power", DoubleType()),
        StructField("emission", DoubleType()),
    ]
)

MARKET_READING_SCHEMA = StructType(
    [
        StructField("region_code", StringType()),
        StructField("timestamp", StringType()),
        StructField("price", DoubleType()),
        StructField("demand", DoubleType()),
    ]
)

# --- Event stream (readme.md:3-24; publisher.py:62-80) ----------------------

FACILITY_EVENT_SCHEMA = StructType(
    [
        StructField("facility_id", StringType()),
        StructField("timestamp", StringType()),
        StructField("power_mw", DoubleType()),
        StructField("co2_tonnes", DoubleType()),
    ]
)

MARKET_EVENT_SCHEMA = StructType(
    [
        StructField("region_id", StringType()),
        StructField("timestamp", StringType()),
        StructField("price_dmwh", DoubleType()),
        StructField("demand_mw", DoubleType()),
    ]
)

# Superset schema: one topic carries both shapes plus a warm-start sentinel
# (publisher.py:29-37); parse permissively, route on null-pattern
# (SURVEY.md §7.4 item 5).
EVENT_SUPERSET_SCHEMA = StructType(
    [
        StructField("facility_id", StringType()),
        StructField("region_id", StringType()),
        StructField("timestamp", StringType()),
        StructField("power_mw", DoubleType()),
        StructField("co2_tonnes", DoubleType()),
        StructField("price_dmwh", DoubleType()),
        StructField("demand_mw", DoubleType()),
    ]
)
