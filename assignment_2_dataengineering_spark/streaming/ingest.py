"""Validated streaming ingest: JSON parse → constraint gate → route →
quarantine (SURVEY.md §2.9 T2/T3).

The reference's ingest is a paho `on_message` callback doing
json.loads + Pydantic validation + key-presence dispatch
(dashboard.py:327-414). Here the whole pipeline is declarative over a
streaming (or batch — same functions, Spark unifies them) DataFrame of
raw JSON strings:

    raw lines ─ from_json(superset) ─┬─ facility branch (valid)
                                     ├─ market branch   (valid)
                                     └─ quarantine      (malformed/invalid/sentinel)

`from_json` yields null structs on malformed JSON = JSONDecodeError→drop
(dashboard.py:407-408); the constraint predicates mirror the Pydantic
field rules (min_length=1 ids, min_length=20 timestamps,
dashboard.py:312-322); measure defaults 0.0 via coalesce
(dashboard.py:315-316).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENT_SUPERSET_SCHEMA

RAW_COL = "value"  # raw JSON line column name (kafka/socket/text convention)


def parse_events(raw: DataFrame, raw_col: str = RAW_COL) -> DataFrame:
    """Parse raw JSON lines with the permissive superset schema; keep the
    raw line for quarantine forensics."""
    return raw.select(
        F.col(raw_col).alias("raw"),
        F.from_json(F.col(raw_col), EVENT_SUPERSET_SCHEMA).alias("e"),
    ).select("raw", "e.*")


def _valid_ts() -> Column:
    # Pydantic gate: timestamp string ≥20 chars (dashboard.py:318-319).
    # Unparseable-but-long timestamps PASS here and die at ts-parse,
    # exactly like the reference (dashboard.py:26-27 errors='coerce').
    return F.col("timestamp").isNotNull() & (F.length("timestamp") >= 20)


def facility_branch(parsed: DataFrame) -> DataFrame:
    """Valid power-emission events (routing: facility_id present,
    dashboard.py:341). Missing measures default to 0.0."""
    return (
        parsed.filter(
            F.col("facility_id").isNotNull()
            & (F.length("facility_id") >= 1)
            & _valid_ts()
        )
        .select(
            "facility_id",
            "timestamp",
            F.coalesce("power_mw", F.lit(0.0)).alias("power_mw"),
            F.coalesce("co2_tonnes", F.lit(0.0)).alias("co2_tonnes"),
        )
        .withColumn("ts", F.try_to_timestamp("timestamp"))
        .filter(F.col("ts").isNotNull())
    )


def market_branch(parsed: DataFrame) -> DataFrame:
    """Valid price-demand events (region_id present, dashboard.py:376)."""
    return (
        parsed.filter(
            F.col("region_id").isNotNull()
            & (F.length("region_id") >= 1)
            & F.col("facility_id").isNull()
            & _valid_ts()
        )
        .select(
            "region_id",
            "timestamp",
            F.coalesce("price_dmwh", F.lit(0.0)).alias("price_dmwh"),
            F.coalesce("demand_mw", F.lit(0.0)).alias("demand_mw"),
        )
        .withColumn("ts", F.try_to_timestamp("timestamp"))
        .filter(F.col("ts").isNotNull())
    )


def quarantine_branch(parsed: DataFrame) -> DataFrame:
    """Everything the facility/market branches do NOT route, tagged
    with a reason: malformed JSON (null struct), warm-start sentinel
    (dashboard.py:403-405), constraint failures, unparseable
    timestamps. The reference only logs these (dashboard.py:407-414);
    the engine keeps them queryable.

    Partition contract: the outer gate is the NEGATION of the routing
    predicates, so the three branches are disjoint by construction —
    an event with a valid facility_id and a junk region fragment is
    ROUTED, not also quarantined (reason predicates previously
    overlapped the branches). Null three-valued logic is collapsed
    with coalesce so a null-timestamp row labels as
    short_or_null_timestamp instead of falling through every NULL
    predicate to the fallback."""

    def _b(c: Column) -> Column:  # three-valued -> two-valued
        return F.coalesce(c, F.lit(False))

    parsed_ts_ok = F.try_to_timestamp("timestamp").isNotNull()
    fac_ok = _b(
        F.col("facility_id").isNotNull()
        & (F.length("facility_id") >= 1)
        & _valid_ts()
        & parsed_ts_ok
    )
    mkt_ok = _b(
        F.col("region_id").isNotNull()
        & (F.length("region_id") >= 1)
        & F.col("facility_id").isNull()
        & _valid_ts()
        & parsed_ts_ok
    )
    no_id = F.col("facility_id").isNull() & F.col("region_id").isNull()
    empty_id = _b(
        (F.col("facility_id").isNotNull() & (F.length("facility_id") < 1))
        | (F.col("region_id").isNotNull() & (F.length("region_id") < 1))
    )
    sentinel = _b(no_id & (F.col("timestamp") == "starting..."))
    malformed = _b(
        no_id
        & F.col("timestamp").isNull()
        & F.col("price_dmwh").isNull()
        & F.col("demand_mw").isNull()
        & F.col("power_mw").isNull()
    )
    bad_ts = ~_b(_valid_ts()) & ~sentinel & ~malformed
    unparseable = _b(_valid_ts()) & ~parsed_ts_ok
    reason = (
        F.when(malformed, "malformed_json")
        .when(sentinel, "warm_start_sentinel")
        .when(empty_id, "empty_id")
        .when(bad_ts, "short_or_null_timestamp")
        .when(unparseable, "unparseable_timestamp")
        .otherwise("unroutable")
    )
    return (
        parsed.filter(~(fac_ok | mkt_ok))
        .withColumn("reason", reason)
        .select("raw", "reason")
    )


def enrich_facility_events(events: DataFrame, facility_lookup: DataFrame) -> DataFrame:
    """J6 stream-static enrichment: broadcast dim join; lookup miss →
    drop, mirroring the KeyError path (dashboard.py:346-359). The
    fallback-upsert variant (J8) lives in foreachBatch at the sink
    (streaming.snapshot.enrichment_upsert_batch)."""
    return events.join(F.broadcast(facility_lookup), "facility_id", "inner")
