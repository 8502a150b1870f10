"""The reference's publisher (publisher.py:45-88) as a declarative plan:
wide cache → unpivot to per-entity events → JSON payloads in replay
order, ready for any sink (file drip-feed, Kafka, MQTT foreach —
streaming/replay.py).

Reference behavior re-expressed:
- codes recovered from wide column names (publisher.py:49-50) →
  schema-only driver op (reshape.wide_columns_to_codes);
- one power-emission event per (timestamp, facility) and one
  price-demand event per (timestamp, region), facility events before
  market events within a timestamp, timestamps ascending
  (publisher.py:55-80) → deterministic `__order` sort key;
- missing measures default to 0 via `row.get(col, 0)`
  (publisher.py:68-79). DIVERGENCE (SURVEY.md §7.4 hard part 3): the
  reference only defaults when the *column* is absent — NaN cells pass
  into the JSON as NaN, which json.dumps emits as the non-standard
  literal `NaN`. The engine emits valid JSON: nulls coalesce to 0.0
  everywhere.
- warm-start sentinel published before the replay (publisher.py:29-37).

Timestamps serialize as ISO-8601 UTC instants (the engine's session TZ);
the reference replays the original +10:00/+11:00 strings. Instants are
preserved; the wall-clock rendering is a display concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.reshape import unpivot_long, wide_columns_to_codes

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def _entity_events(
    wide: DataFrame,
    metric_a: str,
    metric_b: str,
    id_name: str,
    out_a: str,
    out_b: str,
) -> DataFrame:
    """Pair two metric column families per entity: (timestamp, code,
    a, b). Both values come from the SAME input row of the wide cache,
    so this is one narrow struct-explode projection — the previous
    two-unpivot + shuffle-join form scanned the cache twice and paid a
    join whose both sides were the same rows (round-4 review
    finding)."""
    codes = wide_columns_to_codes(wide, metric_a)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("id"),
                    F.col(f"{metric_a}_{c}").alias("va"),
                    F.col(f"{metric_b}_{c}").alias("vb"),
                )
                for c in codes
            ]
        )
    ).alias("p")
    return wide.select("timestamp", pairs).select(
        "timestamp",
        F.col("p.id").alias(id_name),
        F.coalesce("p.va", F.lit(0.0)).alias(out_a),
        F.coalesce("p.vb", F.lit(0.0)).alias(out_b),
    )


def facility_events(wide: DataFrame) -> DataFrame:
    return _entity_events(wide, "power", "emission", "facility_id", "power_mw", "co2_tonnes")


def market_events(wide: DataFrame) -> DataFrame:
    return _entity_events(wide, "price", "demand", "region_id", "price_dmwh", "demand_mw")


def replay_payloads(wide: DataFrame, include_sentinel: bool = True) -> DataFrame:
    """The full replay as (order key, JSON payload): facility events
    then market events per timestamp, ascending — byte-comparable to
    the publisher's emission order. Collecting is the sink's job; this
    stays a DataFrame so any sink (file chunks for the drip-feed,
    Kafka, MQTT foreach) can consume it."""
    fac = facility_events(wide).select(
        "timestamp",
        F.lit(0).alias("__kind"),
        F.col("facility_id").alias("__code"),
        F.to_json(
            F.struct(
                "facility_id",
                F.date_format("timestamp", _TS_FMT).alias("timestamp"),
                "power_mw",
                "co2_tonnes",
            )
        ).alias("payload"),
    )
    mkt = market_events(wide).select(
        "timestamp",
        F.lit(1).alias("__kind"),
        F.col("region_id").alias("__code"),
        F.to_json(
            F.struct(
                "region_id",
                F.date_format("timestamp", _TS_FMT).alias("timestamp"),
                "price_dmwh",
                "demand_mw",
            )
        ).alias("payload"),
    )
    events = fac.unionByName(mkt).orderBy("timestamp", "__kind", "__code").select("payload")
    if not include_sentinel:
        return events
    sentinel = events.sparkSession.createDataFrame(
        [('{"timestamp": "starting...", "price_dmwh": 0, "demand_mw": 0}',)], "payload string"
    )
    return sentinel.unionByName(events)


def publish_to_files(wide: DataFrame, out_dir: str, events_per_file: int = 200) -> int:
    """Materialize the replay into ordered chunk files for
    streaming/replay.file_replay_stream — the offline stand-in for a
    broker sink. Driver-side collect is intentional here: the replay
    artifact is a paced serial stream by definition (publisher.py:27),
    not a distributed dataset."""
    from ..streaming.replay import write_replay_chunks

    lines = [r.payload for r in replay_payloads(wide).collect()]
    return write_replay_chunks(lines, out_dir, events_per_file)
