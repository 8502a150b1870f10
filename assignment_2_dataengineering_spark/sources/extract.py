"""REST extraction layer (SURVEY.md §2.1 S1-S3) + nested-response
normalization, Spark-first.

The reference drives the OpenElectricity API with hand-built query
strings, 25-code batches, a 3-attempt/10 s retry loop, and then parses
the nested responses with positional `zip`s guarded by asserts
(extractor.py:28-55, 116-189, 192-288). Here:

- HTTP stays driver-side (it is I/O orchestration, not a distributed
  operator) but the transport is injectable, so tests run offline and a
  production deployment can swap in any client;
- landed raw JSON becomes DataFrames with explicit nested schemas, and
  every positional zip becomes what it logically was all along — an
  **equi-join** on (unit_code, timestamp) / (region_code, timestamp)
  (SURVEY.md §2.3 J3/J4): order-independent, parallel, and checkable;
- the reference's inline asserts (extractor.py:207-277) become
  `alignment_check` — a full-outer-join null scan run as a validation
  query instead of a crash.

At scale the landed JSON lives on object storage and `spark.read.json`
distributes the parse; `responses_to_df` takes parsed docs for tests.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# transport(url) -> (status_code, parsed_json_or_none)
Transport = Callable[[str], tuple[int, dict | None]]


def build_query_string(
    interval: str | None = None,
    metrics: Sequence[str] | None = None,
    network_region: Sequence[str] | None = None,
    facility_code: Sequence[str] | None = None,
    primary_grouping: str | None = None,
    date_start: str | None = None,
    date_end: str | None = None,
) -> str:
    """OE-style query string: scalar params once, list params repeated
    (the API takes repeated keys, not comma-joins — extractor.py:28-55).
    Values are PERCENT-ENCODED via urlencode: an ISO-8601 timezone
    offset like '+10:00' would otherwise decode server-side as
    ' 10:00' (+ is a space in query strings) and shift the requested
    range."""
    from urllib.parse import urlencode

    pairs: list[tuple[str, str]] = []
    if interval:
        pairs.append(("interval", interval))
    if primary_grouping:
        pairs.append(("primary_grouping", primary_grouping))
    if date_start:
        pairs.append(("date_start", date_start))
    if date_end:
        pairs.append(("date_end", date_end))
    pairs += [("metrics", m) for m in metrics or ()]
    pairs += [("network_region", r) for r in network_region or ()]
    pairs += [("facility_code", c) for c in facility_code or ()]
    return "?" + urlencode(pairs) if pairs else ""


def fetch_with_retry(
    transport: Transport,
    url: str,
    retry_limit: int = 3,
    backoff_s: float = 10.0,
    sleep: Callable[[float], None] = time.sleep,
) -> dict | None:
    """S3 retry wrapper: ≤retry_limit attempts with fixed backoff, give
    up → None (extractor.py:116-136). Driver-side only — distributed
    reads get task retries from Spark itself."""
    for attempt in range(retry_limit):
        status, body = transport(url)
        if status == 200:
            return body
        if attempt + 1 < retry_limit:
            sleep(backoff_s)
    return None


def batch_codes(codes: Sequence[str], batch_size: int = 25) -> list[list[str]]:
    """API-limit batching (extractor.py:100-104): ≤25 codes per call."""
    return [list(codes[i : i + batch_size]) for i in range(0, len(codes), batch_size)]


def fetch_facility_data(
    transport: Transport,
    base_url: str,
    facility_codes: Sequence[str],
    date_start: str,
    date_end: str,
    batch_size: int = 25,
) -> list[dict]:
    """S1: one GET per facility-code batch; failed batches are skipped
    (reference behavior: a None response lands no file)."""
    out = []
    for batch in batch_codes(facility_codes, batch_size):
        qs = build_query_string(
            interval="5m",
            metrics=["power", "emissions"],
            date_start=date_start,
            date_end=date_end,
            facility_code=batch,
        )
        resp = fetch_with_retry(transport, f"{base_url}/data/facilities/NEM{qs}")
        if resp is not None:
            out.append(resp)
    return out


def fetch_market_data(
    transport: Transport, base_url: str, date_start: str, date_end: str
) -> dict | None:
    """S2: single GET, per-region grouping."""
    qs = build_query_string(
        interval="5m",
        metrics=["price", "demand"],
        date_start=date_start,
        date_end=date_end,
        primary_grouping="network_region",
    )
    return fetch_with_retry(transport, f"{base_url}/market/network/NEM{qs}")


# ---------------------------------------------------------------------------
# Nested-response normalization (the distributed part)
# ---------------------------------------------------------------------------

# Shared shape of both endpoints' payloads: data → metric blocks →
# per-series results → [timestamp, value] pairs. Values arrive as JSON
# numbers; with an all-string pair schema they read as strings and are
# cast back — keeps one schema for both the ts and the measure slot.
RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("metric", T.StringType()),
                        T.StructField(
                            "results",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType()),
                                        T.StructField(
                                            "columns",
                                            T.StructType(
                                                [T.StructField("unit_code", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "data", T.ArrayType(T.ArrayType(T.StringType()))
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def responses_to_df(spark: SparkSession, responses: Iterable[dict]) -> DataFrame:
    """Parsed response docs → one-row-per-response DataFrame. In
    production: `spark.read.json(landing_path, schema=RESPONSE_SCHEMA)`
    over the raw landed files — same downstream plan.

    The [ts, value] pairs are STRINGIFIED before createDataFrame:
    RESPONSE_SCHEMA declares them array<string> (the read.json path
    coerces scalars itself), but real fetcher output carries JSON
    numbers, which createDataFrame's schema verifier rejects for
    StringType — without this, responses_to_df crashed on the module's
    own fetch_* results."""

    def _stringify(doc: dict) -> dict:
        out = dict(doc)
        out["data"] = [
            {
                **m,
                "results": [
                    {
                        **r,
                        "data": [
                            [None if x is None else str(x) for x in pair]
                            for pair in (r.get("data") or [])
                        ],
                    }
                    for r in (m.get("results") or [])
                ],
            }
            for m in (doc.get("data") or [])
        ]
        return out

    return spark.createDataFrame(
        [_stringify(d) for d in responses], RESPONSE_SCHEMA
    )


def _metric_points(responses: DataFrame, key_expr: F.Column) -> DataFrame:
    """Explode data→results→pairs into (metric, key, timestamp, value)."""
    return (
        responses.select(F.explode("data").alias("m"))
        .select(F.col("m.metric").alias("metric"), F.explode("m.results").alias("r"))
        .select("metric", key_expr.alias("key"), F.explode("r.data").alias("pair"))
        .select(
            "metric",
            "key",
            F.element_at("pair", 1).alias("timestamp"),
            F.element_at("pair", 2).cast("double").alias("value"),
        )
    )


def facility_responses_to_long(responses: DataFrame) -> DataFrame:
    """Power/emissions blocks → long (unit_code, timestamp, power,
    emission). The reference zips the i-th power series with the i-th
    emissions series and the j-th reading with the j-th reading,
    asserting keys align (extractor.py:206-227); the equi-join IS that
    assert, made declarative — order never matters."""
    pts = _metric_points(responses, F.col("r.columns.unit_code"))
    power = pts.filter(F.col("metric") == "power").select(
        F.col("key").alias("unit_code"), "timestamp", F.col("value").alias("power")
    )
    emis = pts.filter(F.col("metric") == "emissions").select(
        F.col("key").alias("unit_code"), "timestamp", F.col("value").alias("emission")
    )
    return power.join(emis, ["unit_code", "timestamp"], "inner")


def market_responses_to_long(responses: DataFrame) -> DataFrame:
    """Price/demand blocks → long (region_code, timestamp, price,
    demand). Region codes come prefixed in the series name
    (`price_NSW1` — extractor.py:267-268): regexp strip (F1), then the
    same equi-join-instead-of-zip."""
    pts = _metric_points(
        responses, F.regexp_replace(F.col("r.name"), r"^(price_|demand_)", "")
    )
    price = pts.filter(F.col("metric") == "price").select(
        F.col("key").alias("region_code"), "timestamp", F.col("value").alias("price")
    )
    demand = pts.filter(F.col("metric") == "demand").select(
        F.col("key").alias("region_code"), "timestamp", F.col("value").alias("demand")
    )
    return price.join(demand, ["region_code", "timestamp"], "inner")


def alignment_check(left: DataFrame, right: DataFrame, keys: list[str]) -> dict[str, int]:
    """§2.11 data-quality asserts as a validation query: full-outer
    join null scan counting KEYS present on only one side. The
    reference crashes on misalignment (assert); the engine reports.
    Per-KEY semantics (distinct before the join): duplicate rows of
    the same key — overlapping fetch ranges landing a reading twice —
    would otherwise multiply 'matched' through the join fan-out, and
    the three numbers would reconcile with neither input. One
    aggregation pass computes all three counts (three separate
    count() actions re-ran the join three times)."""
    lo = left.select(*keys).distinct().withColumn("__l", F.lit(1))
    ro = right.select(*keys).distinct().withColumn("__r", F.lit(1))
    row = (
        lo.join(ro, keys, "full_outer")
        .agg(
            F.count(F.when(F.col("__r").isNull(), 1)).alias("left_only"),
            F.count(F.when(F.col("__l").isNull(), 1)).alias("right_only"),
            F.count(
                F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), 1)
            ).alias("matched"),
        )
        .first()
    )
    return {k: int(row[k]) for k in ("left_only", "right_only", "matched")}
