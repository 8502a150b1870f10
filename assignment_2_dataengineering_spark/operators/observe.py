"""One-pass data-quality observation (SURVEY.md §2.11 extension).

The reference asserts data quality with separate pandas passes
(extractor.py:227-ff cited at sources/extract.py); a second scan of a
100 TB input to count nulls is a cost nobody pays twice. Spark's
`Observation` attaches accumulator-backed aggregate metrics to a plan:
they are collected DURING the action that runs the query anyway — zero
extra scans, exact counts, available on the driver the moment the
action finishes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_observation(
    df: DataFrame,
    not_null: list[str] = (),
    non_negative: list[str] = (),
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / negative-count metrics to `df`.
    Returns (observed_df, observation); run any action on observed_df
    (or a downstream plan that consumes every row of it), then read
    `observation.get` — e.g. {'n_rows': …, 'null_ts': …, 'neg_value': …}.
    Counts are exact (accumulators merge per task, no sampling).
    """
    # count(when(...)) rather than sum(when/otherwise): sum over ZERO
    # rows is NULL, so an empty observed plan reported null_*/neg_* as
    # None — breaking `== 0` gates; count returns 0
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        )
    for c in non_negative:
        metrics.append(F.count(F.when(F.col(c) < 0, 1)).alias(f"neg_{c}"))
    for name, col in (extra or {}).items():
        metrics.append(col.alias(name))
    obs = Observation()
    return df.observe(obs, *metrics), obs


def dq_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Great-Expectations-style constraint report: each value is a
    1-row DataFrame with an `n_violations` long (any shape of check —
    null scan, range filter, duplicate-key aggregate, referential
    anti-join); the report unions them into (constraint, n_violations,
    status) rows ordered by constraint name.

    Each check stays an independent plan, so Catalyst optimizes every
    one in isolation (a null count never pays a join; an anti-join
    check broadcasts its dim side) and the union is over 1-row results
    — the report costs exactly the sum of its checks, no more."""
    if not checks:
        raise ValueError("dq_report needs at least one check")
    parts = [
        df.select(
            F.lit(name).alias("constraint"),
            # sum-shaped checks yield NULL over zero rows — that is
            # zero violations, not a failure
            F.coalesce(F.col("n_violations").cast("long"), F.lit(0)).alias(
                "n_violations"
            ),
            F.when(
                F.coalesce(F.col("n_violations").cast("long"), F.lit(0)) == 0,
                F.lit("PASS"),
            )
            .otherwise(F.lit("FAIL"))
            .alias("status"),
        )
        for name, df in sorted(checks.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def kanonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity violations over a set of quasi-identifier columns:
    every equivalence class (distinct quasi-identifier combination)
    whose population is below k re-identifies its members.

    Returns (quasi_cols..., class_size) for violating classes only —
    the release-blocker list a privacy review wants, not the full class
    histogram. One hash aggregate on the quasi-identifier tuple; the
    violating classes are by definition the SMALL groups, so the output
    stays tiny even when the input is 100 TB (the common classes that
    dominate the data are exactly the ones filtered out)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )
