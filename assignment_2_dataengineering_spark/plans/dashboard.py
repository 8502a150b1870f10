"""The dashboard's analytics as a library (SURVEY.md §7.1 step 6): every
query the reference's render plane computes per rerun
(dashboard.py:457-561, 704-732), expressed over snapshot/history
DataFrames so any thin UI can consume them. No UI code here — the
engine's surface is DataFrames in, DataFrames out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import mode_value


def filter_snapshot(
    snap: DataFrame,
    regions: list[str] | None = None,
    fuels: list[str] | None = None,
    region_col: str = "region",
    fuel_col: str = "fuel_tech",
) -> DataFrame:
    """UI filters (dashboard.py:704-713): region membership (P4 isin)
    and fuel-set overlap (P5 arrays_overlap). None = no filter."""
    out = snap
    if regions is not None:
        out = out.filter(F.col(region_col).isin(regions))
    if fuels is not None:
        out = out.filter(
            F.arrays_overlap(F.col(fuel_col), F.array(*[F.lit(x) for x in fuels]))
        )
    return out


def facility_metrics(snap: DataFrame) -> DataFrame:
    """Scalar tiles over the facility snapshot (dashboard.py:716-719):
    total MW, total tonnes, and the modal timestamp ("last updated" —
    deterministic min-value tie-break, SURVEY.md §7.4 item 6)."""
    totals = snap.agg(
        F.round(F.sum("power_mw"), 4).alias("total_power_mw"),
        F.round(F.sum("co2_tonnes"), 4).alias("total_co2_tonnes"),
        F.count(F.lit(1)).alias("n_facilities"),
    )
    last = mode_value(snap, "last_ts", alias="last_updated")
    # left join on TRUE, not crossJoin: a global agg always yields one
    # row, but the mode of an empty snapshot yields zero — the tile row
    # must survive with a null "last updated"
    return totals.join(last, F.lit(True), "left")


def market_metrics(snap: DataFrame) -> DataFrame:
    """Market tiles (dashboard.py:725-732): mean price with the NaN
    guard (empty → 0.0, dashboard.py:726), total demand, modal ts."""
    totals = snap.agg(
        F.round(F.coalesce(F.avg("price_dmwh"), F.lit(0.0)), 4).alias("avg_price_dmwh"),
        F.round(F.coalesce(F.sum("demand_mw"), F.lit(0.0)), 4).alias("total_demand_mw"),
    )
    last = mode_value(snap, "last_ts", alias="last_updated")
    return totals.join(last, F.lit(True), "left")


def fuel_legend(lookup: DataFrame, fuel_col: str = "fuel_tech") -> DataFrame:
    """Sorted distinct fuel labels across the fleet (A8/F14,
    dashboard.py:85, 471-475): explode → collect_set → sort."""
    return lookup.select(F.explode(fuel_col).alias("fuel")).agg(
        F.array_sort(F.collect_set("fuel")).alias("fuels")
    )


def marker_sizes(
    snap: DataFrame, value_col: str = "power_mw", lo: float = 12.0, span: float = 24.0
) -> DataFrame:
    """Map marker scaling (F9/A7, dashboard.py:104-107, 215-218):
    px = lo + span·sqrt(clip(v / p95⁺, 0, 1)) where p95⁺ is the 95th
    percentile of positive values. One tiny agg + a crossJoin broadcast
    of the scalar — no per-row Python (the reference vectorizes with
    numpy; here it's codegen)."""
    p95 = (
        snap.filter(F.col(value_col) > 0)
        .agg(F.percentile_approx(value_col, 0.95).alias("p95"))
        .select(F.coalesce("p95", F.lit(1.0)).alias("p95"))
    )
    # the formula lives ONCE in functions/scalar.marker_size (F9);
    # null values clip to the smallest marker there
    from ..functions.scalar import marker_size

    return (
        snap.crossJoin(F.broadcast(p95))
        .withColumn(
            "marker_px",
            F.round(marker_size(F.col(value_col), F.col("p95"), lo, span), 2),
        )
        .drop("p95")
    )
