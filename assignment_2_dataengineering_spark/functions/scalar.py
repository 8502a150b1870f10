"""Scalar function surface (SURVEY.md §2.8 F1-F15).

All JVM-side column expressions — the reference's pandas `.apply` lambdas
(SURVEY.md §2.10) need no Python UDFs at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_prefix(col: Column, prefix: str) -> Column:
    """F1: recover `<FAC>` from `power_<FAC>` (publisher.py:49-50).
    The prefix is regex-ESCAPED: a metacharacter in it ('p+v', 'a.b')
    would otherwise strip the wrong thing or raise at execution."""
    import re

    return F.regexp_replace(col, f"^{re.escape(prefix)}_", "")


def metric_code(metric: Column | str, code: Column | str) -> Column:
    """F2: flatten `{metric}_{code}` (extractor.py:303-305). NULL
    PROPAGATES (F.concat, not concat_ws): a null code must surface as
    a null name, not silently collapse to the bare metric and mint a
    phantom column downstream — matching the reference's f-string,
    which would render the bad key visibly."""
    m = F.lit(metric) if isinstance(metric, str) else metric
    c = F.lit(code) if isinstance(code, str) else code
    return F.concat(m, F.lit("_"), c)


def parse_ts(col: Column) -> Column:
    """F3: tz-aware ISO-8601 parse, null on failure — the engine's
    `errors='coerce'` (dashboard.py:26-27). try_to_timestamp keeps the
    null-on-malformed contract under ANSI mode."""
    return F.try_to_timestamp(col)


def coerce_double(col: Column, default: float = 0.0) -> Column:
    """F8: `pd.to_numeric(errors='coerce').fillna(default)`
    (dashboard.py:510-511) — ANSI-safe try_cast + coalesce."""
    return F.coalesce(col.try_cast("double"), F.lit(default))


def marker_size(
    value: Column, p95: Column, lo: float = 12.0, span: float = 24.0
) -> Column:
    """F9: `lo + span*sqrt(clip(v/p95, 0, 1))` (dashboard.py:215-218),
    guarded against p95==0 (ANSI division); null value/ratio clips to
    the smallest marker. THE single home of the scaling formula —
    plans/dashboard.marker_sizes delegates here."""
    ratio = value / F.nullif(p95, F.lit(0.0))
    clipped = F.least(F.greatest(F.coalesce(ratio, F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
    return F.lit(lo) + F.lit(span) * F.sqrt(clipped)


def format_metric(value: Column, unit: str = "MW", threshold: float = 1000.0) -> Column:
    """F11: conditional metric label (dashboard.py:589-597) — comma
    thousands separators, 1 decimal below `threshold` in |v|, 0 decimals
    at or above, plus the unit suffix. format_number is the JVM-side
    `f"{v:,.Nf}"`; both round half-even on doubles."""
    v = F.coalesce(value.try_cast("double"), F.lit(0.0))
    label = F.when(F.abs(v) < threshold, F.format_number(v, 1)).otherwise(F.format_number(v, 0))
    return F.concat(label, F.lit(f" {unit}"))


def ellipsize(col: Column, max_len: int = 23) -> Column:
    """F12: truncate long names with an ellipsis (dashboard.py:599-601)."""
    return F.when(F.length(col) > max_len, F.concat(F.substring(col, 1, max_len), F.lit("…"))).otherwise(col)


def merge_latest(new: Column, old: Column) -> Column:
    """F15: field-level `{**prev, **validated}` last-write-wins merge
    (dashboard.py:364-365) — per-column null-safe coalesce."""
    return F.coalesce(new, old)
