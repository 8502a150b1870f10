"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

The reference stores its cache wide (extractor.py:302-308: pivot_table on
timestamp × {metric}_{code}) purely as a CSV compression trick, and the
publisher melts it back (publisher.py:49-80). In this engine long/tidy +
Parquet is canonical (columnar encoding subsumes the trick, SURVEY.md §4.1)
and both reshapes are queryable operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: list[str],
    pivot_col: str,
    value_cols: list[str],
    agg: str = "avg",
    sep: str = "_",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """groupBy(index).pivot(pivot_col).agg(...) with `{metric}{sep}{code}`
    column flattening, mirroring extractor.py:302-305 (whose pandas
    pivot_table silently means duplicates — hence default agg='avg').

    Scale note: pivot materializes one column per distinct pivot value;
    pass `pivot_values` explicitly at scale to skip the distinct-values
    job and keep the plan static (~700 codes in the reference is fine;
    100k would not be — keep the long format canonical).
    """
    aggs = [getattr(F, agg)(v).alias(v) for v in value_cols]
    p = df.groupBy(*index).pivot(pivot_col, pivot_values)
    wide = p.agg(*aggs)
    if len(value_cols) == 1:
        # Spark names single-agg pivot columns just `{code}`; normalize to
        # `{metric}_{code}` like the reference.
        metric = value_cols[0]
        renames = {c: f"{metric}{sep}{c}" for c in wide.columns if c not in index}
    else:
        # Spark names multi-agg pivot columns `{code}_{metric}`; flip.
        renames = {}
        for c in wide.columns:
            if c in index:
                continue
            code, _, metric = c.rpartition("_")
            renames[c] = f"{metric}{sep}{code}"
    return wide.withColumnsRenamed(renames)


def unpivot_long(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """wide→long melt (publisher.py:55-80's per-column event rebuild).
    Built-in DataFrame.unpivot: narrow transform, no shuffle."""
    return df.unpivot(ids, value_cols, var_name, value_name)


def wide_columns_to_codes(df: DataFrame, prefix: str, sep: str = "_") -> list[str]:
    """Recover entity codes from wide column names (publisher.py:49-50's
    string-prefix strip) — driver-side metadata op on the schema only."""
    plen = len(prefix) + len(sep)
    return sorted(c[plen:] for c in df.columns if c.startswith(prefix + sep))
