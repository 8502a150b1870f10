"""Grouped matrix decomposition via applyInPandas — the non-stateful
grouped-map seam of the UDF tier (SURVEY.md §2.10), alongside scalar
pandas_udf, mapInPandas, applyInPandasWithState, and the Python UDTF.

Per-group PCA is the canonical "Spark genuinely can't express this"
operator: SVD is iterative linear algebra, not relational algebra. The
right distributed shape is groupBy(key).applyInPandas — each group's
matrix fits one executor (a mixture-component / per-source embedding
population, thousands×dims), Arrow moves it in batches, numpy/LAPACK
does the math at native speed. What does NOT scale is one global PCA
over all rows this way (single group = single task) — for that, use
per-partition Gram-matrix partial sums reduced on the driver (the
train_centroids pattern, operators/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_pca(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> DataFrame:
    """Top-k principal components per group: one output row per
    (group, component) with the unit component vector and its explained
    variance ratio.

    Determinism: rows are sorted by `id_col` before stacking (Arrow
    batch order is not stable across shuffles) and each component's
    sign is fixed so its largest-magnitude coordinate is positive —
    LAPACK is then bit-deterministic for a given group. Groups with
    fewer rows than components emit what rank allows.
    """
    # group column keeps ITS OWN type — hardcoding int crashed string
    # labels and truncated int64 ones
    gtype = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {gtype}, component int, explained_ratio double,"
        " vector array<double>"
    )

    def pca(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable sort: duplicate ids must order identically to the
        # Arrow twin's stable argsort or near-degenerate SVDs diverge
        pdf = pdf.sort_values(id_col, kind="stable")
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xc = X - X.mean(axis=0, keepdims=True)
        _, s, vt = np.linalg.svd(Xc, full_matrices=False)
        total = float((s**2).sum()) or 1.0
        rows = []
        for i in range(min(k, vt.shape[0])):
            v = vt[i]
            j = int(np.abs(v).argmax())
            if v[j] < 0:
                v = -v
            rows.append(
                {
                    group_col: pdf[group_col].iloc[0],
                    "component": i,
                    "explained_ratio": float(s[i] ** 2 / total),
                    "vector": v.tolist(),
                }
            )
        return pd.DataFrame(rows)

    return df.groupBy(group_col).applyInPandas(pca, out_schema)


def grouped_pca_arrow(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> DataFrame:
    """Raw-Arrow twin of grouped_pca via groupBy().applyInArrow —
    identical semantics (same sort, same sign fixing, same LAPACK), no
    pandas layer: the kernel receives one pyarrow.Table per group and
    returns one, so the only conversions are Arrow→numpy views. This is
    the grouped counterpart of similarity.arrow_cosine_scores'
    mapInArrow kernel; the equality pin in tests/test_decompose.py
    proves the pandas and Arrow tiers are interchangeable (pick by
    overhead, not by semantics)."""
    import pyarrow as pa

    out_schema = (
        f"{group_col} {df.schema[group_col].dataType.simpleString()},"
        " component int, explained_ratio double, vector array<double>"
    )
    from pyspark.sql.pandas.types import to_arrow_type

    group_pa_type = to_arrow_type(df.schema[group_col].dataType)

    def pca(table: "pa.Table") -> "pa.Table":
        ids = table.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        vecs = table.column(vec_col).to_pylist()
        X = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in order])
        group_val = table.column(group_col)[0].as_py()
        Xc = X - X.mean(axis=0, keepdims=True)
        _, s, vt = np.linalg.svd(Xc, full_matrices=False)
        total = float((s**2).sum()) or 1.0
        comps, ratios, vectors = [], [], []
        for i in range(min(k, vt.shape[0])):
            v = vt[i]
            j = int(np.abs(v).argmax())
            if v[j] < 0:
                v = -v
            comps.append(i)
            ratios.append(float(s[i] ** 2 / total))
            vectors.append(v.tolist())
        return pa.table(
            {
                # build with the DECLARED group type (int32 hardcoding
                # crashed string labels and truncated int64; bare
                # inference can mismatch the declared schema)
                group_col: pa.array([group_val] * len(comps), type=group_pa_type),
                "component": pa.array(comps, pa.int32()),
                "explained_ratio": pa.array(ratios, pa.float64()),
                "vector": pa.array(vectors, pa.list_(pa.float64())),
            }
        )

    return df.groupBy(group_col).applyInArrow(pca, out_schema)
