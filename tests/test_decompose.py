"""Grouped-PCA invariants: orthonormal components, descending explained
variance, determinism across independent runs, rank-deficient groups."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.decompose import grouped_pca
from assignment_2_dataengineering_spark.sources.tables import load_table


def _by_group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["label"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["component"])
    return out


def test_grouped_pca_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = grouped_pca(emb, "label", "embedding", "vec_id", k=3).collect()
    groups = _by_group(rows)
    n_labels = emb.select("label").distinct().count()
    assert len(groups) == n_labels
    for comps in groups.values():
        assert [c["component"] for c in comps] == list(range(len(comps)))
        ratios = [c["explained_ratio"] for c in comps]
        assert all(r >= -1e-12 for r in ratios) and sum(ratios) <= 1.0 + 1e-9
        assert ratios == sorted(ratios, reverse=True)
        vecs = [np.array(c["vector"]) for c in comps]
        for i, v in enumerate(vecs):
            assert math.isclose(float(v @ v), 1.0, rel_tol=1e-9)
            # sign fix: largest-|coord| is positive
            assert v[int(np.abs(v).argmax())] > 0
            for w in vecs[i + 1 :]:
                assert abs(float(v @ w)) < 1e-9


def test_grouped_pca_deterministic_across_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = grouped_pca(emb.repartition(8), "label", "embedding", "vec_id", k=2).collect()
    b = grouped_pca(emb.repartition(3), "label", "embedding", "vec_id", k=2).collect()
    ka = {(r["label"], r["component"]): (r["explained_ratio"], tuple(r["vector"])) for r in a}
    kb = {(r["label"], r["component"]): (r["explained_ratio"], tuple(r["vector"])) for r in b}
    assert ka == kb


def test_grouped_pca_rank_deficient_group(spark):
    # 2 points in a group -> centered rank 1 -> at most 1 informative
    # component; k=3 must not crash and ratios stay valid
    rows = [(1, [1.0, 0.0, 0.0], 0), (2, [3.0, 0.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = grouped_pca(df, "label", "embedding", "vec_id", k=3).collect()
    assert 1 <= len(out) <= 3
    top = [r for r in out if r["component"] == 0][0]
    assert math.isclose(top["explained_ratio"], 1.0, rel_tol=1e-9)
    v = np.array(top["vector"])
    assert math.isclose(abs(float(v[0])), 1.0, rel_tol=1e-9)


def test_arrow_twin_identical_to_pandas_path(spark, sf_dir):
    """grouped_pca_arrow (applyInArrow) must produce bit-identical
    output to grouped_pca (applyInPandas): same sort, same sign fix,
    same LAPACK — the UDF tiers are interchangeable by construction."""
    from assignment_2_dataengineering_spark.operators.decompose import (
        grouped_pca,
        grouped_pca_arrow,
    )
    from assignment_2_dataengineering_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = grouped_pca(emb, "label", "embedding", "vec_id", k=2).collect()
    b = grouped_pca_arrow(emb, "label", "embedding", "vec_id", k=2).collect()
    key = lambda r: (r.label, r.component)
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert (ra.label, ra.component) == (rb.label, rb.component)
        assert ra.explained_ratio == rb.explained_ratio  # bit-identical
        assert ra.vector == rb.vector
