"""Invariants for SemDeDup-style semantic deduplication
(operators/similarity.py semantic_dedup), cited from
plans/queries_similarity.py q_semantic_dedup.

The synthetic embeddings corpus contains no true near-duplicates (max
pairwise cosine ~0.51), so production-threshold semantics are pinned on
constructed fixtures: real vectors unioned with exact and jittered
copies under fresh ids.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.similarity import semantic_dedup
from assignment_2_dataengineering_spark.sources.tables import load_table

THR = 0.9
DIM = 64


@pytest.fixture(scope="module")
def with_dupes(spark, sf_dir):
    """First 60 real vectors + exact copies of the first 10 (ids +1000)
    + small-jitter copies of the next 5 (ids +2000, cosine > 0.99)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    pdf = emb.toPandas()
    rows = [(int(r.vec_id), [float(x) for x in r.embedding], int(r.label)) for r in pdf.itertuples()]
    extra = []
    for vid, vec, lab in rows[:10]:
        extra.append((vid + 1000, vec, lab))
    rng = np.random.default_rng(7)
    for vid, vec, lab in rows[10:15]:
        v = np.asarray(vec) + rng.normal(0, 1e-3, size=len(vec))
        extra.append((vid + 2000, [float(x) for x in v], lab))
    dup = spark.createDataFrame(extra, schema=emb.schema)
    return emb.unionByName(dup), {int(r[0]) for r in extra}


def _cos(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na and nb else 0.0


def test_keep_drop_partitions_input_and_dupes_dropped(spark, with_dupes):
    df, dup_ids = with_dupes
    res = semantic_dedup(df, k=8, iters=3, threshold=THR, dim=DIM).toPandas()
    assert len(res) == df.count()
    assert res["id"].is_unique
    # keep xor duplicate_of
    assert res[res["keep"]]["duplicate_of"].isna().all()
    assert res[~res["keep"]]["duplicate_of"].notna().all()
    # every constructed duplicate is dropped (its source is lower-id,
    # identical/near-identical => same cell, cosine > threshold)
    dropped = set(res[~res["keep"]]["id"].astype(int))
    assert dup_ids <= dropped
    # no original (id < 60) is dropped: originals are mutually < 0.9
    assert all(i >= 1000 for i in dropped)


def test_drops_verified_by_exact_cosine_and_keeper_precedes(spark, with_dupes):
    df, _ = with_dupes
    res = semantic_dedup(df, k=8, iters=3, threshold=THR, dim=DIM).toPandas()
    vecs = {int(r.vec_id): r.embedding for r in df.toPandas().itertuples()}
    for r in res[~res["keep"]].itertuples():
        keeper = int(r.duplicate_of)
        assert keeper < int(r.id)
        assert _cos(vecs[keeper], vecs[int(r.id)]) >= THR - 1e-12
        # the keeper itself was kept
        assert bool(res.set_index("id").loc[keeper, "keep"])


def test_single_cell_equals_bruteforce_greedy(spark, with_dupes):
    """k=1 confines everything to one cell: the operator must reproduce
    the driver-side brute-force greedy keep-lowest-id resolution."""
    df, _ = with_dupes
    res = (
        semantic_dedup(df, k=1, iters=1, threshold=THR, dim=DIM)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pdf = df.toPandas().sort_values("vec_id").reset_index(drop=True)
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    kept: list[int] = []
    expect_keep, expect_dup = [], []
    for i in range(len(pdf)):
        sims = V[kept] @ V[i] if kept else np.array([])
        hit = np.nonzero(sims >= THR)[0]
        if len(hit):
            expect_keep.append(False)
            expect_dup.append(int(pdf["vec_id"].iloc[kept[int(hit[0])]]))
        else:
            kept.append(i)
            expect_keep.append(True)
            expect_dup.append(None)
    assert list(res["keep"]) == expect_keep
    got_dup = [None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v) for v in res["duplicate_of"]]
    assert got_dup == expect_dup


def test_max_cell_size_cap_keeps_lowest_ids(spark, with_dupes):
    df, _ = with_dupes
    res = semantic_dedup(df, k=1, iters=1, threshold=THR, dim=DIM, max_cell_size=20).toPandas()
    # cap truncates the (single) cell to its 20 lowest ids
    assert len(res) == 20
    all_ids = sorted(int(r.vec_id) for r in df.select("vec_id").collect())
    assert sorted(res["id"].astype(int)) == all_ids[:20]


def test_deterministic_across_runs(spark, with_dupes):
    df, _ = with_dupes
    a = semantic_dedup(df, k=8, iters=3, threshold=THR, dim=DIM).toPandas().sort_values("id").reset_index(drop=True)
    b = semantic_dedup(df, k=8, iters=3, threshold=THR, dim=DIM).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_multiblock_cell_equals_bruteforce_greedy(spark):
    """A single cell LARGER than the kernel's 512-row gemm block:
    pins that the blocked greedy (pre-block gemm + intra-block scan)
    is value-identical to the row-at-a-time reference, including
    which keeper each duplicate points at across block boundaries.
    Clustered geometry (60 base directions + jitter) guarantees many
    near-dup pairs straddle blocks."""
    rng = np.random.default_rng(13)
    base = rng.normal(size=(60, DIM))
    rows = []
    for i in range(1200):
        v = base[i % 60] + rng.normal(0, 1e-3, size=DIM)
        rows.append((i, [float(x) for x in v], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    res = (
        semantic_dedup(df, k=1, iters=1, threshold=THR, dim=DIM)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    kept: list[int] = []
    expect_keep, expect_dup = [], []
    for i in range(len(rows)):
        sims = V[kept] @ V[i] if kept else np.array([])
        hit = np.nonzero(sims >= THR)[0]
        if len(hit):
            expect_keep.append(False)
            expect_dup.append(kept[int(hit[0])])
        else:
            kept.append(i)
            expect_keep.append(True)
            expect_dup.append(None)
    assert list(res["keep"]) == expect_keep
    got_dup = [
        None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v)
        for v in res["duplicate_of"]
    ]
    assert got_dup == expect_dup
