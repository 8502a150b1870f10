"""IVF index invariants: training determinism, probe recall vs the
exact baseline, and degeneration to brute force at full probe width."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators import similarity as SIM
from assignment_2_dataengineering_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def centroids(emb):
    return SIM.train_centroids(emb, k=8, iters=4)


def test_training_is_deterministic(emb, centroids):
    again = SIM.train_centroids(emb, k=8, iters=4)
    assert centroids == again
    assert len(centroids) == 8
    dim = len(emb.first().embedding)
    assert all(len(c) == dim for c in centroids)


def test_full_probe_degenerates_to_bruteforce(emb, centroids):
    q = emb.filter(F.col("vec_id") < 3)
    exact = SIM.brute_force_topk(q, emb, k=5)
    full = SIM.ivf_topk(q, emb, centroids, k=5, nprobe=len(centroids))
    e = {(r.query_id, r.rank): r.match_id for r in exact.collect()}
    f = {(r.query_id, r.rank): r.match_id for r in full.collect()}
    assert e == f


def test_persisted_index_roundtrip_and_pruning(spark, emb, centroids, tmp_path):
    """The persisted IVF index returns exactly what the in-memory probe
    returns, and the probed search PRUNES the vectors scan to the
    probed cells (PartitionFilters on the partition column) — the
    read-less-at-scale claim, asserted on the actual plan."""
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(spark, emb, centroids, path)
    assert SIM.read_ivf_centroids(spark, path) == centroids

    q = emb.filter(F.col("vec_id") < 5)
    mem = SIM.ivf_topk(q, emb, centroids, k=5, nprobe=3)
    idx = SIM.ivf_topk_indexed(spark, path, q, k=5, nprobe=3)
    m = {(r.query_id, r.rank): (r.match_id, r.cos_sim) for r in mem.collect()}
    i = {(r.query_id, r.rank): (r.match_id, r.cos_sim) for r in idx.collect()}
    assert m == i

    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_probe_recall_reasonable(emb, centroids):
    """nprobe=3 of 8 cells must recover a solid fraction of the exact
    top-5 (deterministic corpus + deterministic training → stable)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(q, emb, k=5)
    approx = SIM.ivf_topk(q, emb, centroids, k=5, nprobe=3)
    e = {(r.query_id, r.match_id) for r in exact.collect()}
    a = {(r.query_id, r.match_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # every approx hit is a real corpus vector with correct per-query k
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in per_q)
