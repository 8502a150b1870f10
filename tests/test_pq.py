"""Product-quantization invariants: encoding domain/determinism, ADC
distance consistency, and the recall floor vs exact L2 top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators import similarity as SIM
from assignment_2_dataengineering_spark.sources.tables import load_table

M, K_CODES, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return SIM.train_pq_codebooks(emb, m=M, k=K_CODES, iters=3)


def test_codebooks_shape_and_determinism(emb, books):
    assert len(books) == M
    assert all(len(b) == K_CODES and len(b[0]) == DIM // M for b in books)
    again = SIM.train_pq_codebooks(emb, m=M, k=K_CODES, iters=3)
    assert books == again  # seeded init + deterministic iterations


def test_codes_in_domain(emb, books):
    codes = SIM.pq_encode(emb, books)
    rows = codes.collect()
    assert all(len(r.__codes if hasattr(r, "__codes") else r["__codes"]) == M for r in rows)
    flat = [c for r in rows for c in r["__codes"]]
    assert min(flat) >= 0 and max(flat) < K_CODES


def test_adc_matches_numpy_reconstruction(emb, books):
    """approx_dist == L2²(query, reconstructed-from-codes) — the ADC
    lookup-table fold computes exactly the distance to the quantized
    corpus vector."""
    codes_df = SIM.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 2)
    got = {
        (r.query_id, r.match_id): r.approx_dist
        for r in SIM.pq_topk(q, codes_df, books, k=5).collect()
    }
    codes = {r["match_id"]: r["__codes"] for r in codes_df.collect()}
    qv = {r.vec_id: np.asarray(r.embedding, dtype="float64") for r in q.collect()}
    b = np.stack([np.asarray(x, dtype="float64") for x in books])  # (M, K, sub)
    for (qid, mid), d in got.items():
        recon = np.concatenate([b[mi, codes[mid][mi]] for mi in range(M)])
        expect = float(((qv[qid] - recon) ** 2).sum())
        assert abs(d - expect) < 1e-4


def test_recall_floor_vs_exact_l2(spark, emb):
    """The production pipeline (m=16 codebooks, ADC shortlist 50,
    exact-L2 re-rank — same config as q_ann_pq) must recover ≥ 80% of
    the exact-L2 top-10 on the synthetic embeddings (measured 0.9;
    deterministic, so the floor has margin without flake risk)."""
    books16 = SIM.train_pq_codebooks(emb, m=16, k=16, iters=3)
    codes_df = SIM.pq_encode(emb, books16)
    q = emb.filter(F.col("vec_id") < 5)
    approx = SIM.pq_topk_reranked(q, emb, codes_df, books16, k=10, shortlist=50).collect()

    c = emb.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("__cv"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("__qv"), F.col("__cv"),
            lambda a, b: (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    scored = (
        c.crossJoin(F.broadcast(q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("d", l2)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("match_id").asc())
    exact = (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10).collect()
    )
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.match_id)
    got_sets: dict = {}
    for r in approx:
        got_sets.setdefault(r.query_id, set()).add(r.match_id)
    recalls = [
        len(exact_sets[qid] & got_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
