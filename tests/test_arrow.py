"""The raw-Arrow kernel tier (operators/similarity.arrow_cosine_scores):
agreement with the Catalyst expression path to float tolerance, and
top-k stability between the two kernels.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from assignment_2_dataengineering_spark.functions.vectors import cosine
from assignment_2_dataengineering_spark.operators.similarity import (
    arrow_cosine_scores,
)
from assignment_2_dataengineering_spark.sources.tables import load_table


def test_arrow_scores_match_expression_kernel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]

    got = {
        r["vec_id"]: r["score"]
        for r in arrow_cosine_scores(emb, qvec).collect()
    }
    qcol = F.array(*[F.lit(v) for v in qvec])
    want = {
        r["vec_id"]: r["score"]
        for r in emb.select(
            "vec_id", cosine(F.col("embedding").cast("array<double>"), qcol).alias("score")
        ).collect()
    }
    assert set(got) == set(want) and got
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])

    # top-10 identical between kernels
    top_a = [k for k, _ in sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    top_b = [k for k, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert top_a == top_b


def test_arrow_kernel_handles_empty_partitions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8).repartition(32)
    qvec = [1.0] * 64
    out = arrow_cosine_scores(emb, qvec).collect()
    assert len(out) == 8
