#!/usr/bin/env python
"""Generate scaled benchmark data by key-shifted replication of
/root/testdata/sf0.1 — for SCALING MEASUREMENT ONLY (SCALE.md round-6
work item: no measurement above sf0.1 existed in rounds 1-5).

Method: K copies of every fact/entity table, all *entity* keys shifted
by copy_i * STRIDE so intra-copy referential integrity holds and no key
collides across copies. Fixed-size dimensions (region, nation) are NOT
replicated, matching TPC-H semantics (nationkey/regionkey columns are
left unshifted everywhere). Two columns get per-copy perturbation so
data-dependent workloads keep realistic selectivity instead of finding
K exact duplicates of everything:
  - documents.text: every whitespace token is suffixed `_i` (copy 0
    keeps the original), so near-dup structure WITHIN a copy is
    preserved and no cross-copy pair exceeds any Jaccard threshold;
  - embeddings.embedding: the vector is rotated by i positions
    (norm-preserving, decorrelates copies).

Usage: python scripts/gen_scale_data.py SF OUT_DIR
  SF multiplies sf0.1: SF=1 -> 10 copies, SF=10 -> 100 copies.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
STRIDE = 10**10

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    k = round(sf / 0.1)
    spark = get_spark(app_name=f"gen-sf{sf}")
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    for t, keys in SHIFT_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = spark.range(k).select(F.col("id").alias("__copy"))
        df = base.crossJoin(copies)
        for c in keys:
            df = df.withColumn(c, F.col(c) + F.col("__copy") * F.lit(STRIDE))
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(
                                x, F.lit("_"), F.col("__copy").cast("string")
                            ),
                        ),
                        " ",
                    )
                ),
            )
        if t == "embeddings":
            dim = len(base.select("embedding").first()[0])
            rot = (F.col("__copy") % F.lit(dim)).cast("int")
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, F.lit(dim) - rot),
                    F.slice(F.col("embedding"), 1, rot),
                ),
            )
        n_parts = max(4, min(64, 4 * k))
        (
            df.select(base.columns)
            .repartition(n_parts)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
        print(t, "rows:", spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
