"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute_force_topk: exact cosine top-k — query set broadcast against the
  corpus, one narrow map stage + per-query top-k window. The correctness
  baseline, and actually the right plan when |queries| is small even at
  100 TB corpus (scan-bound, no index build).
- lsh_topk: random-hyperplane LSH bucketing (sign-bit signature, banded)
  to restrict candidates, then exact re-rank. The scale path when
  |queries| is large: candidate join is bucket-co-partitioned instead of
  a full cross product.

Embedding cosine is also the 5th dedup modality (embedding_near_dupes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_sign_bits


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, match_id, rank, cos_sim). Deterministic: ties
    broken by match_id ascending. The query side is broadcast — the
    corpus never shuffles, only a per-query window top-k (pushed down to
    partial top-k by WindowGroupLimit).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "cos_sim")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH banded bucketing → exact rerank.

    Signature = sign bits of `n_planes` deterministic hyperplane
    projections, split into `bands` OR-ed bands. Candidates are pairs
    sharing ≥1 band bucket; exact cosine reranks. Recall rises with
    bands; cost is bucket-join fan-out instead of |Q|×|C|.
    """
    rows = n_planes // bands

    def with_bands(df: DataFrame, role: str) -> DataFrame:
        # materialize the signature once per row; band structs reference
        # the column, not a per-band copy of the projection expression
        sig = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"__{role}v"),
            hyperplane_sign_bits(F.col(vec_col), dim, n_planes, seed).alias("__bits"),
        )
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.element_at("__bits", b * rows + r + 1) for r in range(rows)]).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        return sig.select(
            f"{role}_id", f"__{role}v", F.explode(band_arr).alias("bb")
        ).select(f"{role}_id", f"__{role}v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    qb = with_bands(queries, "query")
    cb = with_bands(corpus, "match")
    cand = (
        cb.join(qb, ["band", "bucket"])
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "__queryv", "match_id", "__matchv")
        .distinct()
    )
    scored = cand.withColumn("cos_sim", F.round(cosine(F.col("__queryv"), F.col("__matchv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "cos_sim")
    )


def embedding_near_dupes(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup modality #5):
    LSH-bucketed candidate pairs verified by exact cosine ≥ threshold."""
    from .dedup import bucket_pairs

    rows = n_planes // bands
    # Materialize the sign-bit array once per row (Generate barrier —
    # CollapseProject would otherwise inline one full hyperplane-fold
    # tree per element_at, an n_planes× re-evaluation; see
    # dedup._with_shingle_set for the measured cost of that pattern).
    sig = vectors.select(
        F.col(id_col),
        F.explode(
            F.array(hyperplane_sign_bits(F.col(vec_col), dim, n_planes, seed))
        ).alias("__bits"),
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.element_at("__bits", b * rows + r + 1) for r in range(rows)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    bk = sig.select(F.col(id_col), F.explode(band_arr).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # candidate pairs without a self-join (see dedup.bucket_pairs), then
    # exact-cosine verification on candidates only
    cand = bucket_pairs(bk, id_col)
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
