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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, hyperplane_sign_bits, norm


def rerank_topk(
    candidates: DataFrame,
    k: int = 10,
    qv_col: str = "__qv",
    cv_col: str = "__cv",
    qn_col: str | None = None,
    cn_col: str | None = None,
) -> DataFrame:
    """Exact-cosine re-rank of candidate (query_id, match_id, qv, cv)
    pairs to a per-query top-k — THE verification stage every ANN
    variant in this module ends with (brute force feeds it the cross
    product, LSH its bucket collisions, IVF its probed cells).
    Deterministic: cosine rounded to 6dp, ties broken by match_id; the
    per-query window lowers to partial top-k via WindowGroupLimit, so
    no single task ever holds a query's full candidate set.

    Pass `qn_col`/`cn_col` when the caller precomputed the vector norms
    BEFORE candidate generation (a narrow per-row projection): the
    pair stream then evaluates one dot fold instead of three — the
    norms are the identical doubles either way (same fold over the
    same array), so results are bit-unchanged."""
    if qn_col and cn_col:
        cos = dot(F.col(qv_col), F.col(cv_col)) / F.nullif(
            F.col(qn_col) * F.col(cn_col), F.lit(0.0)
        )
    else:
        cos = cosine(F.col(qv_col), F.col(cv_col))
    scored = candidates.withColumn("cos_sim", F.round(cos, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "cos_sim")
    )


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
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    cand = c.crossJoin(F.broadcast(q)).filter(F.col("match_id") != F.col("query_id"))
    return rerank_topk(cand, k, qn_col="__qn", cn_col="__cn")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH banded bucketing → exact rerank.

    Signature = sign bits of `n_planes` deterministic hyperplane
    projections, split into `bands` OR-ed bands. Candidates are pairs
    sharing ≥1 band bucket; exact cosine reranks. Recall rises with
    bands and falls with rows-per-band; cost is bucket-join fan-out
    instead of |Q|×|C|. Defaults (24 planes, 8 bands of 3 bits) measure
    recall ≈ 0.96 vs brute force on the synthetic sf0.001 embeddings
    (floor 0.6 pinned in tests/test_dedup.py); sharper distributions
    afford more rows per band.
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
    return rerank_topk(cand, k, qv_col="__queryv", cv_col="__matchv")


def vector_band_buckets(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id, band, bucket) hyperplane-LSH band rows for a vector table —
    the banding half of embedding_near_dupes, factored so the streaming
    incremental index (streaming/embedding_index.py) bands each batch
    with EXACTLY the code the batch operator uses. Narrow (explode per
    band), no shuffle."""
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
    return sig.select(F.col(id_col), F.explode(band_arr).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def verify_cosine_pairs(
    candidates: DataFrame,
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine verification of candidate (id_a, id_b) pairs against
    a vector table: only vectors appearing in a candidate pair are
    scored (left-semi restriction), norms precomputed per vector, one
    dot fold per pair. The verify half of embedding_near_dupes, shared
    with the streaming incremental index."""
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    vv = vectors.join(cand_ids, id_col, "left_semi")
    va = vv.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    vb = vv.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    cos = dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
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

    bk = vector_band_buckets(vectors, id_col, vec_col, dim, n_planes, bands, seed)
    # candidate pairs without a self-join (see dedup.bucket_pairs), then
    # exact-cosine verification on candidates only
    cand = bucket_pairs(bk, id_col)
    return verify_cosine_pairs(cand, vectors, threshold, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: trained coarse quantizer + probed search
# ---------------------------------------------------------------------------


def _centroid_kernels(centroids: list[list[float]]):
    """Vectorized assignment kernels for a (small, broadcast-in-closure)
    centroid matrix. K-means assignment is a dense (batch × dim) @
    (dim × k) matmul — the one place in this module where a literal
    Catalyst expression tree (k × dim literal nodes, re-planned per
    call) loses badly to an Arrow-batched numpy kernel: 81 s → ~2 s
    per training run at sf0.1. Returns (assign, probe_cells(nprobe))
    pandas UDFs; both deterministic."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    c2 = (C * C).sum(axis=1)

    def _dists(vs: pd.Series) -> np.ndarray:
        # single C-level stack of the batch (one np.asarray over the
        # list of row arrays), not one np.asarray per row — the
        # per-row form was the visible constant at 200k+ vectors
        V = np.asarray(vs.tolist(), dtype=np.float64)
        return (V * V).sum(1, keepdims=True) - 2.0 * (V @ C.T) + c2[None, :]

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        return pd.Series(_dists(vs).argmin(1).astype("int32"))

    def probe_cells(nprobe: int):
        @F.pandas_udf("array<int>")
        def probe(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype="object")
            order = np.argsort(_dists(vs), axis=1, kind="stable")[:, :nprobe]
            return pd.Series([row.astype("int32").tolist() for row in order])

        return probe

    return assign, probe_cells


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Scale shape: centroids live on the driver (k × dim floats — tiny)
    and enter the plan as broadcast literals; each iteration is one
    narrow assign pass + one groupBy(cid, dim) shuffle of per-dimension
    partial sums. At 100 TB you train on a sample (`sample_fraction`,
    seeded) — quantizer quality needs thousands of points, not the
    corpus. Empty clusters keep their previous centroid.

    Init is the k lowest-id vectors: deterministic across runs and
    executors (kmeans++ would need a seeded sequential scan; stability
    is worth more here than init quality at these k)."""
    train = vectors.select(id_col, vec_col)
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=42)
    # Iterative reuse: cache once (keeping the source partitioning —
    # it defines the deterministic accumulation order), unpersist when
    # trained. Each iteration is ONE narrow mapInPandas pass emitting
    # ≤k (count, sum-vector) partial rows per partition — no
    # posexplode fan-out, no shuffle; the driver merges partitions×k
    # tiny rows. (The previous explode+groupBy form shuffled
    # rows×dim cells per iteration: ~3 s/iteration at sf0.1 vs ~0.1 s
    # for this shape.)
    train = train.persist()
    try:
        init = [
            [float(x) for x in r[vec_col]]
            for r in train.orderBy(id_col).limit(k).collect()
        ]
        centroids = init
        for _ in range(iters):
            C = np.asarray(centroids, dtype=np.float64)
            c2 = (C * C).sum(axis=1)

            def partials(batches):
                # Arrow-native: flatten the list column once per batch
                # (zero-copy to a dim-strided float buffer) instead of
                # one np.asarray per ROW — the per-row conversion was
                # the iteration's dominant cost at 200k vectors
                # (~3x, SCALE.md §6h). Accumulation stays per
                # partition in row order, so centroids are
                # bit-identical to the pandas form.
                import pyarrow as pa

                S = np.zeros((k, dim))
                n = np.zeros(k, dtype=np.int64)
                for b in batches:
                    if b.num_rows == 0:
                        continue
                    # ListArray.flatten() silently drops values behind
                    # null list slots, which would mis-shape the batch
                    # matrix (or, worse, reshape cleanly to a wrong
                    # dimensionality); the old per-row np.asarray failed
                    # loudly on a null vector, so keep that contract.
                    if b.column(0).null_count:
                        raise ValueError(
                            "train_centroids: null embedding in training set"
                        )
                    flat = (
                        b.column(0)
                        .flatten()
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    )
                    # reshape against the KNOWN dim: a ragged/short
                    # vector then always raises instead of silently
                    # folding into a wrong row count
                    V = flat.reshape(b.num_rows, dim)
                    d2 = (V * V).sum(1, keepdims=True) - 2.0 * (V @ C.T) + c2[None, :]
                    cid = d2.argmin(1)
                    np.add.at(n, cid, 1)
                    np.add.at(S, cid, V)
                nz = np.nonzero(n)[0]
                if len(nz):
                    yield pa.record_batch(
                        [
                            pa.array(nz.astype("int32"), type=pa.int32()),
                            pa.array(n[nz], type=pa.int64()),
                            pa.array([S[c].tolist() for c in nz],
                                     type=pa.list_(pa.float64())),
                        ],
                        names=["cid", "n", "s"],
                    )

            sums = train.select(vec_col).mapInArrow(
                partials, "cid int, n long, s array<double>"
            ).collect()
            acc: dict[int, np.ndarray] = {}
            cnt: dict[int, int] = {}
            for r in sorted(sums, key=lambda r: r.cid):
                acc[r.cid] = acc.get(r.cid, np.zeros(dim)) + np.asarray(r.s)
                cnt[r.cid] = cnt.get(r.cid, 0) + r.n
            centroids = [
                (acc[c] / cnt[c]).tolist() if c in cnt else centroids[c]
                for c in range(k)
            ]
        return centroids
    finally:
        train.unpersist()


def write_ivf_index(
    spark,
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF layout: vectors under `path`/vectors as parquet
    PARTITIONED BY their nearest-centroid cell, centroids under
    `path`/centroids. This is the production story SCALE.md §6
    describes, made real: a probed search filters on the partition
    column, so non-probed cells are pruned before any I/O — at 100 TB
    a 4-of-64-cell probe reads ~6% of the corpus bytes."""
    assign, _ = _centroid_kernels(centroids)
    (
        corpus.select(F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cell"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/vectors")
    )
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    # array<double>: centroids must round-trip bit-exactly (assignment
    # boundaries move under a float32 downcast)
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def read_ivf_centroids(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    return [[float(x) for x in r.centroid] for r in rows]


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: load centroids (k×dim, driver-side),
    compute each query's nprobe nearest cells, PRUNE the corpus scan to
    those partitions with a static `cell IN (...)` filter (the probed
    cell set is |Q|×nprobe ints — tiny and known up front), then the
    same broadcast-join + exact-cosine rerank as ivf_topk. The
    partition filter is asserted in tests (PartitionFilters in the
    scan node)."""
    centroids = read_ivf_centroids(spark, path)
    _, probe_maker = _centroid_kernels(centroids)
    q_assigned = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_maker(nprobe)(F.col(vec_col))).alias("cell"),
    )
    probed_cells = sorted({r.cell for r in q_assigned.select("cell").distinct().collect()})
    corpus = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("cell").isin(probed_cells))
        .select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"), "cell")
    )
    scored = (
        corpus.join(F.broadcast(q_assigned), "cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "cos_sim")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: corpus partitioned by nearest centroid (one narrow
    assign pass — in production this is the *write-time* layout:
    partitionBy(cid) parquet, so a probe prunes partitions); each query
    scores only the `nprobe` nearest cells. Exact cosine re-rank within
    candidates, same contract as brute_force_topk. Recall is tunable
    via nprobe; nprobe == len(centroids) degenerates to brute force."""
    assign, probe_maker = _centroid_kernels(centroids)
    c_assigned = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
        assign(F.col(vec_col)).alias("cid"),
    )
    q_assigned = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
        F.explode(probe_maker(nprobe)(F.col(vec_col))).alias("cid"),
    )
    cand = c_assigned.join(F.broadcast(q_assigned), "cid").filter(
        F.col("match_id") != F.col("query_id")
    )
    return rerank_topk(cand, k, qn_col="__qn", cn_col="__cn")


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split `dim` into `m` contiguous subspaces and
    run a deterministic Lloyd's loop on each subvector slice. Returns m
    codebooks of k sub-centroids each — m × k × (dim/m) floats,
    driver-resident like the IVF centroids.

    ALL m subspace k-means run inside the SAME passes: init is one
    collect (k lowest-id vectors, sliced driver-side — identical to
    per-subspace init), and each iteration is one narrow mapInPandas
    emitting ≤m×k (subspace, cid, count, Σsubvector) partial rows per
    partition. m separate trainings would pay m×iters Spark jobs of
    fixed overhead for the same arithmetic (measured 16× fewer jobs →
    ~6× faster at sf0.01). At 100 TB the seeded sample, not the
    corpus, bounds the cost."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    train = vectors.select(id_col, vec_col)
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=42)
    train = train.persist()
    try:
        init_rows = train.orderBy(id_col).limit(k).collect()
        books = [
            [
                [float(x) for x in r[vec_col][mi * sub : (mi + 1) * sub]]
                for r in init_rows
            ]
            for mi in range(m)
        ]
        for _ in range(iters):
            B = np.asarray(books, dtype=np.float64)  # (m, k, sub)

            def partials(batches):
                S = np.zeros((m, k, sub))
                n = np.zeros((m, k), dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                    ).reshape(-1, m, sub)
                    for mi in range(m):
                        d2 = ((X[:, mi, None, :] - B[mi][None, :, :]) ** 2).sum(2)
                        cid = d2.argmin(1)
                        np.add.at(n[mi], cid, 1)
                        np.add.at(S[mi], cid, X[:, mi, :])
                mi_idx, c_idx = np.nonzero(n)
                if len(mi_idx):
                    yield pd.DataFrame(
                        {
                            "mi": mi_idx.astype("int32"),
                            "cid": c_idx.astype("int32"),
                            "n": n[mi_idx, c_idx],
                            "s": [S[a, b].tolist() for a, b in zip(mi_idx, c_idx)],
                        }
                    )

            sums = train.mapInPandas(
                partials, "mi int, cid int, n long, s array<double>"
            ).collect()
            acc: dict[tuple[int, int], np.ndarray] = {}
            cnt: dict[tuple[int, int], int] = {}
            for r in sorted(sums, key=lambda r: (r.mi, r.cid)):
                key = (r.mi, r.cid)
                acc[key] = acc.get(key, np.zeros(sub)) + np.asarray(r.s)
                cnt[key] = cnt.get(key, 0) + r.n
            books = [
                [
                    (acc[(mi, c)] / cnt[(mi, c)]).tolist()
                    if (mi, c) in cnt
                    else books[mi][c]
                    for c in range(k)
                ]
                for mi in range(m)
            ]
        return books
    finally:
        train.unpersist()


def _pq_encode_kernel(codebooks: list[list[list[float]]]):
    """pandas_udf: embedding → array<int> of m code ids, one vectorized
    numpy pass per Arrow batch (no shuffle; encode is a narrow map)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype="float32") for b in codebooks]  # m × (k, sub)
    m = len(books)
    sub = books[0].shape[1]

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        x = np.asarray(vs.tolist(), dtype="float32").reshape(len(vs), m, sub)
        codes = np.empty((len(vs), m), dtype="int32")
        for mi in range(m):
            # (n, 1, sub) - (1, k, sub) → argmin over k
            d = ((x[:, mi, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d.argmin(axis=1)
        return pd.Series(codes.tolist())

    return encode


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): the corpus compressed to m small ints per vector —
    the at-rest ANN representation (dim × 4 bytes → m bytes-ish). At
    100 TB this is the write-once layout; searches never touch the raw
    vectors until a final re-rank."""
    return corpus.select(
        F.col(id_col).alias("match_id"),
        _pq_encode_kernel(codebooks)(F.col(vec_col)).alias("__codes"),
    )


def pq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes, PURE CATALYST on
    the scan side: each query precomputes its m × k_codes distance
    table driver-side (tiny numpy), the tables enter the plan as one
    broadcast literal, and the per-row approximate distance is an
    `aggregate(sequence(...))` fold of m element_at lookups — whole-
    stage codegen over the compressed corpus, no Python in the scan.
    Returns (query_id, match_id, rank, approx_dist); ties by match_id.
    Compressed-domain recall is tunable via m/k_codes (tested floor in
    tests/test_pq.py); production re-ranks the top-k' with exact
    distances like ivf_topk."""
    import numpy as np

    books = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(books)
    k_codes = books[0].shape[0]
    sub = books[0].shape[1]

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    tables = []  # per query: flat m*k_codes distance table
    q_ids = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype="float64").reshape(m, sub)
        t = ((qv[:, None, :] - np.stack(books)) ** 2).sum(axis=2)  # (m, k_codes)
        tables.append([float(x) for x in t.ravel()])
        q_ids.append(r[id_col])

    tables_lit = F.array(*[F.array(*[F.lit(x) for x in t]) for t in tables])
    q = F.broadcast(
        corpus_codes.sparkSession.createDataFrame(
            [(int(i), int(qid)) for i, qid in enumerate(q_ids)], "q_idx int, query_id bigint"
        )
    )
    table_for_q = F.element_at(tables_lit, F.col("q_idx") + 1)
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(
            table_for_q, i * k_codes + F.element_at(F.col("__codes"), i + 1) + 1
        ),
    )
    scored = (
        corpus_codes.crossJoin(q)
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("approx_dist", F.round(dist, 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("approx_dist").asc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "approx_dist")
    )


def pq_topk_reranked(
    queries: DataFrame,
    corpus: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ pipeline: ADC over the compressed corpus
    produces a `shortlist` of candidates per query (pure-codegen scan
    of m-byte codes), then ONLY those candidates fetch their raw
    vectors (a semi-join-shaped inner join — at 100 TB this is the
    point: the full-precision corpus is touched for shortlist × |Q|
    rows, not |corpus|) and exact L2 re-ranks the final top-k.
    Returns (query_id, match_id, rank, l2_dist); ties by match_id.
    Recall = the shortlist's recall (measured 0.9 @ shortlist=50,
    m=16, k_codes=16 on the synthetic embeddings — tests/test_pq.py)."""
    short = pq_topk(queries, corpus_codes, codebooks, k=shortlist, id_col=id_col, vec_col=vec_col)
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("__qv"),
            F.col("__cv"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        short.select("query_id", "match_id")
        .join(c, "match_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("l2_dist", F.round(l2, 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2_dist").asc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", "l2_dist")
    )


def arrow_cosine_scores(
    corpus: DataFrame,
    query_vec,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """mapInArrow cosine-scoring kernel — the third and lowest-overhead
    rung of the Python ladder (§2.10): row-at-a-time UDF (never used
    here) → Arrow-batched pandas (multimodal tier, IVF kernels) →
    RAW ARROW BATCHES with zero pandas materialization. Each
    RecordBatch's list<float> column is flattened once into a
    (rows × dim) numpy view and scored with one BLAS matvec; only
    (id, score) flows back. For a pure numeric kernel this skips
    pandas' block manager entirely — the shape to reach for when the
    per-batch work is one vectorized call.

    Float contract: scores are float64 accumulated by BLAS, which can
    differ from the Catalyst aggregate-fold path in the last ulps —
    equivalence to the expression kernel is asserted to 1e-9 (not
    bit-exact) in tests/test_arrow.py. Use ONE kernel per pipeline for
    reproducibility; this exists as the fast path, the expression path
    stays the oracle-exact one."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            emb = b.column(vec_col)
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            m = flat.reshape(b.num_rows, -1)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            s = (m @ q) / (norms * qn)
            yield pa.record_batch(
                [b.column(id_col), pa.array(s, type=pa.float64())],
                names=[id_col, "score"],
            )

    return corpus.select(id_col, vec_col).mapInArrow(
        kernel, f"{id_col} long, score double"
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication: cluster, then near-dup within cell
# ---------------------------------------------------------------------------


def semantic_dedup(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023 SemDeDup tier): k-means
    partitions the embedding space, then near-duplicates are resolved
    WITHIN each cell by greedy keep-lowest-id — every vector whose
    cosine similarity to an already-kept vector in its cell reaches
    `threshold` is dropped and records which keeper it duplicates.

    Scale shape: the quadratic step is confined to single cells — one
    shuffle on `cell`, per-cell matrices on executors via grouped-map
    applyInPandas (never a corpus-wide self-join), incremental
    kept-matrix dot products inside the kernel. Cell population at
    100 TB is |corpus|/k with k sized so a cell fits an executor
    (k ~ 10⁵ for 10⁹ docs); `max_cell_size` is the deterministic skew
    guard (keeps the lowest-id members, same contract as
    dedup.bucket_pairs). Determinism: centroid training is
    deterministic (train_centroids), assignment is by value, the
    within-cell scan is id-ordered, and the keeper is the FIRST kept
    match in id order — no tie depends on partitioning.

    Returns (id, cell, keep, duplicate_of): `keep` partitions the
    input; duplicate_of is null iff keep."""
    cents = train_centroids(
        vectors, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    assign, _ = _centroid_kernels(cents)
    assigned = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).withColumn("cell", assign(F.col("__v")))

    thr = float(threshold)
    cap = max_cell_size

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        if cap is not None:
            pdf = pdf.iloc[:cap]
        V = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt((V * V).sum(1))
        norms[norms == 0.0] = 1.0
        V = V / norms[:, None]
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        kept_rows: list[int] = []
        # Blocked greedy, value-identical to the row-at-a-time scan:
        # per block, ONE gemm scores every row against all vectors
        # kept BEFORE the block; the per-row loop then only has to
        # check that precomputed column plus the (small) set kept
        # WITHIN the block so far. Every pre-block keeper has a
        # smaller id than every intra-block keeper, so "first kept
        # match in id order" is preserved exactly. Measured ~5x on
        # 12.5k-row cells vs one matvec per row (sf10, SCALE.md §6h).
        B = 512
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            pre = kept_rows.copy()
            pre_sims = (V[pre] @ V[lo:hi].T) if pre else None
            block_kept: list[int] = []
            for i in range(lo, hi):
                hit = -1
                if pre:
                    hits = np.nonzero(pre_sims[:, i - lo] >= thr)[0]
                    if len(hits):
                        hit = pre[int(hits[0])]
                if hit < 0 and block_kept:
                    sims = V[block_kept] @ V[i]
                    hits = np.nonzero(sims >= thr)[0]
                    if len(hits):
                        hit = block_kept[int(hits[0])]
                if hit >= 0:
                    keep[i] = False
                    dup_of[i] = pdf["id"].iloc[hit]
                else:
                    block_kept.append(i)
            kept_rows.extend(block_kept)
        out = pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "keep": keep,
                "duplicate_of": dup_of,
            }
        )
        out["duplicate_of"] = out["duplicate_of"].astype("object")
        out.loc[keep, "duplicate_of"] = None
        return out

    return assigned.groupBy("cell").applyInPandas(
        dedup_cell, "id long, cell int, keep boolean, duplicate_of long"
    )
