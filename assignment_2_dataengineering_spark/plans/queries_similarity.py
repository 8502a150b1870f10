"""Similarity-search queries over the `embeddings` table (array<float>
column, dim 64): exact brute-force cosine top-k (the baseline), the
LSH-bucketed approximate path, and embedding-cosine near-dup pairs.

The brute-force oracle mirrors the fold exactly: DuckDB sums
double-casted products left-to-right in list order, as does Spark's
`aggregate`, so results match to the last bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..sources.tables import load_table
from .registry import register

_N_QUERIES = 5
_TOP_K = 10

# DuckDB scalar macros for dot/norm over FLOAT[] in double precision.
_COS_SQL = """
        round(
          list_sum(list_transform(range(1, len(q.embedding) + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
          / nullif(
              sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1),
                   i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))),
              0.0),
          6)
"""


@register(
    "q_ann_bruteforce",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT * FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                  {_COS_SQL} AS cos_sim
           FROM q JOIN c ON c.vec_id <> q.vec_id
         )
    SELECT query_id, match_id, CAST(rank AS INTEGER) AS rank, cos_sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, match_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
    tags=("similarity",),
    bench=True,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 vectors as queries: broadcast
    the query set, scan the corpus once, per-query partial top-k. The
    correctness baseline for the ANN path, and the right plan whenever
    |queries| is small — even against a 100 TB corpus it is one scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return SIM.brute_force_topk(queries, emb, k=_TOP_K)


@register(
    "q_ann_lsh",
    oracle=None,  # approximate candidates → rows-only; recall ≥ 0.6 vs brute force asserted in tests/test_dedup.py
    tags=("similarity",),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH (24 planes, 8 bands)
    + exact rerank — the scale path when the query side is also huge:
    candidates come from bucket-co-partitioned joins instead of a cross
    product. Recall ≥ 0.6 against q_ann_bruteforce is asserted in
    tests/test_dedup.py::test_lsh_topk_recall_vs_bruteforce."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return SIM.lsh_topk(queries, emb, k=_TOP_K)


@register(
    "q_dedup_embedding",
    oracle=None,  # LSH candidate generation → rows-only; subset-of-bruteforce asserted in tests/test_dedup.py
    tags=("dedup", "similarity"),
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidates
    verified by exact cosine — dedup modality #5. Output ⊆ brute-force
    pairs at the same threshold, asserted in tests/test_dedup.py::
    test_embedding_near_dupes_subset_of_bruteforce. Production near-dup
    threshold would be ~0.9; the synthetic corpus's max pairwise cosine
    is ~0.51, so the query uses 0.45 to produce a non-empty, checkable
    result set."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_near_dupes(emb, threshold=0.45)


@register(
    "q_ann_ivf",
    oracle=None,  # iterative k-means training → rows-only; recall + degeneracy invariants in tests/test_ivf.py
    tags=("similarity",),
    bench=True,  # iterative training + probe path
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic k-means coarse quantizer
    (16 cells, 5 iterations), corpus partitioned by cell, queries probe
    their 4 nearest cells, exact cosine re-rank within candidates. The
    production layout writes the corpus partitionBy(cell) so probes
    prune partitions before I/O (SCALE.md §6)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.train_centroids(emb, k=16, iters=5)
    q = emb.filter(F.col("vec_id") < 5)
    return SIM.ivf_topk(q, emb, cents, k=10, nprobe=4)


@register(
    "q_ann_pq",
    oracle=None,  # trained codebooks → rows-only; recall floor + code-domain invariants in tests/test_pq.py
    tags=("similarity",),
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, full production shape: 64-dim vectors
    compressed to 16 code ids (16 subspaces × 16 sub-centroids,
    deterministic per-subspace k-means), asymmetric-distance scan in
    pure codegen (each query's m×k distance table is a broadcast
    literal; per-row distance = Σ table[m][code_m] element_at fold)
    produces a 50-candidate shortlist, and only the shortlist touches
    the raw vectors for the exact-L2 re-rank — at 100 TB the
    full-precision corpus is read for |Q|×50 rows, not |corpus|.
    Recall ≥ 0.8 vs exact L2 pinned in tests/test_pq.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = SIM.train_pq_codebooks(emb, m=16, k=16, iters=3)
    codes = SIM.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    return SIM.pq_topk_reranked(q, emb, codes, books, k=_TOP_K, shortlist=50)


@register(
    "q_grouped_pca",
    oracle=None,  # SVD is not SQL-expressible; invariants in tests/test_decompose.py
    tags=("similarity", "udf"),
)
def q_grouped_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal components of the embedding population of each
    label group (operators/decompose.py grouped_pca): the grouped-map
    applyInPandas seam — sorted-stack determinism, sign-fixed LAPACK
    SVD, one Arrow round-trip per group. Scale shape: per-group
    matrices on executors, never a global single-task SVD.

    The registered result posexplodes the component vector into scalar
    (label, component, dim, loading) rows: the driver's rows-only
    canonicalizer sorts result columns pandas-side, and array cells are
    unhashable there — scalar projection keeps the check meaningful
    (it pins k×dim rows per group, not an opaque array blob)."""
    from ..operators.decompose import grouped_pca

    emb = load_table(spark, sf_dir, "embeddings")
    comps = grouped_pca(emb, "label", "embedding", "vec_id", k=2)
    return comps.select(
        "label",
        "component",
        F.round("explained_ratio", 6).alias("explained_ratio"),
        F.posexplode("vector").alias("dim", "loading"),
    ).withColumn("loading", F.round("loading", 6))


@register(
    "q_embed_quantize",
    oracle="""
    WITH ex AS (
        SELECT vec_id, CAST(u.dim AS INTEGER) AS dim, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT vec_id,
                   unnest(list_transform(
                       range(len(embedding)),
                       i -> struct_pack(dim := i, v := embedding[i + 1])
                   )) AS u
            FROM embeddings WHERE vec_id < 50)
    ),
    stats AS (SELECT vec_id, min(v) AS mn, max(v) AS mx FROM ex GROUP BY vec_id)
    SELECT e.vec_id, e.dim,
           CAST(floor((e.v - s.mn) * (255.0 / nullif(s.mx - s.mn, 0)) + 0.5)
                AS INTEGER) AS code,
           round(s.mn, 6) AS vmin,
           round(255.0 / nullif(s.mx - s.mn, 0), 6) AS scale
    FROM ex e JOIN stats s USING (vec_id)
    """,
    tags=("similarity", "quantize"),
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8-range scalar quantization of embeddings — the
    4× storage compression every large vector store applies before ANN
    (code = round-half-up of (v − min)·255/(max − min), plus the
    (vmin, scale) pair needed to dequantize). All-Catalyst: min/max as
    window-free grouped stats joined back, floor(x + 0.5) instead of
    round() because both engines compute the identical double x, while
    native round() half-rules differ. Floats are cast to double BEFORE
    arithmetic so promotion order can't diverge. Output is exploded to
    (vec_id, dim, code) scalars — array cells don't survive the
    driver's pandas-side canonicalizer (SURVEY §5)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "__vf")
    ).select("vec_id", "dim", F.col("__vf").cast("double").alias("v"))
    stats = ex.groupBy("vec_id").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    scale = 255.0 / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
    return (
        ex.join(F.broadcast(stats), "vec_id")
        .select(
            "vec_id",
            "dim",
            F.floor((F.col("v") - F.col("mn")) * scale + 0.5)
            .cast("int")
            .alias("code"),
            F.round("mn", 6).alias("vmin"),
            F.round(scale, 6).alias("scale"),
        )
    )


@register(
    "q_semantic_dedup",
    oracle=None,  # clustered greedy resolution → rows-only; invariants in tests/test_semantic_dedup.py
    tags=("similarity", "dedup", "udf"),
    bench=True,  # iterative training + grouped-map family
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-tier semantic deduplication over `embeddings`
    (operators/similarity.py semantic_dedup): deterministic k-means
    cells, greedy keep-lowest-id within each cell at a cosine
    threshold. The quadratic work is cell-confined (one shuffle on
    cell, grouped applyInPandas kernel) — never a corpus self-join.
    The synthetic embeddings carry no true near-dups (max pairwise
    cosine ≈ 0.51 at sf0.01), so the registered threshold sits at 0.45
    to exercise the drop path on real data; production semantics
    (≥ 0.9 duplicates) are pinned on constructed-duplicate fixtures in
    tests/test_semantic_dedup.py: keep/drop partitions the input,
    every drop's exact cosine to its keeper ≥ threshold, keeper ids
    precede their duplicates, and single-cell mode reproduces the
    brute-force greedy result."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, k=16, iters=3, threshold=0.45).orderBy("id")


@register(
    "q_label_centroids",
    oracle="""
    SELECT label, CAST(u.dim AS INTEGER) AS dim,
           round(avg(u.v), 6) AS mean_v,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM (
        SELECT label,
               unnest(list_transform(
                   range(len(embedding)),
                   i -> struct_pack(dim := i, v := CAST(embedding[i + 1] AS DOUBLE))
               )) AS u
        FROM embeddings
    )
    GROUP BY label, u.dim
    """,
    tags=("similarity", "agg"),
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids) — the vector
    aggregation behind prototype classifiers, semantic-dedup seeding,
    and embedding-drift monitoring. Scalar output shape (label, dim,
    mean, n): posexplode fans each vector into dim rows BEFORE the
    shuffle, so the aggregate is an ordinary (label, dim)-keyed
    hash agg with map-side partials — no collect_list of whole vectors,
    no single-task reduce. Floats cast to double at the leaf so both
    engines average identical values; 6dp round on the mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    return ex.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
    )


@register(
    "q_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
         c AS (SELECT * FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, q.label AS query_label,
                  c.vec_id AS neg_id, c.label AS neg_label,
                  {_COS_SQL} AS cos_sim
           FROM q JOIN c ON c.label <> q.label
         )
    SELECT query_id, query_label, neg_id, neg_label,
           CAST(rank AS INTEGER) AS rank, cos_sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neg_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    tags=("similarity", "training"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — for each anchor, the most similar vectors
    carrying a DIFFERENT label (top-3 by exact cosine): the contrastive-
    training data-prep step (hard negatives are what make embedding
    fine-tuning work; random negatives are too easy). Same plan family
    as q_ann_bruteforce — broadcast the small anchor set, scan the
    corpus once with the label-inequality predicate applied IN the join
    (never materializing same-label pairs), per-anchor partial top-k.
    At 100 TB with a large anchor set this upgrades to the LSH/IVF
    candidate tiers with a post-filter on label — the exact form here
    is the recall oracle for those."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 20)
    from ..functions.vectors import cosine

    a = anchors.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("__qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("__cv"),
    )
    scored = (
        F.broadcast(a)
        .join(c, F.col("neg_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "neg_id",
            "neg_label",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "query_label", "neg_id", "neg_label", "rank", "cos_sim")
    )


def _cos_sliced_sql(d: int) -> str:
    """Cosine over the first `d` dims, double precision, 6dp round —
    the sliced twin of _COS_SQL (same fold order)."""
    return f"""
        round(
          list_sum(list_transform(range(1, {d} + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
          / nullif(
              sqrt(list_sum(list_transform(range(1, {d} + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, {d} + 1),
                   i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))),
              0.0),
          6)
"""


_MATRYOSHKA_DIMS = (8, 16, 32, 64)


def _matryoshka_oracle() -> str:
    base = f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT * FROM embeddings),
         full_topk AS (
           SELECT query_id, match_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                    row_number() OVER (PARTITION BY q.vec_id
                                       ORDER BY {_cos_sliced_sql(64)} DESC,
                                                c.vec_id ASC) AS rank
             FROM q JOIN c ON c.vec_id <> q.vec_id
           ) WHERE rank <= {_TOP_K}
         )"""
    per_dim = []
    for d in _MATRYOSHKA_DIMS:
        per_dim.append(
            f"""
         t{d} AS (
           SELECT query_id, match_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                    row_number() OVER (PARTITION BY q.vec_id
                                       ORDER BY {_cos_sliced_sql(d)} DESC,
                                                c.vec_id ASC) AS rank
             FROM q JOIN c ON c.vec_id <> q.vec_id
           ) WHERE rank <= {_TOP_K}
         ),
         r{d} AS (
           SELECT {d} AS trunc_dim, f.query_id,
                  CAST(count(t.match_id) AS BIGINT) AS n_overlap,
                  round(count(t.match_id) / {_TOP_K}.0, 2) AS recall
           FROM full_topk f LEFT JOIN t{d} t
             ON f.query_id = t.query_id AND f.match_id = t.match_id
           GROUP BY f.query_id
         )"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT trunc_dim, query_id, n_overlap, recall FROM r{d}"
        for d in _MATRYOSHKA_DIMS
    )
    return base + "," + ",".join(per_dim) + "\n" + union


@register(
    "q_matryoshka",
    oracle=_matryoshka_oracle(),
    tags=("similarity", "eval"),
)
def q_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation: recall@10 of cosine top-k over
    the first d ∈ {8,16,32,64} embedding dims against the full-dim
    ranking — the measurement that tells you how far you can shrink
    vectors (and the ANN index with them) before retrieval degrades.
    Truncation is F.slice (JVM), every tier reuses the broadcast-query
    brute-force plan, and recall is a per-query join-count — the whole
    sweep is |dims| corpus scans, no quadratic blowup. The d=64 row is
    the self-check (recall 1.0 by construction).

    Round-10 measured non-change: checkpointing the 4×-consumed
    full-dim reference (corpus scans 10 → 5 in the executed plan) lost
    the interleaved A/B at both tiers (sf0.1 1.56→1.72 s, sf10
    4.58→5.21 s) — the redundant reference scans execute as parallel
    stages inside each tier's job, while the eager checkpoint
    serializes a reference job in front of the sweep (q_lm_score's
    materialization mechanism). Left lazy deliberately; measurement in
    OPTIMIZATION_r10.md."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    full = SIM.brute_force_topk(queries, emb, k=_TOP_K).select("query_id", "match_id")
    out = None
    for d in _MATRYOSHKA_DIMS:
        trunc = lambda df: df.withColumn("embedding", F.slice("embedding", 1, d))
        topd = SIM.brute_force_topk(trunc(queries), trunc(emb), k=_TOP_K).select(
            "query_id", F.col("match_id").alias("m_id")
        )
        rec = (
            full.join(
                topd,
                (full["query_id"] == topd["query_id"])
                & (full["match_id"] == topd["m_id"]),
                "left",
            )
            .groupBy(full["query_id"])
            .agg(
                F.count("m_id").alias("n_overlap"),
                F.round(F.count("m_id") / F.lit(float(_TOP_K)), 2).alias("recall"),
            )
            .select(
                F.lit(d).alias("trunc_dim"), "query_id", "n_overlap", "recall"
            )
        )
        out = rec if out is None else out.unionByName(rec)
    return out


@register(
    "q_rank_of_truth",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT * FROM embeddings),
         truth AS (
           SELECT query_id, match_id AS true_top1 FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                    row_number() OVER (PARTITION BY q.vec_id
                                       ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rank
             FROM q JOIN c ON c.vec_id <> q.vec_id
           ) WHERE rank = 1
         ),
         t16 AS (
           SELECT query_id, match_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                    row_number() OVER (PARTITION BY q.vec_id
                                       ORDER BY {{cos16}} DESC, c.vec_id ASC) AS rank
             FROM q JOIN c ON c.vec_id <> q.vec_id
           ) WHERE rank <= {_TOP_K}
         )
    SELECT truth.query_id, truth.true_top1,
           CAST(coalesce(t16.rank, 0) AS INT) AS rank_in_trunc16
    FROM truth LEFT JOIN t16
      ON truth.query_id = t16.query_id AND truth.true_top1 = t16.match_id
    """.replace("{cos16}", _cos_sliced_sql(16)),
    tags=("similarity", "eval"),
)
def q_rank_of_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does the TRUE nearest neighbor land in the 16-dim
    truncated ranking? (0 = outside the top-10.) The integer-exact
    companion to q_matryoshka's recall: per-query rank positions
    instead of set overlap, from which MRR is one reader-side division
    — keeping the stored metric integer sidesteps cross-engine
    reciprocal-sum rounding entirely. Same broadcast-query brute-force
    plans; one extra join of two 5-row tables."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    truth = (
        SIM.brute_force_topk(queries, emb, k=1)
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("match_id").alias("true_top1"))
    )
    trunc = lambda df: df.withColumn("embedding", F.slice("embedding", 1, 16))
    t16 = SIM.brute_force_topk(trunc(queries), trunc(emb), k=_TOP_K).select(
        F.col("query_id").alias("q2"), "match_id", "rank"
    )
    return truth.join(
        t16,
        (truth["query_id"] == t16["q2"]) & (truth["true_top1"] == t16["match_id"]),
        "left",
    ).select(
        "query_id",
        "true_top1",
        F.coalesce(F.col("rank"), F.lit(0)).cast("int").alias("rank_in_trunc16"),
    )


# ---------------------------------------------------------------------------
# Driver-green verification companions for the randomized ANN tier
# (round-3 verdict item 5): each runs the SAME engine code path the
# randomized query uses, but over a DETERMINISTIC, SQL-expressible
# candidate set — so every ANN/dedup family has at least one row the
# driver can check hash-exact against DuckDB. The randomized banding
# itself stays invariant-tested (recall floors, subset-of-bruteforce) in
# tests/test_dedup.py / test_ivf.py.
# ---------------------------------------------------------------------------


@register(
    "q_ann_lsh_rerank",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                  {_COS_SQL} AS cos_sim
           FROM q JOIN embeddings c
             ON c.vec_id % 16 = q.vec_id % 16 AND c.vec_id <> q.vec_id
         )
    SELECT query_id, match_id, CAST(rank AS INTEGER) AS rank, cos_sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, match_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
    tags=("similarity",),
)
def q_ann_lsh_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_lsh's exact-rerank stage (operators/similarity.rerank_topk
    — the shared tail of brute-force/LSH/IVF) driven over a
    deterministic candidate table: corpus vectors in the query's mod-16
    id class stand in for the LSH bucket collisions. Hash-exact against
    the same candidate predicate + cosine + row_number in DuckDB —
    proving the rerank/tiebreak/rounding contract the randomized
    bucketing feeds into."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    ).filter(F.col("query_id") < _N_QUERIES)
    c = emb.select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("__cv")
    )
    cand = c.join(
        F.broadcast(q),
        (F.col("match_id") % 16 == F.col("query_id") % 16)
        & (F.col("match_id") != F.col("query_id")),
    )
    return SIM.rerank_topk(cand, k=_TOP_K)


@register(
    "q_dedup_embedding_verify",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS id_a, c.vec_id AS id_b,
               {_COS_SQL} AS cos_sim
        FROM embeddings q JOIN embeddings c
          ON c.vec_id % 16 = q.vec_id % 16 AND q.vec_id < c.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.35
    """,
    tags=("dedup", "similarity"),
)
def q_dedup_embedding_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_embedding's exact-cosine verification stage over a
    deterministic candidate set (mod-16 id classes instead of LSH
    buckets): candidate pairs id_a < id_b scored with the SAME cosine
    expression + 6dp rounding + threshold the LSH path verifies with.
    Hash-exact in DuckDB — the verify half of dedup modality #5 gets a
    green driver row; the banding half keeps its subset-of-bruteforce
    invariant in tests/test_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the class is an EXPLICIT join column: left as a predicate
    # (id_a % 16 == id_b % 16) Spark planned a nested-loop join over
    # all |corpus|^2 pairs (measured 8.2 s at sf0.1 vs 0.9 s hashed)
    from ..functions.vectors import dot, norm

    # norms are computed ONCE per vector before the join (narrow
    # projection) instead of once per candidate pair — identical
    # doubles (same fold over the same array), ~3x less expression
    # work on the pair stream
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") % 16).alias("cls"),
        F.col("embedding").alias("__va"),
        norm(F.col("embedding")).alias("__na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        (F.col("vec_id") % 16).alias("cls"),
        F.col("embedding").alias("__vb"),
        norm(F.col("embedding")).alias("__nb"),
    )
    cos = dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        a.join(b, "cls")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        # 0.35 (vs the LSH query's 0.45): the synthetic corpus's max
        # within-class cosine at sf0.01 is ~0.44 — this keeps the
        # driver row non-empty (13 pairs) at its check scale
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
    )


_L2_SQL = """
        list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        - 2 * list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ct.cv[i] AS DOUBLE)))
        + list_sum(list_transform(range(1, len(ct.cv) + 1),
                 i -> CAST(ct.cv[i] AS DOUBLE) * CAST(ct.cv[i] AS DOUBLE)))
"""


@register(
    "q_ann_ivf_probe",
    oracle=f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                   WHERE vec_id < 16),
         cd AS (
           SELECT e.vec_id, e.embedding, ct.cid, {_L2_SQL} AS d
           FROM embeddings e CROSS JOIN cents ct
         ),
         asgn AS (
           SELECT vec_id AS match_id, embedding, cid FROM (
             SELECT vec_id, embedding, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d ASC, cid ASC) AS rn
             FROM cd
           ) WHERE rn = 1
         ),
         probes AS (
           SELECT vec_id AS query_id, embedding, cid FROM (
             SELECT vec_id, embedding, cid,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d ASC, cid ASC) AS rn
             FROM cd WHERE vec_id < {_N_QUERIES}
           ) WHERE rn <= 4
         ),
         scored AS (
           SELECT q.query_id, c.match_id, {_COS_SQL} AS cos_sim
           FROM probes q JOIN asgn c USING (cid)
           WHERE c.match_id <> q.query_id
         )
    SELECT query_id, match_id, CAST(rank AS INTEGER) AS rank, cos_sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, match_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
    tags=("similarity",),
)
def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_ivf's PROBE path (operators/similarity.ivf_topk: numpy
    assignment kernel → cell-partitioned candidates → shared rerank)
    with FIXED centroids — the first 16 corpus vectors — instead of
    k-means-trained ones, which makes cell assignment SQL-expressible:
    the oracle recomputes argmin-L2 assignment (same v·v − 2v·c + c·c
    algebra as the kernel, same (distance, cid) tiebreak), the 4-cell
    probe, and the cosine rerank. Hash-exact — the entire IVF serving
    path gets a green driver row; only k-means TRAINING stays
    invariant-tested (tests/test_ivf.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    return SIM.ivf_topk(q, emb, cents, k=_TOP_K, nprobe=4)


def _sq4_sql(vexpr: str, cexpr: str, cast: str) -> str:
    """4-term squared-distance sum between a subvector slice and a
    codebook entry, written as an explicit left-associated chain so the
    float addition order matches numpy's sequential reduce over the
    sub-axis. `cast` = '' keeps parquet FLOAT arithmetic (the encode
    kernel runs in float32); 'DOUBLE' mirrors the driver-side float64
    ADC tables."""
    terms = []
    for i in range(1, 5):
        v = f"{vexpr}[ct.mi * 4 + {i}]"
        c = f"ct.cv[{i}]"
        if cast:
            v, c = f"CAST({v} AS {cast})", f"CAST({c} AS {cast})"
        terms.append(f"(({v}) - ({c})) * (({v}) - ({c}))")
    return " + ".join(terms)


@register(
    "q_ann_pq_adc",
    oracle=f"""
    WITH mi AS (SELECT unnest(range(0, 16)) AS mi),
         cb AS (
           SELECT mi.mi, e.vec_id AS cid,
                  [e.embedding[mi.mi * 4 + 1], e.embedding[mi.mi * 4 + 2],
                   e.embedding[mi.mi * 4 + 3], e.embedding[mi.mi * 4 + 4]] AS cv
           FROM embeddings e, mi WHERE e.vec_id < 16
         ),
         encd AS (
           SELECT v.vec_id, ct.mi, ct.cid, {_sq4_sql("v.embedding", "ct.cv", "")} AS d
           FROM embeddings v CROSS JOIN cb ct
         ),
         codes AS (
           SELECT vec_id, mi, cid FROM (
             SELECT vec_id, mi, cid,
                    row_number() OVER (PARTITION BY vec_id, mi
                                       ORDER BY d ASC, cid ASC) AS rn
             FROM encd
           ) WHERE rn = 1
         ),
         qt AS (
           SELECT qv.vec_id AS query_id, ct.mi, ct.cid,
                  {_sq4_sql("qv.embedding", "ct.cv", "DOUBLE")} AS t
           FROM embeddings qv CROSS JOIN cb ct WHERE qv.vec_id < {_N_QUERIES}
         ),
         adc AS (
           SELECT qt.query_id, codes.vec_id AS match_id,
                  round(list_sum(list(qt.t ORDER BY qt.mi)), 6) AS approx_dist
           FROM codes JOIN qt ON qt.mi = codes.mi AND qt.cid = codes.cid
           WHERE codes.vec_id <> qt.query_id
           GROUP BY 1, 2
         ),
         short AS (
           SELECT query_id, match_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY approx_dist ASC, match_id ASC) AS rn
             FROM adc
           ) WHERE rn <= 50
         ),
         scored AS (
           SELECT s.query_id, s.match_id,
                  round(list_sum(list_transform(range(1, 65),
                        i -> (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))
                           * (CAST(q.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)))),
                        6) AS l2_dist
           FROM short s
           JOIN embeddings q ON q.vec_id = s.query_id
           JOIN embeddings c ON c.vec_id = s.match_id
         )
    SELECT query_id, match_id, CAST(rank AS INTEGER) AS rank, l2_dist
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2_dist ASC, match_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
    tags=("similarity",),
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_pq's full serving path — float32 encode kernel, broadcast-
    literal ADC tables folded in pure codegen, top-50 shortlist, exact-
    L2 re-rank — with FIXED codebooks (subvector slices of the first 16
    corpus vectors) instead of k-means-trained ones, which makes every
    stage SQL-expressible: the oracle recomputes the float32 per-
    subspace argmin (same left-associated 4-term sums and (d, cid)
    tiebreak as the numpy kernel), the float64 distance tables, the
    mi-ordered ADC fold, and both ranked cuts. Hash-exact — the
    compressed-domain ANN family gets a green driver row; codebook
    TRAINING keeps its recall-floor invariants (tests/test_pq.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    books = [
        [[float(x) for x in r["embedding"][mi * 4 : (mi + 1) * 4]] for r in init]
        for mi in range(16)
    ]
    codes = SIM.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    return SIM.pq_topk_reranked(q, emb, codes, books, k=_TOP_K, shortlist=50)
