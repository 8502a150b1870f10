"""Corpus-preparation queries over `documents` — the second tier of
training-data-pipeline operators (beyond queries_text's per-doc signals
and queries_text/queries_similarity's dedup): character-entropy
gibberish detection, eval-set decontamination, and token-budget
sequence packing.

Every query here is a pure Catalyst plan with an exact DuckDB oracle.
The reference (a pandas/paho NEM dashboard) has no corpus surface;
these extend the engine toward what a 100 TB pretraining pipeline
actually runs, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
    ),
    cnt AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
    tot AS (
        SELECT doc_id, sum(c) AS total, sum(c * log2(c)) AS s FROM cnt GROUP BY 1
    )
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_chars,
           round((total * log2(total) - s) / total, 4) AS entropy
    FROM tot
    """,
    tags=("text", "quality"),
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish / encoding-garbage detector (low entropy = repeated
    filler, high = random bytes). Computed distributed: explode chars →
    per-(doc, char) count (shuffle 1, map-side combined) → per-doc
    reduction (shuffle 2, tiny). Uses the algebraic identity
    H = (C·log2 C − Σ c·log2 c)/C so both engines sum the same terms.
    Linear in corpus size; no per-row O(alphabet²) expression trees."""
    d = T(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch")
    )
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    s = F.sum(F.col("c") * F.log2("c"))
    return cnt.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_chars"),
        F.round((total * F.log2(total) - s) / total, 4).alias("entropy"),
    )


# Eval-set membership: every 97th doc stands in for a held-out benchmark
# suite. Real pipelines load the eval shingle set from the benchmark
# files; the plan shape (tiny broadcast side) is identical.
_EVAL_MOD = 97
_DECON_N = 5


@register(
    "q_decontaminate",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(w) - {_DECON_N - 2}),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                           w[i+3] || ' ' || w[i+4])) AS shingle
        FROM words WHERE len(w) >= {_DECON_N}
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0)
    SELECT s.doc_id, count(*) AS n_shared
    FROM sh s JOIN ev USING (shingle)
    WHERE s.doc_id % {_EVAL_MOD} <> 0
    GROUP BY 1
    """,
    tags=("text", "dedup"),
    bench=True,  # broadcast-probe family in the headline set
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 5-gram with the eval set (the n-gram-overlap rule used for
    pretraining-corpus decontamination). Plan: distinct shingles per
    doc (explode→distinct, 1 shuffle), eval side reduced to a distinct
    shingle set and BROADCAST — eval suites are tiny (KBs–MBs) next to
    a 100 TB corpus, so the training side never shuffles for the probe;
    contamination is a map-side hash-join followed by one count
    aggregation on doc_id.

    The token array is materialized behind an explode(array(x)) Generate
    barrier before shingling (operators/dedup.py _with_shingle_set
    pattern): shingles_from_tokens references the token array 5× per
    shingle position via element_at, and CollapseProject would otherwise
    inline the split() so every reference re-splits the text — measured
    22 s → ~3 s at sf0.1."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array(TX.tokens_ws(F.col("text")))).alias("__w")
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(TX.shingles_from_tokens(F.col("__w"), _DECON_N)).alias("shingle"),
        )
        .distinct()
    )
    ev = (
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


_PACK_BUDGET = 2048


@register(
    "q_sequence_pack",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / {_PACK_BUDGET}) AS BIGINT)
               AS chunk_id
    FROM sized
    WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    """,
    tags=("text", "window"),
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign each document a chunk id by
    its running token offset within its source stream (budget 2048
    whitespace tokens) — the deterministic contiguous packing used to
    build fixed-length pretraining batches. One shuffle on `source`,
    one local sort by doc_id; the window never materializes the frame
    (running sum). Skew note: a single dominant source serializes its
    partition — production sub-buckets the source key (hash(doc_id) %
    k) exactly like stratified sampling, at the cost of k boundary
    chunks per source."""
    d = T(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", TX.token_count_ws(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    off = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return sized.select(
        "doc_id",
        "source",
        "n_tokens",
        off.cast("bigint").alias("start_offset"),
        F.floor(off / _PACK_BUDGET).cast("bigint").alias("chunk_id"),
    )


_TFIDF_TOPK = 5


@register(
    "q_tfidf",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT doc_id, token, tf,
               round(tf * ln((n.n + 1.0) / (dfreq.df + 1.0)), 4) AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
        FROM scored
    )
    SELECT doc_id, token, tf, tfidf FROM ranked WHERE rn <= {_TFIDF_TOPK}
    """,
    tags=("text", "agg"),
    bench=True,  # multi-agg + ranking-window family
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF keywords, top 5 per document (ln((N+1)/(df+1))
    idf): term frequencies and document frequencies are two hash
    aggregations; N arrives as a broadcast scalar (no collect); ranking
    orders by the ROUNDED score then token so the top-k cut is
    deterministic cross-engine. Three shuffles total (tf, df-join,
    doc window) — each keyed, none quadratic. The df table stays
    distributed (a 100 TB corpus vocabulary outgrows broadcast)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens_ws(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _TFIDF_TOPK)
        .drop("__rn")
    )
