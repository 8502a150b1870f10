"""Text-analysis + deduplication queries over the `documents` table —
the training-data-pipeline extensions (language ID, quality scoring,
token counting, fingerprinting, and the text-dedup modalities: exact,
n-gram Jaccard, shingle containment, MinHash-LSH, SimHash).

Oracles mirror every Catalyst expression in DuckDB SQL; the two
randomized-banding operators (MinHash-LSH, SimHash) are verified
rows-only by the driver but covered by pytest invariants
(tests/test_dedup.py): LSH output ⊆ exact-Jaccard output etc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup as DD
from ..operators.tokenize import bpe_oracle_sql, learn_bpe_merges
from ..sources.tables import load_table
from .registry import register


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_STOP_SQL = "('the','a','of','and','to','in','is','it','that','for')"


@register(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id, lang,
           length(text) AS len_chars,
           len(string_split(text, ' ')) AS n_tokens_ws,
           round(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL}))
                 * 1.0 / greatest(len(string_split(text, ' ')), 1), 4) AS stopword_ratio,
           round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                 * 1.0 / greatest(length(text), 1), 4) AS punct_ratio
    FROM documents
    """,
    tags=("text",),
    bench=True,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per document: length, whitespace-token count,
    stopword density, punctuation noise — the cheap pre-filters every
    corpus pipeline runs before expensive model-based scoring. Pure
    codegen expressions: runs at scan speed on 100 TB."""
    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        F.length(t).alias("len_chars"),
        TX.token_count_ws(t).alias("n_tokens_ws"),
        F.round(TX.stopword_ratio(t), 4).alias("stopword_ratio"),
        F.round(TX.punct_ratio(t), 4).alias("punct_ratio"),
    )


@register(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
    tags=("text",),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / punct singletons) — the standard
    sizing metric for training corpora."""
    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count_ws(t).alias("n_ws_tokens"),
        TX.token_count_regex(t).alias("n_bpe_tokens"),
    )


@register(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
    FROM documents
    """,
    tags=("text", "dedup"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: md5 over canonicalized text
    (lowercase, non-alnum→space, squeeze, trim) — the exact-dedup key."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


@register(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(len(list_filter(string_split(text,' '), w -> w IN {_STOP_SQL}))
                     * 1.0 / greatest(len(string_split(text,' ')), 1), 4) AS en_score
        FROM documents
    )
    SELECT doc_id, lang, en_score,
           CASE WHEN en_score >= 0.08 THEN 'en' ELSE 'und' END AS predicted_lang
    FROM scored
    """,
    tags=("text",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-density n-gram scoring): emits the
    en-score and thresholded prediction. The synthetic corpus draws from
    one vocabulary, so the interesting property is determinism of the
    scoring, which the oracle checks exactly."""
    d = T(spark, sf_dir, "documents")
    en = F.round(TX.stopword_ratio(F.col("text"), "en"), 4)
    return d.select(
        "doc_id",
        "lang",
        en.alias("en_score"),
        F.when(en >= 0.08, F.lit("en")).otherwise(F.lit("und")).alias("predicted_lang"),
    )


@register(
    "q_quality_flags",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ),
    sig AS (
        SELECT doc_id, text,
               CASE WHEN len(w) < 2 THEN 0.0
                    ELSE round(1.0 - len(list_distinct(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])))
                               * 1.0 / (len(w) - 1), 4) END AS rep_ratio,
               len(regexp_extract_all(text, 'https?://[^\\s]+'))  AS n_urls,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
               round(len(list_filter(w, x -> x IN {_STOP_SQL}))
                     * 1.0 / greatest(len(w), 1), 4) AS sw_ratio,
               round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                     * 1.0 / greatest(length(text), 1), 4) AS punct
        FROM g
    )
    SELECT doc_id, rep_ratio, n_urls, n_emails,
           CASE WHEN length(text) BETWEEN 50 AND 5000
                 AND sw_ratio >= 0.05 AND rep_ratio <= 0.5 AND punct <= 0.2
                THEN 1 ELSE 0 END AS keep
    FROM sig
    """,
    tags=("text",),
)
def q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop gate: bigram repetition ratio, URL and
    email counts, and a composite keep flag over length band, stopword
    density, repetition, and punctuation noise. Pure codegen — the
    cheap first-pass filter a 100 TB corpus runs before any model-based
    scoring. All signals compared on rounded values so the flag's
    boundary is bit-identical cross-engine.

    The token and bigram arrays are materialized behind chained
    explode(array(x)) Generate barriers (operators/dedup.py
    _with_shingle_set pattern): the repetition signal references its
    gram array three times, which inlined re-splits the text per
    reference — the barriers measured 12.6 s → 3.2 s at sf0.1."""
    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    staged = d.select("doc_id", "text", F.explode(F.array(TX.tokens_ws(t))).alias("__w"))
    staged = staged.select(
        "doc_id",
        "text",
        "__w",
        F.explode(F.array(TX.shingles_from_tokens(F.col("__w"), 2))).alias("__g"),
    )
    d = staged
    rep = TX.repetition_ratio_from_grams(F.col("__g"))
    sw = F.round(TX.stopword_ratio_from_tokens(F.col("__w")), 4)
    punct = F.round(TX.punct_ratio(t), 4)
    n = F.length(t)
    keep = F.when(
        n.between(50, 5000) & (sw >= 0.05) & (rep <= 0.5) & (punct <= 0.2), F.lit(1)
    ).otherwise(F.lit(0))
    return d.select(
        "doc_id",
        rep.alias("rep_ratio"),
        TX.pattern_count(t, TX.URL_PATTERN).alias("n_urls"),
        TX.pattern_count(t, TX.EMAIL_PATTERN).alias("n_emails"),
        keep.alias("keep"),
    )


@register(
    "q_sample_stratified",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               ((doc_id * 1103515245 + 12345) % 2147483648) % 100 AS sample_bucket
        FROM documents
    )
    SELECT doc_id, lang, CAST(sample_bucket AS BIGINT) AS sample_bucket
    FROM b
    WHERE sample_bucket < CASE lang WHEN 'en' THEN 50 ELSE 20 END
    """,
    tags=("text", "sampling"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (corpus-mixing): keep 50% of
    English, 20% of every other language, by LCG hash bucket of doc_id —
    reproducible across runs/partitionings/engines, shuffle-free (a
    scan predicate). Production swaps the bucket fn for xxhash64;
    structure unchanged (operators/sampling.py)."""
    from ..operators import sampling as SMP

    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    return SMP.stratified_sample(
        d, "lang", {"en": 50, "de": 20, "es": 20, "fr": 20, "zh": 20}
    )


@register(
    "q_token_histogram",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
    tags=("text", "agg"),
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram, top 50 by frequency (vocab sizing /
    stop-list induction): explode → hash-agg (map-side partial combine
    carries one row per distinct token per partition) → total-order
    top-k with deterministic (count desc, token asc) tie-break."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens_ws(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
    bench=True,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint; keeper = min
    doc_id. One shuffle on a 128-bit key — the always-first dedup pass at
    any scale."""
    return DD.exact_dedup_groups(T(spark, sf_dir, "documents"))


@register(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
                FROM words WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
    SELECT id_a, id_b, shared,
           round(shared * 1.0 / (x.n + y.n - shared), 4) AS jaccard
    FROM pairs JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
    WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.3
    """,
    tags=("dedup",),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via inverted shingle index —
    the verification layer under MinHash. (The production path sets
    max_doc_freq to cap fan-out; unset here so the oracle is exact.)"""
    return DD.ngram_jaccard_pairs(T(spark, sf_dir, "documents"), threshold=0.3)


@register(
    "q_dedup_minhash_lsh",
    oracle=None,  # randomized banding → rows-only driver check; invariants in tests/test_dedup.py
    tags=("dedup",),
    bench=True,  # the near-dup scale path belongs in the headline set
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 hashes)+LSH(8 bands) candidate pairs verified with
    exact Jaccard ≥ 0.3. Candidate generation is linear in corpus size —
    the 100 TB dedup path. Output ⊆ q_dedup_ngram_jaccard by
    construction (tests/test_dedup.py). max_bucket_size=512 is the
    production skew cap — a no-op on healthy buckets (equivalence
    pinned in tests/test_dedup.py), a hard fan-out bound on degenerate
    ones. parallelism fans the CPU-bound signature stage out to the
    session's core count — a single-file local scan is otherwise one
    task (at corpus scale the scan splits naturally and the knob is
    moot). Measured 4.3 s → 1.9 s at sf0.1 together with the
    base-hash-once signature scheme."""
    return DD.minhash_lsh_pairs(
        T(spark, sf_dir, "documents"),
        threshold=0.3,
        max_bucket_size=512,
        parallelism=spark.sparkContext.defaultParallelism,
    )


@register(
    "q_dedup_simhash",
    oracle=None,  # banding + hamming verify; invariants in tests/test_dedup.py
    tags=("dedup",),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at Hamming ≤ 8 via 9-block pigeonhole
    banding (blocks = max_hamming + 1, so candidate generation is
    complete for distance ≤ 8); exact Hamming verification on candidates
    only. Completeness vs brute-force pairwise Hamming is pinned in
    tests/test_dedup.py."""
    return DD.simhash_pairs(T(spark, sf_dir, "documents"), max_hamming=8)


@register(
    "q_dedup_containment",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
                FROM words WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
    SELECT id_a, id_b, shared,
           round(shared * 1.0 / least(x.n, y.n), 4) AS containment
    FROM pairs JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
    WHERE round(shared * 1.0 / least(x.n, y.n), 4) >= 0.5
    """,
    tags=("dedup",),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment pairs (|A∩B| / min set size ≥ 0.5):
    catches short-document-quoted-in-long-document duplication that
    symmetric Jaccard structurally under-scores. Same inverted-index
    plan as q_dedup_ngram_jaccard — one extra `least` in the projection,
    zero extra shuffles."""
    return DD.containment_pairs(T(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "q_bpe_merges",
    oracle=bpe_oracle_sql("SELECT text FROM documents", num_merges=6),
    tags=("tokenize", "iterative"),
    bench=True,  # vocab-bounded iterative loop in the headline set
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six BPE merges learned from the documents corpus
    (operators.tokenize.learn_bpe_merges): word-frequency table once
    (the only corpus-sized pass), then vocab-bounded pair aggregates
    with a deterministic lexical tie-break and declarative replace()
    merges. The oracle is the same algorithm unrolled to chained CTEs —
    iterative vocabulary induction, hash-exact across engines."""
    return learn_bpe_merges(T(spark, sf_dir, "documents"), num_merges=6)


from ..operators.tokenize import apply_bpe_merges, bpe_encode_oracle_sql  # noqa: E402


@register(
    "q_bpe_encode",
    oracle=bpe_encode_oracle_sql("SELECT doc_id, text FROM documents", num_merges=6),
    tags=("tokenize", "iterative"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn-then-encode: the 6 learned merges (q_bpe_merges) applied
    to every document as a chained declarative replace() over the
    whole-document symbol sequence — (doc_id, n_chars, n_tokens). The
    encode side is ZERO-shuffle scan-speed codegen (the merges are six
    literals); only learning pays aggregates. Cross-word merges are
    impossible by the end-of-word-marker invariant
    (operators/tokenize.py doc_seq)."""
    docs = T(spark, sf_dir, "documents")
    merges = [
        (r["pair"], r["merged"])
        for r in learn_bpe_merges(docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    return apply_bpe_merges(docs, merges)


@register(
    "q_phrase_search",
    oracle="""
    WITH pos AS (
        SELECT doc_id, t.token, t.p
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                            i -> struct_pack(token := string_split(text, ' ')[i], p := i)))
                       AS t
              FROM documents)
        WHERE t.token IN ('table', 'hash')
    )
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(a.p) AS INT) AS first_pos
    FROM pos a JOIN pos b
      ON a.doc_id = b.doc_id AND b.p = a.p + 1
     AND a.token = 'table' AND b.token = 'hash'
    GROUP BY a.doc_id
    """,
    tags=("text", "retrieval"),
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('table hash') via a POSITIONAL inverted
    index: posexplode tokens, keep only the phrase's terms (the filter
    prunes the index to |hits| before any join), adjacency self-join on
    (doc, position+1). The IR primitive BM25 can't give you — term
    order — at index-lookup cost instead of a full-corpus regex scan:
    at 100 TB the positional index is the persisted artifact
    (operators/index.py's story) and this query touches only two
    postings lists."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "token")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "token")
    pos = toks.filter(F.col("token").isin("table", "hash"))
    a = pos.filter(F.col("token") == "table").alias("a")
    b = pos.filter(F.col("token") == "hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.p") == F.col("a.p") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.col("a.p")).cast("int").alias("first_pos"),
        )
    )


@register(
    "q_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t.w, t.p FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                          i -> struct_pack(w := string_split(text, ' ')[i], p := i))) AS t
            FROM documents)
    ),
    uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
    tot AS (SELECT count(*) AS t FROM toks),
    bg AS (
        SELECT a.w AS w1, b.w AS w2, count(*) AS c12
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        GROUP BY 1, 2
    ),
    btot AS (SELECT sum(c12) AS bt FROM bg)
    SELECT w1 || ' ' || w2 AS bigram,
           CAST(c12 AS BIGINT) AS c12,
           round((c12 / CAST(bt AS DOUBLE))
                 / ((u1.c / CAST(t AS DOUBLE)) * (u2.c / CAST(t AS DOUBLE))), 4)
             AS lift
    FROM bg JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w, tot, btot
    WHERE c12 >= 5
    ORDER BY lift DESC, bigram ASC
    LIMIT 20
    """,
    tags=("text", "stats"),
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI expressed as a LIFT ratio
    P(w1w2)/(P(w1)P(w2)) — the log is monotone, so ranking by the ratio
    IS ranking by PMI while staying in exactly-reproducible
    integer-division arithmetic (libm log would drift in the last ulp
    across engines). Bigram counts from a positional self-join on
    (doc, p+1); unigram tables broadcast back; TakeOrdered cuts the
    top-20 without a global sort. The phrase-mining primitive behind
    tokenizer-vocabulary seeding."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("t"))
    a = toks.alias("a")
    b = toks.alias("b")
    bg = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.p") == F.col("a.p") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    btot = bg.agg(F.sum("c12").alias("bt"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    lift = F.round(
        (F.col("c12") / F.col("bt").cast("double"))
        / (
            (F.col("c1") / F.col("t").cast("double"))
            * (F.col("c2") / F.col("t").cast("double"))
        ),
        4,
    )
    return (
        bg.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c12").cast("long").alias("c12"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "q_source_overlap",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared,
           round(shared * 1.0 / least(x.n, y.n), 4) AS overlap
    FROM pairs JOIN sizes x ON src_a = x.source JOIN sizes y ON src_b = y.source
    WHERE round(shared * 1.0 / least(x.n, y.n), 4) >= 0.5
    """,
    tags=("text", "governance"),
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-overlap coefficient between SOURCES (|Vₐ∩Vᵦ| / min
    vocab size ≥ 0.5): the corpus-level twin of document containment —
    two sources sharing most of a vocabulary are mirrors or scrapes of
    each other, and the mixture planner should know before weighting
    them independently. Same inverted-index self-join shape as the
    document dedup tier, but over |sources|² — a few hundred rows at
    any corpus size."""
    d = T(spark, sf_dir, "documents")
    v = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).distinct()
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = v.alias("a")
    b = v.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .withColumn("overlap", F.round(F.col("shared") / F.least("n_a", "n_b"), 4))
        .filter(F.col("overlap") >= 0.5)
        .select("src_a", "src_b", F.col("shared").cast("long").alias("shared"), "overlap")
    )


@register(
    "q_dedup_summary",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
                FROM words WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         jp AS (SELECT id_a, id_b
                FROM pairs JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
                WHERE round(shared * 1.0 / (x.n + y.n - shared), 4) >= 0.3),
         members AS (SELECT id_a AS doc_id FROM jp UNION SELECT id_b FROM jp),
         n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT (SELECT n_docs FROM n) AS n_docs,
           CAST((SELECT count(*) FROM jp) AS BIGINT) AS n_near_dup_pairs,
           CAST((SELECT count(*) FROM members) AS BIGINT) AS n_docs_in_pairs,
           round((SELECT count(*) FROM members) * 1.0 / (SELECT n_docs FROM n), 6)
             AS near_dup_rate
    """,
    tags=("dedup", "governance"),
)
def q_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup GOVERNANCE number: what fraction of the corpus
    participates in at least one exact-Jaccard ≥ 0.3 pair — the
    headline a dedup run reports before and after (pairs list is the
    worklist, this is the dashboard). Reuses ngram_jaccard_pairs and
    reduces it to one row; the only additions are a distinct over pair
    members and two scalar counts."""
    docs = T(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.3)
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_near_dup_pairs"))
    m = members.agg(F.count(F.lit(1)).cast("long").alias("n_docs_in_pairs"))
    return (
        n.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(m))
        .select(
            "n_docs",
            "n_near_dup_pairs",
            "n_docs_in_pairs",
            F.round(F.col("n_docs_in_pairs") / F.col("n_docs"), 6).alias(
                "near_dup_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Driver-green verification companions for the randomized text-dedup
# tier (round-3 verdict item 5): same engine code paths, deterministic
# SQL-expressible inputs — see the matching block in
# queries_similarity.py for the ANN-side companions.
# ---------------------------------------------------------------------------

# Planted 61-bit signatures in pure integer arithmetic both engines
# evaluate identically: docs in the same mod-40 group share an LCG base;
# variant v = doc_id DIV 40 flips (at most) bits (7v mod 61) and
# (13v mod 61) — so within-group pairs sit at Hamming <= 4 and
# cross-group pairs are ~random 61-bit distances (far).
_SIG_SPARK = (
    "((doc_id % 40) * 1103515245 + 12345) % 2305843009213693952 ^ "
    "(CASE WHEN doc_id DIV 40 = 0 THEN 0 ELSE "
    "shiftleft(1L, CAST((doc_id DIV 40) * 7 % 61 AS INT)) ^ "
    "shiftleft(1L, CAST((doc_id DIV 40) * 13 % 61 AS INT)) END)"
)
_SIG_DUCK = (
    "xor(((doc_id % 40) * 1103515245 + 12345) % 2305843009213693952, "
    "CASE WHEN doc_id // 40 = 0 THEN 0 ELSE "
    "xor((1::BIGINT << CAST((doc_id // 40) * 7 % 61 AS INTEGER)), "
    "(1::BIGINT << CAST((doc_id // 40) * 13 % 61 AS INTEGER))) END)"
)


@register(
    "q_dedup_simhash_verify",
    oracle=f"""
    WITH sigs AS (SELECT doc_id, {_SIG_DUCK} AS sig FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 4
    """,
    tags=("dedup",),
)
def q_dedup_simhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_simhash's banding + verification machinery
    (operators/dedup.hamming_pairs64: pigeonhole blocks = max_hamming+1,
    streamed block-bucket self-join, exact bit_count verify) driven
    over PLANTED deterministic signatures instead of xxhash64 SimHash —
    DuckDB brute-forces all O(n²) pairs, so completeness AND exactness
    of the banded plan are hash-checked by the driver. The xxhash64
    signature construction keeps its brute-force-equivalence pin in
    tests/test_dedup.py."""
    docs = T(spark, sf_dir, "documents")
    sigs = docs.select("doc_id", F.expr(_SIG_SPARK).alias("sig"))
    return DD.hamming_pairs64(sigs, id_col="doc_id", max_hamming=4).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "q_dedup_minhash_verify",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
                FROM words WHERE len(w) >= 3),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pk0 AS (SELECT doc_id, w[1] || ' ' || w[2] || ' ' || w[3] AS k
                 FROM words WHERE len(w) >= 3),
         pk AS (SELECT doc_id, k FROM (
                  SELECT doc_id, k,
                         row_number() OVER (PARTITION BY k
                                            ORDER BY doc_id) AS rn
                  FROM pk0) WHERE rn <= 64),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM pk a JOIN pk b
                    ON a.k = b.k AND a.doc_id < b.doc_id),
         shared AS (SELECT c.id_a, c.id_b, count(*) AS shared
                    FROM cand c
                    JOIN sh a ON a.doc_id = c.id_a
                    JOIN sh b ON b.doc_id = c.id_b AND a.shingle = b.shingle
                    GROUP BY 1, 2)
    SELECT s.id_a, s.id_b,
           round(s.shared * 1.0 / (x.n + y.n - s.shared), 4) AS jaccard
    FROM shared s JOIN sizes x ON s.id_a = x.doc_id
                  JOIN sizes y ON s.id_b = y.doc_id
    WHERE round(s.shared * 1.0 / (x.n + y.n - s.shared), 4) >= 0.3
    """,
    tags=("dedup",),
)
def q_dedup_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_minhash_lsh's verification stage
    (operators/dedup.verify_pairs_exact: left-semi shingle restriction
    to candidate docs, exact 3-gram Jaccard, threshold filter) driven
    over a DETERMINISTIC candidate table: first-shingle prefix blocking
    (docs sharing their opening 3-gram — production prefix blocking,
    and near-identical docs share it by construction) stands in for
    the LSH band collisions, so the driver row is non-empty at every
    SF. DuckDB recomputes the same blocking, shingles, and Jaccard over
    the same pairs — the whole candidate-restricted verify path is
    hash-checked; the randomized banding keeps its subset-of-exact pin
    in tests/test_dedup.py."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    pk = docs.filter(F.size(w) >= 3).select(
        "doc_id",
        F.concat_ws(
            " ", w.getItem(0), w.getItem(1), w.getItem(2)
        ).alias("k"),
    )
    # deterministic block cap (lowest 64 ids per prefix key, mirrored
    # in the oracle): a boilerplate opening 3-gram would otherwise make
    # the blocking self-join quadratic in the hot block — the same
    # guard as dedup.bucket_pairs' max_bucket_size
    wk = Window.partitionBy("k").orderBy(F.col("doc_id").asc())
    pk = (
        pk.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    cand = (
        pk.select(F.col("doc_id").alias("id_a"), "k")
        .join(pk.select(F.col("doc_id").alias("id_b"), "k"), "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return DD.verify_pairs_exact(cand, docs, threshold=0.3)
