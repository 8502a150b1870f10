"""Persisted inverted index — retrieval without rescanning text.

q_bm25 computes tf/df/doclen from the raw corpus each run; a serving
path builds the index ONCE and answers every query from it. The index
is three parquet tables under one directory:

- `postings/`  (token, doc_id, tf)   — the inverted index proper,
  written range-clustered by token so parquet min/max stats confine a
  term lookup to few files (the poor-man's term dictionary; a real
  deployment buckets by token for co-located merges);
- `docs/`      (doc_id, dl)          — document lengths;
- `stats/`     (n_docs, avgdl)       — one row of corpus constants.

`bm25_from_index` answers a query from the index alone, with the SAME
scoring discipline as plans/queries_corpus.q_bm25 (Lucene idf,
fixed-order per-term sum) — equality is pinned in
tests/test_index.py::test_index_bm25_equals_direct. At 100 TB the
point is I/O: a 3-term query reads 3 terms' postings, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def build_inverted_index(docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id") -> None:
    """One corpus scan → the three index tables. The postings write is
    range-clustered on token (repartitionByRange + sortWithinPartitions)
    so each file owns a contiguous token range and term lookups skip
    files via min/max stats."""
    toks = docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
    postings = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    (
        postings.repartitionByRange(8, "token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("double").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, "docs"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))


def bm25_from_index(
    spark: SparkSession, path: str, terms: tuple[str, ...], k: int = 20
) -> DataFrame:
    """BM25 top-k from the persisted index: the token IN-filter pushes
    into the postings scan (min/max file skipping on the clustered
    layout), df comes from the filtered postings, and per-term scores
    sum in fixed textual order exactly as q_bm25 does — same result,
    none of the corpus re-read."""
    if not terms:
        raise ValueError("bm25_from_index needs at least one query term")
    # dedupe while preserving first-seen order: a repeated term would
    # otherwise score twice and silently inflate its weight
    terms = tuple(dict.fromkeys(terms))
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("token").isin(*terms)
    )
    dl = spark.read.parquet(os.path.join(path, "docs"))
    stats = spark.read.parquet(os.path.join(path, "stats"))
    dfreq = postings.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    ts = (
        postings.withColumn("tf", F.col("tf").cast("double"))
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            (
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                * (K1 + 1.0)
                / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl")))
            ).alias("ts"),
        )
    )
    term_col = [
        F.coalesce(F.min(F.when(F.col("token") == t, F.col("ts"))), F.lit(0.0))
        for t in terms
    ]
    score = term_col[0]
    for c in term_col[1:]:
        score = score + c
    return (
        ts.groupBy("doc_id")
        .agg(score.alias("score"))
        .select("doc_id", F.round("score", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
