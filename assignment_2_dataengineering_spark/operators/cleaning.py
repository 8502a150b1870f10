"""Corpus-hygiene operators: cross-document boilerplate detection.

Web-crawl corpora are full of template text (navigation, cookie
banners, license footers) that appears verbatim in a large fraction of
documents; C4/Gopher-style pipelines measure and strip it before
training. The detector here works at word-n-gram granularity because
the synthetic corpus is single-line (no newline-delimited lines to
dedup) — the plan shape is identical for line-granularity boilerplate:
swap the shingle generator for split(text, '\\n').

No counterpart in the reference (a pandas NEM dashboard — see
SURVEY.md §2.12); this is part of the engine's LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def boilerplate_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    ratio_num: int = 1,
    ratio_den: int = 5,
) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a doc's DISTINCT
    word n-grams that are corpus-common, where "common" means the gram
    appears in ≥ ratio_num/ratio_den of all documents (integer
    threshold — df·den ≥ n_docs·num — so Spark and any SQL oracle agree
    bit-for-bit with no decimal-vs-double drift).

    Scale shape: one shuffle to build the distinct (doc, gram) index,
    one map-side-combined count for document frequency, then the common
    set is BROADCAST — by pigeonhole it holds at most
    den/num · avg_grams_per_doc entries (each common gram is backed by
    ≥ num/den · n_docs index rows), i.e. a few hundred strings
    regardless of corpus size — and the final per-doc score is one more
    small aggregation. Docs shorter than n words have no grams and drop
    out, matching SQL `unnest` semantics.

    Token arrays are materialized behind an explode(array(x)) Generate
    barrier (operators/dedup.py:_with_shingle_set) so the n-gram
    builder's element_at references don't re-split the text per gram.

    Plan honesty: the (doc, gram) index appears twice in the plan (the
    doc-frequency branch and the flagging branch) because Catalyst does
    not share common subtrees — the text is scanned and shingled twice.
    A production run at 100 TB should `.persist(DISK_ONLY)` the gram
    index between the two passes (or write it once and read it back);
    the operator stays declarative here so it composes as a pure plan.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array(TX.tokens_ws(F.col(text_col)))).alias("__w")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(F.array_distinct(TX.shingles_from_tokens(F.col("__w"), n))).alias(
            "gram"
        ),
    )
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    tot = df.agg(F.count(F.lit(1)).alias("n_docs"))
    common = (
        dfreq.crossJoin(F.broadcast(tot))
        .filter(F.col("df") * ratio_den >= F.col("n_docs") * ratio_num)
        .select("gram")
    )
    flagged = grams.join(
        F.broadcast(common).withColumn("__c", F.lit(1)), "gram", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__c").alias("n_common"),
        F.round(F.count("__c") / F.count(F.lit(1)), 4).alias("boilerplate_ratio"),
    )
