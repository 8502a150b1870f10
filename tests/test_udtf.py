"""Python UDTF surface: direct invocation, SQL lateral join, and
equivalence with the codegen (explode) twin on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.operators.udtf import (
    SentenceSplitter,
    register_udtfs,
)


def test_udtf_direct_call(spark):
    out = SentenceSplitter(F.lit("one two. three.  . four five six")).collect()
    rows = [(r["sent_id"], r["sentence"], r["n_words"]) for r in out]
    assert rows == [(0, "one two", 2), (1, "three", 1), (2, "four five six", 3)]


def test_udtf_lateral_join_matches_explode_twin(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "alpha beta. gamma"), (2, "delta"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, s.sent_id, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_id
        """
    ).collect()

    # codegen twin: split + filter empties + posexplode
    parts = F.filter(
        F.transform(F.split("text", "\\."), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    twin = (
        df.filter(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(parts).alias("sent_id", "sentence"))
        .withColumn("n_words", F.size(F.split("sentence", " ")))
        .orderBy("doc_id", "sent_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in twin]
    # null text and all-empty text yield no rows at all
    assert {r["doc_id"] for r in got} == {1, 2}
