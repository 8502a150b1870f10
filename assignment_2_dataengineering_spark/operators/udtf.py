"""Python UDTF surface (Spark 4): table-generating functions in Python.

Completes the engine's UDF tier (SURVEY.md §2.10) alongside scalar
pandas_udf (vectorized), mapInPandas (Arrow batch iterator), and
applyInPandasWithState (stateful streaming):

  UDTF = one input row → many output rows, with per-row Python logic.

POLICY: a UDTF is row-at-a-time Python — the slow path. Anything
expressible as explode/posexplode/sequence/slice MUST use those (see
q_chunk, q_token_dedup: pure codegen). A UDTF earns its cost only for
genuinely generative per-row logic that Catalyst cannot express —
recursive parsers, stateful tokenizers, external-library span
extractors. The sentence splitter here is deliberately simple so tests
can pin exact semantics against an explode-based twin; swap `eval`'s
body for a real parser and the plumbing (registration, lateral join,
schema) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="sent_id int, sentence string, n_words int")
class SentenceSplitter:
    """Emit one row per '.'-delimited sentence with its word count.
    Skips empty segments; sent_id is the 0-based position."""

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        if text is None:
            return
        sent_id = 0
        for raw in text.split("."):
            s = raw.strip()
            if s:
                yield sent_id, s, len(s.split(" "))
                sent_id += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF tier for SQL lateral-join use:
    SELECT d.doc_id, s.* FROM docs d, LATERAL split_sentences(d.text) s
    """
    spark.udtf.register("split_sentences", SentenceSplitter)
