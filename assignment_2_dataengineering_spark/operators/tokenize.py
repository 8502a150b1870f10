"""Distributed BPE merge learning — vocabulary induction as iterative
DataFrame aggregation.

Classic byte-pair-encoding training (Sennrich et al. 2016) operates on
the WORD-FREQUENCY table, not the corpus: after the one corpus-sized
word count, every iteration touches only |vocab| rows. That is exactly
the shape that survives 100 TB — the fact-sized work happens once, and
the merge loop runs over a table bounded by distinct-word count no
matter how big the input was.

The representation trick that keeps every step declarative (and
oracle-able): a word's symbol sequence is a string with TWO-SPACE
separators and two-space padding ('  l  o  w  </w>  '). Merging the
best pair (a, b) is replace(seq, ' a  b ', ' ab ') — the pattern
consumes ONE space from each boundary gap and the replacement restores
it, so the two-space invariant survives and consecutive occurrences
('ab ab ab') each retain a full boundary for the scanner to match.
Both Spark's UTF8String.replace and ANSI SQL replace() scan
left-to-right non-overlapping, which IS the greedy BPE merge order
('a a a' merges to 'aa a', not 'a aa'); a single-space encoding would
instead swallow the shared boundary and skip every second occurrence —
pinned by tests/test_tokenize.py::test_matches_pure_python_reference's
overlap cases. No UDF, no fold; the per-round argmax is a vocab-bounded
aggregate whose ONE winning row returns to the driver and re-enters the
plan as replace() literals (the IVF-centroid precedent: the learned
model parameter lives on the driver; the data never does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_seq(word: F.Column) -> F.Column:
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    return F.concat(
        F.lit("  "), F.concat_ws("  ", chars), F.lit("  " + EOW + "  ")
    )


def learn_bpe_merges(
    df: DataFrame, text_col: str = "text", num_merges: int = 6
) -> DataFrame:
    """Learn `num_merges` BPE merges; returns (merge_rank, pair,
    pair_count, merged) ordered by rank. Ties on pair count break
    lexicographically on the pair string, so the result is unique and
    engine-independent. Per iteration: one pair-count aggregate over the
    vocab table (shuffle bounded by |vocab|), one top-1 on the tiny
    pair-count table, one broadcast cross-join + replace to rewrite the
    sequences. Vocab snapshots persist per iteration to keep lineage
    flat (at cluster scale: checkpoint)."""
    spark = df.sparkSession
    wc = (
        word_counts(df, text_col)
        .select(_initial_seq(F.col("word")).alias("seq"), "cnt")
        .persist()
    )
    merges: list[tuple[int, str, int, str]] = []
    cur = wc
    try:
        for rank in range(num_merges):
            # Materialize the token array once behind the explode(array(x))
            # Generate barrier (dedup._with_shingle_set pattern): inlined,
            # every element_at re-splits the sequence string — 3 splits per
            # pair position.
            toks = cur.select(
                F.explode(F.array(F.split(F.trim("seq"), "  "))).alias("__t"), "cnt"
            )
            # CASE guard: a fully-merged 1-symbol word makes sequence(1, 0)
            # — which Spark evaluates DESCENDING to [1, 0], so element_at
            # hits index 0 and ANSI mode throws. Emit no pairs instead.
            pairs = toks.select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(__t) < 2 THEN array()"
                        " ELSE transform(sequence(1, size(__t) - 1),"
                        " i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"
                        " END"
                    )
                ).alias("pair"),
                "cnt",
            )
            # ONE job per round: the vocab-bounded pair aggregate's single
            # winning row comes to the driver (the IVF-centroid precedent —
            # a 3-field row, not data) and re-enters the plan as literals,
            # so the sequence rewrite chain stays a stack of narrow
            # replace() projections over the one persisted vocab table: no
            # per-round checkpoint, no broadcast join, no plan blowup.
            # Measured 10.7 s → 4.0 s for 6 merges at sf0.1 vs the
            # all-declarative crossJoin(broadcast(best)) form.
            row = (
                pairs.groupBy("pair")
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not row:
                break
            pair = row[0]["pair"]
            merged = pair.replace(" ", "")
            merges.append((rank, pair, row[0]["pair_count"], merged))
            cur = cur.select(
                F.replace(
                    F.col("seq"),
                    # ' a  b ': one boundary space each side, two between
                    F.lit(" " + pair.replace(" ", "  ") + " "),
                    F.lit(" " + merged + " "),
                ).alias("seq"),
                "cnt",
            )
    finally:
        wc.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, pair_count bigint, merged string"
    )


def bpe_oracle_sql(
    source_sql: str = "SELECT text FROM documents", num_merges: int = 6
) -> str:
    """Iteration-unrolled DuckDB twin of learn_bpe_merges: the same
    word count, spaced-sequence representation, pair aggregate, lexical
    tie-break, and replace() rewrite, as plain chained CTEs."""
    parts = [
        f"""WITH wcnt AS (
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM ({source_sql})
            ) WHERE length(word) > 0 GROUP BY 1
        ),
        w0 AS (
            SELECT '  ' || array_to_string(list_transform(range(1, length(word) + 1),
                       i -> substr(word, i, 1)), '  ') || '  {EOW}  ' AS seq,
                   cnt
            FROM wcnt
        ),"""
    ]
    for r in range(num_merges):
        parts.append(
            f"""p{r} AS (
                SELECT unnest(list_transform(range(1, len(string_split(trim(seq), '  '))),
                           i -> string_split(trim(seq), '  ')[i] || ' ' ||
                                string_split(trim(seq), '  ')[i + 1])) AS pair,
                       cnt
                FROM w{r}
            ),
            b{r} AS (
                SELECT {r} AS merge_rank, pair,
                       CAST(sum(cnt) AS BIGINT) AS pair_count,
                       replace(pair, ' ', '') AS merged
                FROM p{r} GROUP BY pair
                ORDER BY pair_count DESC, pair ASC LIMIT 1
            ),
            w{r + 1} AS (
                SELECT replace(seq, ' ' || replace(b.pair, ' ', '  ') || ' ',
                               ' ' || b.merged || ' ') AS seq,
                       cnt
                FROM w{r}, b{r} b
            ),"""
        )
    parts[-1] = parts[-1].rstrip().rstrip(",")
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, pair_count, merged FROM b{r}"
        for r in range(num_merges)
    )
    parts.append(union)
    return "\n".join(parts)


def doc_seq(text: F.Column) -> F.Column:
    """Whole-document spaced symbol sequence: each char a symbol, each
    space replaced by the end-of-word marker, one trailing marker —
    same two-space encoding as learning. Cross-word merges are
    impossible by construction: no learned pair ever has the marker as
    its LEFT element (it is always word-final during learning), so
    applying merges to the concatenated form equals applying them
    word-by-word."""
    chars = F.expr(
        "transform(sequence(1, length(text)),"
        f" i -> CASE WHEN substr(text, i, 1) = ' ' THEN '{EOW}'"
        " ELSE substr(text, i, 1) END)"
    )
    return F.concat(
        F.lit("  "), F.concat_ws("  ", chars), F.lit("  " + EOW + "  ")
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a learned merge list (rank order): the
    chained declarative replace() that learning used on the vocab
    table, applied to whole-document sequences. Returns (id, n_chars,
    n_tokens) — n_tokens after all merges. Pure codegen, zero
    shuffles: tokenization runs at scan speed over 100 TB, which is
    the reason to express BPE encoding as string rewriting instead of
    a per-row Python tokenizer."""
    seq = doc_seq(F.col(text_col))
    for pair, merged in merges:
        seq = F.replace(
            seq,
            F.lit(" " + pair.replace(" ", "  ") + " "),
            F.lit(" " + merged + " "),
        )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(F.split(F.trim(seq), "  ")).alias("n_tokens"),
    )


def bpe_encode_oracle_sql(
    source_sql: str = "SELECT doc_id, text FROM documents", num_merges: int = 6
) -> str:
    """DuckDB twin of learn-then-encode: the learning CTE chain (same
    as bpe_oracle_sql) feeding a chained document-sequence rewrite —
    the b_r single-row CTEs supply each round's pattern via cross
    join."""
    learn = bpe_oracle_sql(
        f"SELECT text FROM ({source_sql})", num_merges=num_merges
    )
    # strip the final SELECT (the merge-table union) off the learning SQL
    cut = learn.rindex("SELECT merge_rank, pair, pair_count, merged FROM b0")
    with_block = learn[:cut].rstrip()
    assert with_block.endswith(")")
    parts = [
        with_block + ",",
        f"""docs0 AS (
            SELECT doc_id, length(text) AS n_chars,
                   '  ' || array_to_string(list_transform(range(1, length(text) + 1),
                       i -> CASE WHEN substr(text, i, 1) = ' ' THEN '{EOW}'
                            ELSE substr(text, i, 1) END), '  ')
                   || '  {EOW}  ' AS seq
            FROM ({source_sql})
        ),""",
    ]
    for r in range(num_merges):
        # LEFT JOIN ON TRUE, not a cross join: when the vocabulary
        # exhausts before num_merges rounds, b{r} is EMPTY and a cross
        # join would wipe every document row (the Spark side simply
        # applies the shorter learned list); the NULL-pair round is an
        # identity rewrite instead
        parts.append(
            f"""docs{r + 1} AS (
                SELECT doc_id, n_chars,
                       CASE WHEN b.pair IS NULL THEN seq
                            ELSE replace(seq,
                                 ' ' || replace(b.pair, ' ', '  ') || ' ',
                                 ' ' || b.merged || ' ') END AS seq
                FROM docs{r} LEFT JOIN b{r} b ON TRUE
            ),"""
        )
    parts[-1] = parts[-1].rstrip().rstrip(",")
    parts.append(
        f"""SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
               CAST(len(string_split(trim(seq), '  ')) AS INT) AS n_tokens
        FROM docs{num_merges}"""
    )
    return "\n".join(parts)
