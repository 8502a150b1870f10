"""BPE merge learning vs an independent pure-Python reference
implementation of the classic algorithm (word-frequency dict, pair
counting, greedy left-to-right merge), plus determinism and
representation invariants."""

from __future__ import annotations

from collections import Counter

from assignment_2_dataengineering_spark.operators.tokenize import (
    EOW,
    learn_bpe_merges,
)


def _reference_bpe(texts: list[str], num_merges: int) -> list[tuple[int, str, int, str]]:
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(list(w) + [EOW]): c for w, c in words.items()}
    out = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        # max count, lexicographically smallest 'a b' pair string on ties
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), n = best
        out.append((rank, f"{a} {b}", n, a + b))
        new_vocab = {}
        for syms, c in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + c
        vocab = new_vocab
    return out


def test_matches_pure_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat and the bat",
        "low lower lowest slow slower",
        "aaa aaaa aa a",  # overlap stress: greedy left-scan order matters
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.merge_rank, r.pair, r.pair_count, r.merged)
        for r in learn_bpe_merges(df, num_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == _reference_bpe(texts, 8)


def test_deterministic_across_partitionings(spark):
    texts = [("alpha beta gamma alpha beta",), ("beta gamma delta",)]
    a = spark.createDataFrame(texts, "text string").repartition(1)
    b = spark.createDataFrame(texts, "text string").repartition(5)
    ra = [tuple(r) for r in learn_bpe_merges(a, num_merges=4).orderBy("merge_rank").collect()]
    rb = [tuple(r) for r in learn_bpe_merges(b, num_merges=4).orderBy("merge_rank").collect()]
    assert ra == rb


def test_merged_symbol_feeds_later_merges(spark):
    # after 'a b'→'ab' is learned, a later merge may combine 'ab' with
    # another symbol — the hierarchy property that makes BPE subword units
    df = spark.createDataFrame([("abab abab abab",)], "text string")
    rows = learn_bpe_merges(df, num_merges=3).orderBy("merge_rank").collect()
    # both 'a b' occurrences in each word merge in round 0 (count 6 = 2×3)
    assert rows[0].pair == "a b" and rows[0].pair_count == 6
    # ties at count 3 break lexically: '<' < 'a', so 'ab </w>' precedes 'ab ab'
    assert rows[1].pair == "ab </w>"
    # round 2 merges two MERGED symbols — the hierarchy property
    assert rows[2].pair == "ab ab</w>" and rows[2].merged == "abab</w>"


def test_encode_matches_python_reference_and_compresses(spark):
    from assignment_2_dataengineering_spark.operators.tokenize import apply_bpe_merges

    texts = ["the cat sat on the mat", "the rat ate the cat", "aaa aaaa aa"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    merges_rows = _reference_bpe(texts, 6)
    merges = [(p, m) for _, p, _, m in merges_rows]

    got = {r.doc_id: r.n_tokens for r in apply_bpe_merges(df, merges).collect()}

    def py_encode(text):
        n = 0
        for w in text.split(" "):
            if not w:
                continue
            syms = list(w) + [EOW]
            for (pair, merged) in merges:
                a, b = pair.split(" ")
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    # doc_seq maps each inter-word space to one end-of-word marker and
    # appends the final word's marker — token counts equal the per-word sum
    want = {i: py_encode(t) for i, t in enumerate(texts)}
    assert got == want

    # encoding with merges strictly compresses vs no merges
    none = {r.doc_id: r.n_tokens for r in apply_bpe_merges(df, []).collect()}
    assert all(got[i] < none[i] for i in got)


def test_learn_on_empty_and_tiny_corpus(spark):
    empty = spark.createDataFrame([], "text string")
    assert learn_bpe_merges(empty, num_merges=3).count() == 0
    # single 1-char word: only pair is (char, EOW); later rounds run dry
    one = spark.createDataFrame([("x",)], "text string")
    rows = learn_bpe_merges(one, num_merges=4).orderBy("merge_rank").collect()
    assert [r.pair for r in rows] == ["x </w>"]


def test_bpe_encode_oracle_survives_merge_exhaustion(spark, tmp_path):
    """A corpus whose vocabulary fully merges before num_merges rounds:
    the engine applies the shorter learned list; the oracle's empty
    b{r} CTEs must be identity rounds (LEFT JOIN ON TRUE), not a cross
    join that wipes every document row."""
    import duckdb

    from assignment_2_dataengineering_spark.plans.registry import all_specs

    df = spark.createDataFrame([(i, "ab ab") for i in range(3)], "doc_id long, text string")
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    spec = all_specs()["q_bpe_encode"]
    srows = sorted(tuple(r) for r in spec.fn(spark, d).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    drows = sorted(con.sql(spec.oracle).fetchall())
    assert srows == drows
    assert len(srows) == 3  # every document present
