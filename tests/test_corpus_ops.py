"""Unit tests for the corpus-hygiene operators added in round 2:
PII scrubbing, order-preserving token dedup, deterministic splits,
two-phase global shuffle rank, and cross-document boilerplate scoring.

The cross-engine (DuckDB) equivalence of the registered query forms is
covered by test_oracle_parity; these tests pin the operator semantics
on hand-built fixtures where the expected output is obvious.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from assignment_2_dataengineering_spark.functions import text as TX
from assignment_2_dataengineering_spark.operators.cleaning import boilerplate_scores
from assignment_2_dataengineering_spark.operators.sampling import (
    global_shuffle_rank,
    hash_bucket,
    split_label,
)


def test_pii_scrub_redacts_each_type(spark):
    rows = [
        (1, "mail bob.smith+x@sub.example.org now"),
        (2, "server at 192.168.0.1 fell over"),
        (3, "call +61-2-9374-4000 today"),
        (4, "nothing sensitive here at all"),
        (5, "a@b.co and 10.0.0.255 and 0412-345-678"),
        # space-separated phones are a DOCUMENTED false negative since
        # round 4: the space-spanning pattern collapsed year lists and
        # number tables into [PHONE] (precision over recall)
        (6, "call +61 2 9374 4000 today"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r["s"]
        for r in df.select("id", TX.pii_scrub(F.col("t")).alias("s")).collect()
    }
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "server at [IP] fell over"
    assert out[3] == "call [PHONE] today"
    assert out[4] == "nothing sensitive here at all"
    assert out[5] == "[EMAIL] and [IP] and [PHONE]"
    assert out[6] == "call +61 2 9374 4000 today"


def test_dedup_tokens_ordered_keeps_first_occurrence(spark):
    df = spark.createDataFrame([(1, "b a b c a b")], "id long, t string")
    toks = df.select(
        "id", F.explode(F.array(TX.tokens_ws(F.col("t")))).alias("w")
    )
    r = toks.select(TX.dedup_tokens_ordered(F.col("w")).alias("d")).first()
    assert r["d"] == ["b", "a", "c"]


def test_split_label_fractions_and_determinism(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    lab = df.select(split_label(F.col("doc_id")).alias("s"))
    counts = {r["s"]: r["n"] for r in lab.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["train"] + counts.get("val", 0) + counts.get("test", 0) == 10_000
    # 98/1/1 within generous tolerance for an LCG over a contiguous range
    assert 9_500 <= counts["train"] <= 9_950
    assert 20 <= counts.get("val", 0) <= 300
    assert 20 <= counts.get("test", 0) <= 300
    # identical assignment on a rerun (pure function of the id)
    again = {
        r["s"]: r["n"]
        for r in df.select(split_label(F.col("doc_id")).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == counts
    # split is consistent with hash_bucket ranges
    one = df.filter(F.col("doc_id") == 7).select(
        hash_bucket(F.col("doc_id")).alias("b"), split_label(F.col("doc_id")).alias("s")
    ).first()
    expected = "train" if one["b"] < 98 else ("val" if one["b"] < 99 else "test")
    assert one["s"] == expected


def test_global_shuffle_rank_matches_naive_window(spark):
    df = spark.range(0, 2_000).withColumnRenamed("id", "doc_id")
    two_phase = global_shuffle_rank(df, "doc_id").select("doc_id", "shuffle_rank")
    h = (F.col("doc_id").cast("long") * 1103515245 + 12345) % 2_147_483_648
    naive = df.select(
        "doc_id",
        F.row_number().over(Window.orderBy(h, "doc_id")).alias("naive_rank"),
    )
    joined = two_phase.join(naive, "doc_id")
    assert joined.filter(F.col("shuffle_rank") != F.col("naive_rank")).count() == 0
    # rank is a permutation of 1..N
    agg = joined.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.countDistinct("shuffle_rank").alias("d"),
    ).first()
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, 2_000, 2_000)


def test_boilerplate_scores_flags_planted_template(spark):
    # 10 docs: all contain the template trigram "cookie banner text";
    # only doc 0 also has a unique trigram tail long enough to score < 1.
    template = "cookie banner text"
    rows = [(i, f"{template} filler{i} words{i} here{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_scores(df, "text", "doc_id", n=3, ratio_num=1, ratio_den=5).collect()
    }
    assert len(out) == 10
    for i in range(10):
        # every doc's gram set includes the template trigram, which
        # appears in 10/10 >= 1/5 of docs -> counted common
        assert out[i]["n_common"] >= 1
        # the fillerN tail grams are unique to each doc -> not common
        assert out[i]["n_common"] < out[i]["n_grams"]
        assert 0.0 < out[i]["boilerplate_ratio"] < 1.0


def test_boilerplate_hashed_and_exact_keys_agree(spark, sf_dir):
    """Round-8 key-width change (operators/cleaning.py): the xxhash64
    gram keys must be value-equivalent to the raw-string path on real
    data — the documented collision budget (P ≈ D²/2^65) predicts zero
    collisions at any test SF, so any divergence is a bug, not a
    collision."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    hashed = {
        r["doc_id"]: (r["n_grams"], r["n_common"], r["boilerplate_ratio"])
        for r in boilerplate_scores(docs, "text", "doc_id").collect()
    }
    exact = {
        r["doc_id"]: (r["n_grams"], r["n_common"], r["boilerplate_ratio"])
        for r in boilerplate_scores(
            docs, "text", "doc_id", exact_keys=True
        ).collect()
    }
    assert hashed == exact


def test_pii_scrub_preserves_space_separated_number_runs(spark):
    """The phone pattern must not span spaces: a year list is ordinary
    data, not a phone number (precision-over-recall for scrubbing —
    dashes-only separators)."""
    from assignment_2_dataengineering_spark.functions.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "revenues were 1999 2000 2001 2002 in order"),
            (2, "call +61-2-9374-4000 now"),
            (3, "card 1234-5678-9012"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["t"] for r in df.select("id", pii_scrub(F.col("text")).alias("t")).collect()}
    assert got[1] == "revenues were 1999 2000 2001 2002 in order"
    assert "[PHONE]" in got[2]
    assert "[PHONE]" in got[3]


def test_lcg_overflow_safe_for_huge_ids_and_congruent(spark):
    """Round-6 sf1 scaling run finding: the naive (id*A+C)%M raised
    ARITHMETIC_OVERFLOW under ANSI mode for ids >= ~8.4e9 — exactly the
    id space a 100 TB corpus has. The modular form must (a) accept any
    int64 id and (b) stay value-identical to the naive form where the
    naive form is defined (congruence mod M)."""
    from assignment_2_dataengineering_spark.operators.sampling import (
        _A, _C, _M, hash_bucket,
    )

    big = [0, 1, 7, 8_399_999_999, 10**10, 5 * 10**10 + 123, 2**62]
    df = spark.createDataFrame([(i,) for i in big], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    for i in big:
        assert got[i] == ((i * _A + _C) % _M) % 100, i


def test_pack_sequences_partitions_the_token_stream_exactly(spark):
    """Every token of every document lands in exactly one (seq, span):
    per-doc span lengths sum to n_tokens; per-sequence lengths sum to
    ctx for all sequences but the last; spans are contiguous."""
    from assignment_2_dataengineering_spark.operators.sampling import pack_sequences

    rows = [(i, 1 + (i * 37) % 160) for i in range(200)]  # varied sizes
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    ctx = 64
    packed = pack_sequences(df, "n_tokens", ctx).collect()
    total = sum(n for _, n in rows)
    assert sum(r["span_len"] for r in packed) == total
    by_doc = {}
    by_seq = {}
    for r in packed:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_id"], 0)
        by_seq[r["seq_id"]] += r["span_len"]
    n_map = dict(rows)
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["seq_id"])
        assert sum(r["span_len"] for r in spans) == n_map[doc]
        # contiguous within the doc, starting at 0
        pos = 0
        for r in spans:
            assert r["span_start"] == pos
            pos += r["span_len"]
        # consecutive seq ids (a doc straddles adjacent cuts only)
        sids = [r["seq_id"] for r in spans]
        assert sids == list(range(sids[0], sids[0] + len(sids)))
    last_seq = max(by_seq)
    for sid, n in by_seq.items():
        assert n == ctx or sid == last_seq
    assert by_seq[last_seq] <= ctx
    assert set(by_seq) == set(range(last_seq + 1))


def test_mix_epochs_counts_match_weights(spark):
    """full_epochs copies per row plus a deterministic hash-gated
    partial epoch; weight 0 drops the row; reruns identical."""
    from assignment_2_dataengineering_spark.operators.sampling import (
        hash_bucket,
        mix_epochs,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        "doc_id long, src string",
    )
    full_e = F.when(F.col("src") == "a", F.lit(2)).otherwise(F.lit(0))
    frac = F.when(F.col("src") == "a", F.lit(25)).otherwise(F.lit(0))
    out = mix_epochs(df, full_e, frac)
    rows = out.collect()
    # src b (weight 0) fully dropped
    assert all(r["src"] == "a" for r in rows)
    a_ids = [i for i in range(1000) if i % 2 == 0]
    partial = {
        r["doc_id"]
        for r in df.filter("src = 'a'")
        .filter(hash_bucket(F.col("doc_id")) < 25)
        .collect()
    }
    assert len(rows) == 2 * len(a_ids) + len(partial)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["epoch"])
    for i in a_ids:
        want = {0, 1, 2} if i in partial else {0, 1}
        assert per_doc[i] == want
    # deterministic rerun
    assert sorted((r["doc_id"], r["epoch"]) for r in out.collect()) == sorted(
        (r["doc_id"], r["epoch"]) for r in rows
    )
