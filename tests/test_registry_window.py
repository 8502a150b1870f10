"""Regression guard for the driver's 50-query correctness window.

The driver gate (CORRECTNESS_rN.json) checks the FIRST 50 entries of
__spark_entry__.queries(). Round-5 judge item #8: pin that window to a
checked-in list so a future import reorder or new @register can never
silently swap which queries the scoreboard grades.

Round-8 rotation (round-7 judge items #2 and #3): the r07 window
(reference-core spine + dedup/ANN family + TPC-H 22 + rollup trio) went
47/47 green on its first scoreboard appearance, so ALL 50 slots rotate
to never-driver-checked queries: the full temporal tier (26), the
corpus tier's heavyweights + hygiene ops (23), and q_grouped_pca —
whose single r02 appearance crashed the driver's canonicalizer on
list-valued columns and whose registration has since been reshaped to
scalar rows (queries_similarity.py:q_grouped_pca docstring).
"""

from assignment_2_dataengineering_spark.plans.registry import (
    DRIVER_WINDOW,
    all_specs,
)

# The deliberate round-8 window. Changing this list is allowed — but must
# be THIS explicit.
EXPECTED_WINDOW = (
    "q_asof_join", "q_range_join", "q_sessionize", "q_dedup_clusters",
    "q_gap_fill", "q_interval_window", "q_funnel", "q_cohort_retention",
    "q_dedup_representative", "q_ohlc", "q_transition_matrix",
    "q_rolling_zscore", "q_funnel_latency", "q_forecast_backtest",
    "q_growth_accounting", "q_user_paths", "q_attribution", "q_decay_agg",
    "q_concurrency", "q_event_pattern", "q_asof_forward",
    "q_watermark_audit", "q_twap", "q_windowed_funnel", "q_changepoint",
    "q_tail_latency",
    "q_tfidf", "q_lm_score", "q_bm25", "q_corpus_pipeline",
    "q_corpus_pipeline_v2", "q_span_dedup", "q_boilerplate",
    "q_decontaminate", "q_keyness", "q_vocab_oov",
    "q_char_entropy", "q_ngram_topk", "q_pii_redact", "q_token_dedup",
    "q_hash_split", "q_chunk", "q_sequence_pack", "q_domain_cap",
    "q_dataset_card", "q_split_leakage", "q_shuffle_order", "q_upsample",
    "q_weighted_sample",
    "q_grouped_pca",
)

# Rotated OUT this round — every one of these was driver-green in
# CORRECTNESS_r07 (the TPC-H 22 + rollup trio + dedup/ANN family on their
# first appearance); the oracle-paired ones remain covered by the local
# full-registry parity suite (tests/test_oracle_parity.py). Pinned here so
# the rotation is auditable.
ROTATED_OUT = (
    "q_groupby_sum", "q_window_agg", "q_join_broadcast", "q_left_join",
    "q_latest_per_key", "q_pivot", "q_scan_nested", "q_route",
    "q_text_quality", "q_sample_stratified",
    "q_dedup_exact", "q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
    "q_dedup_simhash", "q_dedup_containment", "q_bpe_merges",
    "q_bpe_encode", "q_phrase_search", "q_source_overlap",
    "q_dedup_summary", "q_dedup_simhash_verify", "q_dedup_minhash_verify",
    "q_ann_bruteforce", "q_ann_lsh", "q_ann_lsh_rerank",
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q21", "q_tpch_q22",
    "q_analytic_window", "q_rollup", "q_cube",
)

# The three randomized-banding ops rotated out this round are no_oracle BY
# DESIGN (SURVEY §5); their deterministic verify companions rotate out
# with them as a unit and all six stay registered.
ROTATED_OUT_NO_ORACLE = ("q_dedup_minhash_lsh", "q_dedup_simhash", "q_ann_lsh")

# Companion map for every randomized no-oracle op in the registry: if the
# op is in the window, its deterministic verify companion must be too.
VERIFY_COMPANIONS = {
    "q_dedup_minhash_lsh": "q_dedup_minhash_verify",
    "q_dedup_simhash": "q_dedup_simhash_verify",
    "q_ann_lsh": "q_ann_lsh_rerank",
    "q_dedup_embedding": "q_dedup_embedding_verify",
    "q_ann_ivf": "q_ann_ivf_probe",
    "q_ann_pq": "q_ann_pq_adc",
}


def test_window_is_the_checked_in_list():
    assert DRIVER_WINDOW == EXPECTED_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_registry_order_starts_with_the_window():
    names = list(all_specs())
    assert tuple(names[:50]) == EXPECTED_WINDOW
    # nothing lost: the rest of the registry is still present exactly once
    assert len(names) == len(set(names))


def test_window_is_all_never_driver_checked_queries():
    # The round-8 rotation's whole point: every slot goes to a query with
    # no prior CORRECTNESS_rN row. q_grouped_pca is the one deliberate
    # exception (rotated back IN to clear its r02 canonicalizer crash).
    assert not set(DRIVER_WINDOW) & set(ROTATED_OUT)


def test_rotated_out_queries_still_registered_and_oracle_paired():
    specs = all_specs()
    for name in ROTATED_OUT:
        assert name in specs, f"rotation dropped {name} from the registry"
        if name in ROTATED_OUT_NO_ORACLE:
            assert specs[name].oracle is None
            assert VERIFY_COMPANIONS[name] in specs
        else:
            assert specs[name].oracle is not None


def test_window_no_oracle_rows_are_exactly_grouped_pca():
    # 49 of 50 window rows face the driver's full value-hash oracle; the
    # one rows-only entry is q_grouped_pca (SVD is not SQL-expressible —
    # invariants live in tests/test_decompose.py).
    specs = all_specs()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert no_oracle == ["q_grouped_pca"]


def test_each_in_window_randomized_op_has_its_verify_companion_in_window():
    specs = all_specs()
    for op, comp in VERIFY_COMPANIONS.items():
        assert comp in specs and specs[comp].oracle is not None
        if op in DRIVER_WINDOW:
            assert comp in DRIVER_WINDOW, f"{op} verify companion outside window"


def test_grouped_pca_output_is_driver_canonicalizable_scalars(spark, sf_dir):
    # The r02 red row was the driver's pandas canonicalizer choking on
    # list-valued cells. Pin the registered query's schema to scalar
    # (non-array, non-map, non-struct) columns so it can never regress
    # back to an uncheckable shape.
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = all_specs()["q_grouped_pca"].fn(spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"q_grouped_pca column {f.name} is {f.dataType} — not "
            "canonicalizable by the driver's rows-only check"
        )
