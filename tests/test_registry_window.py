"""Regression guard for the driver's 50-query correctness window.

The driver gate (CORRECTNESS_rN.json) checks the FIRST 50 entries of
__spark_entry__.queries(). Round-5 judge item #8: pin that window to a
checked-in list so a future import reorder or new @register can never
silently swap which queries the scoreboard grades.

Round-7 rotation (round-6 judge item #3): 25 trivially-stable
reference-core slots (driver-green in every CORRECTNESS_r01..r06, still
covered by tests/test_oracle_parity.py) rotate out in favor of the
TPC-H 22 + analytic-window/rollup/cube, which had never appeared on the
driver scoreboard. The dedup/ANN family stays so the three randomized
no_oracle ops keep their oracle-paired verify companions in-window.
"""

from assignment_2_dataengineering_spark.plans.registry import (
    DRIVER_WINDOW,
    all_specs,
)

# The deliberate round-7 window: a 10-query reference-core spine, the
# dedup/ANN family with its verify companions, the full TPC-H suite, and
# the analytic rollup trio. Changing this list is allowed — but must be
# THIS explicit.
EXPECTED_WINDOW = (
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

# Rotated OUT this round — every one of these was driver-green in
# CORRECTNESS_r01 through r06; they remain oracle-paired in the local
# full-registry parity suite. Pinned here so the rotation is auditable.
ROTATED_OUT = (
    "q_scalar_agg", "q_mode", "q_percentile", "q_collect_set", "q_count",
    "q_project", "q_isin", "q_null_filter", "q_time_horizon",
    "q_filter_exists", "q_array_overlap", "q_enrich_join", "q_semi_anti",
    "q_zip_join", "q_join_dedup_labels", "q_topk_retention", "q_sort",
    "q_unpivot", "q_scalar_fns", "q_date_fns", "q_token_count",
    "q_fingerprint", "q_lang_id", "q_quality_flags", "q_token_histogram",
)


def test_window_is_the_checked_in_list():
    assert DRIVER_WINDOW == EXPECTED_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_registry_order_starts_with_the_window():
    names = list(all_specs())
    assert tuple(names[:50]) == EXPECTED_WINDOW
    # nothing lost: the rest of the registry is still present exactly once
    assert len(names) == len(set(names))


def test_rotated_out_queries_still_registered_and_oracle_paired():
    specs = all_specs()
    for name in ROTATED_OUT:
        assert name in specs, f"rotation dropped {name} from the registry"
        assert specs[name].oracle is not None


def test_window_no_oracle_rows_are_exactly_the_three_randomized_ops():
    specs = all_specs()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert no_oracle == ["q_dedup_minhash_lsh", "q_dedup_simhash", "q_ann_lsh"]


def test_each_randomized_op_has_its_verify_companion_in_window():
    companions = {
        "q_dedup_minhash_lsh": "q_dedup_minhash_verify",
        "q_dedup_simhash": "q_dedup_simhash_verify",
        "q_ann_lsh": "q_ann_lsh_rerank",
    }
    specs = all_specs()
    for op, comp in companions.items():
        assert comp in DRIVER_WINDOW, f"{op} verify companion outside window"
        assert specs[comp].oracle is not None
