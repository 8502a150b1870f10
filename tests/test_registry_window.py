"""Regression guard for the driver's 50-query correctness window.

The driver gate (CORRECTNESS_rN.json) checks the FIRST 50 entries of
__spark_entry__.queries(). Round-5 judge item #8: pin that window to a
checked-in list so a future import reorder or new @register can never
silently swap which queries the scoreboard grades.

Round-9 rotation (round-8 judge item #1): the r08 window (temporal tier
+ corpus heavyweights + q_grouped_pca) went 49/49 green on its first
scoreboard appearance, so ALL 50 slots rotate to never-driver-checked
queries: the full graph tier (5 — including q_pagerank, the engine's
costliest query, never before driver-checked) and the full analytic
tier (45). After this window runs, exactly 37 registered queries remain
never-checked; the r10 plan in registry.py's WINDOW_HISTORY finishes
the sweep.
"""

from assignment_2_dataengineering_spark.plans.registry import (
    DRIVER_WINDOW,
    all_specs,
)

# The deliberate round-9 window. Changing this list is allowed — but must
# be THIS explicit.
EXPECTED_WINDOW = (
    "q_pagerank", "q_communities", "q_bfs_reach", "q_degree_stats",
    "q_triangle_count",
    "q_approx_distinct", "q_ntile", "q_approx_quantiles",
    "q_grouping_sets", "q_window_nav", "q_hll_rollup", "q_set_ops",
    "q_nullsafe_join", "q_array_hof", "q_cms_freq", "q_regr", "q_mad",
    "q_winsorize", "q_paginate", "q_sql_api", "q_heatmap", "q_outliers",
    "q_cooccurrence", "q_pop_delta", "q_abtest", "q_spearman",
    "q_user_similarity", "q_gini", "q_autocorr", "q_weighted_median",
    "q_balance_audit", "q_rfm", "q_zipf", "q_psi_drift", "q_kanonymity",
    "q_dq_suite", "q_ks_test", "q_eval_metrics", "q_join_cardinality",
    "q_ldiversity", "q_skyline", "q_pseudonymize", "q_feature_hash",
    "q_target_encode", "q_calibration", "q_freshness_audit",
    "q_wilson_rank", "q_benford", "q_ols_exact", "q_auc_rank",
)

# Rotated OUT this round — every one of these was driver-green in
# CORRECTNESS_r08 (the temporal tier + corpus heavyweights +
# q_grouped_pca on their first appearance, 49/49); the oracle-paired
# ones remain covered by the local full-registry parity suite
# (tests/test_oracle_parity.py). Pinned here so the rotation is
# auditable.
ROTATED_OUT = (
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

# Rotated-out rows-only entry: q_grouped_pca (SVD is not SQL-expressible
# by design — invariants live in tests/test_decompose.py).
ROTATED_OUT_NO_ORACLE = ("q_grouped_pca",)

# In-window rows-only entries: the sketch family, whose HLL / CMS /
# approx-quantile internals are not SQL-reproducible. Their error-bound
# invariants live in tests/test_sketch.py, test_bloom.py, test_cms.py.
WINDOW_NO_ORACLE = (
    "q_approx_distinct", "q_approx_quantiles", "q_hll_rollup", "q_cms_freq",
)

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
    # The round-9 rotation's whole point: every slot goes to a query with
    # no prior CORRECTNESS_rN row (r06/r07/r08 windows are disjoint).
    assert not set(DRIVER_WINDOW) & set(ROTATED_OUT)


def test_rotated_out_queries_still_registered_and_oracle_paired():
    specs = all_specs()
    for name in ROTATED_OUT:
        assert name in specs, f"rotation dropped {name} from the registry"
        if name in ROTATED_OUT_NO_ORACLE:
            assert specs[name].oracle is None
        else:
            assert specs[name].oracle is not None


def test_window_no_oracle_rows_are_exactly_the_sketch_family():
    # 46 of 50 window rows face the driver's full value-hash oracle; the
    # rows-only entries are exactly the four sketch queries.
    specs = all_specs()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert no_oracle == list(WINDOW_NO_ORACLE)


def test_each_in_window_randomized_op_has_its_verify_companion_in_window():
    specs = all_specs()
    for op, comp in VERIFY_COMPANIONS.items():
        assert comp in specs and specs[comp].oracle is not None
        if op in DRIVER_WINDOW:
            assert comp in DRIVER_WINDOW, f"{op} verify companion outside window"


def test_exactly_37_queries_remain_never_driver_checked():
    """WINDOW_HISTORY bookkeeping (round-8 judge item #6): after r09's
    window runs, the never-checked remainder must fit one final r10
    window. Computed from the CORRECTNESS_r0N artifacts at the repo root
    (skipped when the artifacts aren't present, e.g. in an sdist)."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0[1-8].json")))
    if not files:
        return
    seen = set()
    for f in files:
        with open(f) as fh:
            seen |= set(json.load(fh))
    specs = set(all_specs())
    # the r09 window itself must be 50 first-appearance queries
    assert not set(DRIVER_WINDOW) & seen, (
        f"window slots wasted on already-checked queries: "
        f"{sorted(set(DRIVER_WINDOW) & seen)}"
    )
    never_after_r09 = specs - seen - set(DRIVER_WINDOW)
    assert len(never_after_r09) == 37, (
        f"expected 37 never-checked queries left for r10, got "
        f"{len(never_after_r09)}: {sorted(never_after_r09)}"
    )


def test_grouped_pca_output_is_driver_canonicalizable_scalars(spark, sf_dir):
    # The r02 red row was the driver's pandas canonicalizer choking on
    # list-valued cells; r08 re-checked the reshaped scalar form green.
    # Pin the registered query's schema to scalar (non-array, non-map,
    # non-struct) columns so it can never regress to an uncheckable shape.
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = all_specs()["q_grouped_pca"].fn(spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"q_grouped_pca column {f.name} is {f.dataType} — not "
            "canonicalizable by the driver's rows-only check"
        )
