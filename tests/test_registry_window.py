"""Regression guard for the driver's 50-query correctness window.

The driver gate (CORRECTNESS_rN.json) checks the FIRST 50 entries of
__spark_entry__.queries(). Round-5 judge item #8: pin that window to a
checked-in list so a future import reorder or new @register can never
silently swap which queries the scoreboard grades.

Round-11 rotation (round-10 judge item #1): after the r10 window ran,
every registered query has at least one driver row, so this window is
pure post-change re-checking — the 13 query paths whose code changed in
round 10 (most were last driver-checked on PRE-change code) plus the
full 38-query headline bench set (the optimization rounds' targets, so
any round-11 code change to a bench query is automatically driver-
re-checked), the deterministic verify companions the in-window
randomized ops require, and two longitudinally valuable re-checks.
"""

import glob
import json
import os

from assignment_2_dataengineering_spark.plans.registry import (
    DRIVER_WINDOW,
    all_specs,
)

# The deliberate round-11 window. Changing this list is allowed — but must
# be THIS explicit.
EXPECTED_WINDOW = (
    # the 13 query paths whose code changed in round 10
    "q_bm25", "q_boilerplate", "q_corpus_pipeline_v2", "q_balance_audit",
    "q_psi_drift", "q_cooccurrence", "q_user_similarity", "q_prob_linkage",
    "q_pagerank", "q_communities", "q_bfs_reach", "q_degree_stats",
    "q_triangle_count",
    # the full headline bench set (33 not already above)
    "q_groupby_sum", "q_window_agg", "q_join_broadcast", "q_left_join",
    "q_latest_per_key", "q_pivot", "q_unpivot", "q_text_quality",
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_bpe_merges",
    "q_ann_bruteforce", "q_media_features", "q_analytic_window",
    "q_hll_rollup", "q_auc_rank", "q_asof_join", "q_gap_fill", "q_ohlc",
    "q_attribution", "q_decontaminate", "q_tfidf", "q_corpus_pipeline",
    "q_lm_score", "q_span_dedup", "q_semantic_dedup", "q_cdc_apply",
    "q_json_props", "q_ann_ivf", "q_tpch_q1", "q_tpch_q5", "q_tpch_q18",
    "q_tpch_q9",
    # verify companions for the in-window randomized ops
    "q_dedup_minhash_verify", "q_ann_ivf_probe",
    # longitudinally valuable re-checks
    "q_dedup_ngram_jaccard", "q_key_skew",
)

# The r10-changed portion: each entry is (query, why it earns a slot).
R10_CHANGED = {
    "q_bm25": "r10 single-aggregate restructure (queries_corpus.py)",
    "q_boilerplate": "r10 shared shingling checkpoint (cleaning.py)",
    "q_corpus_pipeline_v2": "r10 capped-stage checkpoint",
    "q_balance_audit": "r10 contingency-table checkpoint",
    "q_psi_drift": "r10 bounds/bin-cell checkpoints",
    "q_cooccurrence": "r10 distinct (user,type) checkpoint",
    "q_user_similarity": "r10 distinct (user,item) checkpoint",
    "q_prob_linkage": "r10 per-field histogram checkpoints (linkage.py)",
    "q_pagerank": "r10 graph bucket-grain selector consumer",
    "q_communities": "r10 graph bucket-grain selector consumer",
    "q_bfs_reach": "r10 graph bucket-grain selector consumer",
    "q_degree_stats": "r10 graph bucket-grain selector consumer",
    "q_triangle_count": "r10 ud/o checkpoints + bucket selector consumer",
}

# In-window rows-only entries (`oracle=None` by design): the bench set's
# randomized banding / sketch-internal ops, each invariant-tested and
# (where randomized) paired with an in-window deterministic verify
# companion.
WINDOW_NO_ORACLE = (
    "q_semantic_dedup", "q_ann_ivf", "q_dedup_minhash_lsh", "q_hll_rollup",
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


def _driver_rows_through_r10() -> set[str]:
    """Union of query names across CORRECTNESS_r01..r10 artifacts."""
    root = os.path.join(os.path.dirname(__file__), "..")
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0[1-9].json"))) + sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r10.json"))
    ):
        with open(f) as fh:
            seen |= set(json.load(fh))
    return seen


def test_window_is_the_checked_in_list():
    assert DRIVER_WINDOW == EXPECTED_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert set(R10_CHANGED) == set(EXPECTED_WINDOW[:13])


def test_registry_order_starts_with_the_window():
    names = list(all_specs())
    assert tuple(names[:50]) == EXPECTED_WINDOW
    # nothing lost: the rest of the registry is still present exactly once
    assert len(names) == len(set(names))


def test_window_holds_the_full_bench_set():
    """The r11 window's point: every headline bench query (the
    optimization rounds' targets) is driver-re-checked this round, so a
    round-11 performance change can never dodge the correctness gate."""
    specs = all_specs()
    bench = {n for n, s in specs.items() if s.bench}
    assert bench <= set(EXPECTED_WINDOW), (
        f"bench queries missing from the window: "
        f"{sorted(bench - set(EXPECTED_WINDOW))}"
    )


def test_coverage_is_complete_and_window_is_pure_recheck():
    """After r10, every registered query has a driver row; the r11 window
    therefore re-checks only. (Skipped when the artifacts aren't present,
    e.g. in an sdist.)"""
    seen = _driver_rows_through_r10()
    if not seen:
        return
    specs = set(all_specs())
    assert specs <= seen, (
        f"queries with no driver row despite full r10 coverage: "
        f"{sorted(specs - seen)}"
    )
    assert set(EXPECTED_WINDOW) <= seen


def test_window_no_oracle_rows_are_exactly_the_pinned_set():
    # 46 of 50 window rows face the driver's full value-hash oracle.
    specs = all_specs()
    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert sorted(no_oracle) == sorted(WINDOW_NO_ORACLE)


def test_each_in_window_randomized_op_has_its_verify_companion_in_window():
    specs = all_specs()
    for op, comp in VERIFY_COMPANIONS.items():
        assert comp in specs and specs[comp].oracle is not None
        if op in DRIVER_WINDOW:
            assert comp in DRIVER_WINDOW, f"{op} verify companion outside window"


def test_rotated_out_queries_still_registered_and_oracle_paired():
    """Every query that has ever held a driver row stays registered, and
    its oracle pairing (or deliberate absence) is unchanged — rotation
    never drops coverage from the full-registry local parity suite."""
    specs = all_specs()
    seen = _driver_rows_through_r10()
    for name in seen:
        assert name in specs, f"rotation dropped {name} from the registry"


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
