"""Shared pytest fixtures: one local SparkSession for the whole run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_app_twitter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Slow-tier ledger (VERDICT r15 item 1b): every test that measured
# >= 8 s on the r16 full-suite run (779 tests / 46 min — the driver's
# pytest window timed out two rounds running at ~33-68 min). These
# get the `slow` marker in pytest_collection_modifyitems and are
# deselected by the default `-m "not slow"` in pytest.ini, leaving a
# fast tier that certifies the tree in ~10-12 min. The full suite
# still runs with -m "slow or not slow" (round closes do).
_SLOW_TESTS = frozenset({
    "test_cluster_best_representatives_parity_and_keep_best",
    "test_cluster_size_histogram_parity_and_mass",
    "test_knn_ivf_quantized_parity_and_recall",
    "test_topic_means",
    "test_unpivot_of_pivot_roundtrip",
    "test_bitext_ivf_parity_and_exact_agreement",
    "test_bitext_mining_capped_parity_and_cap_binds",
    "test_bitext_parity_and_mutual_top1",
    "test_bitext_probe_sensitivity_monotone_and_converges",
    "test_bitext_recall_audit_consistent_with_direct_recount",
    "test_bm25_parity_and_ranking_properties",
    "test_capped_pairs_linear_on_planted_clique",
    "test_cluster_topic_terms",
    "test_contamination_by_source_parity_and_reconciliation",
    "test_coreset_kcenter_matches_pure_python_greedy",
    "test_decon_screen_agreement_parity_and_partition",
    "test_dedup_clusters_parity",
    "test_embedding_whiten_parity_and_unit_variance",
    "test_ivf_rebalance_plan_parity_and_threshold_semantics",
    "test_knn_graph_convergence_metrics",
    "test_knn_graph_multiprobe_parity_and_dominance",
    "test_knn_graph_parity_and_neighborhood_invariants",
    "test_knn_graph_refine_parity_and_recall_dominance",
    "test_knn_ivf",
    "test_matryoshka_recall_parity_nesting_and_lossless_prefix",
    "test_mmr_rerank_ivf_parity_and_shortlist_containment",
    "test_mmr_rerank_matches_pure_python_greedy",
    "test_power_users_matches_pure_python_ntile",
    "test_pq_encode_parity_and_code_bounds",
    "test_pq_train_parity_and_codebook_shape",
    "test_q1_ivm_identities_on_generated_lineitems",
    "test_quality_lift_parity_and_cohort_accounting",
    "test_semdedup_parity",
    "test_simhash_clusters_group_planted_cliques",
    "test_soft_dedup_weights_parity_and_mass_conservation",
    "test_soft_weighted_sample_parity_and_mass",
    "test_span_rewrite_parity_and_cut",
    "test_split_leakage_parity_and_planted_leak",
    "test_vocab_coverage_budgets_bind_on_planted_vocab",
    "test_winnowing_pairs_parity_and_emission_bound",
    "test_pandas_classifier_runs_numpy_model_with_init",
    "test_exact_ntile_matches_global_window",
    "test_pipeline_funnel_v3_parity_and_job_agreement",
    "test_pipeline_funnel_v4_parity_job_agreement_and_composition",
    "test_pipeline_funnel_v5_parity_job_agreement_and_composition",
    "test_pipeline_funnel_v6_parity_and_capped_reps",
    "test_pipeline_pretrain_export_parity_and_manifest_invariants",
    "test_prepare_training_corpus_v2_funnel",
    "test_prepare_training_corpus_v3_dual_screen_funnel",
    "test_prepare_training_corpus_v6_job_agreement",
    "test_backfill_serving_matches_streaming",
    "test_hourly_serving_upsert_and_idempotence",
    "test_late_event_quarantined_and_aggregate_matches_on_time_batch",
    "test_late_events_uses_engine_watermark_from_progress",
    "test_pii_monitor_over_kafka_wire_source",
    "test_quality_floor_real_stream_available_now",
    "test_quality_floor_state_compaction_bounds_and_preserves",
    "test_quota_cross_batch_redelivery_pins_contract",
    "test_quota_size_state_compaction_bounds_and_preserves",
    "test_run_pipeline_end_to_end",
    "test_stateful_first_seen_matches_batch_new_vs_returning",
    "test_stream_stream_interval_join",
    "test_streaming_hll_sketch_matches_batch",
    "test_streaming_mongo_sink_ep2_ep3_wiring",
    "test_streaming_session_windows_match_batch_sessionize",
    "test_streaming_stats_maintenance_matches_full_recompute",
    "test_v4_admission_stream_equals_batch_funnel_stages",
    "test_q3_incremental_merge_equals_recompute",
    "test_top_customers",
    # r16 additions: full-replay parity guards (the oracle gate
    # covers the same equalities every round)
    "test_quota_replay_twin_serves_batch_sampler_exactly",
    "test_quality_floor_replay_twin_serves_batch_calibration_exactly",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            # saveAsTable targets (bucketing tests) land in tmp, not the repo
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
