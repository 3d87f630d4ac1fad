"""Query registry: one entry per implemented operator (SURVEY.md §2.2).

Each :class:`Query` pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for ops
that are genuinely not SQL-expressible — the driver then records a weaker
rows-only check).

Cross-engine determinism rules (every query in this package obeys them —
violating any of these makes the driver's value-hash comparison flaky):

* ``FLOOR`` before any double→int conversion (Spark truncates on cast,
  DuckDB rounds).
* Money/quantity aggregates: cast to DECIMAL(18,2) BEFORE summing (exact
  arithmetic, no float ordering effects), then ROUND, then CAST AS DOUBLE.
* Averages/ratios: divide the exact decimal-sum (as double) by the exact
  count — identical numerator and denominator give an identical IEEE
  quotient — then ROUND.
* Counts and integer sums: CAST AS BIGINT (DuckDB HUGEINT sums otherwise
  come back as float64 through pandas).
* Hashes: md5 only (identical lowercase hex in both engines).
* Window orderings always carry a unique-key tiebreak.
* Aliases identical on both sides; the driver sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """A registered engine query with its DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a query callable under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


#: Deliberate registration order. The driver's correctness gate checks only
#: the FIRST 50 registered queries, so window slots are deliberate (see the
#: module docstring). ALL queries — window and tail — additionally get
#: DuckDB parity at sf0.01 AND sf0.1 in tools/parity_all.py (artifacts:
#: PARITY_FULL.json / PARITY_FULL_sf0.1.json).
#:
#: ROTATION (round 11): after the r10 gate every one of the 352
#: oracle-backed queries is driver-green ever, so window value =
#: re-attestation freshness. Slots: (a) the round-11 crop (first-time
#: attestations), then (b) the OLDEST green cohort — the 25 queries last
#: driver-attested in round 3 plus the first 50-crop-25 of the 50-query
#: round-4 cohort by name. Every query rotated OUT stays parity-checked
#: at both SFs every round (PARITY_FULL artifacts).
#: tests/test_registry.py derives staleness from the CORRECTNESS_r*.json
#: history and pins the rotated-in set.
PRIORITY: list[str] = [
    # ------- round-11 crop (first-time attestations; grown as ops land) -------
    "seq_prefixspan",
    "ts_dtw_dayofweek",
    # ------- re-attest: last driver-attested round 3 (remaining 25) -------
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "ks_click_purchase_drift",
    "maintenance_compact_files",
    "multimodal_frame_sample",
    "multimodal_meta_summary",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_stats",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "retention_weekly_cohorts",
    "scalar_codec_int_serde",
    "scan_schema_evolution",
    "scd2_customer_history",
    "sessionize_events",
    "source_csv_orders",
    "source_custom_wirelog",
    "source_json_events",
    "subquery_exists_not_exists",
    "text_robust_zscore",
    # ------- re-attest: last driver-attested round 4 (first 18 by name) -------
    "bm25_search",
    "bpe_merge_steps",
    "cdc_snapshot_diff",
    "dedup_incremental_minhash",
    "dedup_prefix_jaccard",
    "diag_column_profile",
    "diag_join_cardinality",
    "diag_key_skew",
    "diag_psi_value_drift",
    "diag_value_histogram",
    "dup_chunk_filter",
    "graph_pagerank_parts",
    "graph_triangle_count",
    "graph_walks_recursive_cte",
    "inverted_index_postings",
    "logscan_grep",
    "multimodal_image_resize",
    "multimodal_video_frame_stats",
    # ------- tail: driver-green in r5-r10 or rows-only; parity-checked
    # at BOTH SFs every round (PARITY_FULL artifacts) -------
    "ab_benjamini_hochberg",
    "cluster_dbscan_grid",
    "er_fellegi_sunter",
    "ts_holt_winters",
    "ml_learning_curve",
    "graph_betweenness_sampled",
    "ml_tree_depth2",
    "graph_ktruss",
    "ml_ridge_kfold_cv",
    "agg_cube_orders",
    "agg_rollup_lineitem",
    "dedup_ngram_jaccard",
    "join_anti_dormant",
    "text_fingerprint",
    "text_lang_id",
    "text_token_count",
    "text_vocab_topk",
    "agg_collect_user_journey",
    "agg_distinct_per_segment",
    "agg_grouping_sets",
    "agg_pivot_event_types",
    "dedup_first_event",
    "join_broadcast_dims",
    "join_full_outer_daily",
    "join_semi_buyers",
    "scalar_array_map_suite",
    "scalar_datetime_monthly",
    "scalar_json_props",
    "scalar_string_suite",
    "setops_customer_cohorts",
    "subquery_exists_late_orders",
    "topk_orders",
    "unpivot_returnflag_measures",
    "window_lead_gap",
    "window_ntile_cume",
    "window_top3_orders_per_customer",
    "cdc_apply_upsert",
    "contamination_ngram_overlap",
    "corpus_build_pipeline",
    "dedup_cluster_canonical",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "events_sliding_2h",
    "events_tumbling_hourly",
    "funnel_signup_click_purchase",
    "join_asof_purchase_click",
    "join_bucketed_revenue",
    "join_range_bands",
    "join_salted_skew",
    "graph_clustering_coefficient",
    "finance_pvm_bridge",
    "ts_cumulative_reach",
    "diag_qq_normal_points",
    "text_heaps_law",
    "diag_cohens_kappa",
    "ab_srm_check",
    "multimodal_image_histogram",
    "diag_ols_influence",
    "ts_croston_forecast",
    "ts_forecast_accuracy",
    "ml_class_prf1_report",
    "ts_allen_interval_relations",
    "join_bitemporal_asof",
    "er_soundex_blocking",
    "graph_closeness_sampled",
    "ml_decile_lift",
    "diag_lorenz_curve",
    "ts_logrank_test",
    "graph_katz_centrality",
    "text_chao1_vocab",
    "corpus_token_budget_fill",
    "diag_jackknife_variance",
    "privacy_t_closeness",
    "diag_ks_exact_value",
    "attribution_shapley",
    "multimodal_image_psnr",
    "diag_vif",
    "graph_rich_club",
    "text_term_burstiness",
    "agg_listagg_ordered",
    "diag_mahalanobis_outliers",
    "seq_session_edit_distance",
    "ts_pacf",
    "reco_item_item_jaccard",
    "attribution_markov_removal",
    "division_covering_buyers",
    "text_zipf_fit",
    "dq_table_fingerprint",
    "scan_delta_varint_estimate",
    "assoc_rules_triples",
    "rfm_quintile_segments",
    "temporal_reachability_hops",
    "diag_bootstrap_ci",
    "diag_wilson_ci",
    "graph_ppr_seed",
    "ml_ndcg_link_prediction",
    "ts_slo_burn_rate",
    "mine_hard_negatives",
    "diag_cramers_v",
    "embedding_srp_buckets",
    "agg_weighted_median",
    "setops_multiset_bag",
    "diag_winsorized_mean",
    "graph_scc_forward_backward",
    "ml_isotonic_calibration",
    "ml_roc_curve_points",
    "ts_ar1_forecast",
    "privacy_k_anonymity",
    "ab_cuped_adjustment",
    "ab_delta_method_ratio",
    "diag_spearman_rank_corr",
    "diag_kruskal_wallis",
    "graph_degree_assortativity",
    "fifo_inventory_matching",
    "subquery_not_in_null_trap",
    "diag_levene_brown_forsythe",
    "ml_ridge_closed_form",
    "ts_sax_symbolic",
    "attribution_position_based",
    "ts_nelson_aalen",
    "graph_hits_hubs_authorities",
    "ml_knn_classifier",
    "graph_modularity_lpa",
    "ts_peak_detection",
    "privacy_l_diversity",
    "ab_two_proportion_ztest",
    "ab_power_analysis",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "diag_hll_sketch_union",
    "sample_stratified",
    "scan_zonemap_audit",
    "knn_ivfpq_adc",
    "multimodal_color_to_gray",
    "ml_decision_stump",
    "ml_feature_hashing",
    "ml_target_encoding_kfold",
    "ivm_join_delta",
    "graph_label_prop_communities",
    "scan_hilbert_layout",
    "ts_kaplan_meier",
    "source_xml_events",
    "sessionize_session_window_batch",
    "dq_referential_audit",
    "nested_order_items_hof",
    "agg_salted_distinct",
    "graph_bfs_levels",
    "ts_ltob_downsample",
    "bitmap_user_retention",
    "scan_dpp_date_join",
    "diag_observe_metrics",
    "alloc_largest_remainder",
    "sqlscript_doubling_threshold",
    "diag_huber_location",
    "knn_matryoshka_recall",
    "sessionize_incremental_merge",
    "text_readability_flesch",
    "embedding_norm_profile_arrow",
    "ts_rate_limit_audit",
    "scalar_timezone_dst",
    "dq_replay_detection",
    "diag_group_median_arrow",
    "text_kwic_concordance",
    "maintenance_retention_prune",
    "multimodal_features",
    "knn_cosine_numpy",
    "graph_sssp_weighted",
    "funnel_conversion_rates",
    "sample_stratified_topk_es",
    "diag_theil_sen_slope",
    "ts_cross_correlation",
    "ts_mann_kendall",
    "diag_gini_concentration",
    "diag_mann_whitney_value",
    "shard_rendezvous_rebalance",
    "ts_interval_coverage",
    "ts_segmented_trend_split",
    "er_blocking_quality",
    "search_rrf_fusion",
    "sqlparam_identifier_query",
    "ab_sprt_monitor",
    "dq_functional_dependency",
    "assoc_rules_copurchase",
    "streak_longest_daily",
    "skyline_pareto_parts",
    "auc_label_separability",
    "pmi_collocations",
    "ts_ewma_daily",
    "lateral_topk_per_brand",
    "sql_udf_net_margin",
    "ml_nb_lang_confusion",
    "source_binary_blobs",
    "seq_regex_funnel",
    "diag_benford_first_digit",
    "ts_rolling_median7",
    "ts_autocorrelation",
    "diag_entropy_profile",
    "diag_chi2_independence",
    "diag_iqr_outliers",
    "graph_link_prediction",
    "agg_filter_clause",
    "ml_logreg_gd",
    "golden_record_customers",
    "ts_seasonal_decompose",
    "segment_overlap_jaccard",
    "attribution_time_decay",
    "diag_woe_binning",
    "ml_calibration_bins",
    "tfidf_cosine_pairs",
    "ts_holt_linear",
    "diag_equidepth_histogram",
    "agg_share_of_parent",
    "join_shuffle_hash_hint",
    "agg_group_by_all",
    "join_null_safe",
    "dim_date_build",
    "agg_mode_daily",
    "ts_seasonal_anomaly",
    "seq_run_length_encode",
    "funnel_within_window",
    "sample_weighted_es",
    "ts_purchase_latency",
    "ts_gap_fill_linear",
    "ml_pca_power_iteration",
    "quantile_exact_twopass",
    "sqlvar_dynamic_threshold",
    "transpose_band_metrics",
    "lm_kneser_ney_bigram",
    "knn_pq_adc",
    "graph_cc_two_phase",
    "multimodal_audio_frame_energy",
    "window_range_7day_revenue",
    "agg_percentile_value",
    "subquery_scalar_small_orders",
    "subquery_in_supplier_nations",
    "aggstate_incremental_merge",
    "join_bloom_runtime_filter",
    "udaf_geomean_price",
    "branch_multiway_value_bands",
    "anomaly_hourly_error_spikes",
    "log_template_mining",
    "scan_partition_pruned",
    "q21_waiting_suppliers",
    "dedup_exact_substring",
    "sample_hash_weighted",
    "text_clean_normalize",
    "text_repetition_ratio",
    "corpus_dedup_stats",
    "knn_recall_eval",
    "knn_ivf_kmeans",
    "embedding_quantize_int8",
    "text_unigram_logprob",
    "corpus_mixture_weights",
    "fuzzy_match_part_names",
    "quality_classifier_infer",
    "split_leakage_audit",
    "quality_percentile_gate",
    "corpus_diversity",
    "graph_triangle_degree_ordered",
    "ts_downsample_ohlc",
    "ts_time_weighted_avg",
    "corpus_importance_resample",
    "bpe_encode_corpus",
    "diag_correlation_matrix",
    "scan_zorder_layout",
    "attribution_last_touch",
    "heavy_hitters_tokens",
    "path_common_trigrams",
    "ts_cusum_changepoint",
    "scd2_point_in_time_join",
    "graph_kcore_peel",
    "corpus_chunk_documents",
    "diag_groupwise_ols",
    "dq_constraint_audit",
    "dedup_simhash",
    "pack_token_shards",
    "text_quality",
    "text_tfidf_top_terms",
    "q5_local_revenue",
    "window_running_spend",
    "trace_route_even",
    "trace_route_odd",
    "trace_branch_law",
    "trace_search",
    "trace_tree_edges",
    "trace_summary",
    "trace_dependency_graph",
    "trace_log_summary",
    "trace_baggage_propagation",
    "trace_hash_sampling",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q20_promotion_suppliers",
    "q22_dormant_balance",
    "pii_redaction",
    "semdedup_prune",
    "ts_gap_fill_forward",
    "ts_max_concurrency_daily",
    "ts_markov_transitions",
    "multimodal_wav_roundtrip",
    "source_orc_lineitem",
    "scalar_variant_extract",
    "udtf_sentence_explode",
    "pipe_syntax_shipping_margin",
    "text_bigram_logprob",
]
def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then return
    the registry in deliberate PRIORITY order (dicts preserve insertion
    order, and the driver iterates ``queries()`` in that order)."""
    from logflow.queries import (  # noqa: F401
        corpus,
        diagnostics,
        graph,
        llm,
        mining,
        ml,
        multimodal,
        relational,
        sqlfeat,
        timeseries,
        tokenizer,
        tpch,
        trace,
    )

    missing = [n for n in PRIORITY if n not in REGISTRY]
    unlisted = [n for n in REGISTRY if n not in PRIORITY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    # Unlisted queries are appended at the end rather than dropped, so a
    # new @register entry is never silently excluded from the driver.
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update({n: REGISTRY[n] for n in unlisted})
    return ordered
