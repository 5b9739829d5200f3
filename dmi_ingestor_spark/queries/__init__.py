"""Query modules. Importing this package populates the registry.

The driver's per-round CORRECTNESS check covers the FIRST 50 registry
entries in insertion order, so ``_DRIVER_PRIORITY`` below explicitly
front-loads the queries that most need a fresh driver row this round.
Round 1 checked the first 50 import-order entries (aggregates, dedup,
ingestion, joins, multimodal, relational, reshape, scalar_* prefix);
round 2 rotates the remaining oracle-bearing families (tpch q2-q22,
setops, windows, textops, similarity, udaf, streaming batch twins,
remaining scalars) to the front, plus the fixed ``mm_decode_features``.
Queries not in the priority list keep their import-order position after
it, so nothing is ever dropped — only rotated.

Round-6+ note (repeat each round until the backlog drains): the
never-driver-checked set is the registry minus the keys of all
CORRECTNESS_r0N.json files. End of round 5: 504 registered, 491
oracle-bearing, 300 oracle-bearing never-checked (the r5 session
added 57 new queries across its two halves); after the r5 driver
run checks the 50 front-loaded below, ~250 remain — rounds 6-10 at
50/round. Replace ``_DRIVER_PRIORITY`` with the next 50 of that
set, oracle-bearing first — compute it directly:
``set(registry) - union(json keys)``. The round-5-continuation
additions (lake_column_mapping_rename, ml_tree_depth2_exact,
ml_adaboost_round_exact, sample_coreset_sensitivity,
ingest_rowgroup_prune_audit, graph_louvain_one_sweep,
ingest_msgpack_stream, analytics_shapley_attribution,
graph_anf_bottomk, lake_check_constraint_gate,
ts_croston_intermittent, mm_audio_fingerprint_match,
analytics_price_index_fisher, graph_spectral_bisection,
topk_threshold_algorithm, ml_offpolicy_ips_eval,
ml_iv_two_stage_least_squares, st_watermark_late_audit_batch,
pipeline_rendezvous_reshard_audit, ml_xicor_correlation,
privacy_tokenize_referential, analytics_diff_in_diff,
ml_error_slice_finder, graph_weisfeiler_lehman,
lake_mor_flush_compaction, analytics_identity_stitching,
analytics_qini_auuc, ts_ljung_box_q) are all never-checked — front-load them in
round 6.
Front-load the round-5 session wave (span/delta/band-tuning dedup,
k-truss, PPR, temporal reachability, GBDT second-order, RF
stumps+OOB, pinball, EM/F1, fairness, uplift, binseg, period-detect,
mix-shift, clone, IVM join view, contribution bounding, DPO, SFT
gate, bitemporal, keyframes, bbox suppress, Matryoshka recall, GRIB2
packing matrix, Avro matrix, zip members, multiline CSV) — all
never-checked. Remaining families include the
agg/ts extras (agg_histogram_equifreq,
agg_mode_exact follow-ons, ts_cusum_changepoint, ts_obv_indicator,
ts_runs_test…), the join extras (join_bloom_prefilter,
join_interval_overlap, join_fuzzy_token_blocked…), ml_* eval pack,
mm_* remaining, pipeline_ops sampling family, sql_api remainder,
windows/analytics families; rounds 5-6 take the rest.
Ninth/tenth-wave additions (sim_ann_recall_eval, dedup_semantic_cluster,
join_fuzzy_token_blocked, mm_audio_energy, ts_ewma_trailing,
graph_triangle_count, ml_negative_sampling, plus the upgraded
sim_ann_lsh_buckets / sim_ann_ivf oracles) are also never-checked —
include them. So are the wave-18..26 additions (all oracle-bearing):
transform_global_row_number, sample_weighted_reservoir,
ml_chi2_feature_selection, graph_label_propagation,
analytics_price_trend_ols, analytics_item_item_cosine,
window_conditional_cumsum, nested_build_flatten_roundtrip,
text_arrow_native_stats, ml_target_encoding, ml_psi_drift,
agg_exact_median_twopass, sql_api_identifier_clause,
dedup_url_canonicalize, ml_calibration_reliability,
udtf_table_partition_by, scalar_collation_pack,
analytics_cohort_ltv_curve, ts_downsample_maxdev,
agg_skew_kurtosis_exact, graph_bfs_shortest_hops,
agg_weighted_median, ingest_dead_letter_split, ml_auc_exact,
dq_referential_integrity, pipeline_incremental_watermark,
mm_modality_router, agg_entropy_exact, transform_outlier_mad,
ingest_schema_evolution_merge, agg_gini_coefficient,
dedup_lsh_recall_eval. Waves 27-46 added (also never-checked, all
oracle-bearing): ml_kfold_assignment, window_alert_debounce,
window_median_rolling, analytics_bounce_rate, scalar_ip_cidr_ops,
sql_api_values_inline_table, text_boilerplate_strip, vector_dim_stats,
lake_time_travel_read, lake_stats_pruned_read,
sql_api_qualify_semantics, mm_phash_dedup, mm_phash_near_dup,
ml_embedding_covariance_matrix, spatial_point_in_polygon,
scalar_binary_pack, ts_autocorrelation, text_ngram_novelty,
join_null_key_skew_bypass, scalar_try_cast_pack, dq_freshness_lag,
ingest_fixed_width_parse, analytics_max_concurrency,
analytics_heatmap_hour_type, analytics_ratio_of_sums_pin,
ml_logreg_gradient_step, graph_degree_distribution,
window_forward_fill, analytics_new_vs_returning, ml_pr_curve_sweep,
reshape_nested_json_flatten, analytics_basket_lift,
text_contact_extraction, pipeline_run_manifest,
dq_benford_first_digit. Round-3 session additions (never-checked,
all oracle-bearing): agg_histogram_log_bins,
join_overlap_duration_billing, join_eager_aggregation_rewrite,
ml_linear_contributions, ml_learning_curve_subsample,
pipeline_shard_balanced, dq_cross_table_reconciliation,
spatial_geohash_cells, st_trending_topk_windows,
ml_ndcg_ranking_eval, ml_naive_bayes_train, ml_decision_stump_exact,
graph_hits_scores, graph_jaccard_link_prediction, ts_sax_symbolize,
agg_count_min_sketch, lake_deletion_vector_read, privacy_t_closeness,
graph_kcore_decomposition, ml_map_at_k_eval, sql_api_distinct_on,
pipeline_backfill_partitions, raster_overview_stats, ml_woe_encoding,
sql_api_recursive_reachability, analytics_dau_mau_stickiness,
pipeline_data_contract_check, mm_byte_diversity, ml_knn_classifier_eval,
graph_community_modularity, ml_uncertainty_sampling_rank,
dq_duplicate_key_audit, ts_bollinger_bands, ingest_cube_format_matrix,
ml_grouped_ols_multifeature, graph_assortativity,
sim_range_search_threshold, dq_split_leakage_near_dup,
lake_optimize_recluster, ts_harmonic_regression,
privacy_generalization_ladder, ts_longest_growth_streak,
dedup_shingle_size_sweep, ml_conformal_prediction_interval,
ml_ks_drift_binned, text_zipf_consistency, graph_reciprocity,
pipeline_featurize_infer_eval_e2e, pipeline_quality_filter_cascade,
cluster_dbscan_core_points, cluster_dbscan_labels,
lake_incremental_view_maintenance.
"""

from dmi_ingestor_spark.queries import (  # noqa: F401
    aggregates,
    bucketing,
    clustering,
    dedup,
    graph,
    ingestion,
    joins,
    mllib,
    multimodal,
    pipeline_ops,
    raster,
    relational,
    scd,
    reshape,
    scalars,
    setops,
    similarity,
    spatial,
    streaming,
    textops,
    tpch,
    udaf,
    windows,
)
from dmi_ingestor_spark.registry import REGISTRY

# Round-5 rotation: 50 slots, all never-driver-checked (the true
# never-checked count entering round 5 is 240 oracle-bearing = registry
# minus union(CORRECTNESS_r01..r04 keys); the old "~191" note was stale
# — VERDICT r4 item 1). This round front-loads (a) the round-4 waves
# that shipped after the last rotation (centrality triad, SCC, APSP,
# MST, DTW/matrix-profile, Viterbi, BM25/RAKE/Kneser-Ney, KMV/MG
# sketches, Fellegi-Sunter, lake vacuum/merge-matrix/evolution, Neyman),
# (b) the VERDICT item-7 HDF5 DENSE-group/libver-latest driver slot
# (ingest_hdf5_dense_param_sweep, new this round), and (c) long-waiting
# as-of/bucketed join and sketch names. ~190 oracle-bearing never-checked
# names remain after this rotation; rounds 6-9 take the rest at 50/round.
# Recompute each round:
#   set(load_all()) - union(json.load(open(f)) for f in CORRECTNESS_r0*.json)
_DRIVER_PRIORITY = [
    # VERDICT r4 item 7: v3-superblock + DENSE fractal-heap group decode
    "ingest_hdf5_dense_param_sweep",
    # Sketches / aggregates (5)
    "agg_approx_top_k",
    "agg_theta_sketch_setops",
    "agg_hll_custom_sketch",
    "agg_kmv_distinct_sketch",
    "agg_frequent_items_mg",
    # Time-series (5)
    "ts_dtw_distance",
    "ts_holt_winters",
    "ts_seasonal_decompose",
    "ts_theil_sen_slope",
    "ts_matrix_profile_ssd",
    # Graph — the round-4 classic-algorithm wave (7)
    "graph_closeness_centrality",
    "graph_betweenness_centrality",
    "graph_scc_decomposition",
    "graph_apsp_minplus",
    "graph_mst_boruvka",
    "graph_clustering_coefficient",
    "graph_random_walk_visits",
    # Dedup / clustering (3)
    "dedup_fellegi_sunter",
    "dedup_content_defined_chunking",
    "cluster_dbscan_lsh_blocked",
    # Join extras — as-of family + blocked edit distance + DPP (5)
    "join_asof_nearest_purchase",
    "join_asof_tolerance_bucketed",
    "join_edit_distance_blocked",
    "join_dpp_partition_prune",
    "bucketed_colocated_join",
    # ML — the round-4 additions (10)
    "ml_viterbi_decode",
    "ml_pca_power_iteration",
    "ml_als_half_step",
    "ml_isotonic_calibration",
    "ml_bleu_ngram_eval",
    "ml_permutation_importance",
    "ml_lift_gain_deciles",
    "ml_spearman_rank_corr",
    "ml_kendall_tau",
    "ml_mann_whitney_u",
    # Multimodal (3)
    "mm_audio_vad_segments",
    "mm_cross_modal_alignment",
    "mm_image_patches",
    # Text — the round-4 LLM-pipeline wave (6)
    "text_bm25_scoring",
    "text_rake_keyphrases",
    "text_kneser_ney_counts",
    "text_heaps_law_fit",
    "text_mlm_masking",
    "text_chat_template_render",
    # Lakehouse / pipeline / analytics (5)
    "lake_vacuum_audit",
    "lake_merge_full_matrix",
    "lake_partition_evolution_read",
    "sample_neyman_allocation",
    "analytics_anova_oneway",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
