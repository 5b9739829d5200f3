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

Round-3 note (do this at the START of round 3, not before round 2's
driver check runs): 97 queries still have no driver row after r1+r2.
Replace ``_DRIVER_PRIORITY`` with the first 50 of the never-checked
set, oracle-bearing first — compute it as
``[n for n in REGISTRY if n not in CORRECTNESS_r01 keys and n not in
CORRECTNESS_r02 keys]`` — e.g. the agg_* extras, dedup third-wave
rungs, pipeline_ops family, sql_api_* pack, scd/cdc, reshape/scalar
extras, setop_*_all; round 4 takes the remainder (sim_* rows-only,
st_stream_* rows-only, windows extras, ts_*, analytics_top_paths).
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
dq_benford_first_digit.
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

# Round-2 rotation: 50 slots. 49 previously-unchecked oracle-bearing
# queries + the repaired mm_decode_features.
_DRIVER_PRIORITY = [
    # TPC-H shapes unchecked in round 1 (20)
    "q2_min_cost_part",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_dominant_supplier",
    "q21_last_shipper",
    "q22_sales_opportunity",
    # Set operations (4)
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    # Window pack + top-k (5)
    "window_rank_orders_per_customer",
    "window_lag_lead_events",
    "window_running_sum",
    "window_first_last_value",
    "sort_limit_top_orders",
    # Text analysis (6)
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "text_lang_id",
    "text_tfidf_top_terms",
    "text_hash_split",
    # Similarity search exact top-k (1)
    "sim_topk_bruteforce",
    # UDAF surface (3)
    "udaf_centroid_pandas",
    "centroid_per_label_builtin",
    "udaf_grouped_mean_acctbal",
    # Streaming batch twins (5)
    "st_tumbling_counts",
    "st_sliding_counts",
    "st_session_windows",
    "st_dedup_by_key",
    "sessionize_events_lag",
    # Remaining scalar packs (4; scalar_date_arithmetic +
    # scalar_conditional_pack + scalar_levenshtein_pairs rotate in next)
    "scalar_variant_json",
    "scalar_math_pack",
    "scalar_json_events",
    "scalar_map_pack",
    # Repaired in round 2: previously the only hard CORRECTNESS error
    "mm_decode_features",
    # New in round 2: S4/U3 GeoTIFF export, byte-parity oracle
    "raster_export_manifest",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
