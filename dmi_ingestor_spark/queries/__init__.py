"""Query modules. Importing this package populates the registry.

The driver's per-round CORRECTNESS check covers the FIRST 50 registry
entries in insertion order, so ``_DRIVER_PRIORITY`` below explicitly
front-loads the queries that most need a fresh driver row this round.
Queries not in the priority list keep their import-order position
after it, so nothing is ever dropped — only rotated.

Round-8+ note (repeat each round until the backlog drains): the
never-driver-checked set is the registry minus the keys of all
``CORRECTNESS_r0N.json`` files; rows-only-by-design names (streaming
execution, text_compression_ratio) are excluded from the hash rotation.
Start of the round-8 session: 536 registered, 523 oracle-bearing;
driver has checked 339 distinct names (335 full-green, 4 rows-only,
0 red), so the oracle-bearing never-checked backlog is 188. The r8
rotation below takes the first 50 in registry order (oldest families
first, per VERDICT r7 item 2), leaving 138 for rounds 9-11 at
50/round. Compute the next rotation directly::

    set(REGISTRY) - set().union(*(json.load(open(f)) for f in
                                  glob.glob("CORRECTNESS_r0*.json")))

oracle-bearing first (``name in oracle_sql()``), oldest families first.
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

# Round-8 rotation: 50 slots, ALL from the never-driver-checked
# oracle-bearing backlog (188 entering this round = 523 oracle-bearing
# - union(CORRECTNESS_r01..r07 keys); VERDICT r7 item 2). Oldest
# families first in registry insertion order: the remaining ingest
# format matrices, the join-semantics pack, the entire never-checked
# mllib family (31 names — includes the sf0.5-overflow-fixed 2SLS,
# logreg step, Spearman, adaboost/tree GINI), the multimodal pack,
# and the first pipeline_ops names. NO rows-only-by-design names.
# ~138 remain after this rotation; rounds 9-11 take the rest at
# 50/round. Recompute each round:
#   set(REGISTRY) - union(json.load(open(f)) for f in CORRECTNESS_r0*.json)
_DRIVER_PRIORITY = [
    "ingest_zip_members_csv",
    "ingest_avro_container_matrix",
    "ingest_csv_quoted_multiline",
    "ingest_rowgroup_prune_audit",
    "ingest_msgpack_stream",
    "join_range_binned_funnel",
    "join_null_safe_semantics",
    "join_right_outer_lineitem_customer",
    "join_eager_aggregation_rewrite",
    "ml_minhash_lsh_join",
    "ml_brp_lsh_ann",
    "ml_feature_hashing",
    "ml_target_encoding",
    "ml_calibration_reliability",
    "ml_kfold_assignment",
    "ml_embedding_covariance_matrix",
    "ml_logreg_gradient_step",
    "ml_pr_curve_sweep",
    "ml_poisson_bootstrap_ci",
    "ml_gbdt_histogram_build",
    "ml_logreg_inference_batch",
    "ml_mrr_ranking_eval",
    "ml_linear_contributions",
    "ml_learning_curve_subsample",
    "ml_naive_bayes_train",
    "ml_map_at_k_eval",
    "ml_woe_encoding",
    "ml_uncertainty_sampling_rank",
    "ml_grouped_ols_multifeature",
    "ml_gbdt_second_order_gain",
    "ml_random_forest_stumps",
    "ml_quantile_pinball_eval",
    "ml_oob_error_estimate",
    "ml_fairness_group_metrics",
    "ml_cohen_kappa_agreement",
    "ml_error_slice_finder",
    "ml_tree_depth2_exact",
    "ml_adaboost_round_exact",
    "ml_iv_two_stage_least_squares",
    "ml_xicor_correlation",
    "mm_resize_stride",
    "mm_audio_energy",
    "mm_modality_router",
    "mm_phash_near_dup",
    "mm_video_keyframe_select",
    "mm_bbox_iou_suppress",
    "mm_audio_fingerprint_match",
    "decontaminate_ngram_overlap",
    "pack_sequences_cumsum",
    "text_repetition_filter",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
