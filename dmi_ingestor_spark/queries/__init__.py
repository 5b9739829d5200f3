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
Start of the round-10 session: 536 registered, 523 oracle-bearing;
driver has checked 439 distinct names, so the oracle-bearing
never-checked backlog is 88. The r10 rotation below takes the first
50 in registry order (oldest families first, per VERDICT r9 item 7),
leaving 38 for round 11. Compute the next rotation directly::

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

# Round-10 rotation: 50 slots, ALL from the never-driver-checked
# oracle-bearing backlog (88 entering this round = 523 oracle-bearing
# - union(CORRECTNESS_r01..r09 keys); VERDICT r9 item 7). First 50 of
# the backlog in registry insertion order (oldest families first): the
# reshape/udtf/scalar stragglers, the similarity/vector evaluation
# family, the spatial + streaming-twin stragglers, the textops tail,
# and the first windows/analytics names. NO rows-only-by-design names.
# 38 remain after this rotation; round 11 drains them. Recompute each
# round:
#   set(REGISTRY) - union(json.load(open(f)) for f in CORRECTNESS_r0*.json)
_DRIVER_PRIORITY = [
    "topk_threshold_algorithm",
    "udtf_rle_tokens",
    "reshape_explode_outer_nulls",
    "reshape_explode_map",
    "udtf_analyze_polymorphic",
    "pivot_dynamic_priority",
    "scalar_levenshtein_pairs",
    "scalar_try_arithmetic",
    "scalar_xml_parse",
    "scalar_array_index_semantics",
    "scalar_business_days",
    "scalar_collation_pack",
    "scalar_ip_cidr_ops",
    "scalar_binary_pack",
    "scalar_luhn_checksum",
    "sim_ann_recall_eval",
    "vector_int8_quantize",
    "ml_negative_sampling",
    "vector_dim_stats",
    "ml_knn_classifier_eval",
    "sim_range_search_threshold",
    "vector_quantize_error_audit",
    "sim_matryoshka_prefix_recall",
    "spatial_radius_join_grid",
    "spatial_point_in_polygon",
    "spatial_geohash_cells",
    "spatial_idw_interpolation",
    "st_static_join_batch",
    "st_foreachbatch_upsert",
    "st_transform_with_state",
    "analytics_bounce_rate",
    "st_trending_topk_windows",
    "text_lm_score",
    "text_bpe_merges",
    "text_bpe_apply",
    "ml_eval_confusion_lang_id",
    "text_arrow_native_stats",
    "text_boilerplate_strip",
    "text_ngram_novelty",
    "text_contact_extraction",
    "text_cooccurrence_pmi",
    "text_zipf_consistency",
    "text_containment_search",
    "ml_llm_eval_em_f1",
    "text_sft_format_validate",
    "pipeline_dpo_pair_construction",
    "cogroup_reconcile_pandas",
    "window_rank_variants",
    "cohort_weekly_retention",
    "funnel_conversion_3step",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
