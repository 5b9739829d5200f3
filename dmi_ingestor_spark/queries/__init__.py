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
Start of the round-9 session: 536 registered, 523 oracle-bearing;
driver has checked 389 distinct names (385 full-green, 4 rows-only,
0 red), so the oracle-bearing never-checked backlog is 138. The r9
rotation below takes the first 50 in registry order (oldest families
first, per VERDICT r8 item 1), leaving 88 for rounds 10-11 at
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

# Round-9 rotation: 50 slots, ALL from the never-driver-checked
# oracle-bearing backlog (138 entering this round = 523 oracle-bearing
# - union(CORRECTNESS_r01..r08 keys); VERDICT r8 item 1). Oldest
# families first in registry insertion order: the pipeline_ops
# sampling/mixing/sharding/privacy/dq/lake names, the first raster
# and relational stragglers, and the sql_api surface pack. NO
# rows-only-by-design names. 88 remain after this rotation;
# rounds 10-11 take the rest at 50/round. Recompute each round:
#   set(REGISTRY) - union(json.load(open(f)) for f in CORRECTNESS_r0*.json)
_DRIVER_PRIORITY = [
    "mix_strata_weighted",
    "table_diff_rowhash",
    "shuffle_deterministic_hash",
    "pipeline_e2e_corpus",
    "sample_bernoulli_hash",
    "text_chunk_sliding",
    "sample_exact_stratified",
    "privacy_k_anonymity",
    "profile_skew_keys",
    "sample_weighted_reservoir",
    "dq_freshness_lag",
    "pipeline_run_manifest",
    "privacy_l_diversity",
    "pipeline_curriculum_order",
    "mix_temperature_sampling",
    "lake_mv_rollup_rewrite",
    "pipeline_shard_balanced",
    "dq_cross_table_reconciliation",
    "privacy_t_closeness",
    "analytics_dau_mau_stickiness",
    "pipeline_data_contract_check",
    "dq_duplicate_key_audit",
    "pipeline_quality_filter_cascade",
    "privacy_generalization_ladder",
    "pipeline_featurize_infer_eval_e2e",
    "pipeline_dataset_card",
    "dq_anomaly_rolling_zscore",
    "transform_delta_varint_audit",
    "privacy_contribution_bounding",
    "lake_clone_shallow",
    "lake_ivm_join_view",
    "lake_column_mapping_rename",
    "sample_coreset_sensitivity",
    "lake_check_constraint_gate",
    "pipeline_rendezvous_reshard_audit",
    "privacy_tokenize_referential",
    "lake_mor_flush_compaction",
    "dq_invalid_rate_drift",
    "dq_sequence_gap_audit",
    "raster_overview_stats",
    "skyline_pareto_parts",
    "sql_api_join_hints",
    "anomaly_zscore_acctbal",
    "sql_api_filter_clause",
    "sql_api_pipe_syntax",
    "sql_api_session_variables",
    "sql_api_identifier_clause",
    "sql_api_values_inline_table",
    "sql_api_distinct_on",
    "sql_api_recursive_reachability",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
