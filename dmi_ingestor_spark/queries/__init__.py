"""Query modules. Importing this package populates the registry.

The driver's per-round CORRECTNESS check covers the FIRST 50 registry
entries in insertion order, so ``_DRIVER_PRIORITY`` below explicitly
front-loads the queries that most need a fresh driver row this round.
Queries not in the priority list keep their import-order position
after it, so nothing is ever dropped — only rotated.

Round-7+ note (repeat each round until the backlog drains): the
never-driver-checked set is the registry minus the keys of all
``CORRECTNESS_r0N.json`` files; rows-only-by-design names (streaming
execution, text_compression_ratio) are excluded from the hash rotation.
Start of the round-7 session: 536 registered, 523 oracle-bearing;
driver has checked 289 distinct names (285 full-green, 4 rows-only,
0 red), so the oracle-bearing never-checked backlog is 238. The r7
rotation below takes 50 of it (the 31 round-6 session additions
first, per VERDICT r6 items 1 and 5), leaving ~188 for rounds 8-11
at 50/round. Compute the next rotation directly::

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

# Round-7 rotation: 50 slots, ALL from the never-driver-checked
# oracle-bearing backlog (238 entering this round = 523 oracle-bearing
# - union(CORRECTNESS_r01..r06 keys) overlap; VERDICT r6 item 1).
# First the 31 round-6 session additions incl. the St4 batch watermark
# audit (VERDICT r6 item 5), then 19 older-family names chosen for §2
# evidence value (S5 partition-prune, St3 dynamic gap, judge-sample
# names promoted to hard driver rows). NO rows-only-by-design names
# (VERDICT r6: r6 wasted 4 slots re-confirming no_oracle). ~188 remain
# after this rotation; rounds 8-11 take the rest at 50/round.
# Recompute each round:
#   set(REGISTRY) - union(json.load(open(f)) for f in CORRECTNESS_r0*.json)
_DRIVER_PRIORITY = [
    "agg_distinct_salted_twophase",
    "analytics_adstock_carryover",
    "analytics_twap_vwap",
    "dedup_phonetic_block_join",
    "graph_bipartite_projection",
    "graph_bom_explosion",
    "graph_triad_motif_census",
    "ingest_gorilla_timeseries",
    "ingest_met_derive_wind_dewpoint",
    "ingest_mime_header_parse",
    "ingest_protobuf_delimited_stream",
    "ingest_regrid_conservative",
    "join_fifo_cost_allocation",
    "layout_roaring_bitmap_index",
    "ml_offpolicy_doubly_robust",
    "ml_offpolicy_ips_eval",
    "ml_propensity_caliper_matching",
    "ml_wasserstein_drift_binned",
    "mm_multipart_reassembly",
    "pipeline_retrieval_e2e",
    "sample_systematic_every_k",
    "scalar_semver_compare",
    "sim_maxsim_late_interaction",
    "spatial_trajectory_path_stats",
    "st_watermark_late_audit_batch",
    "text_code_detection_router",
    "text_vocab_oov_coverage",
    "transform_interval_coalesce",
    "ts_control_chart_nelson",
    "vector_hamming_topk",
    "vector_mips_norm_augment",
    "join_asof_next_purchase_after_click",
    "window_frame_semantics",
    "window_conditional_cumsum",
    "st_session_dynamic_gap",
    "layout_partition_prune_count",
    "sim_pq_adc",
    "text_bigram_lm",
    "text_inverted_index",
    "text_pii_scrub",
    "sample_cap_per_domain",
    "sample_stratified_hash",
    "join_bitemporal_as_of",
    "window_gaps_islands",
    "scalar_map_hof_pack",
    "scalar_bitwise_pack",
    "reshape_union_by_name_evolution",
    "profile_table_stats",
    "dq_expectations_summary",
    "lake_incremental_view_maintenance",
]


def _reorder() -> None:
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
