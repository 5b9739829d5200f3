"""Scale-sweep harness: time representative queries across sf0.001 /
sf0.01 / sf0.1 and report the growth exponent of each.

Usage::

    python tools/scale_sweep.py            # writes SCALING.md
    python tools/scale_sweep.py q1_pricing_summary dedup_minhash_lsh

Data volume grows 10× per step; a scan-bound query should grow ≲10×
wall per step (slope ≤ 1.0 in log-log), a quadratic one 100× (slope 2).
The measured slope between sf0.01 → sf0.1 (the larger, less
overhead-dominated step) is the headline number — small-SF timings are
dominated by fixed planning/JVM cost, so slopes well BELOW 1 are
expected there and simply mean the cluster is underfed.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmi_ingestor_spark.registry import load_all
from dmi_ingestor_spark.session import get_spark

SF_DIRS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]

# Optional 4th point one half-decade up, from a tools/gen_full_sf.py
# fixture (the shipped testdata stops at sf0.1). Enabled when the env
# var points at a generated directory; the slope for this step is
# normalized per-decade: log10(t4/t3) / log10(5).
EXTRA_SF_DIR = os.environ.get("SCALE_SWEEP_SF05_DIR", "")
if EXTRA_SF_DIR and os.path.isdir(EXTRA_SF_DIR):
    SF_DIRS = SF_DIRS + [(EXTRA_SF_DIR, 0.5)]

DEFAULT_QUERIES = [
    "q1_pricing_summary",          # scan + partial/final agg
    "q9_product_profit",           # multiway broadcast + fact join
    "filter_project",              # pushdown-bound scan
    "dedup_minhash_lsh",           # candidate-bucketed self-join
    "spatial_radius_join_grid",    # grid-cell spatial join
    "dedup_paragraph_rewrite",     # explode + 2 keyed aggregates
    "join_interval_overlap",       # bucketed range join
    "window_rank_orders_per_customer",  # per-key window
    "sim_topk_bruteforce",         # broadcast ANN baseline
    "text_tfidf_top_terms",        # explode-heavy text agg
    "transform_global_row_number",  # range-partitioned enumeration
    "agg_exact_median_twopass",    # histogram selection, no global sort
    "ml_chi2_feature_selection",   # distinct doc-token + bounded-key agg
    "dedup_url_canonicalize",      # string-normalize + exact-dup agg
    "graph_pagerank_trade",        # iterative: fact-fact edge build + broadcast rounds
    "cluster_kmeans_embeddings",   # iterative: map-side argmin, k-row shuffle per round
    "analytics_rfm_segments",      # 3x sharded exact rank + reassembly joins
    "agg_histogram_equifreq",      # sharded exact NTILE, no SinglePartition sort
    "graph_hits_scores",           # iterative: broadcast-chain rounds, fixed rescale
    "graph_kcore_decomposition",   # iterative peeling: per-order self-join edge build
    "cluster_dbscan_core_points",  # 9-cell grid-blocked eps-neighborhood equi-join
    # round-4 additions
    "text_bm25_scoring",           # two token-count shuffles + vocab-keyed join
    "graph_betweenness_centrality",  # all-pairs rounds on |V|^2 summary state
    "ml_als_half_step",            # ratings shuffle + 6-sum grouped solve
    "text_rake_keyphrases",        # segmentation window + vocab-keyed stats
    "lake_merge_full_matrix",      # full-outer merge-key shuffle + txlog commit
    # round-5 additions (VERDICT r4 item 4): the heaviest round-4 shapes
    "graph_closeness_centrality",  # pair-state BFS rounds, |V|^2 summary state
    "graph_scc_decomposition",     # forward-backward label iteration
    "graph_apsp_minplus",          # min-plus squaring on |V|^2 pair state
    "ts_matrix_profile_ssd",       # windowed self-similarity on reduced series
    "join_edit_distance_blocked",  # FastSS deletion-neighborhood blocked join
    # round-5 session additions
    "dedup_exact_span_ngram",      # 13-gram span df, md5-keyed, no pair join
    "dedup_incremental_delta_probe",  # delta-vs-base banded probe
    "graph_ktruss_peeling",        # per-round wedge enumeration + support peel
    "ml_gbdt_second_order_gain",   # g/h histograms + O(bins) sweep
    # round-5 continuation additions
    "graph_louvain_one_sweep",     # fact edge build + summary gain argmax
    "graph_spectral_bisection",    # checkpointed deflated power iteration
    "ml_xicor_correlation",        # 2x sharded rank + boundary-stitched jumps
    "sample_coreset_sensitivity",  # two 1-row broadcast aggs, zero corpus shuffle
    "mm_audio_fingerprint_match",  # Arrow decode + hash-join offset voting
    # round-6 session additions
    "sim_maxsim_late_interaction",  # token explode + label-blocked join
    "text_vocab_oov_coverage",     # token agg + TakeOrdered cut + broadcast join
    "sample_systematic_every_k",   # sharded global order + map-side filter
    "layout_roaring_bitmap_index", # container groupBy + Arrow codec pass
    "vector_hamming_topk",         # zero-shuffle sign fold + broadcast popcount
    "dq_sequence_gap_audit",       # bucket-partitioned lag + O(buckets) stitch
    "ml_propensity_caliper_matching",  # sorted score-grain nearest match (r8 rewrite)
    # round-9 additions: the sf1 sweep's catch shapes, tracked so a
    # future plan change that re-quadratizes them shows as a slope jump
    "dedup_ngram_jaccard",         # rare count-join + warm/blazing band completion
    "dedup_phonetic_block_join",   # closed-form candidate count (r9 rewrite)
    "text_cooccurrence_pmi",       # windowed token self-join, integral div ratio
    # round-10 additions: the Arrow-kernel similarity rewrites and the
    # newly kernelized single-shot graph shapes (VERDICT r9 items 1/5/6)
    "agg_count_min_sketch",        # key-grain sketch build (r9 rewrite)
    "sim_ann_lsh_buckets",         # numpy signature + per-bucket gram (r10)
    "sim_ann_ivf",                 # one-pass assign/probe/score kernel (r10)
    "sim_pq_adc",                  # numpy encode + ADC LUT kernel (r10)
    "ml_knn_classifier_eval",      # 50-fold gram kernel + vote windows (r10)
    "pipeline_retrieval_e2e",      # sign-pack + shortlist + rerank kernel (r10)
    "ml_negative_sampling",        # one-pass pos+neg candidate kernel (r10)
    "graph_triangle_count",        # summary kernel wedge enumeration (r10)
    "graph_jaccard_link_prediction",  # summary kernel wedge prediction (r10)
    "graph_degree_distribution",   # summary kernel histogram (r10)
    "graph_bom_explosion",         # frontier descent, fused per-level probe (r10)
]

# Everything in SCALING.md from this line onward is MANUAL content
# (slope footnotes, spot-bench sections): regeneration preserves it
# verbatim. Round-7 lesson: a regeneration without this clobbered the
# sf1 spot-bench section (VERDICT r7 item 3).
MANUAL_MARKER = (
    "<!-- MANUAL SECTIONS — scale_sweep.py preserves everything below "
    "this line verbatim on regeneration -->"
)


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    registry = load_all()
    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # JVM warmup

    rows: list[tuple[str, list[float]]] = []
    for name in names:
        spec = registry[name]
        times: list[float] = []
        for sf_dir, _sf in SF_DIRS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        rows.append((name, times))
        print(f"{name}: " + "  ".join(f"{t:.2f}s" for t in times), flush=True)

    out = [
        "# SCALING — measured sf-sweep (generated by tools/scale_sweep.py)",
        "",
        "Wall time (min of 2 runs, local[32]) per scale factor; `slope` is",
        "log10(t_sf0.1 / t_sf0.01) — the growth exponent over a 10× data step",
        "(1.0 = linear, 2.0 = quadratic; <1 = fixed costs still dominate).",
        "",
        (
            "| query | sf0.001 | sf0.01 | sf0.1 | slope (0.01→0.1) "
            "| sf0.5 | slope/decade (0.1→0.5) |"
            if len(SF_DIRS) == 4
            else "| query | sf0.001 | sf0.01 | sf0.1 | slope (0.01→0.1) |"
        ),
        "|---|---|---|---|---|---|---|" if len(SF_DIRS) == 4 else "|---|---|---|---|---|",
    ]
    for name, times in rows:
        t1, t2, t3 = times[:3]
        slope = math.log10(t3 / t2) if t2 > 0 else float("nan")
        line = f"| {name} | {t1:.2f}s | {t2:.2f}s | {t3:.2f}s | {slope:.2f} |"
        if len(times) == 4:
            s4 = math.log10(times[3] / t3) / math.log10(5) if t3 > 0 else float("nan")
            line += f" {times[3]:.2f}s | {s4:.2f} |"
        out.append(line)
    out += [
        "",
        "Every slope ≤ ~1 is evidence the plan scales linearly in input size —",
        "no quadratic candidate generation, no driver-side collect bottleneck.",
        "Sub-linear slopes mean per-query fixed cost (planning, Python/Arrow",
        "setup, shuffle latency floors) still dominates at these SFs; at",
        "cluster scale those amortize while the linear term parallelizes.",
        "",
    ]
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    # Preserve everything from the manual marker onward (footnotes,
    # spot-bench sections) — regeneration must never eat hand-written
    # analysis again.
    manual = None
    if os.path.exists(path):
        existing = open(path).read()
        if MANUAL_MARKER not in existing:
            # An existing SCALING.md without the marker means someone
            # edited it away — regenerating would silently clobber every
            # hand-written footnote (the exact failure the marker
            # prevents). Refuse instead of falling back to the stub.
            print(
                "ERROR: SCALING.md exists but lacks the MANUAL_MARKER line; "
                "refusing to overwrite (re-add the marker or delete the "
                "file first).",
                file=sys.stderr,
            )
            return 1
        manual = existing[existing.index(MANUAL_MARKER):].rstrip() + "\n"
    if manual is None:
        manual = MANUAL_MARKER + "\n\n## Slope footnotes (known, justified)\n\n(none yet)\n"
    with open(path, "w") as f:
        f.write("\n".join(out) + manual)
    print("wrote SCALING.md (manual sections preserved)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
