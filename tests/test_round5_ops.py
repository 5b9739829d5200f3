"""Invariant tests for the round-5 operator wave.

The oracle-parity gate (test_oracle_parity.py) already pins every new
query hash-exact against DuckDB; these tests assert the ALGORITHMIC
properties the hashes alone don't articulate — peeling monotonicity,
banding containment, out-of-bag fractions, decomposition identities —
so a future refactor that keeps two engines wrong in the same way
still fails.
"""

from __future__ import annotations

import math

from dmi_ingestor_spark.registry import load_all

REGISTRY = load_all()


def _get(name, spark, sf_dir, cache={}):
    key = (name, sf_dir)
    if key not in cache:
        cache[key] = REGISTRY[name].builder(spark, sf_dir).collect()
    return cache[key]


def test_ktruss_trace_is_consistent_and_monotone(spark, sf_dir):
    rs = sorted(_get("graph_ktruss_peeling", spark, sf_dir), key=lambda r: r.round)
    for r in rs:
        assert 0 <= r.n_surviving <= r.n_edges
        assert r.n_triangles >= 0
    # next round starts from this round's survivors
    for a, b in zip(rs, rs[1:]):
        assert b.n_edges == a.n_surviving


def test_personalized_pagerank_mass_reaches_non_sources(spark, sf_dir):
    rs = _get("graph_personalized_pagerank", spark, sf_dir)
    assert all(r.ppr_scaled >= 0 for r in rs)
    sources = [r for r in rs if r.in_source == 1]
    others = [r for r in rs if r.in_source == 0]
    assert sources and others
    # restart mass keeps every source strictly positive; propagation
    # must deliver mass to at least one non-source node
    assert all(r.ppr_scaled > 0 for r in sources)
    assert any(r.ppr_scaled > 0 for r in others)


def test_span_dedup_fractions_bounded(spark, sf_dir):
    rs = _get("dedup_exact_span_ngram", spark, sf_dir)
    for r in rs:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0 <= r.dup_permille <= 1000


def test_delta_probe_novelty_flag_consistent(spark, sf_dir):
    rs = _get("dedup_incremental_delta_probe", spark, sf_dir)
    for r in rs:
        assert r.delta_id % 10 == 0
        assert 0 <= r.n_dup <= r.n_candidates
        assert r.is_novel == (1 if r.n_dup == 0 else 0)


def test_binseg_has_unique_argmax_and_consistent_sizes(spark, sf_dir):
    rs = _get("ts_changepoint_binseg", spark, sf_dir)
    assert sum(r.is_best for r in rs) == 1
    n = rs[0].n_left + rs[0].n_right
    for r in rs:
        assert r.n_left + r.n_right == n
        assert r.mean_gap_scaled >= 0


def test_forest_stumps_vote_structure(spark, sf_dir):
    rs = _get("ml_random_forest_stumps", spark, sf_dir)
    assert len(rs) == 5
    assert sum(r.is_modal for r in rs) >= 1
    modal_thresholds = {r.best_threshold for r in rs if r.is_modal}
    assert len(modal_thresholds) == 1


def test_oob_fraction_near_poisson_zero_mass(spark, sf_dir):
    from dmi_ingestor_spark.catalog import table

    rs = _get("ml_oob_error_estimate", spark, sf_dir)
    n = table(spark, sf_dir, "part").count()
    for r in rs:
        assert 0 <= r.n_err <= r.n_oob
        assert 0 <= r.err_permille <= 1000
        # P(weight=0) = e^-1 ~ 0.368; wide tolerance for small sf
        frac = r.n_oob / n
        assert abs(frac - math.exp(-1)) < 0.08, frac


def test_pinball_loss_nonnegative_and_pred_stable(spark, sf_dir):
    rs = _get("ml_quantile_pinball_eval", spark, sf_dir)
    by_grp = {}
    for r in rs:
        assert r.pinball_sum_scaled >= 0
        by_grp.setdefault(r.grp, set()).add(r.pred_cents)
    for preds in by_grp.values():
        assert len(preds) == 1  # same predictor at every quantile


def test_keyframes_partition_all_frames(spark, sf_dir):
    rs = _get("mm_video_keyframe_select", spark, sf_dir)
    by_doc = {}
    for r in rs:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, shots in by_doc.items():
        assert sum(s.n_frames for s in shots) == 4
        ids = sorted(s.shot_id for s in shots)
        assert ids == list(range(len(ids)))


def test_ivm_join_view_equals_direct_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from dmi_ingestor_spark.catalog import table

    rs = {r.nationkey: (r.n_rows, r.key_checksum)
          for r in _get("lake_ivm_join_view", spark, sf_dir)}
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    a_new = o.filter(
        (F.col("o_orderkey") % 7 == 0)
        | ((F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 11 != 0))
    )
    b_new = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    direct = {
        r.nationkey: (r.n, r.ck)
        for r in a_new.join(b_new, a_new.o_custkey == b_new.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("ck"),
        )
        .collect()
    }
    assert rs == direct


def test_em_f1_known_by_construction(spark, sf_dir):
    rs = {r.bucket: r for r in _get("ml_llm_eval_em_f1", spark, sf_dir)}
    assert rs[0].em_permille == 1000
    assert rs[0].mean_f1_permille == 1000
    assert rs[1].mean_f1_permille == 1000  # reversal keeps the multiset
    assert rs[2].em_permille == 0
    assert rs[2].mean_f1_permille <= 667  # truncated half: 2*4/(4+8)


def test_mix_shift_shares_sum_to_one(spark, sf_dir):
    rs = _get("analytics_mix_shift_decomposition", spark, sf_dir)
    for col in ("w1_ppm", "w2_ppm"):
        total = sum(getattr(r, col) for r in rs)
        assert 10**6 - len(rs) <= total <= 10**6
    for r in rs:
        assert 0 <= r.r1_ppm <= 10**6 and 0 <= r.r2_ppm <= 10**6


def test_period_detect_unique_argmax(spark, sf_dir):
    rs = _get("ts_period_detect_argmax", spark, sf_dir)
    assert sum(r.is_best for r in rs) == 1
    assert all(r.ssb_scaled >= -len(rs) for r in rs)


def test_lsh_band_tuning_containment_ordering(spark, sf_dir):
    rs = {r.cfg: r for r in _get("dedup_lsh_band_tuning", spark, sf_dir)}
    # a 4x4 band match implies both 2-row halves match (8x2 candidates
    # are a superset); likewise 2x8 vs 4x4
    assert rs["2x8"].n_candidates <= rs["4x4"].n_candidates <= rs["8x2"].n_candidates
    assert rs["2x8"].n_verified <= rs["4x4"].n_verified <= rs["8x2"].n_verified
    for r in rs.values():
        assert 0 <= r.precision_permille <= 1000
        assert 0 <= r.recall_permille <= 1000


def test_contribution_bounding_caps_hold(spark, sf_dir):
    rs = _get("privacy_contribution_bounding", spark, sf_dir)
    for r in rs:
        assert r.bounded_events <= r.raw_events
        assert r.bounded_events <= r.n_users * 20
        assert r.bounded_value_cents <= r.raw_value_cents
        assert r.l1_sensitivity_cents == 20 * 1500


def test_sft_gate_counts_consistent(spark, sf_dir):
    (r,) = _get("text_sft_format_validate", spark, sf_dir)
    for c in (r.n_ends_with_user, r.n_empty_message, r.n_role_repeat, r.n_clean):
        assert 0 <= c <= r.n_records
    assert r.clean_permille == 1000 * r.n_clean // r.n_records


def test_tree_depth2_structure_and_gini_improves(spark, sf_dir):
    rs = {r.node: r for r in _get("ml_tree_depth2_exact", spark, sf_dir)}
    assert set(rs) == {"root", "L", "R"}
    root = rs["root"]
    # children partition the root's rows
    assert rs["L"].n_node + rs["R"].n_node == root.n_node
    assert rs["L"].pos_node + rs["R"].pos_node == root.pos_node
    for r in rs.values():
        assert 0 <= r.pos_node <= r.n_node
        # scaled Gini of a binary split is bounded by 0.5 * scale
        assert 0 <= r.gini_scaled <= 5 * 10**7
        assert r.feature in ("p_size", "name_len")


def test_adaboost_round_errors_bounded(spark, sf_dir):
    rs = sorted(_get("ml_adaboost_round_exact", spark, sf_dir),
                key=lambda r: r.round)
    assert [r.round for r in rs] == [1, 2]
    r1, r2 = rs
    # a majority-vote stump can never misclassify more than half
    assert 0 <= r1.err_w * 2 <= r1.tot_w
    assert 0 <= r2.err_w * 2 <= r2.tot_w
    # round-2 total weight = 2 * M * (N - M) by the integer update
    m, n = r1.err_w, r1.tot_w
    if m > 0:
        assert r2.tot_w == 2 * m * (n - m)


def test_cohen_kappa_in_range(spark, sf_dir):
    rs = _get("ml_cohen_kappa_agreement", spark, sf_dir)
    for r in rs:
        assert -10**6 <= r.kappa_ppm <= 10**6


def test_diff_in_diff_identity(spark, sf_dir):
    rs = _get("analytics_diff_in_diff", spark, sf_dir)
    cells = {(r.treated, r.post): r for r in rs}
    assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    est = (cells[(1, 1)].rate_ppm - cells[(1, 0)].rate_ppm) - (
        cells[(0, 1)].rate_ppm - cells[(0, 0)].rate_ppm
    )
    # every row carries the same DiD estimate, and it satisfies the
    # four-cell identity
    assert {r.did_ppm for r in rs} == {est}
    for r in rs:
        assert 0 <= r.rate_ppm <= 10**6 and r.n > 0


def test_error_slice_finder_support_floor(spark, sf_dir):
    rs = _get("ml_error_slice_finder", spark, sf_dir)
    assert 0 < len(rs) <= 5
    for r in rs:
        assert 0 <= r.n_err <= r.n
        assert 0 <= r.err_permille <= 1000
    # worst-first ordering by the scaled error rate
    rates = [r.err_permille for r in rs]
    assert rates == sorted(rates, reverse=True)


def test_coreset_weights_and_sensitivity_positive(spark, sf_dir):
    rs = _get("sample_coreset_sensitivity", spark, sf_dir)
    assert rs  # far outliers have inclusion prob ~1, so never empty
    for r in rs:
        assert r.sens_ppb > 0
        assert r.weight_scaled >= 0
    # the uniform floor: every point's sensitivity >= 1/(2n) (scaled)
    assert all(r.sens_ppb >= 1 for r in rs)


def test_rowgroup_prune_audit_bounds(spark, sf_dir):
    (r,) = _get("ingest_rowgroup_prune_audit", spark, sf_dir)
    assert 0 <= r.n_groups_live <= r.n_rowgroups
    assert 0 <= r.n_rows_matching <= r.n_rows_total
    # skipped groups exist whenever the predicate is selective
    if r.n_rows_matching < r.n_rows_total:
        assert r.n_groups_live < r.n_rowgroups


def test_louvain_sweep_partition_identities(spark, sf_dir):
    rs = _get("graph_louvain_one_sweep", spark, sf_dir)
    assert rs
    # communities partition the nodes; labels are member node ids
    assert sum(r.n_nodes for r in rs) >= len(rs)
    total_deg = sum(r.degree_weight for r in rs)
    total_intra = sum(r.w_intra for r in rs)
    # sum of community strengths counts every edge twice
    assert total_deg % 2 == 0 and 2 * total_intra <= total_deg
    for r in rs:
        assert 2 * r.w_intra <= r.degree_weight
        assert r.n_nodes >= 1


def test_shapley_attribution_efficiency_axiom(spark, sf_dir):
    rs = _get("analytics_shapley_attribution", spark, sf_dir)
    assert len(rs) == 3
    v_full = rs[0].v_full
    v_empty = rs[0].v_empty
    assert all(r.v_full == v_full and r.v_empty == v_empty for r in rs)
    # efficiency: the channel values exactly split v(N) - v(empty)
    assert sum(r.shap_x6 for r in rs) == 6 * (v_full - v_empty)
    # monotone v => nonnegative Shapley values
    assert all(r.shap_x6 >= 0 for r in rs)


def test_anf_sketch_estimate_tracks_exact_ball(spark, sf_dir):
    rs = _get("graph_anf_bottomk", spark, sf_dir)
    assert rs
    for r in rs:
        assert 1 <= r.sketch_n <= 8
        if r.sketch_n < 8:
            # below k the sketch IS the ball — exact by construction
            assert r.ball_est == r.sketch_n == r.ball_exact
        else:
            # KMV estimate: loose multiplicative band for k=8
            assert r.ball_exact / 4 <= r.ball_est <= r.ball_exact * 4


def test_croston_state_identities(spark, sf_dir):
    rs = _get("ts_croston_intermittent", spark, sf_dir)
    assert len(rs) == 5
    for r in rs:
        if r.n_demand == 0:
            assert r.z_scaled == r.p_scaled == r.forecast_scaled == 0
        else:
            # interval SES stays >= 1 period; rate = z/p <= z
            assert r.p_scaled >= 10**6
            assert 0 < r.forecast_scaled <= r.z_scaled


def test_audio_fingerprint_self_match_recovers_offset(spark, sf_dir):
    rs = _get("mm_audio_fingerprint_match", spark, sf_dir)
    assert rs
    hits = [r for r in rs if r.matched_doc == r.qdoc]
    # the one-frame-delayed snippet must mostly re-identify its source
    assert len(hits) >= len(rs) * 2 // 3
    for r in hits:
        assert r.t_offset == 1  # recovered alignment = the injected delay
        assert r.n_votes >= 1


def test_fisher_between_laspeyres_and_paasche(spark, sf_dir):
    (r,) = _get("analytics_price_index_fisher", spark, sf_dir)
    assert r.n_parts > 0
    lo, hi = sorted((r.laspeyres_ppm, r.paasche_ppm))
    # geometric mean lies between its factors (floor slack of 1)
    assert lo - 1 <= r.fisher_ppm <= hi + 1
    assert r.laspeyres_ppm > 0 and r.paasche_ppm > 0


def test_spectral_bisection_partition_sane(spark, sf_dir):
    rs = _get("graph_spectral_bisection", spark, sf_dir)
    assert rs
    S = 10**6
    for r in rs:
        assert -S <= r.v_scaled <= S
        assert r.side in (0, 1)
    # deflation keeps the iterate (approximately) centered: the exact
    # projection is u*n - sum(u); flooring loses < 1 per node and the
    # renormalization rescales, so the mean stays near zero
    vals = [r.v_scaled for r in rs]
    assert abs(sum(vals)) <= len(vals) * S // 4
    # both sides populated and the cut is a strict subset of the edges
    n1 = rs[0].n_side1
    assert 0 < n1 < len(rs)
    assert 0 <= rs[0].cut_edges


def test_threshold_algorithm_early_stop_certified(spark, sf_dir):
    rs = _get("topk_threshold_algorithm", spark, sf_dir)
    assert len(rs) == 10
    assert [r.rnk for r in rs] == list(range(1, 11))
    scores = [r.score for r in rs]
    assert scores == sorted(scores, reverse=True)
    for r in rs:
        assert r.score == r.balance_cents + r.spend_cents
    # TA's point: the certified stop depth is far above the k-th rank
    # and far below a full scan
    assert 10 <= rs[0].stop_depth <= rs[0].n_objects
    assert rs[0].stop_depth < rs[0].n_objects // 2


def test_ips_snips_consistency(spark, sf_dir):
    rs = _get("ml_offpolicy_ips_eval", spark, sf_dir)
    assert len(rs) == 4
    for r in rs:
        assert 0 <= r.n_matched <= r.n_rows
        assert 0 <= r.propensity_scaled <= 10**6
        if r.n_matched and r.propensity_scaled:
            # IPS = SNIPS * (empirical match rate / reference
            # propensity): reconstruct one from the other and allow
            # for the independent floors (loose 2% band)
            expected = (
                r.snips_value_scaled
                * r.n_matched
                * 10**6
                / (r.propensity_scaled * r.n_rows)
            )
            assert abs(r.ips_value_scaled - expected) <= max(
                0.02 * abs(expected), 3
            )


def test_watermark_late_audit_bounds(spark, sf_dir):
    rs = _get("st_watermark_late_audit_batch", spark, sf_dir)
    assert rs
    for r in rs:
        assert 0 <= r.n_late_dropped <= r.n_events
        assert 0 <= r.late_ppm <= 10**6


def test_hrw_reshard_minimal_movement(spark, sf_dir):
    rs = {r.shard_new: r for r in
          _get("pipeline_rendezvous_reshard_audit", spark, sf_dir)}
    n_total = sum(r.n_docs for r in rs.values())
    n_moved = sum(r.n_moved_in for r in rs.values())
    # HRW by construction: surviving shards never receive moved docs
    for s, r in rs.items():
        if s < 8:
            assert r.n_moved_in == 0
        else:
            assert r.n_stayed == 0  # new shards didn't exist before
    # minimal movement: ~2/10 of docs move (wide band for small sf)
    assert 0.08 <= n_moved / n_total <= 0.35


def test_iv_first_stage_nonzero_and_estimates_finite(spark, sf_dir):
    (r,) = _get("ml_iv_two_stage_least_squares", spark, sf_dir)
    assert r.n_rows > 0
    # degenerate instrument would zero the whole readout
    assert r.first_stage_scaled != 0 or r.beta_iv_scaled == 0
    for v in (r.beta_iv_scaled, r.beta_ols_scaled, r.first_stage_scaled):
        assert isinstance(v, int)


def test_xicor_in_range_and_jump_sum_positive(spark, sf_dir):
    (r,) = _get("ml_xicor_correlation", spark, sf_dir)
    assert r.n_rows > 1
    # xi in [-0.5, 1] by construction; price vs custkey ~ independent
    assert -5 * 10**5 <= r.xi_scaled <= 10**6
    assert abs(r.xi_scaled) < 2 * 10**5  # near zero for independence
    assert r.rank_jump_sum > 0


def test_tokenize_referential_integrity_holds(spark, sf_dir):
    rs = _get("privacy_tokenize_referential", spark, sf_dir)
    assert rs
    for r in rs:
        assert r.n_orders_token_join == r.n_orders_plain_join
        assert r.n_distinct_tokens == r.n_customers


def test_wl_refinement_monotone(spark, sf_dir):
    rs = _get("graph_weisfeiler_lehman", spark, sf_dir)
    assert rs
    r = rs[0]
    # refinement never merges color classes
    assert r.n_colors_r0 <= r.n_colors_r1 <= r.n_colors_r2 <= len(rs)
    # the final assignment realizes the reported class count
    assert len({x.color for x in rs}) == r.n_colors_r2


def test_identity_stitching_partitions_users(spark, sf_dir):
    from dmi_ingestor_spark.catalog import table

    rs = _get("analytics_identity_stitching", spark, sf_dir)
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rs) == n_users
    # stitching must actually merge some users (every 5th shares a cookie)
    assert any(r.n_users > 1 for r in rs)
    assert len(rs) < n_users
    for r in rs:
        assert r.n_events >= r.n_users  # every user has >= 1 event


def test_mor_flush_three_phases_agree(spark, sf_dir):
    rs = {r.phase: r for r in _get("lake_mor_flush_compaction", spark, sf_dir)}
    assert set(rs) == {0, 1, 2}
    assert rs[0].n_rows == rs[1].n_rows == rs[2].n_rows
    assert rs[0].key_checksum == rs[1].key_checksum == rs[2].key_checksum
    assert (rs[0].n_dvs, rs[1].n_dvs, rs[2].n_dvs) == (1, 0, 1)


def test_qini_auuc_curve_structure(spark, sf_dir):
    rs = sorted(_get("analytics_qini_auuc", spark, sf_dir),
                key=lambda r: r.decile)
    assert [r.decile for r in rs] == list(range(1, 11))
    # cumulative counts are monotone and the last decile covers everyone
    for a, b in zip(rs, rs[1:]):
        assert b.n_t >= a.n_t and b.n_c >= a.n_c
        assert b.y_t >= a.y_t and b.y_c >= a.y_c
    assert all(r.auuc_scaled == rs[0].auuc_scaled for r in rs)
    assert rs[0].auuc_scaled == sum(r.qini_scaled for r in rs)
    # hash-split treatment ~ half the population
    tot = rs[-1].n_t + rs[-1].n_c
    assert abs(rs[-1].n_t - tot / 2) < tot * 0.1


def test_ljung_box_bounds(spark, sf_dir):
    rs = sorted(_get("ts_ljung_box_q", spark, sf_dir), key=lambda r: r.lag)
    assert [r.lag for r in rs] == list(range(1, 8))
    for r in rs:
        # |r_k| <= 1 (scaled) by Cauchy-Schwarz; terms nonnegative
        assert abs(r.r_scaled) <= 10**6
        assert r.term_scaled >= 0
    assert rs[0].q_scaled == sum(r.term_scaled for r in rs)
    assert rs[0].q_scaled >= 0
