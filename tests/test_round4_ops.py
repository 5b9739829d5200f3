"""Invariant tests for the round-4 operator wave.

The oracle-parity gate (test_oracle_parity.py) already pins every new
query hash-exact against DuckDB; these tests assert the ALGORITHMIC
properties the hashes alone don't articulate — monotonicity of the
isotonic fit, metric properties of DTW, probability-range bounds, SCC
consistency — so a future refactor that keeps two engines wrong in the
same way still fails.
"""

from __future__ import annotations

import pytest

from dmi_ingestor_spark.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def rows():
    return {}


def _get(name, spark, sf_dir, cache={}):
    if name not in cache:
        cache[name] = REGISTRY[name].builder(spark, sf_dir).collect()
    return cache[name]


def test_isotonic_fit_is_monotone_and_bounded(spark, sf_dir):
    rs = _get("ml_isotonic_calibration", spark, sf_dir)
    fitted = [r.isotonic_scaled for r in sorted(rs, key=lambda r: r.b)]
    assert fitted == sorted(fitted), "PAV fit must be non-decreasing"
    for r in rs:
        assert 0 <= r.isotonic_scaled <= 10**6
        assert 0 <= r.raw_rate_scaled <= 10**6


def test_dtw_bounded_by_aligned_distance(spark, sf_dir):
    # DTW over any warping path <= cost of the identity alignment,
    # which equals the final cell of a 0-warp diagonal walk; cheap
    # proxy: dtw distance must be <= sum of |a_i - b_i| (the diagonal
    # path is one admissible warping).
    from pyspark.sql import functions as F

    from dmi_ingestor_spark.catalog import table

    rs = _get("ts_dtw_alignment", spark, sf_dir)
    dtw = max(r.dtw_cum for r in rs if r.j == max(x.j for x in rs))
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    series = (
        e.groupBy("event_type", (F.hour("ts") / 2).cast("long").alias("b"))
        .agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("c"))
        .groupBy("b")
        .pivot("event_type", ["purchase", "click"])
        .agg(F.first("c"))
        .collect()
    )
    diag = sum(abs(r.purchase - r.click) for r in series)
    assert 0 < dtw <= diag


def test_bm25_idf_decreases_with_df(spark, sf_dir):
    rs = _get("text_bm25_scoring", spark, sf_dir)
    by_df = sorted({(r.df, r.idf_scaled) for r in rs})
    for (df1, idf1), (df2, idf2) in zip(by_df, by_df[1:]):
        if df1 < df2:
            assert idf1 >= idf2, "IDF must be non-increasing in df"
    for r in rs:
        assert r.tfn_scaled <= 2_200_000  # tf-norm < k1+1 = 2.2


def test_betweenness_nonnegative_and_leaves_zero(spark, sf_dir):
    rs = _get("graph_betweenness_centrality", spark, sf_dir)
    assert all(r.betweenness_scaled >= 0 for r in rs)
    assert all(r.n_geodesic_pairs >= 0 for r in rs)
    # at least one node must lie on some geodesic in a connected graph
    assert any(r.n_geodesic_pairs > 0 for r in rs)


def test_scc_labels_are_consistent(spark, sf_dir):
    rs = _get("graph_scc_decomposition", spark, sf_dir)
    by_id = {}
    for r in rs:
        by_id.setdefault(r.scc_id, []).append(r)
    for scc_id, members in by_id.items():
        # the label is the minimum member, and sizes agree
        assert min(m.nationkey for m in members) == scc_id
        assert all(m.scc_size == len(members) for m in members)


def test_holt_winters_seasonal_slots_cycle(spark, sf_dir):
    rs = _get("ts_holt_winters_seasonal", spark, sf_dir)
    # seasonal_c at day d is the slot value for (d-1) % 7 BEFORE update;
    # two rows 7 days apart therefore never reference different slots
    by_day = {r.d: r for r in rs}
    days = sorted(by_day)
    assert days == list(range(8, 31))


def test_bleu_precisions_bounded(spark, sf_dir):
    rs = _get("ml_bleu_ngram_eval", spark, sf_dir)
    for r in rs:
        assert 0 <= r.n1_match <= r.n1_total
        assert 0 <= r.n2_match <= max(r.n2_total, 1)
        assert 0 <= r.p1_scaled <= 10**6
        assert 0 <= r.p2_scaled <= 10**6
        assert r.bleu2_prod_scaled <= r.p1_scaled


def test_merge_matrix_counts_reconcile(spark, sf_dir):
    rs = {r.action: r for r in _get("lake_merge_full_matrix", spark, sf_dir)}
    # final = updated + inserted + kept; kept isn't emitted, so check
    # final >= updated + inserted and deletes were non-trivial
    assert rs["final_table"].n_rows >= (
        rs["updated"].n_rows + rs["inserted"].n_rows
    )
    assert rs["deleted_matched"].n_rows > 0
    assert rs["deleted_by_source"].n_rows > 0


def test_rake_top_phrase_has_positive_score(spark, sf_dir):
    rs = _get("text_rake_keyphrases", spark, sf_dir)
    assert len(rs) > 0
    for r in rs:
        assert r.rake_scaled >= r.n_words * 10**6  # degree/freq >= 1 per word
        assert " ".join(r.phrase.split()) == r.phrase
