"""Self-checking invariants for rows-only queries (SURVEY.md §5.2.2)."""

from __future__ import annotations

import json

from dmi_ingestor_spark.registry import load_all

REGISTRY = load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = REGISTRY["agg_approx_distinct"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_orders > 0
        rel_err = abs(r.approx_orders - r.exact_orders) / r.exact_orders
        assert rel_err < 0.10, f"HLL estimate off by {rel_err:.1%} for {r.l_returnflag}"


def test_percentile_approx_sandwiched(spark, sf_dir):
    rows = REGISTRY["agg_percentiles_approx"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # t-digest median of ~2k values at accuracy 10000 is near-exact
        assert abs(r.p50_price_approx - r.p50_price_exact) / r.p50_price_exact < 0.05


def test_manifest_map_json_shape(spark, sf_dir):
    rows = REGISTRY["manifest_map_json"].builder(spark, sf_dir).collect()
    assert len(rows) == 5  # one manifest per event_type "collection"
    for r in rows:
        manifest = json.loads(r.manifest_json)
        assert manifest, "manifest must be non-empty"
        for time_str, url in manifest.items():
            # key format yyyymmddTHHMMSS (ingestor.py:104) and the url
            # embeds its own key (ingestor.py:116-118)
            assert len(time_str) == 15 and time_str[8] == "T"
            assert url.startswith("https://") and time_str in url


def test_hll_sketch_within_3pct(spark, sf_dir):
    rows = REGISTRY["agg_sketch_pack"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(0.03 * r.exact_users, 2), r
