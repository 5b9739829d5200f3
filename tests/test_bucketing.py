"""Bucketed co-located join (SURVEY.md §7.4): the plan-shape assertions
that make the 100 TB claim checkable — the bucket-to-bucket join must
run with NO Exchange on either side, and within-bucket sort must remove
the pre-join Sort as well."""

from __future__ import annotations

import pytest

from dmi_ingestor_spark.operators.bucketing import ensure_bucketed_pair
from dmi_ingestor_spark.registry import load_all

REGISTRY = load_all()


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def smj(spark):
    """Force sort-merge join so the Exchange elimination is observable
    (broadcast would hide it at test scale)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, smj):
    t_orders, t_lineitem = ensure_bucketed_pair(spark, sf_dir)
    o, l = spark.table(t_orders), spark.table(t_lineitem)
    joined = o.join(l, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderkey", "l_extendedprice"
    )
    plan = _formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir, smj):
    """Control: the same join over raw parquet must shuffle — proving
    the bucketed variant's Exchange elimination is real, not AQE luck."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = o.join(l, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderkey", "l_extendedprice"
    )
    plan = _formatted_plan(joined)
    assert plan.count("Exchange") >= 2


def test_bucketed_join_matches_raw_join(spark, sf_dir):
    rows = (
        REGISTRY["bucketed_colocated_join"]
        .builder(spark, sf_dir)
        .orderBy("o_orderpriority")
        .collect()
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    import pyspark.sql.functions as F

    exp = {
        r["o_orderpriority"]: r["n"]
        for r in o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["o_orderpriority"]: r["n_items"] for r in rows} == exp


def test_dpp_join_prunes_partitions_at_runtime(spark, sf_dir):
    """join_dpp_partition_prune's fact scan must carry a
    dynamicpruningexpression PartitionFilter — proof the dim-side
    filter prunes fact DIRECTORIES at runtime, not post-scan."""
    from dmi_ingestor_spark.registry import load_all

    df = load_all()["join_dpp_partition_prune"].builder(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruningexpression" in plan
    # and the pruned read returns the same totals as the raw-parquet path
    got = df.collect()[0]
    raw = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderpriority IN ('1-URGENT', '2-HIGH')")
        .count()
    )
    assert got["n_orders"] == raw
