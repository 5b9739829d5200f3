"""Pipeline observability: `df.observe()` metrics ride along with the
action (no second scan) and must equal the directly-aggregated values —
the production idiom for row-count/checksum telemetry on 100 TB writes,
where a separate metrics query would double the I/O bill.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table


def test_observe_metrics_match_direct_aggregate(spark, sf_dir):
    obs = Observation("orders_metrics")
    o = table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("n_null_price"),
    )
    o.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = (
        table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias(
                "n_null_price"
            ),
        )
        .collect()[0]
    )
    assert got["n_rows"] == direct["n_rows"] > 0
    assert got["key_sum"] == direct["key_sum"]
    assert got["n_null_price"] == direct["n_null_price"]


def test_observe_survives_filter_pushdown(spark, sf_dir):
    # the observation point is BELOW the filter: metrics see pre-filter
    # rows, proving observe() measures its exact plan position
    obs = Observation("pre_filter")
    base = table(spark, sf_dir, "orders").observe(
        obs, F.count(F.lit(1)).alias("n_all")
    )
    filtered = base.filter(F.col("o_orderstatus") == "F")
    n_filtered = filtered.count()
    n_all = table(spark, sf_dir, "orders").count()
    assert obs.get["n_all"] == n_all
    assert n_filtered < n_all
