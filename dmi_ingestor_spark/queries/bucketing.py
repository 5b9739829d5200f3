"""Bucketed co-located join queries (SURVEY.md §2.3 / §7.4 scale path).

The registered query materializes bucketed orders/lineitem twins (once
per sf_dir) and joins them bucket-to-bucket; the oracle recomputes the
same aggregate from the raw parquet. Correctness says nothing about
bucketing — that is the point: identical results, but the bucketed plan
has zero Exchange on the join (asserted in tests/test_bucketing.py),
which at 100 TB is the difference between an all-to-all shuffle of the
two largest tables and a map-side merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.functions.exact import sql_sum_exact, sum_exact
from dmi_ingestor_spark.operators.bucketing import ensure_bucketed_pair
from dmi_ingestor_spark.registry import register


@register(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT
      o.o_orderpriority,
      COUNT(*) AS n_items,
      {sql_sum_exact("l.l_extendedprice", "sum_price")}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "J-scale: orders⋈lineitem through bucketed managed tables "
        "(bucketBy 8 on the join key, sorted within buckets). Same rows "
        "as the raw-parquet oracle, but the join itself needs no "
        "Exchange on either side — the 100 TB fact⋈fact strategy."
    ),
    tags=("join", "bucketing", "scale"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_lineitem = ensure_bucketed_pair(spark, sf_dir)
    o = spark.table(t_orders)
    l = spark.table(t_lineitem)
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            sum_exact("l_extendedprice", "sum_price"),
        )
    )
