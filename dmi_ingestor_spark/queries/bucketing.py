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


# --------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional clustering.
# --------------------------------------------------------------------------

_Z_BITS = 8  # bits per dimension -> 16-bit z-value, 16x16 bucket grid


def _z_terms_spark(x: str, y: str) -> str:
    """Unrolled Morton interleave as a Spark SQL expression string."""
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {k}) & 1, {2 * k})")
        terms.append(f"shiftleft(shiftright({y}, {k}) & 1, {2 * k + 1})")
    return " + ".join(terms)


def _z_terms_duck(x: str, y: str) -> str:
    """Identical interleave in DuckDB's operator dialect."""
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"((({x} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({y} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_buckets",
    oracle=f"""
    WITH ext AS (
      SELECT MAX(l_partkey) + 1 AS pmax, MAX(l_suppkey) + 1 AS smax
      FROM lineitem
    ), z AS (
      SELECT l_partkey, l_suppkey,
             ({_z_terms_duck(
                 f"(l_partkey * {1 << _Z_BITS} // pmax)",
                 f"(l_suppkey * {1 << _Z_BITS} // smax)")})
               AS zval
      FROM lineitem CROSS JOIN ext
    )
    SELECT CAST(zval >> {_Z_BITS} AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM z
    GROUP BY z_bucket
    """,
    doc=(
        "Z-order (Morton) clustering key over (l_partkey, l_suppkey): "
        "each dim is range-scaled to 8 bits against its max (a scalar "
        "aggregate broadcast into the scan — the standard cheap global "
        "statistic), bits interleaved by an unrolled plan-time "
        "expression (pure JVM integer ops, whole-stage codegen'd — no "
        "UDF), then rows are grouped by the top-8-bit z-bucket with "
        "per-bucket min/max of BOTH dims. Those min/max spans are "
        "exactly the parquet column stats a z-ordered file layout would "
        "carry: narrow on both dims simultaneously, so point/range "
        "predicates on EITHER column prune most files — the multi-dim "
        "analogue of partition pruning. Write-side usage at 100 TB: "
        "repartitionByRange(zval).write — the z-value computation "
        "itself is a shuffle-free map stage."
    ),
    tags=("layout", "scale", "lineitem", "zorder"),
)
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ext = li.agg(
        (F.max("l_partkey") + 1).alias("pmax"),
        (F.max("l_suppkey") + 1).alias("smax"),
    )
    scaled_x = f"(l_partkey * {1 << _Z_BITS} div pmax)"
    scaled_y = f"(l_suppkey * {1 << _Z_BITS} div smax)"
    zval = F.expr(_z_terms_spark(scaled_x, scaled_y)).alias("zval")
    return (
        li.crossJoin(F.broadcast(ext))
        .select("l_partkey", "l_suppkey", zval)
        .groupBy(
            F.shiftright(F.col("zval"), _Z_BITS).cast("long").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("min_part"),
            F.max("l_partkey").cast("long").alias("max_part"),
            F.min("l_suppkey").cast("long").alias("min_supp"),
            F.max("l_suppkey").cast("long").alias("max_supp"),
        )
    )


# --------------------------------------------------------------------------
# Dynamic partition pruning (runtime partition skipping via a dim filter)
# --------------------------------------------------------------------------


@register(
    "join_dpp_partition_prune",
    oracle="""
    WITH dim(prio, tier) AS (
      VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
             ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
             ('5-LOW', 'cold')
    )
    SELECT d.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM orders o JOIN dim d ON d.prio = o.o_orderpriority
    WHERE d.tier = 'hot'
    GROUP BY d.tier
    """,
    doc=(
        "Dynamic partition pruning: the fact side is a HIVE-PARTITIONED "
        "copy of orders (directory key = o_orderpriority, written once "
        "per sf_dir by operators/bucketing.ensure_partitioned_orders); "
        "joining it to a tiny dim filtered to tier='hot' lets Catalyst "
        "inject a runtime subquery into the fact scan's "
        "PartitionFilters (dynamicpruningexpression — asserted in "
        "tests/test_bucketing.py), so only the 2 matching directories "
        "of 5 are ever read. At 100 TB with date-partitioned facts this "
        "is the difference between scanning the whole table and "
        "scanning the days the dimension selects — the third leg of "
        "the physical-layout story next to bucketing (shuffle "
        "elimination) and z-order (row-group skipping). The oracle "
        "computes the same aggregate from the raw parquet."
    ),
    tags=("join", "layout", "scale", "orders"),
)
def join_dpp_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.bucketing import ensure_partitioned_orders

    path = ensure_partitioned_orders(spark, sf_dir)
    o = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "hot"),
            ("2-HIGH", "hot"),
            ("3-MEDIUM", "warm"),
            ("4-NOT SPECIFIED", "cold"),
            ("5-LOW", "cold"),
        ],
        "prio string, tier string",
    )
    return (
        o.join(
            F.broadcast(dim),
            (o["o_orderpriority"] == dim["prio"]) & (dim["tier"] == "hot"),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
    )
