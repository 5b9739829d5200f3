"""Set operations (SURVEY.md §2.7): union / intersect / except.

Absent from the reference (its delete-then-write at
``dmi_ingestor/ingestor.py:199,208-218`` is replace-all, not merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register


def _high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("custkey"))
    )


def _building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


@register(
    "setop_union_all",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) t
    """,
    doc="UNION ALL (bag semantics) — Spark `union` is ALL by default.",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value_customers(spark, sf_dir).union(_building_customers(spark, sf_dir))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="UNION DISTINCT = union + dropDuplicates (hash-partial dedup).",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _high_value_customers(spark, sf_dir)
        .union(_building_customers(spark, sf_dir))
        .distinct()
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="INTERSECT (distinct semantics) — planned as a left-semi aggregate.",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value_customers(spark, sf_dir).intersect(
        _building_customers(spark, sf_dir)
    )


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="EXCEPT (distinct semantics) — planned as a left-anti aggregate.",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_value_customers(spark, sf_dir).subtract(
        _building_customers(spark, sf_dir)
    )


def _qty_bag_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset with real duplicates: quantities of low-line lineitems."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        F.col("l_quantity").cast("long").alias("qty")
    )


def _qty_bag_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") >= 2).select(
        F.col("l_quantity").cast("long").alias("qty")
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_linenumber <= 2
    INTERSECT ALL
    SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_linenumber >= 2
    """,
    doc=(
        "INTERSECT ALL (bag semantics): each qty survives "
        "min(count_a, count_b) times — the multiset variant distinct "
        "INTERSECT destroys. Planned as a single hash aggregate per "
        "side + join under the hood; duplicates are real here (25k "
        "rows over ~50 distinct quantities)."
    ),
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _qty_bag_a(spark, sf_dir).intersectAll(_qty_bag_b(spark, sf_dir))


@register(
    "setop_except_all",
    oracle="""
    SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_linenumber >= 2
    EXCEPT ALL
    SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_linenumber <= 2
    """,
    doc=(
        "EXCEPT ALL (bag difference): each qty survives "
        "max(count_a - count_b, 0) times. With the distinct variant "
        "already covered, this completes the §2.7 set-op surface."
    ),
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _qty_bag_b(spark, sf_dir).exceptAll(_qty_bag_a(spark, sf_dir))


@register(
    "setop_null_semantics",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS prio,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 2 = 0
    ), b AS (
      SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderpriority END AS prio,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT 'intersect' AS op, prio, status FROM (
      SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'except' AS op, prio, status FROM (
      SELECT * FROM a EXCEPT SELECT * FROM b)
    """,
    doc=(
        "Set-op NULL semantics pin: unlike '=' (where NULL = NULL is "
        "NULL), INTERSECT/EXCEPT use group-equivalence — two (NULL, "
        "status) rows MATCH each other. Both legs inject NULLs on "
        "different key patterns, so any engine that compared set-op "
        "rows with join equality would drop the NULL-keyed rows from "
        "the intersection and duplicate them in the difference; the "
        "hash match proves Spark and DuckDB agree row-for-row. Same "
        "distinct-aggregate machinery as the other set ops at scale."
    ),
    tags=("setop", "null-semantics"),
)
def setop_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    prio = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    prio_b = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        prio.alias("prio"), F.col("o_orderstatus").alias("status")
    )
    b = o.filter(F.col("o_orderkey") % 3 == 0).select(
        prio_b.alias("prio"), F.col("o_orderstatus").alias("status")
    )
    inter = a.intersect(b).select(F.lit("intersect").alias("op"), "prio", "status")
    exc = a.subtract(b).select(F.lit("except").alias("op"), "prio", "status")
    return inter.unionByName(exc)
