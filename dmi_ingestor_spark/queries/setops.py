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
