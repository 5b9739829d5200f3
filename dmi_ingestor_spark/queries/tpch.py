"""TPC-H-shaped headline pack (SURVEY.md §2.3-§2.6, §7 M1).

The reference has no relational surface at all (its whole pipeline is
``dmi_ingestor/ingestor.py:1-233`` — one cube at a time, no joins); this
module is the [ext] star-schema workload the driver's fixtures exist to
test. Queries are adapted to the driver's schema (no partsupp /
l_shipmode / l_commitdate columns, synthetic NATION_n names, dates
1995-2001 — see TESTDATA.md), keeping each TPC-H query's *plan shape*:
the join graph, agg structure, and predicate style that exercise
Catalyst's broadcast-join selection, partial aggregation, and AQE at
100 TB scale.

Scale notes (local[32] now, 1000-executor cluster later):
- region/nation/supplier/part are dimension tables → every join against
  them is expressed so Catalyst broadcasts them (they stay under
  ``spark.sql.autoBroadcastJoinThreshold`` even at SF100k since they
  grow sub-linearly or are fixed-size).
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  coalesces/skew-splits post-shuffle partitions.
- All money aggregates use exact decimal accumulation
  (``functions/exact.py``) so results are order-independent and
  bit-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.functions.exact import (
    dec_to_double,
    sql_sum_exact,
    sum_exact,
)
from dmi_ingestor_spark.registry import register

# --------------------------------------------------------------------------
# Q4 shape — order-priority checking: σ(orders) ⋉ lineitem (semi join with a
# non-equi conjunct), then count per priority.
# --------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: left-semi join with non-equi conjunct + grouped count.",
    tags=("join", "semi", "aggregation", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 shape — forecast revenue change: pure scan-filter-agg, the query whose
# entire cost is the Parquet scan; every predicate must reach PushedFilters.
# --------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_sum_exact("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
    doc="TPC-H Q6: scan-dominated filter+global agg; all predicates pushed.",
    tags=("filter", "aggregation", "tpch"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        sum_exact(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations: 5-way join where both
# nation legs broadcast; year extraction feeds the group-by.
# --------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_sum_exact("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
          OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: fact-fact shuffle join + two broadcast nation legs.",
    tags=("join", "broadcast", "aggregation", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum_exact("volume", "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 shape — market share: per-year share of each supplier nation in PROMO
# parts sold to ASIA customers. The classic sum(case)/sum is generalized to
# share-per-nation via a window over the yearly total (same plan depth,
# checks window-over-agg too).
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    WITH sales AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             n1.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem, orders, customer, supplier, part,
           nation n1, nation n2, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND p_type = 'PROMO'
    ), yearly AS (
      -- keep the per-nation sum in DECIMAL through the window total so the
      -- share division is a ratio of two order-independent exact values
      SELECT o_year, supp_nation,
             SUM(CAST(volume AS DECIMAL(22,8))) AS nv_dec
      FROM sales GROUP BY o_year, supp_nation
    )
    SELECT o_year, supp_nation,
           CAST(nv_dec AS DOUBLE) AS nation_volume,
           CAST(nv_dec AS DOUBLE)
             / CAST(SUM(nv_dec) OVER (PARTITION BY o_year) AS DOUBLE)
             AS mkt_share
    FROM yearly
    ORDER BY o_year, supp_nation
    """,
    doc="TPC-H Q8 shape: 7-way star join, grouped agg, share via window-over-agg.",
    tags=("join", "broadcast", "window", "aggregation", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    # customer-side nations restricted to ASIA (broadcast the pre-joined dim)
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    yearly = sales.groupBy("o_year", "supp_nation").agg(
        F.sum(F.col("volume").cast("decimal(22,8)")).alias("nv_dec")
    )
    w = Window.partitionBy("o_year")
    return yearly.select(
        "o_year",
        "supp_nation",
        F.col("nv_dec").cast("double").alias("nation_volume"),
        (
            F.col("nv_dec").cast("double")
            / F.sum("nv_dec").over(w).cast("double")
        ).alias("mkt_share"),
    ).orderBy("o_year", "supp_nation")


# --------------------------------------------------------------------------
# Q9 shape — product-type profit (no supplycost column: profit = disc price)
# by supplier nation × order year for parts matching a name pattern.
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_sum_exact("amount", "sum_profit")}
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: LIKE-filtered part leg + nation/year profit rollup.",
    tags=("join", "broadcast", "aggregation", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(sum_exact("amount", "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q10 shape — returned-item reporting: top 20 customers by lost revenue.
# Deterministic top-k: revenue DESC with c_custkey tiebreaker.
# --------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
      SELECT c_custkey, c_name, c_acctbal, n_name,
             {sql_sum_exact("l_extendedprice * (1 - l_discount)", "revenue")}
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
    ) t
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: quarter of returned lineitems, top-20 customers by revenue.",
    tags=("join", "aggregation", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 shape — promotion effect: conditional aggregation over a broadcast
# part join; one-row percentage result.
# --------------------------------------------------------------------------


@register(
    "q14_promo_effect",
    oracle="""
    WITH s AS (
      SELECT SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8))
               ELSE CAST(0 AS DECIMAL(22,8)) END) AS sp,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,8)))
               AS st
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    )
    -- split decimal->double conversions (functions/exact.py): exact at
    -- any magnitude in both engines
    SELECT 100.0
      * (CAST(FLOOR(sp) AS DOUBLE) + CAST(sp - FLOOR(sp) AS DOUBLE))
      / (CAST(FLOOR(st) AS DOUBLE) + CAST(st - FLOOR(st) AS DOUBLE))
        AS promo_revenue_pct
    FROM s
    """,
    doc="TPC-H Q14: conditional agg (promo share of revenue) over broadcast join.",
    tags=("join", "broadcast", "aggregation", "tpch"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(22,8)")
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(22,8)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dec_to_double(F.sum(promo))
                / dec_to_double(F.sum(disc))
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q16 shape — supplier relationship: COUNT(DISTINCT supplier) per part
# attribute bucket (lineitem stands in for partsupp).
# --------------------------------------------------------------------------


@register(
    "q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-agg per part bucket over broadcast join.",
    tags=("join", "broadcast", "distinct", "aggregation", "tpch"),
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q18 shape — large-volume customers: group-having on the fact table feeding
# a join back to orders/customer (classic agg→join pipeline).
# --------------------------------------------------------------------------

_Q18_QTY = 300.0


@register(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_sum_exact("l_quantity", "sum_qty")}
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY}
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    """,
    doc="TPC-H Q18: having-filtered semi join back onto the fact table.",
    tags=("join", "semi", "aggregation", "tpch"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > _Q18_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum_exact("l_quantity", "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Q19 shape — discounted revenue: disjunction of conjunctive brackets across
# both join sides (tests predicate normalization + partial pushdown).
# --------------------------------------------------------------------------


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_sum_exact("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND (
        (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
          AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
          AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
          AND l_quantity >= 20 AND l_quantity <= 30)
      )
    """,
    doc="TPC-H Q19: OR-of-ANDs bracket predicate spanning the join.",
    tags=("join", "broadcast", "aggregation", "tpch"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape — global sales opportunity: scalar-subquery threshold (broadcast
# one-row agg) + anti join against orders.
# --------------------------------------------------------------------------


@register(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {sql_sum_exact("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold + anti join + grouped agg.",
    tags=("join", "anti", "aggregation", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    # One-row threshold, cross-broadcast so the filter stays distributed
    # (no driver collect; same plan Catalyst builds for a scalar subquery).
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("_thr"))
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_exact("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q13 shape — customer order-count distribution: left outer join, two-level
# aggregation (count per customer → histogram of counts).
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: left-outer join + double aggregation (count histogram).",
    tags=("join", "outer", "aggregation", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 shape — top supplier(s) by quarterly revenue: agg "view" + global-max
# filter, expressed as a rank window so ties are kept (as in the spec).
# --------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_sum_exact("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q15: revenue view + global-max selection. The max is a "
        "1-row partial+final aggregate broadcast back onto the revenue "
        "view (round 3: replaced the empty-partition window, which "
        "funneled the whole supplier grain through one task)."
    ),
    tags=("join", "window", "aggregation", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    # global max as a 1-row aggregate (map-side partials, 32-row funnel)
    # broadcast back onto the supplier grain — ties kept, no window
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = revenue.join(
        F.broadcast(mx), F.col("total_revenue") == F.col("_mx")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        F.broadcast(top)
        .join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q2 shape (adapted: no partsupp) — min-cost selection per group: window min
# over p_type, keep the argmin rows.
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_part",
    oracle="""
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM (
      SELECT p_type, p_partkey, p_name, p_retailprice,
             MIN(p_retailprice) OVER (PARTITION BY p_type) AS mn
      FROM part
    ) t
    WHERE p_retailprice = mn
    ORDER BY p_type, p_partkey
    """,
    doc="TPC-H Q2 shape: per-group argmin via window (ties kept).",
    tags=("window", "tpch"),
)
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("mn", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("mn"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


# --------------------------------------------------------------------------
# Q11 shape — important stock: per-part quantity share above a global
# threshold (scalar subquery → broadcast one-row aggregate).
# --------------------------------------------------------------------------

_Q11_FRACTION = 0.0005


@register(
    "q11_important_stock",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(22,8))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, qty
    FROM per_part
    WHERE qty > (
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(22,8))) AS DOUBLE) * {_Q11_FRACTION}
      FROM lineitem
    )
    ORDER BY qty DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: grouped sum filtered by a global-total threshold.",
    tags=("aggregation", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(sum_exact("l_quantity", "qty"))
    total = li.agg(
        (F.sum(F.col("l_quantity").cast("decimal(22,8)")).cast("double") * _Q11_FRACTION)
        .alias("_thr")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("qty") > F.col("_thr"))
        .select("l_partkey", "qty")
        .orderBy(F.col("qty").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q17 shape — small-quantity revenue: correlated per-part average threshold
# (decorrelated to an agg + join; quantity sums are integer-exact).
# --------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_sum_exact("l_extendedprice", "total_price")},
           COUNT(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.2 * (SUM(l_quantity) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    doc=(
        "TPC-H Q17: correlated avg subquery, decorrelated into a "
        "per-part aggregate joined back (quantities are integers, so "
        "sum/count is exact and order-independent)."
    ),
    tags=("join", "subquery", "aggregation", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    # decorrelate: avg quantity per part (exact: integer-valued doubles)
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            sum_exact("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape (adapted: no receipt/commit dates) — suppliers who shipped last
# on multi-supplier orders: window max + distinct-count per order.
# --------------------------------------------------------------------------


@register(
    "q21_last_shipper",
    oracle="""
    WITH marked AS (
      SELECT l_orderkey, l_suppkey, l_shipdate,
             MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
             COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
      FROM lineitem
    )
    SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS numwait
    FROM marked
    WHERE l_shipdate = max_ship AND n_supp >= 2
    GROUP BY l_suppkey
    ORDER BY numwait DESC, l_suppkey
    LIMIT 25
    """,
    doc=(
        "TPC-H Q21 shape: the 'kept everyone waiting' supplier — latest "
        "shipper on orders touched by ≥2 suppliers, via two window "
        "aggregates over the same partition (one shuffle)."
    ),
    tags=("window", "aggregation", "topk", "tpch"),
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = Window.partitionBy("l_orderkey")
    marked = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    return (
        marked.filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "l_suppkey")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q20 shape — dominant supplier per part: two-level aggregate + share
# threshold (quantities are integers → exact in any order), ending in a
# broadcast dimension join.
# --------------------------------------------------------------------------


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, qty, l_suppkey,
             SUM(qty) OVER (PARTITION BY l_partkey) AS total
      FROM per
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_dominant_parts
    FROM tot JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty > 0.15 * total
    GROUP BY s_suppkey, s_name
    ORDER BY s_suppkey
    """,
    doc=(
        "TPC-H Q20 shape: per-(part,supplier) quantity vs the part total "
        "(window-over-agg), suppliers holding >15% of a part's volume. "
        "Integer quantity sums are exact in any accumulation order."
    ),
    tags=("aggregation", "window", "join", "tpch"),
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    per = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    w = Window.partitionBy("l_partkey")
    dominant = per.withColumn("total", F.sum("qty").over(w)).filter(
        F.col("qty") > 0.15 * F.col("total")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominant.join(F.broadcast(s), dominant.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q12 shape — shipping-mode priority: orders ⋈ lineitem with a date-window
# predicate on the fact side, conditional counts of urgent vs other orders
# per lineitem category. The synthetic lineitem has no l_shipmode /
# l_commitdate / l_receiptdate, so l_returnflag stands in for the mode and
# the l_shipdate window replaces the commit/receipt sandwich; the plan
# shape (pushed fact filter, shuffle join on orderkey, conditional agg)
# is Q12's.
# --------------------------------------------------------------------------


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc=(
        "TPC-H Q12 shape: date-windowed fact scan joined to orders, "
        "conditional urgent/other line counts per category (ref has no "
        "joins at all — dmi_ingestor/ingestor.py:1-233; this is the "
        "mandated relational surface)."
    ),
    tags=("join", "aggregation", "conditional", "tpch"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )
