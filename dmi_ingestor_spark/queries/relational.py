"""Relational operator pack: scans, σ/π, aggregation, sort (SURVEY.md §2.2, §2.4, §2.6).

The reference's only relational moves are server-side column pruning
(``parameter-name``) and a bbox predicate (``dmi_ingestor/ingestor.py:175-181``);
everything here is the [ext] surface mandated by SURVEY.md §2, expressed as
pure Catalyst plans so pushdown/pruning/partial-agg come free (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.functions.exact import (
    avg_exact,
    sql_avg_exact,
    sql_sum_exact,
    sum_exact,
)
from dmi_ingestor_spark.registry import register

# --------------------------------------------------------------------------
# q1_pricing_summary — the flagship (TPC-H Q1 shape; SURVEY.md §7 M0).
# Exercises scan → filter (pushed to Parquet) → project → partial+final
# hash agg → sort. The relational analogue of the reference's
# select-parameter → slice-bbox → summarize flow.
# --------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_sum_exact("l_quantity", "sum_qty")},
      {sql_sum_exact("l_extendedprice", "sum_base_price")},
      {sql_sum_exact("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
      {sql_sum_exact("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
      {sql_avg_exact("l_quantity", "avg_qty")},
      {sql_avg_exact("l_extendedprice", "avg_price")},
      {sql_avg_exact("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary; flagship scan→filter→agg→sort plan.",
    tags=("aggregation", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_exact("l_quantity", "sum_qty"),
            sum_exact("l_extendedprice", "sum_base_price"),
            sum_exact(disc_price, "sum_disc_price"),
            sum_exact(charge, "sum_charge"),
            avg_exact("l_quantity", "avg_qty"),
            avg_exact("l_extendedprice", "avg_price"),
            avg_exact("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# P5 generic filter/project pack (SURVEY.md §2.2) — σ/π with pushdown.
# --------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      o_totalprice,
      UPPER(o_orderpriority) AS priority_uc
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    """,
    doc="σ/π: predicate + projection, both pushed into the Parquet scan.",
    tags=("filter", "projection"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.upper("o_orderpriority").alias("priority_uc"),
        )
    )


# --------------------------------------------------------------------------
# SQL API surface: the engine's tables are addressable from spark.sql()
# directly. ONE dialect-common string serves as both the Spark query and
# the DuckDB oracle — the strongest possible parity statement.
# --------------------------------------------------------------------------

_SQL_API_QUERY = """
    WITH nation_rev AS (
      SELECT n.n_name, r.r_name,
             -- split decimal->double conversion (functions/exact.py):
             -- integer and fraction parts each convert exactly, so the
             -- result is bit-identical in Spark and DuckDB at any
             -- magnitude (a bare CAST diverges once the unscaled sum
             -- exceeds 2^53)
             CAST(FLOOR(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(22,8)))) AS DOUBLE)
             + CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(22,8)))
                - FLOOR(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(22,8)))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT r_name, n_name, revenue,
           CAST(RANK() OVER (
             PARTITION BY r_name ORDER BY revenue DESC
           ) AS BIGINT) AS rev_rank
    FROM nation_rev
    ORDER BY r_name, rev_rank, n_name
"""


@register(
    "sql_api_nation_revenue_rank",
    oracle=_SQL_API_QUERY,
    doc=(
        "spark.sql() front end over registered temp views; the identical "
        "ANSI string runs on DuckDB as the oracle. Catalyst plans it like "
        "the DataFrame twin: dims broadcast, one fact-fact shuffle."
    ),
    tags=("sql-api", "join", "window", "aggregation"),
)
def sql_api_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_API_QUERY)


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — a monthly date spine spanning
# past the data's max date, left-joined to monthly order revenue so empty
# months surface as zeros. Gap-filling a time series is a core pipeline
# op the reference's per-timestep tif loop (dmi_ingestor/ingestor.py:
# 103-120) only gets implicitly from upstream; here it is declarative.
# The identical ANSI string runs on DuckDB as the oracle.
# --------------------------------------------------------------------------

_RECURSIVE_SPINE_QUERY = """
    WITH RECURSIVE spine(month_start) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM spine
      WHERE month_start < TIMESTAMP '2001-12-01 00:00:00'
    ),
    monthly AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS month_start,
             -- split decimal->double conversion (functions/exact.py):
             -- bit-identical across engines at any magnitude
             CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(22,8)))) AS DOUBLE)
             + CAST(SUM(CAST(o_totalprice AS DECIMAL(22,8)))
                    - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(22,8))))
               AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY DATE_TRUNC('month', o_orderdate)
    )
    SELECT s.month_start,
           COALESCE(m.revenue, CAST(0 AS DOUBLE)) AS revenue,
           CAST(COALESCE(m.n_orders, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
    ORDER BY s.month_start
"""


@register(
    "recursive_month_spine",
    oracle=_RECURSIVE_SPINE_QUERY,
    doc=(
        "WITH RECURSIVE monthly date spine left-joined to monthly revenue "
        "(gap-filled time series); the same ANSI string is the DuckDB "
        "oracle. Spine is driver-trivial (84 rows); the monthly agg is "
        "the only shuffle, and the spine join broadcasts."
    ),
    tags=("sql-api", "recursive-cte", "aggregation", "time-series"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE_QUERY)


# --------------------------------------------------------------------------
# SQL front end: correlated EXISTS / NOT EXISTS / scalar subqueries.
# --------------------------------------------------------------------------

_SQL_SUBQUERY_QUERY = """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(CASE WHEN EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_totalprice > 200000.0
           ) THEN 1 END) AS BIGINT) AS n_with_big_order,
           CAST(COUNT(CASE WHEN NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           ) THEN 1 END) AS BIGINT) AS n_never_ordered
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2)
    GROUP BY c.c_mktsegment
"""


@register(
    "sql_api_correlated_subqueries",
    oracle=_SQL_SUBQUERY_QUERY,
    doc=(
        "Correlated EXISTS / NOT EXISTS plus an uncorrelated scalar "
        "subquery, as ONE ANSI string planned by both engines. Catalyst "
        "de-correlates: EXISTS becomes a left-semi-ish existence join, "
        "NOT EXISTS an anti join, the scalar subquery a broadcast — no "
        "per-row subquery execution anywhere (the per-row reading is "
        "the semantic, not the plan). AVG over doubles is safe here "
        "because it only feeds a > comparison, not the output."
    ),
    tags=("sql-api", "subquery", "join", "customer"),
)
def sql_api_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_SUBQUERY_QUERY)


@register(
    "skyline_pareto_parts",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
             CAST(round(p_retailprice * 100) AS BIGINT) AS y
      FROM part
    )
    SELECT p.p_partkey, p.x AS p_size, p.y AS price_int
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y)
    )
    """,
    doc=(
        "Skyline (Pareto-maximal) query over part(size, price): a part "
        "survives iff nothing is >= in both dimensions and > in one. "
        "The oracle states the quadratic NOT EXISTS definition; the "
        "engine computes the same set in O(n log n) with ONE window "
        "pass — max(y) over the strictly-greater-x range frame plus a "
        "per-x group max for the equal-x case — so the skyline of a "
        "100 TB relation costs one range-partitioned sort, not a "
        "self-join."
    ),
    tags=("window", "skyline", "part"),
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    def local_skyline(pts: DataFrame, part_cols: list[str]) -> DataFrame:
        """Drop points dominated WITHIN each partition — a sound filter,
        because in-partition domination implies global domination."""
        # rangeBetween(1, unboundedFollowing) is safe HERE (unlike the
        # rowsBetween shrinking frames fixed in r8): the frame's lower
        # bound moves only when x changes, and x = p_size has a ~50-value
        # domain, so Spark re-aggregates at most 50 times per partition —
        # O(50n), not O(n^2).
        w_gt = (
            Window.partitionBy(*part_cols)
            .orderBy("x")
            .rangeBetween(1, Window.unboundedFollowing)
        )
        w_eq = Window.partitionBy(*part_cols, "x")
        flagged = pts.select(
            "p_partkey",
            "x",
            "y",
            F.max("y").over(w_gt).alias("maxy_gt"),
            F.max("y").over(w_eq).alias("maxy_eq"),
        )
        return flagged.filter(
            (F.col("maxy_gt").isNull() | (F.col("maxy_gt") < F.col("y")))
            & (F.col("maxy_eq") <= F.col("y"))
        ).drop("maxy_gt", "maxy_eq")

    p = table(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("y"),
    )
    # Phase 1: hash-bucketed local skylines in parallel (the skyline of
    # a union is the skyline of the per-bucket skylines, so this prunes
    # the global phase's input without changing the result). Phase 2:
    # the same window over the few survivors — the only stage that sees
    # a single ordered range, and its input is skyline-sized, not
    # table-sized.
    bucketed = pts.withColumn("b", F.pmod(F.hash("p_partkey"), F.lit(32)))
    survivors = local_skyline(bucketed, ["b"]).drop("b")
    return local_skyline(survivors.withColumn("g", F.lit(1)), ["g"]).select(
        "p_partkey", F.col("x").alias("p_size"), F.col("y").alias("price_int")
    )


_HINTED_BODY = """
SELECT
  n.n_name,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
"""


@register(
    "sql_api_join_hints",
    oracle=_HINTED_BODY,
    doc=(
        "SQL-front-end join hints: /*+ BROADCAST(c), BROADCAST(n) */ "
        "pins both dimensions to broadcast-hash joins regardless of "
        "autoBroadcastJoinThreshold — the explicit-control escape "
        "hatch when statistics mislead the planner at scale. Hints "
        "never change semantics, so the oracle is the hint-free body."
    ),
    tags=("sql-api", "join", "hints"),
)
def sql_api_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    hinted = _HINTED_BODY.replace(
        "SELECT", "SELECT /*+ BROADCAST(c), BROADCAST(n) */", 1
    )
    return spark.sql(hinted)


@register(
    "anomaly_zscore_acctbal",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ), s AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS s1,
             SUM(CAST(cents AS HUGEINT) * cents) AS s2
      FROM c GROUP BY c_mktsegment
    )
    SELECT
      c.c_custkey,
      c.c_mktsegment,
      c.cents,
      ((s.n * c.cents - s.s1) * (s.n * c.cents - s.s1)
         > 4 * (s.n * s.s2 - s.s1 * s.s1)) AS is_outlier
    FROM c JOIN s USING (c_mktsegment)
    """,
    doc=(
        "Exact outlier flag without floating point: |x - mean| > 2*std "
        "is algebraically (n*x - S1)^2 > 4*(n*S2 - S1^2) — one grouped "
        "pass for the integer moment sums (S1, S2), broadcast back, "
        "and a 128-bit integer comparison per row (Spark decimal(38,0) "
        "== DuckDB HUGEINT). No sqrt, no epsilon, hash-exact; the "
        "standard z-score filter made deterministic enough to gate a "
        "pipeline on."
    ),
    tags=("agg", "anomaly", "stats", "customer"),
)
def anomaly_zscore_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    D = "decimal(38,0)"
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    s = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast(D).alias("n"),
        F.sum("cents").cast(D).alias("s1"),
        F.sum(F.col("cents").cast(D) * F.col("cents")).cast(D).alias("s2"),
    )
    j = c.join(F.broadcast(s), "c_mktsegment")
    dev = F.col("n") * F.col("cents") - F.col("s1")
    var4 = 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return j.select(
        "c_custkey",
        "c_mktsegment",
        "cents",
        (dev * dev > var4).alias("is_outlier"),
    )


_FILTER_CLAUSE_SQL = """
SELECT
  l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_all,
  CAST(COUNT(*) FILTER (WHERE l_quantity >= 40) AS BIGINT) AS n_bulk,
  CAST(COUNT(DISTINCT l_orderkey) FILTER (WHERE l_discount > 0.05)
       AS BIGINT) AS n_discounted_orders,
  CAST(MIN(l_extendedprice) FILTER (WHERE l_tax = 0) AS DOUBLE)
    AS min_price_untaxed
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "sql_api_filter_clause",
    oracle=_FILTER_CLAUSE_SQL,
    doc=(
        "ANSI FILTER (WHERE ...) aggregate modifiers through the SQL "
        "front end — one shared string runs on both engines. Catalyst "
        "rewrites each filtered aggregate to a conditional input "
        "(count_if shape), so N differently-filtered aggregates still "
        "cost ONE scan + one hash aggregate, not N passes — the "
        "pivot-free way to compute cohort columns at scale."
    ),
    tags=("sql-api", "agg", "filter-clause"),
)
def sql_api_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_FILTER_CLAUSE_SQL)


# --------------------------------------------------------------------------
# SQL front end: LATERAL correlated derived table (per-group top-1).
# --------------------------------------------------------------------------

_SQL_LATERAL_QUERY = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 1
    ) t
"""


@register(
    "sql_api_lateral_topn",
    oracle=_SQL_LATERAL_QUERY,
    doc=(
        "LATERAL correlated derived table — each customer's single "
        "most-expensive order via a per-row ORDER BY ... LIMIT 1 "
        "subquery; ONE ANSI string planned by both engines. The "
        "semantic is per-row subquery execution; Catalyst decorrelates "
        "it to WindowGroupLimit(row_number, 1) over orders — crucially "
        "a PARTIAL group-limit runs before the o_custkey Exchange, so "
        "at 100 TB each map task forwards at most one order per "
        "customer it sees instead of all of them — then a broadcast "
        "join back to customer. The total ORDER BY (price DESC, "
        "orderkey) makes the surviving row identical in both engines."
    ),
    tags=("sql-api", "lateral", "topk", "orders"),
)
def sql_api_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_QUERY)


# --------------------------------------------------------------------------
# SQL front end: GROUP BY ALL (Spark 4 + DuckDB shared syntax)
# --------------------------------------------------------------------------

_SQL_GROUP_BY_ALL = """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_c
    FROM orders
    WHERE o_orderkey % 3 = 0
    GROUP BY ALL
"""


@register(
    "sql_api_group_by_all",
    oracle=_SQL_GROUP_BY_ALL,
    doc=(
        "GROUP BY ALL — every non-aggregate select item becomes a "
        "grouping key (modern ANSI-adjacent sugar both Spark 4 and "
        "DuckDB ship); ONE shared string proves the two engines infer "
        "the identical key set. Same partial+final hash aggregate as "
        "an explicit key list — the sugar is resolved at analysis "
        "time, costs nothing at 100 TB."
    ),
    tags=("sql-api", "aggregate", "orders"),
)
def sql_api_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_GROUP_BY_ALL)


# --------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 SQL surface)
# --------------------------------------------------------------------------

_PIPE_SQL = """
FROM orders
|> WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
|> AGGREGATE COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(22,8))) AS s
   GROUP BY o_orderpriority
|> WHERE n_orders >= 10
|> SELECT o_orderpriority,
          n_orders,
          CAST(FLOOR(s) AS DOUBLE) + CAST(s - FLOOR(s) AS DOUBLE) AS sum_price
"""


@register(
    "sql_api_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(22,8)))) AS DOUBLE)
            + CAST(SUM(CAST(o_totalprice AS DECIMAL(22,8)))
                   - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(22,8)))) AS DOUBLE))
             AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
    GROUP BY o_orderpriority
    HAVING COUNT(*) >= 10
    """,
    doc=(
        "Spark 4 SQL PIPE syntax (SQL has problems, pipes fix some — "
        "the |> operator chain: FROM |> WHERE |> AGGREGATE |> WHERE "
        "|> SELECT), proving the pipe form plans to the IDENTICAL "
        "filter→partial/final-aggregate→having shape as the ANSI "
        "oracle: pipes are pure parser sugar, zero plan cost at any "
        "scale. The money sum goes through the engine's exact-decimal "
        "accumulation (functions/exact.py) inline in pipe stages."
    ),
    tags=("sql-api", "aggregate", "orders"),
)
def sql_api_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


# --------------------------------------------------------------------------
# SQL session variables + EXECUTE IMMEDIATE (Spark 4 scripting surface)
# --------------------------------------------------------------------------


@register(
    "sql_api_session_variables",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_above
    FROM orders
    WHERE o_orderkey > (SELECT MAX(o_orderkey) FROM orders) // 2
    GROUP BY o_orderstatus
    """,
    doc=(
        "Spark 4 SQL session variables + parameterized EXECUTE "
        "IMMEDIATE: DECLARE a variable, SET it from a scalar subquery "
        "(max key / 2 — integer, so cross-engine exact), then run the "
        "report as a '?'-parameterized statement bound to the variable. "
        "The variable indirection is resolved before optimization, so "
        "the plan is identical to inlining the literal — scalar "
        "subquery broadcast, pushdown intact; what it buys at scale is "
        "operational: one computed threshold reused across N statements "
        "without re-running the subquery."
    ),
    tags=("sql-api", "orders"),
)
def sql_api_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE key_thr BIGINT DEFAULT 0")
    spark.sql(
        "SET VAR key_thr = (SELECT MAX(o_orderkey) FROM orders) DIV 2"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_above
           FROM orders WHERE o_orderkey > ? GROUP BY o_orderstatus'
          USING key_thr
        """
    )


@register(
    "sql_api_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(FLOOR(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS
                              DECIMAL(22,8)))) AS DOUBLE)
            + CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS
                            DECIMAL(22,8)))
                   - FLOOR(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS
                                    DECIMAL(22,8)))) AS DOUBLE))
             AS net_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Spark 4 SQL UDF (CREATE FUNCTION ... RETURNS ... RETURN expr): "
        "the net-price business rule defined ONCE as a catalog-level "
        "SQL function and used inside an exact-decimal aggregate. SQL "
        "UDFs inline into the plan at analysis time — zero call "
        "overhead, full codegen, pushdown through the function body — "
        "unlike Python UDFs; this is the mechanism for shared business "
        "logic on a 100 TB warehouse. Oracle expands the body "
        "verbatim."
    ),
    tags=("sql-api", "lineitem"),
)
def sql_api_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(22,8)
        RETURN CAST(p * (1.0 - d) AS DECIMAL(22,8))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(FLOOR(SUM(net_price(l_extendedprice, l_discount)))
                    AS DOUBLE)
               + CAST(SUM(net_price(l_extendedprice, l_discount))
                      - FLOOR(SUM(net_price(l_extendedprice, l_discount)))
                      AS DOUBLE) AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# IDENTIFIER() clause: SQL-injection-safe dynamic table/column names
# --------------------------------------------------------------------------


@register(
    "sql_api_identifier_clause",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Spark 4 IDENTIFIER() clause: the table AND the group-by "
        "column arrive as bound string parameters, resolved into "
        "identifiers at analysis time — the injection-safe way to "
        "template multi-tenant/multi-table jobs (vs f-string SQL "
        "assembly, which is both unsafe and uncacheable). The plan is "
        "IDENTICAL to the hard-coded query — parameter resolution "
        "happens before optimization, so nothing changes at scale."
    ),
    tags=("sql-api", "orders"),
)
def sql_api_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp), CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp)
        ORDER BY IDENTIFIER(:grp)
        """,
        args={"tbl": "orders", "grp": "o_orderpriority"},
    )


# --------------------------------------------------------------------------
# Inline VALUES dimension (literal lookup table joined in-plan)
# --------------------------------------------------------------------------

_TIER_ROWS = [
    ("1-URGENT", "hot"),
    ("2-HIGH", "hot"),
    ("3-MEDIUM", "warm"),
    ("4-NOT SPECIFIED", "cold"),
    ("5-LOW", "cold"),
]


@register(
    "sql_api_values_inline_table",
    oracle=f"""
    WITH tiers(o_orderpriority, tier) AS (
      VALUES {", ".join(f"('{p}', '{t}')" for p, t in _TIER_ROWS)}
    )
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM orders o JOIN tiers t USING (o_orderpriority)
    GROUP BY t.tier ORDER BY t.tier
    """,
    doc=(
        "Inline VALUES lookup dimension: a 5-row literal mapping "
        "(priority -> tier) joins the fact table entirely in-plan — "
        "the config-table idiom where shipping a parquet file for 5 "
        "rows would be absurd. Spark builds it with "
        "createDataFrame+broadcast, so the plan is a "
        "BroadcastHashJoin against a LocalTableScan: zero I/O, zero "
        "shuffle for the dimension at any fact scale."
    ),
    tags=("sql-api", "join", "orders"),
)
def sql_api_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiers = spark.createDataFrame(_TIER_ROWS, "o_orderpriority string, tier string")
    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    return (
        o.join(F.broadcast(tiers), "o_orderpriority")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# QUALIFY semantics (window filter without a subquery)
# --------------------------------------------------------------------------


@register(
    "sql_api_qualify_semantics",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    """,
    doc=(
        "QUALIFY-semantics pin: DuckDB's QUALIFY clause filters on a "
        "window result directly; Spark SQL has no QUALIFY, so the "
        "engine states the identical semantics as compute-window-"
        "then-filter — and Catalyst plans the filter as a "
        "WindowGroupLimit pushed BELOW the shuffle (map-side top-k "
        "per key), so the 'missing' clause costs nothing at scale. "
        "Top-2 orders per customer by price, deterministic tie-break."
    ),
    tags=("sql-api", "window", "orders"),
)
def sql_api_qualify_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "sql_api_distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_nationkey)
           c_nationkey, c_custkey AS top_custkey,
           c_acctbal AS top_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    doc=(
        "DISTINCT ON semantics (the Postgres/DuckDB keep-first-per-"
        "group idiom) expressed Spark-natively: a row_number window "
        "over the DISTINCT ON key with the same ORDER BY, filtered to "
        "rn=1 — the canonical translation, with a deterministic "
        "custkey tiebreak so both engines pick the same row. The "
        "'latest record per key' shape every CDC/dim pipeline runs; "
        "at scale it is one hash-partitioned window, no global sort."
    ),
    tags=("sql-api", "customer"),
)
def sql_api_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            F.col("c_custkey").alias("top_custkey"),
            F.col("c_acctbal").alias("top_acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Recursive CTE over a JOIN: BFS reachability (the recursion-over-data
# shape, complementing the linear generator recursion of the month spine)
# --------------------------------------------------------------------------

_RECURSIVE_REACH_QUERY = """
    WITH RECURSIVE edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY src, dst
    ),
    tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM edges),
    kept AS (
      SELECT src, dst FROM edges CROSS JOIN tot WHERE w * ne >= tw
    ),
    reach(node, hops) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT k.dst, r.hops + 1
      FROM reach r JOIN kept k ON k.src = r.node
      WHERE r.hops < 3
    )
    SELECT node, CAST(MIN(hops) AS BIGINT) AS min_hops,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY node ORDER BY node
"""


@register(
    "sql_api_recursive_reachability",
    oracle=_RECURSIVE_REACH_QUERY,
    doc=(
        "WITH RECURSIVE over a JOIN (Spark 4 recursion-over-data, vs "
        "the month spine's linear generator): hop-bounded BFS from "
        "nation 0 across the above-mean-weight trade edges — "
        "min-hop distance AND path multiplicity per reached node, "
        "the same ANSI text running on both engines. The hop cap "
        "bounds cycle blowup the way iterative-algorithm rounds do; "
        "the recursion operates on the aggregated |V|x|V| graph, so "
        "each recursive step is a broadcast-sized join while the "
        "corpus-sized work (edge build) happens once before the "
        "recursion."
    ),
    tags=("sql-api", "recursive-cte", "graph"),
)
def sql_api_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_REACH_QUERY)


# ---------------------------------------------------------------------------
# Fagin's Threshold Algorithm: top-k over two ranked lists w/ early stop
# ---------------------------------------------------------------------------

_TA_K = 10


@register(
    "topk_threshold_algorithm",
    oracle=f"""
    WITH s1 AS (
      SELECT c_custkey AS k, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v1
      FROM customer
    ),
    s2 AS (
      SELECT o_custkey AS k,
             CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS v2
      FROM orders GROUP BY o_custkey
    ),
    scores AS (
      SELECT s1.k, s1.v1, COALESCE(s2.v2, 0) AS v2,
             s1.v1 + COALESCE(s2.v2, 0) AS score
      FROM s1 LEFT JOIN s2 ON s1.k = s2.k
    ),
    topk AS (
      SELECT k, v1, v2, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, k) AS rnk
      FROM scores QUALIFY rnk <= {_TA_K}
    ),
    kth AS (SELECT MIN(score) AS kth_score FROM topk),
    l1 AS (
      SELECT v1, ROW_NUMBER() OVER (ORDER BY v1 DESC, k) AS d FROM scores
    ),
    l2 AS (
      SELECT v2, ROW_NUMBER() OVER (ORDER BY v2 DESC, k) AS d FROM scores
    ),
    thresh AS (
      SELECT l1.d, l1.v1 + l2.v2 AS t FROM l1 JOIN l2 ON l1.d = l2.d
    ),
    stop AS (
      SELECT MIN(d) AS stop_depth
      FROM thresh CROSS JOIN kth WHERE t <= kth_score
    ),
    n AS (SELECT COUNT(*) AS n_objects FROM scores)
    SELECT t.rnk, t.k AS custkey, t.v1 AS balance_cents,
           t.v2 AS spend_cents, t.score,
           CAST(s.stop_depth AS BIGINT) AS stop_depth,
           CAST(n.n_objects AS BIGINT) AS n_objects
    FROM topk t CROSS JOIN stop s CROSS JOIN n
    ORDER BY t.rnk
    """,
    doc=(
        "Fagin's Threshold Algorithm (Fagin/Lotem/Naor 2001) over two "
        "ranked lists — account balance and lifetime spend: the top-k "
        "by summed score plus the PROOF OF EARLY TERMINATION, the "
        "depth d* at which TA may stop because the threshold "
        "T(d) = v1@d + v2@d (best score any unseen object could "
        "still reach under sorted access) falls to the k-th best seen "
        "score. stop_depth << n_objects is the whole point of the "
        "algorithm: a middleware rank-join touches d* prefix entries "
        "of each index, not the full lists — the access-cost model "
        "behind every top-k pushdown. Expressed relationally (two "
        "window rankings + a position join), so the oracle pins both "
        "the answer AND the certified stopping depth."
    ),
    tags=("relational", "topk", "rank-join", "customer", "orders"),
)
def topk_threshold_algorithm(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("v1"),
    )
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("v2")
        )
    )
    scores = (
        c.join(o, "k", "left")
        .select(
            "k",
            "v1",
            F.coalesce("v2", F.lit(0)).alias("v2"),
            (F.col("v1") + F.coalesce("v2", F.lit(0))).alias("score"),
        )
        .cache()  # feeds topk + both ranked lists
    )
    from dmi_ingestor_spark.operators.ranks import sharded_row_number

    # all three global orders go through the sharded-rank operator —
    # range + hash exchanges only, never an Exchange SinglePartition
    ranked, _n = sharded_row_number(
        scores, [F.col("score").desc(), F.col("k").asc()], out="rnk"
    )
    topk = ranked.filter(F.col("rnk") <= _TA_K)
    kth = topk.agg(F.min("score").alias("kth_score"))
    l1_ranked, _ = sharded_row_number(
        scores.select("k", "v1"),
        [F.col("v1").desc(), F.col("k").asc()],
        out="d",
    )
    l1 = l1_ranked.select("v1", "d")
    l2_ranked, _ = sharded_row_number(
        scores.select("k", "v2"),
        [F.col("v2").desc(), F.col("k").asc()],
        out="d",
    )
    l2 = l2_ranked.select("v2", "d")
    thresh = l1.join(l2, "d").select("d", (F.col("v1") + F.col("v2")).alias("t"))
    stop = (
        thresh.crossJoin(F.broadcast(kth))
        .filter(F.col("t") <= F.col("kth_score"))
        .agg(F.min("d").alias("stop_depth"))
    )
    n = scores.agg(F.count(F.lit(1)).alias("n_objects"))
    return (
        topk.crossJoin(F.broadcast(stop))
        .crossJoin(F.broadcast(n))
        .select(
            "rnk",
            F.col("k").alias("custkey"),
            F.col("v1").alias("balance_cents"),
            F.col("v2").alias("spend_cents"),
            "score",
            F.col("stop_depth").cast("long").alias("stop_depth"),
            F.col("n_objects").cast("long").alias("n_objects"),
        )
        .orderBy("rnk")
    )
