"""Join surface J1-J6 (SURVEY.md §2.3).

Joins are absent from the reference (one cube at a time,
``dmi_ingestor/ingestor.py:102-122``); this is the [ext] surface over the
driver's star schema. Scale notes per query: small dimensions are
broadcast explicitly (no shuffle of the fact side), fact-fact joins
shuffle on their equi-keys where AQE can rebalance/skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.functions.exact import sql_sum_exact, sum_exact
from dmi_ingestor_spark.registry import register


# -- J1 equi inner join (fact ⋈ fact shape: shuffle hash/sort-merge) -------
@register(
    "join_inner_orders_lineitem",
    oracle="""
    SELECT
      o.o_orderkey,
      o.o_orderstatus,
      l.l_linenumber,
      l.l_quantity,
      l.l_extendedprice
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 50000.0 AND l.l_quantity >= 40.0
    """,
    doc="J1: equi inner join orders⋈lineitem; both filters pushed below the join.",
    tags=("join",),
)
def join_inner_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000.0)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40.0)
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# -- J1 left outer join (null-producing side preserved) --------------------
@register(
    "join_left_customer_orders",
    oracle="""
    SELECT
      c.c_custkey,
      c.c_name,
      o.o_orderkey,
      o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000.0
    """,
    doc="J1: left outer join with an ON-clause filter on the right side.",
    tags=("join",),
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000.0)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# -- J2 broadcast dimension join chain (TPC-H Q5 shape) --------------------
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT
      n.n_name,
      {sql_sum_exact("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc=(
        "J2: TPC-H Q5 — fact-fact shuffle join with every dimension "
        "(supplier/nation/region/customer) broadcast; region filter prunes "
        "the broadcast side before it ships."
    ),
    tags=("join", "broadcast", "flagship"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(sum_exact(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# -- J3 semi / anti ---------------------------------------------------------
@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
    doc="J3: left-semi join — customers having at least one open order.",
    tags=("join",),
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti_parts_never_shipped",
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
    )
    """,
    doc="J3: left-anti join — parts that never appear in lineitem.",
    tags=("join",),
)
def join_anti_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name", "p_retailprice"
    )


# -- J4 theta / range join --------------------------------------------------
@register(
    "join_range_quantity_bands",
    oracle="""
    SELECT
      b.band_id,
      COUNT(*) AS n_items,
      CAST(MIN(l.l_quantity) AS DOUBLE) AS min_qty,
      CAST(MAX(l.l_quantity) AS DOUBLE) AS max_qty
    FROM (
      SELECT n_nationkey AS band_id,
             CAST(n_nationkey * 2 AS DOUBLE) AS lo,
             CAST(n_nationkey * 2 + 2 AS DOUBLE) AS hi
      FROM nation
    ) b
    JOIN lineitem l ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_id
    ORDER BY b.band_id
    """,
    doc=(
        "J4: range (theta) join — lineitem quantities bucketed into bands "
        "derived from nation keys; the band table is broadcast so the "
        "non-equi predicate runs as BroadcastNestedLoop, never a cartesian "
        "shuffle."
    ),
    tags=("join", "range"),
)
def join_range_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = (
        table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("band_id"),
            (F.col("n_nationkey") * 2).cast("double").alias("lo"),
            (F.col("n_nationkey") * 2 + 2).cast("double").alias("hi"),
        )
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
        )
        .orderBy("band_id")
    )


# -- J5 as-of join ----------------------------------------------------------
@register(
    "join_asof_latest_order_per_event",
    oracle="""
    WITH ranked AS (
      SELECT
        e.event_id,
        e.user_id,
        e.event_type,
        o.o_orderkey,
        o.o_orderdate,
        ROW_NUMBER() OVER (
          PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, event_type, o_orderkey, o_orderdate
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "J5 as-of join: for each event, the latest order of that user at "
        "or before the event time. Equi-join on the key + range predicate, "
        "then max(struct(time, key)) per event — lexicographic struct max "
        "≡ row_number()=1 over (time DESC, key DESC), but it partial-"
        "aggregates map-side: the join's range blowup (every qualifying "
        "order per event) is reduced to one row per event BEFORE the "
        "shuffle, where the window formulation would shuffle it all."
    ),
    tags=("join", "asof", "aggregation"),
)
def join_asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.asof import asof_join_latest

    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return asof_join_latest(
        e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey", "event_id"
    ).select("event_id", "user_id", "event_type", "o_orderkey", "o_orderdate")


# -- J6 cross join ----------------------------------------------------------
@register(
    "join_cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="J6: bounded cross join of two tiny dimensions (5×25 rows).",
    tags=("join",),
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# -- skew-salted join -------------------------------------------------------
@register(
    "join_salted_orders_lineitem",
    oracle=f"""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_items,
      {sql_sum_exact("l_extendedprice", "sum_price")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Skew-salted fact-fact join (operators/salted.py): lineitem "
        "(probe, salted 8 ways by row hash) ⋈ orders (build, replicated "
        "8×). Semantics identical to the plain join — checked against "
        "the unsalted DuckDB oracle — while a single hot orderkey's rows "
        "spread across 8 reducers instead of one."
    ),
    tags=("join", "skew", "aggregation"),
)
def join_salted_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.salted import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(li, o, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            sum_exact("l_extendedprice", "sum_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# J4-scale: binned interval join (the range join that scales).
# --------------------------------------------------------------------------

_FUNNEL_GAP_US = 300_000_000  # 5 minutes


@register(
    "join_range_binned_funnel",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    )
    SELECT a.event_id AS lead_id, b.event_id AS follow_id,
           a.user_id, CAST(b.t - a.t AS BIGINT) AS gap_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND b.t > a.t AND b.t <= a.t + {_FUNNEL_GAP_US}
    """,
    doc=(
        "Funnel pairs: same-user event followed by another within 5 "
        "minutes — an interval self-join executed as a BINNED EQUI-JOIN, "
        "not a nested loop. Each left event expands to its two possible "
        "5-minute bins (explode of 2), the join runs on "
        "(user_id, bin) — a plain shuffled hash/merge join — and the "
        "exact range predicate filters afterwards. This is the 100 TB "
        "range-join strategy: `join_range_quantity_bands` shows the "
        "BroadcastNestedLoop form for small dims; at fact×fact scale a "
        "BNLJ is O(n*m) while the bin join shuffles each side once and "
        "touches only co-binned candidates. The plan is asserted "
        "nested-loop-free in tests/test_plan_quality.py."
    ),
    tags=("join", "range", "binned", "scale", "events"),
)
def join_range_binned_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    # integer floor-div binning: double division + cast could round a
    # boundary value into the wrong bin and silently drop a pair
    bin_of = lambda c: c.cast("long") - (c.cast("long") % _FUNNEL_GAP_US)  # noqa: E731
    a = e.select(
        F.col("event_id").alias("lead_id"),
        "user_id",
        F.col("t").alias("t_a"),
        F.explode(
            F.array(bin_of(F.col("t")), bin_of(F.col("t")) + _FUNNEL_GAP_US)
        ).alias("bin"),
    )
    b = e.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id").alias("b_user"),
        F.col("t").alias("t_b"),
        bin_of(F.col("t")).alias("b_bin"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (a.bin == b.b_bin)
            & (b.t_b > a.t_a)
            & (b.t_b <= a.t_a + _FUNNEL_GAP_US),
        )
        .select(
            "lead_id",
            "follow_id",
            "user_id",
            (F.col("t_b") - F.col("t_a")).cast("long").alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# Null-safe join semantics.
# --------------------------------------------------------------------------


@register(
    "join_null_safe_semantics",
    oracle="""
    WITH e AS (
      SELECT CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE event_id % 7 END AS k
      FROM events
    ), dim AS (
      SELECT * FROM (VALUES
        (NULL, 'missing'), (1, 'one'), (2, 'two'), (3, 'three'),
        (4, 'four'), (5, 'five'), (6, 'six')
      ) AS t(k, label)
    )
    SELECT dim.label, CAST(COUNT(e.k IS NULL OR TRUE) AS BIGINT) AS n
    FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.k
    GROUP BY dim.label
    """,
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): a key with "
        "injected NULLs joined to a dim whose 'missing' row carries a "
        "NULL key — NULL matches NULL exactly once, so unknown keys "
        "classify instead of dropping. Still a hash-joinable equality "
        "predicate in both engines (null-safe equality is an equi-key, "
        "NOT a theta predicate); the dim broadcasts."
    ),
    tags=("join", "null-semantics", "events"),
)
def join_null_safe_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 7 == 0, F.lit(None).cast("long")
        ).otherwise(F.col("event_id") % 7).alias("k")
    )
    dim = spark.createDataFrame(
        [(None, "missing"), (1, "one"), (2, "two"), (3, "three"),
         (4, "four"), (5, "five"), (6, "six")],
        "k long, label string",
    )
    return (
        e.join(F.broadcast(dim), e.k.eqNullSafe(dim.k))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# -- J-scale: broadcast Bloom-filter pre-join (runtime filter) -------------
_BLOOM_BITS = 4096  # 64 longs; sized for the small build side at test SF
_BLOOM_WORDS = _BLOOM_BITS // 64


@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT
      l.l_returnflag,
      {sql_sum_exact("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
      CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l.l_returnflag
    """,
    doc=(
        "Hand-built runtime filter: the urgent-orders key set is folded "
        "into a 4096-bit Bloom bitmap (two xxhash64 probes per key) with "
        "one tiny pre-aggregation, the 64-long bitmap is embedded as a "
        "plan-time literal array, and the fact side is pre-filtered "
        "JVM-side with two bit tests BEFORE the shuffle of the exact "
        "left-semi verify join. This is the manual analogue of Spark's "
        "InjectRuntimeFilter / DPP for non-partition keys: at 100 TB the "
        "bitmap (a few KB) trims the fact-side shuffle by the build "
        "side's selectivity, and false positives are removed by the "
        "exact semi join, so the result is byte-identical to the plain "
        "semi join the oracle runs. Empty build side => all-zero bitmap "
        "=> fact side filtered to nothing without a scan of the probe "
        "relation."
    ),
    tags=("join", "bloom", "runtime-filter", "scale"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    def positions(key):
        # k=2 probes; seeds differ by an extra literal hashed in
        return F.array(
            F.pmod(F.xxhash64(key), F.lit(_BLOOM_BITS)),
            F.pmod(F.xxhash64(key, F.lit(1)), F.lit(_BLOOM_BITS)),
        )

    # Build: <=64 (word, bits) rows — a plan-time collect of a few KB,
    # exactly how runtime-filter build sides materialize on the driver.
    built = (
        urgent.select(F.explode(positions(F.col("o_orderkey"))).alias("pos"))
        .groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(1L, int(pmod(pos, 64))))").alias("bits")
        )
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for row in built:
        words[row["word"]] = row["bits"]
    bitmap_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"

    # The Python shiftright() API only accepts a literal bit count; the
    # SQL function takes expressions for both operands, so the two-probe
    # membership test is one whole-stage-codegen'd expr.
    def bit_set_sql(seed_sql: str) -> str:
        h = f"pmod(xxhash64(l_orderkey{seed_sql}), {_BLOOM_BITS})"
        return (
            f"(shiftright(element_at({bitmap_sql}, int({h} div 64) + 1),"
            f" int(pmod({h}, 64))) & 1) = 1"
        )

    candidates = li.filter(F.expr(f"{bit_set_sql('')} AND {bit_set_sql(', 1')}"))
    exact = candidates.join(urgent, candidates.l_orderkey == urgent.o_orderkey, "left_semi")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            sum_exact(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "join_asof_next_purchase_after_click",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT
        c.event_id,
        c.user_id,
        p.purchase_id,
        p.p_ts,
        ROW_NUMBER() OVER (
          PARTITION BY c.event_id
          ORDER BY p.p_ts ASC, p.purchase_id ASC
        ) AS rn
      FROM clicks c
      JOIN purchases p ON p.p_user = c.user_id AND p.p_ts > c.ts
    )
    SELECT event_id, user_id, purchase_id, p_ts
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "J5 forward as-of: for each click, the same user's EARLIEST "
        "purchase strictly after it — the attribution/look-ahead "
        "direction (touchpoint -> next conversion). min(struct) twin "
        "of the backward operator, same map-side partial-aggregation "
        "of the range blowup (operators/asof.py:asof_join_next)."
    ),
    tags=("join", "asof", "aggregation"),
)
def join_asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.asof import asof_join_next

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return asof_join_next(
        clicks, purchases, "user_id", "p_user", "ts", "p_ts", "purchase_id", "event_id"
    ).select("event_id", "user_id", "purchase_id", "p_ts")


@register(
    "join_right_outer_lineitem_customer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           o.o_orderkey,
           CAST(COUNT(l.l_linenumber) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2, 3
    """,
    doc=(
        "RIGHT OUTER join — the last explicit J1 mode (inner/left/"
        "semi/anti/full/cross are elsewhere): lineitem⋈orders shuffled "
        "on the fact key, then right-preserved against customer so "
        "order-less customers survive with NULL orders. Catalyst plans "
        "a right join as the mirrored left join (build side swap); at "
        "100 TB the customer side broadcasts and preservation costs "
        "nothing. NULL-safe count (COUNT(col) skips NULLs) keeps the "
        "preserved rows hash-identical."
    ),
    tags=("join", "outer", "customer"),
)
def join_right_outer_lineitem_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey, "right_outer")
        .groupBy("c_custkey", "c_mktsegment", "o_orderkey")
        .agg(F.count("l_linenumber").cast("long").alias("n_lines"))
    )


@register(
    "join_fuzzy_token_blocked",
    oracle="""
    WITH t AS (
      SELECT DISTINCT lower(p_name) AS nm,
             string_split(lower(p_name), ' ')[1] AS blk
      FROM part
    )
    SELECT a.nm AS a_name, b.nm AS b_name,
           CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist
    FROM t a JOIN t b
      ON a.blk = b.blk
     AND ABS(LENGTH(a.nm) - LENGTH(b.nm)) <= 2
     AND a.nm < b.nm
    WHERE levenshtein(a.nm, b.nm) <= 3
    """,
    doc=(
        "Entity-resolution fuzzy join with blocking: distinct part "
        "names matched at edit distance ≤ 3, joined ONLY within "
        "(first-token, ±2 length) blocks — the equi-key prefilter that "
        "turns an O(n²) edit-distance cross join into a bucketed "
        "equi-join plus a short candidate verify, the standard ER "
        "blocking shape. The length band is a theta residual on the "
        "equi-join, not a join key, so Catalyst plans a hash join on "
        "the token block. The oracle verifies against the SAME blocked "
        "predicate so blocking recall is a modeled decision, not an "
        "accident. At 100 TB: blocks bound candidate pairs; skewed "
        "blocks would get the salted-join treatment "
        "(operators/salted.py)."
    ),
    tags=("join", "fuzzy", "text"),
)
def join_fuzzy_token_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        table(spark, sf_dir, "part")
        .select(F.lower(F.col("p_name")).alias("nm"))
        .distinct()
        .withColumn("blk", F.split(F.col("nm"), " ")[0])
    )
    a = t.select(F.col("blk"), F.col("nm").alias("a_name"))
    b = t.select(F.col("blk"), F.col("nm").alias("b_name"))
    return (
        a.join(b, ["blk"])
        .filter(
            (F.abs(F.length("a_name") - F.length("b_name")) <= 2)
            & (F.col("a_name") < F.col("b_name"))
        )
        .withColumn("dist", F.levenshtein("a_name", "b_name").cast("int"))
        .filter(F.col("dist") <= 3)
        .select("a_name", "b_name", "dist")
    )


# --------------------------------------------------------------------------
# Interval-overlap self-join via bucketed range join
# --------------------------------------------------------------------------

IV_BUCKET_S = 600  # range-join bucket width (seconds)
IV_BASE_S = 60  # minimum interval duration
IV_MOD = 241  # deterministic per-event duration spread (prime)


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + {IV_BASE_S} + event_id % {IV_MOD} AS e
      FROM events
    )
    SELECT a.user_id,
           a.event_id AS a_id,
           b.event_id AS b_id,
           CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_s
    FROM iv a
    JOIN iv b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND a.s <= b.e
     AND b.s <= a.e
    """,
    doc=(
        "Interval-overlap self-join (events become [ts, ts+duration] "
        "intervals; find same-user overlapping pairs) executed as a "
        "BUCKETED range join, the scalable alternative to an inequality "
        f"theta-join: each interval explodes to the {IV_BUCKET_S}s buckets "
        "it covers (bounded: duration ≤ "
        f"{IV_BASE_S + IV_MOD - 1}s → ≤ 2 buckets), pairs meet through an "
        "EQUI-join on (user_id, bucket), and each pair is emitted exactly "
        "once by the canonical-bucket guard bucket = floor(max(s_a, s_b) / "
        "W) — no distinct, no double counting. At 100 TB this is O(n) "
        "shuffle on integer keys instead of the O(n²) "
        "BroadcastNestedLoopJoin a raw theta-join plans to."
    ),
    tags=("join", "range", "events"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").alias("s")
    iv = ev.select(
        "user_id",
        "event_id",
        s,
        (F.unix_timestamp("ts") + F.lit(IV_BASE_S) + F.col("event_id") % IV_MOD).alias("e"),
    )
    w = F.lit(IV_BUCKET_S)
    exploded = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.explode(F.sequence(F.floor(F.col("s") / w), F.floor(F.col("e") / w))).alias("bucket"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pair = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.event_id") < F.col("b.event_id")),
        "inner",
    ).where(
        (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # canonical-bucket guard: emit the pair only from the bucket that
        # contains the later interval start, so multi-bucket co-occurrence
        # never duplicates a pair.
        & (F.col("a.bucket") == F.floor(F.greatest(F.col("a.s"), F.col("b.s")) / w))
    )
    return pair.select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        (F.least(F.col("a.e"), F.col("b.e")) - F.greatest(F.col("a.s"), F.col("b.s")))
        .cast("long")
        .alias("overlap_s"),
    )


# --------------------------------------------------------------------------
# As-of join with tolerance, executed as a bucketed (2-probe) equi-join
# --------------------------------------------------------------------------

ASOF_TOL_S = 86400  # look back at most one day


@register(
    "join_asof_tolerance_bucketed",
    oracle=f"""
    WITH ranked AS (
      SELECT
        c.event_id,
        c.user_id,
        p.event_id AS purchase_id,
        p.ts AS purchase_ts,
        ROW_NUMBER() OVER (
          PARTITION BY c.event_id
          ORDER BY p.ts DESC, p.event_id DESC
        ) AS rn
      FROM events c
      JOIN events p
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase'
       AND p.ts <= c.ts
       AND CAST(floor(epoch(p.ts)) AS BIGINT)
             >= CAST(floor(epoch(c.ts)) AS BIGINT) - {ASOF_TOL_S}
      WHERE c.event_type = 'click'
    )
    SELECT event_id, user_id, purchase_id, purchase_ts
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "Tolerance-bounded as-of join (pandas merge_asof(tolerance=...) "
        "semantics: each click joined to the user's latest purchase "
        "within the trailing 24h) — and the tolerance is what makes the "
        "SCALABLE plan possible: with lookback T, bucket both sides by "
        "width-T time cells; every qualifying right row lives in the "
        "left row's cell or the one before, so the left side explodes "
        "exactly 2 probe buckets and the join is a pure EQUI-join on "
        "(user, bucket) — no range theta-join, no unbounded per-key "
        "scan, and state is bounded exactly like a stream-stream "
        "interval join's watermark. Candidates are range-filtered then "
        "reduced map-side by max(struct(ts, id)) before the final "
        "per-event shuffle. The unbounded-asof operator "
        "(operators/asof.py) stays for semantics that need all history."
    ),
    tags=("join", "asof", "events"),
)
def join_asof_tolerance_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("ts_s"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.floor(F.unix_timestamp("ts")).cast("long").alias("p_s"),
    ).withColumn("bk", F.floor(F.col("p_s") / ASOF_TOL_S))
    b = F.floor(F.col("ts_s") / ASOF_TOL_S)
    probe = clicks.select(
        "event_id",
        "user_id",
        "ts",
        "ts_s",
        F.explode(F.array(b - 1, b)).alias("bk"),
    )
    # upper bound at FULL timestamp precision (p.ts <= c.ts), exactly as
    # the oracle ranks: the second-grain p_s <= ts_s form admitted a
    # same-second purchase whose sub-second fraction is AFTER the click
    # (r8 sf0.75 catch — 1 of 52,953 rows; the r7 truncation class).
    # The tolerance lower bound stays second-grain on both engines.
    j = probe.join(
        purchases,
        (probe.user_id == purchases.p_user) & (probe.bk == purchases.bk),
        "inner",
    ).where(
        (F.col("purchase_ts") <= F.col("ts"))
        & (F.col("p_s") >= F.col("ts_s") - ASOF_TOL_S)
    )
    best = j.groupBy("event_id").agg(
        F.any_value(F.col("user_id")).alias("user_id"),
        F.max(F.struct("purchase_ts", "purchase_id")).alias("_b"),
    )
    return best.select(
        "event_id",
        "user_id",
        F.col("_b.purchase_id").alias("purchase_id"),
        F.col("_b.purchase_ts").alias("purchase_ts"),
    )


# --------------------------------------------------------------------------
# Null-key skew bypass for outer joins
# --------------------------------------------------------------------------


@register(
    "join_null_key_skew_bypass",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END
               AS cust_fk
      FROM orders
    )
    SELECT l.o_orderkey, l.cust_fk, c.c_mktsegment
    FROM l LEFT JOIN customer c ON l.cust_fk = c.c_custkey
    """,
    doc=(
        "The null-key skew idiom: in a LEFT join, every NULL foreign "
        "key matches nothing yet hashes to ONE partition — a third of "
        "this fixture's rows would pile onto a single task. The "
        "builder splits the stream: NULL-key rows bypass the join "
        "entirely (their output is known: right side all NULL) and "
        "union back with the non-null rows' real join — identical "
        "semantics to the oracle's plain LEFT JOIN, hash-proved, with "
        "the shuffle carrying ONLY matchable keys. The standard "
        "pre-AQE fix for null-heavy dimension keys, complementing "
        "operators/salted.py (hot non-null keys) and the AQE skew "
        "split test."
    ),
    tags=("join", "skew", "orders", "customer", "scale"),
)
def join_null_key_skew_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    nulls = o.where(F.col("cust_fk").isNull()).select(
        "o_orderkey", "cust_fk", F.lit(None).cast("string").alias("c_mktsegment")
    )
    matched = (
        o.where(F.col("cust_fk").isNotNull())
        .join(c, F.col("cust_fk") == F.col("c_custkey"), "left")
        .select("o_orderkey", "cust_fk", "c_mktsegment")
    )
    return matched.unionAll(nulls)


# -- nearest-direction as-of ------------------------------------------------


@register(
    "join_asof_nearest_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT
        c.event_id, c.user_id, p.purchase_id, p.p_ts,
        ROW_NUMBER() OVER (
          PARTITION BY c.event_id
          ORDER BY ABS(epoch_us(p.p_ts) - epoch_us(c.ts)), p.p_ts, p.purchase_id
        ) AS rn
      FROM clicks c JOIN purchases p ON p.p_user = c.user_id
    )
    SELECT event_id, user_id, purchase_id, p_ts
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "J5 nearest as-of (operators/asof.py:asof_join_nearest): for "
        "each click, the same user's purchase with MINIMAL |time "
        "delta| in either direction — pandas merge_asof(direction="
        "'nearest') semantics, the third direction next to the "
        "backward and forward operators. Ties prefer the earlier "
        "purchase, then min id (total order, hash-stable). Same "
        "map-side-combining min(struct) shape: the per-user blowup "
        "partial-aggregates before the shuffle."
    ),
    tags=("join", "asof", "aggregation"),
)
def join_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.operators.asof import asof_join_nearest

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return asof_join_nearest(
        clicks,
        purchases,
        "user_id",
        "p_user",
        "ts",
        "p_ts",
        "purchase_id",
        "event_id",
    ).select("event_id", "user_id", "purchase_id", "p_ts")


# -- interval-overlap DURATION aggregation ----------------------------------


@register(
    "join_overlap_duration_billing",
    oracle="""
    WITH sess AS (
      SELECT user_id, event_id,
             ts AS s_start,
             ts + INTERVAL 30 MINUTE AS s_end
      FROM events WHERE event_type = 'click'
    ),
    promo AS (
      SELECT event_id AS promo_id, user_id AS p_user,
             ts AS p_start,
             ts + INTERVAL 45 MINUTE AS p_end
      FROM events WHERE event_type = 'view'
    ),
    ovl AS (
      SELECT s.user_id, s.event_id, p.promo_id,
             CAST((epoch_us(LEAST(s.s_end, p.p_end))
                   - epoch_us(GREATEST(s.s_start, p.p_start))) // 1000000
                  AS BIGINT) AS overlap_s
      FROM sess s JOIN promo p
        ON p.p_user = s.user_id
       AND p.p_start < s.s_end AND s.s_start < p.p_end
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(SUM(overlap_s) AS BIGINT) AS total_overlap_s,
           CAST(MAX(overlap_s) AS BIGINT) AS max_overlap_s
    FROM ovl
    GROUP BY user_id
    """,
    doc=(
        "Interval-overlap DURATION aggregation — not just WHICH "
        "intervals intersect (join_interval_overlap) but for HOW LONG: "
        "per user, click-sessions (30 min) against promo-view windows "
        "(45 min), overlap seconds = least(ends) - greatest(starts), "
        "summed per user — the billing/attribution/exposure "
        "computation behind ad-viewability and on-call-overlap "
        "reports. The range predicate rides on the user_id equi-join "
        "(per-key blowup only), and epoch-second arithmetic keeps the "
        "durations integer-exact."
    ),
    tags=("join", "interval", "events"),
)
def join_overlap_duration_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sess = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("s_end"),
    )
    promo = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("promo_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTE")).alias("p_end"),
    )
    j = sess.join(
        promo,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_start") < F.col("s_end"))
        & (F.col("s_start") < F.col("p_end")),
    )
    overlap_us = F.unix_micros(
        F.least("s_end", "p_end").cast("timestamp")
    ) - F.unix_micros(F.greatest("s_start", "p_start").cast("timestamp"))
    overlap_s = ((overlap_us - overlap_us % 1000000) / 1000000).cast("long")
    return (
        j.withColumn("overlap_s", overlap_s)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlapping_pairs"),
            F.sum("overlap_s").cast("long").alias("total_overlap_s"),
            F.max("overlap_s").cast("long").alias("max_overlap_s"),
        )
    )


# -- eager aggregation (partial agg pushed below the join) ------------------


@register(
    "join_eager_aggregation_rewrite",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc=(
        "Eager aggregation (a.k.a. partial group-by pushdown, Yan & "
        "Larson VLDB'95): the semantic query is join-then-aggregate, "
        "but because the final keys come from the DIMENSION and the "
        "measures from the FACT, the fact legally pre-aggregates to "
        "customer grain BEFORE the join — the join input shrinks from "
        "|orders| to |customers| and the measures roll up after. The "
        "oracle states the naive join-then-agg; the hash match proves "
        "the rewrite's algebra (COUNT becomes SUM of partial counts). "
        "Catalyst does not apply this rewrite itself, so at 100 TB "
        "doing it by hand is a first-order shuffle saving on every "
        "star-schema rollup whose group keys are dimension attributes."
    ),
    tags=("join", "aggregation", "rewrite", "scale"),
)
def join_eager_aggregation_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pre = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("pn"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("prev_c"),
    )
    return (
        pre.join(c, pre["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.sum("prev_c").cast("long").alias("revenue_c"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Edit-distance self-join via deletion-neighborhood (FastSS) blocking
# --------------------------------------------------------------------------


@register(
    "join_edit_distance_blocked",
    oracle="""
    -- deletion-neighborhood blocking in the oracle too (r7): the raw
    -- length+levenshtein join's only equi-key is length(), and every
    -- fixture name is exactly 18 chars, so DuckDB degenerated to ONE
    -- hash bucket of n^2/2 levenshtein calls (37+ CPU-minutes at
    -- sf0.5). The (position, variant) equi-join is lossless for
    -- equal-length distance-1 pairs and emits each exactly once; the
    -- levenshtein(a,b) = 1 verify below keeps the oracle's
    -- definitional independence on the candidate set.
    WITH del AS (
      SELECT c_custkey, c_name, i,
             substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS variant
      FROM customer,
           UNNEST(generate_series(1, length(c_name))) AS u(i)
    )
    SELECT a.c_custkey AS key_a,
           b.c_custkey AS key_b,
           a.c_name AS name_a,
           b.c_name AS name_b,
           CAST(1 AS BIGINT) AS dist
    FROM del a
    JOIN del b
      ON a.i = b.i AND a.variant = b.variant
     AND a.c_custkey < b.c_custkey
     AND length(a.c_name) = length(b.c_name)
    WHERE levenshtein(a.c_name, b.c_name) = 1
    ORDER BY key_a, key_b
    """,
    doc=(
        "Edit-distance-1 self-join over customer names WITHOUT the "
        "O(n^2) all-pairs scan: FastSS deletion-neighborhood blocking. "
        "Each name emits its length(name) single-character-deletion "
        "variants keyed by (position, variant); two equal-length "
        "strings at Hamming distance 1 collide on EXACTLY the one key "
        "whose position is their differing character (including the "
        "position in the key is what excludes transposition-style "
        "dist-2 collisions like abc~bcd), so the equi-join emits each "
        "qualifying pair exactly once — no distinct needed. The "
        "verify step exploits the same invariant: equal-length "
        "strings colliding on (position, variant) agree everywhere "
        "EXCEPT position i, so distance==1 is exactly 'chars at i "
        "differ' — an O(1) byte compare per candidate instead of the "
        "O(len²) levenshtein DP (r5: was the query's dominant cost, "
        "~2.5s of DP over 262k candidates at sf0.1; the oracle keeps "
        "the levenshtein()==1 definition, so parity still proves the "
        "equivalence). Scale: 18n blocking rows, one hash-shuffle "
        "equi-join, block keys carry the variable digits so no hot "
        "key; the oracle is the quadratic definition the blocker "
        "provably equals on a fixed-length corpus (doc: same-length "
        "names only — general k-edit joins extend the neighborhood "
        "to k deletions)."
    ),
    tags=("join", "similarity", "blocking", "scale"),
)
def join_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = c.select(
        "c_custkey",
        "c_name",
        F.length("c_name").alias("ln"),
        F.posexplode(
            F.expr(
                "transform(sequence(0, length(c_name) - 1), "
                "i -> concat(substring(c_name, 1, i), "
                "substring(c_name, i + 2)))"
            )
        ).alias("i", "variant"),
    )
    a = variants.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("ln").alias("ln_a"),
        "i",
        "variant",
    )
    b = variants.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("ln").alias("ln_b"),
        F.col("i").alias("i_b"),
        F.col("variant").alias("variant_b"),
    )
    pairs = a.join(
        b,
        (F.col("i") == F.col("i_b"))
        & (F.col("variant") == F.col("variant_b"))
        & (F.col("key_a") < F.col("key_b"))
        & (F.col("ln_a") == F.col("ln_b")),
    )
    differ_at_i = F.expr("substring(name_a, i + 1, 1) <> substring(name_b, i + 1, 1)")
    return (
        pairs.filter(differ_at_i)
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.lit(1).cast("long").alias("dist"),
        )
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# FIFO inventory costing: sequential allocation as interval overlap
# ---------------------------------------------------------------------------


@register(
    "join_fifo_cost_allocation",
    oracle="""
    WITH lots AS (
      -- (l_orderkey, l_linenumber) is NOT unique per part (linenumber
      -- cycles within large orders), so the arrival order carries qty
      -- and unit cost as deterministic tiebreaks; rows identical in
      -- all four are interchangeable (same intervals, same cost), so
      -- the allocation is total-order-stable on both engines
      SELECT l_partkey AS pk,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS unit_cents,
             SUM(CAST(l_quantity AS BIGINT)) OVER w AS cb,
             COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_orderkey, l_linenumber,
                        CAST(l_quantity AS BIGINT),
                        CAST(ROUND(l_extendedprice * 100 / l_quantity)
                             AS BIGINT)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb0
      FROM lineitem WHERE l_orderkey % 2 = 0
      WINDOW w AS (PARTITION BY l_partkey
                   ORDER BY l_orderkey, l_linenumber,
                            CAST(l_quantity AS BIGINT),
                            CAST(ROUND(l_extendedprice * 100 / l_quantity)
                                 AS BIGINT))
    ),
    sales AS (
      SELECT l_partkey AS pk,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT)) OVER w AS cs,
             COALESCE(SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_orderkey, l_linenumber,
                        CAST(l_quantity AS BIGINT),
                        CAST(ROUND(l_extendedprice * 100 / l_quantity)
                             AS BIGINT)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs0
      FROM lineitem WHERE l_orderkey % 2 = 1
      WINDOW w AS (PARTITION BY l_partkey
                   ORDER BY l_orderkey, l_linenumber,
                            CAST(l_quantity AS BIGINT),
                            CAST(ROUND(l_extendedprice * 100 / l_quantity)
                                 AS BIGINT))
    ),
    alloc AS (
      SELECT l.pk,
             LEAST(l.cb, s.cs) - GREATEST(l.cb0, s.cs0) AS aq,
             l.unit_cents
      FROM lots l JOIN sales s
        ON s.pk = l.pk AND l.cb0 < s.cs AND s.cs0 < l.cb
    )
    SELECT pk AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_allocations,
           CAST(SUM(aq) AS BIGINT) AS qty_allocated,
           CAST(SUM(aq * unit_cents) AS BIGINT) AS cogs_cents
    FROM alloc
    GROUP BY pk
    ORDER BY pk
    """,
    doc=(
        "FIFO inventory cost allocation — the financial-costing "
        "operator usually written as a slow procedural loop: purchases "
        "(even orderkeys, as lots) are consumed by sales (odd "
        "orderkeys) strictly in arrival order, and cost of goods sold "
        "prices each sold unit at ITS lot's unit cost. The scalable "
        "rewrite: cumulative-quantity windows turn every lot and sale "
        "into an interval on the per-part consumption axis, and FIFO "
        "allocation becomes an INTERVAL-OVERLAP EQUI-JOIN on partkey "
        "(overlap = min(cb,cs) - max(cb0,cs0)) — one hash shuffle, "
        "per-key-bounded pair counts, no loop, no recursion. "
        "Quantities are exact integers; unit cost is one shared "
        "round() both engines evaluate identically. The same rewrite "
        "powers queue-draining, budget-exhaustion and ad-pacing "
        "allocations at 100 TB."
    ),
    tags=("join", "interval", "finance", "lineitem"),
)
def join_fifo_cost_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
        .cast("long")
        .alias("unit_cents"),
    )
    # (l_orderkey, l_linenumber) ties per part exist (linenumber cycles
    # within large orders): qty + unit_cents complete the total order;
    # fully-identical rows commute, so the allocation is deterministic
    w = Window.partitionBy("l_partkey").orderBy(
        "l_orderkey", "l_linenumber", "qty", "unit_cents"
    )
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    lots = li.filter(F.col("l_orderkey") % 2 == 0).select(
        F.col("l_partkey").alias("pk"),
        "unit_cents",
        F.sum("qty").over(w).alias("cb"),
        F.coalesce(F.sum("qty").over(wprev), F.lit(0)).alias("cb0"),
    )
    sales = li.filter(F.col("l_orderkey") % 2 == 1).select(
        F.col("l_partkey").alias("pk"),
        F.sum("qty").over(w).alias("cs"),
        F.coalesce(F.sum("qty").over(wprev), F.lit(0)).alias("cs0"),
    )
    alloc = (
        lots.join(sales, "pk")
        .filter((F.col("cb0") < F.col("cs")) & (F.col("cs0") < F.col("cb")))
        .select(
            "pk",
            (F.least("cb", "cs") - F.greatest("cb0", "cs0")).alias("aq"),
            "unit_cents",
        )
    )
    return (
        alloc.groupBy(F.col("pk").alias("partkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_allocations"),
            F.sum("aq").cast("long").alias("qty_allocated"),
            F.sum(F.col("aq") * F.col("unit_cents"))
            .cast("long")
            .alias("cogs_cents"),
        )
        .orderBy("partkey")
    )
