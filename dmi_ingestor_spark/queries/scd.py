"""Slowly-changing-dimension (SCD2) history merge.

[ext] surface (absent from the reference, ``dmi_ingestor/ingestor.py``
has no dimension management): the warehouse-standard "merge a new
dimension snapshot into a validity-interval history" operator that
every production analytics stack runs nightly. Spark has no MERGE INTO
on plain parquet, so the operator is expressed as the underlying
relational algebra — one full-outer join of old vs new snapshot on the
business key, change detection on the tracked attributes, and a
union of the four row fates:

  unchanged -> keep open row
  changed   -> close old row (valid_to = D) + open new row
  deleted   -> close old row
  inserted  -> open new row

Scale shape: ONE shuffle on the business key for the outer join (or
zero with bucketed snapshots, cf. operators/bucketing.py); the fates
are a Project + Union over the join output — no second pass, no
window, no skew-sensitive key. At 100 TB dimension scale this is the
textbook plan; the naive alternative (anti-joins per fate) re-shuffles
the snapshots four times.

The "new snapshot" is derived deterministically from the customer
table (segment upgrade for high-balance customers, deletion of every
97th key) so the query is self-contained and the DuckDB oracle can
rebuild the identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register

_EFFECTIVE = "1998-06-01"
_ORIGIN = "1990-01-01"
_BAL_CUT = 7500.0
_DEL_MOD = 97

_SQL_NEW_SNAPSHOT = f"""
      SELECT c_custkey,
             CASE WHEN c_acctbal > {_BAL_CUT} THEN 'PREMIUM'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer
      WHERE c_custkey % {_DEL_MOD} <> 0
"""


@register(
    "scd2_dimension_merge",
    oracle=f"""
    WITH old AS (
      SELECT c_custkey, c_mktsegment FROM customer
    ), new AS ({_SQL_NEW_SNAPSHOT}
    ), j AS (
      SELECT COALESCE(old.c_custkey, new.c_custkey) AS c_custkey,
             old.c_mktsegment AS seg_old, new.c_mktsegment AS seg_new,
             old.c_custkey IS NOT NULL AS in_old,
             new.c_custkey IS NOT NULL AS in_new
      FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
    )
    SELECT c_custkey, seg_old AS c_mktsegment,
           '{_ORIGIN}' AS valid_from,
           CASE WHEN in_new AND seg_old = seg_new THEN NULL
                ELSE '{_EFFECTIVE}' END AS valid_to,
           (in_new AND seg_old = seg_new) AS is_current
    FROM j WHERE in_old
    UNION ALL
    SELECT c_custkey, seg_new, '{_EFFECTIVE}', NULL, TRUE
    FROM j
    WHERE in_new AND (NOT in_old OR seg_old <> seg_new)
    """,
    doc=(
        "SCD2 dimension-history merge: old vs new customer snapshot "
        "full-outer-joined on the business key, each key classified "
        "unchanged/changed/deleted/inserted, history rows emitted with "
        "[valid_from, valid_to) intervals and an is_current flag. ONE "
        "key shuffle total; fates are projections over the single join "
        "output, not per-fate anti-joins."
    ),
    tags=("scd2", "merge", "dimension", "customer"),
)
def scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    old = c.select("c_custkey", "c_mktsegment")
    new = (
        c.filter(F.col("c_custkey") % _DEL_MOD != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") > _BAL_CUT, F.lit("PREMIUM"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
    )
    j = (
        old.alias("o")
        .join(new.alias("n"), "c_custkey", "full_outer")
        .select(
            "c_custkey",
            F.col("o.c_mktsegment").alias("seg_old"),
            F.col("n.c_mktsegment").alias("seg_new"),
        )
        .withColumn("in_old", F.col("seg_old").isNotNull())
        .withColumn("in_new", F.col("seg_new").isNotNull())
    )
    unchanged = F.col("in_new") & (F.col("seg_old") == F.col("seg_new"))
    historical = j.filter("in_old").select(
        "c_custkey",
        F.col("seg_old").alias("c_mktsegment"),
        F.lit(_ORIGIN).alias("valid_from"),
        F.when(unchanged, F.lit(None).cast("string"))
        .otherwise(F.lit(_EFFECTIVE))
        .alias("valid_to"),
        unchanged.alias("is_current"),
    )
    opened = j.filter(
        F.col("in_new") & (~F.col("in_old") | (F.col("seg_old") != F.col("seg_new")))
    ).select(
        "c_custkey",
        F.col("seg_new").alias("c_mktsegment"),
        F.lit(_EFFECTIVE).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return historical.unionByName(opened)


_PIT_SWITCH = "1997-01-01"


@register(
    "join_point_in_time_scd2",
    oracle=f"""
    WITH hist AS (
      SELECT c_custkey, c_mktsegment AS seg, 1 AS version_no,
             TIMESTAMP '{_ORIGIN} 00:00:00' AS valid_from,
             TIMESTAMP '{_PIT_SWITCH} 00:00:00' AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CASE WHEN c_acctbal > {_BAL_CUT} THEN 'PREMIUM'
                  ELSE c_mktsegment END,
             2, TIMESTAMP '{_PIT_SWITCH} 00:00:00', NULL
      FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey,
           h.seg AS seg_at_order,
           CAST(h.version_no AS INTEGER) AS version_no
    FROM orders o
    JOIN hist h
      ON o.o_custkey = h.c_custkey
     AND o.o_orderdate >= h.valid_from
     AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
    """,
    doc=(
        "Temporal / point-in-time join: each order is matched to the "
        "dimension version whose [valid_from, valid_to) interval "
        "contains o_orderdate — the lookup every SCD2 warehouse runs "
        "on every fact load. The history (2 versions per key, derived "
        "deterministically from customer like scd2_dimension_merge) "
        "joins as a plain EQUI join on the business key with the "
        "interval as a post-join filter: versions-per-key is small and "
        "bounded, so this shuffles each side once and never "
        "nested-loops — the right plan at fact scale, vs. a pure range "
        "join that BNLJs the whole fact table."
    ),
    tags=("scd2", "join", "temporal", "orders"),
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.lit(1).alias("version_no"),
        F.lit(_ORIGIN).cast("timestamp").alias("valid_from"),
        F.lit(_PIT_SWITCH).cast("timestamp").alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > _BAL_CUT, F.lit("PREMIUM"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.lit(2).alias("version_no"),
        F.lit(_PIT_SWITCH).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = v1.unionByName(v2)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("timestamp").alias("od")
    )
    return (
        o.join(hist, o.o_custkey == hist.c_custkey)
        .filter(
            (F.col("od") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("od") < F.col("valid_to")))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("seg").alias("seg_at_order"),
            F.col("version_no").cast("int").alias("version_no"),
        )
    )


@register(
    "cdc_apply_changes",
    oracle="""
    WITH changes AS (
      -- deterministic change stream over the customer dimension:
      -- seq 1: upsert every key (the initial snapshot load)
      SELECT c_custkey AS k, 1 AS seq, 'U' AS op, c_mktsegment AS seg
      FROM customer
      UNION ALL
      -- seq 2: segment upgrade for high-balance keys
      SELECT c_custkey, 2, 'U', 'PREMIUM'
      FROM customer WHERE c_acctbal > 7500.0
      UNION ALL
      -- seq 3: delete every 23rd key
      SELECT c_custkey, 3, 'D', NULL
      FROM customer WHERE c_custkey % 23 = 0
    ), latest AS (
      SELECT k,
             arg_max(op, seq) AS op,
             arg_max(seg, seq) AS seg
      FROM changes GROUP BY k
    )
    SELECT k AS c_custkey, seg AS c_mktsegment
    FROM latest WHERE op <> 'D'
    """,
    doc=(
        "CDC apply: fold an ordered change stream (upserts + deletes, "
        "ordered by sequence number) onto a snapshot — the batch "
        "MERGE-equivalent every lakehouse table maintenance job runs. "
        "Last-writer-wins is ONE hash aggregate (max_by(op/val, seq) "
        "is map-side combinable), then deletes drop out — no window, "
        "no per-key sort, no iterative apply. The change stream is "
        "derived deterministically from customer so both engines fold "
        "identical input."
    ),
    tags=("cdc", "merge", "scd2"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    load = c.select(
        F.col("c_custkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.col("c_mktsegment").alias("seg"),
    )
    upgrade = c.filter(F.col("c_acctbal") > 7500.0).select(
        F.col("c_custkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.lit("PREMIUM").alias("seg"),
    )
    delete = c.filter(F.col("c_custkey") % 23 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("seg"),
    )
    changes = load.unionByName(upgrade).unionByName(delete)
    latest = changes.groupBy("k").agg(
        F.max_by("op", F.col("seq")).alias("op"),
        F.max_by("seg", F.col("seq")).alias("seg"),
    )
    return latest.filter(F.col("op") != "D").select(
        F.col("k").alias("c_custkey"), F.col("seg").alias("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Bitemporal as-of join (valid time x transaction time)
# --------------------------------------------------------------------------


@register(
    "join_bitemporal_as_of",
    oracle="""
    WITH dim AS (
      -- version 1 row: original nation, valid from month 0, known at tx 1
      SELECT c_custkey, c_nationkey AS nationkey,
             0 AS valid_from, 1 AS recorded_at
      FROM customer
      UNION ALL
      -- late correction: every 13th customer's nation was actually
      -- nation+1 from month 6 on — but the warehouse only LEARNED it
      -- at tx 2
      SELECT c_custkey, (c_nationkey + 1) % 25, 6, 2
      FROM customer WHERE c_custkey % 13 = 0
    ),
    facts AS (
      SELECT o_orderkey, o_custkey,
             EXTRACT(MONTH FROM o_orderdate) - 1 AS ev_month
      FROM orders
    ),
    fanned AS (
      SELECT f.*, v.tx FROM facts f
      CROSS JOIN (VALUES (1), (2)) v(tx)
    ),
    resolved AS (
      SELECT x.o_orderkey, x.tx, d.nationkey,
             ROW_NUMBER() OVER (
               PARTITION BY x.o_orderkey, x.tx
               ORDER BY d.valid_from DESC, d.recorded_at DESC
             ) AS rk
      FROM fanned x
      JOIN dim d
        ON d.c_custkey = x.o_custkey
       AND d.valid_from <= x.ev_month
       AND d.recorded_at <= x.tx
    )
    SELECT CAST(tx AS BIGINT) AS as_known_at_tx,
           CAST(nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM resolved WHERE rk = 1
    GROUP BY tx, nationkey
    ORDER BY as_known_at_tx, nationkey
    """,
    doc=(
        "Bitemporal as-of join — BOTH time axes at once: each order "
        "resolves its customer's nation as VALID at the order's event "
        "month (valid time) and as KNOWN at a given warehouse "
        "transaction version (transaction time). A late-arriving "
        "correction (recorded at tx 2, retroactively valid from "
        "month 6) therefore changes how HISTORY aggregates when read "
        "at tx 2, while the tx-1 readout reproduces exactly what the "
        "warehouse would have reported before the correction — the "
        "reproducibility property regulatory reporting and ML "
        "training-set freezes depend on, and the relational "
        "composition of SCD2 (valid time) with txlog time travel "
        "(transaction time). Resolution is one keyed join plus a "
        "per-(fact, tx) latest-version window, PARTITIONED by fact "
        "key — no global sort; at 100 TB the dimension history "
        "broadcasts and facts never move twice."
    ),
    tags=("scd2", "join", "temporal", "bitemporal", "orders"),
)
def join_bitemporal_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    dim = c.select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.lit(0).alias("valid_from"),
        F.lit(1).alias("recorded_at"),
    ).unionAll(
        c.filter(F.col("c_custkey") % 13 == 0).select(
            "c_custkey",
            ((F.col("c_nationkey") + 1) % 25).alias("nationkey"),
            F.lit(6).alias("valid_from"),
            F.lit(2).alias("recorded_at"),
        )
    )
    facts = o.select(
        "o_orderkey", "o_custkey", (F.month("o_orderdate") - 1).alias("ev_month")
    )
    fanned = facts.select(
        "o_orderkey",
        "o_custkey",
        "ev_month",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("tx"),
    )
    joined = fanned.join(
        F.broadcast(dim),
        (dim.c_custkey == fanned.o_custkey)
        & (dim.valid_from <= fanned.ev_month)
        & (dim.recorded_at <= fanned.tx),
    )
    w = Window.partitionBy("o_orderkey", "tx").orderBy(
        F.col("valid_from").desc(), F.col("recorded_at").desc()
    )
    resolved = joined.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return (
        resolved.groupBy(
            F.col("tx").cast("long").alias("as_known_at_tx"),
            F.col("nationkey").cast("long").alias("nationkey"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("as_known_at_tx", "nationkey")
    )
