"""UDAF surface (SURVEY.md §2.10 U9): grouped pandas aggregation.

The reference has no aggregation at all (its only fold is the manifest
dict build, ``dmi_ingestor/ingestor.py:102,116-118``); this is the [ext]
custom-aggregate surface: ``applyInPandas`` for full-group arbitrary
logic and a grouped-agg ``pandas_udf`` for scalar reductions.

Oracle-parity design: inputs are quantized to integer-valued doubles
first (``functions/vector.py`` convention). Integer sums below 2^53 are
exact in ANY summation order — numpy, Spark partial aggregation, and
DuckDB all produce the identical double — so even the Python-side UDAFs
get real SQL oracles instead of rows-only checks.

Scale notes: ``applyInPandas`` ships one group per Arrow batch — fine
here because a group is one label's embeddings (bounded); for unbounded
groups prefer partial aggregation (the built-in twin below shows the
equivalent shuffle-light formulation: explode → partial+final hash agg).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.functions.vector import quantize
from dmi_ingestor_spark.registry import register

_CENTROID_ORACLE = """
    WITH q AS (
      SELECT CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
      FROM embeddings
    ), flat AS (
      SELECT label,
             CAST(generate_subscripts(qv, 1) AS BIGINT) AS pos,
             unnest(qv) AS v
      FROM q
    )
    SELECT label, pos, SUM(v) / COUNT(*) AS centroid_q
    FROM flat
    GROUP BY label, pos
"""


@register(
    "udaf_centroid_pandas",
    oracle=_CENTROID_ORACLE,
    doc=(
        "U9: per-label embedding centroid via applyInPandas (Arrow "
        "batches, numpy mean over exact integer-valued doubles)."
    ),
    tags=("udaf", "pandas", "embeddings"),
)
def udaf_centroid_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        quantize(F.col("embedding")).alias("qv"),
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = np.stack(pdf["qv"].to_numpy())  # (n_vecs, dim), integer-valued
        s = m.sum(axis=0)  # exact: |Σ| << 2^53
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "pos": np.arange(1, m.shape[1] + 1, dtype="int64"),
                "centroid_q": s / len(pdf),
            }
        )

    return e.groupBy("label").applyInPandas(
        centroid, "label long, pos long, centroid_q double"
    )


@register(
    "centroid_per_label_builtin",
    oracle=_CENTROID_ORACLE,
    doc=(
        "U9 twin of udaf_centroid_pandas in pure Catalyst: posexplode → "
        "partial+final hash agg. Same result, but scale-preferred: the "
        "shuffle carries (label, pos, partial sums) — O(labels × dim) — "
        "instead of whole groups, and no Python boundary."
    ),
    tags=("udaf", "aggregation", "embeddings"),
)
def centroid_per_label_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        quantize(F.col("embedding")).alias("qv"),
    )
    return (
        e.select("label", F.posexplode("qv").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg((F.sum("v") / F.count(F.lit(1))).alias("centroid_q"))
    )


@register(
    "udaf_grouped_mean_acctbal",
    oracle="""
    SELECT c_mktsegment,
           SUM(round(c_acctbal * 100)) / COUNT(*) / 100 AS mean_acctbal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc=(
        "U9: scalar grouped-agg pandas_udf (Arrow-vectorized mean over "
        "cent-quantized balances — exact integer arithmetic)."
    ),
    tags=("udaf", "pandas"),
)
def udaf_grouped_mean_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def mean_cents(v: pd.Series) -> float:
        # v is integer-valued (cents); the sum is exact in float64
        return float(v.sum() / len(v) / 100.0)

    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment", F.round(F.col("c_acctbal") * 100, 0).alias("cents")
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(mean_cents("cents").alias("mean_acctbal"))
        .orderBy("c_mktsegment")
    )


@register(
    "cogroup_reconcile_pandas",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT
      o.o_orderkey,
      CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_int,
      CAST(COALESCE(l.n_items, 0) AS BIGINT) AS n_items,
      CAST(COALESCE(l.sum_qty, 0) AS BIGINT) AS sum_qty
    FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    """,
    doc=(
        "U9 cogroup surface: ``groupBy(key).cogroup(other.groupBy(key))"
        ".applyInPandas`` — both tables arrive per-key as pandas frames "
        "in ONE co-partitioned shuffle (the Arrow twin of a sort-merge "
        "join + grouped map). Reconciles each order against its "
        "lineitems with integer-exact sums so the Python path is "
        "hash-checkable against the plain join+agg oracle. This is the "
        "API for keyed multi-table Python logic (per-entity model "
        "scoring over features + labels) where two joins + a grouped "
        "map would shuffle twice."
    ),
    tags=("udaf", "cogroup", "pandas"),
)
def cogroup_reconcile_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    # Cogroup on a BUCKET of the key, not the key itself: one Python
    # call per bucket (vectorized pandas merge inside) instead of one
    # per order — per-group Arrow/pandas dispatch overhead is the cost
    # that kills fine-grained applyInPandas at scale.
    ob = o.withColumn("bucket", F.pmod(F.col("o_orderkey"), F.lit(512)))
    lb = li.withColumn("bucket", F.pmod(F.col("l_orderkey"), F.lit(512)))

    def reconcile(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:  # lineitems with no order row: nothing to emit
            return pd.DataFrame(
                columns=["o_orderkey", "price_int", "n_items", "sum_qty"]
            )
        agg = (
            ldf.groupby("l_orderkey")["l_quantity"]
            .agg(n_items="size", sum_qty="sum")
            .reset_index()
        )
        m = odf.merge(
            agg, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"],
                "price_int": (m["o_totalprice"] * 100).round().astype("int64"),
                "n_items": m["n_items"].fillna(0).astype("int64"),
                "sum_qty": m["sum_qty"].fillna(0).astype("int64"),
            }
        )

    return (
        ob.groupBy("bucket")
        .cogroup(lb.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, price_int long, n_items long, sum_qty long",
        )
    )
