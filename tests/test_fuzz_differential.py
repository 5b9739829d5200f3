"""Seeded differential fuzzing (mini-SQLsmith): generate random
filter→group→aggregate shapes over `orders`, run each as BOTH a Spark
DataFrame plan and the equivalent ANSI SQL on DuckDB, and require exact
row/schema/value parity. Hand-written queries pin known semantics;
the fuzzer sweeps the combinatorial space between them. Deterministic
seeds → reproducible failures."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from tools.oracle_check import compare, normalize

# (spark_column_builder, sql_fragment) predicate atoms — all integer /
# string comparisons so parity can never hinge on float formatting.
_PREDICATES = [
    (lambda: F.col("o_orderkey") % 7 == 3, "o_orderkey % 7 = 3"),
    (lambda: F.col("o_orderkey") % 4 != 0, "o_orderkey % 4 <> 0"),
    (lambda: F.col("o_custkey") < 700, "o_custkey < 700"),
    (lambda: F.col("o_custkey") >= 200, "o_custkey >= 200"),
    (lambda: F.col("o_orderstatus") == "O", "o_orderstatus = 'O'"),
    (lambda: F.col("o_orderstatus") != "P", "o_orderstatus <> 'P'"),
    (
        lambda: F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    ),
    (
        lambda: F.round(F.col("o_totalprice") * 100).cast("long") > 10_000_000,
        "CAST(round(o_totalprice * 100) AS BIGINT) > 10000000",
    ),
]

_GROUP_KEYS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    (None, None),  # placeholder replaced by derived key below
]

_AGGS = [
    (
        lambda: F.count(F.lit(1)).cast("long").alias("agg_n"),
        "CAST(COUNT(*) AS BIGINT) AS agg_n",
    ),
    (
        lambda: F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("agg_cents"),
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS agg_cents",
    ),
    (
        lambda: F.min("o_orderkey").alias("agg_min_key"),
        "MIN(o_orderkey) AS agg_min_key",
    ),
    (
        lambda: F.max("o_custkey").alias("agg_max_cust"),
        "MAX(o_custkey) AS agg_max_cust",
    ),
    (
        lambda: F.count_distinct(F.col("o_custkey")).cast("long").alias("agg_nd_cust"),
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS agg_nd_cust",
    ),
]


def _gen(seed: int):
    rng = random.Random(seed)
    preds = rng.sample(_PREDICATES, rng.randint(1, 3))
    conj = rng.choice([" AND ", " OR "])
    n_keys = rng.randint(0, 2)
    keys = rng.sample([k for k in _GROUP_KEYS if k[0]], n_keys) if n_keys else []
    if rng.random() < 0.3:
        keys = keys[:1] + [("derived_bucket", "derived_bucket")]
    aggs = rng.sample(_AGGS, rng.randint(1, 3))
    return preds, conj, keys, aggs


@pytest.mark.parametrize("seed", range(30))
def test_random_shape_matches_duckdb(spark, sf_dir, duck, seed):
    preds, conj, keys, aggs = _gen(seed)

    o = table(spark, sf_dir, "orders").withColumn(
        "derived_bucket", (F.col("o_orderkey") % 5).cast("long")
    )
    cond = preds[0][0]()
    for p, _ in preds[1:]:
        cond = (cond & p()) if conj == " AND " else (cond | p())
    filtered = o.filter(cond)
    key_names = [k for k, _ in keys]
    if key_names:
        sdf = filtered.groupBy(*key_names).agg(*[a() for a, _ in aggs])
    else:
        sdf = filtered.agg(*[a() for a, _ in aggs])

    where = conj.join(s for _, s in preds)
    select_keys = ", ".join(s for _, s in keys)
    select_aggs = ", ".join(s for _, s in aggs)
    select = f"{select_keys}, {select_aggs}" if select_keys else select_aggs
    group = f"GROUP BY {select_keys}" if select_keys else ""
    sql = f"""
      WITH o AS (
        SELECT *, CAST(o_orderkey % 5 AS BIGINT) AS derived_bucket FROM orders
      )
      SELECT {select} FROM o WHERE {where} {group}
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(f"fuzz_seed_{seed}", normalize(sdf.toPandas()), normalize(ddf))
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"
