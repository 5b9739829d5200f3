"""Seeded differential fuzzing (mini-SQLsmith): generate random
filter→group→aggregate shapes over `orders`, run each as BOTH a Spark
DataFrame plan and the equivalent ANSI SQL on DuckDB, and require exact
row/schema/value parity. Hand-written queries pin known semantics;
the fuzzer sweeps the combinatorial space between them. Deterministic
seeds → reproducible failures."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window
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


# ---------------------------------------------------------------------------
# Join-shape fuzzing: random join type × predicate × aggregation
# ---------------------------------------------------------------------------

_JOIN_TYPES = ["inner", "left", "right", "full", "semi", "anti"]

_O_PRED = [
    (lambda: F.col("o_orderkey") % 3 == 1, "o.o_orderkey % 3 = 1"),
    (lambda: F.col("o_totalprice") > 150000.0, "o.o_totalprice > 150000.0"),
    (lambda: F.col("o_orderstatus") != "F", "o.o_orderstatus <> 'F'"),
]
_C_PRED = [
    (lambda: F.col("c_acctbal") > 0.0, "c.c_acctbal > 0.0"),
    (lambda: F.col("c_mktsegment") == "BUILDING", "c.c_mktsegment = 'BUILDING'"),
    (lambda: F.col("c_custkey") % 2 == 0, "c.c_custkey % 2 = 0"),
]


@pytest.mark.parametrize("seed", range(20))
def test_random_join_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(1000 + seed)
    how = rng.choice(_JOIN_TYPES)
    op, osql = rng.choice(_O_PRED)
    cp, csql = rng.choice(_C_PRED)

    o = table(spark, sf_dir, "orders").filter(op())
    c = table(spark, sf_dir, "customer").filter(cp())
    joined = o.join(c, o.o_custkey == c.c_custkey, how)
    if how in ("semi", "anti"):
        sdf = joined.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("long").alias("agg_n"),
            F.min("o_orderkey").alias("agg_min_key"),
        )
        exists = "EXISTS" if how == "semi" else "NOT EXISTS"
        sql = f"""
          SELECT o.o_orderstatus,
                 CAST(COUNT(*) AS BIGINT) AS agg_n,
                 MIN(o.o_orderkey) AS agg_min_key
          FROM orders o
          WHERE {osql} AND {exists} (
            SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey AND {csql})
          GROUP BY 1
        """
    else:
        sdf = joined.groupBy("o_orderstatus", "c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("agg_n"),
            F.count("c_custkey").cast("long").alias("agg_n_cust"),
        )
        jt = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
              "full": "FULL JOIN"}[how]
        sql = f"""
          SELECT o_orderstatus, c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS agg_n,
                 CAST(COUNT(c_custkey) AS BIGINT) AS agg_n_cust
          FROM (SELECT * FROM orders o WHERE {osql}) o
          {jt} (SELECT * FROM customer c WHERE {csql}) c
            ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_join_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed} how={how}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Window-shape fuzzing: random function × partition × order direction
# ---------------------------------------------------------------------------

_WIN_FUNCS = [
    (lambda w: F.row_number().over(w).cast("long").alias("wv"),
     "CAST(ROW_NUMBER() OVER w AS BIGINT) AS wv"),
    (lambda w: F.rank().over(w).cast("long").alias("wv"),
     "CAST(RANK() OVER w AS BIGINT) AS wv"),
    (lambda w: F.dense_rank().over(w).cast("long").alias("wv"),
     "CAST(DENSE_RANK() OVER w AS BIGINT) AS wv"),
    (lambda w: F.lag("o_orderkey").over(w).alias("wv"),
     "LAG(o_orderkey) OVER w AS wv"),
    (lambda w: F.lead("o_orderkey").over(w).alias("wv"),
     "LEAD(o_orderkey) OVER w AS wv"),
    (
        lambda w: F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("wv"),
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER "
        "(w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS wv",
    ),
]

_WIN_PARTS = [("o_orderstatus", "o_orderstatus"), ("o_orderpriority", "o_orderpriority")]


@pytest.mark.parametrize("seed", range(15))
def test_random_window_matches_duckdb(spark, sf_dir, duck, seed):
    from pyspark.sql import Window as W

    rng = random.Random(2000 + seed)
    fn, fsql = rng.choice(_WIN_FUNCS)
    part, psql = rng.choice(_WIN_PARTS)
    desc = rng.random() < 0.5
    frame_in_sql = "ROWS BETWEEN" in fsql

    order = F.col("o_orderkey").desc() if desc else F.col("o_orderkey")
    w = W.partitionBy(part).orderBy(order)
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    sdf = o.select("o_orderkey", part, fn(w))

    dir_sql = "DESC" if desc else "ASC"
    # the running-sum variant embeds its frame; WINDOW w must then be
    # frameless in the SQL too
    sql = f"""
      SELECT o_orderkey, {psql}, {fsql}
      FROM orders
      WHERE o_orderkey % 11 = 0
      WINDOW w AS (PARTITION BY {psql} ORDER BY o_orderkey {dir_sql})
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_window_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Scalar-expression fuzzing: random string/math/conditional projections
# ---------------------------------------------------------------------------

_SCALARS = [
    (lambda: F.upper(F.col("o_orderpriority")).alias("sv"),
     "upper(o_orderpriority) AS sv"),
    (lambda: F.lower(F.col("o_orderstatus")).alias("sv"),
     "lower(o_orderstatus) AS sv"),
    (lambda: F.substring(F.col("o_orderpriority"), 3, 4).alias("sv"),
     "substr(o_orderpriority, 3, 4) AS sv"),
    (lambda: F.length(F.col("o_orderpriority")).cast("long").alias("sv"),
     "CAST(length(o_orderpriority) AS BIGINT) AS sv"),
    (lambda: F.concat_ws("-", F.col("o_orderstatus"),
                         (F.col("o_orderkey") % 10).cast("string")).alias("sv"),
     "concat_ws('-', o_orderstatus, CAST(o_orderkey % 10 AS VARCHAR)) AS sv"),
    (lambda: F.abs(F.col("o_orderkey") % 13 - 6).cast("long").alias("sv"),
     "CAST(abs(o_orderkey % 13 - 6) AS BIGINT) AS sv"),
    (lambda: F.when(F.col("o_orderkey") % 2 == 0, F.lit("even"))
              .otherwise(F.lit("odd")).alias("sv"),
     "CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END AS sv"),
    (lambda: F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")),
                        F.lit("PENDING")).alias("sv"),
     "coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS sv"),
    (lambda: F.greatest(F.col("o_orderkey") % 7, F.col("o_custkey") % 7)
              .cast("long").alias("sv"),
     "CAST(greatest(o_orderkey % 7, o_custkey % 7) AS BIGINT) AS sv"),
    (lambda: F.lpad((F.col("o_orderkey") % 100).cast("string"), 4, "0").alias("sv"),
     "lpad(CAST(o_orderkey % 100 AS VARCHAR), 4, '0') AS sv"),
]


@pytest.mark.parametrize("seed", range(15))
def test_random_scalar_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(3000 + seed)
    picks = rng.sample(_SCALARS, 3)
    mod = rng.choice([7, 11, 13])

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % mod == 0)
    cols = [fn().alias(f"sv{i}") for i, (fn, _) in enumerate(picks)]
    sdf = o.select("o_orderkey", *cols)
    sel = ", ".join(
        s.replace(" AS sv", f" AS sv{i}") for i, (_, s) in enumerate(picks)
    )
    sql = f"SELECT o_orderkey, {sel} FROM orders WHERE o_orderkey % {mod} = 0"
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_scalar_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Set-op fuzzing: union/intersect/except × distinct/all × leg predicates
# ---------------------------------------------------------------------------

_SETOPS = [
    ("union_all", "UNION ALL"),
    ("union", "UNION"),
    ("intersect", "INTERSECT"),
    ("intersect_all", "INTERSECT ALL"),
    ("except", "EXCEPT"),
    ("except_all", "EXCEPT ALL"),
]


@pytest.mark.parametrize("seed", range(12))
def test_random_setop_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(4000 + seed)
    op, opsql = rng.choice(_SETOPS)
    ma, mb = rng.sample([2, 3, 4, 5], 2)

    o = table(spark, sf_dir, "orders")
    proj = ["o_orderstatus", "o_orderpriority"]
    a = o.filter(F.col("o_orderkey") % ma == 0).select(*proj)
    b = o.filter(F.col("o_orderkey") % mb == 0).select(*proj)
    sdf = {
        "union_all": lambda: a.unionAll(b),
        "union": lambda: a.union(b).distinct(),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[op]()

    sql = f"""
      SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % {ma} = 0
      {opsql}
      SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % {mb} = 0
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_setop_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed} op={op}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# HAVING fuzzing: post-aggregation predicates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(10))
def test_random_having_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(5000 + seed)
    mod = rng.choice([2, 3])
    thresh = rng.choice([10, 50, 200])
    key = rng.choice(["o_orderstatus", "o_orderpriority"])

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % mod == 0)
    sdf = (
        o.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("agg_n"),
            F.min("o_orderkey").alias("agg_min_key"),
        )
        .filter(F.col("agg_n") > thresh)
    )
    sql = f"""
      SELECT {key},
             CAST(COUNT(*) AS BIGINT) AS agg_n,
             MIN(o_orderkey) AS agg_min_key
      FROM orders
      WHERE o_orderkey % {mod} = 0
      GROUP BY {key}
      HAVING COUNT(*) > {thresh}
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_having_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Date/time fuzzing over NTZ event timestamps — the classic cross-engine
# divergence zone (weekday numbering, week-of-year, truncation, formats)
# ---------------------------------------------------------------------------

# (spark_sql_expr, duckdb_sql_expr) — pre-verified atom pairs, including
# the divergent-numbering pins: Spark weekday (0=Mon) + 1 == DuckDB
# isodow (1=Mon); Spark weekofyear (ISO) == DuckDB week.
_DT_ATOMS = [
    ("CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(minute(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(minute(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(quarter(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(quarter(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(weekday(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT)",
     "CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("date_format(CAST(ts AS TIMESTAMP), 'yyyy-MM-dd HH:mm')",
     "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M')"),
    ("unix_micros(date_trunc('hour', CAST(ts AS TIMESTAMP)))",
     "epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))"),
    ("CAST(weekofyear(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(week(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
    ("CAST(dayofyear(CAST(ts AS TIMESTAMP)) AS BIGINT)",
     "CAST(dayofyear(CAST(ts AS TIMESTAMP)) AS BIGINT)"),
]


@pytest.mark.parametrize("seed", range(10))
def test_random_datetime_matches_duckdb(spark, sf_dir, duck, seed):
    from dmi_ingestor_spark.catalog import register_temp_views

    register_temp_views(spark, sf_dir)
    rng = random.Random(6000 + seed)
    picks = rng.sample(_DT_ATOMS, 3)
    mod = rng.choice([3, 5, 7])

    ssel = ", ".join(f"{s} AS dt{i}" for i, (s, _) in enumerate(picks))
    dsel = ", ".join(f"{d} AS dt{i}" for i, (_, d) in enumerate(picks))
    sdf = spark.sql(
        f"SELECT event_id, {ssel} FROM events WHERE event_id % {mod} = 0"
    )
    ddf = duck.execute(
        f"SELECT event_id, {dsel} FROM events WHERE event_id % {mod} = 0"
    ).fetchdf()
    problems = compare(
        f"fuzz_dt_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}"


# ---------------------------------------------------------------------------
# Rollup/cube fuzzing: random subtotal shapes × per-key GROUPING() flags
# ---------------------------------------------------------------------------

_RC_KEYS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("derived_bucket", "derived_bucket"),
]


@pytest.mark.parametrize("seed", range(15))
def test_random_rollup_cube_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(8000 + seed)
    preds = rng.sample(_PREDICATES, rng.randint(1, 2))
    conj = rng.choice([" AND ", " OR "])
    keys = rng.sample(_RC_KEYS, rng.randint(1, 2))
    aggs = rng.sample(_AGGS, rng.randint(1, 2))
    mode = rng.choice(["rollup", "cube"])

    o = table(spark, sf_dir, "orders").withColumn(
        "derived_bucket", (F.col("o_orderkey") % 5).cast("long")
    )
    cond = preds[0][0]()
    for p, _ in preds[1:]:
        cond = (cond & p()) if conj == " AND " else (cond | p())
    filtered = o.filter(cond)
    key_names = [k for k, _ in keys]
    grouped = (
        filtered.rollup(*key_names)
        if mode == "rollup"
        else filtered.cube(*key_names)
    )
    # per-key GROUPING() flags disambiguate real NULL keys from subtotal
    # rows — single-column grouping() semantics are identical across
    # engines (bit-order of GROUPING_ID is not, so it stays out)
    gcols = [
        F.grouping(k).cast("long").alias(f"g_{i}")
        for i, k in enumerate(key_names)
    ]
    sdf = grouped.agg(*gcols, *[a() for a, _ in aggs])

    where = conj.join(s for _, s in preds)
    select_keys = ", ".join(s for _, s in keys)
    select_g = ", ".join(
        f"CAST(GROUPING({s}) AS BIGINT) AS g_{i}"
        for i, (_, s) in enumerate(keys)
    )
    select_aggs = ", ".join(s for _, s in aggs)
    sql = f"""
      WITH o AS (
        SELECT *, CAST(o_orderkey % 5 AS BIGINT) AS derived_bucket FROM orders
      )
      SELECT {select_keys}, {select_g}, {select_aggs}
      FROM o WHERE {where}
      GROUP BY {mode.upper()}({select_keys})
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_rc_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Generator fuzzing: random explode shapes over documents
# ---------------------------------------------------------------------------

_TOK_PRED = [
    (lambda: F.length("tok") >= 4, "LENGTH(tok) >= 4"),
    (lambda: F.col("tok").startswith("a"), "tok LIKE 'a%'"),
    (lambda: F.col("tok") > "m", "tok > 'm'"),
]

_TOK_AGGS = [
    (
        lambda: F.count(F.lit(1)).cast("long").alias("agg_n"),
        "CAST(COUNT(*) AS BIGINT) AS agg_n",
    ),
    (
        lambda: F.count_distinct(F.col("tok")).cast("long").alias("agg_nd"),
        "CAST(COUNT(DISTINCT tok) AS BIGINT) AS agg_nd",
    ),
    (lambda: F.min("tok").alias("agg_min_tok"), "MIN(tok) AS agg_min_tok"),
    (
        lambda: F.sum(F.length("tok")).cast("long").alias("agg_len"),
        "CAST(SUM(LENGTH(tok)) AS BIGINT) AS agg_len",
    ),
]


@pytest.mark.parametrize("seed", range(12))
def test_random_explode_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(9000 + seed)
    pred = rng.choice(_TOK_PRED)
    aggs = rng.sample(_TOK_AGGS, rng.randint(1, 2))
    with_pos = rng.random() < 0.5
    group_lang = rng.random() < 0.5

    d = table(spark, sf_dir, "documents")
    if with_pos:
        toks = d.select(
            "doc_id",
            "lang",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        ).withColumn("pos", (F.col("pos0") + 1).cast("long"))
        # ordinal-weighted checksum pins the generator's element ORDER,
        # not just the multiset of tokens
        aggs = aggs + [
            (
                lambda: F.sum(F.col("pos") * F.length("tok"))
                .cast("long")
                .alias("agg_posw"),
                "CAST(SUM(pos * LENGTH(tok)) AS BIGINT) AS agg_posw",
            )
        ]
    else:
        toks = d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
        )
    filtered = toks.filter(pred[0]())
    if group_lang:
        sdf = filtered.groupBy("lang").agg(*[a() for a, _ in aggs])
    else:
        sdf = filtered.agg(*[a() for a, _ in aggs])

    src = (
        """
        SELECT doc_id, lang, t[i] AS tok, CAST(i AS BIGINT) AS pos
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
              FROM documents),
             UNNEST(generate_series(1, len(t))) AS u(i)
        """
        if with_pos
        else """
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
        """
    )
    select_aggs = ", ".join(s for _, s in aggs)
    group = "GROUP BY lang" if group_lang else ""
    select = f"lang, {select_aggs}" if group_lang else select_aggs
    sql = f"WITH t AS ({src}) SELECT {select} FROM t WHERE {pred[1]} {group}"
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_gen_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Dimension 9: array higher-order functions (transform/filter/aggregate)
# ---------------------------------------------------------------------------

# (spark_col_builder(L, M), sql_template(L, M)) — L/M randomized per seed
_HOF_ATOMS = [
    (
        lambda L, M: F.size(F.split("text", " ")).cast("long").alias("h_size"),
        lambda L, M: "CAST(len(string_split(text, ' ')) AS BIGINT) AS h_size",
    ),
    (
        lambda L, M: F.size(
            F.filter(F.split("text", " "), lambda x: F.length(x) > L)
        )
        .cast("long")
        .alias("h_nlong"),
        lambda L, M: (
            f"CAST(len(list_filter(string_split(text, ' '), "
            f"x -> length(x) > {L})) AS BIGINT) AS h_nlong"
        ),
    ),
    (
        lambda L, M: (
            F.aggregate(
                F.transform(F.split("text", " "), lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            % M
        ).alias("h_summod"),
        lambda L, M: (
            f"CAST(list_aggregate(list_transform(string_split(text, ' '), "
            f"x -> CAST(length(x) AS BIGINT)), 'sum') % {M} AS BIGINT) AS h_summod"
        ),
    ),
    (
        lambda L, M: F.element_at(
            F.array_sort(F.split("text", " ")), 1
        ).alias("h_first"),
        lambda L, M: "list_sort(string_split(text, ' '))[1] AS h_first",
    ),
    (
        lambda L, M: F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("h_ndist"),
        lambda L, M: (
            "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)"
            " AS h_ndist"
        ),
    ),
    (
        lambda L, M: F.concat_ws(
            "-", F.slice(F.array_sort(F.split("text", " ")), 1, 3)
        ).alias("h_top3"),
        lambda L, M: (
            "array_to_string(list_slice(list_sort(string_split(text, ' ')),"
            " 1, 3), '-') AS h_top3"
        ),
    ),
]

_HOF_PREDS = [
    (lambda: F.col("doc_id") % 3 == 0, "doc_id % 3 = 0"),
    (lambda: F.col("n_chars") > 300, "n_chars > 300"),
    (lambda: F.col("lang") != "zh", "lang <> 'zh'"),
]


@pytest.mark.parametrize("seed", range(12))
def test_random_hof_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(11000 + seed)
    L = rng.randint(2, 6)
    M = rng.choice([97, 101, 1009])
    atoms = rng.sample(_HOF_ATOMS, rng.randint(2, 4))
    pred = rng.choice(_HOF_PREDS)

    d = table(spark, sf_dir, "documents").filter(pred[0]())
    sdf = d.select("doc_id", *[a(L, M) for a, _ in atoms])

    cols = ", ".join(s(L, M) for _, s in atoms)
    sql = f"SELECT doc_id, {cols} FROM documents WHERE {pred[1]}"
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_hof_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# FILTER-clause conditional-aggregate fuzzing: every aggregate carries its
# own predicate — the shape reporting queries abuse hardest
# ---------------------------------------------------------------------------

_COND_AGGS = [
    (
        lambda p: F.sum(F.when(p, 1).otherwise(0)).cast("long"),
        lambda s: f"CAST(COUNT(*) FILTER (WHERE {s}) AS BIGINT)",
    ),
    (
        lambda p: F.sum(
            F.when(p, F.round(F.col("o_totalprice") * 100).cast("long")).otherwise(0)
        ).cast("long"),
        lambda s: (
            "CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            f"FILTER (WHERE {s}), 0) AS BIGINT)"
        ),
    ),
    (
        lambda p: F.max(F.when(p, F.col("o_orderkey"))),
        lambda s: f"MAX(o_orderkey) FILTER (WHERE {s})",
    ),
    (
        lambda p: F.min(F.when(p, F.col("o_custkey"))),
        lambda s: f"MIN(o_custkey) FILTER (WHERE {s})",
    ),
]


@pytest.mark.parametrize("seed", range(10))
def test_random_filter_agg_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(11000 + seed)
    gkey, gsql = rng.choice(
        [("o_orderstatus", "o_orderstatus"), ("o_orderpriority", "o_orderpriority")]
    )
    picks = rng.sample(list(range(len(_COND_AGGS))), 3)
    preds = [rng.choice(_PREDICATES) for _ in picks]

    o = table(spark, sf_dir, "orders")
    cols = [
        _COND_AGGS[a][0](preds[i][0]()).alias(f"fa{i}")
        for i, a in enumerate(picks)
    ]
    sdf = o.groupBy(gkey).agg(*cols).orderBy(gkey)
    sels = ", ".join(
        f"{_COND_AGGS[a][1](preds[i][1])} AS fa{i}" for i, a in enumerate(picks)
    )
    sql = f"SELECT {gsql}, {sels} FROM orders GROUP BY {gsql} ORDER BY {gsql}"
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_filter_agg_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Top-n-per-group fuzzing: window rank + filter vs DuckDB QUALIFY
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(10))
def test_random_topn_per_group_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(12000 + seed)
    pkey = rng.choice(["o_orderstatus", "o_orderpriority"])
    okey, odir = rng.choice(
        [
            ("o_totalprice", "DESC"),
            ("o_totalprice", "ASC"),
            ("o_orderdate", "DESC"),
            ("o_orderdate", "ASC"),
        ]
    )
    k = rng.choice([1, 3, 5])
    fn_name = rng.choice(["row_number", "rank", "dense_rank"])
    pred = rng.choice(_PREDICATES)

    ocol = F.col(okey).desc() if odir == "DESC" else F.col(okey).asc()
    w = Window.partitionBy(pkey).orderBy(ocol, F.col("o_orderkey").asc())
    fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
    }[fn_name]
    o = table(spark, sf_dir, "orders").filter(pred[0]())
    sdf = (
        o.select(
            pkey,
            "o_orderkey",
            fn().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= k)
        .orderBy(pkey, "rk", "o_orderkey")
    )
    sql = f"""
        SELECT {pkey}, o_orderkey,
               CAST({fn_name}() OVER (
                 PARTITION BY {pkey}
                 ORDER BY {okey} {odir}, o_orderkey ASC
               ) AS BIGINT) AS rk
        FROM orders WHERE {pred[1]}
        QUALIFY rk <= {k}
        ORDER BY {pkey}, rk, o_orderkey
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_topn_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Dimension 12: random nested integer expression trees (three-valued logic)
# ---------------------------------------------------------------------------
#
# Random CASE/NULLIF/COALESCE/LEAST/GREATEST/arith trees evaluated per
# row — the same ANSI text runs through Spark's F.expr AND DuckDB, so
# any divergence in NULL propagation, CASE typing, or operator
# precedence between the engines (or a regression in either) surfaces
# as a value mismatch. NULLIF injects NULLs mid-tree to probe
# three-valued logic; multiplication only by small literals keeps every
# intermediate far from int64 overflow.

_EXPR_LEAVES = [
    "o_orderkey",
    "o_custkey",
    "CAST(month(o_orderdate) AS BIGINT)",
    "CAST(5 AS BIGINT)",
    "CAST(42 AS BIGINT)",
]


def _gen_expr(rng: random.Random, depth: int) -> str:
    if depth == 0 or rng.random() < 0.25:
        return rng.choice(_EXPR_LEAVES)
    op = rng.choice(
        ["add", "sub", "mul_lit", "case", "nullif", "coalesce",
         "least", "greatest", "abs", "mod_lit"]
    )
    a = _gen_expr(rng, depth - 1)
    if op == "add":
        return f"({a} + {_gen_expr(rng, depth - 1)})"
    if op == "sub":
        return f"({a} - {_gen_expr(rng, depth - 1)})"
    if op == "mul_lit":
        return f"({a} * {rng.choice([2, 3, 7])})"
    if op == "case":
        b = _gen_expr(rng, depth - 1)
        return (
            f"(CASE WHEN {a} % {rng.choice([3, 5])} = "
            f"{rng.choice([0, 1])} THEN {b} ELSE {a} END)"
        )
    if op == "nullif":
        return f"NULLIF({a}, {a} - ({a} % {rng.choice([2, 4])}))"
    if op == "coalesce":
        return f"COALESCE(NULLIF({a}, {a}), {_gen_expr(rng, depth - 1)})"
    if op == "least":
        return f"LEAST({a}, {_gen_expr(rng, depth - 1)})"
    if op == "greatest":
        return f"GREATEST({a}, {_gen_expr(rng, depth - 1)})"
    if op == "abs":
        return f"ABS({a} - {rng.choice([100, 1000])})"
    return f"({a} % {rng.choice([7, 11, 13])})"


@pytest.mark.parametrize("seed", range(25))
def test_random_expression_tree_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(7000 + seed)
    exprs = [
        f"CAST({_gen_expr(rng, rng.randint(2, 4))} AS BIGINT) AS e{i}"
        for i in range(rng.randint(1, 3))
    ]
    select = ", ".join(exprs)
    sql = (
        f"SELECT o_orderkey, {select} FROM orders "
        f"WHERE o_orderkey % 5 = {seed % 5} ORDER BY o_orderkey"
    )
    o = table(spark, sf_dir, "orders")
    cols = [
        F.expr(e.rsplit(" AS ", 1)[0]).alias(e.rsplit(" AS ", 1)[1])
        for e in exprs
    ]
    sdf = (
        o.filter(F.col("o_orderkey") % 5 == seed % 5)
        .select("o_orderkey", *cols)
        .orderBy("o_orderkey")
    )
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_expr_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Null-ordering × frame fuzzing (dimension 14, r7): windows over a
# NULLABLE order key with EXPLICIT NULLS FIRST/LAST and a random frame
# kind. This is a real divergence class: Spark's default null placement
# (NULLS FIRST for ASC) differs from DuckDB's (NULLS LAST), so any
# window the engine emits without an explicit placement is a latent
# parity bug — this dimension sweeps the explicit combinations.
# ---------------------------------------------------------------------------

_NULLKEY_SPARK = lambda: F.nullif(F.col("o_custkey") % 5, F.lit(2)).cast("long")  # noqa: E731
_NULLKEY_SQL = "CAST(nullif(o_custkey % 5, 2) AS BIGINT)"

_NW_FUNCS = [
    # rank/dense_rank: tie-stable, frame-free
    (lambda w: F.rank().over(w).cast("long").alias("wv"), "RANK", None),
    (
        lambda w: F.dense_rank().over(w).cast("long").alias("wv"),
        "DENSE_RANK",
        None,
    ),
    # count over a RANGE value frame: null rows form one peer group,
    # the frame spans [key-1, key+1] in VALUE space
    (
        lambda w: F.count(F.lit(1)).over(w.rangeBetween(-1, 1)).cast("long").alias("wv"),
        "COUNT_RANGE",
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    ),
    # sum over a bounded ROWS frame
    (
        lambda w: F.sum((F.col("o_orderkey") % 100).cast("long"))
        .over(w.rowsBetween(-2, 0))
        .cast("long")
        .alias("wv"),
        "SUM_ROWS",
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    ),
]


@pytest.mark.parametrize("seed", range(15))
def test_random_null_ordering_window_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(14_000 + seed)
    fn, fname, frame = rng.choice(_NW_FUNCS)
    desc = rng.random() < 0.5
    nulls_first = rng.random() < 0.5

    okey = _NULLKEY_SPARK()
    if desc:
        order = okey.desc_nulls_first() if nulls_first else okey.desc_nulls_last()
    else:
        order = okey.asc_nulls_first() if nulls_first else okey.asc_nulls_last()
    # ROWS frames and rank ties need a deterministic total order:
    # o_orderkey is unique, appended as the tiebreak on BOTH engines —
    # EXCEPT for the RANGE value frame, which both engines restrict to
    # exactly one (numeric) order key (Spark: RANGE_FRAME_MULTI_ORDER).
    if fname == "COUNT_RANGE":
        w = Window.partitionBy("o_orderstatus").orderBy(order)
    else:
        w = Window.partitionBy("o_orderstatus").orderBy(
            order, F.col("o_orderkey")
        )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    sdf = o.select(
        "o_orderkey",
        "o_orderstatus",
        okey.alias("okey"),
        fn(w),
    )

    dir_sql = "DESC" if desc else "ASC"
    nf_sql = "NULLS FIRST" if nulls_first else "NULLS LAST"
    over = (
        f"PARTITION BY o_orderstatus "
        f"ORDER BY {_NULLKEY_SQL} {dir_sql} {nf_sql}, o_orderkey"
    )
    if fname == "RANK":
        expr = f"CAST(RANK() OVER ({over}) AS BIGINT)"
    elif fname == "DENSE_RANK":
        expr = f"CAST(DENSE_RANK() OVER ({over}) AS BIGINT)"
    elif fname == "COUNT_RANGE":
        # a RANGE frame requires exactly ONE order key: drop the tiebreak
        over1 = (
            f"PARTITION BY o_orderstatus "
            f"ORDER BY {_NULLKEY_SQL} {dir_sql} {nf_sql}"
        )
        expr = f"CAST(COUNT(*) OVER ({over1} {frame}) AS BIGINT)"
    else:
        expr = (
            f"CAST(SUM(CAST(o_orderkey % 100 AS BIGINT)) "
            f"OVER ({over} {frame}) AS BIGINT)"
        )
    sql = f"""
      SELECT o_orderkey, o_orderstatus, {_NULLKEY_SQL} AS okey, {expr} AS wv
      FROM orders
      WHERE o_orderkey % 11 = 0
    """
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_nullwin_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed} fn={fname}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# String-function chain fuzzing (dimension 15, r7): random pipelines of
# 2-4 string transforms over `documents.text` / `customer.c_name` /
# `part.p_name`, closed by a measuring terminal. This is a known
# divergence class across engines: 1-based substring indexing, the
# not-found sentinel of instr/strpos, lpad/rpad truncation when the
# input is already longer, out-of-range split_part, and levenshtein
# tie behavior. All atoms below are chosen (and where needed, SQL-
# translated) so Spark and DuckDB define identical semantics; the
# fuzzer sweeps their compositions, which is where implicit-cast and
# null-propagation bugs hide. ASCII-only inputs keep collation out.
# ---------------------------------------------------------------------------

_STR_BASES = [
    ("documents", "doc_id", "text", 7),
    ("customer", "c_custkey", "c_name", 23),
    ("part", "p_partkey", "p_name", 31),
]

# (spark_transform, sql_template) — each maps string -> string
_STR_TRANSFORMS = [
    (lambda c: F.upper(c), "upper({0})"),
    (lambda c: F.lower(c), "lower({0})"),
    (lambda c: F.reverse(c), "reverse({0})"),
    (lambda c: F.translate(c, "aeiou", "AEIOU"), "translate({0}, 'aeiou', 'AEIOU')"),
    (lambda c: F.lpad(c, 24, "*"), "lpad({0}, 24, '*')"),
    (lambda c: F.rpad(c, 24, "#"), "rpad({0}, 24, '#')"),
    (lambda c: F.substring(c, 3, 15), "substring({0}, 3, 15)"),
    (lambda c: F.left(c, F.lit(12)), "left({0}, 12)"),
    (lambda c: F.right(c, F.lit(12)), "right({0}, 12)"),
    (lambda c: F.repeat(c, 2), "repeat({0}, 2)"),
    (lambda c: F.concat(F.lit("<"), c, F.lit(">")), "concat('<', {0}, '>')"),
    (
        lambda c: F.split_part(c, F.lit(" "), F.lit(2)),
        "split_part({0}, ' ', 2)",
    ),
    (lambda c: F.btrim(c, F.lit("*#")), "trim({0}, '*#')"),
]

# (spark_terminal, sql_template) — each maps string -> measured value
_STR_TERMINALS = [
    (lambda c: F.length(c).cast("long").alias("mv"), "CAST(length({0}) AS BIGINT)"),
    (lambda c: F.md5(c).alias("mv"), "md5({0})"),
    (
        lambda c: F.instr(c, "ar").cast("long").alias("mv"),
        "CAST(instr({0}, 'ar') AS BIGINT)",
    ),
    (
        lambda c: F.levenshtein(F.left(c, F.lit(16)), F.lit("spark table")).cast("long").alias("mv"),
        "CAST(levenshtein(left({0}, 16), 'spark table') AS BIGINT)",
    ),
    (lambda c: c.alias("mv"), "{0}"),
    (
        lambda c: F.ascii(F.md5(c)).cast("long").alias("mv"),
        "CAST(ascii(md5({0})) AS BIGINT)",
    ),
]


@pytest.mark.parametrize("seed", range(20))
def test_random_string_chain_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(15_000 + seed)
    tbl, keycol, strcol, mod = rng.choice(_STR_BASES)
    chain = [rng.choice(_STR_TRANSFORMS) for _ in range(rng.randint(2, 4))]
    term_fn, term_sql = rng.choice(_STR_TERMINALS)

    col = F.col(strcol)
    sql_expr = strcol
    for fn, tmpl in chain:
        col = fn(col)
        sql_expr = tmpl.format(sql_expr)

    sdf = (
        table(spark, sf_dir, tbl)
        .filter(F.col(keycol) % mod == 0)
        .select(F.col(keycol).alias("k"), term_fn(col))
    )
    sql = (
        f"SELECT {keycol} AS k, {term_sql.format(sql_expr)} AS mv "
        f"FROM {tbl} WHERE {keycol} % {mod} = 0"
    )
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_strchain_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Decimal-arithmetic fuzzing (dimension 16, r7): random +/-/* trees over
# DECIMAL-cast integer-derived operands, aggregated and cast to DOUBLE.
# The divergence class: Spark and DuckDB widen decimal precision/scale
# differently (Spark mult (12,2)x(12,2)->(25,4), DuckDB ->(18,4); SUM
# ->(38,s) on both), so any engine expression that leans on implicit
# result types can silently round. Operands are bounded (<1000.00) so
# every intermediate and every full-table SUM is exactly representable
# in DOUBLE -- the final CAST TO DOUBLE is lossless on both engines and
# the comparison stays bit-exact. Division is deliberately excluded:
# DuckDB types decimal/decimal as DOUBLE, so there is no shared exact
# semantics to pin.
# ---------------------------------------------------------------------------

_DEC_ATOMS = [
    (
        lambda: (F.col("o_orderkey") % 997).cast("decimal(12,2)"),
        "CAST(o_orderkey % 997 AS DECIMAL(12,2))",
    ),
    (
        lambda: (F.col("o_custkey") % 101).cast("decimal(8,2)"),
        "CAST(o_custkey % 101 AS DECIMAL(8,2))",
    ),
    (
        lambda: F.lit("7.31").cast("decimal(4,2)"),
        "CAST('7.31' AS DECIMAL(4,2))",
    ),
    (
        lambda: (F.col("o_orderkey") % 89 / F.lit(100)).cast("decimal(6,2)"),
        "CAST((o_orderkey % 89) / 100 AS DECIMAL(6,2))",
    ),
]

_DEC_OPS = [
    (lambda a, b: a + b, "({0} + {1})"),
    (lambda a, b: a - b, "({0} - {1})"),
    (lambda a, b: a * b, "({0} * {1})"),
]


@pytest.mark.parametrize("seed", range(15))
def test_random_decimal_tree_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(16_000 + seed)

    def tree(depth):
        if depth == 0 or rng.random() < 0.3:
            fn, sql = rng.choice(_DEC_ATOMS)
            return fn(), sql
        op, opsql = rng.choice(_DEC_OPS)
        (la, lsql), (ra, rsql) = tree(depth - 1), tree(depth - 1)
        return op(la, ra), opsql.format(lsql, rsql)

    expr, esql = tree(rng.randint(1, 3))
    key = rng.choice(["o_orderstatus", "o_orderpriority"])
    agg, asql = rng.choice(
        [
            (lambda c: F.sum(c), "SUM"),
            (lambda c: F.min(c), "MIN"),
            (lambda c: F.max(c), "MAX"),
        ]
    )
    o = table(spark, sf_dir, "orders")
    sdf = o.groupBy(key).agg(agg(expr).cast("double").alias("dv"))
    sql = (
        f"SELECT {key}, CAST({asql}({esql}) AS DOUBLE) AS dv "
        f"FROM orders GROUP BY {key}"
    )
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_dectree_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed}: {problems}\nSQL: {sql}"


# ---------------------------------------------------------------------------
# Subquery-predicate fuzzing (dimension 17, r7): IN / NOT IN / EXISTS /
# NOT EXISTS / scalar-subquery predicates with a NULLABLE key on either
# side, run through spark.sql (the S9 SQL front end) and DuckDB. The
# divergence class is three-valued logic: `x NOT IN (subquery)` is
# UNKNOWN — not TRUE — when the subquery yields any NULL, and engines
# historically differ in the null-aware anti-join rewrite. Keys are
# made nullable with nullif() on a deterministic residue so every seed
# actually exercises the NULL path.
# ---------------------------------------------------------------------------

_SUBQ_OUTER_KEY = [
    ("o_custkey", "o_custkey"),
    ("nullif(o_custkey % 700, 13)", "nullif(o_custkey % 700, 13)"),
]
_SUBQ_INNER_KEY = [
    ("c_custkey", "c_custkey"),
    ("nullif(c_custkey, 42)", "nullif(c_custkey, 42)"),
    ("nullif(c_custkey % 900, 7)", "nullif(c_custkey % 900, 7)"),
]
_SUBQ_INNER_PRED = [
    "c_acctbal > 0.0",
    "c_mktsegment = 'BUILDING'",
    "c_custkey % 3 = 0",
]


@pytest.mark.parametrize("seed", range(15))
def test_random_subquery_predicate_matches_duckdb(spark, sf_dir, duck, seed):
    rng = random.Random(17_000 + seed)
    form = rng.choice(["IN", "NOT IN", "EXISTS", "NOT EXISTS", "SCALAR"])
    okey, _ = rng.choice(_SUBQ_OUTER_KEY)
    ikey, _ = rng.choice(_SUBQ_INNER_KEY)
    ipred = rng.choice(_SUBQ_INNER_PRED)

    if form in ("IN", "NOT IN"):
        where = f"{okey} {form} (SELECT {ikey} FROM customer WHERE {ipred})"
    elif form in ("EXISTS", "NOT EXISTS"):
        where = (
            f"{form} (SELECT 1 FROM customer"
            f" WHERE {ikey} = {okey} AND {ipred})"
        )
    else:
        # scalar subquery: compare against a grand aggregate
        where = (
            f"{okey} < (SELECT CAST(COUNT(*) AS BIGINT) / 2 FROM customer"
            f" WHERE {ipred})"
        )
    sql = (
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        "MIN(o_orderkey) AS min_key "
        f"FROM orders WHERE {where} GROUP BY o_orderstatus"
    )
    for t in ("orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    sdf = spark.sql(sql)
    ddf = duck.execute(sql).fetchdf()
    problems = compare(
        f"fuzz_subq_{seed}", normalize(sdf.toPandas()), normalize(ddf)
    )
    assert not problems, f"seed {seed} form={form}: {problems}\nSQL: {sql}"
