"""Scalar function pack F1-F8 (SURVEY.md §2.8).

F1 is the reference's one nontrivial scalar — the timestamp →
``yyyymmddTHHMMSS`` string surgery at ``dmi_ingestor/ingestor.py:104``
(split on '.', strip '-'/':'), replaced by a single ``date_format``.
F2-F4 are its URL/path helpers (``ingestor.py:105-118,175-191``); F8 is
the [ext] string/date/math/array/JSON pack over the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register


@register(
    "scalar_time_format",
    oracle="""
    SELECT
      event_id,
      strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') AS time_str,
      CAST(year(ts) AS BIGINT) AS y,
      CAST(month(ts) AS BIGINT) AS m,
      CAST(day(ts) AS BIGINT) AS d,
      CAST(hour(ts) AS BIGINT) AS h,
      epoch_us(CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS hour_bucket_us
    FROM events
    """,
    doc=(
        "F1: the reference's yyyymmddTHHMMSS key (ingestor.py:104) as one "
        "date_format, plus the date-extract pack. Integer extracts cast "
        "to BIGINT on both sides so schemas agree."
    ),
    tags=("scalar", "reference"),
)
def scalar_time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyyMMdd'T'HHmmss").alias("time_str"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.unix_micros(F.date_trunc("hour", F.col("ts")).cast("timestamp")).alias(
            "hour_bucket_us"
        ),
    )


@register(
    "scalar_url_build_parse",
    oracle="""
    SELECT
      event_type AS collection,
      strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') AS time_str,
      'https://bucket.example/base/' || event_type || '/'
        || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.tif' AS url,
      regexp_replace(
        'https://bucket.example/base/' || event_type || '/'
          || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.tif',
        '^https://', '') AS url_no_scheme,
      string_split(
        'base/' || event_type || '/'
          || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S') || '.tif', '/'
      )[-1] AS basename
    FROM events
    WHERE event_id < 200
    """,
    doc=(
        "F2-F4: URL build (ingestor.py:175-191), https-prefix strip "
        "(:117 removeprefix), and path basename (:105,111) — concat / "
        "regexp_replace / split+element_at."
    ),
    tags=("scalar", "reference"),
)
def scalar_url_build_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    tstr = F.date_format("ts", "yyyyMMdd'T'HHmmss")
    url = F.concat(F.lit("https://bucket.example/base/"), F.col("event_type"), F.lit("/"), tstr, F.lit(".tif"))
    path = F.concat(F.lit("base/"), F.col("event_type"), F.lit("/"), tstr, F.lit(".tif"))
    return e.select(
        F.col("event_type").alias("collection"),
        tstr.alias("time_str"),
        url.alias("url"),
        F.regexp_replace(url, "^https://", "").alias("url_no_scheme"),
        F.element_at(F.split(path, "/"), -1).alias("basename"),
    )


@register(
    "scalar_string_pack",
    oracle="""
    SELECT
      p_partkey,
      UPPER(p_name) AS name_uc,
      LOWER(p_brand) AS brand_lc,
      TRIM(p_type) AS type_trim,
      SUBSTRING(p_name, 1, 5) AS name_pre,
      CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      CASE WHEN contains(p_name, 'a') THEN 1 ELSE 0 END AS has_a,
      replace(p_brand, '#', '-') AS brand_dash,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
    doc="F8 string pack: case/trim/substring/length/regexp/contains/replace/lpad.",
    tags=("scalar",),
)
def scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.when(F.contains("p_name", F.lit("a")), 1).otherwise(0).alias("has_a"),
        F.replace("p_brand", F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "scalar_math_pack",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(l_extendedprice * 0.5, 3) AS half_price,
      CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
      CAST(floor(l_quantity / 10.0) AS BIGINT) AS qty_decile,
      CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_pct_ceil,
      CAST(power(l_quantity, 2) AS DOUBLE) AS qty_sq,
      round(ln(l_extendedprice + 1.0), 6) AS log_price,
      CAST(greatest(l_discount, l_tax) AS DOUBLE) AS max_rate,
      l_orderkey % 7 AS bucket7
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 3 = 0
    """,
    doc=(
        "F8 math pack. round() operands are exact 2-decimal-representable "
        "products (x*0.5 of cents) and ln outputs rounded at 6 digits — "
        "no half-way rounding divergence between engines."
    ),
    tags=("scalar",),
)
def scalar_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 3 == 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # scale 3: cents*0.5 has exactly 3 decimals, so this round never
        # sits on a half-way boundary where Spark/DuckDB modes differ
        F.round(F.col("l_extendedprice") * 0.5, 3).alias("half_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100.0).alias("tax_pct_ceil"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("log_price"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        (F.col("l_orderkey") % 7).alias("bucket7"),
    )


@register(
    "scalar_json_events",
    oracle="""
    SELECT
      event_id,
      event_type,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
           THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
    doc=(
        "F8 JSON: parse the events.props JSON payload "
        "(get_json_object ≡ DuckDB json_extract_string) + derived banding."
    ),
    tags=("scalar", "json", "events"),
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "scalar_conditional_pack",
    oracle="""
    SELECT
      o_orderkey,
      CASE o_orderstatus
        WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'pending'
      END AS status_word,
      COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS prio_or_default,
      CASE WHEN o_totalprice > 150000.0 THEN 'big'
           WHEN o_totalprice > 50000.0 THEN 'mid'
           ELSE 'small' END AS size_band
    FROM orders
    """,
    doc="F8 conditionals: CASE/WHEN chains, coalesce, nullif.",
    tags=("scalar",),
)
def scalar_conditional_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("default")).alias(
            "prio_or_default"
        ),
        F.when(F.col("o_totalprice") > 150000.0, "big")
        .when(F.col("o_totalprice") > 50000.0, "mid")
        .otherwise("small")
        .alias("size_band"),
    )


# --------------------------------------------------------------------------
# Map-function pack (F8): construction, concat, keys, lookup — all JVM-side.
# The oracle derives each output directly from the source columns (the map
# is built from known entries), so it checks the map ops' *values*.
# --------------------------------------------------------------------------


@register(
    "scalar_map_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(3 AS BIGINT) AS n_keys,
           'okey,priority,status' AS keys_sorted,
           o_orderstatus AS status_val,
           CAST(o_orderkey AS VARCHAR) AS okey_val
    FROM orders
    WHERE o_orderkey < 500
    """,
    doc=(
        "F8 maps: map_from_arrays + map_concat + map_keys/array_sort + "
        "element_at, asserted against column-derived expected values."
    ),
    tags=("functions", "map"),
)
def scalar_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    base = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    m = F.map_concat(
        base,
        F.create_map(F.lit("okey"), F.col("o_orderkey").cast("string")),
    )
    return o.select(
        "o_orderkey",
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, F.lit("status")).alias("status_val"),
        F.element_at(m, F.lit("okey")).alias("okey_val"),
    )


# --------------------------------------------------------------------------
# Date-arithmetic pack (F8): add/trunc/last_day/quarter/ISO weekday.
# Spark weekday() is 0=Monday; DuckDB isodow is 1=Monday — offset by 1.
# --------------------------------------------------------------------------


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS TIMESTAMP)
             AS d_plus7,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey < 2000
    """,
    doc="F8 dates: date_add/date_trunc/last_day/quarter/weekday/datediff.",
    tags=("functions", "datetime"),
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        # DATE outputs are lifted to TIMESTAMP: pandas represents Spark
        # DateType as datetime.date but DuckDB DATE as Timestamp — same
        # value, different object — so both sides emit timestamps.
        F.date_add(d.cast("date"), 7).cast("timestamp").alias("d_plus7"),
        F.date_trunc("month", d).cast("timestamp").alias("month_start"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


# --------------------------------------------------------------------------
# Edit-distance pack (F8 / U5-adjacent): fuzzy part-name matching.
# levenshtein has identical semantics in Spark and DuckDB.
# --------------------------------------------------------------------------


@register(
    "scalar_levenshtein_pairs",
    oracle="""
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 150 AND b.p_partkey < 150
      AND levenshtein(a.p_name, b.p_name) <= 4
    """,
    doc=(
        "F8 strings: levenshtein fuzzy pairs over a bounded block — the "
        "string-edit-distance leg of the near-dup ladder (block-join "
        "pattern: at scale the self-join is bounded per block, not n²)."
    ),
    tags=("functions", "strings", "dedup"),
)
def scalar_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 150).select(
        "p_partkey", "p_name"
    )
    a = p.select(F.col("p_partkey").alias("a_key"), F.col("p_name").alias("a_name"))
    b = p.select(F.col("p_partkey").alias("b_key"), F.col("p_name").alias("b_name"))
    return (
        a.join(F.broadcast(b), F.col("a_key") < F.col("b_key"))
        .withColumn("dist", F.levenshtein("a_name", "b_name").cast("long"))
        .filter(F.col("dist") <= 4)
        .select("a_key", "b_key", "dist")
    )


# --------------------------------------------------------------------------
# Variant (Spark 4 semi-structured type): parse_json → variant_get with a
# type hint. The binary variant encoding is engine-internal, so outputs
# are extracted scalars; the oracle reads the same JSON with DuckDB's
# JSON functions.
# --------------------------------------------------------------------------


@register(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
    FROM events
    WHERE event_id < 3000
    """,
    doc=(
        "F8 semi-structured: Spark 4 VariantType — parse_json(props) once, "
        "variant_get typed extractions (missing path → NULL). At scale "
        "variant beats repeated get_json_object: one parse, many reads."
    ),
    tags=("functions", "json", "variant"),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "long").alias("missing"),
    )


@register(
    "scalar_bitwise_pack",
    oracle="""
    SELECT
      o_orderpriority,
      bit_and(CAST(o_orderkey AS BIGINT)) AS and_keys,
      bit_or(CAST(o_custkey AS BIGINT)) AS or_custs,
      bit_xor(CAST(o_orderkey AS BIGINT)) AS xor_keys,
      CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_low_byte,
      CAST(SUM(CASE WHEN (o_orderkey >> 3) % 2 = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_bit3_set
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "F8 bitwise surface: bit_and/bit_or/bit_xor aggregates plus "
        "shift/mask scalars — the primitives behind bitmap indexes, "
        "bloom words (join_bloom_prefilter) and the XOR table "
        "fingerprint (integrity_table_fingerprint). All JVM-side, "
        "map-combinable."
    ),
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(F.col("o_orderkey").cast("long")).alias("and_keys"),
        F.bit_or(F.col("o_custkey").cast("long")).alias("or_custs"),
        F.bit_xor(F.col("o_orderkey").cast("long")).alias("xor_keys"),
        F.sum(F.col("o_orderkey").bitwiseAND(F.lit(255))).cast("long").alias(
            "sum_low_byte"
        ),
        F.sum(
            F.when(F.expr("(o_orderkey >> 3) % 2 = 1"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_bit3_set"),
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT
      o_orderkey,
      CASE WHEN o_orderkey % 10 = 0 THEN NULL
           ELSE o_custkey / (o_orderkey % 10) END AS safe_div,
      TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                    ELSE CAST(o_custkey AS VARCHAR) END AS BIGINT)
        AS parsed_key,
      CASE WHEN o_custkey > 0 THEN NULL
           ELSE 9223372036854775807 + o_custkey END AS overflow_add
    FROM orders
    """,
    doc=(
        "Error-safe arithmetic surface: try_divide / try_cast / "
        "try_add return NULL where strict ANSI evaluation would abort "
        "the job (divide-by-zero, bad parse, int64 overflow) — the "
        "semantics that keep a 100 TB batch from dying on one bad row. "
        "The oracle states each NULL condition explicitly (CASE / "
        "TRY_CAST), so Spark's try_* short-circuits are pinned "
        "value-by-value. Division output stays double on both sides."
    ),
    tags=("scalar", "try", "null-semantics"),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_custkey"), F.col("o_orderkey") % 10).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("not-a-number")).otherwise(
                F.col("o_custkey").cast("string")
            ),
            F.lit("999999999999"),
        )
        .cast("long")
        .alias("parsed_key"),
        F.try_add(F.lit(9223372036854775807), F.col("o_custkey")).alias(
            "overflow_add"
        ),
    )


# ---------------------------------------------------------------------------
# XML parsing (Spark 4 native from_xml)
# ---------------------------------------------------------------------------


@register(
    "scalar_xml_parse",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             concat('<order><key>', o_orderkey, '</key><prio>',
                    o_orderpriority, '</prio><price>', o_totalprice,
                    '</price></order>') AS xml
      FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT o_orderkey,
           CAST(regexp_extract(xml, '<key>(\\d+)</key>', 1) AS BIGINT)
             AS parsed_key,
           regexp_extract(xml, '<prio>([^<]*)</prio>', 1) AS parsed_prio,
           CAST(regexp_extract(xml, '<price>([^<]*)</price>', 1) AS DOUBLE)
             AS parsed_price
    FROM x
    """,
    doc=(
        "XML ingestion surface (Spark 4 native from_xml): order rows "
        "serialized to XML strings, then parsed back through a typed "
        "schema (key BIGINT, prio STRING, price DOUBLE) — the "
        "semi-structured decode path for feeds that arrive as XML "
        "rather than JSON. DuckDB has no XML type, so the oracle "
        "mirrors the extraction with anchored regexes over the "
        "identically-constructed strings; the hash match proves the "
        "parser and the regexes agree on every field including the "
        "double round-trip. from_xml is JVM-side codegen — no Python "
        "in the row path, same scaling story as from_json."
    ),
    tags=("scalar", "xml", "orders"),
)
def scalar_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 0)
    xml = F.concat(
        F.lit("<order><key>"), F.col("o_orderkey"),
        F.lit("</key><prio>"), F.col("o_orderpriority"),
        F.lit("</prio><price>"), F.col("o_totalprice"),
        F.lit("</price></order>"),
    )
    parsed = F.from_xml(xml, "key BIGINT, prio STRING, price DOUBLE")
    return o.select(
        "o_orderkey",
        parsed.getField("key").alias("parsed_key"),
        parsed.getField("prio").alias("parsed_prio"),
        parsed.getField("price").alias("parsed_price"),
    )


# ---------------------------------------------------------------------------
# Map higher-order functions (transform_values / map_filter / map_zip_with)
# ---------------------------------------------------------------------------


@register(
    "scalar_map_hof_pack",
    oracle="""
    SELECT o_orderkey,
           concat_ws(',', 2 * (o_orderkey % 5), 2 * (o_orderkey % 7),
                     2 * (o_orderkey % 13)) AS doubled_vals,
           concat_ws(',',
             CASE WHEN (o_orderkey % 5) % 2 = 1 THEN 'a' END,
             CASE WHEN (o_orderkey % 7) % 2 = 1 THEN 'b' END,
             CASE WHEN (o_orderkey % 13) % 2 = 1 THEN 'c' END) AS odd_keys,
           concat_ws(',', (o_orderkey % 5) + (o_orderkey % 11),
                     (o_orderkey % 7) + (o_orderkey % 11),
                     (o_orderkey % 13) + (o_orderkey % 11)) AS zipped_sums
    FROM orders
    WHERE o_orderkey % 6 = 0
    """,
    doc=(
        "Map higher-order functions — transform_values, map_filter, "
        "map_zip_with — completing the F8 map surface next to "
        "scalar_map_pack's constructors. Each HOF's result is emitted "
        "in key-sorted order (transform(array_sort(map_keys)) lookup) "
        "so map iteration order can never leak into the hash. DuckDB "
        "has no map lambdas, so the oracle computes the same values "
        "algebraically from the synthetic key material — proving the "
        "HOFs apply the lambda to exactly the right entries. All "
        "JVM-codegen, zero shuffle, same scale story as every scalar "
        "pack."
    ),
    tags=("scalar", "map", "hof", "orders"),
)
def scalar_map_hof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 6 == 0)
    k = F.col("o_orderkey")
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b"), F.lit("c")),
        F.array(k % 5, k % 7, k % 13),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b"), F.lit("c")),
        F.array(k % 11, k % 11, k % 11),
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    odd = F.map_filter(m, lambda _, v: v % 2 == 1)
    zipped = F.map_zip_with(m, m2, lambda _, v1, v2: v1 + v2)

    def vals_sorted(mp):
        return F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.map_keys(mp)),
                lambda key: F.element_at(mp, key).cast("string"),
            ),
        )

    return o.select(
        "o_orderkey",
        vals_sorted(doubled).alias("doubled_vals"),
        F.concat_ws(",", F.array_sort(F.map_keys(odd))).alias("odd_keys"),
        vals_sorted(zipped).alias("zipped_sums"),
    )


@register(
    "scalar_array_index_semantics",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             [o_orderstatus, o_orderpriority, CAST(o_orderkey % 3 AS VARCHAR)]
               AS arr,
             CAST(o_orderkey % 5 + 1 AS BIGINT) AS idx
      FROM orders WHERE o_orderkey % 9 = 0
    )
    SELECT o_orderkey,
           arr[CAST(idx AS INT)] AS maybe_oob,
           arr[-1] AS from_end,
           arr[2] AS second
    FROM a
    """,
    doc=(
        "Array indexing semantics pinned for ANSI mode: "
        "try_element_at(arr, i) returns NULL past the end (i in 1..5 "
        "over a 3-element array, so ~40%% of rows go out of bounds) "
        "instead of ANSI element_at's runtime error — matching "
        "DuckDB's NULL-on-OOB bracket indexing — and negative indexes "
        "count from the end in BOTH engines (arr[-1] = last). The pin "
        "matters because Spark 4 enables ANSI by default: any plan "
        "using plain element_at on data-driven indexes is one bad row "
        "away from a job abort at 100 TB; try_element_at is the "
        "total function."
    ),
    tags=("scalar", "array", "null-semantics", "orders"),
)
def scalar_array_index_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 9 == 0)
    arr = F.array(
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        (F.col("o_orderkey") % 3).cast("string"),
    )
    idx = (F.col("o_orderkey") % 5 + 1).cast("int")
    return o.select(
        "o_orderkey",
        F.try_element_at(arr, idx).alias("maybe_oob"),
        F.try_element_at(arr, F.lit(-1)).alias("from_end"),
        F.try_element_at(arr, F.lit(2)).alias("second"),
    )


# --------------------------------------------------------------------------
# Business-day arithmetic (closed form, no calendar explode)
# --------------------------------------------------------------------------

# f(n) = weekdays among epoch days [0, n): epoch day 0 = Thu 1970-01-01,
# so a week starting at day offset r contributes substr-table lookups.
# The '0122234' prefix table is the running weekday count of the
# Thu,Fri,Sat,Sun,Mon,Tue,Wed cycle.
_BD_PREFIX = "0122234"


def _sql_busday_f(n: str) -> str:
    return (
        f"(({n}) // 7 * 5 + CAST(substr('{_BD_PREFIX}', ({n}) % 7 + 1, 1) AS INT))"
    )


def _spark_busday_f(n):  # noqa: ANN001, ANN202
    return (F.floor(n / 7) * 5).cast("long") + F.substring(
        F.lit(_BD_PREFIX), (n % 7 + 1).cast("int"), 1
    ).cast("long")


@register(
    "scalar_business_days",
    oracle=f"""
    WITH d AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS n_ship,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS n_ord
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= o_orderdate
    ),
    b AS (
      SELECT l_returnflag, l_linestatus,
             {_sql_busday_f('n_ship + 1')} - {_sql_busday_f('n_ord + 1')}
               AS bus_days
      FROM d
    )
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bus_days) AS BIGINT) AS sum_bus_days,
           CAST(SUM(bus_days) * 1000 // COUNT(*) AS BIGINT) AS avg_permille
    FROM b
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "Business-day (Mon–Fri) shipping delay in CLOSED FORM: weekdays "
        "in (order, ship] computed from epoch-day integers with a "
        "7-entry prefix table — O(1) integer math per row, no calendar "
        "spine, no sequence explode (a naive explode over the fixture's "
        "±2400-day spans would generate 10⁸ rows at sf0.1). Pure "
        "integer arithmetic end to end (sums and floor-permille means) "
        "so the cross-engine hash is exact; the weekday anchoring "
        "(epoch day 0 = Thursday) is pinned by the shared prefix table "
        "rather than each engine's dow() numbering, which disagree."
    ),
    tags=("scalar", "date", "lineitem"),
)
def scalar_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey, "inner").where(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    n_ship = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
    n_ord = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    bus = _spark_busday_f(n_ship + 1) - _spark_busday_f(n_ord + 1)
    b = j.select("l_returnflag", "l_linestatus", bus.alias("bus_days"))
    return b.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bus_days").cast("long").alias("sum_bus_days"),
        F.floor(F.sum("bus_days") * 1000 / F.count(F.lit(1)))
        .cast("long")
        .alias("avg_permille"),
    )


# --------------------------------------------------------------------------
# Collation semantics (Spark 4 collated strings)
# --------------------------------------------------------------------------


@register(
    "scalar_collation_pack",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_type)
                  ELSE LOWER(p_type) END AS t
      FROM part
    )
    SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_binary_distinct,
           CAST(COUNT(DISTINCT lower(t)) AS BIGINT) AS n_ci_distinct,
           CAST(COUNT(CASE WHEN t = lower(t) THEN 1 END) AS BIGINT)
             AS n_already_lower
    FROM mixed
    """,
    doc=(
        "Spark 4 collation support: the same mixed-case column counted "
        "distinct under binary (UTF8_BINARY) vs case-insensitive "
        "(UTF8_LCASE) collation — `collate()` pushes the comparison "
        "semantics into the aggregate's grouping keys instead of "
        "materializing lower() copies, which matters when the column "
        "feeds joins/sorts too (one collated column, not N normalized "
        "projections). The oracle states the CI count as "
        "COUNT(DISTINCT lower(t)) — semantically identical here, "
        "proving collation == normalize-then-compare for this class."
    ),
    tags=("scalar", "collation", "part", "sql-api"),
)
def scalar_collation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    t = F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type")).otherwise(
        F.lower("p_type")
    )
    m = p.select(t.alias("t"))
    return m.agg(
        F.count_distinct(F.col("t")).cast("long").alias("n_binary_distinct"),
        F.count_distinct(F.collate(F.col("t"), "UTF8_LCASE"))
        .cast("long")
        .alias("n_ci_distinct"),
        F.count(F.when(F.col("t") == F.lower("t"), 1))
        .cast("long")
        .alias("n_already_lower"),
    )


# --------------------------------------------------------------------------
# IP address / CIDR scalar ops (log-pipeline enrichment)
# --------------------------------------------------------------------------


@register(
    "scalar_ip_cidr_ops",
    oracle="""
    WITH ips AS (
      SELECT event_id,
             CAST(10 AS BIGINT) * 16777216
             + (user_id % 256) * 65536
             + ((event_id // 256) % 256) * 256
             + (event_id % 256) AS ip_int
      FROM events
    )
    SELECT event_id,
           CAST(ip_int // 16777216 AS VARCHAR) || '.'
             || CAST((ip_int // 65536) % 256 AS VARCHAR) || '.'
             || CAST((ip_int // 256) % 256 AS VARCHAR) || '.'
             || CAST(ip_int % 256 AS VARCHAR) AS ip_str,
           CAST(ip_int AS BIGINT) AS ip_int,
           CASE WHEN ip_int // 65536 = 10 * 256 + 42
                THEN 1 ELSE 0 END AS in_10_42_16,
           CASE WHEN ip_int // 16777216 = 10 THEN 1 ELSE 0 END AS in_10_8
    FROM ips
    """,
    doc=(
        "IP/CIDR enrichment for log pipelines: synthesize a "
        "deterministic 10.x.y.z address per event, render dotted-quad "
        "from the integer form, and test CIDR membership (/8, /16) as "
        "pure integer prefix comparisons — the form that pushes into "
        "scans and joins (an ip_int BETWEEN range) instead of string "
        "prefix matching. All integer div/mod, bit-exact on both "
        "engines."
    ),
    tags=("scalar", "network", "events"),
)
def scalar_ip_cidr_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    ip_int = (
        F.lit(10) * 16777216
        + (F.col("user_id") % 256) * 65536
        + (F.floor(F.col("event_id") / 256) % 256) * 256
        + (F.col("event_id") % 256)
    ).cast("long")
    d = ev.select("event_id", ip_int.alias("ip_int"))
    octet = lambda e: e.cast("long").cast("string")  # noqa: E731
    ip_str = F.concat_ws(
        ".",
        octet(F.floor(F.col("ip_int") / 16777216)),
        octet(F.floor(F.col("ip_int") / 65536) % 256),
        octet(F.floor(F.col("ip_int") / 256) % 256),
        octet(F.col("ip_int") % 256),
    )
    return d.select(
        "event_id",
        ip_str.alias("ip_str"),
        "ip_int",
        F.when(
            F.floor(F.col("ip_int") / 65536) == 10 * 256 + 42, 1
        )
        .otherwise(0)
        .alias("in_10_42_16"),
        F.when(F.floor(F.col("ip_int") / 16777216) == 10, 1)
        .otherwise(0)
        .alias("in_10_8"),
    )


# --------------------------------------------------------------------------
# Binary scalar pack (encode/digest surface)
# --------------------------------------------------------------------------


@register(
    "scalar_binary_pack",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
             AS roundtrip,
           md5(substr(text, 1, 24)) AS digest_md5,
           sha256(substr(text, 1, 24)) AS digest_sha256,
           hex(encode(substr(text, 1, 8))) AS hex8,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc=(
        "Binary/encoding scalar pack: base64 encode + decode "
        "roundtrip, md5/sha256 digests, hex rendering, byte length — "
        "the payload-handling functions every ingest pipeline leans "
        "on for checksums and wire formats. All JVM built-ins; the "
        "roundtrip column proves encode(decode(x)) == x inside the "
        "query itself."
    ),
    tags=("scalar", "binary", "documents"),
)
def scalar_binary_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    head24 = F.substring("text", 1, 24)
    head24b = F.encode(head24, "utf-8")
    b64 = F.base64(head24b)
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.decode(F.unbase64(b64), "utf-8").alias("roundtrip"),
        F.md5(head24b).alias("digest_md5"),
        F.sha2(head24b, 256).alias("digest_sha256"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("hex8"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# TRY_CAST semantics (null-on-failure typed parsing)
# --------------------------------------------------------------------------


@register(
    "scalar_try_cast_pack",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 4
               WHEN 0 THEN CAST(event_id AS VARCHAR)
               WHEN 1 THEN 'not-a-number'
               WHEN 2 THEN '  ' || CAST(event_id AS VARCHAR) || '  '
               ELSE '1.5e2'
             END AS s
      FROM events
    )
    SELECT event_id, s,
           CASE WHEN regexp_matches(trim(s), '^-?[0-9]+$')
                THEN TRY_CAST(s AS BIGINT) END AS as_long,
           TRY_CAST(s AS DOUBLE) AS as_double,
           CASE WHEN regexp_matches(trim(s), '^-?[0-9]+$')
                     AND TRY_CAST(s AS BIGINT) IS NOT NULL
                THEN 0 ELSE 1 END AS long_failed
    FROM raw
    """,
    doc=(
        "TRY_CAST parsing semantics on a deliberately messy string "
        "column: clean integers, garbage, whitespace-padded integers, "
        "scientific notation. Both engines trim whitespace and reject "
        "garbage to NULL (the ANSI-safe ingestion idiom next to "
        "try_divide and the DLQ split). The one DIVERGENCE is pinned "
        "explicitly: DuckDB accepts '1.5e2' as a BIGINT (numeric "
        "parse then truncate) where Spark's integral cast rejects it "
        "— so the oracle states Spark's stricter pure-integer rule "
        "with a regex guard, documenting the difference instead of "
        "hiding it."
    ),
    tags=("scalar", "parsing", "events"),
)
def scalar_try_cast_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id")
    m = F.col("event_id") % 4
    s = (
        F.when(m == 0, F.col("event_id").cast("string"))
        .when(m == 1, F.lit("not-a-number"))
        .when(
            m == 2,
            F.concat(F.lit("  "), F.col("event_id").cast("string"), F.lit("  ")),
        )
        .otherwise(F.lit("1.5e2"))
    )
    d = ev.select("event_id", s.alias("s"))
    as_long = F.expr("TRY_CAST(s AS BIGINT)")
    return d.select(
        "event_id",
        "s",
        as_long.alias("as_long"),
        F.expr("TRY_CAST(s AS DOUBLE)").alias("as_double"),
        F.when(as_long.isNull(), 1).otherwise(0).alias("long_failed"),
    )


# --------------------------------------------------------------------------
# Luhn checksum validation (payment-card / identifier integrity)
# --------------------------------------------------------------------------


@register(
    "scalar_luhn_checksum",
    oracle="""
    WITH nums AS (
      SELECT event_id,
             lpad(CAST(event_id * 7919 % 1000000000000 AS VARCHAR), 12, '0')
               AS pan
      FROM events
    ),
    digits AS (
      SELECT event_id, pan, CAST(i AS BIGINT) AS i,
             CAST(substr(pan, CAST(13 - i AS INTEGER), 1) AS BIGINT) AS d
      FROM nums, UNNEST(generate_series(1, 12)) AS u(i)
    ),
    luhn AS (
      SELECT event_id, pan,
             CAST(SUM(CASE WHEN i % 2 = 0
                  THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
                  ELSE d END) AS BIGINT) AS s
      FROM digits GROUP BY event_id, pan
    )
    SELECT event_id, pan, s AS luhn_sum,
           CAST(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END AS BIGINT) AS valid
    FROM luhn
    """,
    doc=(
        "Luhn mod-10 checksum validation — the integrity check every "
        "payment/identifier ingest runs before anything else touches "
        "a PAN-shaped field: from the rightmost digit, double every "
        "second digit (subtract 9 above 9), sum, valid iff mod 10 is "
        "zero. Twelve-digit numbers synthesize deterministically from "
        "keys; digits explode positionally and reduce in one "
        "key-grain aggregate — all integers, scan-stage string ops. "
        "Pairs with dq_benford_first_digit in the "
        "fabricated-identifier toolkit."
    ),
    tags=("scalar", "checksum", "dq", "events"),
)
def scalar_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id")
    pan = F.lpad(
        ((F.col("event_id") * 7919) % 1000000000000).cast("string"), 12, "0"
    )
    nums = ev.select("event_id", pan.alias("pan"))
    digits = nums.select(
        "event_id",
        "pan",
        F.posexplode(
            F.expr(
                "transform(sequence(1, 12), "
                "i -> CAST(substring(pan, 13 - i, 1) AS BIGINT))"
            )
        ).alias("i0", "d"),
    ).select(
        "event_id", "pan", (F.col("i0") + 1).alias("i"), "d"
    )
    contrib = F.when(
        F.col("i") % 2 == 0,
        F.when(2 * F.col("d") > 9, 2 * F.col("d") - 9).otherwise(
            2 * F.col("d")
        ),
    ).otherwise(F.col("d"))
    return (
        digits.groupBy("event_id", "pan")
        .agg(F.sum(contrib).cast("long").alias("luhn_sum"))
        .select(
            "event_id",
            "pan",
            "luhn_sum",
            F.when(F.col("luhn_sum") % 10 == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("valid"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic-version parse + precedence (semver.org 2.0.0)
# ---------------------------------------------------------------------------


@register(
    "scalar_semver_compare",
    oracle="""
    WITH v AS (
      SELECT p_brand,
             CAST(p_partkey % 5 AS BIGINT) AS maj0,
             concat(
               CAST(p_partkey % 5 AS VARCHAR), '.',
               CAST(p_partkey % 12 AS VARCHAR), '.',
               CAST(p_partkey % 30 AS VARCHAR),
               CASE WHEN p_partkey % 7 = 0
                    THEN concat('-rc.', CAST(p_partkey % 3 + 1 AS VARCHAR))
                    ELSE '' END
             ) AS ver
      FROM part
    ),
    parsed AS (
      SELECT p_brand, ver,
             CAST(regexp_extract(ver, '^(\\d+)\\.(\\d+)\\.(\\d+)', 1)
                  AS BIGINT) AS major,
             CAST(regexp_extract(ver, '^(\\d+)\\.(\\d+)\\.(\\d+)', 2)
                  AS BIGINT) AS minor,
             CAST(regexp_extract(ver, '^(\\d+)\\.(\\d+)\\.(\\d+)', 3)
                  AS BIGINT) AS patch,
             CASE WHEN ver LIKE '%-%' THEN 0 ELSE 1 END AS is_release,
             COALESCE(TRY_CAST(regexp_extract(ver, '-rc\\.(\\d+)$', 1)
                               AS BIGINT), 0) AS rc
      FROM v
    ),
    keyed AS (
      SELECT p_brand, ver, is_release,
             ((major * 100 + minor) * 100 + patch) * 1000
               + is_release * 100 + rc AS prec
      FROM parsed
    ),
    ranked AS (
      SELECT p_brand, ver, prec,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY prec DESC, ver
             ) AS rk
      FROM keyed
    )
    SELECT k.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(DISTINCT k.ver) AS BIGINT) AS n_distinct,
           CAST(SUM(1 - k.is_release) AS BIGINT) AS n_prerelease,
           MAX(CASE WHEN r.rk = 1 THEN r.ver END) AS max_version
    FROM keyed k
    LEFT JOIN ranked r ON r.p_brand = k.p_brand AND r.ver = k.ver AND r.rk = 1
       AND r.prec = k.prec
    GROUP BY k.p_brand
    ORDER BY k.p_brand
    """,
    doc=(
        "Semantic-version parsing + precedence (semver.org 2.0.0): "
        "version strings are PARSED back with regexp groups (never the "
        "generating arithmetic), mapped to an integer precedence key "
        "implementing the spec's ordering — numeric triple "
        "major.minor.patch, any pre-release sorts BELOW its release "
        "(spec rule 11), pre-release numeric identifiers compare "
        "numerically — and each manufacturer reports its version "
        "census plus the precedence-max version. The package-registry "
        "/ dependency-audit scalar pack: per-group max-by-precedence "
        "is a partitioned rank window after one hash shuffle, and the "
        "parse is pure JVM regexp — at 100 TB this is a scan plus one "
        "keyed agg."
    ),
    tags=("scalar", "parse", "part"),
)
def scalar_semver_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part").select(
        "p_brand",
        F.concat(
            (F.col("p_partkey") % 5).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 12).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 30).cast("string"),
            F.when(
                F.col("p_partkey") % 7 == 0,
                F.concat(F.lit("-rc."), (F.col("p_partkey") % 3 + 1).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("ver"),
    )
    parsed = p.select(
        "p_brand",
        "ver",
        F.regexp_extract("ver", r"^(\d+)\.(\d+)\.(\d+)", 1)
        .cast("long")
        .alias("major"),
        F.regexp_extract("ver", r"^(\d+)\.(\d+)\.(\d+)", 2)
        .cast("long")
        .alias("minor"),
        F.regexp_extract("ver", r"^(\d+)\.(\d+)\.(\d+)", 3)
        .cast("long")
        .alias("patch"),
        F.when(F.col("ver").contains("-"), F.lit(0)).otherwise(F.lit(1)).alias(
            "is_release"
        ),
        F.coalesce(
            F.regexp_extract("ver", r"-rc\.(\d+)$", 1).try_cast("long"),
            F.lit(0),
        ).alias("rc"),
    )
    keyed = parsed.select(
        "p_brand",
        "ver",
        "is_release",
        (
            ((F.col("major") * 100 + F.col("minor")) * 100 + F.col("patch"))
            * 1000
            + F.col("is_release") * 100
            + F.col("rc")
        ).alias("prec"),
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("prec").desc(), F.col("ver"))
    top = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_brand", F.col("ver").alias("max_version"))
    )
    census = keyed.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.countDistinct("ver").cast("long").alias("n_distinct"),
        F.sum(1 - F.col("is_release")).cast("long").alias("n_prerelease"),
    )
    return (
        census.join(F.broadcast(top), "p_brand")
        .select(
            "p_brand", "n_versions", "n_distinct", "n_prerelease", "max_version"
        )
        .orderBy("p_brand")
    )
