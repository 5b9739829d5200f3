"""Similarity search over embeddings (SURVEY.md §2.10 U6).

Exact brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketed variant as the 100 TB scale path
(candidates only within matching sign-buckets, then exact re-rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.functions.vector import cosine, quantize, sql_cosine
from dmi_ingestor_spark.registry import register

N_QUERY = 8  # vec_id < 8 are the query vectors
TOP_K = 5


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
      FROM embeddings
    ),
    scored AS (
      SELECT
        a.vec_id AS query_id,
        b.vec_id AS neighbor_id,
        {sql_cosine("a.qv", "b.qv")} AS sim,
        ROW_NUMBER() OVER (
          PARTITION BY a.vec_id
          ORDER BY {sql_cosine("a.qv", "b.qv")} DESC, b.vec_id
        ) AS rk
      FROM q a JOIN q b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERY}
    )
    SELECT query_id, neighbor_id, sim, rk
    FROM scored WHERE rk <= {TOP_K}
    """,
    doc=(
        "U6 exact ANN baseline: brute-force cosine top-k for a query set, "
        "quantized vectors for cross-engine bit-exactness. Spark plan: "
        "broadcast the (tiny) query side, score JVM-side via "
        "zip_with/aggregate, per-query top-k via window. At scale the "
        "candidate side stays partitioned — no shuffle of the corpus."
    ),
    tags=("similarity", "embeddings"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("qv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("query_vec")
    )
    pairs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), quantize(F.col("embedding")).alias("qv")
    ).join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("sim", cosine(F.col("query_vec"), F.col("qv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


@register(
    "sim_topk_float",
    oracle=None,  # float accumulation order is engine-specific
    doc=(
        "U6 production variant: same plan over raw float vectors "
        "(no quantization). rows-only; test asserts ranking agreement "
        "with the quantized twin."
    ),
    tags=("similarity", "embeddings", "rows-only"),
)
def sim_topk_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("query_vec")
    )
    pairs = emb.select(F.col("vec_id").alias("neighbor_id"), "v").join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("sim", cosine(F.col("query_vec"), F.col("v")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


# -- LSH scale path ---------------------------------------------------------
N_PLANES = 8  # one 8-bit bucket key (256 buckets)


def _plane_literals(dim: int) -> list[list[float]]:
    """±1 hyperplane matrix, md5-derived, computed ONCE at plan time.

    h_ij = +1 if the first hex digit of md5("p{j}-{i}") is even else -1
    — deterministic, no stored model, reproducible across runs and
    engines. Values depend only on (j, i), so evaluating md5 inside the
    Catalyst expression per row (the round-1 form) repaid 8×dim hash
    calls per vector for constants; now they are plain literals in the
    plan.
    """
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"p{j}-{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(N_PLANES)
    ]


def _embedding_dim(sf_dir: str) -> int:
    """Vector dimensionality, read from one parquet row at plan time."""
    import os

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch.column("embedding")[0])


def _hyperplane_sign_bits(vec_col: F.Column, dim: int) -> F.Column:
    """8-bit random-hyperplane signature as a BIGINT bucket key.

    sign bit j = (Σᵢ hᵢⱼ·vᵢ) >= 0, with the hyperplane rows embedded as
    literal arrays — per row the work is one zip_with multiply + one
    aggregate sum per plane, all JVM-side, zero hashing.
    """
    planes = _plane_literals(dim)
    out: F.Column | None = None
    for j, plane in enumerate(planes):
        lits = F.array(*[F.lit(h) for h in plane])
        s = F.aggregate(
            F.zip_with(vec_col, lits, lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(s >= 0, F.lit(2**j)).otherwise(F.lit(0)).cast("long")
        out = bit if out is None else out + bit
    return out


@register(
    "sim_ann_lsh_buckets",
    oracle=None,  # approximate by design; recall invariant in tests
    doc=(
        "U6 scale path: random-hyperplane LSH. Each vector gets an 8-bit "
        "sign signature (deterministic md5-derived hyperplanes, computed "
        "JVM-side); candidates are pairs sharing a bucket, re-ranked by "
        "exact cosine. At 100 TB this is a bucket-key shuffle "
        "(O(n) + O(Σ bucket²)) instead of an O(n²) cross join."
    ),
    tags=("similarity", "embeddings", "approx", "rows-only"),
)
def sim_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sig = emb.withColumn(
        "bucket", _hyperplane_sign_bits(F.col("v"), _embedding_dim(sf_dir))
    )
    a = sig.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"), "bucket"
    )
    b = sig.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", cosine(F.col("a_v"), F.col("b_v")))
        .filter(F.col("sim") >= 0.25)
        .select("bucket", "a_id", "b_id", "sim")
    )


# --------------------------------------------------------------------------
# U6 scale path #2: IVF (inverted-file) ANN — coarse quantizer + probing.
# --------------------------------------------------------------------------

N_CELLS = 16
N_PROBE = 4


def _cell_assignments(emb: DataFrame, seeds: DataFrame, top: int) -> DataFrame:
    """Assign each vector to its `top` nearest coarse cells.

    seeds is tiny (N_CELLS rows) and broadcast; the corpus streams
    through one narrow join — at 100 TB the assignment pass is a single
    map-shaped stage, and the per-vector window ranks only N_CELLS rows.
    """
    scored = emb.join(F.broadcast(seeds), F.col("vec_id") != F.lit(-1)).withColumn(
        "cell_sim", cosine(F.col("v"), F.col("cell_v"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cell_sim").desc(), F.col("cell_id"))
    return (
        scored.withColumn("cell_rk", F.row_number().over(w))
        .filter(F.col("cell_rk") <= top)
        .select("vec_id", "v", "cell_id", "cell_rk")
    )


@register(
    "sim_ann_ivf",
    oracle=None,  # approximate by design; invariants in tests
    doc=(
        "U6 scale path: IVF-style ANN. Coarse centroids = a fixed, "
        "deterministic sample of the corpus (vec_id < 16); every vector "
        "joins its nearest cell (inverted lists), queries probe their 4 "
        "nearest cells and brute-force only those lists. At 100 TB: "
        "corpus partitioned/bucketed BY cell_id, probe = partition "
        "pruning — the O(n²) scan becomes O(n/N_CELLS × N_PROBE) per "
        "query. Top-1 self-match invariant tested."
    ),
    tags=("similarity", "embeddings", "approx", "rows-only"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cell_v")
    )
    # inverted lists: each corpus vector in exactly one cell
    lists = _cell_assignments(emb, seeds, 1).select(
        F.col("cell_id"), F.col("vec_id").alias("neighbor_id"), F.col("v").alias("n_v")
    )
    # queries probe their N_PROBE nearest cells
    probes = _cell_assignments(
        emb.filter(F.col("vec_id") < N_QUERY), seeds, N_PROBE
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("q_v"), "cell_id")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        lists.join(F.broadcast(probes), ["cell_id"])
        .withColumn("sim", cosine(F.col("q_v"), F.col("n_v")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rk")
    )
