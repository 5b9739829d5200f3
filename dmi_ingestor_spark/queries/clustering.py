"""Iterative clustering over ``embeddings`` (north-star extension).

Lloyd's k-means is THE canonical iterative Spark job: broadcast the k
centroids, assign every point to its nearest centroid (map-only), and
re-aggregate the centroids (one small shuffle per round). Here the
whole 3-round loop is unrolled into ONE lazy Catalyst plan — no
per-iteration ``collect``; the k×d centroid relation stays a broadcast
relation between rounds, which is exactly how the job should behave on
a 1000-executor cluster (the per-round shuffle carries k rows, not n).

Everything runs in integer arithmetic so even the ITERATION is
oracle-checkable: coordinates quantize to ``floor(x * 10^4)`` (double
multiply + floor are IEEE-deterministic in both engines), distances are
exact BIGINT sums of squares, and centroid updates use
``FLOOR(SUM/COUNT)`` on a <2^53 numerator — bit-identical everywhere.
Ties break on the lowest centroid id, mirrored in the oracle's
ROW_NUMBER ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register

_K = 4
_DIM = 8  # first 8 of the 64 dims: keeps the unrolled oracle SQL readable
_ITERS = 3
_SCALE = 10_000


def _quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    cols = [
        F.floor(F.col("embedding")[i].cast("double") * _SCALE)
        .cast("long")
        .alias(f"q{i}")
        for i in range(_DIM)
    ]
    return e.select("vec_id", *cols)


def _assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per point, computed MAP-SIDE (round-3 re-plan).

    The k centroids collapse to ONE array<struct> row (a k-row
    SinglePartition agg — bounded by k, never by n), that row is
    broadcast, and the argmin is ``array_min`` over per-centroid
    (dist, cid) structs evaluated inside the point's own task. The
    round-2 version crossJoined then ran ``row_number() OVER
    (PARTITION BY vec_id)`` — a full n×k shuffle per round, ×3 rounds;
    this shape shuffles nothing per point (VERDICT r2, perf-weak #1).
    Ties break on lowest cid via struct field ordering, mirroring the
    oracle's ROW_NUMBER tiebreak.
    """
    cent_arr = centroids.agg(
        F.collect_list(
            F.struct(F.col("cid"), *[F.col(f"c{i}") for i in range(_DIM)])
        ).alias("cents")
    )

    def _dist(c):
        return sum(
            (F.col(f"q{i}") - c[f"c{i}"]) * (F.col(f"q{i}") - c[f"c{i}"])
            for i in range(_DIM)
        )

    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(_dist(c).alias("dist"), c["cid"].alias("cid")),
        )
    )
    return (
        points.crossJoin(F.broadcast(cent_arr))
        .withColumn("best", best)
        .select(
            "vec_id",
            F.col("best.cid").alias("cid"),
            *[f"q{i}" for i in range(_DIM)],
            F.col("best.dist").alias("dist"),
        )
    )


@register(
    "cluster_kmeans_embeddings",
    oracle=None,  # replaced below by the generated unrolled SQL
    doc=(
        "U6/ML: Lloyd's k-means (k=4, 3 rounds, first 8 dims) as one "
        "unrolled lazy plan — per round: broadcast-crossJoin the k "
        "centroids, integer argmin assignment, FLOOR(SUM/COUNT) "
        "centroid update (k-row shuffle). Integer-exact quantization "
        "makes the full iteration hash-green against a generated "
        "4-level CTE oracle. The same plan shape at 100 TB keeps every "
        "round map-only + one k-row shuffle; rounds-to-convergence is "
        "the only serial dimension."
    ),
    tags=("clustering", "iterative", "embeddings"),
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _quantize(spark, sf_dir)
    centroids = (
        pts.filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            *[F.col(f"q{i}").alias(f"c{i}") for i in range(_DIM)],
        )
    )
    for _ in range(_ITERS):
        assigned = _assign(pts, centroids)
        centroids = assigned.groupBy("cid").agg(
            *[
                F.floor(
                    F.sum(f"q{i}").cast("double") / F.count(F.lit(1))
                )
                .cast("long")
                .alias(f"c{i}")
                for i in range(_DIM)
            ]
        )
    final = _assign(pts, centroids)
    return final.select(
        "vec_id",
        F.col("cid").cast("int").alias("cluster_id"),
        F.col("dist").cast("long").alias("dist_sq"),
    )


def _kmeans_oracle() -> str:
    qcols = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{i + 1}] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q{i}"
        for i in range(_DIM)
    )
    dist = " + ".join(f"(p.q{i} - c.c{i}) * (p.q{i} - c.c{i})" for i in range(_DIM))
    upd = ", ".join(
        f"CAST(FLOOR(CAST(SUM(q{i}) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c{i}"
        for i in range(_DIM)
    )
    sql = [
        f"WITH pts AS (SELECT vec_id, {qcols} FROM embeddings)",
        f", cent0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, "
        + ", ".join(f"q{i} AS c{i}" for i in range(_DIM))
        + f" FROM pts WHERE vec_id < {_K})",
    ]
    prev = "cent0"
    for r in range(1, _ITERS + 1):
        sql.append(
            f", asg{r} AS (SELECT p.vec_id, c.cid, "
            + ", ".join(f"p.q{i}" for i in range(_DIM))
            + f", {dist} AS dist,"
            f" ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY {dist}, c.cid) AS rn"
            f" FROM pts p CROSS JOIN {prev} c QUALIFY rn = 1)"
        )
        sql.append(f", cent{r} AS (SELECT cid, {upd} FROM asg{r} GROUP BY cid)")
        prev = f"cent{r}"
    sql.append(
        f", fin AS (SELECT p.vec_id, c.cid, {dist} AS dist,"
        f" ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY {dist}, c.cid) AS rn"
        f" FROM pts p CROSS JOIN {prev} c QUALIFY rn = 1)"
    )
    sql.append(
        "SELECT vec_id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist_sq FROM fin"
    )
    return "\n".join(sql)


# The oracle is generated (4-level CTE chain mirroring the unrolled
# plan); dataclass is frozen, so re-register with the SQL attached.
from dmi_ingestor_spark.registry import REGISTRY, QuerySpec  # noqa: E402

_spec = REGISTRY["cluster_kmeans_embeddings"]
REGISTRY["cluster_kmeans_embeddings"] = QuerySpec(
    name=_spec.name,
    builder=_spec.builder,
    oracle=_kmeans_oracle(),
    doc=_spec.doc,
    tags=_spec.tags,
)


# --------------------------------------------------------------------------
# SemDeDup: semantic deduplication = k-means blocking + in-cluster cosine.
# --------------------------------------------------------------------------

_SEM_TAU = 0.40  # same near-dup threshold as dedup_embedding_cosine


def _semdedup_oracle() -> str:
    from dmi_ingestor_spark.functions.vector import sql_cosine

    cos = sql_cosine("a.qv", "b.qv")
    return f"""
    WITH asg AS (SELECT vec_id, cluster_id FROM ({_kmeans_oracle()})),
    vq AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
      FROM embeddings
    ),
    pts AS (
      SELECT a.vec_id, a.cluster_id, v.qv FROM asg a JOIN vq v USING (vec_id)
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM pts a JOIN pts b
        ON a.cluster_id = b.cluster_id AND b.vec_id > a.vec_id
      WHERE {cos} >= {_SEM_TAU}
    )
    SELECT p.vec_id, p.cluster_id, (d.vec_id IS NULL) AS is_kept
    FROM pts p LEFT JOIN dups d ON d.vec_id = p.vec_id
    """


@register(
    "dedup_semantic_cluster",
    oracle=_semdedup_oracle(),
    doc=(
        "SemDeDup (Abbas et al. 2023) shape: semantic dedup via k-means "
        "blocking. The unrolled integer-exact k-means assignment "
        "(cluster_kmeans_embeddings) is the blocking key; full-dim "
        "quantized cosine runs only WITHIN clusters (pair count bounded "
        "by Σ cluster², never n²); a row is dropped when a smaller-id "
        "in-cluster neighbor has sim ≥ 0.40. At 100 TB the cluster "
        "count scales with n so in-cluster blocks stay bounded, the "
        "per-round k-means shuffle carries k rows, and the verify join "
        "shuffles on cluster_id only. The whole composition — iteration "
        "included — is hash-checked against a nested-CTE oracle."
    ),
    tags=("dedup", "clustering", "embeddings", "iterative"),
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.functions.vector import quantize

    asg = cluster_kmeans_embeddings(spark, sf_dir).select("vec_id", "cluster_id")
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantize(F.col("embedding")).alias("qv")
    )
    pts = asg.join(emb, ["vec_id"])

    # Per-cluster Arrow block: one numpy gram matrix per cluster instead
    # of an in-cluster pair JOIN — the HOF-expression cosine is an
    # interpreted closure, so Σ cluster² pairs × 64 dims was the r7
    # sf0.5 sweep's slowest Spark stage (188 s; this path is ~2 s).
    # Bit-identical to the expression form AND the DuckDB oracle: the
    # quantized components are integer-valued (|q| ≤ 1000, 64 dims), so
    # every dot product / norm² is an exact integer ≤ 6.4e7 under ANY
    # summation order, and the final sqrt·sqrt / divide round once each,
    # identically. Memory per group is (cluster size)² — bounded because
    # SemDeDup scales k with n (fixture: ≤(n/10)² ≈ 8 MB at sf0.5).
    import numpy as np
    import pandas as pd

    tau = _SEM_TAU

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        cids = pdf["cluster_id"].to_numpy()[order]
        v = np.stack(pdf["qv"].to_numpy()[order]).astype(np.float64)
        dots = v @ v.T
        nrm = np.sqrt(np.einsum("ij,ij->i", v, v))
        den = nrm[:, None] * nrm[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(den > 0, dots / den, 0.0)
        # dropped iff any smaller-id in-cluster neighbor has sim >= tau;
        # ids are sorted, so "smaller id" = strictly-lower triangle
        dup = np.tril(cos >= tau, -1).any(axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "cluster_id": cids, "is_kept": ~dup}
        )

    return pts.groupBy("cluster_id").applyInPandas(
        _block, "vec_id long, cluster_id int, is_kept boolean"
    )


# --------------------------------------------------------------------------
# Farthest-point (k-means++-style deterministic) seeding
# --------------------------------------------------------------------------

_FP_K = 4  # seeds to select (seed 0 = vec_id 0, then 3 farthest-point rounds)


def _fp_oracle() -> str:
    qcols = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{i + 1}] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q{i}"
        for i in range(_DIM)
    )

    def dist(alias: str) -> str:
        return " + ".join(
            f"(p.q{i} - {alias}.q{i}) * (p.q{i} - {alias}.q{i})"
            for i in range(_DIM)
        )

    sql = [
        f"WITH pts AS (SELECT vec_id, {qcols} FROM embeddings)",
        ", s0 AS (SELECT CAST(0 AS BIGINT) AS seed_rank, vec_id, "
        + ", ".join(f"q{i}" for i in range(_DIM))
        + ", CAST(0 AS BIGINT) AS dist_sq FROM pts WHERE vec_id = 0)",
    ]
    prev = ["s0"]
    for r in range(1, _FP_K):
        mind = "LEAST(" + ", ".join(f"({dist(s)})" for s in prev) + ")" \
            if len(prev) > 1 else f"({dist(prev[0])})"
        joins = " ".join(f"CROSS JOIN {s}" for s in prev)
        sql.append(
            f", s{r} AS (SELECT CAST({r} AS BIGINT) AS seed_rank, p.vec_id, "
            + ", ".join(f"p.q{i}" for i in range(_DIM))
            + f", CAST({mind} AS BIGINT) AS dist_sq"
            f" FROM pts p {joins}"
            f" ORDER BY {mind} DESC, p.vec_id LIMIT 1)"
        )
        prev.append(f"s{r}")
    sel = " UNION ALL ".join(
        f"SELECT seed_rank, vec_id, dist_sq FROM {s}" for s in prev
    )
    return sql_join(sql) + f"\n{sel}"


def sql_join(parts: list[str]) -> str:
    return "\n".join(parts)


@register(
    "cluster_farthest_point_seeding",
    oracle=_fp_oracle(),
    doc=(
        "Deterministic k-means++-style seeding by farthest-point "
        "traversal (the D^2-max variant — Gonzalez 1985, the "
        "derandomized form of Arthur & Vassilvitskii 2007): seed 0 is "
        "a fixed point, then each round picks the point MAXIMIZING its "
        "distance to the chosen set (lowest-id tiebreak). Each round "
        "is map-side distance evaluation against the broadcast chosen "
        "set plus ONE 1-row argmax aggregate — k rounds cost k linear "
        "scans and k 1-row shuffles, the plan a 100 TB seeding pass "
        "needs (no per-point state, no global sort). Integer-exact "
        "quantized arithmetic makes the whole iteration hash-checkable "
        "against an unrolled CTE oracle; feeds "
        "cluster_kmeans_embeddings as its init."
    ),
    tags=("clustering", "iterative", "embeddings", "scale"),
)
def cluster_farthest_point_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _quantize(spark, sf_dir).cache()
    qcols = [f"q{i}" for i in range(_DIM)]

    chosen = pts.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("seed_rank"),
        "vec_id",
        *qcols,
        F.lit(0).cast("long").alias("dist_sq"),
    )
    for r in range(1, _FP_K):
        cents = chosen.agg(
            F.collect_list(F.struct(*[F.col(c) for c in qcols])).alias("cs")
        )

        def _d(c):
            return sum(
                (F.col(f"q{i}") - c[f"q{i}"]) * (F.col(f"q{i}") - c[f"q{i}"])
                for i in range(_DIM)
            )

        mind = F.array_min(F.transform(F.col("cs"), lambda c: _d(c)))
        best = (
            pts.crossJoin(F.broadcast(cents))
            .select("vec_id", *qcols, mind.alias("d"))
            .agg(
                F.max(
                    F.struct(
                        F.col("d").alias("d"),
                        (-F.col("vec_id")).alias("nid"),
                        *[F.col(c).alias(c) for c in qcols],
                    )
                ).alias("m")
            )
            .select(
                F.lit(r).cast("long").alias("seed_rank"),
                (-F.col("m.nid")).alias("vec_id"),
                *[F.col(f"m.{c}").alias(c) for c in qcols],
                F.col("m.d").cast("long").alias("dist_sq"),
            )
        )
        chosen = chosen.unionByName(best)
    return chosen.select("seed_rank", "vec_id", "dist_sq")


# ---------------------------------------------------------------------------
# Density-based clustering: grid-blocked eps-neighborhood (DBSCAN stage 1)
# ---------------------------------------------------------------------------

_DB_EPS = 300  # quantized units: 0.03 in embedding space
_DB_MINPTS = 5


@register(
    "cluster_dbscan_core_points",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q0,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q1
      FROM embeddings
    )
    SELECT a.vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(COUNT(*) >= {_DB_MINPTS} AS INT) AS is_core
    FROM p a JOIN p b
      ON (a.q0 - b.q0) * (a.q0 - b.q0)
       + (a.q1 - b.q1) * (a.q1 - b.q1) <= {_DB_EPS * _DB_EPS}
    GROUP BY a.vec_id
    ORDER BY a.vec_id
    """,
    doc=(
        "U6/ML: DBSCAN stage 1 (core-point classification) with GRID "
        "BLOCKING — the distributed eps-neighborhood counting that "
        "makes density clustering feasible at scale. Points quantize "
        "to integer 2-D coordinates and hash into eps-sized grid "
        "cells; one side replicates into its 9 adjacent cells "
        "(explode, x9 not xN), so the neighbor search is an EQUI-join "
        "on the cell key — candidates are O(n x local density), never "
        "the n^2 self-join the naive form (and the oracle, which IS "
        "the n^2 form — same semantics, small-data-only plan) would "
        "do. A point is core when its eps-ball holds >= minPts "
        "points (self included). The eps-ball-within-adjacent-cells "
        "guarantee makes blocking lossless, so the grid plan is "
        "hash-identical to the exhaustive oracle. At 100 TB the cell "
        "key is the shuffle key; hot cells are bounded by physical "
        "density, and stage 2 (core-graph connected components) is "
        "the same iterative min-label propagation the dedup closure "
        "already ships (operators/components.py). DIMENSIONALITY "
        "CAVEAT: this query clusters in the FIRST TWO embedding "
        "dimensions only (as its oracle also does) — a 2-D grid is "
        "the right blocker for spatial/geo density, but the "
        "9-adjacent-cell trick degrades to 3^d replication in d "
        "dimensions; true high-dimensional density clustering should "
        "block with the LSH/IVF bucketers this repo ships "
        "(sim_ann_lsh_buckets / sim_ann_ivf) instead of this grid."
    ),
    tags=("clustering", "density", "embeddings", "grid-blocking"),
)
def cluster_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        *[
            F.floor(F.col("embedding")[i].cast("double") * _SCALE)
            .cast("long")
            .alias(f"q{i}")
            for i in range(2)
        ],
    ).select(
        "vec_id",
        "q0",
        "q1",
        *[
            F.floor(F.col(f"q{i}").cast("double") / _DB_EPS)
            .cast("long")
            .alias(c)
            for i, c in ((0, "cx"), (1, "cy"))
        ],
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # Build side: each point lands in its own cell plus the 8 adjacent
    # ones, so the probe side joins on ITS cell only (pure equi-join).
    build = (
        pts.select("q0", "q1", "cx", "cy")
        .withColumn("o", F.explode(offsets))
        .select(
            F.col("q0").alias("b_q0"),
            F.col("q1").alias("b_q1"),
            (F.col("cx") + F.col("o.dx")).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
        )
    )
    d0 = F.col("q0") - F.col("b_q0")
    d1 = F.col("q1") - F.col("b_q1")
    return (
        pts.join(
            build,
            (F.col("cx") == F.col("jx")) & (F.col("cy") == F.col("jy")),
        )
        .where(d0 * d0 + d1 * d1 <= F.lit(_DB_EPS * _DB_EPS))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neighbors"))
        .select(
            "vec_id",
            "n_neighbors",
            (F.col("n_neighbors") >= _DB_MINPTS).cast("int").alias("is_core"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# DBSCAN stage 2: full cluster labels (core graph components + border assign)
# ---------------------------------------------------------------------------

_DB2_MINPTS = 5
# Density-normalized eps (r7): eps^2 = _DB2_EPS2N / n, i.e. the exact
# integer predicate is  dist^2 * n <= _DB2_EPS2N.  At the driver's
# sf0.01 (n=200 embeddings) this is eps=200 — identical to the old
# fixed constant, so every recorded driver row is unchanged. Why
# normalize: with eps FIXED, expected neighbors grow linearly in n, the
# eps-graph crosses the 2-D percolation threshold (~4.5 neighbors) by
# sf~0.05 and fuses into one giant component — the r7 sf0.5 sweep
# watched the oracle's transitive closure on that component allocate
# 35 GB before being killed. eps ~ 1/sqrt(n) holds expected neighbors
# (and therefore the subcritical 17-cluster regime) constant at every
# scale, which is also the honest way to run density clustering as the
# corpus grows.
_DB2_EPS2N = 200 * 200 * 200  # eps^2 * n  (= 8e6)


def _grid_neighbor_pairs(
    spark: SparkSession, sf_dir: str, cell: int, n_emb: int
) -> DataFrame:
    """(a_id, b_id) for every ordered pair with dist^2 * n_emb <=
    _DB2_EPS2N (self included), via lossless 9-cell grid blocking with
    ``cell`` >= eps — an equi-join on the cell key, never an n^2
    self-join."""
    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id",
        *[
            F.floor(F.col("embedding")[i].cast("double") * _SCALE)
            .cast("long")
            .alias(f"q{i}")
            for i in range(2)
        ],
    ).select(
        "vec_id",
        "q0",
        "q1",
        F.floor(F.col("q0").cast("double") / cell).cast("long").alias("cx"),
        F.floor(F.col("q1").cast("double") / cell).cast("long").alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    build = (
        pts.select("vec_id", "q0", "q1", "cx", "cy")
        .withColumn("o", F.explode(offsets))
        .select(
            F.col("vec_id").alias("b_id"),
            F.col("q0").alias("b_q0"),
            F.col("q1").alias("b_q1"),
            (F.col("cx") + F.col("o.dx")).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
        )
    )
    d0 = F.col("q0") - F.col("b_q0")
    d1 = F.col("q1") - F.col("b_q1")
    return (
        pts.join(
            build,
            (F.col("cx") == F.col("jx")) & (F.col("cy") == F.col("jy")),
        )
        .where((d0 * d0 + d1 * d1) * F.lit(n_emb) <= F.lit(_DB2_EPS2N))
        .select(F.col("vec_id").alias("a_id"), "b_id")
    )


@register(
    "cluster_dbscan_labels",
    oracle=f"""
    WITH RECURSIVE p AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q0,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {_SCALE}) AS BIGINT) AS q1
      FROM embeddings
    ),
    nn AS (SELECT COUNT(*) AS n_emb FROM embeddings),
    n AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM p a JOIN p b
        ON ((a.q0 - b.q0) * (a.q0 - b.q0)
          + (a.q1 - b.q1) * (a.q1 - b.q1))
           * (SELECT n_emb FROM nn) <= {_DB2_EPS2N}
    ),
    cnt AS (SELECT a_id, COUNT(*) AS c FROM n GROUP BY a_id),
    core AS (SELECT a_id AS vec_id FROM cnt WHERE c >= {_DB2_MINPTS}),
    ce AS (
      SELECT n.a_id AS u, n.b_id AS v FROM n
      WHERE n.a_id IN (SELECT vec_id FROM core)
        AND n.b_id IN (SELECT vec_id FROM core)
    ),
    reach(id, r) AS (
      SELECT u, u FROM ce
      UNION
      SELECT e.u, rr.r FROM ce e JOIN reach rr ON rr.id = e.v
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    border AS (
      SELECT n.a_id AS vec_id, MIN(c.comp) AS cluster
      FROM n JOIN comp c ON c.id = n.b_id
      WHERE n.a_id NOT IN (SELECT vec_id FROM core)
      GROUP BY n.a_id
    )
    SELECT p.vec_id,
           CAST(CASE WHEN c.comp IS NOT NULL THEN c.comp
                     WHEN b.cluster IS NOT NULL THEN b.cluster
                     ELSE -1 END AS BIGINT) AS cluster,
           CASE WHEN c.comp IS NOT NULL THEN 'core'
                WHEN b.cluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role
    FROM p
    LEFT JOIN comp c ON c.id = p.vec_id
    LEFT JOIN border b ON b.vec_id = p.vec_id
    ORDER BY p.vec_id
    """,
    doc=(
        "U6/ML: DBSCAN stage 2 — full deterministic cluster labels. "
        "Core points (eps-ball >= minPts, grid-blocked count) form a "
        "graph joined core-to-core within eps; its connected components "
        "(iterative min-label propagation, operators/components.py — "
        "each round shuffles the EDGE set only) are the clusters, "
        "labeled min vec_id. Border points (non-core within eps of a "
        "core) take the MINIMUM neighboring core's cluster — a "
        "deterministic pin of DBSCAN's arbitrary border tie-break, so "
        "the whole labeling is hash-checkable against the oracle's "
        "recursive-CTE transitive closure. Everything else is noise "
        "(cluster -1). eps is DENSITY-NORMALIZED (eps^2 = 8e6/n, an "
        "exact dist^2*n <= 8e6 integer predicate; = the old fixed 200 "
        "at the driver's sf0.01): a fixed eps crosses the 2-D "
        "percolation threshold as n grows and fuses one giant "
        "component (the r7 sf0.5 sweep's 35 GB oracle blow-up); "
        "eps ~ 1/sqrt(n) pins expected neighbors, keeping the "
        "17-cluster regime at every sf. At 100 TB: pair generation is "
        "the grid equi-join, components iterate on the core-core edge "
        "set (<< corpus), border assign is one more equi-join — no "
        "stage touches n^2."
    ),
    tags=("clustering", "density", "iterative", "embeddings"),
)
def cluster_dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from math import isqrt

    from dmi_ingestor_spark.operators.components import connected_components

    # metadata-cheap scalar: n drives the density-normalized eps; the
    # grid cell just needs cell >= eps = sqrt(_DB2_EPS2N / n) for the
    # 9-cell blocking to stay lossless
    n_emb = table(spark, sf_dir, "embeddings").count()
    cell = isqrt(_DB2_EPS2N // max(n_emb, 1)) + 1
    pairs = _grid_neighbor_pairs(spark, sf_dir, cell, n_emb).cache()
    counts = pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("c"))
    core = counts.where(F.col("c") >= _DB2_MINPTS).select(
        F.col("a_id").alias("core_id")
    )
    core_a = core.select(F.col("core_id").alias("a_id"))
    core_b = core.select(F.col("core_id").alias("b_id"))
    # localCheckpoint cuts the grid-join lineage out of every
    # propagation round's plan (the eps=200 graph has real diameter, so
    # rounds are many and an uncut plan string alone OOMs the driver).
    ce = pairs.join(core_a, "a_id").join(core_b, "b_id").localCheckpoint(eager=True)
    comp = connected_components(ce, "a_id", "b_id", checkpoint_every=3).select(
        F.col("node").alias("id"), F.col("component").alias("comp")
    )
    border = (
        pairs.join(core_a, "a_id", "left_anti")
        .join(comp, pairs.b_id == comp.id)
        .groupBy("a_id")
        .agg(F.min("comp").alias("b_cluster"))
        .select(F.col("a_id").alias("b_vec"), "b_cluster")
    )
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    out = (
        e.join(comp, e.vec_id == comp.id, "left")
        .join(border, e.vec_id == F.col("b_vec"), "left")
        .select(
            "vec_id",
            F.coalesce(F.col("comp"), F.col("b_cluster"), F.lit(-1))
            .cast("long")
            .alias("cluster"),
            F.when(F.col("comp").isNotNull(), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
        .orderBy("vec_id")
    )
    return out


# ---------------------------------------------------------------------------
# DBSCAN core points with LSH-bucket blocking (the HIGH-DIM blocker)
# ---------------------------------------------------------------------------

_DBL_SCALE = 1000
_DBL_EPS2 = 1_500_000  # eps^2 on the 1000-scaled integer grid (~1% of pairs)
_DBL_MINPTS = 3
_DBL_PLANES = 8


def _dbl_planes() -> list[list[int]]:
    """±1 hyperplanes, md5-derived at plan time (similarity.py recipe)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"p{j}-{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1
            for i in range(64)
        ]
        for j in range(_DBL_PLANES)
    ]


def _dbl_oracle() -> str:
    planes = _dbl_planes()
    dot_terms = []
    for j, row in enumerate(planes):
        terms = " + ".join(
            f"{'' if h > 0 else '-'}q[{i + 1}]" for i, h in enumerate(row)
        ).replace("+ -", "- ")
        dot_terms.append(
            f"(CASE WHEN ({terms}) >= 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(dot_terms)
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(x * {_DBL_SCALE}) AS BIGINT)) AS q
      FROM embeddings
    ),
    keyed AS MATERIALIZED (
      SELECT vec_id, q, CAST({bucket} AS BIGINT) AS bucket FROM e
    ),
    neigh AS (
      SELECT a.vec_id,
             CAST(COUNT(*) AS BIGINT) AS n_neighbors
      FROM keyed a JOIN keyed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      WHERE list_sum(list_transform(generate_series(1, 64),
                     i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])))
            <= {_DBL_EPS2}
      GROUP BY a.vec_id
    )
    SELECT k.vec_id, k.bucket,
           COALESCE(n.n_neighbors, 0) + 1 AS eps_ball_count,
           CAST(COALESCE(n.n_neighbors, 0) + 1 >= {_DBL_MINPTS} AS BIGINT)
             AS is_core
    FROM keyed k LEFT JOIN neigh n USING (vec_id)
    ORDER BY k.vec_id
    """


@register(
    "cluster_dbscan_lsh_blocked",
    oracle=_dbl_oracle(),
    doc=(
        "DBSCAN core-point classification in FULL 64-dim space with "
        "LSH-BUCKET blocking — the high-dimensional companion to the "
        "2-D grid blocker (whose 9-cell trick is 3^d in d dims, "
        "documented there): candidates are pairs sharing the 8-bit "
        "sign pattern under md5-derived plan-time ±1 hyperplanes, "
        "verified by EXACT integer squared distance over all 64 "
        "quantized dims. Recall-bounded by construction (an eps-pair "
        "split by a hyperplane is missed — the standard LSH-DBSCAN "
        "trade, tunable with more bands exactly as in the dedup "
        "ladder), and the oracle applies the IDENTICAL bucket "
        "predicate, so the hash pin checks the blocked semantics, "
        "not a pretense of exactness. Scale: bucketing is map-side "
        "(plan-time literals, no model table), the join is keyed on "
        "the bucket — O(n x bucket occupancy), never n^2."
    ),
    tags=("clustering", "density", "lsh", "embeddings", "scale"),
)
def cluster_dbscan_lsh_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 10 (guide §4.2, same pattern as sim_ann_lsh_buckets): the
    # 8-plane signature was ~8×64×2 interpreted HOF lambda steps per
    # row, and the eps-ball count ran one interpreted HOF squared
    # distance per CANDIDATE PAIR after a bucket self-join (plus a
    # cache + left join to restore zero-neighbor rows). Now: one numpy
    # sign-pack per Arrow batch, then one gram block per bucket that
    # counts neighbors for EVERY member (zero-neighbor rows included,
    # so the join disappears). Exactness: q is the Spark-computed
    # floor(x*1000) long vector; plane dots and the expanded
    # ‖a‖²+‖b‖²−2a·b distance are exact integers far below 2^53 under
    # any accumulation order, so the eps2 comparison is bit-identical
    # to the (a−b)² HOF chain and the oracle.
    import numpy as np
    import pandas as pd

    h_t = np.asarray(_dbl_planes(), dtype=np.float64).T  # dim × planes
    weights = 2 ** np.arange(len(_dbl_planes()), dtype=np.int64)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * _DBL_SCALE).cast("long"),
        ).alias("q"),
    )

    def _sig(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["q"].to_numpy()).astype(np.float64)
            bucket = ((v @ h_t >= 0) * weights).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "q": pdf["q"], "bucket": bucket}
            )

    keyed = e.mapInPandas(_sig, "vec_id long, q array<bigint>, bucket long")

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        v = np.stack(pdf["q"].to_numpy()).astype(np.float64)
        nsq = np.einsum("ij,ij->i", v, v)
        d2 = nsq[:, None] + nsq[None, :] - 2.0 * (v @ v.T)
        close = d2 <= _DBL_EPS2
        np.fill_diagonal(close, False)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "bucket": pdf["bucket"].iloc[0],
                "n_neighbors": close.sum(axis=1).astype(np.int64),
            }
        )

    counts = keyed.groupBy("bucket").applyInPandas(
        _block, "vec_id long, bucket long, n_neighbors long"
    )
    return counts.select(
        "vec_id",
        "bucket",
        (F.col("n_neighbors") + 1).cast("long").alias("eps_ball_count"),
        (F.col("n_neighbors") + 1 >= _DBL_MINPTS).cast("long").alias("is_core"),
    ).orderBy("vec_id")
