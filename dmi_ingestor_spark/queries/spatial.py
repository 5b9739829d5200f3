"""Spatial operators: grid-cell (geohash-style) radius joins.

The reference's only spatial surface is the bbox slice + LCC
reprojection (`dmi_ingestor/ingestor.py:170-173,83-87`); a real
analytics engine over geo data also needs the SPATIAL JOIN — "find all
pairs of points within R km" — which naive SQL plans as an O(n²)
theta-join. The scalable idiom (identical to geohash bucketing, PostGIS
ST_DWithin tiling, or Sedona's grid partitioner) is:

1. assign every point to a grid cell sized ≥ the search radius,
2. explode ONE side to its 3×3 neighbor cells,
3. equi-join on the cell id (hash shuffle on small int keys),
4. verify the exact distance on the tiny candidate set.

Trig stays out of the row path (libm ulps differ across engines): the
equirectangular cos(lat₀) correction binds as a PLAN-TIME literal, so
the remaining row math (-, *, +, sqrt) is IEEE-exact and hash-green.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.catalog import table
from dmi_ingestor_spark.registry import register

# Deterministic synthetic coordinates: a Denmark-ish lattice keyed off
# c_custkey (the fixtures carry no lat/lon). Multiples of 2^-4 minus
# integer parts are exact in binary doubles? 0.05 is NOT exact — but
# exactness is irrelevant: both engines evaluate the SAME double
# expression tree, so the bits agree. floor() on the shared value is
# likewise bit-stable.
GEO_LAT_BASE = 54.0
GEO_LON_BASE = 8.0
GEO_LAT_STEP = 0.05
GEO_LON_STEP = 0.07
GEO_LAT_MOD = 97
GEO_LON_MOD = 83

GEO_RADIUS_KM = 25.0
GEO_KM_PER_DEG = 111.195  # mean earth radius * pi / 180
_COSLAT = math.cos(math.radians(56.0))  # plan-time literal, mid-domain
# Cell sized so that any pair within R km is at most one cell apart in
# each axis: R km in degrees latitude, and R/cos(lat) in longitude.
CELL_H = GEO_RADIUS_KM / GEO_KM_PER_DEG
CELL_W = GEO_RADIUS_KM / (GEO_KM_PER_DEG * _COSLAT)


@register(
    "spatial_radius_join_grid",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST({GEO_LAT_BASE} AS DOUBLE)
               + CAST({GEO_LAT_STEP} AS DOUBLE) * (c_custkey % {GEO_LAT_MOD}) AS lat,
             CAST({GEO_LON_BASE} AS DOUBLE)
               + CAST({GEO_LON_STEP} AS DOUBLE) * (c_custkey % {GEO_LON_MOD}) AS lon
      FROM customer
    )
    SELECT a.c_custkey AS a_cust,
           b.c_custkey AS b_cust,
           {GEO_KM_PER_DEG} * sqrt(
             (a.lat - b.lat) * (a.lat - b.lat)
             + ((a.lon - b.lon) * {_COSLAT!r}) * ((a.lon - b.lon) * {_COSLAT!r})
           ) AS dist_km
    FROM pts a JOIN pts b
      ON a.c_custkey < b.c_custkey
    WHERE {GEO_KM_PER_DEG} * sqrt(
            (a.lat - b.lat) * (a.lat - b.lat)
            + ((a.lon - b.lon) * {_COSLAT!r}) * ((a.lon - b.lon) * {_COSLAT!r})
          ) < {GEO_RADIUS_KM}
    """,
    doc=(
        "Spatial radius self-join (all customer pairs within "
        f"{GEO_RADIUS_KM} km) via GRID-CELL bucketing: each point lands "
        "in a radius-sized cell, the LEFT side explodes to its 3×3 "
        "neighbor cells, candidates meet through an EQUI-join on the "
        "(cell_y, cell_x) int pair, and the exact equirectangular "
        "distance verifies the survivors. The oracle is the O(n²) "
        "theta-join — hash-equality proves the bucketing loses no pair "
        "(the 3×3 neighborhood is a superset of the radius ball by "
        "construction). At 100 TB the candidate set is O(n · density), "
        "the shuffle key is two ints, and hot urban cells are exactly "
        "the AQE skew-split case proven in test_plan_quality."
    ),
    tags=("spatial", "join", "customer"),
)
def spatial_radius_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (
            F.lit(GEO_LAT_BASE) + F.lit(GEO_LAT_STEP) * (F.col("c_custkey") % GEO_LAT_MOD)
        ).alias("lat"),
        (
            F.lit(GEO_LON_BASE) + F.lit(GEO_LON_STEP) * (F.col("c_custkey") % GEO_LON_MOD)
        ).alias("lon"),
    ).withColumns(
        {
            "cy": F.floor(F.col("lat") / F.lit(CELL_H)),
            "cx": F.floor(F.col("lon") / F.lit(CELL_W)),
        }
    )
    # Left side visits its 9 neighbor cells; right side stays home.
    off = F.expr("explode(array(-1, 0, 1))")
    left = (
        pts.select("c_custkey", "lat", "lon", "cy", "cx", off.alias("dy"))
        .select("c_custkey", "lat", "lon", "cy", "cx", "dy", off.alias("dx"))
        .select(
            F.col("c_custkey").alias("a_cust"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            (F.col("cy") + F.col("dy")).alias("jy"),
            (F.col("cx") + F.col("dx")).alias("jx"),
        )
    )
    right = pts.select(
        F.col("c_custkey").alias("b_cust"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.col("cy").alias("jy"),
        F.col("cx").alias("jx"),
    )
    cand = left.join(right, ["jy", "jx"], "inner").where(F.col("a_cust") < F.col("b_cust"))
    dlat = F.col("a_lat") - F.col("b_lat")
    dlon = (F.col("a_lon") - F.col("b_lon")) * F.lit(_COSLAT)
    dist = F.lit(GEO_KM_PER_DEG) * F.sqrt(dlat * dlat + dlon * dlon)
    return cand.select("a_cust", "b_cust", dist.alias("dist_km")).where(
        F.col("dist_km") < GEO_RADIUS_KM
    )


# --------------------------------------------------------------------------
# Point-in-polygon (exact-integer ray casting)
# --------------------------------------------------------------------------

# deliberately NON-convex polygon, integer vertices on the 100x100 grid
_PIP_POLY = [(10, 10), (90, 20), (70, 60), (50, 40), (20, 80)]
_PIP_EDGES = [
    (_PIP_POLY[i] + _PIP_POLY[(i + 1) % len(_PIP_POLY)])
    for i in range(len(_PIP_POLY))
]


def _pip_edges_sql() -> str:
    return ", ".join(f"({x1}, {y1}, {x2}, {y2})" for x1, y1, x2, y2 in _PIP_EDGES)


@register(
    "spatial_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             CAST(event_id % 100 AS BIGINT) AS px,
             CAST(user_id % 100 AS BIGINT) AS py
      FROM events
    ),
    edges(x1, y1, x2, y2) AS (VALUES {_pip_edges_sql()}),
    crossings AS (
      SELECT p.event_id, p.px, p.py,
             CAST(COUNT(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                  AND ((p.px - e.x1) * (e.y2 - e.y1)
                       - (e.x2 - e.x1) * (p.py - e.y1))
                      * (CASE WHEN e.y2 > e.y1 THEN 1 ELSE -1 END) < 0
                  THEN 1 END) AS BIGINT) AS n_cross
      FROM pts p CROSS JOIN edges e
      GROUP BY p.event_id, p.px, p.py
    )
    SELECT event_id, px, py,
           CAST(n_cross % 2 AS BIGINT) AS inside
    FROM crossings
    """,
    doc=(
        "Point-in-polygon containment by ray casting against a "
        "non-convex polygon — the geofencing primitive behind "
        "region-tagging and coverage joins. The crossing test is the "
        "EXACT-INTEGER cross-multiplied form (no division, no "
        "floats), so edge-grazing points classify identically on "
        "both engines; the strict-> half-open rule handles vertices. "
        "The 5-edge polygon is a broadcast literal exploded against "
        "the point stream — one narrow pass, a per-point counter, "
        "parity bit. At scale the polygon table broadcasts and a "
        "bbox prefilter (spatial_radius_join_grid's cells) prunes "
        "points before the exact test."
    ),
    tags=("spatial", "geofence", "events"),
)
def spatial_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 100).cast("long").alias("px"),
        (F.col("user_id") % 100).cast("long").alias("py"),
    )
    edge_arr = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for x1, y1, x2, y2 in _PIP_EDGES
        ]
    )
    e = ev.select("event_id", "px", "py", F.explode(edge_arr).alias("e"))
    straddles = (F.col("e.y1") > F.col("py")) != (F.col("e.y2") > F.col("py"))
    d = (F.col("px") - F.col("e.x1")) * (F.col("e.y2") - F.col("e.y1")) - (
        F.col("e.x2") - F.col("e.x1")
    ) * (F.col("py") - F.col("e.y1"))
    sgn = F.when(F.col("e.y2") > F.col("e.y1"), 1).otherwise(-1)
    crossing = straddles & ((d * sgn) < 0)
    return (
        e.groupBy("event_id", "px", "py")
        .agg(F.count(F.when(crossing, 1)).alias("n_cross"))
        .select(
            "event_id",
            "px",
            "py",
            (F.col("n_cross") % 2).cast("long").alias("inside"),
        )
    )


# ---------------------------------------------------------------------------
# Geohash encoding (closed-form bit interleave, no float subdivision loop)
# ---------------------------------------------------------------------------

_GH_BITS = 20  # per dimension -> 40 bits -> 8 base32 chars
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_interleave_terms(lon_col: str, lat_col: str) -> str:
    """SQL for the 40-bit geohash integer: even bit positions take lon
    bits, odd take lat (geohash convention), from the top of each
    dimension's 20-bit normalized fraction."""
    terms = []
    for k in range(_GH_BITS):
        lon_bit = f"(({lon_col} >> {_GH_BITS - 1 - k}) & 1)"
        lat_bit = f"(({lat_col} >> {_GH_BITS - 1 - k}) & 1)"
        terms.append(f"{lon_bit} * {1 << (39 - 2 * k)}")
        terms.append(f"{lat_bit} * {1 << (38 - 2 * k)}")
    return " + ".join(terms)


def _gh_chars_sql(bits_col: str) -> str:
    parts = [
        f"substr('{_GH_ALPHABET}', CAST(({bits_col} >> {35 - 5 * j}) & 31 "
        f"AS INTEGER) + 1, 1)"
        for j in range(8)
    ]
    return " || ".join(parts)


def _geohash_oracle() -> str:
    from dmi_ingestor_spark.queries.ingestion import _SQL_GRID

    scale = 1 << _GH_BITS
    return (
        "WITH grid AS (" + _SQL_GRID + "),\n"
        "fr AS (\n"
        "  SELECT DISTINCT CAST(y AS DOUBLE) AS y, CAST(x AS DOUBLE) AS x,\n"
        f"    CAST(FLOOR((x + 180.0) / 360.0 * {scale}) AS BIGINT) AS lonf,\n"
        f"    CAST(FLOOR((y + 90.0) / 180.0 * {scale}) AS BIGINT) AS latf\n"
        "  FROM grid\n"
        "),\n"
        "bits AS (\n"
        f"  SELECT y, x, CAST({_gh_interleave_terms('lonf', 'latf')} AS BIGINT) AS b\n"
        "  FROM fr\n"
        ")\n"
        f"SELECT {_gh_chars_sql('b')} AS geohash8,\n"
        "       CAST(COUNT(*) AS BIGINT) AS n_cells,\n"
        "       MIN(y) AS min_y, MAX(y) AS max_y,\n"
        "       MIN(x) AS min_x, MAX(x) AS max_x\n"
        "FROM bits GROUP BY 1 ORDER BY 1"
    )


@register(
    "spatial_geohash_cells",
    oracle=_geohash_oracle(),
    doc=(
        "Geohash-8 encoding of the ingest grid, closed form: the "
        "standard binary-subdivision geohash equals the bit-interleave "
        "of each dimension's normalized 20-bit fraction (even bits "
        "lon, odd lat), so the encode is pure integer shift/mask "
        "arithmetic + a base-32 lookup — no float subdivision loop, "
        "whole-stage codegen, bit-identical across engines. The "
        "spatial-indexing key for cell joins and prefix-range pruning "
        "(a shared geohash prefix IS spatial proximity), complementing "
        "the Morton z-order layout key (layout_zorder_buckets) and the "
        "grid-cell radius join."
    ),
    tags=("spatial", "indexing", "scale"),
)
def spatial_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dmi_ingestor_spark.queries.ingestion import _spark_grid

    g = _spark_grid(spark).select("y", "x").distinct()
    lonf = F.floor((F.col("x") + 180.0) / 360.0 * (1 << _GH_BITS)).cast(
        "long"
    )
    latf = F.floor((F.col("y") + 90.0) / 180.0 * (1 << _GH_BITS)).cast(
        "long"
    )
    fr = g.select("y", "x", lonf.alias("lonf"), latf.alias("latf"))
    bits = fr.withColumn(
        "b", F.expr(_gh_interleave_terms("lonf", "latf")).cast("long")
    )
    gh = F.expr(_gh_chars_sql("b"))
    return (
        bits.withColumn("geohash8", gh)
        .groupBy("geohash8")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        )
        .orderBy("geohash8")
    )

# --------------------------------------------------------------------------
# Inverse-distance-weighted interpolation (station -> target regridding)
# --------------------------------------------------------------------------

_IDW_RADIUS_KM = 40.0
_IDW_CELL_H = _IDW_RADIUS_KM / GEO_KM_PER_DEG
_IDW_CELL_W = _IDW_RADIUS_KM / (GEO_KM_PER_DEG * _COSLAT)


@register(
    "spatial_idw_interpolation",
    oracle=f"""
    WITH stations AS (
      SELECT s_suppkey,
             CAST({GEO_LAT_BASE} AS DOUBLE)
               + CAST({GEO_LAT_STEP} AS DOUBLE) * (s_suppkey % {GEO_LAT_MOD}) AS lat,
             CAST({GEO_LON_BASE} AS DOUBLE)
               + CAST({GEO_LON_STEP} AS DOUBLE) * (s_suppkey % {GEO_LON_MOD}) AS lon,
             CAST(round(s_acctbal * 100) AS BIGINT) AS v_cents
      FROM supplier
    ),
    targets AS (
      SELECT c_custkey,
             CAST({GEO_LAT_BASE} AS DOUBLE)
               + CAST({GEO_LAT_STEP} AS DOUBLE) * (c_custkey % {GEO_LAT_MOD})
               + CAST({GEO_LAT_STEP / 2!r} AS DOUBLE) AS lat,
             CAST({GEO_LON_BASE} AS DOUBLE)
               + CAST({GEO_LON_STEP} AS DOUBLE) * (c_custkey % {GEO_LON_MOD})
               + CAST({GEO_LON_STEP / 2!r} AS DOUBLE) AS lon
      FROM customer
    ),
    cand AS (
      SELECT t.c_custkey, s.s_suppkey, s.v_cents,
             ({GEO_KM_PER_DEG} * (t.lat - s.lat))
               * ({GEO_KM_PER_DEG} * (t.lat - s.lat))
             + ({GEO_KM_PER_DEG} * ((t.lon - s.lon) * {_COSLAT!r}))
               * ({GEO_KM_PER_DEG} * ((t.lon - s.lon) * {_COSLAT!r})) AS d2
      FROM targets t JOIN stations s ON TRUE
    ),
    hits AS (
      SELECT c_custkey, s_suppkey,
             1.0 / d2 AS w,
             (1.0 / d2) * CAST(v_cents AS DOUBLE) AS wv
      FROM cand
      WHERE d2 < {_IDW_RADIUS_KM * _IDW_RADIUS_KM!r}
    )
    SELECT c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_stations,
           list_reduce(list(wv ORDER BY s_suppkey), (a, b) -> a + b)
             / list_reduce(list(w ORDER BY s_suppkey), (a, b) -> a + b)
             AS idw_cents
    FROM hits
    GROUP BY c_custkey
    """,
    doc=(
        "Inverse-distance-weighted (Shepard 1968, p=2) interpolation of "
        "station observations onto a target lattice — the regridding "
        "step a weather pipeline runs after ingesting point obs (the "
        "reference's cubes are exactly such regridded fields). Stations "
        "are suppliers on the deterministic Denmark lattice carrying "
        "s_acctbal cents as the observed value; targets are customers "
        "offset half a lattice step (so no station coincides with a "
        "target and 1/d² is always finite). Scale shape: targets join "
        "stations through the same radius-sized 3×3 grid-cell equi-join "
        "as spatial_radius_join_grid — candidates are O(n·density), "
        "never the n² of the oracle's brute-force theta-join — and each "
        "target folds its weights in s_suppkey order (F.aggregate / "
        "list_reduce), so the float Σwv/Σw is bit-identical across "
        "engines. The weight kernel (squared equirectangular km) is "
        "-,*,+ on shared doubles: no libm in the row path."
    ),
    tags=("spatial", "join", "interpolation", "scale"),
)
def spatial_idw_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    stations = s.select(
        "s_suppkey",
        (
            F.lit(GEO_LAT_BASE)
            + F.lit(GEO_LAT_STEP) * (F.col("s_suppkey") % GEO_LAT_MOD)
        ).alias("lat"),
        (
            F.lit(GEO_LON_BASE)
            + F.lit(GEO_LON_STEP) * (F.col("s_suppkey") % GEO_LON_MOD)
        ).alias("lon"),
        F.round(F.col("s_acctbal") * 100).cast("long").alias("v_cents"),
    )
    targets = c.select(
        "c_custkey",
        (
            F.lit(GEO_LAT_BASE)
            + F.lit(GEO_LAT_STEP) * (F.col("c_custkey") % GEO_LAT_MOD)
            + F.lit(GEO_LAT_STEP / 2)
        ).alias("lat"),
        (
            F.lit(GEO_LON_BASE)
            + F.lit(GEO_LON_STEP) * (F.col("c_custkey") % GEO_LON_MOD)
            + F.lit(GEO_LON_STEP / 2)
        ).alias("lon"),
    )
    # Station side explodes to its 3x3 neighbor cells; targets stay home.
    off = F.expr("explode(array(-1, 0, 1))")
    s_cells = (
        stations.withColumns(
            {
                "cy": F.floor(F.col("lat") / F.lit(_IDW_CELL_H)),
                "cx": F.floor(F.col("lon") / F.lit(_IDW_CELL_W)),
            }
        )
        .select("s_suppkey", "lat", "lon", "v_cents", "cy", "cx", off.alias("dy"))
        .select("s_suppkey", "lat", "lon", "v_cents", "cy", "cx", "dy", off.alias("dx"))
        .select(
            F.col("s_suppkey"),
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            "v_cents",
            (F.col("cy") + F.col("dy")).alias("jy"),
            (F.col("cx") + F.col("dx")).alias("jx"),
        )
    )
    t_cells = targets.select(
        "c_custkey",
        F.col("lat").alias("t_lat"),
        F.col("lon").alias("t_lon"),
        F.floor(F.col("lat") / F.lit(_IDW_CELL_H)).alias("jy"),
        F.floor(F.col("lon") / F.lit(_IDW_CELL_W)).alias("jx"),
    )
    dlat = F.lit(GEO_KM_PER_DEG) * (F.col("t_lat") - F.col("s_lat"))
    dlon = F.lit(GEO_KM_PER_DEG) * (
        (F.col("t_lon") - F.col("s_lon")) * F.lit(_COSLAT)
    )
    d2 = dlat * dlat + dlon * dlon
    hits = (
        t_cells.join(s_cells, ["jy", "jx"], "inner")
        .withColumn("d2", d2)
        .where(F.col("d2") < F.lit(_IDW_RADIUS_KM * _IDW_RADIUS_KM))
        .select(
            "c_custkey",
            "s_suppkey",
            (F.lit(1.0) / F.col("d2")).alias("w"),
            ((F.lit(1.0) / F.col("d2")) * F.col("v_cents").cast("double")).alias(
                "wv"
            ),
        )
    )
    packed = hits.groupBy("c_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_stations"),
        F.array_sort(F.collect_list(F.struct("s_suppkey", "w", "wv"))).alias("s"),
    )
    fold = lambda fld: F.aggregate(  # noqa: E731
        F.col("s"), F.lit(0.0), lambda acc, e: acc + e[fld]
    )
    return packed.select(
        "c_custkey",
        "n_stations",
        (fold("wv") / fold("w")).alias("idw_cents"),
    )


# ---------------------------------------------------------------------------
# Trajectory path statistics (telemetry / GPS-track analytics)
# ---------------------------------------------------------------------------

# Integer lattice coordinates keyed off event_id (fixtures carry no
# lat/lon): staying in INTEGER grid units end to end makes every step
# distance exact — no trig, no doubles, hash-green by construction.
_TRAJ_LAT_MOD = 97
_TRAJ_LON_MOD = 83
_TRAJ_JUMP_D2 = 4000  # squared-grid-units threshold: a "teleport" jump


@register(
    "spatial_trajectory_path_stats",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             CAST(event_id % {_TRAJ_LAT_MOD} AS BIGINT) AS iy,
             CAST(event_id % {_TRAJ_LON_MOD} AS BIGINT) AS ix
      FROM events
    ),
    steps AS (
      SELECT user_id,
             iy - LAG(iy) OVER w AS dy,
             ix - LAG(ix) OVER w AS dx
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    d AS (
      SELECT user_id, dy * dy + dx * dx AS d2
      FROM steps WHERE dy IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_steps,
           CAST(SUM(d2) AS BIGINT) AS total_d2,
           CAST(MAX(d2) AS BIGINT) AS max_d2,
           CAST(SUM(CASE WHEN d2 > {_TRAJ_JUMP_D2} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_jumps
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc=(
        "Per-entity trajectory statistics — the GPS-track / telemetry "
        "shape (total path length, largest hop, teleport-jump count "
        "for fraud/sensor-glitch detection): events become lattice "
        "points, consecutive-step deltas come from LAG over "
        "(PARTITION BY user_id ORDER BY ts), and everything reduces "
        "to one keyed aggregate. The window is PARTITIONED — each "
        "user's track sorts locally after one hash shuffle on "
        "user_id, the scalable sessionization pattern (never a "
        "global sort). Squared distances on integer grid coordinates "
        "keep the whole computation exact. At 100 TB: one shuffle, "
        "one agg; skewed mega-users are the known hazard and would "
        "take the same salting treatment as any hot key."
    ),
    tags=("spatial", "trajectory", "events"),
)
def spatial_trajectory_path_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pts = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_id") % _TRAJ_LAT_MOD).cast("long").alias("iy"),
        (F.col("event_id") % _TRAJ_LON_MOD).cast("long").alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id",
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
    ).filter(F.col("dy").isNotNull())
    d = steps.select(
        "user_id",
        (F.col("dy") * F.col("dy") + F.col("dx") * F.col("dx")).alias("d2"),
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.sum("d2").cast("long").alias("total_d2"),
            F.max("d2").cast("long").alias("max_d2"),
            F.sum((F.col("d2") > _TRAJ_JUMP_D2).cast("long"))
            .cast("long")
            .alias("n_jumps"),
        )
        .orderBy("user_id")
    )
