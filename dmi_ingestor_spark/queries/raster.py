"""Raster export queries (SURVEY.md §2 S4 + U3).

Reference parity: ``dmi_ingestor/ingestor.py:76-80`` (gdal_translate -of
COG per timestep) and ``:101-107,207-218`` (one .tif per timestep under
{collection}/{parameter}/). The distributed writer is
``operators/raster.rasterize_timesteps`` (grouped applyInPandas); this
module registers the oracle-checked manifest query over the synthetic
grid that ``queries/ingestion.py`` already standardizes on.

Oracle strategy: width/height/n_cells/px_sum are recomputed by DuckDB
from the same integer grid formula (independent of the writer), while
the artifact's n_bytes + sha256 come from a SINGLE-NODE reference
encode of each timestep done at plan-build time with pure numpy — the
driver row therefore asserts the distributed applyInPandas export is
byte-identical to the single-node reference implementation, which is
precisely the reference-parity claim S4 needs.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dmi_ingestor_spark.operators.raster import encode_geotiff, rasterize_timesteps
from dmi_ingestor_spark.queries.ingestion import _spark_grid, _SQL_GRID, NT, NY, NX
from dmi_ingestor_spark.registry import register

_PARAM = "sea-mean-deviation"


def _reference_artifacts() -> list[tuple[str, int, str]]:
    """(time_str, n_bytes, sha256) per timestep, single-node reference.

    Rebuilds each timestep's 2-D array straight from the synthetic-grid
    formula (value = t*10000 + iy*100 + ix, y = 55.0+0.1*iy ascending ⇒
    row 0 of the raster is iy = NY-1) and encodes it with the same
    pure-Python GeoTIFF writer on the driver — no Spark involved.
    """
    import datetime

    # Coordinates and geo-transform use the SAME float64 operation
    # sequence as the executor (operators/raster.rasterize_timesteps
    # derives dx/dy/x0/y0 from the coordinate values) — IEEE doubles are
    # deterministic, so byte-parity holds only if the arithmetic is
    # replicated, not just the mathematical values.
    ys = sorted((55.0 + 0.1 * iy for iy in range(NY)), reverse=True)
    xs = sorted(11.0 + 0.1 * ix for ix in range(NX))
    dy = ys[0] - ys[1]
    dx = xs[1] - xs[0]
    x0, y0 = xs[0] - dx / 2, ys[0] + dy / 2
    out = []
    for t in range(NT):
        arr = np.zeros((NY, NX), dtype="f8")
        for iy in range(NY):
            for ix in range(NX):
                arr[NY - 1 - iy, ix] = t * 10000 + iy * 100 + ix
        data = encode_geotiff(arr, x0, y0, dx, dy)
        ts = datetime.datetime.fromtimestamp(
            1_767_225_600 + 3600 * t, datetime.timezone.utc
        ).strftime("%Y%m%dT%H%M%S")
        out.append((ts, len(data), hashlib.sha256(data).hexdigest()))
    return out


def _expected_values_sql() -> str:
    rows = ",\n      ".join(
        f"('{ts}', {n}, '{h}')" for ts, n, h in _reference_artifacts()
    )
    return f"(VALUES\n      {rows}) AS exp(time_str, n_bytes, checksum)"


@register(
    "raster_export_manifest",
    oracle=f"""
    WITH grid AS ({_SQL_GRID}),
    agg AS (
      SELECT
        strftime(to_timestamp(time_s), '%Y%m%dT%H%M%S') AS time_str,
        CAST(COUNT(DISTINCT x) AS BIGINT) AS width,
        CAST(COUNT(DISTINCT y) AS BIGINT) AS height,
        CAST(SUM(value) AS DOUBLE) AS px_sum
      FROM grid GROUP BY time_str
    )
    SELECT
      '{_PARAM}' AS parameter,
      a.time_str,
      a.width,
      a.height,
      CAST(exp.n_bytes AS BIGINT) AS n_bytes,
      exp.checksum,
      a.px_sum
    FROM agg a JOIN {_expected_values_sql()} ON exp.time_str = a.time_str
    """,
    doc=(
        "S4/U3: per-timestep GeoTIFF export manifest. Spark side runs the "
        "grouped-applyInPandas raster writer (one COG-structured tiled "
        "float32 GeoTIFF per timestep, written to disk), decodes the "
        "written bytes back and reports (dims, n_bytes, sha256, pixel "
        "sum). DuckDB recomputes dims/px_sum from the grid formula and "
        "checks n_bytes/sha256 against a single-node reference encode — "
        "i.e. the distributed export is asserted byte-identical to the "
        "single-node reference implementation."
    ),
    tags=("ingest", "raster", "reference"),
)
def raster_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = (
        _spark_grid(spark)
        .withColumn("parameter", F.lit(_PARAM))
        .withColumn(
            "time_str",
            F.date_format(F.timestamp_seconds("time_s"), "yyyyMMdd'T'HHmmss"),
        )
    )
    out_dir = tempfile.mkdtemp(prefix="raster-export-")
    manifest = rasterize_timesteps(grid, out_dir)
    return manifest.select(
        "parameter", "time_str", "width", "height", "n_bytes", "checksum", "px_sum"
    )
