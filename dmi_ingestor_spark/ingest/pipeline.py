"""End-to-end ingestion: fetch → decode → reproject → partitioned write →
manifest (SURVEY.md §7 M2 — the reference's full capability, Spark-native).

Reference pipeline being re-expressed (``dmi_ingestor/ingestor.py``):
fetch per parameter (:157-197) → xarray decode (:200) → conditional
LCC→WGS84 reprojection (:201-202) → temp NetCDF → COG (:203-206) → one
GeoTIFF per timestep uploaded under {collection}/{parameter}/{time}.tif
(:207-218) → forecasts.json manifest (:219-227) → cleanup (:228-233).

Spark mapping (SURVEY.md §3):

* band-per-timestep files  → ``partitionBy(collection, parameter,
  time_str)`` parquet layout — the same object-store layout, atomic;
* delete-then-write        → dynamic partition overwrite: only
  partitions present in the NEW data are replaced, so a failed fetch
  leaves the old forecast intact (keep-last-good, :192-199) *and* the
  replace is per-partition atomic where the reference races (:199);
* manifest                 → A1 aggregation + single JSON per
  (collection, parameter) — tiny by construction, coalesce(1) is safe
  here and only here (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dmi_ingestor_spark.functions.projection import lcc_to_wgs84
from dmi_ingestor_spark.sources.cube_format import decode_cube
from dmi_ingestor_spark.sources.http_edr import (
    IngestConfig,
    Transport,
    fetch_cubes,
)

GRID_SCHEMA = StructType(
    [
        StructField("collection", StringType()),
        StructField("parameter", StringType()),
        StructField("time_s", LongType()),  # epoch seconds
        StructField("y", DoubleType()),
        StructField("x", DoubleType()),
        StructField("value", DoubleType()),
    ]
)


def decode_to_grid(fetched: DataFrame) -> DataFrame:
    """S2/U2: payload blobs → long-form grid rows via mapInPandas.

    One input row (a whole cube) explodes into time×y×x rows — the
    iterator-of-batches shape lets a single task stream multiple cubes
    without materializing more than one at a time. Failed fetches
    (payload NULL) are dropped here, and so are payloads that FAIL TO
    DECODE (corrupt/truncated bytes) — a bad cube must quarantine its
    parameter, never crash the job (the reference's per-parameter
    try/except, ingestor.py:221-227). ``run_ingest`` detects the
    decode-failed parameters (zero surviving rows) BEFORE any
    destructive write, so their previous forecasts stay intact
    (keep-last-good).
    """

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for _, row in pdf.iterrows():
                if row["payload"] is None:
                    continue
                try:
                    cube = decode_cube(bytes(row["payload"]))
                except Exception:  # noqa: BLE001 — quarantine, don't crash
                    continue
                nt, ny, nx = cube.values.shape
                times = np.repeat(np.asarray(cube.times, dtype="int64"), ny * nx)
                ys = np.tile(np.repeat(np.asarray(cube.ys), nx), nt)
                xs = np.tile(np.asarray(cube.xs), nt * ny)
                yield pd.DataFrame(
                    {
                        "collection": row["collection"],
                        "parameter": row["parameter"],
                        "time_s": times,
                        "y": ys,
                        "x": xs,
                        "value": cube.values.reshape(-1),
                    }
                )

    return fetched.mapInPandas(_explode, GRID_SCHEMA)


def with_wgs84(grid: DataFrame, collection_is_lambert: bool) -> DataFrame:
    """P3 branch + U1: harmonie_* grids run the LCC→WGS84 pandas UDF;
    crs84 grids pass coordinates through (ingestor.py:170-173,201-202)."""
    if collection_is_lambert:
        ll = lcc_to_wgs84(F.col("x"), F.col("y"))
        return grid.withColumn("lon", ll["lon"]).withColumn("lat", ll["lat"])
    return grid.withColumn("lon", F.col("x")).withColumn("lat", F.col("y"))


def with_time_str(grid: DataFrame) -> DataFrame:
    """F1: the reference's yyyymmddTHHMMSS partition key (ingestor.py:104)."""
    return grid.withColumn(
        "time_str",
        F.date_format(F.timestamp_seconds(F.col("time_s")), "yyyyMMdd'T'HHmmss"),
    )


@dataclass
class IngestResult:
    out_dir: str
    n_rows: int
    n_partitions_written: int
    failed_parameters: list[str]
    manifest_paths: list[str]
    tif_paths: list[str] | None = None


def run_ingest(
    spark: SparkSession,
    config: IngestConfig,
    out_dir: str,
    transport: Transport | None = None,
    public_base_url: str = "https://bucket.example",
    export_tifs: bool = False,
) -> IngestResult:
    """The full reference pipeline, one Spark job graph.

    Writes ``{out_dir}/grid/collection=…/parameter=…/time_str=…/*.parquet``
    with dynamic partition overwrite and one
    ``{out_dir}/manifests/{collection}/{parameter}/forecasts.json`` per
    parameter (same key→URL shape as ingestor.py:219-227).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    fetched = fetch_cubes(spark, config, transport).cache()
    failed = [
        r["parameter"]
        for r in fetched.filter(F.col("error").isNotNull())
        .select("parameter")
        .collect()
    ]

    grid = with_time_str(
        with_wgs84(decode_to_grid(fetched), config.crs == "native")
    )
    grid_path = os.path.join(out_dir, "grid")
    ok_parameters = [p for p in config.parameters if p not in failed]
    if ok_parameters:
        # Decode validation BEFORE anything destructive: a parameter whose
        # payload fetched but produced no decodable rows (corrupt bytes)
        # joins the failed list, so the stale-leaf delete below never
        # touches its previous forecast. One cheap distinct over the
        # cached fetch results; decode re-runs at write time anyway.
        decoded = {
            r["parameter"]
            for r in grid.select("parameter").distinct().collect()
        }
        decode_failed = sorted(p for p in ok_parameters if p not in decoded)
        failed += decode_failed
        ok_parameters = [p for p in ok_parameters if p in decoded]
    if not ok_parameters:
        # every fetch failed: write nothing, delete nothing — the whole
        # previous forecast stays intact (ingestor.py:192-199)
        fetched.unpersist()
        n_existing = 0
        if os.path.isdir(grid_path):
            existing = spark.read.parquet(grid_path)
            n_existing = existing.count()
        return IngestResult(
            out_dir=out_dir,
            n_rows=n_existing,
            n_partitions_written=0,
            failed_parameters=failed,
            manifest_paths=[],
        )

    # S7 retention semantics (delete_outdated_forecasts, ingestor.py:67-73,
    # :199): a *successful* fetch replaces the parameter's entire previous
    # forecast — including timesteps the new run no longer covers — while
    # a failed fetch leaves its prefix untouched (keep-last-good, :192-199).
    # Order matters: the reference deletes BEFORE uploading (ingestor.py:199),
    # so a decode/upload failure destroys the previous forecast. Here the
    # write runs FIRST (dynamic partition overwrite replaces only the
    # time_str leaves present in the new data, each leaf atomically); only
    # after it succeeds are the stale leaves — old time_strs the new run no
    # longer covers — deleted, by diffing the pre-write partition listing
    # against the new data's partitions. A failure anywhere before the
    # diff leaves every previous forecast readable. Deletes go through the
    # Hadoop FileSystem API (ingest/fs.py), so the same path works on
    # file://, hdfs:// and s3a://; on a table format (Iceberg/Delta) this
    # whole block becomes a single REPLACE WHERE.
    from dmi_ingestor_spark.ingest.fs import fs_delete, fs_list_subdirs

    ok_prefixes = {
        parameter: os.path.join(
            grid_path, f"collection={config.collection}", f"parameter={parameter}"
        )
        for parameter in ok_parameters
    }
    old_leaves = {
        parameter: set(fs_list_subdirs(spark, prefix))
        for parameter, prefix in ok_prefixes.items()
    }
    (
        grid.repartition("collection", "parameter", "time_str")
        .write.mode("overwrite")
        .partitionBy("collection", "parameter", "time_str")
        .parquet(grid_path)
    )
    # Partitions actually produced by THIS run: decode is re-run on the
    # cached fetch results (cheap vs a full-table re-read, deterministic),
    # aggregated down to the distinct partition keys.
    new_part_rows = (
        grid.select("parameter", "time_str").distinct().collect()
    )
    new_leaves: dict[str, set[str]] = {p: set() for p in ok_parameters}
    for r in new_part_rows:
        new_leaves.setdefault(r["parameter"], set()).add(f"time_str={r['time_str']}")
    for parameter, prefix in ok_prefixes.items():
        for stale in sorted(old_leaves[parameter] - new_leaves[parameter]):
            fs_delete(spark, os.path.join(prefix, stale))

    written = spark.read.parquet(grid_path)
    new_parts = (
        written.filter(
            (F.col("collection") == config.collection)
            & F.col("parameter").isin(ok_parameters)
        )
        .select("collection", "parameter", "time_str")
        .distinct()
    )
    manifest_rows = (
        new_parts.withColumn(
            "url",
            F.concat_ws(
                "/",
                F.lit(public_base_url),
                "collection",
                "parameter",
                F.concat(F.col("time_str"), F.lit(".tif")),
            ),
        )
        .groupBy("collection", "parameter")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("time_str", "url")))
            ).alias("manifest")
        )
        .collect()
    )
    manifest_paths = []
    for r in manifest_rows:
        mdir = os.path.join(out_dir, "manifests", r["collection"], r["parameter"])
        os.makedirs(mdir, exist_ok=True)
        mpath = os.path.join(mdir, "forecasts.json")
        with open(mpath, "w") as fh:
            json.dump(dict(r["manifest"]), fh, indent=4, sort_keys=True)
        manifest_paths.append(mpath)

    # Counts are scoped to THIS run (current collection + successful
    # parameters) — a pre-existing table must not inflate "written" stats.
    this_run = written.filter(
        (F.col("collection") == config.collection)
        & F.col("parameter").isin(ok_parameters)
    )
    stats = this_run.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("collection", "parameter", "time_str").alias("n_parts"),
    ).collect()[0]
    n_rows, n_parts = stats["n_rows"], stats["n_parts"]

    # S4 optional export: the reference's actual output artifact — one
    # COG-structured GeoTIFF per timestep (ingestor.py:76-80,207-218) —
    # written by the grouped-applyInPandas raster writer over the rows
    # just ingested. Pure opt-in: the parquet table remains the engine's
    # native format (SURVEY.md §2.1 S4).
    tif_paths: list[str] | None = None
    if export_tifs:
        from dmi_ingestor_spark.operators.raster import rasterize_timesteps

        tif_manifest = rasterize_timesteps(
            this_run.select("parameter", "time_str", "y", "x", "value"),
            os.path.join(out_dir, "tif", config.collection),
        ).collect()
        tif_paths = sorted(r["path"] for r in tif_manifest)

    fetched.unpersist()
    return IngestResult(
        out_dir=out_dir,
        n_rows=n_rows,
        n_partitions_written=n_parts,
        failed_parameters=failed,
        manifest_paths=manifest_paths,
        tif_paths=tif_paths,
    )
