"""Real-NetCDF decode path (SURVEY.md §2.1 S2, ref ingestor.py:200).

The container has no xarray/netCDF4, so these tests exercise the
pure-Python classic-NetCDF3 codec (``sources/netcdf3.py``) and prove
that genuine ``CDF\\x01`` payloads — not just the FCUBE1 synthetic
codec — flow through decode_cube and the full ingest pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from dmi_ingestor_spark.sources.cube_format import decode_cube
from dmi_ingestor_spark.sources.netcdf3 import encode_netcdf3, parse_netcdf3


def _cube_arrays(nt=3, ny=4, nx=5):
    times = [1_767_225_600 + 3600 * t for t in range(nt)]
    ys = [55.0 + 0.1 * i for i in range(ny)]
    xs = [11.0 + 0.1 * i for i in range(nx)]
    values = (
        np.arange(nt * ny * nx, dtype="f8").reshape(nt, ny, nx) * 0.5 - 3.0
    )
    return times, ys, xs, values


@pytest.mark.parametrize("unlimited", [False, True])
def test_netcdf3_roundtrip(unlimited):
    times, ys, xs, values = _cube_arrays()
    payload = encode_netcdf3(
        "sea-mean-deviation", times, ys, xs, values, unlimited_time=unlimited
    )
    assert payload[:4] == b"CDF\x01"
    d = parse_netcdf3(payload)
    assert d["parameter"] == "sea-mean-deviation"
    assert d["times"] == times
    assert d["ys"] == ys and d["xs"] == xs
    assert np.array_equal(d["values"], values)


def test_netcdf3_latlon_dims():
    times, ys, xs, values = _cube_arrays(2, 3, 3)
    payload = encode_netcdf3(
        "tp", times, ys, xs, values, y_name="lat", x_name="lon"
    )
    d = parse_netcdf3(payload)
    assert d["ys"] == ys and d["xs"] == xs


def test_decode_cube_dispatches_on_cdf_magic():
    """decode_cube's CDF branch (the reference's real payload format)
    must produce the same Cube as the FCUBE synthetic path."""
    times, ys, xs, values = _cube_arrays()
    cube = decode_cube(encode_netcdf3("t2m", times, ys, xs, values))
    assert cube.parameter == "t2m"
    assert cube.times == times
    assert cube.ys == ys and cube.xs == xs
    assert np.array_equal(cube.values, values)


def test_malformed_netcdf4_raises():
    """HDF5-magic payloads now decode via sources/hdf5.py; a malformed
    one must still fail loudly, not produce garbage rows."""
    with pytest.raises(ValueError):
        decode_cube(b"\x89HDF\r\n\x1a\n" + b"\0" * 64)


def test_pipeline_ingests_real_netcdf_payloads(spark, tmp_path):
    """End-to-end S2: the HTTP transport returns REAL classic-NetCDF
    bytes (record layout, like a forecast feed) and the pipeline decodes
    them into the same grid rows the FCUBE path produces."""
    from dmi_ingestor_spark.ingest.pipeline import run_ingest
    from dmi_ingestor_spark.sources.http_edr import IngestConfig

    times, ys, xs, values = _cube_arrays(4, 8, 8)

    def transport(url: str) -> bytes:
        parameter = url.split("parameter-name=")[1].split("&")[0]
        return encode_netcdf3(
            parameter, times, ys, xs, values, unlimited_time=True
        )

    cfg = IngestConfig(collection="dkss_if", parameters=("sea-mean-deviation",))
    res = run_ingest(spark, cfg, str(tmp_path), transport)
    assert res.failed_parameters == []
    assert res.n_rows == 4 * 8 * 8

    import pyspark.sql.functions as F

    grid = spark.read.parquet(f"{tmp_path}/grid")
    got = grid.agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert got["n"] == values.size
    assert abs(got["s"] - float(values.sum())) < 1e-9
