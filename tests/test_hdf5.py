"""NetCDF-4/HDF5 decode path (SURVEY.md §2.1 S2, ref ingestor.py:200).

The container has no xarray/netCDF4/h5py, so these tests exercise the
pure-Python HDF5 codec (``sources/hdf5.py``) and prove that genuine
``\\x89HDF`` payloads — the format current DMI collections return —
flow through decode_cube and the full ingest pipeline, including the
chunked-layout B-tree walk and the deflate/shuffle filter undo."""

from __future__ import annotations

import numpy as np
import pytest

from dmi_ingestor_spark.sources.cube_format import decode_cube
from dmi_ingestor_spark.sources.hdf5 import (
    Hdf5Error,
    encode_hdf5_cube,
    parse_hdf5_cube,
)


def _cube_arrays(nt=3, ny=4, nx=5):
    times = [1_767_225_600 + 3600 * t for t in range(nt)]
    ys = [55.0 + 0.1 * i for i in range(ny)]
    xs = [11.0 + 0.1 * i for i in range(nx)]
    values = (
        np.arange(nt * ny * nx, dtype="f8").reshape(nt, ny, nx) * 0.5 - 3.0
    )
    return times, ys, xs, values


@pytest.mark.parametrize(
    "kw",
    [
        {"compress": False},
        {"compress": True},
        {"compress": True, "shuffle": True},
        {"compress": False, "chunk_t": 2},
        {"compress": True, "chunk_t": 3},
    ],
    ids=["raw", "deflate", "deflate+shuffle", "chunk2", "chunk3-deflate"],
)
def test_hdf5_roundtrip(kw):
    times, ys, xs, values = _cube_arrays()
    payload = encode_hdf5_cube("sea-mean-deviation", times, ys, xs, values, **kw)
    assert payload[:8] == b"\x89HDF\r\n\x1a\n"
    d = parse_hdf5_cube(payload)
    assert d["parameter"] == "sea-mean-deviation"
    assert d["times"] == times
    assert d["ys"] == ys and d["xs"] == xs
    assert np.array_equal(d["values"], values)


def test_hdf5_partial_trailing_chunk():
    """nt not divisible by chunk_t: the last chunk is padded on disk and
    must be cropped on read."""
    times, ys, xs, values = _cube_arrays(nt=5)
    payload = encode_hdf5_cube("tp", times, ys, xs, values, chunk_t=2)
    d = parse_hdf5_cube(payload)
    assert np.array_equal(d["values"], values)


def test_hdf5_time_units_scaling():
    """The time coordinate converts through its CF 'units' attribute."""
    times, ys, xs, values = _cube_arrays()
    payload = encode_hdf5_cube("t2m", times, ys, xs, values)
    d = parse_hdf5_cube(payload)
    assert d["times"] == times  # seconds-since-epoch base


def test_decode_cube_dispatches_on_hdf5_magic():
    times, ys, xs, values = _cube_arrays()
    cube = decode_cube(encode_hdf5_cube("t2m", times, ys, xs, values))
    assert cube.parameter == "t2m"
    assert cube.times == times
    assert cube.ys == ys and cube.xs == xs
    assert np.array_equal(cube.values, values)


def test_malformed_hdf5_raises():
    with pytest.raises(ValueError):
        parse_hdf5_cube(b"\x89HDF\r\n\x1a\n" + b"\0" * 64)
    with pytest.raises(Hdf5Error):
        parse_hdf5_cube(b"not hdf5 at all" + b"\0" * 64)


def test_pipeline_ingests_netcdf4_payloads(spark, tmp_path):
    """End-to-end S2: the HTTP transport returns REAL HDF5 bytes
    (chunked + deflate, like a libnetcdf-written forecast feed) and the
    pipeline decodes them into the same grid rows the FCUBE and
    classic-NetCDF paths produce."""
    from dmi_ingestor_spark.ingest.pipeline import run_ingest
    from dmi_ingestor_spark.sources.http_edr import IngestConfig

    times, ys, xs, values = _cube_arrays(4, 8, 8)

    def transport(url: str) -> bytes:
        parameter = url.split("parameter-name=")[1].split("&")[0]
        return encode_hdf5_cube(
            parameter, times, ys, xs, values, chunk_t=2, compress=True
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
