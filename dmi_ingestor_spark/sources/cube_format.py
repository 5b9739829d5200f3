"""Forecast-cube payload codec (SURVEY.md S2).

The reference decodes DMI NetCDF bytes with xarray
(``dmi_ingestor/ingestor.py:200``). xarray/netCDF4 are not installed in
this container, so the decoder dispatches:

* real NetCDF magic (``CDF\\x01``/``\\x89HDF``) → xarray when importable,
  else the pure-Python parsers (``netcdf3.py`` for classic, ``hdf5.py``
  for the NetCDF-4/HDF5 container);
* the self-contained ``FCUBE1`` test format → pure-python decode.

``FCUBE1`` is a deterministic stand-in with the exact logical shape of
the DMI payload (dims ``time, y, x``; one named float variable; a time
axis of epoch-second timestamps): 6-byte magic, big-endian u32 JSON
header length, JSON header, raw little-endian float64 values in
C-order. The pipeline's distributed plumbing is identical for both.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"FCUBE1"


@dataclass
class Cube:
    """In-memory forecast cube: the engine's analogue of the reference's
    xarray.Dataset (dims (time, y, x), one variable)."""

    parameter: str
    times: list[int]  # epoch seconds
    ys: list[float]
    xs: list[float]
    values: np.ndarray  # shape (time, y, x) float64


def encode_cube(cube: Cube) -> bytes:
    header = json.dumps(
        {
            "parameter": cube.parameter,
            "times": cube.times,
            "ys": cube.ys,
            "xs": cube.xs,
        }
    ).encode()
    body = np.ascontiguousarray(cube.values, dtype="<f8").tobytes()
    return MAGIC + struct.pack(">I", len(header)) + header + body


def decode_cube(payload: bytes) -> Cube:
    if payload[:6] == MAGIC:
        (hlen,) = struct.unpack(">I", payload[6:10])
        header = json.loads(payload[10 : 10 + hlen])
        nt, ny, nx = len(header["times"]), len(header["ys"]), len(header["xs"])
        values = np.frombuffer(payload[10 + hlen :], dtype="<f8").reshape(nt, ny, nx)
        return Cube(
            parameter=header["parameter"],
            times=header["times"],
            ys=header["ys"],
            xs=header["xs"],
            values=values,
        )
    if payload[:3] == b"CDF" or payload[:4] == b"\x89HDF":
        return _decode_netcdf(payload)
    if payload[:4] == b"GRIB":
        from dmi_ingestor_spark.sources.grib2 import parse_grib2_cube

        d = parse_grib2_cube(payload)
        return Cube(
            parameter=d["parameter"],
            times=d["times"],
            ys=d["ys"],
            xs=d["xs"],
            values=d["values"],
        )
    from dmi_ingestor_spark.sources.coveragejson import (
        is_coveragejson,
        parse_coveragejson,
    )

    if is_coveragejson(payload):
        d = parse_coveragejson(payload)
        return Cube(
            parameter=d["parameter"],
            times=d["times"],
            ys=d["ys"],
            xs=d["xs"],
            values=d["values"],
        )
    raise ValueError(f"unknown cube payload magic: {payload[:6]!r}")


def _decode_netcdf(payload: bytes) -> Cube:
    """Real-NetCDF path (the reference's ingestor.py:200).

    xarray when installed; otherwise pure-Python parsers cover BOTH
    on-disk formats the DMI API can return — classic CDF-1/2 via
    ``sources/netcdf3.py`` and NetCDF-4 (HDF5 container) via
    ``sources/hdf5.py`` — so the real-NetCDF branch runs (and is tested
    end to end) even in environments without the netCDF C stack.
    """
    try:
        import io

        import xarray as xr
    except ImportError:
        if payload[:3] == b"CDF":
            from dmi_ingestor_spark.sources.netcdf3 import parse_netcdf3

            d = parse_netcdf3(payload)
        else:
            from dmi_ingestor_spark.sources.hdf5 import parse_hdf5_cube

            d = parse_hdf5_cube(payload)
        return Cube(
            parameter=d["parameter"],
            times=d["times"],
            ys=d["ys"],
            xs=d["xs"],
            values=d["values"],
        )
    ds = xr.open_dataset(io.BytesIO(payload))  # pragma: no cover
    var = next(iter(ds.data_vars))  # pragma: no cover
    da = ds[var]  # pragma: no cover
    y_dim = "y" if "y" in da.dims else "lat"  # pragma: no cover
    x_dim = "x" if "x" in da.dims else "lon"  # pragma: no cover
    return Cube(  # pragma: no cover
        parameter=var,
        times=[int(t) // 10**9 for t in ds.time.values.astype("datetime64[ns]").astype("int64")],
        ys=[float(v) for v in da[y_dim].values],
        xs=[float(v) for v in da[x_dim].values],
        values=np.asarray(da.transpose("time", y_dim, x_dim).values, dtype=np.float64),
    )


def synthetic_cube(
    parameter: str,
    n_times: int = 4,
    n_y: int = 8,
    n_x: int = 8,
    t0: int = 1_767_225_600,  # 2026-01-01T00:00:00Z
    lambert: bool = False,
) -> Cube:
    """Deterministic test cube. value = t*10000 + iy*100 + ix (exact in
    float64) so any downstream aggregate is integer-exact and
    DuckDB-checkable. Lambert grids use metre coordinates near the
    projection origin; crs84 grids use degrees."""
    times = [t0 + 3600 * t for t in range(n_times)]
    if lambert:
        ys = [float(-20_000 + 5_000 * i) for i in range(n_y)]
        xs = [float(240_000 + 5_000 * i) for i in range(n_x)]
    else:
        ys = [55.0 + 0.1 * i for i in range(n_y)]
        xs = [11.0 + 0.1 * i for i in range(n_x)]
    vals = np.zeros((n_times, n_y, n_x))
    for t in range(n_times):
        for iy in range(n_y):
            for ix in range(n_x):
                vals[t, iy, ix] = t * 10_000 + iy * 100 + ix
    return Cube(parameter=parameter, times=times, ys=ys, xs=xs, values=vals)
