"""GRIB2 decode path (the third payload format DMI's EDR API serves).

Pure-Python codec from the public WMO FM 92 spec (simple packing,
regular lat/lon grid) — mirrors tests/test_netcdf3.py / test_hdf5.py /
test_coveragejson.py so every API format flows through run_ingest."""

from __future__ import annotations

import numpy as np
import pytest

from dmi_ingestor_spark.sources.cube_format import decode_cube
from dmi_ingestor_spark.sources.grib2 import (
    Grib2Error,
    encode_grib2_cube,
    parse_grib2_cube,
)


def _cube_arrays(nt=3, ny=4, nx=5):
    times = [1_767_225_600 + 3600 * t for t in range(nt)]
    ys = [55.0 + 0.1 * i for i in range(ny)]
    xs = [11.0 + 0.1 * i for i in range(nx)]
    # eighth-steps are exact on the dec_scale=3 grid
    values = (
        np.arange(nt * ny * nx, dtype="f8").reshape(nt, ny, nx) * 0.125 - 3.0
    )
    return times, ys, xs, values


def test_grib2_roundtrip():
    times, ys, xs, values = _cube_arrays()
    payload = encode_grib2_cube((0, 0), times, ys, xs, values)
    assert payload[:4] == b"GRIB"
    d = parse_grib2_cube(payload)
    assert d["times"] == times
    assert d["ys"] == pytest.approx(ys) and d["xs"] == pytest.approx(xs)
    assert np.array_equal(d["values"], values)


def test_grib2_negative_and_constant_fields():
    times, ys, xs, _ = _cube_arrays(2, 3, 3)
    v = np.full((2, 3, 3), -1.5)
    d = parse_grib2_cube(encode_grib2_cube((2, 5), times, ys, xs, v))
    assert np.array_equal(d["values"], v)
    assert d["parameter"] == "p2-5"


def test_grib2_message_order_independent():
    """Messages may arrive time-shuffled; the cube sorts by valid time."""
    times, ys, xs, values = _cube_arrays(3, 2, 2)
    p0 = encode_grib2_cube((0, 0), times, ys, xs, values)
    # split the three messages and re-concatenate reversed
    msgs, off = [], 0
    while off < len(p0):
        ln = int.from_bytes(p0[off + 8 : off + 16], "big")
        msgs.append(p0[off : off + ln])
        off += ln
    d = parse_grib2_cube(b"".join(reversed(msgs)))
    assert d["times"] == times
    assert np.array_equal(d["values"], values)


def test_malformed_grib2_raises():
    with pytest.raises(Grib2Error):
        parse_grib2_cube(b"GRIB" + b"\0" * 32)


def test_decode_cube_dispatches_on_grib_magic():
    times, ys, xs, values = _cube_arrays()
    cube = decode_cube(encode_grib2_cube((0, 0), times, ys, xs, values))
    assert cube.parameter == "p0-0"
    assert cube.times == times
    assert np.array_equal(cube.values, values)


def test_pipeline_ingests_grib2_payloads(spark, tmp_path):
    from dmi_ingestor_spark.ingest.pipeline import run_ingest
    from dmi_ingestor_spark.sources.http_edr import IngestConfig

    times, ys, xs, values = _cube_arrays(4, 8, 8)

    def transport(url: str) -> bytes:
        return encode_grib2_cube((0, 0), times, ys, xs, values)

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


@pytest.mark.parametrize(
    "packing", ["complex", "complex_diff1", "complex_diff2"]
)
def test_grib2_complex_packing_roundtrip(packing):
    times, ys, xs, values = _cube_arrays()
    payload = encode_grib2_cube(
        (0, 4), times, ys, xs, values, packing=packing
    )
    cube = parse_grib2_cube(payload)
    np.testing.assert_allclose(cube["values"], values, atol=1e-9)
    assert cube["times"] == times


@pytest.mark.parametrize(
    "packing", ["complex", "complex_diff1", "complex_diff2"]
)
def test_grib2_complex_edge_fields(packing):
    times, ys, xs, _ = _cube_arrays()
    nt, ny, nx = len(times), len(ys), len(xs)
    # constant field (0-bit groups), descending field (negative gmin),
    # and a noisy field spanning sign changes
    rng = np.random.RandomState(11)
    fields = [
        np.full((nt, ny, nx), -7.25),
        np.round(np.linspace(40, -40, nt * ny * nx).reshape(nt, ny, nx) * 8)
        / 8,
        np.round(rng.uniform(-20, 20, size=(nt, ny, nx)) * 8) / 8,
    ]
    for f in fields:
        payload = encode_grib2_cube(
            (0, 4), times, ys, xs, f, dec_scale=3, packing=packing
        )
        np.testing.assert_allclose(
            parse_grib2_cube(payload)["values"], f, atol=1e-9
        )


def test_grib2_complex_packs_smooth_fields_smaller_than_simple():
    times, ys, xs, _ = _cube_arrays(nt=2, ny=24, nx=32)
    nt, ny, nx = 2, 24, 32
    smooth = (
        np.round(
            np.fromfunction(
                lambda t, j, i: 100 * np.sin(i / 8) + 40 * np.cos(j / 5) + t,
                (nt, ny, nx),
            )
            * 8
        )
        / 8
    )
    simple = encode_grib2_cube(
        (0, 4), times, ys, xs, smooth, nbits=21, dec_scale=3
    )
    diff2 = encode_grib2_cube(
        (0, 4), times, ys, xs, smooth, dec_scale=3, packing="complex_diff2"
    )
    assert len(diff2) < len(simple)
    np.testing.assert_allclose(
        parse_grib2_cube(diff2)["values"], smooth, atol=1e-9
    )


def test_grib2_complex_rejects_unknown_packing():
    times, ys, xs, values = _cube_arrays()
    with pytest.raises(ValueError, match="unknown packing"):
        encode_grib2_cube((0, 4), times, ys, xs, values, packing="png")
