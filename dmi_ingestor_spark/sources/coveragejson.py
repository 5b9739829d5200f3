"""CoverageJSON forecast-cube codec (SURVEY.md §2.1 S2, format family).

The reference requests ``f=NetCDF`` from the DMI EDR API
(``dmi_ingestor/ingestor.py:151``), but OGC-EDR's default interchange
format — and the one the API advertises first — is CoverageJSON
(OGC 21-069r2, a W3C/OGC community standard). A user switching between
formats should not need a different pipeline, so the cube decoder
dispatches on the payload: JSON object with ``"type": "Coverage"`` →
this module; NetCDF magics → the binary codecs.

Scope: the "Grid" domainType with t/y/x (or t/lat/lon) axes and one
NdArray range in ["t", "y", "x"] axisOrder — the shape EDR weather
cubes use. Values decode to the same in-memory ``Cube`` the other
codecs produce, so everything downstream (reproject, band split,
manifest, GeoTIFF export) is format-agnostic.
"""

from __future__ import annotations

import datetime as _dt
import json

import numpy as np


def is_coveragejson(payload: bytes) -> bool:
    head = payload[:256].lstrip()
    return head.startswith(b"{") and b'"Coverage"' in payload[:2048]


def _axis_values(axis: dict) -> list:
    if "values" in axis:
        return axis["values"]
    # compact regular axis: start/stop/num
    start, stop, num = axis["start"], axis["stop"], axis["num"]
    if num == 1:
        return [start]
    step = (stop - start) / (num - 1)
    return [start + i * step for i in range(num)]


def _time_to_epoch(values: list) -> list[int]:
    out = []
    for v in values:
        if isinstance(v, (int, float)):
            out.append(int(v))
            continue
        s = str(v).removesuffix("Z").replace("+00:00", "")
        for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
            try:
                t = _dt.datetime.strptime(s, fmt).replace(
                    tzinfo=_dt.timezone.utc
                )
                out.append(int(t.timestamp()))
                break
            except ValueError:
                continue
        else:
            raise ValueError(f"unparseable CoverageJSON time value {v!r}")
    return out


def parse_coveragejson(payload: bytes) -> dict:
    """Decode a CoverageJSON Grid coverage into the standard cube dict
    ``{parameter, times, ys, xs, values}`` (values (t, y, x) float64,
    nulls → NaN)."""
    doc = json.loads(payload.decode("utf-8"))
    if doc.get("type") != "Coverage":
        raise ValueError(
            f"not a CoverageJSON Coverage: type={doc.get('type')!r}"
        )
    domain = doc["domain"]
    axes = domain["axes"]
    y_name = "y" if "y" in axes else "lat"
    x_name = "x" if "x" in axes else "lon"
    times = _time_to_epoch(_axis_values(axes["t"]))
    ys = [float(v) for v in _axis_values(axes[y_name])]
    xs = [float(v) for v in _axis_values(axes[x_name])]

    ranges = doc["ranges"]
    if len(ranges) != 1:
        raise ValueError(
            f"expected exactly one range, found {sorted(ranges)}"
        )
    parameter, nd = next(iter(ranges.items()))
    if nd.get("type") != "NdArray":
        raise ValueError(f"unsupported range type {nd.get('type')!r}")
    order = nd.get("axisNames", ["t", y_name, x_name])
    shape = nd.get("shape", [len(times), len(ys), len(xs)])
    vals = np.array(
        [np.nan if v is None else float(v) for v in nd["values"]],
        dtype="f8",
    ).reshape(shape)
    # transpose whatever axis order the payload used into (t, y, x)
    want = ["t", y_name, x_name]
    perm = [order.index(a) for a in want]
    vals = np.ascontiguousarray(np.transpose(vals, perm))
    if vals.shape != (len(times), len(ys), len(xs)):
        raise ValueError(
            f"range shape {vals.shape} does not match axes "
            f"({len(times)}, {len(ys)}, {len(xs)})"
        )
    return {
        "parameter": parameter,
        "times": times,
        "ys": ys,
        "xs": xs,
        "values": vals,
    }


def encode_coveragejson(
    parameter: str,
    times: list[int],
    ys: list[float],
    xs: list[float],
    values: np.ndarray,
) -> bytes:
    """Encode the standard cube as a CoverageJSON Grid coverage (ISO
    time strings, explicit axis values, one NdArray range in t/y/x
    order) — fixture-grade but spec-shaped, so the parser's production
    paths are what real API payloads exercise."""
    iso = [
        _dt.datetime.fromtimestamp(t, _dt.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        for t in times
    ]
    flat = [
        None if np.isnan(v) else float(v)
        for v in np.asarray(values, dtype="f8").ravel()
    ]
    doc = {
        "type": "Coverage",
        "domain": {
            "type": "Domain",
            "domainType": "Grid",
            "axes": {
                "t": {"values": iso},
                "y": {"values": list(ys)},
                "x": {"values": list(xs)},
            },
            "referencing": [],
        },
        "parameters": {parameter: {"type": "Parameter"}},
        "ranges": {
            parameter: {
                "type": "NdArray",
                "dataType": "float",
                "axisNames": ["t", "y", "x"],
                "shape": [len(times), len(ys), len(xs)],
                "values": flat,
            }
        },
    }
    return json.dumps(doc).encode("utf-8")
