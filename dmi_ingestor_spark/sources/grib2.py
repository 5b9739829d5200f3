"""Pure-Python GRIB2 forecast-cube codec (SURVEY.md §2.1 S2, format family).

DMI's EDR API serves GRIB2 for several collections alongside NetCDF and
CoverageJSON (the reference requests only NetCDF — ``ingestor.py:151``);
with this module the engine decodes every payload format the API can
return. Implemented straight from the public WMO GRIB2 specification
(FM 92, Manual on Codes) — the subset regular weather fields use:

* section framing: Indicator (0) → Identification (1) → Grid
  Definition (3, template 3.0 regular lat/lon) → Product Definition
  (4, template 4.0 with hour/minute/second forecast offsets) → Data
  Representation (5, templates 5.0 simple packing, 5.2 complex
  packing with general group splitting, and 5.3 complex packing with
  first/second-order spatial differencing — the representation
  operational NWP output like HARMONIE/ERA5 actually uses) → Bitmap
  (6, indicator 255 = none) → Data (7, MSB-first packed integers;
  for 7.3 prefixed by the sign-magnitude extra descriptors holding
  the first undifferenced values and the overall difference minimum)
  → End ("7777");
* value decode ``(R + X * 2^E) / 10^D`` with GRIB's sign-magnitude
  int16 scale factors;
* one field per message; a multi-timestep cube is the standard
  concatenation of messages, assembled back into (time, y, x).

The writer emits the same subset so the bit-packing/scaling read paths
are exercised end to end without eccodes (not installable here), the
same policy as ``netcdf3.py`` / ``hdf5.py``.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"GRIB"


class Grib2Error(ValueError):
    pass


def _s16(value: int) -> int:
    """GRIB sign-magnitude int16 → Python int."""
    return -(value & 0x7FFF) if value & 0x8000 else value


def _pack_s16(value: int) -> int:
    return (0x8000 | (-value)) if value < 0 else value


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _parse_message(buf: bytes, off: int) -> tuple[dict, int]:
    if buf[off : off + 4] != MAGIC:
        raise Grib2Error(f"expected GRIB magic at offset {off}")
    edition = buf[off + 7]
    if edition != 2:
        raise Grib2Error(f"unsupported GRIB edition {edition}")
    total_len = int.from_bytes(buf[off + 8 : off + 16], "big")
    end = off + total_len
    if buf[end - 4 : end] != b"7777":
        raise Grib2Error("message missing 7777 trailer")

    pos = off + 16
    msg: dict = {}
    while pos < end - 4:
        sec_len = int.from_bytes(buf[pos : pos + 4], "big")
        sec_num = buf[pos + 4]
        body = buf[pos : pos + sec_len]  # 1-based spec octets = body[i-1]
        if sec_num == 1:
            year = int.from_bytes(body[12:14], "big")
            mo, dy, hh, mi, ss = body[14], body[15], body[16], body[17], body[18]
            import datetime as _dt

            msg["ref_time"] = int(
                _dt.datetime(
                    year, mo, dy, hh, mi, ss, tzinfo=_dt.timezone.utc
                ).timestamp()
            )
        elif sec_num == 3:
            template = int.from_bytes(body[12:14], "big")
            if template != 0:
                raise Grib2Error(f"unsupported grid template 3.{template}")
            msg["ni"] = int.from_bytes(body[30:34], "big")
            msg["nj"] = int.from_bytes(body[34:38], "big")
            msg["la1"] = int.from_bytes(body[46:50], "big", signed=True) / 1e6
            msg["lo1"] = int.from_bytes(body[50:54], "big", signed=True) / 1e6
            msg["di"] = int.from_bytes(body[63:67], "big") / 1e6
            msg["dj"] = int.from_bytes(body[67:71], "big") / 1e6
            msg["scan"] = body[71]
        elif sec_num == 4:
            template = int.from_bytes(body[7:9], "big")
            if template != 0:
                raise Grib2Error(f"unsupported product template 4.{template}")
            msg["param"] = (body[9], body[10])
            unit = body[17]
            value = int.from_bytes(body[18:22], "big")
            mult = {0: 60, 1: 3600, 2: 86400, 13: 1}.get(unit)
            if mult is None:
                raise Grib2Error(f"unsupported forecast time unit {unit}")
            msg["lead_s"] = value * mult
        elif sec_num == 5:
            template = int.from_bytes(body[9:11], "big")
            if template not in (0, 2, 3):
                raise Grib2Error(f"unsupported packing template 5.{template}")
            msg["template5"] = template
            msg["n_values"] = int.from_bytes(body[5:9], "big")
            msg["ref_value"] = struct.unpack(">f", body[11:15])[0]
            msg["bin_scale"] = _s16(int.from_bytes(body[15:17], "big"))
            msg["dec_scale"] = _s16(int.from_bytes(body[17:19], "big"))
            msg["nbits"] = body[19]
            if template in (2, 3):
                if body[21] != 1:
                    raise Grib2Error(
                        f"unsupported group splitting method {body[21]}"
                    )
                if body[22] != 0:
                    raise Grib2Error("missing-value management not supported")
                msg["n_groups"] = int.from_bytes(body[31:35], "big")
                msg["width_ref"] = body[35]
                msg["width_bits"] = body[36]
                msg["len_ref"] = int.from_bytes(body[37:41], "big")
                msg["len_inc"] = body[41]
                msg["len_last"] = int.from_bytes(body[42:46], "big")
                msg["len_bits"] = body[46]
            if template == 3:
                msg["sd_order"] = body[47]
                msg["sd_octets"] = body[48]
        elif sec_num == 6:
            if body[5] != 255:
                raise Grib2Error("bitmaps not supported (indicator != 255)")
        elif sec_num == 7:
            msg["packed"] = bytes(body[5:])
        pos += sec_len
    return msg, end


class _BitCursor:
    """MSB-first bit reader over a byte string (one continuous stream,
    as GRIB2 data sections are packed)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype="u1"))
        self.pos = 0

    def take(self, n: int, nbits: int) -> np.ndarray:
        if nbits == 0:
            return np.zeros(n, dtype="int64")
        end = self.pos + n * nbits
        if end > len(self.bits):
            raise Grib2Error("packed data exhausted")
        out = (
            self.bits[self.pos : end]
            .reshape(n, nbits)
            .dot(1 << np.arange(nbits - 1, -1, -1, dtype="int64"))
        )
        self.pos = end
        return out


def _s_octets(buf: bytes) -> int:
    """GRIB sign-magnitude big-endian integer of arbitrary width
    (leading bit = sign), used by the 7.3 extra descriptors."""
    v = int.from_bytes(buf, "big")
    sign_bit = 1 << (8 * len(buf) - 1)
    return -(v & (sign_bit - 1)) if v & sign_bit else v


def _pack_s_octets(value: int, width: int) -> bytes:
    sign_bit = 1 << (8 * width - 1)
    if value < 0:
        value = sign_bit | (-value)
    return int(value).to_bytes(width, "big")


def _unpack_complex(msg: dict) -> np.ndarray:
    """Decode templates 7.2 (complex packing) / 7.3 (+ spatial
    differencing): per-group references and widths reconstruct the
    non-negative deltas; for 7.3 the extra descriptors hold the first
    original value(s) and the overall minimum of the differences, and
    the field is rebuilt by the order-k cumulative recurrence."""
    n, ng = msg["n_values"], msg["n_groups"]
    r, e, d = msg["ref_value"], msg["bin_scale"], msg["dec_scale"]
    data = msg["packed"]
    order = msg.get("sd_order", 0)
    z: list[int] = []
    gmin = 0
    if order:
        ww = msg["sd_octets"]
        head = data[: ww * (order + 1)]
        z = [
            _s_octets(head[i * ww : (i + 1) * ww]) for i in range(order)
        ]
        gmin = _s_octets(head[order * ww : (order + 1) * ww])
        data = data[ww * (order + 1) :]
    cur = _BitCursor(data)
    grefs = cur.take(ng, msg["nbits"])
    widths = cur.take(ng, msg["width_bits"]) + msg["width_ref"]
    lens = cur.take(ng, msg["len_bits"]) * msg["len_inc"] + msg["len_ref"]
    lens[-1] = msg["len_last"]
    if int(lens.sum()) != n:
        raise Grib2Error(f"group lengths sum {int(lens.sum())} != {n}")
    ys = np.empty(n, dtype="int64")
    off = 0
    for g in range(ng):
        ln = int(lens[g])
        ys[off : off + ln] = grefs[g] + cur.take(ln, int(widths[g]))
        off += ln
    if order == 1:
        # stored: [pad, d_1, d_2, ...] with d_i = X_i - X_{i-1}
        xs = ys + gmin
        xs[0] = z[0]
        xs = np.cumsum(xs)
        return (r + xs.astype("f8") * (2.0**e)) / (10.0**d)
    if order == 2:
        # stored: [pad, pad, d2_2, ...] with d2_i = X_i - 2X_{i-1} + X_{i-2};
        # descriptors hold X_0, X_1 (the spec's "first values of the
        # original undifferenced data"), so rebuild first differences
        # D_i then X by two telescoping sums.
        xs = ys + gmin
        tail = xs[1:].copy()
        tail[0] = z[1] - z[0]
        d1 = np.cumsum(tail)
        xs = np.cumsum(np.concatenate(([z[0]], d1)))
        return (r + xs.astype("f8") * (2.0**e)) / (10.0**d)
    if order:
        raise Grib2Error(f"unsupported spatial differencing order {order}")
    return (r + ys.astype("f8") * (2.0**e)) / (10.0**d)


def _unpack_values(msg: dict) -> np.ndarray:
    if msg.get("template5", 0) in (2, 3):
        return _unpack_complex(msg)
    n, nbits = msg["n_values"], msg["nbits"]
    r, e, d = msg["ref_value"], msg["bin_scale"], msg["dec_scale"]
    if nbits == 0:
        xs = np.zeros(n, dtype="int64")
    else:
        bits = np.unpackbits(np.frombuffer(msg["packed"], dtype="u1"))
        if len(bits) < n * nbits:
            raise Grib2Error("packed data shorter than n_values * nbits")
        xs = (
            bits[: n * nbits]
            .reshape(n, nbits)
            .dot(1 << np.arange(nbits - 1, -1, -1, dtype="int64"))
        )
    return (r + xs.astype("f8") * (2.0**e)) / (10.0**d)


def parse_grib2_cube(payload: bytes) -> dict:
    """Decode concatenated GRIB2 messages (one per timestep, same
    parameter/grid) into the standard cube dict
    ``{parameter, times, ys, xs, values}``."""
    fields = []
    off = 0
    while off < len(payload):
        msg, off = _parse_message(payload, off)
        fields.append(msg)
    if not fields:
        raise Grib2Error("no GRIB2 messages in payload")
    f0 = fields[0]
    ni, nj = f0["ni"], f0["nj"]
    ys = [f0["la1"] + j * f0["dj"] for j in range(nj)]
    xs = [f0["lo1"] + i * f0["di"] for i in range(ni)]
    times, grids = [], []
    for m in fields:
        if (m["ni"], m["nj"], m["param"]) != (ni, nj, f0["param"]):
            raise Grib2Error("inconsistent grid/parameter across messages")
        times.append(m["ref_time"] + m["lead_s"])
        vals = _unpack_values(m)
        grid = vals.reshape(nj, ni)
        if m["scan"] & 0x40:  # +j scanning: row 0 = southernmost
            pass  # ys ascending already matches
        grids.append(grid)
    order = np.argsort(times, kind="stable")
    return {
        "parameter": f"p{f0['param'][0]}-{f0['param'][1]}",
        "times": [times[i] for i in order],
        "ys": ys,
        "xs": xs,
        "values": np.stack([grids[i] for i in order]).astype("f8"),
    }


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def _bits_for(v: int) -> int:
    return int(v).bit_length() if v > 0 else 0


def _uint_bits(vals: np.ndarray, nbits: int) -> np.ndarray:
    """MSB-first bit matrix (as a flat 0/1 array) for unsigned ints."""
    if nbits == 0 or len(vals) == 0:
        return np.zeros(0, dtype="u1")
    a = np.asarray(vals, dtype=">u8").reshape(-1, 1).view("u1").reshape(-1, 8)
    return np.unpackbits(a, axis=1)[:, -nbits:].ravel()


_CPLX_GROUP_LEN = 32  # fixed group length (last group ragged)
_CPLX_WW = 4  # octets per 7.3 extra descriptor value


def _encode_complex_field(
    scaled: np.ndarray, dec_scale: int, order: int
) -> tuple[bytes, bytes]:
    """Sections 5+7 bodies for complex packing (template 5.2/7.2,
    ``order=0``) or complex packing with spatial differencing
    (5.3/7.3, ``order`` 1 or 2). General group splitting with a fixed
    group length; one continuous bitstream of group references,
    width deltas and per-group values (group lengths use 0 bits — all
    groups equal the reference length, the last's true length is in
    octets 43-46, exactly the degenerate encoding the spec allows)."""
    x = np.asarray(scaled, dtype="int64").ravel()
    n = int(x.size)
    extra = b""
    if order:
        z = [int(v) for v in x[:order]]
        diffs = np.diff(x, n=order)
        gmin = int(diffs.min()) if diffs.size else 0
        y = np.zeros(n, dtype="int64")
        y[order:] = diffs - gmin
        ref_value = 0.0
        extra = b"".join(
            _pack_s_octets(v, _CPLX_WW) for v in [*z, gmin]
        )
    else:
        lo = int(x.min())
        ref_value = float(lo)
        if int(ref_value) != lo:
            raise ValueError("reference value not float-exact; reduce range")
        y = x - lo
    ng = (n + _CPLX_GROUP_LEN - 1) // _CPLX_GROUP_LEN
    groups = [
        y[g * _CPLX_GROUP_LEN : (g + 1) * _CPLX_GROUP_LEN] for g in range(ng)
    ]
    grefs = np.array([int(g.min()) for g in groups], dtype="int64")
    widths = np.array(
        [_bits_for(int((g - r).max())) for g, r in zip(groups, grefs)],
        dtype="int64",
    )
    nbits_ref = _bits_for(int(grefs.max())) if ng else 0
    wref = int(widths.min()) if ng else 0
    nbits_w = _bits_for(int((widths - wref).max())) if ng else 0
    len_last = n - (ng - 1) * _CPLX_GROUP_LEN if ng else 0

    stream = [
        _uint_bits(grefs, nbits_ref),
        _uint_bits(widths - wref, nbits_w),
        # group lengths: 0 bits (all = reference length)
    ]
    stream += [
        _uint_bits(g - r, int(w))
        for g, r, w in zip(groups, grefs, widths)
    ]
    packed = np.packbits(np.concatenate(stream)).tobytes() if ng else b""

    template = 3 if order else 2
    sec5 = (
        struct.pack(">I", n)
        + struct.pack(">H", template)
        + struct.pack(">f", ref_value)
        + struct.pack(">H", _pack_s16(0))  # binary scale 0
        + struct.pack(">H", _pack_s16(dec_scale))
        + bytes([nbits_ref, 0])  # bits per group reference, field type
        + bytes([1, 0])  # general group splitting, no missing values
        + struct.pack(">II", 0, 0)  # primary/secondary missing
        + struct.pack(">I", ng)
        + bytes([wref, nbits_w])
        + struct.pack(">I", _CPLX_GROUP_LEN)  # group length reference
        + bytes([1])  # length increment
        + struct.pack(">I", len_last)
        + bytes([0])  # bits for scaled group lengths: all equal ref
    )
    if order:
        sec5 += bytes([order, _CPLX_WW])
    return sec5, extra + packed


def encode_grib2_cube(
    parameter: tuple[int, int],
    times: list[int],
    ys: list[float],
    xs: list[float],
    values: np.ndarray,
    *,
    nbits: int = 16,
    dec_scale: int = 3,
    packing: str = "simple",
) -> bytes:
    """Encode a cube as concatenated GRIB2 messages (template 3.0 grid,
    4.0 product; data representation per ``packing``: "simple" =
    template 5.0, "complex" = 5.2 general group splitting,
    "complex_diff1"/"complex_diff2" = 5.3 with first/second-order
    spatial differencing — the representation HARMONIE/ERA5 GRIB2
    fields actually ship). Quantization: values round to
    10^-dec_scale — callers wanting exact round-trips should use
    values already on that grid."""
    import datetime as _dt

    if packing not in ("simple", "complex", "complex_diff1", "complex_diff2"):
        raise ValueError(f"unknown packing {packing!r}")

    nj, ni = len(ys), len(xs)
    out = bytearray()
    for t_idx, t_epoch in enumerate(times):
        field = np.asarray(values[t_idx], dtype="f8")
        scaled = np.round(field * (10.0**dec_scale)).astype("int64")
        ref = int(scaled.min())
        xs_int = (scaled - ref).astype("int64")
        if packing == "simple" and xs_int.max() >= (1 << nbits):
            raise ValueError("field range exceeds nbits capacity")
        ref_time = _dt.datetime.fromtimestamp(times[0], _dt.timezone.utc)
        lead_s = t_epoch - times[0]

        sec1 = (
            struct.pack(">HH", 0, 0)  # centre, subcentre
            + bytes([2, 1, 1])  # tables version, local version, sig of time
            + struct.pack(
                ">HBBBBB",
                ref_time.year,
                ref_time.month,
                ref_time.day,
                ref_time.hour,
                ref_time.minute,
                ref_time.second,
            )
            + bytes([0, 1])  # production status, data type (forecast)
        )
        sec3 = (
            bytes([0])  # source of grid definition
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])  # no optional list
            + struct.pack(">H", 0)  # template 3.0
            + bytes([6])  # earth shape
            + bytes(15)  # radius/major/minor scale factors + values (octets 16-30)
            + struct.pack(">II", ni, nj)
            + struct.pack(">II", 0, 0)  # basic angle / subdivision
            + struct.pack(">i", int(round(ys[0] * 1e6)))
            + struct.pack(">i", int(round(xs[0] * 1e6)))
            + bytes([0x30])  # resolution/component flags
            + struct.pack(">i", int(round(ys[-1] * 1e6)))
            + struct.pack(">i", int(round(xs[-1] * 1e6)))
            + struct.pack(
                ">I", int(round((xs[1] - xs[0]) * 1e6)) if ni > 1 else 0
            )
            + struct.pack(
                ">I", int(round((ys[1] - ys[0]) * 1e6)) if nj > 1 else 0
            )
            + bytes([0x40])  # scanning mode: +i, +j
        )
        sec4 = (
            struct.pack(">H", 0)  # no coords values
            + struct.pack(">H", 0)  # template 4.0
            + bytes([parameter[0], parameter[1]])
            + bytes([2, 0, 0])  # generating process info
            + struct.pack(">H", 0)  # hours of obs cutoff
            + bytes([0])  # minutes
            + bytes([13])  # time unit: seconds
            + struct.pack(">I", lead_s)
            + bytes([1, 0])  # first surface: type=ground, scale 0
            + struct.pack(">I", 0)  # first surface scaled value
            + bytes([255, 0])  # second surface: missing
            + struct.pack(">I", 0)
        )
        if packing == "simple":
            sec5 = (
                struct.pack(">I", ni * nj)
                + struct.pack(">H", 0)  # template 5.0
                + struct.pack(">f", float(ref))
                + struct.pack(">H", _pack_s16(0))  # binary scale 0
                + struct.pack(">H", _pack_s16(dec_scale))
                + bytes([nbits, 0])  # bits per value, original field type
            )
            bits = np.unpackbits(
                xs_int.reshape(-1, 1)
                .astype(">u8")
                .view("u1")
                .reshape(-1, 8),
                axis=1,
            )[:, -nbits:].ravel()
            sec7 = np.packbits(bits).tobytes()
        else:
            order = {"complex": 0, "complex_diff1": 1, "complex_diff2": 2}[
                packing
            ]
            sec5, sec7 = _encode_complex_field(scaled, dec_scale, order)
        sec6 = bytes([255])  # bitmap indicator: none

        body = (
            _section(1, sec1)
            + _section(3, sec3)
            + _section(4, sec4)
            + _section(5, sec5)
            + _section(6, sec6)
            + _section(7, sec7)
        )
        total = 16 + len(body) + 4
        out += MAGIC + bytes([0, 0, 0, 2]) + struct.pack(">Q", total)
        out += body + b"7777"
    return bytes(out)
