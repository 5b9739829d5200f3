"""Pure-Python MessagePack codec, implemented from the public spec.

MessagePack (msgpack.org/spec) is the compact binary sibling of JSON
that event collectors, Fluentd/Fluent Bit pipelines and RPC layers
(msgpack-rpc) emit; no msgpack library is deployed in this
environment, so the wire format is implemented directly:

* every type family the spec defines for tree-shaped data: nil,
  bool, all nine int widths (positive/negative fixint, (u)int8/16/
  32/64), float32/float64, str (fixstr, str8/16/32), bin 8/16/32,
  array (fixarray, array16/32) and map (fixmap, map16/32);
* the encoder always picks the SMALLEST representation that fits
  (the spec's recommendation) and iterates maps in insertion order,
  so output bytes are deterministic;
* record streams use the standard framing: one top-level map per
  record, concatenated back to back (what `msgpack.Unpacker` /
  Fluentd forward protocol consume).

Same policy as ``avro.py`` / ``netcdf3.py``: the writer exists so the
reader's paths are exercised end to end; at scale payloads ride a
binary DataFrame column into ``mapInPandas`` and decode with per-file
parallelism (see ``ingest_msgpack_stream``).
"""

from __future__ import annotations

import struct


class MsgpackError(ValueError):
    pass


# -- encoder ----------------------------------------------------------------


def _encode_int(out: bytearray, n: int) -> None:
    if 0 <= n <= 0x7F:
        out.append(n)  # positive fixint
    elif -32 <= n < 0:
        out.append(0x100 + n)  # negative fixint (0xe0..0xff)
    elif 0 < n:
        if n <= 0xFF:
            out += b"\xcc" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xcd" + n.to_bytes(2, "big")
        elif n <= 0xFFFFFFFF:
            out += b"\xce" + n.to_bytes(4, "big")
        elif n <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + n.to_bytes(8, "big")
        else:
            raise MsgpackError(f"int too large: {n}")
    else:
        if n >= -0x80:
            out += b"\xd0" + n.to_bytes(1, "big", signed=True)
        elif n >= -0x8000:
            out += b"\xd1" + n.to_bytes(2, "big", signed=True)
        elif n >= -0x80000000:
            out += b"\xd2" + n.to_bytes(4, "big", signed=True)
        elif n >= -0x8000000000000000:
            out += b"\xd3" + n.to_bytes(8, "big", signed=True)
        else:
            raise MsgpackError(f"int too small: {n}")


def _encode_len(out: bytearray, n: int, fix: int | None, fix_max: int,
                tags: bytes) -> None:
    """Length header: fixformat if it fits, else 8/16/32-bit tagged."""
    if fix is not None and n <= fix_max:
        out.append(fix | n)
    elif len(tags) == 3 and n <= 0xFF:
        out += tags[0:1] + n.to_bytes(1, "big")
    elif n <= 0xFFFF:
        out += tags[-2:-1] + n.to_bytes(2, "big")
    elif n <= 0xFFFFFFFF:
        out += tags[-1:] + n.to_bytes(4, "big")
    else:
        raise MsgpackError(f"length too large: {n}")


def _encode(out: bytearray, v) -> None:
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        _encode_int(out, v)
    elif isinstance(v, float):
        out += b"\xcb" + struct.pack(">d", v)
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        _encode_len(out, len(raw), 0xA0, 31, b"\xd9\xda\xdb")
        out += raw
    elif isinstance(v, (bytes, bytearray)):
        _encode_len(out, len(v), None, 0, b"\xc4\xc5\xc6")
        out += bytes(v)
    elif isinstance(v, (list, tuple)):
        _encode_len(out, len(v), 0x90, 15, b"\xdc\xdd")
        for item in v:
            _encode(out, item)
    elif isinstance(v, dict):
        _encode_len(out, len(v), 0x80, 15, b"\xde\xdf")
        for k, item in v.items():
            _encode(out, k)
            _encode(out, item)
    else:
        raise MsgpackError(f"unsupported type: {type(v).__name__}")


def encode_msgpack(v) -> bytes:
    out = bytearray()
    _encode(out, v)
    return bytes(out)


def encode_record_stream(records: list[dict]) -> bytes:
    """Concatenated top-level maps — the standard stream framing."""
    out = bytearray()
    for r in records:
        _encode(out, r)
    return bytes(out)


# -- decoder ----------------------------------------------------------------

_FIXED = {
    0xC0: (0, lambda b: None),
    0xC2: (0, lambda b: False),
    0xC3: (0, lambda b: True),
    0xCA: (4, lambda b: struct.unpack(">f", b)[0]),
    0xCB: (8, lambda b: struct.unpack(">d", b)[0]),
    0xCC: (1, lambda b: b[0]),
    0xCD: (2, lambda b: int.from_bytes(b, "big")),
    0xCE: (4, lambda b: int.from_bytes(b, "big")),
    0xCF: (8, lambda b: int.from_bytes(b, "big")),
    0xD0: (1, lambda b: int.from_bytes(b, "big", signed=True)),
    0xD1: (2, lambda b: int.from_bytes(b, "big", signed=True)),
    0xD2: (4, lambda b: int.from_bytes(b, "big", signed=True)),
    0xD3: (8, lambda b: int.from_bytes(b, "big", signed=True)),
}


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise MsgpackError(f"truncated at byte {pos}: need {n} more")


def _read_len(buf: bytes, pos: int, width: int) -> tuple[int, int]:
    _need(buf, pos, width)
    return int.from_bytes(buf[pos : pos + width], "big"), pos + width


def _decode(buf: bytes, pos: int):
    _need(buf, pos, 1)
    tag = buf[pos]
    pos += 1
    if tag <= 0x7F:  # positive fixint
        return tag, pos
    if tag >= 0xE0:  # negative fixint
        return tag - 0x100, pos
    if 0x80 <= tag <= 0x8F:  # fixmap
        return _decode_map(buf, pos, tag & 0x0F)
    if 0x90 <= tag <= 0x9F:  # fixarray
        return _decode_array(buf, pos, tag & 0x0F)
    if 0xA0 <= tag <= 0xBF:  # fixstr
        n = tag & 0x1F
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if tag in _FIXED:
        width, fn = _FIXED[tag]
        _need(buf, pos, width)
        return fn(buf[pos : pos + width]), pos + width
    if tag in (0xD9, 0xDA, 0xDB):  # str8/16/32
        n, pos = _read_len(buf, pos, 1 << (tag - 0xD9))
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if tag in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        n, pos = _read_len(buf, pos, 1 << (tag - 0xC4))
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]), pos + n
    if tag in (0xDC, 0xDD):  # array16/32
        n, pos = _read_len(buf, pos, 2 << (tag - 0xDC))
        return _decode_array(buf, pos, n)
    if tag in (0xDE, 0xDF):  # map16/32
        n, pos = _read_len(buf, pos, 2 << (tag - 0xDE))
        return _decode_map(buf, pos, n)
    raise MsgpackError(f"unsupported tag 0x{tag:02x} at byte {pos - 1}")


def _decode_array(buf: bytes, pos: int, n: int):
    items = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        items.append(v)
    return items, pos


def _decode_map(buf: bytes, pos: int, n: int):
    d = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        d[k] = v
    return d, pos


def decode_msgpack(buf: bytes):
    v, pos = _decode(buf, 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes")
    return v


def parse_record_stream(payload: bytes) -> list[dict]:
    """Decode a concatenated-maps stream back into records."""
    records, pos = [], 0
    while pos < len(payload):
        v, pos = _decode(payload, pos)
        if not isinstance(v, dict):
            raise MsgpackError(f"stream element is {type(v).__name__}, not map")
        records.append(v)
    return records
