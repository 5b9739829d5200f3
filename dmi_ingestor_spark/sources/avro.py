"""Pure-Python Avro Object Container File codec (subset).

Spark ships Avro as an external module that is NOT deployed in this
environment (`spark.read.format("avro")` raises), yet Avro is the
interchange format half the streaming/CDC world emits (Kafka topics,
Debezium change feeds, data-vendor drops). Implemented straight from
the public Apache Avro 1.11 specification — the subset flat
row-oriented feeds use:

* binary encoding: zigzag-varint longs, little-endian IEEE doubles,
  length-prefixed UTF-8 strings, 1-byte booleans, and 2-branch
  ``["null", T]`` unions (branch index varint, then the value);
* Object Container File framing: ``Obj\\x01`` magic, a metadata map
  (``avro.schema`` JSON + ``avro.codec``), a 16-byte sync marker,
  then blocks of ``(row count, byte size, payload, sync)``;
* codecs: ``null`` (raw) and ``deflate`` (raw zlib stream, -15 wbits,
  per spec).

Same policy as ``netcdf3.py`` / ``hdf5.py`` / ``grib2.py``: the writer
exists so the reader's paths are exercised end to end without the
java package; at scale containers ride a binary DataFrame column into
``mapInPandas`` and decode with per-file parallelism.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"
# The spec requires a 16-byte sync marker; ANY value is legal. A fixed
# constant keeps output byte-deterministic (no randomness in encoders).
SYNC = bytes(range(0xA0, 0xB0))

_PRIMS = ("long", "double", "string", "boolean")


class AvroError(ValueError):
    pass


# -- binary primitives -----------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        if pos >= len(buf):
            raise AvroError("truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out += data


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise AvroError("bad bytes length")
    return buf[pos : pos + n], pos + n


def _field_type(t) -> tuple[str, bool]:
    """(primitive, nullable) for a field type that is either a
    primitive name or the 2-branch union ["null", primitive]."""
    if isinstance(t, str):
        if t not in _PRIMS:
            raise AvroError(f"unsupported type {t!r}")
        return t, False
    if (
        isinstance(t, list)
        and len(t) == 2
        and t[0] == "null"
        and isinstance(t[1], str)
        and t[1] in _PRIMS
    ):
        return t[1], True
    raise AvroError(f"unsupported type {t!r}")


def _write_value(out: bytearray, prim: str, v) -> None:
    if prim == "long":
        _write_long(out, int(v))
    elif prim == "double":
        out += struct.pack("<d", float(v))
    elif prim == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif prim == "boolean":
        out.append(1 if v else 0)


def _read_value(buf: bytes, pos: int, prim: str):
    if prim == "long":
        return _read_long(buf, pos)
    if prim == "double":
        if pos + 8 > len(buf):
            raise AvroError("truncated double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if prim == "string":
        raw, pos = _read_bytes(buf, pos)
        return raw.decode("utf-8"), pos
    if prim == "boolean":
        if pos >= len(buf):
            raise AvroError("truncated boolean")
        return bool(buf[pos]), pos + 1
    raise AvroError(f"unsupported type {prim!r}")


# -- container -------------------------------------------------------------


def encode_avro_container(
    name: str,
    fields: list[tuple[str, object]],
    rows: list[dict],
    *,
    codec: str = "null",
    block_rows: int = 1000,
) -> bytes:
    """Encode ``rows`` (dicts) as an Object Container File. ``fields``
    is ``[(field_name, type), ...]`` with type a primitive name or
    ``["null", primitive]``."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": fn, "type": ft} for fn, ft in fields],
    }
    out = bytearray()
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k in sorted(meta):
        _write_bytes(out, k.encode())
        _write_bytes(out, meta[k])
    _write_long(out, 0)  # end of metadata map
    out += SYNC

    parsed = [(fn, *_field_type(ft)) for fn, ft in fields]
    for i in range(0, len(rows), block_rows):
        chunk = rows[i : i + block_rows]
        body = bytearray()
        for r in chunk:
            for fn, prim, nullable in parsed:
                v = r.get(fn)
                if nullable:
                    if v is None:
                        _write_long(body, 0)
                        continue
                    _write_long(body, 1)
                elif v is None:
                    raise AvroError(f"null in non-nullable field {fn!r}")
                _write_value(body, prim, v)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw stream per spec
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out += payload
        out += SYNC
    return bytes(out)


def parse_avro_container(payload: bytes) -> tuple[dict, list[dict]]:
    """Decode an Object Container File -> (schema dict, rows)."""
    if payload[:4] != MAGIC:
        raise AvroError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(payload, pos)
        if n == 0:
            break
        if n < 0:  # negative count prefixes a byte size (spec map form)
            _, pos = _read_long(payload, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(payload, pos)
            v, pos = _read_bytes(payload, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = payload[pos : pos + 16]
    pos += 16
    parsed = [
        (f["name"], *_field_type(f["type"])) for f in schema["fields"]
    ]
    rows: list[dict] = []
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        size, pos = _read_long(payload, pos)
        body = payload[pos : pos + size]
        pos += size
        if payload[pos : pos + 16] != sync:
            raise AvroError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        for _ in range(count):
            row = {}
            for fn, prim, nullable in parsed:
                if nullable:
                    idx, bpos = _read_long(body, bpos)
                    if idx == 0:
                        row[fn] = None
                        continue
                row[fn], bpos = _read_value(body, bpos, prim)
            rows.append(row)
        if bpos != len(body):
            raise AvroError("trailing bytes in block")
    return schema, rows
