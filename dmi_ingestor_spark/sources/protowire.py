"""Protocol Buffers wire format, implemented from the public spec.

The proto3 encoding (protobuf.dev/programming-guides/encoding) is the
other lingua franca of event transport next to Avro/MessagePack —
Kafka topics, gRPC payloads, OTLP telemetry. No protobuf library is
deployed in this environment (`import google` fails), so the wire
format is implemented directly:

* base-128 **varints** (little-endian groups of 7 bits, msb =
  continuation);
* **ZigZag** mapping for signed fields (sint32/sint64), so small
  negatives stay small on the wire;
* field keys ``(field_number << 3) | wire_type`` with wire types
  0 (varint), 1 (64-bit), 2 (length-delimited), 5 (32-bit);
* proto3 default-elision: fields equal to their default (0 / empty)
  are NOT serialized, and decoders must fill defaults back in;
* unknown-field skipping by wire type — the forward-compatibility
  contract that lets old readers process new writers' messages;
* stream framing: each message is length-prefixed with a varint (the
  ``writeDelimitedTo`` convention Kafka/Java producers use).

Same policy as ``msgpack.py``/``gorilla.py``: the writer exists so the
reader's paths are exercised end to end; at scale streams ride a
binary DataFrame column into ``mapInPandas`` and decode with
per-stream parallelism (see ``ingest_protobuf_delimited_stream``).
"""

from __future__ import annotations


class ProtoWireError(ValueError):
    pass


_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5


def encode_varint(n: int) -> bytes:
    if n < 0:
        raise ProtoWireError("varint must be non-negative (zigzag first)")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ProtoWireError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ProtoWireError("varint too long")


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _key(field: int, wtype: int) -> bytes:
    return encode_varint((field << 3) | wtype)


def encode_message(fields: list[tuple[int, str, object]]) -> bytes:
    """[(field_number, kind, value)] -> message bytes.

    kind: 'varint' (uint), 'sint' (zigzag varint), 'string', 'bytes'.
    proto3 default elision: 0 / '' / b'' values are skipped entirely.
    """
    out = bytearray()
    for field, kind, value in fields:
        if kind == "varint":
            if value:
                out += _key(field, _VARINT) + encode_varint(int(value))
        elif kind == "sint":
            if value:
                out += _key(field, _VARINT) + encode_varint(zigzag(int(value)))
        elif kind in ("string", "bytes"):
            raw = value.encode("utf-8") if kind == "string" else bytes(value)
            if raw:
                out += _key(field, _LEN) + encode_varint(len(raw)) + raw
        else:
            raise ProtoWireError(f"unsupported kind {kind!r}")
    return bytes(out)


def decode_message(data: bytes) -> dict[int, object]:
    """Message bytes -> {field_number: raw value}.

    Varint fields decode to their UNSIGNED value (callers unzigzag
    sint fields); length-delimited fields decode to bytes. Unknown
    wire types 1/5 are skipped per the spec. Later occurrences of a
    field overwrite earlier ones (the spec's last-one-wins rule)."""
    out: dict[int, object] = {}
    pos = 0
    while pos < len(data):
        key, pos = decode_varint(data, pos)
        field, wtype = key >> 3, key & 7
        if wtype == _VARINT:
            val, pos = decode_varint(data, pos)
            out[field] = val
        elif wtype == _LEN:
            ln, pos = decode_varint(data, pos)
            if pos + ln > len(data):
                raise ProtoWireError("truncated length-delimited field")
            out[field] = data[pos : pos + ln]
            pos += ln
        elif wtype == _I64:
            if pos + 8 > len(data):
                raise ProtoWireError("truncated fixed64")
            out[field] = data[pos : pos + 8]
            pos += 8
        elif wtype == _I32:
            if pos + 4 > len(data):
                raise ProtoWireError("truncated fixed32")
            out[field] = data[pos : pos + 4]
            pos += 4
        else:
            raise ProtoWireError(f"unsupported wire type {wtype}")
    return out


def encode_delimited_stream(messages: list[list[tuple[int, str, object]]]) -> bytes:
    """Length-prefixed concatenation (writeDelimitedTo framing)."""
    out = bytearray()
    for m in messages:
        raw = encode_message(m)
        out += encode_varint(len(raw)) + raw
    return bytes(out)


def decode_delimited_stream(data: bytes) -> list[dict[int, object]]:
    out = []
    pos = 0
    while pos < len(data):
        ln, pos = decode_varint(data, pos)
        if pos + ln > len(data):
            raise ProtoWireError("truncated message")
        out.append(decode_message(data[pos : pos + ln]))
        pos += ln
    return out
