"""From-spec MessagePack codec (sources/msgpack.py): width-boundary
ints, every length form, stream framing, and a hypothesis roundtrip."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dmi_ingestor_spark.sources.msgpack import (
    MsgpackError,
    decode_msgpack,
    encode_msgpack,
    encode_record_stream,
    parse_record_stream,
)

INT_BOUNDARIES = [
    0, 1, 127, 128, 255, 256, 65535, 65536,
    2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**63 - 1, 2**64 - 1,
    -1, -32, -33, -128, -129, -32768, -32769,
    -(2**31), -(2**31) - 1, -(2**63),
]


@pytest.mark.parametrize("n", INT_BOUNDARIES)
def test_int_boundaries_roundtrip(n):
    assert decode_msgpack(encode_msgpack(n)) == n


def test_smallest_encoding_chosen():
    # spec recommendation: smallest representation that fits
    assert encode_msgpack(127) == b"\x7f"            # positive fixint
    assert encode_msgpack(-32) == b"\xe0"            # negative fixint
    assert encode_msgpack(128) == b"\xcc\x80"        # uint8
    assert encode_msgpack(-33) == b"\xd0\xdf"        # int8
    assert encode_msgpack(256) == b"\xcd\x01\x00"    # uint16
    assert len(encode_msgpack(2**64 - 1)) == 9       # uint64
    assert encode_msgpack("") == b"\xa0"             # fixstr 0
    assert encode_msgpack([]) == b"\x90"             # fixarray 0
    assert encode_msgpack({}) == b"\x80"             # fixmap 0
    assert encode_msgpack(None) == b"\xc0"
    assert encode_msgpack(True) == b"\xc3"


@pytest.mark.parametrize("n", [0, 31, 32, 255, 256, 70000])
def test_str_length_forms(n):
    s = "x" * n
    assert decode_msgpack(encode_msgpack(s)) == s


@pytest.mark.parametrize("n", [0, 255, 256, 70000])
def test_bin_length_forms(n):
    b = bytes(range(256)) * (n // 256) + bytes(range(n % 256))
    assert decode_msgpack(encode_msgpack(b)) == b


@pytest.mark.parametrize("n", [0, 15, 16, 65535, 65536])
def test_array_length_forms(n):
    v = [7] * n
    assert decode_msgpack(encode_msgpack(v)) == v


def test_map_length_forms():
    for n in (0, 15, 16, 300):
        d = {f"k{i}": i for i in range(n)}
        assert decode_msgpack(encode_msgpack(d)) == d


def test_nested_and_unicode():
    v = {"a": [1, None, {"b": "héllo ☃", "c": [True, False, -1.5]}]}
    assert decode_msgpack(encode_msgpack(v)) == v


def test_record_stream_roundtrip():
    recs = [{"id": i, "v": None if i % 3 == 0 else i * 1.5} for i in range(50)]
    assert parse_record_stream(encode_record_stream(recs)) == recs


def test_truncation_and_trailing_rejected():
    payload = encode_msgpack({"k": [1, 2, 3]})
    with pytest.raises(MsgpackError, match="truncated"):
        decode_msgpack(payload[:-1])
    with pytest.raises(MsgpackError, match="trailing"):
        decode_msgpack(payload + b"\x00")


def test_float32_decodes():
    # 0xca is decode-only (the encoder always emits float64)
    import struct
    assert decode_msgpack(b"\xca" + struct.pack(">f", 1.5)) == 1.5


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=True),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_trees = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=6),
        st.dictionaries(st.text(max_size=8), kids, max_size=6),
    ),
    max_leaves=25,
)


@given(_trees)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(v):
    assert decode_msgpack(encode_msgpack(v)) == v
