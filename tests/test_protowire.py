"""Protobuf wire format (sources/protowire.py): varint/ZigZag edges,
proto3 default elision, unknown-field skipping, delimited framing."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dmi_ingestor_spark.sources.protowire import (
    ProtoWireError,
    decode_delimited_stream,
    decode_message,
    decode_varint,
    encode_delimited_stream,
    encode_message,
    encode_varint,
    unzigzag,
    zigzag,
)


def test_varint_known_vectors():
    # vectors from the published encoding guide
    assert encode_varint(1) == b"\x01"
    assert encode_varint(150) == b"\x96\x01"
    assert encode_varint(300) == b"\xac\x02"
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        assert decode_varint(encode_varint(n), 0) == (n, len(encode_varint(n)))


def test_zigzag_known_vectors():
    # (0,0) (-1,1) (1,2) (-2,3) (2147483647, 4294967294) per the spec
    assert [zigzag(n) for n in (0, -1, 1, -2)] == [0, 1, 2, 3]
    assert zigzag(2147483647) == 4294967294
    for n in (0, -1, 1, -(2**62), 2**62, -(2**63)):
        assert unzigzag(zigzag(n)) == n


def test_default_elision_round_trip():
    msg = [(1, "varint", 0), (2, "sint", 0), (3, "string", ""), (4, "varint", 7)]
    raw = encode_message(msg)
    dec = decode_message(raw)
    # defaults are genuinely absent from the wire
    assert set(dec) == {4}
    assert dec[4] == 7


def test_unknown_field_skipped_by_wire_type():
    # craft a message with fixed64 (wtype 1) and fixed32 (wtype 5)
    # unknown fields around a known varint
    raw = (
        encode_varint((9 << 3) | 1) + b"\x01\x02\x03\x04\x05\x06\x07\x08"
        + encode_varint((1 << 3) | 0) + encode_varint(42)
        + encode_varint((8 << 3) | 5) + b"\xaa\xbb\xcc\xdd"
    )
    dec = decode_message(raw)
    assert dec[1] == 42
    assert dec[9] == b"\x01\x02\x03\x04\x05\x06\x07\x08"
    assert dec[8] == b"\xaa\xbb\xcc\xdd"


def test_last_one_wins():
    raw = encode_message([(1, "varint", 5)]) + encode_message([(1, "varint", 9)])
    assert decode_message(raw)[1] == 9


def test_truncation_rejected():
    raw = encode_message([(3, "string", "hello")])
    with pytest.raises(ProtoWireError):
        decode_message(raw[:-1])
    with pytest.raises(ProtoWireError):
        decode_varint(b"\x80\x80", 0)
    stream = encode_delimited_stream([[(1, "varint", 1)]])
    with pytest.raises(ProtoWireError):
        decode_delimited_stream(stream[:-1])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=20),
        ),
        max_size=20,
    )
)
def test_stream_roundtrip_property(items):
    msgs = [
        [(1, "sint", n), (2, "string", s)] for n, s in items
    ]
    back = decode_delimited_stream(encode_delimited_stream(msgs))
    assert len(back) == len(items)
    for (n, s), m in zip(items, back):
        assert unzigzag(m[1]) == n if n != 0 else 1 not in m
        got = m.get(2, b"").decode("utf-8")
        assert got == s
