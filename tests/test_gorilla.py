"""Gorilla block codec (sources/gorilla.py): exact round-trip of the
paper's delta-of-delta timestamp ladder + XOR value windows, including
every ladder bucket and the window-reuse path."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dmi_ingestor_spark.sources.gorilla import (
    GorillaError,
    decode_block,
    encode_block,
)


def test_empty_and_single():
    assert decode_block(encode_block([])) == []
    assert decode_block(encode_block([(1700000000000, -42)])) == [
        (1700000000000, -42)
    ]


def test_regular_series_compresses_hard():
    # perfectly regular cadence + constant value: ~2 bits/sample tail
    s = [(1_700_000_000_000 + 60_000 * i, 1234) for i in range(1000)]
    blk = encode_block(s)
    assert decode_block(blk) == s
    assert len(blk) < 8 + 16 + 1000  # header + first sample + ~2bit/sample


def test_every_dod_bucket_roundtrips():
    t = 1_700_000_000_000
    deltas = [
        60_000,  # establishes the base delta
        60_000,  # dod = 0 (1-bit path)
        60_030,  # dod small -> 7-bit bucket
        60_230,  # dod -> 9-bit bucket
        62_000,  # dod -> 12-bit bucket
        5_000_000,  # dod huge -> 64-bit bucket
        5_000_000,
    ]
    s = []
    v = 0
    for i, d in enumerate(deltas):
        t += d
        v = v if i % 2 else v + (1 << (i * 7)) - 3  # vary XOR windows
        s.append((t, v))
    assert decode_block(encode_block(s)) == s


def test_window_reuse_and_new_window():
    t = 0
    # values whose XORs first fit one window, then need a wider one
    vals = [0b1111_0000, 0b1010_0000, 0b1111_0000, 1 << 50, 3, 3]
    s = [(t + i, v) for i, v in enumerate(vals)]
    assert decode_block(encode_block(s)) == s


def test_negative_values_and_extremes():
    s = [(0, -(2**63)), (10, 2**63 - 1), (20, -1), (30, 0), (40, -1)]
    assert decode_block(encode_block(s)) == s


def test_decreasing_timestamps_rejected():
    with pytest.raises(GorillaError):
        encode_block([(100, 1), (99, 2)])


def test_garbage_rejected():
    with pytest.raises(GorillaError):
        decode_block(b"NOPE" + b"\x00" * 8)
    with pytest.raises(GorillaError):
        decode_block(encode_block([(1, 1), (2, 2)])[:-1] + b"")[:0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        max_size=60,
    )
)
def test_roundtrip_property(pairs):
    ts = sorted(t for t, _ in pairs)
    s = [(t, v) for t, (_, v) in zip(ts, pairs)]
    assert decode_block(encode_block(s)) == s
