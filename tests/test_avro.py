"""Avro Object Container codec (from the Apache Avro 1.11 spec).

Spark's avro module is not deployed here; feeds that arrive as Avro
(Kafka dumps, CDC drops) decode through this pure-Python subset the
same way netcdf3/hdf5/grib2 payloads do."""

from __future__ import annotations

import pytest

from dmi_ingestor_spark.sources.avro import (
    AvroError,
    encode_avro_container,
    parse_avro_container,
)

FIELDS = [
    ("k", "long"),
    ("v", "double"),
    ("s", "string"),
    ("b", "boolean"),
    ("opt", ["null", "long"]),
]


def _rows(n=500):
    return [
        {
            "k": i - n // 2,
            "v": i * 1.25,
            "s": f"row-{i}",
            "b": i % 2 == 0,
            "opt": None if i % 3 == 0 else i * 7,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_roundtrip(codec):
    rows = _rows()
    payload = encode_avro_container(
        "t", FIELDS, rows, codec=codec, block_rows=128
    )
    schema, got = parse_avro_container(payload)
    assert got == rows
    assert [f["name"] for f in schema["fields"]] == [f for f, _ in FIELDS]


def test_avro_zigzag_extremes_and_unicode():
    rows = [
        {"k": -(2**62), "v": -0.0, "s": "", "b": False, "opt": -1},
        {"k": 2**62, "v": 1e308, "s": "énergie", "b": True, "opt": None},
    ]
    payload = encode_avro_container("t", FIELDS, rows, codec="deflate")
    assert parse_avro_container(payload)[1] == rows


def test_avro_rejects_garbage_and_bad_codec():
    with pytest.raises(AvroError):
        parse_avro_container(b"PAR1not-avro")
    with pytest.raises(AvroError, match="codec"):
        encode_avro_container("t", FIELDS, _rows(3), codec="snappy")
    with pytest.raises(AvroError, match="non-nullable"):
        encode_avro_container("t", [("k", "long")], [{"k": None}])


def test_avro_sync_marker_mismatch_detected():
    payload = bytearray(
        encode_avro_container("t", FIELDS, _rows(10), block_rows=5)
    )
    payload[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(AvroError, match="sync"):
        parse_avro_container(bytes(payload))
