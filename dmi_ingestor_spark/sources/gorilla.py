"""Gorilla-style time-series compression, from the published paper.

Pelkonen et al., *Gorilla: A Fast, Scalable, In-Memory Time Series
Database* (VLDB 2015) describe the two-stream block codec behind
Facebook's monitoring store (and, via open-source descendants, the
Prometheus/VictoriaMetrics/InfluxDB block formats):

* **timestamps** — delta-of-delta coding: consecutive deltas of an
  almost-regular series are almost always equal, so ``dod = 0`` costs
  ONE bit; larger excursions escalate through the paper's bucket
  ladder (``'10'``+7 bits, ``'110'``+9, ``'1110'``+12, ``'1111'``+64
  here — we widen the last bucket from the paper's 32 to 64 bits so
  arbitrary epoch-millis fit).
* **values** — XOR coding against the previous value: identical
  values cost ONE bit; otherwise the XOR's meaningful window is sent,
  reusing the previous window when it still covers the new XOR
  (control bit '0') or emitting 6 bits of leading-zero count + 6 bits
  of window length when it does not. The paper XORs IEEE-754 doubles;
  this implementation XORs the series as **int64** (values are exact
  integer cents end to end), which keeps the oracle comparison exact
  while exercising the identical bit mechanics.

Blocks are self-delimiting: ``n_samples`` in a fixed header, then the
two bit-streams interleaved per sample exactly as in the paper (one
stream, timestamp bits then value bits). The writer exists to exercise
the reader (same policy as ``msgpack.py``/``avro.py``); at scale blocks
ride a binary DataFrame column into ``mapInPandas`` and decode with
per-block parallelism (see ``ingest_gorilla_timeseries``).
"""

from __future__ import annotations

import struct


class GorillaError(ValueError):
    pass


_U64 = (1 << 64) - 1


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def getvalue(self) -> bytes:
        out = bytes(self._out)
        if self._n:
            out += bytes([(self._acc << (8 - self._n)) & 0xFF])
        return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        end = self._pos + bits
        if end > len(self._data) * 8:
            raise GorillaError("bit-stream truncated")
        val = 0
        pos = self._pos
        while bits:
            byte = self._data[pos // 8]
            avail = 8 - pos % 8
            take = min(avail, bits)
            shift = avail - take
            val = (val << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            bits -= take
        self._pos = pos
        return val


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# delta-of-delta bucket ladder: (prefix value, prefix bits, payload bits).
# The deepest bucket's prefix is '1111' (no terminating 0 — it is the
# last rung, as in the paper), and its payload is widened 32 -> 64 bits
# so arbitrary epoch-millis excursions fit.
_DOD_BUCKETS = ((0b10, 2, 7), (0b110, 3, 9), (0b1110, 4, 12), (0b1111, 4, 64))


def encode_block(samples: list[tuple[int, int]]) -> bytes:
    """[(ts_ms, value_int64), ...] -> Gorilla block bytes.

    Samples must be in non-decreasing timestamp order (the paper's
    blocks are append-ordered)."""
    head = struct.pack("<4sI", b"GORB", len(samples))
    if not samples:
        return head
    w = _BitWriter()
    t0, v0 = samples[0]
    w.write(t0 & _U64, 64)
    w.write(v0 & _U64, 64)
    prev_t, prev_delta, prev_v = t0, 0, v0
    prev_lead, prev_len = -1, 0  # no value window yet
    for t, v in samples[1:]:
        delta = t - prev_t
        if delta < 0:
            raise GorillaError("timestamps must be non-decreasing")
        dod = delta - prev_delta
        if dod == 0:
            w.write(0, 1)
        else:
            z = _zigzag(dod)
            for prefix, pbits, vbits in _DOD_BUCKETS:
                if z < (1 << vbits):
                    w.write(prefix, pbits)
                    w.write(z, vbits)
                    break
            else:  # pragma: no cover - 64-bit bucket always fits
                raise GorillaError("delta-of-delta out of range")
        x = (v ^ prev_v) & _U64
        if x == 0:
            w.write(0, 1)
        else:
            lead = 64 - x.bit_length()
            trail = (x & -x).bit_length() - 1
            length = 64 - lead - trail
            if (
                prev_lead >= 0
                and lead >= prev_lead
                and 64 - prev_lead - prev_len <= trail
            ):
                # previous window still covers this XOR: control '10'
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                # new window: control '11', 6-bit lead, 6-bit (len-1)
                w.write(0b11, 2)
                w.write(lead, 6)
                w.write(length - 1, 6)
                w.write(x >> trail, length)
                prev_lead, prev_len = lead, length
        prev_t, prev_delta, prev_v = t, delta, v
    return head + w.getvalue()


def decode_block(data: bytes) -> list[tuple[int, int]]:
    """Gorilla block bytes -> [(ts_ms, value_int64), ...]."""
    if len(data) < 8 or data[:4] != b"GORB":
        raise GorillaError("not a Gorilla block")
    (n,) = struct.unpack_from("<I", data, 4)
    if n == 0:
        return []
    r = _BitReader(data[8:])
    t = r.read(64)
    if t >= 1 << 63:
        t -= 1 << 64
    v = r.read(64)
    if v >= 1 << 63:
        v -= 1 << 64
    out = [(t, v)]
    delta = 0
    lead, length = 0, 0
    have_window = False
    # payload widths by ladder depth: number of leading '1' marker bits
    # (1..4) indexes the bucket; '0' after k ones terminates the prefix
    widths = [b[2] for b in _DOD_BUCKETS]
    for _ in range(n - 1):
        if r.read(1) == 0:
            dod = 0
        else:
            ones = 1
            while ones < len(widths) and r.read(1) == 1:
                ones += 1
            dod = _unzigzag(r.read(widths[ones - 1]))
        delta += dod
        t += delta
        if r.read(1) == 1:
            if r.read(1) == 1:
                lead = r.read(6)
                length = r.read(6) + 1
                have_window = True
            elif not have_window:
                raise GorillaError("window reuse before first window")
            x = r.read(length) << (64 - lead - length)
            vx = ((v & _U64) ^ x) & _U64
            v = vx - (1 << 64) if vx >= 1 << 63 else vx
        out.append((t, v))
    return out
