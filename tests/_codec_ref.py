"""FROZEN reference twin of the Gorilla bit format (tests only).

This is the original per-point loop implementation of tsrollup/codec.py,
kept verbatim so the vectorized production encoder/decoder can be
byte-compared against it forever. Do not optimize this file.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = (1 << 64) - 1


class _BitWriter:
    """MSB-first bit accumulator. O(1) per append: bytes are flushed
    eagerly so the int accumulator never exceeds ~71 bits."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.out)


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, bit_offset: int = 0) -> None:
        self.buf = buf
        self.pos = bit_offset

    def read(self, nbits: int) -> int:
        val = 0
        pos = self.pos
        buf = self.buf
        remaining = nbits
        while remaining > 0:
            byte = buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            val = (val << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return val


def encode_dod(ts_us: np.ndarray) -> bytes:
    """C2 — delta-of-delta encode a monotone-ish int64 µs timestamp stream."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = ts.shape[0]
    if n == 0:
        return struct.pack("<QI", 0, 0)
    header = struct.pack("<QI", int(ts[0]) & _U64, n)
    if n == 1:
        return header
    w = _BitWriter()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & _U64, 64)
    dod = np.diff(deltas)
    for d in dod:
        d = int(d)
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & _U64, 64)
    return header + w.getvalue()


def decode_dod(blob: bytes) -> np.ndarray:
    """C3 — exact inverse of encode_dod."""
    t0_u, n = struct.unpack_from("<QI", blob, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = t0_u if t0_u < (1 << 63) else t0_u - (1 << 64)
    out[0] = t0
    if n == 1:
        return out
    r = _BitReader(blob[12:])
    d1 = r.read(64)
    delta = d1 if d1 < (1 << 63) else d1 - (1 << 64)
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            pass
        elif r.read(1) == 0:
            delta += r.read(7) - 63
        elif r.read(1) == 0:
            delta += r.read(9) - 255
        elif r.read(1) == 0:
            delta += r.read(12) - 2047
        else:
            d = r.read(64)
            delta += d if d < (1 << 63) else d - (1 << 64)
        out[i] = out[i - 1] + delta
    return out


def encode_xor(values: np.ndarray) -> bytes:
    """C1 — XOR-encode a float64 stream (NaN/±inf/denormals all fine:
    everything operates on raw IEEE-754 bit patterns)."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = bits.shape[0]
    header = struct.pack("<I", n)
    if n == 0:
        return header
    w = _BitWriter()
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead = -1
    prev_len = 0
    for i in range(1, n):
        cur = int(bits[i])
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = _clz64(x)
        trail = _ctz64(x)
        if lead > 31:
            lead = 31
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_len
        ):
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            length = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(length - 1, 6)
            w.write(x >> trail, length)
            prev_lead = lead
            prev_len = length
    return header + w.getvalue()


def decode_xor(blob: bytes) -> np.ndarray:
    """C3 — exact inverse of encode_xor."""
    (n,) = struct.unpack_from("<I", blob, 0)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(blob[4:])
    cur = r.read(64)
    out[0] = cur
    lead = 0
    length = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            length = r.read(6) + 1
        x = r.read(length) << (64 - lead - length)
        cur ^= x
        out[i] = cur
    return out.view(np.float64)


def _clz64(x: int) -> int:
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1


