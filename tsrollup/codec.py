"""Gorilla-style time-series block compression (SURVEY.md §2.8, C1–C3).

Public source for the scheme: Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 — §4.1 (timestamp delta-of-delta)
and §4.2 (value XOR). This is a from-scratch implementation of the published
format with two frozen deviations, documented because the encoder and decoder
(and the oracle — same code objects) must agree forever:

1. The DoD overflow bucket ('1111' prefix) stores a **64-bit signed** D, not
   the paper's 32-bit: our timestamps are microseconds and a one-day bucket
   gap at µs resolution (8.64e10) overflows 32 bits.
2. The value-XOR '1' control path stores **meaningful-length − 1** in 6 bits
   (paper encodes length 64 as 0) — avoids the 64→0 ambiguity outright.

Blob layouts (bitstreams are MSB-first; headers little-endian):

  ts_dod_blob : [t0: uint64 µs][n: uint32] + bits:
                  n>=2: first delta as 64-bit two's-complement, then per
                  point D = Δi − Δi−1:
                    D == 0            -> '0'
                    -63  <= D <= 64   -> '10'   + 7  bits of (D + 63)
                    -255 <= D <= 256  -> '110'  + 9  bits of (D + 255)
                    -2047<= D <= 2048 -> '1110' + 12 bits of (D + 2047)
                    else              -> '1111' + 64 bits two's-complement
  val_xor_blob: [n: uint32] + bits:
                  first value as raw IEEE-754 64 bits, then per value
                  x = bits(v) XOR bits(prev):
                    x == 0 -> '0'
                    else '1' + ('0' + meaningful bits in the previous
                    window if leading(x) >= prev_leading and
                    trailing(x) >= prev_trailing) or ('1' + 5-bit
                    leading count (capped 31) + 6-bit (length-1) +
                    meaningful bits, updating the window)

Points enter the encoder in strict bucket order (the Spark kernel sorts) —
that is what makes blobs byte-deterministic across parallelism levels.
Blocks are one day of buckets per (source, tier, metric): bounded size
(≤1440 points at 1m) and aligned with retention drops.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schemas
from .config import RollupConfig

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


#: metrics compressed per block; cnt is cast to float64 (exact for < 2^53)
BLOCK_METRICS = ("n_tok_mean", "tok_mean", "cnt")


def compress_tier(filled: DataFrame, tier: str, cfg: RollupConfig | None = None) -> DataFrame:
    """C1+C2 as a grouped-map transform: one blob row per
    (source, tier, metric, day-block). The kernel sorts by bucket_start so
    every blob is byte-deterministic regardless of shuffle order."""
    cfg = cfg or RollupConfig()
    slim = filled.select(
        "source",
        "bucket_start",
        F.date_trunc("day", "bucket_start").alias("block_start"),
        *[F.col(m).cast("double").alias(m) for m in BLOCK_METRICS],
    )

    def encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        ts_us = pdf["bucket_start"].to_numpy().astype("datetime64[us]").view(np.int64)
        ts_blob = encode_dod(ts_us)
        rows = []
        for m in BLOCK_METRICS:
            rows.append(
                (
                    pdf["source"].iloc[0],
                    tier,
                    m,
                    pdf["block_start"].iloc[0],
                    len(pdf),
                    ts_blob,
                    encode_xor(pdf[m].to_numpy(dtype=np.float64)),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["source", "tier", "metric", "block_start", "n_points", "ts_dod_blob", "val_xor_blob"],
        )

    return slim.groupBy("source", "block_start").applyInPandas(
        encode_block, schema=schemas.BLOCK_SCHEMA
    )


def decompress_blocks(blocks: DataFrame) -> DataFrame:
    """C3 — blobs back to (source, tier, metric, bucket_start, value) points."""
    import pyarrow  # noqa: F401  (arrow path required)

    out_schema = (
        "source string, tier string, metric string, bucket_start timestamp, value double"
    )

    def decode_iter(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ts = decode_dod(row.ts_dod_blob)
                vals = decode_xor(row.val_xor_blob)
                frames.append(
                    pd.DataFrame(
                        {
                            "source": row.source,
                            "tier": row.tier,
                            "metric": row.metric,
                            "bucket_start": ts.astype("datetime64[us]"),
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blocks.mapInPandas(decode_iter, schema=out_schema)
