"""Gorilla-style time-series block compression (SURVEY.md §2.8, C1–C4).

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

Round 3 adds a DECOMPOSED block layout (C4 section near the bottom):
where a day-block's mean streams are exact float64 divisions of its
integer sums, ONE row per (source, tier, day) stores five zigzag-delta
integer streams instead of three XOR float streams, verified bitwise at
encode time with automatic fallback to the classic rows. The XOR/DoD
formats above stay FROZEN and remain both the fallback and the
random-float path.

Implementation: vectorized NumPy bit-packing. The bitstream is modeled as a
flat sequence of (value ≤ 64 bits, bit-length) fields; `_pack_fields` packs
the whole sequence with one scatter + `np.packbits`. DoD encoding is fully
vectorized (per-point buckets are independent); XOR encoding vectorizes the
zero mask, leading/trailing-zero counts and payloads, and keeps a Python
loop ONLY over nonzero XORs for the (prev_lead, prev_len) window state
machine, which is inherently sequential. Byte format is FROZEN:
tests/_codec_ref.py keeps the original per-point loop implementation and
the suite asserts byte equality.

Decoding has two implementations sharing the frozen format:

- scalar (`decode_dod`/`decode_xor`): per-blob loop that bulk-skips
  '0'-control runs by jumping between set bits — right for one blob.
- batch (`decode_dod_batch`/`decode_xor_batch`): decodes MANY blobs
  simultaneously, SIMT-style — one field per step per blob, with every
  bit read a vectorized gather from a shared big-endian uint64 word
  array. Bit positions advance per lane; a lane drops out when its blob
  is exhausted. Wall clock is O(max points per blob) steps of O(active
  blobs) vector work, so per-point cost amortizes to ~tens of ns at
  typical read fan-in (hundreds of day-blocks per Arrow batch). This is
  the cold-read path's decoder (decompress_blocks). The suite asserts
  batch == scalar on adversarial blocks.
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
_ONE = np.uint64(1)


#: fields per bit-expansion chunk — bounds temporary arrays to a few MB so
#: the allocator reuses pages instead of faulting fresh ones (this sandbox
#: first-touches anon memory at ~10 MB/s; steady-state reuse is full speed)
_PACK_CHUNK = 262_144


def _pack_fields(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Pack (uint64 value, 0..64-bit length) fields MSB-first into bytes,
    zero-padding the final byte (same tail rule as a sequential bit writer).

    Two byte-identical strategies, dispatched on mean bits/field:
    - bit expansion (repeat + packbits): cheapest when the stream is
      dominated by 1-bit '0' controls (LOCF/const shapes — work scales
      with BITS, which is then ~1/field);
    - word packing: each field left-aligned into a 64-bit lane and
      OR-scattered into its ≤2 big-endian output words — work scales
      with FIELDS, winning when payloads are wide (dense/random shapes,
      measured ~2x)."""
    if lengths.size == 0:
        return b""
    total = int(lengths.sum())
    if total < 16 * lengths.size:
        return _pack_fields_bits(values, lengths, total)
    starts = np.cumsum(lengths) - lengths
    words = np.zeros(total // 64 + 2, dtype=np.uint64)
    nz = lengths > 0
    ln = lengths[nz].astype(np.uint64)
    s = starts[nz]
    a = values[nz] << (np.uint64(64) - ln)  # left-aligned payload
    w = (s >> 6).astype(np.int64)
    sh = (s & 63).astype(np.uint64)
    # (a << 1) << (63 - sh) == a << (64 - sh) without the sh=0 UB
    np.bitwise_or.at(words, w, a >> sh)
    np.bitwise_or.at(
        words, w + 1,
        np.where(sh > 0, (a << _ONE) << (np.uint64(63) - sh), np.uint64(0)),
    )
    return words.byteswap().tobytes()[: (total + 7) // 8]


def _pack_fields_bits(values: np.ndarray, lengths: np.ndarray, total: int) -> bytes:
    """Bit-expansion packer (see _pack_fields), chunked over fields so
    temporaries stay a few MB; chunks share one bit array + one packbits."""
    bits = np.empty(total, dtype=np.uint8)
    ends_all = np.cumsum(lengths)
    done_bits = 0
    for c0 in range(0, lengths.size, _PACK_CHUNK):
        c1 = min(c0 + _PACK_CHUNK, lengths.size)
        ln = lengths[c0:c1]
        seg = int(ends_all[c1 - 1]) - done_bits
        # shift of output bit b (within chunk) = (end-of-its-field) - b - 1
        ends_u = np.cumsum(ln).astype(np.uint64)
        shift = np.repeat(ends_u, ln)
        shift -= np.arange(1, seg + 1, dtype=np.uint64)
        vals_rep = np.repeat(values[c0:c1], ln)
        vals_rep >>= shift
        vals_rep &= _ONE
        bits[done_bits : done_bits + seg] = vals_rep
        done_bits += seg
    return np.packbits(bits).tobytes()


def _bitlen64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    y = x.astype(np.uint64, copy=True)
    for s in (32, 16, 8, 4, 2, 1):
        big = y >= (_ONE << np.uint64(s))
        bl[big] += s
        y = np.where(big, y >> np.uint64(s), y)
    bl += (y != 0).astype(np.int64)
    return bl


def _read_bits(bits: np.ndarray, pos: int, w: int) -> int:
    """Read w (≤64) bits MSB-first from an unpacked 0/1 uint8 array."""
    pw = _ONE << np.arange(w - 1, -1, -1, dtype=np.uint64)
    return int(np.dot(bits[pos : pos + w].astype(np.uint64), pw))


def _ragged_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(s, s + c) for s, c in zip(starts, counts)])."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    base = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(base, counts) + np.repeat(
        starts, counts
    )


def _split_blobs(
    headers: list[bytes], fv: np.ndarray, fl: np.ndarray, block_bits: np.ndarray
) -> list[bytes]:
    """One global pack over all blocks' fields (each block byte-padded by a
    zero pad field), then split the buffer at byte offsets."""
    buf = _pack_fields(fv, fl)
    nbytes = (block_bits + (-block_bits) % 8) // 8
    offs = np.concatenate(([0], np.cumsum(nbytes)))
    return [
        headers[i] + buf[int(offs[i]) : int(offs[i + 1])] for i in range(len(headers))
    ]


def encode_dod_batch(blocks: list[np.ndarray]) -> list[bytes]:
    """C2 — delta-of-delta encode MANY timestamp blocks in one vectorized
    pass (one field-scatter + one packbits for the whole batch). Each blob
    is byte-identical to encoding its block alone: per-block bitstreams are
    zero-padded to byte boundaries exactly like a per-blob tail pad.

    Batching is the throughput lever: per-block numpy fixed costs amortize
    across the partition's blocks (the Spark kernel encodes all day-blocks
    of a source per group)."""
    B = len(blocks)
    arrs = [np.asarray(b, dtype=np.int64) for b in blocks]
    L = np.array([a.shape[0] for a in arrs], dtype=np.int64)
    headers = [
        struct.pack("<QI", (int(a[0]) & _U64) if a.shape[0] else 0, a.shape[0])
        for a in arrs
    ]
    enc = L >= 2  # blocks with a bitstream
    if not enc.any():
        return headers
    allts = np.concatenate(arrs) if B > 1 else arrs[0]
    starts = np.cumsum(L) - L
    d_all = np.diff(allts) if allts.shape[0] > 1 else np.empty(0, dtype=np.int64)
    dd_all = np.diff(d_all) if d_all.shape[0] > 1 else np.empty(0, dtype=np.int64)
    # block i's DoD entries = dd_all[starts_i .. starts_i + L_i - 3]
    m = np.maximum(L - 2, 0)
    dod = dd_all[_ragged_arange(starts, m)]
    c0 = dod == 0
    c1 = ~c0 & (dod >= -63) & (dod <= 64)
    c2 = ~c0 & ~c1 & (dod >= -255) & (dod <= 256)
    c3 = ~c0 & ~c1 & ~c2 & (dod >= -2047) & (dod <= 2048)
    c4 = ~(c0 | c1 | c2 | c3)
    v1 = np.zeros(dod.shape[0], dtype=np.uint64)  # c0 rows stay (0, 1)
    l1 = np.ones(dod.shape[0], dtype=np.int64)
    v1[c1] = (np.uint64(0b10) << np.uint64(7)) | (dod[c1] + 63).astype(np.uint64)
    l1[c1] = 9
    v1[c2] = (np.uint64(0b110) << np.uint64(9)) | (dod[c2] + 255).astype(np.uint64)
    l1[c2] = 12
    v1[c3] = (np.uint64(0b1110) << np.uint64(12)) | (dod[c3] + 2047).astype(np.uint64)
    l1[c3] = 16
    v1[c4] = np.uint64(0b1111)
    l1[c4] = 4
    counts = 1 + c4.astype(np.int64)  # overflow rows carry a second field
    # field layout per encoded block: [first-delta][dod fields...][pad]
    ms = np.cumsum(m) - m  # dod-entry offset of each block
    ccounts = np.concatenate(([0], np.cumsum(counts)))
    fsum = ccounts[ms + m] - ccounts[ms]  # dod FIELD count per block
    cf = np.where(enc, 1 + fsum, 0)  # core fields per block
    nf_per_block = np.where(enc, cf + 1, 0)  # + pad field
    o = np.cumsum(nf_per_block) - nf_per_block  # block field offsets
    nf = int(nf_per_block.sum())
    fv = np.zeros(nf, dtype=np.uint64)  # untouched slots = the '0' control
    fl = np.ones(nf, dtype=np.int64)
    # first-delta fields
    fv[o[enc]] = d_all[starts[enc]].view(np.uint64)
    fl[o[enc]] = 64
    # non-zero dod fields: global slot = o[blk] + 1 + field offset in block
    # (zero-D rows keep the default (0, 1) slot — never touched)
    nc = np.flatnonzero(~c0)
    if nc.size:
        blk = np.searchsorted(np.cumsum(m), nc, side="right")
        slots = o[blk] + 1 + (ccounts[nc] - ccounts[ms][blk])
        fv[slots] = v1[nc]
        fl[slots] = l1[nc]
        ov = c4[nc]  # overflow rows among the non-zero ones
        fv[slots[ov] + 1] = dod[nc[ov]].view(np.uint64)  # two's complement
        fl[slots[ov] + 1] = 64
    # pad fields: round each block's bitstream to a byte boundary
    pad_slots = (o + cf)[enc]
    fl[pad_slots] = 0
    cfl = np.concatenate(([0], np.cumsum(fl)))
    bits = cfl[o + cf] - cfl[o]  # per-block bit totals (pads 0)
    fl[pad_slots] = (-bits[enc]) % 8
    blobs = _split_blobs(
        [headers[i] for i in range(B) if enc[i]], fv, fl, bits[enc]
    )
    out: list[bytes] = []
    k = 0
    for i in range(B):
        if enc[i]:
            out.append(blobs[k])
            k += 1
        else:
            out.append(headers[i])
    return out


def encode_dod(ts_us: np.ndarray) -> bytes:
    """C2 — delta-of-delta encode one monotone-ish int64 µs timestamp
    stream (thin wrapper over the batch encoder)."""
    return encode_dod_batch([np.asarray(ts_us, dtype=np.int64)])[0]


def decode_dod(blob: bytes) -> np.ndarray:
    """C3 — exact inverse of encode_dod. '0'-control runs (D=0, the common
    case on regular buckets) are consumed in bulk by jumping to the next
    set bit; D values integrate back via two cumsums."""
    t0_u, n = struct.unpack_from("<QI", blob, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = t0_u if t0_u < (1 << 63) else t0_u - (1 << 64)
    if n == 1:
        return out
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8, offset=12))
    d1 = _read_bits(bits, 0, 64)
    delta1 = d1 if d1 < (1 << 63) else d1 - (1 << 64)
    pos = 64
    m = n - 2
    D = np.zeros(m, dtype=np.int64)
    ones = np.flatnonzero(bits)
    i = 0
    while i < m:
        j = np.searchsorted(ones, pos)
        nxt = int(ones[j]) if j < ones.size else bits.size
        run = min(nxt - pos, m - i)  # consecutive '0' controls -> D=0
        i += run
        pos += run
        if i >= m:
            break
        if bits[pos + 1] == 0:  # '10'
            D[i] = _read_bits(bits, pos + 2, 7) - 63
            pos += 9
        elif bits[pos + 2] == 0:  # '110'
            D[i] = _read_bits(bits, pos + 3, 9) - 255
            pos += 12
        elif bits[pos + 3] == 0:  # '1110'
            D[i] = _read_bits(bits, pos + 4, 12) - 2047
            pos += 16
        else:  # '1111' + 64-bit two's complement
            v = _read_bits(bits, pos + 4, 64)
            D[i] = v - (1 << 64) if v >= (1 << 63) else v
            pos += 68
        i += 1
    deltas = delta1 + np.concatenate(([0], np.cumsum(D)))
    out[1:] = out[0] + np.cumsum(deltas)
    return out


def _concat_payloads(
    blobs: list[bytes], header_bytes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate every blob's bitstream payload (header stripped; blobs
    are byte-aligned by construction) into one buffer viewed as big-endian
    uint64 words, padded so idx+1 reads never run off the end. Returns
    (words, per-blob base bit offset)."""
    parts = [b[header_bytes:] for b in blobs]
    sizes = np.array([len(p) for p in parts], dtype=np.int64)
    buf = b"".join(parts)
    pad = (-len(buf)) % 8 + 16
    words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8").astype(np.uint64)
    return words, (np.cumsum(sizes) - sizes) * 8


def _gather_bits(W: np.ndarray, pos: np.ndarray, nbits) -> np.ndarray:
    """Vectorized MSB-first read of `nbits` (scalar or array, 1..64) bits
    at absolute bit positions `pos` from the word array of
    _concat_payloads. The (>>1)>>(63-sh) split keeps every shift < 64
    (shift-by-64 is undefined)."""
    idx = pos >> 6
    sh = (pos & 63).astype(np.uint64)
    w = (W[idx] << sh) | ((W[idx + 1] >> _ONE) >> (np.uint64(63) - sh))
    nb = np.uint64(nbits) if np.isscalar(nbits) else nbits.astype(np.uint64)
    return w >> (np.uint64(64) - nb)


def _seg_cumsum(x: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment inclusive cumsum of flat array x split by counts."""
    cs = np.cumsum(x)
    starts = np.cumsum(counts) - counts
    nz = counts > 0
    base = np.zeros(counts.shape[0], dtype=x.dtype)
    base[nz] = cs[starts[nz]] - x[starts[nz]]
    return cs - np.repeat(base, counts)


def decode_dod_batch(blobs: list[bytes]) -> list[np.ndarray]:
    """C3 — decode MANY ts_dod blobs at once (see module docstring).
    Returns one int64 µs array per blob, byte-identical to decode_dod."""
    B = len(blobs)
    hdr = [struct.unpack_from("<QI", b, 0) for b in blobs]
    t0 = np.array([h[0] for h in hdr], dtype=np.uint64).view(np.int64)
    n = np.array([h[1] for h in hdr], dtype=np.int64)
    W, base = _concat_payloads(blobs, 12)
    m = np.maximum(n - 2, 0)  # DoD entries per blob
    doff = np.cumsum(m) - m
    D = np.zeros(int(m.sum()), dtype=np.int64)
    pos = base.copy()
    d1 = np.zeros(B, dtype=np.int64)
    h2 = np.flatnonzero(n >= 2)
    if h2.size:
        d1[h2] = _gather_bits(W, pos[h2], 64).view(np.int64)
        pos[h2] += 64
    j = np.zeros(B, dtype=np.int64)
    act = np.flatnonzero(j < m)
    while act.size:
        p = pos[act]
        w = _gather_bits(W, p, 64)  # control prefix + payload in one word
        # classification uses only as many bits as the field really has:
        # a '0' control decides on bit 1 alone, so garbage past the blob's
        # tail never changes the outcome
        c0 = (w >> np.uint64(63)) == 0
        # '0'-control RUNS (D = 0, the dominant case on regular buckets)
        # consume up to 64 points per lane per step: the word's leading
        # zeros are all zero-controls, clamped to the lane's remaining
        # points (tail garbage can only shorten a run, never corrupt it —
        # D is pre-zeroed, so a run is a pure position advance)
        zl = act[c0]
        if zl.size:
            run = np.minimum(64 - _bitlen64(w[c0]), m[zl] - j[zl])
            pos[zl] += run
            j[zl] += run
        nzl = act[~c0]
        if nzl.size:
            wn = w[~c0]
            top4 = (wn >> np.uint64(60)).astype(np.int64)
            c1 = (top4 >> 2) == 0b10
            c2 = (top4 >> 1) == 0b110
            c3 = top4 == 0b1110
            c4 = top4 == 0b1111
            d = np.zeros(nzl.size, dtype=np.int64)
            d[c1] = ((wn[c1] >> np.uint64(55)) & np.uint64(0x7F)).astype(np.int64) - 63
            d[c2] = ((wn[c2] >> np.uint64(52)) & np.uint64(0x1FF)).astype(np.int64) - 255
            d[c3] = ((wn[c3] >> np.uint64(48)) & np.uint64(0xFFF)).astype(np.int64) - 2047
            if c4.any():  # 68-bit field: payload needs its own (rare) gather
                d[c4] = _gather_bits(W, p[~c0][c4] + 4, 64).view(np.int64)
            D[doff[nzl] + j[nzl]] = d
            pos[nzl] += np.select([c1, c2, c3], [9, 12, 16], default=68)
            j[nzl] += 1
        act = act[j[act] < m[act]]
    # integrate: deltas[t] = d1 + cumsum(D)[t-1]; out[t] = t0 + cumsum(deltas)
    off = np.cumsum(n) - n
    out = np.empty(int(n.sum()), dtype=np.int64)
    h1 = n >= 1
    out[off[h1]] = t0[h1]
    k = np.maximum(n - 1, 0)  # delta entries per blob
    koff = np.cumsum(k) - k
    Dext = np.zeros(int(k.sum()), dtype=np.int64)
    Dext[_ragged_arange(koff + 1, m)] = D  # leading 0 per blob, then D
    deltas = np.repeat(d1, k) + _seg_cumsum(Dext, k)
    out[_ragged_arange(off + 1, k)] = np.repeat(t0, k) + _seg_cumsum(deltas, k)
    return [out[off[b] : off[b] + n[b]] for b in range(B)]


def decode_xor_batch(blobs: list[bytes]) -> list[np.ndarray]:
    """C3 — decode MANY val_xor blobs at once (see module docstring).
    Returns one float64 array per blob, byte-identical to decode_xor."""
    B = len(blobs)
    n = np.array(
        [struct.unpack_from("<I", b, 0)[0] for b in blobs], dtype=np.int64
    )
    W, base = _concat_payloads(blobs, 4)
    off = np.cumsum(n) - n
    out = np.zeros(int(n.sum()), dtype=np.uint64)
    pos = base.copy()
    cur = np.zeros(B, dtype=np.uint64)
    lead = np.zeros(B, dtype=np.uint64)
    length = np.ones(B, dtype=np.uint64)  # (lead, length) = the XOR window
    i = np.zeros(B, dtype=np.int64)
    h1 = np.flatnonzero(n >= 1)
    if h1.size:
        cur[h1] = _gather_bits(W, pos[h1], 64)
        out[off[h1]] = cur[h1]
        pos[h1] += 64
        i[h1] = 1
    act = np.flatnonzero(i < n)
    while act.size:
        p = pos[act]
        w = _gather_bits(W, p, 64)  # control + window header in one word
        z = (w >> np.uint64(63)) == 0  # '0' control (decided by bit 1 alone)
        # '0'-control RUNS (repeated values, dominant on LOCF series)
        # consume up to 64 points per lane per step: leading zeros of the
        # word are all zero-controls, clamped to the lane's remaining
        # points; the fill is one ragged repeat of the lane's current value
        zl = act[z]
        if zl.size:
            run = np.minimum(64 - _bitlen64(w[z]), n[zl] - i[zl])
            out[_ragged_arange(off[zl] + i[zl], run)] = np.repeat(cur[zl], run)
            pos[zl] += run
            i[zl] += run
        nzl = act[~z]
        if nzl.size:
            wn = w[~z]
            pn = p[~z]
            nw = (wn >> np.uint64(62)) == 0b11  # new window: 5b lead + 6b (len-1)
            lead_new = (wn >> np.uint64(57)) & np.uint64(0x1F)
            len_new = ((wn >> np.uint64(51)) & np.uint64(0x3F)) + _ONE
            lead_eff = np.where(nw, lead_new, lead[nzl])
            len_eff = np.where(nw, len_new, length[nzl])
            data_off = np.where(nw, 13, 2)
            meaning = _gather_bits(W, pn + data_off, len_eff)
            shift = (
                np.uint64(64) - lead_eff - len_eff
            )  # valid lanes only: encoder guarantees lead+len <= 64
            x = meaning << shift
            cur[nzl] ^= x
            out[off[nzl] + i[nzl]] = cur[nzl]
            upd = nzl[nw]
            lead[upd] = lead_new[nw]
            length[upd] = len_new[nw]
            pos[nzl] = pn + data_off + len_eff.astype(np.int64)
            i[nzl] += 1
        act = act[i[act] < n[act]]
    outf = out.view(np.float64)
    return [outf[off[b] : off[b] + n[b]] for b in range(B)]


def encode_xor_batch(blocks: list[np.ndarray]) -> list[bytes]:
    """C1 — XOR-encode MANY float64 blocks in one vectorized pass (same
    batching scheme as encode_dod_batch; blob bytes identical to per-block
    encoding). Zero XORs and all per-point bit math are vectorized; the
    Python loop runs ONLY over nonzero XORs (the sequential window state
    machine), resetting its window at each block boundary."""
    B = len(blocks)
    arrs = [np.asarray(b, dtype=np.float64).view(np.uint64) for b in blocks]
    L = np.array([a.shape[0] for a in arrs], dtype=np.int64)
    headers = [struct.pack("<I", int(n)) for n in L]
    enc = L >= 1
    if not enc.any():
        return headers
    allv = np.concatenate(arrs) if B > 1 else arrs[0]
    starts = np.cumsum(L) - L
    x_all = allv[1:] ^ allv[:-1] if allv.shape[0] > 1 else np.empty(0, dtype=np.uint64)
    k = np.maximum(L - 1, 0)  # XOR entries per block
    x = x_all[_ragged_arange(starts, k)]
    nz = x != 0
    counts = np.where(nz, 2, 1).astype(np.int64)  # nonzero: control + payload
    ks = np.cumsum(k) - k  # x-entry offset of each block
    ccounts = np.concatenate(([0], np.cumsum(counts)))
    fsum = ccounts[ks + k] - ccounts[ks]  # x FIELD count per block
    cf = np.where(enc, 1 + fsum, 0)  # [first value][x fields]
    nf_per_block = np.where(enc, cf + 1, 0)  # + pad field
    o = np.cumsum(nf_per_block) - nf_per_block
    nf = int(nf_per_block.sum())
    fv = np.zeros(nf, dtype=np.uint64)  # untouched slots = the '0' control
    fl = np.ones(nf, dtype=np.int64)
    fv[o[enc]] = allv[starts[enc]]
    fl[o[enc]] = 64
    if x.shape[0]:
        nz_i = np.flatnonzero(nz)
        if nz_i.size:
            # non-zero x fields: slot = o[blk] + 1 + field offset in block
            # (zero-XOR rows keep the default (0, 1) slot — never touched)
            blk_nz = np.searchsorted(np.cumsum(k), nz_i, side="right")
            slots_nz = o[blk_nz] + 1 + (ccounts[nz_i] - ccounts[ks][blk_nz])
            x_nz = x[nz_i]
            lead_a = np.minimum(64 - _bitlen64(x_nz), 31)
            trail_a = _bitlen64(x_nz & (~x_nz + _ONE)) - 1
            len_a = 64 - lead_a - trail_a
            ctrl13_a = (
                (np.uint64(0b11) << np.uint64(11))
                | (lead_a.astype(np.uint64) << np.uint64(6))
                | (len_a - 1).astype(np.uint64)
            )
            meaning_a = x_nz >> trail_a.astype(np.uint64)
            # The (prev_lead, prev_trail) window state machine is
            # sequential WITHIN a block but independent ACROSS blocks, so
            # it runs SIMT-style over block lanes (the same trick as the
            # batch decoders): step k processes every block's k-th nonzero
            # with ~10 vector ops; field SLOTS are position-independent of
            # the reuse/new decisions (bit offsets come from the later
            # cumsum of fl), so each step scatters straight into fv/fl.
            # Below ~8 lanes the vector ops don't amortize — fall back to
            # the per-point loop (byte-identical; hypothesis covers both).
            if B < 8:
                v1, l1, v2, l2 = [], [], [], []
                ap1, ap2, ap3, ap4 = v1.append, l1.append, v2.append, l2.append
                w_lead, w_len, w_trail = -1, 0, 64
                cur_blk = -1
                for xw, ld, tr, ln, c13, mn, bk in zip(
                    x_nz.tolist(), lead_a.tolist(), trail_a.tolist(),
                    len_a.tolist(), ctrl13_a.tolist(), meaning_a.tolist(),
                    blk_nz.tolist(),
                ):
                    if bk != cur_blk:  # window never crosses blocks
                        cur_blk = bk
                        w_lead = -1
                    if ld >= w_lead >= 0 and tr >= w_trail:
                        ap1(0b10)
                        ap2(2)
                        ap3(xw >> w_trail)
                        ap4(w_len)
                    else:
                        ap1(c13)
                        ap2(13)
                        ap3(mn)
                        ap4(ln)
                        w_lead, w_len = ld, ln
                        w_trail = 64 - ld - ln
                fv[slots_nz] = v1
                fl[slots_nz] = l1
                fv[slots_nz + 1] = v2
                fl[slots_nz + 1] = l2
                return _finish_blob_batch(B, enc, headers, fv, fl, o, cf)
            nzc = np.bincount(blk_nz, minlength=B)  # nonzeros per block
            nzstart = np.cumsum(nzc) - nzc
            order = np.argsort(-nzc, kind="stable")  # active prefix shrinks
            c_sorted = nzc[order]
            w_lead = np.full(B, -1, dtype=np.int64)
            w_trail = np.full(B, 64, dtype=np.int64)
            max_steps = int(c_sorted[0]) if B else 0
            # lanes active at step k = first n_k entries of `order`
            n_at_step = np.searchsorted(-c_sorted, -(np.arange(max_steps) + 1), side="right")
            base = nzstart[order]
            for k in range(max_steps):
                lanes = order[: n_at_step[k]]
                idx = base[: n_at_step[k]] + k  # k-th nonzero of each lane
                ld, tr = lead_a[idx], trail_a[idx]
                wl, wt = w_lead[lanes], w_trail[lanes]
                reuse = (ld >= wl) & (wl >= 0) & (tr >= wt)
                s = slots_nz[idx]
                # clip the discarded-lane shift (initial wt=64 would be UB)
                wt_u = np.minimum(wt, 63).astype(np.uint64)
                fv[s] = np.where(reuse, np.uint64(0b10), ctrl13_a[idx])
                fl[s] = np.where(reuse, 2, 13)
                fv[s + 1] = np.where(reuse, x_nz[idx] >> wt_u, meaning_a[idx])
                fl[s + 1] = np.where(reuse, 64 - wl - wt, len_a[idx])
                w_lead[lanes] = np.where(reuse, wl, ld)
                w_trail[lanes] = np.where(reuse, wt, tr)
    return _finish_blob_batch(B, enc, headers, fv, fl, o, cf)


def _finish_blob_batch(B, enc, headers, fv, fl, o, cf) -> list[bytes]:
    """Shared tail of the batch encoders: byte-pad each blob's bitstream,
    pack all fields in one pass, split per blob, splice header-only
    blobs back in."""
    pad_slots = (o + cf)[enc]
    fl[pad_slots] = 0
    cfl = np.concatenate(([0], np.cumsum(fl)))
    bits = cfl[o + cf] - cfl[o]
    fl[pad_slots] = (-bits[enc]) % 8
    blobs = _split_blobs(
        [headers[i] for i in range(B) if enc[i]], fv, fl, bits[enc]
    )
    out: list[bytes] = []
    j = 0
    for i in range(B):
        if enc[i]:
            out.append(blobs[j])
            j += 1
        else:
            out.append(headers[i])
    return out


def encode_xor(values: np.ndarray) -> bytes:
    """C1 — XOR-encode one float64 stream (NaN/±inf/denormals all fine:
    everything operates on raw IEEE-754 bit patterns). Thin wrapper over
    the batch encoder."""
    return encode_xor_batch([np.asarray(values, dtype=np.float64)])[0]


def decode_xor(blob: bytes) -> np.ndarray:
    """C3 — exact inverse of encode_xor. '0'-control runs (repeated values,
    the common case on LOCF-filled series) are consumed in bulk; the output
    is materialized with one np.repeat over (value, run-length) pairs."""
    (n,) = struct.unpack_from("<I", blob, 0)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8, offset=4))
    cur = _read_bits(bits, 0, 64)
    pos = 64
    vals = [cur]
    reps = [1]
    ones = np.flatnonzero(bits)
    lead = 0
    length = 0
    i = 1
    while i < n:
        j = np.searchsorted(ones, pos)
        nxt = int(ones[j]) if j < ones.size else bits.size
        run = min(nxt - pos, n - i)  # consecutive '0' controls -> repeats
        if run > 0:
            reps[-1] += run
            i += run
            pos += run
            if i >= n:
                break
        if bits[pos + 1]:  # '11' — new window
            lead = _read_bits(bits, pos + 2, 5)
            length = _read_bits(bits, pos + 7, 6) + 1
            x = _read_bits(bits, pos + 13, length) << (64 - lead - length)
            pos += 13 + length
        else:  # '10' — reuse window
            x = _read_bits(bits, pos + 2, length) << (64 - lead - length)
            pos += 2 + length
        cur = (cur ^ x) & _U64
        vals.append(cur)
        reps.append(1)
        i += 1
    out = np.repeat(np.array(vals, dtype=np.uint64), np.array(reps, dtype=np.int64))
    return out.view(np.float64)


#: metrics compressed per block; cnt is cast to float64 (exact for < 2^53)
BLOCK_METRICS = ("n_tok_mean", "tok_mean", "cnt")


def block_start_col(ts_col, span_us: int) -> F.Column:
    """Span-floor of a timestamp column (block span in µs, a whole-day
    multiple — RollupConfig.span_us) — the per-tier generalization of
    date_trunc('day', ...). Whole-day spans keep the result day-aligned,
    so to_date(block_start) remains a valid disk partition value."""
    us = F.unix_micros(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    if span_us == 86_400_000_000:
        # identical bytes to the historical layout, and Catalyst folds it
        return F.date_trunc("day", F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    return F.timestamp_micros(us - F.pmod(us, F.lit(span_us)))


def compress_tier(filled: DataFrame, tier: str, cfg: RollupConfig | None = None) -> DataFrame:
    """C1+C2 as a grouped-map transform: one blob row per
    (source, tier, metric, span-block) — or one DECOMPOSED row per
    span-block when cfg.block_layout == 'decomposed' and the block's mean
    streams reconstruct bit-exactly from its integer sums (see the C4
    section below). Blocks span config.BLOCK_SPAN_DAYS[tier] whole days
    (coarse tiers amortize per-block headers across the span). Groups by
    source and encodes ALL of the source's blocks with the batch
    encoders — per-block numpy fixed costs amortize across the series
    (the 5 M pts/s/core budget), and the kernel sorts by bucket_start so
    every blob is byte-deterministic regardless of shuffle order."""
    cfg = cfg or RollupConfig()
    layout = cfg.block_layout
    sum_cols = [c for c in BLOCK_SUM_COLS if c in filled.columns]
    slim = filled.select(
        "source",
        "bucket_start",
        block_start_col("bucket_start", cfg.span_us(tier)).alias("block_start"),
        *[F.col(m).cast("double").alias(m) for m in BLOCK_METRICS],
        *[F.col(c).cast("double").alias(c) for c in sum_cols],
    )

    def encode_source(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        src = pdf["source"].iloc[0]
        rows = [(src, tier, *r) for r in encode_block_rows(pdf, layout)]
        return pd.DataFrame(
            rows,
            columns=["source", "tier", "metric", "block_start", "n_points", "ts_dod_blob", "val_xor_blob"],
        )

    return slim.groupBy("source").applyInPandas(
        encode_source, schema=schemas.BLOCK_SCHEMA
    )


def decompress_blocks(blocks: DataFrame, wanted: str | None = None) -> DataFrame:
    """C3 — blobs back to (source, tier, metric, bucket_start, value)
    points. Handles both layouts: classic per-metric XOR rows decode as
    before; __dec__ rows re-derive all three metric series from their
    integer streams (bit-exact by the encode-time guard). `wanted`
    restricts the output to one metric — classic rows are expected to be
    pre-filtered by the caller's pushed-down predicate, while __dec__
    rows decode their (cheap) integer streams and emit only the match."""

    import pyarrow  # noqa: F401  (arrow path required)

    out_schema = (
        "source string, tier string, metric string, bucket_start timestamp, value double"
    )

    def decode_iter(batches):
        # ALL blobs of the Arrow batch decode in one vectorized batch call
        # (module docstring): per-point cost amortizes across the batch's
        # blocks instead of paying per-blob Python loops.
        for pdf in batches:
            if not len(pdf):
                continue
            is_dec = (pdf["metric"] == DEC_METRIC).to_numpy()
            cls = pdf[~is_dec]
            if len(cls):
                ts_list = decode_dod_batch(list(cls["ts_dod_blob"]))
                val_list = decode_xor_batch(list(cls["val_xor_blob"]))
                counts = np.array([t.shape[0] for t in ts_list], dtype=np.int64)
                if int(counts.sum()) > 0:
                    out = pd.DataFrame(
                        {
                            "source": np.repeat(cls["source"].to_numpy(), counts),
                            "tier": np.repeat(cls["tier"].to_numpy(), counts),
                            "metric": np.repeat(cls["metric"].to_numpy(), counts),
                            "bucket_start": np.concatenate(ts_list).astype(
                                "datetime64[us]"
                            ),
                            "value": np.concatenate(val_list),
                        }
                    )
                    if wanted is not None:
                        out = out[out["metric"] == wanted]
                    if len(out):
                        yield out
            dec = pdf[is_dec]
            if len(dec):
                metric_names = (
                    BLOCK_METRICS if wanted is None else (wanted,)
                )
                frames = []
                base_all = (
                    dec["block_start"].to_numpy().astype("datetime64[us]").view(np.int64)
                )
                for row_i in range(len(dec)):
                    ts_us, streams = _dec_unpack(
                        dec["val_xor_blob"].iloc[row_i], int(base_all[row_i])
                    )
                    cnt_i, ntoksum, toksum, tokdiff = streams
                    cnt_f, ntm, tkm = _reconstruct_dec(
                        cnt_i, ntoksum, toksum, ntoksum + tokdiff
                    )
                    series = {"cnt": cnt_f, "n_tok_mean": ntm, "tok_mean": tkm}
                    ts = ts_us.view("datetime64[us]")
                    for m in metric_names:
                        frames.append(
                            pd.DataFrame(
                                {
                                    "source": dec["source"].iloc[row_i],
                                    "tier": dec["tier"].iloc[row_i],
                                    "metric": m,
                                    "bucket_start": ts,
                                    "value": series[m],
                                }
                            )
                        )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    return blocks.mapInPandas(decode_iter, schema=out_schema)


# ------------------------------------------------- decomposed blocks (C4)
#
# Round-3 layout upgrade. The three per-metric XOR streams of a day-block
# are redundant: cnt is an integer series, and both means are single exact
# float64 divisions of integer sums the rollup already carries
# (n_tok_mean = n_tok_sum/cnt, tok_mean = tok_sum/tok_cnt — rollup.py).
# Full-entropy float64 means sit at the IEEE-XOR floor (~2.3x, the
# documented dense-fixture ceiling), but their INTEGER numerators and
# denominators delta-pack to a few bits per point. A decomposed block
# stores ONE row per (source, tier, day) with four fixed-width
# zigzag-delta integer streams [cnt, locf(n_tok_sum), locf(tok_sum),
# locf(tok_cnt) - locf(n_tok_sum)] and re-derives all three metric series
# at decode with the same float64 divisions — bit-exact, verified AT
# ENCODE TIME per block (the encoder reconstructs and compares bitwise;
# any block that cannot round-trip exactly — linear-interpolated fill,
# observed-but-tokenless rows, >2^53 sums, a leading gap slot whose LOCF
# context lives in a previous batch — falls back to the classic
# per-metric XOR rows). The decision is a pure function of the block's
# content, so the incremental derive path (increment.py) makes the same
# choice as a full build and stays byte-identical.
#
# intzz blob: [n: uint16][w: uint8][v0: zigzag LEB128 varint] + (n-1)
#             zigzag deltas, each exactly w bits MSB-first (w == 0 means
#             a constant stream with no payload). Day blocks are <= 1440
#             points, so uint16 n suffices; the varint v0 keeps 1-point
#             blocks (the whole 1d tier by construction) from paying 8
#             header bytes per stream for a value that fits in 2-5.
# dec payload: [0xD1][5 x uint16 lens LE][ts stream][intzz cnt]
#              [intzz n_tok_sum][intzz tok_sum][intzz (tok_cnt -
#              n_tok_sum)]; len == 0 marks an OMITTED all-zero stream
#             (tok_cnt == n_tok_sum is the common case), reconstructed as
#             zeros over the cnt stream's point count. The ts stream is
#             [varint t0_us][intzz of the bucket deltas] — second-order
#             like DoD, so a regular grid costs ~16 bytes for the whole
#             block; dec rows leave ts_dod_blob EMPTY (the 12-byte DoD
#             header per day-block is the dominant cost of 1-point 1d
#             blocks).

DEC_METRIC = "__dec__"
BLOCK_SUM_COLS = ("n_tok_sum", "tok_sum", "tok_cnt")
_DEC_MAGIC = 0xD1       # legacy round-3 layout (decode-only)
_DEC_MAGIC_V2 = 0xD2    # predictor-residual streams, varint lengths
_DEC_MAGIC_TINY = 0xD3  # legacy n <= 4 bare-varint blocks (decode-only)
_DEC_MAGIC_V4 = 0xD4    # n <= 4 packed header: n+flags byte, minute-grid
_DEC_MAGIC_V6 = 0xD6    # n <= 4 revision of v4 (round 5): 2-bit grid
#                         granularity (unaligned/minute/hour/day) instead
#                         of the single minute flag — 1h/1d bucket stamps
#                         cost 1 byte — and PLAIN varints for the first
#                         values of the non-negative cnt/ntok/tok streams
#                         (zigzag doubled them for nothing)
_DEC_MAGIC_V5 = 0xD5    # n > 4 headerless stream bodies (round 5): one
#                         shared varint n, no per-stream <H n> fields or
#                         length varints — every intzz mode's consumed
#                         length is derivable during decode, so bodies
#                         lay end-to-end (~15 B/block off the v2 layout)
#                         ts varints, all-zero streams omitted
_MINUTE_US = 60_000_000
_U64_ALL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | (0x80 if u else 0))
        if not u:
            return bytes(out)


def _unvarint(blob: bytes, off: int) -> tuple[int, int]:
    u = sh = 0
    while True:
        b = blob[off]
        off += 1
        u |= (b & 0x7F) << sh
        if not b & 0x80:
            return u, off
        sh += 7


#: deltas per miniblock in the adaptive-width intzz mode (format constant)
_MB = 64
#: width-byte sentinel selecting the delta-miniblock mode (widths are <= 64)
_MB_MODE = 255
#: sentinel for the VALUE-mode miniblocks: offsets from min(a) with no
#: differencing — wins on iid-noise series (predictor residuals), where
#: differencing doubles the variance (~+1 bit/value)
_VAL_MODE = 254
#: Rice/Golomb split-stream sentinels (round 5): same FOR offset arrays as
#: the two miniblock modes, entropy-coded instead of width-packed. Per
#: value: unary quotient (u >> k, as q '0' bits + a '1' terminator) in one
#: contiguous bit stream, then all k-bit remainders in a second fixed-width
#: stream — split streams keep BOTH encode and decode fully vectorized
#: (unary decode = flatnonzero over unpackbits; remainders = one reshape
#: dot). Geometric-ish residuals (Poisson counts, predictor noise) pay
#: ~H(u) bits instead of the per-64-miniblock MAX width — measured ~20%
#: off the dense-1m-block mass. Validity: k is chosen so max quotient
#: <= 63 (single _pack_fields field), which costs nothing on real data
#: (optimal k is always within 6 of the max bit length).
_RICE_D_MODE = 253
_RICE_V_MODE = 252
#: Centered-zigzag Rice modes (round 5, second pass). The FOR transform the
#: four modes above share re-biases a zero-centered residual stream by
#: |min| ~ 3 sigma before coding, which costs Rice ~1 bit/value on the
#: predictor-residual streams (measured: r1 14.5 KB -> 13.8, r2 24.8 ->
#: 23.8 on the sf0.1 store). These two code the zigzag directly:
#: - 251: zigzag(deltas), no FOR — wins on drifting residuals where the
#:   delta re-whitens but the delta min is far from zero;
#: - 250: zigzag(values - center), center chosen per stream from
#:   {0, median} and stored as a zigzag varint — wins on zero/near-zero
#:   centered residuals (the common case for r1/r2) and on offset-mean
#:   streams like cnt (median centering beat delta coding there).
_RICE_ZD_MODE = 251
_RICE_ZV_MODE = 250


def _mb_widths(u: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-64-value miniblock bit widths of a uint64 offset array ->
    (widths, counts, payload_bytes_excluding_width_bytes)."""
    m = u.shape[0]
    nmb = (m + _MB - 1) // _MB
    pad = nmb * _MB - m
    up = np.concatenate([u, np.zeros(pad, dtype=np.uint64)]) if pad else u
    wmb = _bitlen64(up).reshape(nmb, _MB).max(axis=1)
    cnts = np.full(nmb, _MB, dtype=np.int64)
    cnts[-1] = m - (nmb - 1) * _MB
    return wmb, cnts, int(((wmb * cnts + 7) // 8).sum())


def _mb_pack(u: np.ndarray, wmb: np.ndarray, cnts: np.ndarray) -> list[bytes]:
    parts = []
    off = 0
    for i in range(wmb.shape[0]):
        c, wi = int(cnts[i]), int(wmb[i])
        if wi:
            parts.append(_pack_fields(u[off : off + c], np.full(c, wi, np.int64)))
        off += c
    return parts


def _mb_unpack(blob: bytes, off: int, m: int) -> tuple[np.ndarray, int]:
    """Read nmb width bytes + byte-aligned miniblock payloads ->
    (uint64[m], end offset)."""
    nmb = (m + _MB - 1) // _MB
    wmb = np.frombuffer(blob, dtype=np.uint8, count=nmb, offset=off)
    off += nmb
    u = np.empty(m, dtype=np.uint64)
    pos = 0
    for wi in wmb:
        c = min(_MB, m - pos)
        wi = int(wi)
        if wi == 0:
            u[pos : pos + c] = 0
        else:
            nb = (c * wi + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(blob, dtype=np.uint8, count=nb, offset=off),
                count=c * wi,
            ).reshape(c, wi).astype(np.uint64)
            pw = np.uint64(1) << np.arange(wi - 1, -1, -1, dtype=np.uint64)
            u[pos : pos + c] = (bits * pw).sum(axis=1, dtype=np.uint64)
            off += nb
        pos += c
    return u, off


def _rice_plan(u: np.ndarray) -> tuple[int, int]:
    """Best Rice parameter for a uint64 offset array -> (k, payload_bytes),
    payload = unary stream + remainder stream (headers excluded). Only k
    with max quotient <= 63 are encodable (see _RICE_D_MODE note), so the
    candidate range is the 7 values [max(0, wmax-6), wmax] — quotient sums
    there are tiny and exact in int64. Returns (-1, huge) when u is empty."""
    m = u.shape[0]
    if m == 0:
        return -1, 1 << 60
    wmax = int(_bitlen64(u).max())
    best_k, best_bits = -1, 1 << 62
    for k in range(max(0, wmax - 6), min(wmax, 63) + 1):
        q = u >> np.uint64(k)
        if int(q.max()) > 63:
            continue
        bits = m * (k + 1) + int(q.sum())
        if bits < best_bits:
            best_k, best_bits = k, bits
    if best_k < 0:
        return -1, 1 << 60
    qsum = int((u >> np.uint64(best_k)).sum())
    nub = (qsum + m + 7) // 8
    nrb = (m * best_k + 7) // 8
    return best_k, len(_varint(nub)) + 1 + nub + nrb


def _rice_pack(u: np.ndarray, k: int) -> bytes:
    """[k: uint8][varint unary_bytes][unary stream][remainder stream]."""
    m = u.shape[0]
    q = (u >> np.uint64(k)).astype(np.int64)
    unary = _pack_fields(np.ones(m, dtype=np.uint64), q + 1)
    rem = (
        _pack_fields(u & np.uint64((1 << k) - 1), np.full(m, k, dtype=np.int64))
        if k
        else b""
    )
    return struct.pack("<B", k) + _varint(len(unary)) + unary + rem


def _rice_unpack(blob: bytes, off: int, m: int) -> np.ndarray:
    """Inverse of _rice_pack -> (uint64[m], end offset)."""
    k = blob[off]
    nub, off = _unvarint(blob, off + 1)
    ones = np.flatnonzero(
        np.unpackbits(np.frombuffer(blob, dtype=np.uint8, count=nub, offset=off))
    )[:m]
    q = np.diff(ones, prepend=-1) - 1  # q[i] = zeros before the i-th '1'
    u = q.astype(np.uint64) << np.uint64(k)
    off += nub
    if k:
        nrb = (m * k + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(blob, dtype=np.uint8, count=nrb, offset=off),
            count=m * k,
        ).reshape(m, k).astype(np.uint64)
        pw = np.uint64(1) << np.arange(k - 1, -1, -1, dtype=np.uint64)
        u |= (bits * pw).sum(axis=1, dtype=np.uint64)
        off += nrb
    return u, off


def encode_intzz(a: np.ndarray) -> bytes:
    """Zigzag-delta pack of an int64 series, <= 65535 points (format
    above — day blocks cap at 1440).

    Two payload modes, chosen per stream as a PURE function of content
    (the incremental derive's byte-identity to full builds depends on
    that purity):
    - fixed width: one global w = max bitlen over all deltas (header
      w field), every delta packed at w bits — the round-3 format;
    - FOR + miniblock widths (header w = 255 sentinel): the stream's
      MIN delta is subtracted first (frame of reference — a constant
      non-zero slope packs to zero-width miniblocks), then the
      offsets split into 64-delta miniblocks, one width byte per
      miniblock, each miniblock's payload byte-aligned (Parquet
      DELTA_BINARY_PACKED family). A single spike no longer widens
      the whole stream — on bursty cnt/sum series this is the round-4
      compression lever.
    Miniblock mode is taken only when STRICTLY smaller, so streams the
    round-3 tests pin (constant, singleton, uniform-width) are
    byte-unchanged."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    n = a.shape[0]
    assert n < 65536, n
    if n == 0:
        return struct.pack("<HB", 0, 0)
    v0 = int(a[0])
    v0z = (v0 << 1) ^ (v0 >> 63)  # python ints: exact zigzag
    d = np.diff(a)
    u = d.view(np.uint64)
    z = (u << np.uint64(1)) ^ np.where(d < 0, _U64_ALL, np.uint64(0))
    w = int(_bitlen64(z).max()) if z.size else 0
    head = struct.pack("<HB", n, w) + _varint(v0z)
    if w == 0:
        return head
    m = z.shape[0]
    fixed_payload = (m * w + 7) // 8
    # delta-FOR candidate: offsets from the min delta (modular uint64 —
    # exact for the full int64 delta range), per-miniblock widths
    min_d = int(d.min())
    ud = u - np.uint64(min_d & _U64)
    mz = (min_d << 1) ^ (min_d >> 63)
    d_wmb, d_cnts, d_bytes = _mb_widths(ud)
    mb_payload = len(_varint(mz)) + d_wmb.shape[0] + d_bytes
    # value-FOR candidate: offsets from min(a), no differencing (n values)
    min_a = int(a.min())
    ua = a.view(np.uint64) - np.uint64(min_a & _U64)
    az = (min_a << 1) ^ (min_a >> 63)
    v_wmb, v_cnts, v_bytes = _mb_widths(ua)
    val_payload = len(_varint(az)) + v_wmb.shape[0] + v_bytes - len(_varint(v0z))
    # Rice candidates over the SAME two offset arrays (round 5); they enter
    # the min() last so every stream a legacy mode encoded at equal size is
    # byte-unchanged (frozen-blob tests, incremental parity across stores)
    rk_d, rice_d_bytes = _rice_plan(ud)
    rice_d_payload = len(_varint(mz)) + rice_d_bytes
    rk_v, rice_v_bytes = _rice_plan(ua)
    rice_v_payload = len(_varint(az)) + rice_v_bytes - len(_varint(v0z))
    # centered-zigzag Rice candidates (see the 250/251 mode note): zigzag
    # deltas as-is, and zigzag values around the better of {0, median}
    rk_zd, rice_zd_bytes = _rice_plan(z)
    center = 0
    zv = (a << 1) ^ (a >> 63)
    rk_zv, rice_zv_bytes = _rice_plan(zv.view(np.uint64))
    # clamp the center into int64: for streams hugging int64-max the
    # float64 median rounds to exactly 2**63 and `a - med` would fail
    # numpy's int64 promotion (ADVICE r5). 2**63-1 keeps the centered
    # candidate valid — wrapping int64 subtraction round-trips exactly
    # under mod-2^64, same as any other wide-range center.
    med = min(int(np.median(a)), (1 << 63) - 1)
    if med != 0:
        ac = a - med
        zvm = (ac << 1) ^ (ac >> 63)
        rk_zvm, rice_zvm_bytes = _rice_plan(zvm.view(np.uint64))
        czz_m = (med << 1) ^ (med >> 63)
        if len(_varint(czz_m)) + rice_zvm_bytes < len(_varint(0)) + rice_zv_bytes:
            center, zv, rk_zv, rice_zv_bytes = med, zvm, rk_zvm, rice_zvm_bytes
    czz = (center << 1) ^ (center >> 63)
    rice_zv_payload = len(_varint(czz)) + rice_zv_bytes - len(_varint(v0z))
    best = min(
        fixed_payload, mb_payload, val_payload, rice_d_payload, rice_v_payload,
        rice_zd_bytes, rice_zv_payload,
    )
    if best == fixed_payload:
        return head + _pack_fields(z, np.full(m, w, dtype=np.int64))
    if best == mb_payload:
        return b"".join(
            [
                struct.pack("<HB", n, _MB_MODE),
                _varint(v0z),
                _varint(mz),
                d_wmb.astype(np.uint8).tobytes(),
                *_mb_pack(ud, d_wmb, d_cnts),
            ]
        )
    if best == val_payload:
        return b"".join(
            [
                struct.pack("<HB", n, _VAL_MODE),
                _varint(az),
                v_wmb.astype(np.uint8).tobytes(),
                *_mb_pack(ua, v_wmb, v_cnts),
            ]
        )
    if best == rice_d_payload:
        return (
            struct.pack("<HB", n, _RICE_D_MODE)
            + _varint(v0z)
            + _varint(mz)
            + _rice_pack(ud, rk_d)
        )
    if best == rice_v_payload:
        return (
            struct.pack("<HB", n, _RICE_V_MODE) + _varint(az) + _rice_pack(ua, rk_v)
        )
    if best == rice_zd_bytes:
        return (
            struct.pack("<HB", n, _RICE_ZD_MODE)
            + _varint(v0z)
            + _rice_pack(z, rk_zd)
        )
    return (
        struct.pack("<HB", n, _RICE_ZV_MODE)
        + _varint(czz)
        + _rice_pack(zv.view(np.uint64), rk_zv)
    )


def decode_intzz(blob: bytes) -> np.ndarray:
    """Inverse of encode_intzz (all five payload modes)."""
    n, w = struct.unpack_from("<HB", blob, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    a, _end = _intzz_body_decode(blob, 2, n)
    return a


def _intzz_body(a: np.ndarray) -> bytes:
    """encode_intzz payload without the <H n> count field (mode byte kept):
    for container layouts (v5 blocks) that share one n across streams."""
    return encode_intzz(a)[2:]


def _intzz_body_decode(blob: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    """Decode an intzz body (mode byte at `off`, count supplied) ->
    (int64[n], end offset). Every mode's consumed length is derivable
    during the decode, so bodies can be laid end-to-end with no length
    prefixes — the v5 block layout depends on that."""
    w = blob[off]
    off += 1
    if w == _VAL_MODE:  # no v0 varint in this mode — values stand alone
        az, off = _unvarint(blob, off)
        min_a = (az >> 1) ^ -(az & 1)
        ua, off = _mb_unpack(blob, off, n)
        return (ua + np.uint64(min_a & _U64)).view(np.int64), off
    if w == _RICE_V_MODE:
        az, off = _unvarint(blob, off)
        min_a = (az >> 1) ^ -(az & 1)
        ua, off = _rice_unpack(blob, off, n)
        return (ua + np.uint64(min_a & _U64)).view(np.int64), off
    if w == _RICE_ZV_MODE:
        czz, off = _unvarint(blob, off)
        center = (czz >> 1) ^ -(czz & 1)
        u, off = _rice_unpack(blob, off, n)
        a = ((u >> _ONE) ^ (np.uint64(0) - (u & _ONE))).view(np.int64)
        return a + np.int64(center), off
    v0z, off = _unvarint(blob, off)
    v0 = (v0z >> 1) ^ -(v0z & 1)
    out = np.empty(n, dtype=np.int64)
    out[0] = v0
    if n == 1:
        return out, off
    if w == 0:
        out[1:] = v0
        return out, off
    m = n - 1
    if w in (_MB_MODE, _RICE_D_MODE):
        mz, off = _unvarint(blob, off)
        min_d = (mz >> 1) ^ -(mz & 1)
        ud, off = (
            _mb_unpack(blob, off, m)
            if w == _MB_MODE
            else _rice_unpack(blob, off, m)
        )
        d = (ud + np.uint64(min_d & _U64)).view(np.int64)
        np.cumsum(d, out=out[1:])
        out[1:] += v0
        return out, off
    if w == _RICE_ZD_MODE:
        u, off = _rice_unpack(blob, off, m)
        d = ((u >> _ONE) ^ (np.uint64(0) - (u & _ONE))).view(np.int64)
        np.cumsum(d, out=out[1:])
        out[1:] += v0
        return out, off
    nb = (m * w + 7) // 8
    bits = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8, count=nb, offset=off), count=m * w
    ).reshape(m, w).astype(np.uint64)
    pw = np.uint64(1) << np.arange(w - 1, -1, -1, dtype=np.uint64)
    z = (bits * pw).sum(axis=1, dtype=np.uint64)
    d = ((z >> np.uint64(1)) ^ (np.uint64(0) - (z & np.uint64(1)))).view(np.int64)
    np.cumsum(d, out=out[1:])
    out[1:] += v0
    return out, off + nb


def _encode_ts_stream(ts_us: np.ndarray, base_us: int) -> bytes:
    """[varint (t0 - block_start)][intzz of bucket deltas] — second-order,
    so a regular grid packs to a constant-delta intzz stream with zero
    payload bits; the span-relative t0 fits a <=7-byte varint (block_start
    is a stored row column, so the absolute epoch never enters the
    payload)."""
    return _varint(int(ts_us[0]) - base_us) + encode_intzz(np.diff(ts_us))


def _decode_ts_stream(blob: bytes, n: int, base_us: int) -> np.ndarray:
    rel, off = _unvarint(blob, 0)
    t0 = base_us + rel
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    if n > 1:
        np.cumsum(decode_intzz(blob[off:]), out=out[1:])
        out[1:] += t0
    return out


def _dec_pack(streams: list[bytes]) -> bytes:
    """Legacy (round-3, magic 0xD1) layout — kept so old stores decode."""
    return (
        struct.pack("<B5H", _DEC_MAGIC, *[len(s) for s in streams])
        + b"".join(streams)
    )


def _zzvarint(v: int) -> bytes:
    return _varint((v << 1) ^ (v >> 63))


def _unzzvarint(blob: bytes, off: int) -> tuple[int, int]:
    u, off = _unvarint(blob, off)
    return (u >> 1) ^ -(u & 1), off


def _dec_encode(
    ts_us: np.ndarray, base_us: int,
    cnt_i: np.ndarray, ntoksum: np.ndarray, toksum: np.ndarray,
    tokdiff: np.ndarray,
) -> bytes:
    """Round-4 decomposed payload. Two layouts, chosen by size (a pure
    function of block content — the incremental-parity requirement):

    - v2 (magic 0xD2): PREDICTOR-RESIDUAL streams. The sum streams are
      strongly correlated with their drivers (n_tok_sum ~ K1*cnt,
      tok_sum ~ K2*tok_cnt); storing per-block integer gains K1/K2 and
      the exact residuals cuts each stream by the predictable bits
      (sigma*sqrt(cnt) noise remains instead of the full magnitude).
      Gap slots predict exactly (LOCF'd numerator over LOCF'd driver)
      so residuals go constant there. Stream lengths are varints (the
      fixed <5H> header taxed small blocks).
    - v4 (magic 0xD4): TINY blocks (n <= 4) as bare zigzag varints with
      no per-stream headers — the 484-of-609 one-point blocks of the
      sf0.1 store cost ~13 bytes instead of ~35. Round-5 revision of the
      v3 tiny layout (0xD3, now decode-only): one packed header byte
      carries n (2 bits), a minute-grid flag and four stream-presence
      bits, so an all-zero stream (tok_cnt == n_tok_sum is the common
      case) costs 0 bytes instead of n, and rollup bucket timestamps —
      always whole minutes — store as minute-index varints (1 byte for a
      1h delta) instead of zigzag microsecond varints (5 bytes).
    """
    n = cnt_i.shape[0]
    obs = cnt_i > 0
    locf_cnt = _locf_obs(cnt_i, obs)
    tot_c = int(locf_cnt.sum())
    k1 = int(ntoksum.sum()) // tot_c if tot_c else 0
    r1 = ntoksum - k1 * locf_cnt
    tokcnt = ntoksum + tokdiff
    tot_t = int(tokcnt.sum())
    k2 = int(toksum.sum()) // tot_t if tot_t else 0
    r2 = toksum - k2 * tokcnt
    streams = [
        _encode_ts_stream(ts_us, base_us),
        encode_intzz(cnt_i),
        b"" if not r1.any() else encode_intzz(r1),
        b"" if not r2.any() else encode_intzz(r2),
        b"" if not tokdiff.any() else encode_intzz(tokdiff),
    ]
    v2 = b"".join(
        [
            struct.pack("<B", _DEC_MAGIC_V2),
            _zzvarint(k1),
            _zzvarint(k2),
            *[_varint(len(s)) for s in streams],
            *streams,
        ]
    )
    if n > 4:
        # v5: same streams, headerless — drop the five <H n> count fields
        # (one shared varint n) and the five length varints (bodies are
        # self-delimiting). Strictly smaller than v2 except degenerate
        # varint-n edge cases, but min() keeps selection content-pure.
        flags5 = (
            int(r1.any()) | (int(r2.any()) << 1) | (int(tokdiff.any()) << 2)
        )
        v5 = b"".join(
            [
                struct.pack("<BB", _DEC_MAGIC_V5, flags5),
                _varint(n),
                _zzvarint(k1),
                _zzvarint(k2),
                _varint(int(ts_us[0]) - base_us),
                _intzz_body(np.diff(ts_us)),
                _intzz_body(cnt_i),
                b"" if not r1.any() else _intzz_body(r1),
                b"" if not r2.any() else _intzz_body(r2),
                b"" if not tokdiff.any() else _intzz_body(tokdiff),
            ]
        )
        out = v5 if len(v5) < len(v2) else v2
        ts2, (c2, n2, t2, td2) = _dec_unpack(out, base_us)
        if not (
            np.array_equal(ts2, ts_us)
            and np.array_equal(c2, cnt_i)
            and np.array_equal(n2, ntoksum)
            and np.array_equal(t2, toksum)
            and np.array_equal(td2, tokdiff)
        ):  # pragma: no cover - defensive: never expected to fire
            raise AssertionError("decomposed payload failed encode-time round-trip")
        return out
    rel = ts_us - base_us  # >= 0: base_us is the day floor of ts_us[0]
    aligned = bool((rel % _MINUTE_US == 0).all())
    streams = (cnt_i, ntoksum, toksum, tokdiff)
    flags = 0
    for bit, s in enumerate(streams):
        if s.any():
            flags |= 1 << bit
    hdr = (n - 1) | (int(aligned) << 2) | (flags << 3)
    parts = [struct.pack("<BB", _DEC_MAGIC_V4, hdr)]
    if aligned:
        parts.append(_varint(int(rel[0]) // _MINUTE_US))
        for dv in np.diff(rel):
            parts.append(_varint(int(dv) // _MINUTE_US))
    else:
        parts.append(_varint(int(rel[0])))
        for dv in np.diff(ts_us):
            parts.append(_zzvarint(int(dv)))
    for s in streams:
        if not s.any():
            continue
        parts.append(_zzvarint(int(s[0])))
        for dv in np.diff(s):
            parts.append(_zzvarint(int(dv)))
    v4 = b"".join(parts)
    # v6 candidate: 2-bit grid (0 unaligned / 1 minute / 2 hour / 3 day)
    # replaces the minute flag, and the known-non-negative streams
    # (cnt, ntoksum, toksum) store their first value as a plain varint.
    # tokdiff keeps zigzag (it can be negative); deltas keep zigzag.
    grid = 0
    for gi, g_us in ((3, 86_400_000_000), (2, 3_600_000_000), (1, _MINUTE_US)):
        if (rel % g_us == 0).all():
            grid = gi
            break
    g_us = {1: _MINUTE_US, 2: 3_600_000_000, 3: 86_400_000_000}.get(grid, 1)
    hdr6 = (n - 1) | (grid << 2) | (flags << 4)
    parts = [struct.pack("<BB", _DEC_MAGIC_V6, hdr6)]
    if grid:
        parts.append(_varint(int(rel[0]) // g_us))
        for dv in np.diff(rel):
            parts.append(_varint(int(dv) // g_us))
    else:
        parts.append(_varint(int(rel[0])))
        for dv in np.diff(ts_us):
            parts.append(_zzvarint(int(dv)))
    for bit, s in enumerate(streams):
        if not s.any():
            continue
        first = int(s[0])
        if bit < 3 and first >= 0:
            parts.append(_varint(first))
        else:  # tokdiff, or a (contract-violating) negative first value
            parts.append(_zzvarint(first))
        for dv in np.diff(s):
            parts.append(_zzvarint(int(dv)))
    v6 = b"".join(parts)
    if any(int(s[0]) < 0 for s in streams[:3] if s.any()):
        v6 = v4  # zigzag/plain ambiguity — refuse v6 for this content
    # tie order v4 > v2 > v6: v4-vs-v2 keeps the pre-v6 preference, so any
    # block a round-5 store already encoded at equal size stays byte-stable
    out = min((v4, v2, v6), key=len)
    # encode-time round-trip: the decomposed contract is "bitwise-verified
    # at encode"; the residual transform lives on this side of
    # try_decompose_block's stream verification, so verify THROUGH the
    # actual payload (decode is ~10x encode throughput — cheap insurance)
    ts2, (c2, n2, t2, td2) = _dec_unpack(out, base_us)
    if not (
        np.array_equal(ts2, ts_us)
        and np.array_equal(c2, cnt_i)
        and np.array_equal(n2, ntoksum)
        and np.array_equal(t2, toksum)
        and np.array_equal(td2, tokdiff)
    ):  # pragma: no cover - defensive: never expected to fire
        raise AssertionError("decomposed payload failed encode-time round-trip")
    return out


def _dec_unpack(blob: bytes, base_us: int) -> tuple[np.ndarray, list[np.ndarray]]:
    """-> (ts_us, [cnt, n_tok_sum, tok_sum, tokdiff]) int64 arrays.
    Dispatches on the layout magic: 0xD1 (legacy), 0xD2 (predictor
    residuals), 0xD3 (tiny varint blocks)."""
    magic = blob[0]
    if magic == _DEC_MAGIC_V6:
        hdr = blob[1]
        n = (hdr & 0b11) + 1
        grid = (hdr >> 2) & 0b11
        flags = (hdr >> 4) & 0b1111
        g_us = {1: _MINUTE_US, 2: 3_600_000_000, 3: 86_400_000_000}.get(grid, 1)
        ts = np.empty(n, dtype=np.int64)
        u, off = _unvarint(blob, 2)
        ts[0] = base_us + u * g_us
        for i in range(1, n):
            if grid:
                dv, off = _unvarint(blob, off)
                ts[i] = ts[i - 1] + dv * g_us
            else:
                dv, off = _unzzvarint(blob, off)
                ts[i] = ts[i - 1] + dv
        streams = []
        for bit in range(4):
            if not flags & (1 << bit):
                streams.append(np.zeros(n, dtype=np.int64))
                continue
            s = np.empty(n, dtype=np.int64)
            if bit < 3:
                v, off = _unvarint(blob, off)
            else:
                v, off = _unzzvarint(blob, off)
            s[0] = v
            for i in range(1, n):
                dv, off = _unzzvarint(blob, off)
                s[i] = s[i - 1] + dv
            streams.append(s)
        return ts, streams
    if magic == _DEC_MAGIC_V4:
        hdr = blob[1]
        n = (hdr & 0b11) + 1
        aligned = bool(hdr & 0b100)
        flags = (hdr >> 3) & 0b1111
        ts = np.empty(n, dtype=np.int64)
        if aligned:
            u, off = _unvarint(blob, 2)
            ts[0] = base_us + u * _MINUTE_US
            for i in range(1, n):
                u, off = _unvarint(blob, off)
                ts[i] = ts[i - 1] + u * _MINUTE_US
        else:
            u, off = _unvarint(blob, 2)
            ts[0] = base_us + u
            for i in range(1, n):
                dv, off = _unzzvarint(blob, off)
                ts[i] = ts[i - 1] + dv
        streams = []
        for bit in range(4):
            if not flags & (1 << bit):
                streams.append(np.zeros(n, dtype=np.int64))
                continue
            s = np.empty(n, dtype=np.int64)
            v, off = _unzzvarint(blob, off)
            s[0] = v
            for i in range(1, n):
                dv, off = _unzzvarint(blob, off)
                s[i] = s[i - 1] + dv
            streams.append(s)
        return ts, streams
    if magic == _DEC_MAGIC_TINY:
        n = blob[1]
        rel, off = _unvarint(blob, 2)
        ts = np.empty(n, dtype=np.int64)
        ts[0] = base_us + rel
        for i in range(1, n):
            dv, off = _unzzvarint(blob, off)
            ts[i] = ts[i - 1] + dv
        streams = []
        for _ in range(4):
            s = np.empty(n, dtype=np.int64)
            v, off = _unzzvarint(blob, off)
            s[0] = v
            for i in range(1, n):
                dv, off = _unzzvarint(blob, off)
                s[i] = s[i - 1] + dv
            streams.append(s)
        return ts, streams
    if magic == _DEC_MAGIC_V5:
        flags = blob[1]
        n, off = _unvarint(blob, 2)
        k1, off = _unzzvarint(blob, off)
        k2, off = _unzzvarint(blob, off)
        rel, off = _unvarint(blob, off)
        ts = np.empty(n, dtype=np.int64)
        ts[0] = base_us + rel
        if n > 1:
            d, off = _intzz_body_decode(blob, off, n - 1)
            np.cumsum(d, out=ts[1:])
            ts[1:] += ts[0]
        cnt, off = _intzz_body_decode(blob, off, n)
        rs = []
        for bit in range(3):
            if flags & (1 << bit):
                r, off = _intzz_body_decode(blob, off, n)
            else:
                r = np.zeros(n, dtype=np.int64)
            rs.append(r)
        locf_cnt = _locf_obs(cnt, cnt > 0)
        ntoksum = rs[0] + k1 * locf_cnt
        tokdiff = rs[2]
        toksum = rs[1] + k2 * (ntoksum + tokdiff)
        return ts, [cnt, ntoksum, toksum, tokdiff]
    if magic == _DEC_MAGIC_V2:
        k1, off = _unzzvarint(blob, 1)
        k2, off = _unzzvarint(blob, off)
        lens = []
        for _ in range(5):
            ln, off = _unvarint(blob, off)
            lens.append(ln)
        raw = []
        for ln in lens:
            raw.append(blob[off : off + ln] if ln else None)
            off += ln
        cnt = decode_intzz(raw[1])
        n = cnt.shape[0]
        zero = lambda r: (  # noqa: E731
            np.zeros(n, dtype=np.int64) if r is None else decode_intzz(r)
        )
        locf_cnt = _locf_obs(cnt, cnt > 0)
        ntoksum = zero(raw[2]) + k1 * locf_cnt
        tokdiff = zero(raw[4])
        toksum = zero(raw[3]) + k2 * (ntoksum + tokdiff)
        return _decode_ts_stream(raw[0], n, base_us), [cnt, ntoksum, toksum, tokdiff]
    assert magic == _DEC_MAGIC, f"bad decomposed-block magic {magic:#x}"
    _, lt, l0, l1, l2, l3 = struct.unpack_from("<B5H", blob, 0)
    off = 11
    ts_raw = blob[off : off + lt]
    off += lt
    out: list = []
    for ln in (l0, l1, l2, l3):
        if ln == 0:  # omitted all-zero stream
            out.append(None)
        else:
            out.append(decode_intzz(blob[off : off + ln]))
        off += ln
    n = out[0].shape[0]
    streams = [np.zeros(n, dtype=np.int64) if s is None else s for s in out]
    return _decode_ts_stream(ts_raw, n, base_us), streams


def _locf_obs(v: np.ndarray, obs: np.ndarray) -> np.ndarray:
    """LOCF over observed slots (callers guarantee obs[0] is True)."""
    idx = np.maximum.accumulate(np.where(obs, np.arange(v.shape[0]), -1))
    return v[np.maximum(idx, 0)]


def _reconstruct_dec(cnt_i, ntoksum, toksum, tokcnt):
    """Integer streams -> (cnt, n_tok_mean, tok_mean) float64 series via
    the SAME single float64 divisions the rollup performs."""
    cnt_f = cnt_i.astype(np.float64)
    den1 = _locf_obs(cnt_i, cnt_i > 0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ntm = np.where(den1 > 0, ntoksum.astype(np.float64) / den1, np.nan)
        tkm = np.where(
            tokcnt > 0, toksum.astype(np.float64) / tokcnt.astype(np.float64), np.nan
        )
    return cnt_f, ntm, tkm


def _bit_same(got: np.ndarray, want: np.ndarray) -> bool:
    return np.array_equal(got, want, equal_nan=True) and np.array_equal(
        np.signbit(got), np.signbit(want)
    )


def try_decompose_block(
    cnt_f: np.ndarray, ntm: np.ndarray, tkm: np.ndarray,
    ntoksum_raw: np.ndarray, toksum_raw: np.ndarray, tokcnt_raw: np.ndarray,
    ts_us: np.ndarray | None = None, base_us: int | None = None,
) -> bytes | None:
    """Build the decomposed payload for one span-block, or None when exact
    reconstruction is impossible (the caller then emits classic rows)."""
    n = cnt_f.shape[0]
    if n == 0 or not cnt_f[0] > 0:
        # a leading gap slot needs LOCF context from outside the block
        # (previous day / previous batch) — not self-contained, skip
        return None
    obs = cnt_f > 0
    for v in (cnt_f, ntoksum_raw, toksum_raw, tokcnt_raw):
        vo = v[obs]
        if (
            not np.all(np.isfinite(vo))
            or np.any(np.abs(vo) >= 2**53)
            or not np.all(vo == np.floor(vo))
        ):
            return None
    cnt_i = cnt_f.astype(np.int64)
    ntoksum = _locf_obs(np.where(obs, ntoksum_raw, 0.0), obs).astype(np.int64)
    toksum = _locf_obs(np.where(obs, toksum_raw, 0.0), obs).astype(np.int64)
    tokcnt = _locf_obs(np.where(obs, tokcnt_raw, 0.0), obs).astype(np.int64)
    rec_cnt, rec_ntm, rec_tkm = _reconstruct_dec(cnt_i, ntoksum, toksum, tokcnt)
    if not (
        _bit_same(rec_cnt, cnt_f)
        and _bit_same(rec_ntm, ntm)
        and _bit_same(rec_tkm, tkm)
    ):
        return None
    tokdiff = tokcnt - ntoksum
    if ts_us is None:  # unit-test convenience: synthesize a regular grid
        ts_us = np.arange(n, dtype=np.int64) * 60_000_000
    ts_us = np.ascontiguousarray(ts_us, dtype=np.int64)
    if base_us is None:  # unit-test convenience: legacy day-block base
        base_us = (int(ts_us[0]) // 86_400_000_000) * 86_400_000_000
    return _dec_encode(ts_us, base_us, cnt_i, ntoksum, toksum, tokdiff)


def encode_block_rows(pdf: pd.DataFrame, layout: str) -> list[tuple]:
    """Shared span-block builder for compress_tier, the fused derive kernel
    and the incremental segment kernel: a SORTED one-(source, tier) frame
    in, [(metric, block_start, n_points, ts_blob, val_blob), ...] out
    (block spans per config.BLOCK_SPAN_DAYS).
    layout='decomposed' emits one __dec__ row per verifiable block and
    classic per-metric XOR rows otherwise; layout='per_metric' always
    emits classic rows (the round-2 format)."""
    nb = len(pdf)
    ts_us = pdf["bucket_start"].to_numpy().astype("datetime64[us]").view(np.int64)
    blocks = pdf["block_start"].to_numpy()
    blocks_us = blocks.astype("datetime64[us]").view(np.int64)
    cut = np.flatnonzero(np.concatenate(([True], blocks[1:] != blocks[:-1])))
    ends = np.concatenate((cut[1:], [nb]))
    spans = list(zip(cut, ends))
    ts_blobs = encode_dod_batch([ts_us[a:b] for a, b in spans])
    vals = {m: pdf[m].to_numpy(dtype=np.float64) for m in BLOCK_METRICS}
    have = all(c in pdf.columns for c in BLOCK_SUM_COLS)
    sums = (
        {c: pdf[c].to_numpy(dtype=np.float64) for c in BLOCK_SUM_COLS}
        if have
        else None
    )
    rows: list[tuple] = []
    classic: list[int] = []
    for i, (a, b) in enumerate(spans):
        payload = None
        if layout == "decomposed" and have:
            payload = try_decompose_block(
                vals["cnt"][a:b],
                vals["n_tok_mean"][a:b],
                vals["tok_mean"][a:b],
                sums["n_tok_sum"][a:b],
                sums["tok_sum"][a:b],
                sums["tok_cnt"][a:b],
                ts_us[a:b],
                int(blocks_us[a]),
            )
            if payload is not None and (b - a) < 64:
                # tiny blocks: the fixed intzz/dec headers can outweigh
                # the stream savings — keep whichever layout is smaller
                # (pure function of block content, so the incremental
                # path reaches the same verdict)
                cls_bytes = 3 * len(ts_blobs[i]) + sum(
                    len(bl)
                    for bl in encode_xor_batch([vals[m][a:b] for m in BLOCK_METRICS])
                )
                if len(payload) >= cls_bytes:
                    payload = None
        if payload is not None:
            # ts lives INSIDE the payload; the DoD column stays empty
            rows.append(
                (DEC_METRIC, pdf["block_start"].iloc[a], int(b - a), b"", payload)
            )
        else:
            classic.append(i)
    for m in BLOCK_METRICS:
        if not classic:
            break
        blobs = encode_xor_batch([vals[m][spans[i][0] : spans[i][1]] for i in classic])
        for j, i in enumerate(classic):
            a, b = spans[i]
            rows.append(
                (m, pdf["block_start"].iloc[a], int(b - a), ts_blobs[i], blobs[j])
            )
    return rows
