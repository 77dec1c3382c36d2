"""Pure-NumPy baseline JPEG (ITU-T T.81) encoder + decoder.

The multimodal registry's BMP/WAV parsers are real but uncompressed;
this module proves the registry carries a GENUINELY COMPRESSED format
with no external libraries: baseline sequential DCT, Huffman entropy
coding, standard JFIF container.

Scope (loud NotImplementedError outside it — the registry contract):
- encoder: grayscale (h, w) or RGB (h, w, 3) uint8, 4:4:4 (no chroma
  subsampling), one quant table per luma/chroma class, the classic
  Annex-K-style luminance Huffman tables referenced by every component;
- decoder: baseline SOF0, any number of DQT/DHT segments, 4:4:4
  sampling only, no restart markers / progressive / arithmetic coding.
  The decoder builds its Huffman tables FROM THE FILE's DHT segments
  (canonical code reconstruction), so its correctness never depends on
  table constants — only the encoder's efficiency does.

Determinism: both directions are pure functions (matrix DCT in float64,
np.round + clip pinned on both sides), so decoded pixels are stable
across platforms and the frozen-fixture test can pin exact bytes.

This is the fixture-scale semantics anchor; a production deploy drops a
libjpeg-turbo-backed decoder into the same registry slot
(datapipe.register_decoder) without touching any Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- constants

#: zigzag scan order: index i holds the (row*8+col) position of the i-th
#: coefficient in scan order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K base quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: standard luminance Huffman tables (Annex K): (bits[1..16], huffval).
#: The encoder references THESE for every component (spec-legal — the
#: SOS slots name table 0); the decoder never uses them, it rebuilds
#: tables from the file.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: orthonormal 8x8 DCT-II matrix: coeffs = M @ block @ M.T, block = M.T @ c @ M
_M = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def q(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    return q(QT_LUMA), q(QT_CHROMA)


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float64 -> (nblocks, 8, 8), edge-replicated to 8-multiples,
    blocks in raster order."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def make_jpeg(pixels: np.ndarray, quality: int = 75) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF."""
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8:
        raise TypeError("pixels must be uint8")
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    h, w = pixels.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        planes = [pixels.astype(np.float64)]
        qts = [qt_l]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: table 0 = luma, table 1 = chroma (zigzag order per spec)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00]) + bytes(
        int(v) for v in qt_l[ZIGZAG]
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01]) + bytes(
            int(v) for v in qt_c[ZIGZAG]
        )
    # SOF0: baseline, 8-bit, 1x1 sampling (4:4:4)
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: class 0 (DC) id 0 + class 1 (AC) id 0 — shared by all components
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        seg = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # SOS
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    # 4:4:4 with 1x1 factors: the MCU is one block per component —
    # interleave block-by-block in raster order
    nmcu = ((h + 7) // 8) * ((w + 7) // 8)
    # pre-quantize all planes once, then interleave
    quantized = []
    for p, qt in zip(planes, qts):
        # per block: M @ b @ M.T, all blocks at once
        coeffs = np.einsum("ux,ixy,vy->iuv", _M, _blocks(p - 128.0), _M)
        q = np.round(coeffs.reshape(-1, 64) / qt.astype(np.float64)[None, :])
        quantized.append(q.astype(np.int64)[:, ZIGZAG])
    preds = [0] * ncomp
    for m in range(nmcu):
        for ci in range(ncomp):
            blk = quantized[ci][m]
            dc = int(blk[0])
            diff = dc - preds[ci]
            preds[ci] = dc
            size = _csize(diff)
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                amp = diff if diff >= 0 else diff + (1 << size) - 1
                bw.write(amp, size)
            run = 0
            nz = np.flatnonzero(blk[1:])
            last_nz = int(nz[-1]) + 1 if nz.size else 0
            for i in range(1, last_nz + 1):
                v = int(blk[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size = _csize(v)
                code, ln = ac_codes[run * 16 + size]
                bw.write(code, ln)
                amp = v if v >= 0 else v + (1 << size) - 1
                bw.write(amp, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]
                bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffTable:
    """Canonical Huffman decoder built from a DHT (bits, vals) pair."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline 4:4:4 JFIF -> (h, w) uint8 (grayscale) or
    (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _HuffTable] = {}
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, qt_id)
    h = w = None
    scan: list[tuple[int, int, int]] = []  # (cid, dc_tid, ac_tid)
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                qts[tq] = tbl
                o += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                if len(bits) < 16 or len(body) < o + 17 + n:
                    raise ValueError("truncated DHT segment")
                vals = list(body[o + 17 : o + 17 + n])
                hts[(tc, th)] = _HuffTable(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if h == 0 or w == 0 or h * w > 64_000_000:
                # corrupted dimensions would allocate plane buffers far
                # beyond any plausible payload before the entropy stream
                # even gets a chance to fail — reject up front
                raise ValueError(f"implausible SOF dimensions {w}x{h}")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 (1x1 sampling factors) supported"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:  # SOS
            ns = body[0] if body else 0
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tids >> 4, tids & 0xF))
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if data_start is None or h is None:
        raise ValueError("missing SOS/SOF segment")
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan files")

    for _cid, d, a_ in scan:
        if (0, d) not in hts or (1, a_) not in hts:
            raise ValueError(f"SOS references undefined Huffman table dc={d} ac={a_}")
    for _cid, _s, tq in comps:
        if tq not in qts:
            raise ValueError(f"SOF references undefined quant table {tq}")
    br = _BitReader(payload, data_start)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    nmcu = bh * bw_
    planes = [np.zeros((bh * 8, bw_ * 8), dtype=np.float64) for _ in comps]
    preds = [0] * len(comps)
    qt_by_ci = [qts[tq] for (_cid, _s, tq) in comps]
    dc_by_ci = [hts[(0, d)] for (_c, d, _a) in scan]
    ac_by_ci = [hts[(1, a)] for (_c, _d, a) in scan]
    inv_zz = ZIGZAG  # scan position i -> natural index ZIGZAG[i]
    for m in range(nmcu):
        by, bx = divmod(m, bw_)
        for ci in range(len(comps)):
            zz = np.zeros(64, dtype=np.int64)
            size = dc_by_ci[ci].decode(br)
            if size > 15:  # corrupted table: DC categories are 0..11
                raise ValueError(f"invalid DC size category {size}")
            diff = _extend(br.bits(size), size) if size else 0
            preds[ci] += diff
            zz[0] = preds[ci]
            i = 1
            while i < 64:
                sym = ac_by_ci[ci].decode(br)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                i += run
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = _extend(br.bits(size), size)
                i += 1
            coeff = np.zeros(64, dtype=np.float64)
            coeff[inv_zz] = zz * qt_by_ci[ci][inv_zz]
            blk = _M.T @ coeff.reshape(8, 8) @ _M + 128.0
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    planes = [p[:h, :w] for p in planes]
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
