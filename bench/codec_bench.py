"""Codec throughput microbench (single core) — the BASELINE.md budget is
encode >= 5 M points/s/core on the representative engine shape (gap-filled
1m tier: regular bucket timestamps, LOCF-heavy values).

Prints one JSON line with M points/s for encode/decode on three shapes:
  locf    — 8% value changes, regular 1m timestamps (the engine's data)
  const   — all-identical values (best case)
  random  — every value different (worst case; IEEE-XOR floor)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from tsrollup.codec import (  # noqa: E402
    decode_dod,
    decode_dod_batch,
    decode_xor,
    decode_xor_batch,
    encode_dod,
    encode_dod_batch,
    encode_xor,
    encode_xor_batch,
)


def make(shape: str, n_blocks: int = 512, n: int = 1440):
    rng = np.random.default_rng(11)
    blocks = []
    for b in range(n_blocks):
        ts = np.arange(n, dtype=np.int64) * 60_000_000 + b * 86_400_000_000
        if shape == "locf":
            changes = rng.random(n) < 0.08
            vals = np.where(changes, rng.normal(300.0, 30.0, n), np.nan)
            vals = pd.Series(vals).ffill().fillna(300.0).to_numpy()
        elif shape == "const":
            vals = np.full(n, 271.125)
        else:
            vals = rng.normal(300.0, 30.0, n)
        blocks.append((ts, vals))
    return blocks


def run(shape: str) -> dict:
    blocks = make(shape)
    npts = sum(len(t) for t, _ in blocks)
    # warm (touch pages, JIT numpy internals)
    encode_dod(blocks[0][0])
    encode_xor(blocks[0][1])

    # batch encode = the engine's kernel path (all day-blocks of a source
    # per applyInPandas group)
    t0 = time.perf_counter()
    ts_blobs = encode_dod_batch([t for t, _ in blocks])
    val_blobs = encode_xor_batch([v for _, v in blocks])
    enc_s = time.perf_counter() - t0

    # per-block encode (the old unit; kept for comparison)
    t0 = time.perf_counter()
    for t, v in blocks:
        encode_dod(t)
        encode_xor(v)
    enc1_s = time.perf_counter() - t0

    # batch decode = the engine's read path (decompress_blocks decodes all
    # of an Arrow batch's blobs in one vectorized call)
    t0 = time.perf_counter()
    ts_out = decode_dod_batch(ts_blobs)
    val_out = decode_xor_batch(val_blobs)
    dec_s = time.perf_counter() - t0
    for (t, v), td, vd in zip(blocks, ts_out, val_out):
        assert np.array_equal(td, t) and np.array_equal(
            vd.view(np.uint64), np.asarray(v).view(np.uint64)
        )

    # per-block decode (the old unit; kept for comparison)
    t0 = time.perf_counter()
    for tb, vb in zip(ts_blobs, val_blobs):
        decode_dod(tb)
        decode_xor(vb)
    dec1_s = time.perf_counter() - t0

    nbytes = sum(len(a) + len(b) for a, b in zip(ts_blobs, val_blobs))
    return {
        f"{shape}_encode_Mpts_s": round(npts / enc_s / 1e6, 2),
        f"{shape}_encode_perblock_Mpts_s": round(npts / enc1_s / 1e6, 2),
        f"{shape}_decode_Mpts_s": round(npts / dec_s / 1e6, 2),
        f"{shape}_decode_perblock_Mpts_s": round(npts / dec1_s / 1e6, 2),
        f"{shape}_ratio": round(npts * 16 / nbytes, 2),
    }


def run_decomposed(n_blocks: int = 512, n: int = 1440) -> dict:
    """Decomposed-layout (C4) microbench: realistic integer rollup streams
    (stationary counts, noisy integral sums), encode via
    try_decompose_block, decode via _dec_unpack + _reconstruct_dec.
    Reports logical metric-points (3 series per block) like bench.py."""
    import pandas as pd

    from tsrollup.codec import _dec_unpack, _reconstruct_dec, try_decompose_block

    rng = np.random.default_rng(7)
    blocks = []
    for _ in range(n_blocks):
        cnt = rng.integers(80, 200, n).astype(np.float64)
        ntoksum = (cnt * rng.integers(200, 300, n)).astype(np.float64)
        toksum = (ntoksum * rng.integers(20_000, 30_000, n)).astype(np.float64)
        ntm = ntoksum / cnt
        tkm = toksum / ntoksum
        ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
        blocks.append((cnt, ntm, tkm, ntoksum, toksum, ntoksum.copy(), ts))
    npts = 3 * n_blocks * n  # logical metric-points
    t0 = time.perf_counter()
    payloads = [try_decompose_block(*b) for b in blocks]
    enc_s = time.perf_counter() - t0
    assert all(p is not None for p in payloads)
    base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
    t0 = time.perf_counter()
    for p in payloads:
        _ts, streams = _dec_unpack(p, base)
        _reconstruct_dec(streams[0], streams[1], streams[2], streams[1] + streams[3])
    dec_s = time.perf_counter() - t0
    nbytes = sum(len(p) for p in payloads)
    return {
        "decomposed_encode_Mpts_s": round(npts / enc_s / 1e6, 2),
        "decomposed_decode_Mpts_s": round(npts / dec_s / 1e6, 2),
        "decomposed_ratio": round(npts * 16 / nbytes, 2),
    }


def main() -> None:
    out: dict = {"metric": "codec_throughput_single_core", "unit": "Mpts/s"}
    for shape in ("locf", "const", "random"):
        run(shape)  # warm pass: fault pages once (sandbox first-touch wall)
        out.update(run(shape))  # steady-state numbers
    run_decomposed()
    out.update(run_decomposed())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
