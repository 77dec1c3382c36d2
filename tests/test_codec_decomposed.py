"""Decomposed block layout (codec.py C4, round 3).

The contract under test: a decomposed day-block row decodes to EXACTLY the
same (metric, bucket_start, value) points as the classic per-metric XOR
rows — bit-for-bit, including NaN placement — because the encoder verifies
the integer-stream reconstruction before committing to the layout and
falls back to classic rows otherwise. The layout decision is a pure
function of block content, which is what keeps the incremental derive
path byte-identical to full builds (tests/test_increment.py re-runs under
the default decomposed layout)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tsrollup.codec import (
    BLOCK_METRICS,
    DEC_METRIC,
    compress_tier,
    decode_intzz,
    decompress_blocks,
    encode_intzz,
    try_decompose_block,
)
from tsrollup.config import RollupConfig
from tsrollup.gapfill import gapfill
from tsrollup.rollup import build_all_tiers
from tsrollup.storage import read_sequences
from tsrollup.synth import write_fixture


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_intzz_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert np.array_equal(decode_intzz(encode_intzz(a)), a)


def test_intzz_int64_max_median_roundtrips():
    # ADVICE r5: a stream whose float64 median rounds to exactly 2**63
    # used to crash the centered-zigzag candidate (`a - med` fails numpy
    # int64 promotion); the center now clamps into int64 and the blob
    # must still round-trip bit-exactly
    a = np.array(
        [2**63 - 1, 2**63 - 1, 2**63 - 2, 2**63 - 3], dtype=np.int64
    )
    assert np.array_equal(decode_intzz(encode_intzz(a)), a)
    full = np.array([-(2**63), 2**63 - 1, 2**63 - 1, 2**63 - 1], dtype=np.int64)
    assert np.array_equal(decode_intzz(encode_intzz(full)), full)


def test_intzz_constant_stream_is_header_only():
    a = np.full(1440, 123456789, dtype=np.int64)
    blob = encode_intzz(a)
    assert len(blob) == 7  # n + w(=0) + 4-byte varint v0, zero payload
    assert np.array_equal(decode_intzz(blob), a)
    assert len(encode_intzz(np.array([183], dtype=np.int64))) == 5  # singleton


def test_try_decompose_rejects_leading_gap_and_non_integers():
    n = 10
    cnt = np.array([0.0] + [3.0] * (n - 1))  # leading gap slot
    ntm = np.full(n, 2.0)
    tkm = np.full(n, 5.0)
    s = np.full(n, 6.0)
    assert try_decompose_block(cnt, ntm, tkm, s, s, s) is None
    cnt2 = np.full(n, 3.5)  # non-integral cnt
    assert try_decompose_block(cnt2, ntm, tkm, s, s, s) is None


def test_try_decompose_verifies_reconstruction():
    """A block whose mean is NOT sum/cnt (e.g. linear-interpolated) must
    be rejected even when every stream is integral."""
    cnt = np.array([2.0, 0.0, 4.0])
    ntoksum = np.array([10.0, np.nan, 40.0])
    toksum = np.array([100.0, np.nan, 400.0])
    tokcnt = np.array([10.0, np.nan, 40.0])
    good_ntm = np.array([5.0, 5.0, 10.0])  # LOCF: gap carries 5.0
    good_tkm = np.array([10.0, 10.0, 10.0])
    assert (
        try_decompose_block(cnt, good_ntm, good_tkm, ntoksum, toksum, tokcnt)
        is not None
    )
    linear_ntm = np.array([5.0, 7.5, 10.0])  # linear fill: not LOCF
    assert (
        try_decompose_block(cnt, linear_ntm, good_tkm, ntoksum, toksum, tokcnt)
        is None
    )


@pytest.fixture(scope="module")
def filled_1m(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("decfx"))
    seq = write_fixture(out, 60_000, 12, seed=11, rate_scale=50.0)
    tiers = build_all_tiers(read_sequences(spark, seq), RollupConfig())
    df = gapfill(tiers["1m"], "1m", RollupConfig()).persist()
    df.count()
    yield df
    df.unpersist()


def test_decomposed_decode_equals_classic(spark, filled_1m):
    dec_b = compress_tier(filled_1m, "1m", RollupConfig(block_layout="decomposed"))
    cls_b = compress_tier(filled_1m, "1m", RollupConfig(block_layout="per_metric"))
    key = ["source", "tier", "metric", "bucket_start"]
    p_dec = decompress_blocks(dec_b).toPandas().sort_values(key).reset_index(drop=True)
    p_cls = decompress_blocks(cls_b).toPandas().sort_values(key).reset_index(drop=True)
    assert p_dec.shape == p_cls.shape and p_dec.shape[0] > 0
    for c in key:
        assert (p_dec[c] == p_cls[c]).all(), c
    # bit-level equality including NaN payloads and signed zeros
    assert (
        p_dec["value"].to_numpy().view(np.int64)
        == p_cls["value"].to_numpy().view(np.int64)
    ).all()


def test_decomposed_is_smaller_on_dense_data(spark, filled_1m):
    size = lambda df: df.agg(  # noqa: E731
        F.sum(F.length("ts_dod_blob") + F.length("val_xor_blob"))
    ).first()[0]
    dec = size(compress_tier(filled_1m, "1m", RollupConfig(block_layout="decomposed")))
    cls = size(compress_tier(filled_1m, "1m", RollupConfig(block_layout="per_metric")))
    assert dec < cls * 0.75, (dec, cls)


def test_wanted_metric_filter(spark, filled_1m):
    dec_b = compress_tier(filled_1m, "1m", RollupConfig(block_layout="decomposed"))
    assert dec_b.where(F.col("metric") == DEC_METRIC).count() > 0
    one = decompress_blocks(dec_b, wanted="n_tok_mean")
    got = one.select("metric").distinct().collect()
    assert [r["metric"] for r in got] == ["n_tok_mean"]
    n_all = decompress_blocks(dec_b).count()
    assert one.count() * len(BLOCK_METRICS) == n_all


def test_linear_fill_falls_back_to_classic(spark, tmp_path):
    """Linear-interpolated means are not integer ratios — every gap-bearing
    block must fall back; decode equality still holds by construction."""
    seq = write_fixture(str(tmp_path), 8_000, 6, seed=13, rate_scale=1.0)
    cfg = RollupConfig(gapfill_method="linear")
    tiers = build_all_tiers(read_sequences(spark, seq), cfg)
    filled = gapfill(tiers["1m"], "1m", cfg).persist()
    dec_b = compress_tier(filled, "1m", cfg).persist()
    # blocks WITH interpolated gap rows cannot decompose; fully-observed
    # blocks still may — decode must equal the classic layout either way
    cls_b = compress_tier(filled, "1m", RollupConfig(
        gapfill_method="linear", block_layout="per_metric"))
    key = ["source", "tier", "metric", "bucket_start"]
    p_dec = decompress_blocks(dec_b).toPandas().sort_values(key).reset_index(drop=True)
    p_cls = decompress_blocks(cls_b).toPandas().sort_values(key).reset_index(drop=True)
    assert p_dec.shape == p_cls.shape
    assert (
        p_dec["value"].to_numpy().view(np.int64)
        == p_cls["value"].to_numpy().view(np.int64)
    ).all()
    filled.unpersist()
    dec_b.unpersist()


class TestRound4Layouts:
    def test_intzz_mode_selection_and_roundtrip(self):
        """The three intzz payload modes: fixed width (uniform deltas),
        delta-FOR miniblocks (spike / constant slope), value-FOR
        (iid noise) — each round-trips and the encoder picks by size."""
        rng = np.random.default_rng(3)
        slope = np.arange(1440, dtype=np.int64) * 60
        spike = np.array([5] * 1439 + [10**12], dtype=np.int64)
        noise = rng.integers(50, 80, 1440).astype(np.int64)
        for a, mode in ((slope, 255), (spike, 255), (noise, 254)):
            blob = encode_intzz(a)
            assert blob[2] == mode
            assert np.array_equal(decode_intzz(blob), a)
        # constant slope: FOR collapses the payload to width bytes
        assert len(encode_intzz(slope)) < 40
        # extreme modular deltas survive both adaptive modes
        ext = np.array([2**62, -(2**62), 2**62, -(2**62)], dtype=np.int64)
        assert np.array_equal(decode_intzz(encode_intzz(ext)), ext)

    def test_intzz_centered_zigzag_rice_modes(self):
        """Round-5 modes 250/251: zero-centered Gaussian-ish residuals
        (the r1/r2 predictor-residual shape) must pick the centered-
        zigzag Rice value mode (250) — the FOR modes pay ~1 extra
        bit/value re-biasing them — and an offset-mean noise stream
        must center on its median. Both round-trip bit-exact,
        including int64 extremes through the zigzag."""
        rng = np.random.default_rng(7)
        centered = rng.normal(0, 3e6, 1440).astype(np.int64)
        blob = encode_intzz(centered)
        assert blob[2] == 250
        assert np.array_equal(decode_intzz(blob), centered)
        # offset-mean noise: median centering must not LOSE to plain zz
        offset = (rng.normal(0, 40, 1440) + 5000).astype(np.int64)
        blob_off = encode_intzz(offset)
        assert np.array_equal(decode_intzz(blob_off), offset)
        assert len(blob_off) <= len(encode_intzz(offset - 5000)) + 3
        # full-range int64 zigzag wrap-around survives the new modes
        ext = np.array([-(2**63), 2**63 - 1, 0, -1, 2**62], dtype=np.int64)
        assert np.array_equal(decode_intzz(encode_intzz(ext)), ext)

    def test_intzz_body_consumed_length_exact(self):
        """_intzz_body_decode must report the exact end offset for every
        mode — the v5 container lays bodies end-to-end with no length
        prefixes, so an off-by-one here corrupts every later stream.
        Trailing junk after the body must be ignored."""
        from tsrollup.codec import _intzz_body, _intzz_body_decode

        rng = np.random.default_rng(13)
        cases = [
            np.arange(100, dtype=np.int64) * 60,            # fixed w=0/slope
            rng.normal(0, 3e6, 300).astype(np.int64),       # rice zv
            np.array([5] * 299 + [10**12], dtype=np.int64),  # miniblock
            rng.integers(50, 80, 257).astype(np.int64),     # val/rice
            np.array([42], dtype=np.int64),                 # n=1
            np.full(64, -7, dtype=np.int64),                # constant
        ]
        for a in cases:
            body = _intzz_body(a)
            got, end = _intzz_body_decode(body + b"\xab\xcd\xef", 0, a.shape[0])
            assert end == len(body), (a.shape, end, len(body))
            assert np.array_equal(got, a)

    def _mk_block(self, n, gaps=0.0, seed=11):
        rng = np.random.default_rng(seed)
        cnt = rng.integers(80, 200, n).astype(np.float64)
        if gaps:
            g = rng.random(n) < gaps
            g[0] = False
            cnt[g] = 0.0
        obs = cnt > 0
        ntoksum = np.where(obs, cnt * rng.integers(200, 300, n), 0.0)
        toksum = np.where(obs, ntoksum * rng.integers(20_000, 30_000, n), 0.0)
        tokcnt = ntoksum.copy()
        idx = np.maximum.accumulate(np.where(obs, np.arange(n), -1))
        locf = lambda v: v[np.maximum(idx, 0)]  # noqa: E731
        ntm = np.where(locf(cnt) > 0, locf(ntoksum) / locf(cnt), np.nan)
        tkm = np.where(locf(tokcnt) > 0, locf(toksum) / locf(tokcnt), np.nan)
        ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
        return cnt, ntm, tkm, ntoksum, toksum, tokcnt, ts

    def test_v2_and_tiny_layouts_roundtrip_bitexact(self):
        from tsrollup.codec import _dec_unpack, _reconstruct_dec

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        for n, want_magic in ((1, 0xD6), (3, 0xD6), (5, 0xD5), (300, 0xD5)):
            blk = self._mk_block(n)
            p = try_decompose_block(*blk)
            assert p is not None and p[0] == want_magic, n
            ts2, (c2, n2, t2, td2) = _dec_unpack(p, base)
            assert np.array_equal(ts2, blk[6])
            rc, rn, rt = _reconstruct_dec(c2, n2, t2, n2 + td2)
            assert np.array_equal(rc, blk[0])
            assert np.array_equal(rn, blk[1], equal_nan=True)
            assert np.array_equal(rt, blk[2], equal_nan=True)

    def test_v2_gappy_block_roundtrip(self):
        from tsrollup.codec import _dec_unpack, _reconstruct_dec

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        blk = self._mk_block(1000, gaps=0.4)
        p = try_decompose_block(*blk)
        assert p is not None
        ts2, (c2, n2, t2, td2) = _dec_unpack(p, base)
        rc, rn, rt = _reconstruct_dec(c2, n2, t2, n2 + td2)
        assert np.array_equal(rc, blk[0])
        assert np.array_equal(rn, blk[1], equal_nan=True)
        assert np.array_equal(rt, blk[2], equal_nan=True)

    def test_legacy_v2_payload_still_decodes(self):
        """Round-4/5 stores carry 0xD2 blocks (length-prefixed streams);
        the encoder moved to the headerless 0xD5 container but the
        retention horizon keeps v2 readable. The blob is assembled
        byte-by-byte to the frozen v2 layout."""
        import struct

        from tsrollup.codec import (
            _dec_unpack,
            _encode_ts_stream,
            _locf_obs,
            _reconstruct_dec,
            _varint,
            _zzvarint,
            encode_intzz,
        )

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        blk = self._mk_block(40, gaps=0.2)
        p = try_decompose_block(*blk)
        assert p is not None and p[0] == 0xD5
        ts, (cnt, ntoksum, toksum, tokdiff) = _dec_unpack(p, base)
        tokcnt = ntoksum + tokdiff
        locf = _locf_obs(cnt, cnt > 0)
        k1 = int(ntoksum.sum()) // int(locf.sum())
        r1 = ntoksum - k1 * locf
        k2 = int(toksum.sum()) // int(tokcnt.sum())
        r2 = toksum - k2 * tokcnt
        streams = [
            _encode_ts_stream(ts, base),
            encode_intzz(cnt),
            b"" if not r1.any() else encode_intzz(r1),
            b"" if not r2.any() else encode_intzz(r2),
            b"" if not tokdiff.any() else encode_intzz(tokdiff),
        ]
        legacy = b"".join(
            [
                struct.pack("<B", 0xD2),
                _zzvarint(k1),
                _zzvarint(k2),
                *[_varint(len(s)) for s in streams],
                *streams,
            ]
        )
        ts2, (c2, n2, t2, td2) = _dec_unpack(legacy, base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert np.array_equal(td2, tokdiff)
        rc, rn, rt = _reconstruct_dec(c2, n2, t2, n2 + td2)
        assert np.array_equal(rc, blk[0])
        assert np.array_equal(rn, blk[1], equal_nan=True)
        assert np.array_equal(rt, blk[2], equal_nan=True)

    def test_legacy_v4_minute_aligned_payload_still_decodes(self):
        """Round-5 stores written before the v6 revision carry 0xD4 tiny
        blocks (minute flag, zigzag first values); built byte-by-byte to
        the frozen v4 layout."""
        import struct

        from tsrollup.codec import _dec_unpack, _varint, _zzvarint

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        ts = np.array([base + 120_000_000, base + 300_000_000], dtype=np.int64)
        cnt = np.array([3, 5], dtype=np.int64)
        ntoksum = np.array([700, 1200], dtype=np.int64)
        toksum = np.array([90_000, 140_000], dtype=np.int64)
        hdr = (2 - 1) | (1 << 2) | (0b0111 << 3)  # n=2, aligned, tokdiff absent
        parts = [struct.pack("<BB", 0xD4, hdr), _varint(2), _varint(3)]
        for s in (cnt, ntoksum, toksum):
            parts.append(_zzvarint(int(s[0])))
            parts.append(_zzvarint(int(s[1] - s[0])))
        ts2, (c2, n2, t2, td2) = _dec_unpack(b"".join(parts), base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert not td2.any()

    def test_v6_grid_and_plain_varint_layout(self):
        """The v6 tiny layout must pick the coarsest grid that fits (day
        for 1d-tier stamps) and round-trip streams bit-exact."""
        from tsrollup.codec import _dec_encode, _dec_unpack

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        day = 86_400_000_000
        ts = np.array([base, base + 2 * day, base + 3 * day], dtype=np.int64)
        cnt = np.array([4000, 3900, 4100], dtype=np.int64)
        ntoksum = np.array([900_000, 870_000, 930_000], dtype=np.int64)
        toksum = np.array(
            [22_000_000_000, 21_000_000_000, 23_000_000_000], dtype=np.int64
        )
        tokdiff = np.zeros(3, dtype=np.int64)
        p = _dec_encode(ts, base, cnt, ntoksum, toksum, tokdiff)
        assert p[0] == 0xD6 and ((p[1] >> 2) & 0b11) == 3  # day grid
        ts2, (c2, n2, t2, td2) = _dec_unpack(p, base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert not td2.any()

    def test_v6_negative_tokdiff_takes_zigzag_branch(self):
        """tokdiff (bit 3) is the one v6 stream that can be negative:
        its first value must stay zigzag while cnt/ntok/tok use plain
        varints, and the whole block must round-trip."""
        from tsrollup.codec import _dec_encode, _dec_unpack

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        ts = np.array([base, base + 3_600_000_000], dtype=np.int64)
        cnt = np.array([10, 12], dtype=np.int64)
        ntoksum = np.array([2000, 2400], dtype=np.int64)
        # first toksum is 2^27: its plain varint is 4 bytes but the
        # zigzag doubling needs 5 — v6 must WIN the size race, not tie
        toksum = np.array([134_217_728, 150_000_000], dtype=np.int64)
        tokdiff = np.array([-3, 5], dtype=np.int64)
        p = _dec_encode(ts, base, cnt, ntoksum, toksum, tokdiff)
        assert p[0] == 0xD6 and ((p[1] >> 2) & 0b11) == 2  # hour grid
        assert (p[1] >> 4) & 0b1000  # tokdiff present
        ts2, (c2, n2, t2, td2) = _dec_unpack(p, base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert np.array_equal(td2, tokdiff)

    def test_legacy_v3_tiny_payload_still_decodes(self):
        """Round-4 stores carry 0xD3 tiny blocks; the encoder moved to
        0xD4 in round 5 but the retention horizon keeps v3 readable.
        The blob here is built byte-by-byte to the frozen v3 layout."""
        import struct

        from tsrollup.codec import _dec_unpack, _varint, _zzvarint

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        ts = np.array(
            [1_700_000_000_000_000, 1_700_000_060_000_000], dtype=np.int64
        )
        cnt = np.array([3, 5], dtype=np.int64)
        ntoksum = np.array([700, 1200], dtype=np.int64)
        toksum = np.array([90_000, 140_000], dtype=np.int64)
        tokdiff = np.array([0, 2], dtype=np.int64)
        parts = [struct.pack("<BB", 0xD3, 2), _varint(int(ts[0]) - base)]
        parts.append(_zzvarint(int(ts[1] - ts[0])))
        for s in (cnt, ntoksum, toksum, tokdiff):
            parts.append(_zzvarint(int(s[0])))
            parts.append(_zzvarint(int(s[1] - s[0])))
        ts2, (c2, n2, t2, td2) = _dec_unpack(b"".join(parts), base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert np.array_equal(td2, tokdiff)

    def test_v4_misaligned_ts_roundtrip(self):
        """A tiny block whose timestamps are NOT whole minutes must take
        the unaligned branch (zigzag microsecond deltas) and round-trip."""
        from tsrollup.codec import _dec_encode, _dec_unpack

        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        ts = np.array(
            [base + 7_123_456, base + 67_900_001], dtype=np.int64
        )
        cnt = np.array([2, 4], dtype=np.int64)
        ntoksum = np.array([500, 900], dtype=np.int64)
        toksum = np.array([60_000, 110_000], dtype=np.int64)
        tokdiff = np.zeros(2, dtype=np.int64)
        p = _dec_encode(ts, base, cnt, ntoksum, toksum, tokdiff)
        assert p[0] == 0xD4 and not (p[1] & 0b100)  # unaligned flag off
        ts2, (c2, n2, t2, td2) = _dec_unpack(p, base)
        assert np.array_equal(ts2, ts)
        assert np.array_equal(c2, cnt)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert not td2.any()

    def test_legacy_v1_payload_still_decodes(self):
        """Old stores carry 0xD1 payloads — decode compatibility is a
        retention-horizon contract, not an optional nicety."""
        from tsrollup.codec import (
            _dec_pack,
            _dec_unpack,
            _encode_ts_stream,
            encode_intzz,
        )

        n = 50
        blk = self._mk_block(n)
        cnt_i = blk[0].astype(np.int64)
        ntoksum = blk[3].astype(np.int64)
        toksum = blk[4].astype(np.int64)
        base = 1_700_000_000_000_000 // 86_400_000_000 * 86_400_000_000
        legacy = _dec_pack(
            [
                _encode_ts_stream(blk[6], base),
                encode_intzz(cnt_i),
                encode_intzz(ntoksum),
                encode_intzz(toksum),
                b"",
            ]
        )
        ts2, (c2, n2, t2, td2) = _dec_unpack(legacy, base)
        assert np.array_equal(ts2, blk[6])
        assert np.array_equal(c2, cnt_i)
        assert np.array_equal(n2, ntoksum)
        assert np.array_equal(t2, toksum)
        assert not td2.any()
