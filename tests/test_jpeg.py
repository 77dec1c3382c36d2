"""Pure-NumPy baseline JPEG codec (tsrollup/jpeg.py): round trips within
quantization tolerance, exact flat-image reconstruction, frozen-fixture
byte + pixel pins, loud NotImplementedError outside the baseline-4:4:4
scope, and the 4-way multimodal registry dispatch."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from tsrollup.jpeg import decode_jpeg, make_jpeg

DATA = os.path.join(os.path.dirname(__file__), "data")


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (127 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 11.0)).clip(0, 255).astype(
        np.uint8
    )


class TestRoundTrip:
    def test_flat_image_is_exact(self):
        flat = np.full((24, 40), 130, np.uint8)
        assert np.array_equal(decode_jpeg(make_jpeg(flat, 75)), flat)
        flat3 = np.full((16, 16, 3), 200, np.uint8)
        out = decode_jpeg(make_jpeg(flat3, 75))
        # color adds two rounded colorspace conversions: within 1
        assert np.abs(out.astype(int) - 200).max() <= 1

    def test_smooth_gray_quality_ladder(self):
        img = _smooth(48, 64)
        prev_err = None
        for q in (50, 75, 90, 95):
            blob = make_jpeg(img, q)
            out = decode_jpeg(blob)
            assert out.shape == img.shape and out.dtype == np.uint8
            err = float(np.abs(out.astype(int) - img.astype(int)).mean())
            assert len(blob) < img.size // 3, "not actually compressing"
            if prev_err is not None:
                assert err <= prev_err + 0.05, "higher quality got worse"
            prev_err = err
        assert np.abs(
            decode_jpeg(make_jpeg(img, 95)).astype(int) - img.astype(int)
        ).max() <= 2

    def test_smooth_rgb(self):
        g = _smooth(40, 48)
        img = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], -1).astype(np.uint8)
        out = decode_jpeg(make_jpeg(img, 90))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 8

    def test_odd_sizes_and_padding(self):
        for shape in ((1, 1), (7, 9), (8, 8), (17, 23), (9, 8, 3)):
            a = ((np.arange(np.prod(shape)).reshape(shape) % 20) * 3 + 60).astype(
                np.uint8
            )
            out = decode_jpeg(make_jpeg(a, 95))
            assert out.shape == a.shape
            # sawtooth content: gray within 6; color pays the aggressive
            # chroma quant table (base 99) on its high frequencies
            tol = 6 if len(shape) == 2 else 16
            assert np.abs(out.astype(int) - a.astype(int)).max() <= tol

    def test_noise_survives(self):
        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (40, 40)).astype(np.uint8)
        out = decode_jpeg(make_jpeg(a, 90))
        assert out.shape == a.shape  # lossy on noise, but structurally sound

    def test_input_contracts(self):
        with pytest.raises(TypeError, match="uint8"):
            make_jpeg(np.zeros((8, 8), np.float64))
        with pytest.raises(ValueError, match="expected"):
            make_jpeg(np.zeros((8, 8, 4), np.uint8))


class TestFrozenFixture:
    """The committed sample.jpg pins BOTH directions: the encoder must
    reproduce its bytes from the committed source pixels, and the decoder
    must reproduce the committed decoded pixels exactly."""

    def test_encoder_bytes_frozen(self):
        src = np.load(os.path.join(DATA, "sample_jpg_source.npy"))
        blob = open(os.path.join(DATA, "sample.jpg"), "rb").read()
        assert make_jpeg(src, quality=80) == blob

    def test_decoder_pixels_frozen(self):
        blob = open(os.path.join(DATA, "sample.jpg"), "rb").read()
        want = np.load(os.path.join(DATA, "sample_jpg_pixels.npy"))
        assert np.array_equal(decode_jpeg(blob), want)
        # and the decode is a faithful lossy reconstruction of the source
        src = np.load(os.path.join(DATA, "sample_jpg_source.npy"))
        assert np.abs(want.astype(int) - src.astype(int)).max() <= 8


class TestScopeFences:
    def _patch_marker(self, blob: bytes, old: int, new: int) -> bytes:
        i = blob.index(bytes([0xFF, old]))
        return blob[:i + 1] + bytes([new]) + blob[i + 2:]

    def test_progressive_raises(self):
        blob = make_jpeg(_smooth(16, 16), 75)
        prog = self._patch_marker(blob, 0xC0, 0xC2)  # SOF0 -> SOF2
        with pytest.raises(NotImplementedError, match="non-baseline"):
            decode_jpeg(prog)

    def test_subsampling_raises(self):
        g = _smooth(16, 16)
        img = np.stack([g, g, g], -1).astype(np.uint8)
        blob = bytearray(make_jpeg(img, 75))
        # SOF0 component 1 sampling byte: find the SOF0 segment
        i = bytes(blob).index(b"\xff\xc0")
        # layout: FFC0 len(2) prec(1) h(2) w(2) nc(1) [cid samp tq]*
        blob[i + 11] = 0x22  # 2x2 luma sampling (4:2:0)
        with pytest.raises(NotImplementedError, match="4:4:4"):
            decode_jpeg(bytes(blob))

    def test_dri_raises(self):
        blob = make_jpeg(_smooth(16, 16), 75)
        i = blob.index(b"\xff\xda")  # insert DRI before SOS
        dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 4)
        with pytest.raises(NotImplementedError, match="restart"):
            decode_jpeg(blob[:i] + dri + blob[i:])

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"BMnot-a-jpeg")


class TestRegistry:
    def test_jpeg_feature_decoder(self):
        from tsrollup.datapipe import _decode

        src = np.load(os.path.join(DATA, "sample_jpg_source.npy"))
        blob = make_jpeg(src, quality=80)
        w, h, feat = _decode(blob, "image/jpeg", 8)
        assert (w, h) == (src.shape[1], src.shape[0])
        dec = decode_jpeg(blob).astype(np.float64)
        assert feat[0] == pytest.approx(dec[..., 0].mean())
        assert feat[6] == pytest.approx(dec.mean(axis=2).mean())


class TestFuzzRobustness:
    """Corrupted payloads must raise cleanly (ValueError /
    NotImplementedError / IndexError-free hang-free), never loop forever
    or return garbage silently — the registry's loud-failure contract."""

    def test_truncations_raise(self):
        blob = make_jpeg(_smooth(24, 24), 75)
        for cut in (2, 4, 20, len(blob) // 2, len(blob) - 3):
            with pytest.raises((ValueError, NotImplementedError, struct.error)):
                decode_jpeg(blob[:cut])

    def test_random_byte_flips_never_hang_or_crash_unexpectedly(self):
        rng = np.random.default_rng(77)
        blob = bytearray(make_jpeg(_smooth(24, 24), 75))
        ok, raised = 0, 0
        for _ in range(300):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 4))):
                b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
            try:
                out = decode_jpeg(bytes(b))
                assert out.dtype == np.uint8  # decoded despite the flip
                ok += 1
            except (ValueError, NotImplementedError, struct.error):
                raised += 1
        assert ok + raised == 300
        assert raised > 0  # some flips must be detected

    def test_random_garbage_raises(self):
        rng = np.random.default_rng(3)
        for n in (0, 1, 2, 10, 200):
            junk = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((ValueError, NotImplementedError, struct.error)):
                decode_jpeg(b"\xff\xd8" + junk if n else junk)
