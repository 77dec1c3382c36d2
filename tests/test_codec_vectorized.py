"""Byte-format freeze tests: the vectorized production codec must emit
byte-identical blobs to the original per-point loop implementation
(tests/_codec_ref.py), and each side must decode the other's blobs.
This is the guard that lets the encoder be optimized without ever moving
the on-disk format."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.codec import (
    decode_dod,
    decode_dod_batch,
    decode_xor,
    decode_xor_batch,
    encode_dod,
    encode_xor,
)

from . import _codec_ref as ref


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=300)
)
def test_dod_bytes_match_reference(ts):
    ts = np.sort(np.array(ts, dtype=np.int64))
    new_blob = encode_dod(ts)
    assert new_blob == ref.encode_dod(ts)
    # cross-decode both ways
    assert np.array_equal(ref.decode_dod(new_blob), ts)
    assert np.array_equal(decode_dod(ref.encode_dod(ts)), ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_xor_bytes_match_reference(vals):
    vals = np.array(vals, dtype=np.float64)
    new_blob = encode_xor(vals)
    assert new_blob == ref.encode_xor(vals)
    u = vals.view(np.uint64)
    assert np.array_equal(ref.decode_xor(new_blob).view(np.uint64), u)
    assert np.array_equal(decode_xor(ref.encode_xor(vals)).view(np.uint64), u)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_dod_batch_equals_per_block(blocks):
    arrs = [np.sort(np.array(b, dtype=np.int64)) for b in blocks]
    from tsrollup.codec import encode_dod_batch

    batch = encode_dod_batch(arrs)
    for blob, a in zip(batch, arrs):
        assert blob == ref.encode_dod(a)
        assert np.array_equal(decode_dod(blob), a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_xor_batch_equals_per_block(blocks):
    arrs = [np.array(b, dtype=np.float64) for b in blocks]
    from tsrollup.codec import encode_xor_batch

    batch = encode_xor_batch(arrs)
    for blob, a in zip(batch, arrs):
        assert blob == ref.encode_xor(a)
        assert np.array_equal(
            decode_xor(blob).view(np.uint64), a.view(np.uint64)
        )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=80),
        min_size=1,
        max_size=10,
    )
)
def test_dod_batch_decode_equals_scalar(blocks):
    """The SIMT batch decoder must agree with the scalar loop decoder on
    every blob, including n=0/1/2 blobs and lanes that finish early."""
    arrs = [np.sort(np.array(b, dtype=np.int64)) for b in blocks]
    blobs = [ref.encode_dod(a) for a in arrs]
    for got, a in zip(decode_dod_batch(blobs), arrs):
        assert np.array_equal(got, a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_xor_batch_decode_equals_scalar(blocks):
    arrs = [np.array(b, dtype=np.float64) for b in blocks]
    blobs = [ref.encode_xor(a) for a in arrs]
    for got, a in zip(decode_xor_batch(blobs), arrs):
        assert np.array_equal(got.view(np.uint64), a.view(np.uint64))


def test_batch_decode_adversarial_blocks():
    """Hand-built worst cases for the batch decoder's run-skipping: runs
    crossing word boundaries, runs ending exactly at a blob tail, 64-bit
    DoD overflow fields, window reuse after long runs, denormals/inf/NaN,
    and wildly uneven lane lengths in one batch."""
    import pandas as pd

    rng = np.random.default_rng(13)
    ts_blocks = [
        np.empty(0, dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([0, 1], dtype=np.int64),
        np.arange(1440, dtype=np.int64) * 60_000_000,  # pure zero-run
        np.cumsum(rng.integers(-(2**40), 2**40, 700)).astype(np.int64),
        np.array([-5, -4, 100, 100, 2**62, -(2**61)], dtype=np.int64),
        np.arange(130, dtype=np.int64) * 60_000_000,  # run ends at tail
    ]
    locf = pd.Series(
        np.where(rng.random(900) < 0.05, rng.normal(300, 30, 900), np.nan)
    ).ffill().fillna(300.0).to_numpy()
    val_blocks = [
        np.empty(0, dtype=np.float64),
        np.array([np.nan]),
        np.array([1.5, 1.5]),
        np.full(1440, 271.125),  # pure zero-run
        rng.normal(300, 30, 700),  # dense: window churn
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, 1.0, 1.0, 2.0]),
        locf,
    ]
    tb = [ref.encode_dod(t) for t in ts_blocks]
    vb = [ref.encode_xor(v) for v in val_blocks]
    for got, t in zip(decode_dod_batch(tb), ts_blocks):
        assert np.array_equal(got, t)
    for got, v in zip(decode_xor_batch(vb), val_blocks):
        assert np.array_equal(got.view(np.uint64), v.view(np.uint64))


def test_locf_like_stream_bytes_match():
    """The representative engine shape: long LOCF runs + occasional jumps +
    a NaN warmup region, one full 1m day."""
    rng = np.random.default_rng(7)
    n = 1440
    ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1704067200_000000
    ts[700:] += 37_000_000  # one irregular jitter -> nonzero DoD
    changes = rng.random(n) < 0.08
    vals = np.where(changes, rng.normal(300.0, 30.0, n), np.nan)
    import pandas as pd

    vals = pd.Series(vals).ffill().to_numpy()  # leading NaNs stay
    assert encode_dod(ts) == ref.encode_dod(ts)
    assert encode_xor(vals) == ref.encode_xor(vals)
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)
    assert np.array_equal(
        decode_xor(encode_xor(vals)).view(np.uint64), vals.view(np.uint64)
    )
