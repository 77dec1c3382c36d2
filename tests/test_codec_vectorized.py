"""Byte-format freeze tests: the vectorized production codec must emit
byte-identical blobs to the original per-point loop implementation
(tests/_codec_ref.py), and each side must decode the other's blobs.
This is the guard that lets the encoder be optimized without ever moving
the on-disk format."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.codec import decode_dod, decode_xor, encode_dod, encode_xor

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
