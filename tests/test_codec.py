"""Gorilla codec tests (SURVEY.md §5.1/§5.4): hypothesis round-trips over
arbitrary float64 (inc. NaN/±inf/denormals) and µs timestamps, edge cases,
blob determinism through Spark, and the compression-ratio anchor."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.codec import decode_dod, decode_xor, encode_dod, encode_xor

# ---------- pure-kernel round-trips ----------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),  # µs timestamps incl. huge gaps
        min_size=0,
        max_size=300,
    )
)
def test_dod_roundtrip(ts):
    ts = np.sort(np.array(ts, dtype=np.int64))
    out = decode_dod(encode_dod(ts))
    assert np.array_equal(out, ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=300,
    )
)
def test_xor_roundtrip(vals):
    vals = np.array(vals, dtype=np.float64)
    out = decode_xor(encode_xor(vals))
    # bit-level equality (NaN payloads, -0.0, denormals all preserved)
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


@pytest.mark.parametrize(
    "ts",
    [
        np.array([], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([1704067200_000000], dtype=np.int64),
        np.array([0, 1], dtype=np.int64),
        np.arange(0, 1440 * 60_000_000, 60_000_000, dtype=np.int64),  # perfect 1m day
        np.array([0, 60_000_000, 60_000_000 * 2, 86_400_000_000 * 30], dtype=np.int64),  # month gap
        np.array([-5, -1, 7], dtype=np.int64),  # negative epoch
    ],
)
def test_dod_edges(ts):
    assert np.array_equal(decode_dod(encode_dod(ts)), ts)


@pytest.mark.parametrize(
    "vals",
    [
        np.array([], dtype=np.float64),
        np.array([0.0]),
        np.array([-0.0, 0.0, -0.0]),
        np.array([np.nan, np.inf, -np.inf, 5e-324, 1.7976931348623157e308]),
        np.full(1000, 3.141592653589793),
        np.array([1.0, 1.0000000000000002, 1.0]),  # 1-ulp wiggles
    ],
)
def test_xor_edges(vals):
    out = decode_xor(encode_xor(vals))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_compression_ratio_anchor():
    """BASELINE.md: >=8x on a gap-filled-like 1m stream (LOCF repeats)."""
    rng = np.random.default_rng(0)
    n = 1440
    ts = np.arange(n, dtype=np.int64) * 60_000_000 + 1704067200_000000
    # LOCF-ish series: long runs of repeated values with occasional changes
    changes = rng.random(n) < 0.1
    vals = np.where(changes, rng.normal(300, 30, n), np.nan)
    import pandas as pd

    vals = pd.Series(vals).ffill().fillna(300.0).to_numpy()
    raw_bytes = n * 16
    comp = len(encode_dod(ts)) + len(encode_xor(vals))
    ratio = raw_bytes / comp
    assert ratio >= 8.0, f"compression ratio {ratio:.1f}x below 8x anchor"


# ---------- Spark block path ----------


def test_spark_block_roundtrip_and_determinism(spark, seq_fixture_small):
    from tsrollup.codec import BLOCK_METRICS, compress_tier, decompress_blocks
    from tsrollup.config import RollupConfig
    from tsrollup.gapfill import gapfill
    from tsrollup.rollup import build_all_tiers
    from tsrollup.storage import read_sequences

    from .conftest import assert_frame_byte_equal, normalize_ts

    cfg = RollupConfig()
    tiers = build_all_tiers(read_sequences(spark, seq_fixture_small), cfg)
    filled = gapfill(tiers["1m"], "1m", cfg).persist()
    try:
        blocks = compress_tier(filled, "1m", cfg).persist()
        # 1) round-trip: decompressed points == the filled tier's values
        pts = decompress_blocks(blocks).toPandas()
        got = normalize_ts(pts, ("bucket_start",))
        exp_long = filled.toPandas().melt(
            id_vars=["source", "bucket_start", "tier"],
            value_vars=list(BLOCK_METRICS),
            var_name="metric",
            value_name="value",
        )
        exp_long["value"] = exp_long["value"].astype(np.float64)
        exp = normalize_ts(exp_long, ("bucket_start",))
        assert_frame_byte_equal(
            got, exp, ["source", "metric", "bucket_start"], msg="block roundtrip"
        )
        # 2) blob determinism: re-encode under different partitioning -> same bytes
        b1 = blocks.toPandas()
        b2 = (
            compress_tier(filled.repartition(17), "1m", RollupConfig(range_partitions=3))
            .toPandas()
        )
        k = ["source", "metric", "block_start"]
        b1 = b1.sort_values(k).reset_index(drop=True)
        b2 = b2.sort_values(k).reset_index(drop=True)
        assert len(b1) == len(b2)
        assert (b1["ts_dod_blob"] == b2["ts_dod_blob"]).all()
        assert (b1["val_xor_blob"] == b2["val_xor_blob"]).all()
        blocks.unpersist()
    finally:
        filled.unpersist()
