"""Fused derived phase (detect.derive_fused) parity.

The fused single-pass kernel must be byte-identical to the three legacy
per-pass transforms it replaces — score_tier (W1+W2), residual_stats (W3),
compress_tier (C1+C2) — per tier, including blob bytes. Parity is
structural (same kernel code objects, same call arguments), and this test
pins it so neither side can drift alone.
"""

import os

import pytest
from pyspark.sql import functions as F

from tsrollup import codec, detect, gapfill
from tsrollup.config import RollupConfig
from tsrollup.storage import read_sequences
from tsrollup.rollup import build_all_tiers

from .conftest import assert_frame_byte_equal


@pytest.fixture(scope="module")
def filled_tiers(spark, seq_fixture_small):
    cfg = RollupConfig()
    tiers = build_all_tiers(read_sequences(spark, seq_fixture_small), cfg)
    return {
        t: gapfill.gapfill(df, t, cfg).persist() for t, df in tiers.items()
    }


def _fused(spark, filled_tiers, cfg):
    union = None
    for t in ("1m", "1h", "1d"):
        union = filled_tiers[t] if union is None else union.unionByName(filled_tiers[t])
    return detect.derive_fused(union, cfg).persist()


def test_fused_scores_match_legacy(spark, filled_tiers):
    cfg = RollupConfig()
    fused = _fused(spark, filled_tiers, cfg)
    got = (
        fused.where("kind = 'score'")
        .select("source", "bucket_start", "tier", "detector", "value", "score", "is_anomaly")
        .toPandas()
    )
    legacy = None
    for t, df in filled_tiers.items():
        sc = detect.score_tier(df, t, cfg)
        legacy = sc if legacy is None else legacy.unionByName(sc)
    assert_frame_byte_equal(
        got, legacy.toPandas(),
        ["source", "tier", "detector", "bucket_start"], msg="fused scores",
    )


def test_fused_stats_match_legacy(spark, filled_tiers):
    cfg = RollupConfig()
    fused = _fused(spark, filled_tiers, cfg)
    got = (
        fused.where("kind = 'stat'")
        .select("source", "tier", "detector", F.col("n").cast("long").alias("n"),
                "mean", "var_pop")
        .toPandas()
    )
    legacy = None
    for t, df in filled_tiers.items():
        st = detect.residual_stats(df, t, cfg)
        legacy = st if legacy is None else legacy.unionByName(st)
    assert_frame_byte_equal(
        got, legacy.toPandas(), ["source", "tier", "detector"], msg="fused stats",
    )


def test_fused_blocks_match_legacy(spark, filled_tiers):
    cfg = RollupConfig()
    fused = _fused(spark, filled_tiers, cfg)
    got = (
        fused.where("kind = 'block'")
        .select("source", "tier", "metric", "block_start", "n_points",
                "ts_dod_blob", "val_xor_blob")
        .toPandas()
    )
    legacy = None
    for t, df in filled_tiers.items():
        bl = codec.compress_tier(df, t, cfg)
        legacy = bl if legacy is None else legacy.unionByName(bl)
    exp = legacy.toPandas()
    keys = ["source", "tier", "metric", "block_start"]
    assert_frame_byte_equal(got, exp, keys, msg="fused blocks")
    # blob byte-identity, explicitly (assert_frame_byte_equal covers it via
    # exact equality on object cols, but spell out the invariant)
    g = got.sort_values(keys, kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert all(bytes(a) == bytes(b) for a, b in zip(g["ts_dod_blob"], e["ts_dod_blob"]))
    assert all(bytes(a) == bytes(b) for a, b in zip(g["val_xor_blob"], e["val_xor_blob"]))


def test_rollup_build_uses_fused_path(spark, seq_fixture_small, tmp_path):
    """End-to-end: rollup_build's derived outputs via the fused path equal
    the legacy sharded=None per-pass outputs recomputed here."""
    from tsrollup.pipeline import SCORES_DIR, STATS_DIR, rollup_build

    cfg = RollupConfig()
    out = os.path.join(str(tmp_path), "store")
    s = rollup_build(spark, seq_fixture_small, out, cfg)
    assert "derive_fused" in s["phases"], s["phases"]
    scores = spark.read.parquet(os.path.join(out, SCORES_DIR))
    stats = spark.read.parquet(os.path.join(out, STATS_DIR))
    legacy_sc = None
    for t, df in spark_filled(spark, seq_fixture_small, cfg).items():
        sc = detect.score_tier(df, t, cfg)
        legacy_sc = sc if legacy_sc is None else legacy_sc.unionByName(sc)
    assert_frame_byte_equal(
        scores.select("source", "bucket_start", "tier", "detector", "value",
                      "score", "is_anomaly").toPandas(),
        legacy_sc.toPandas(),
        ["source", "tier", "detector", "bucket_start"],
        msg="store scores",
    )
    assert stats.count() > 0


def spark_filled(spark, fixture, cfg):
    tiers = build_all_tiers(read_sequences(spark, fixture), cfg)
    return {t: gapfill.gapfill(df, t, cfg) for t, df in tiers.items()}


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_in_kernel_fill_matches_spark_gapfill(spark, seq_fixture_small, method):
    """fill='locf'/'linear' (raw rows in, gap-fill inside the kernel —
    detect._fill_group_pdf) must be byte-identical to the Spark gapfill()
    route across ALL output kinds including state rows: same spine, same
    LOCF copy / pinned linear kernel, same blobs."""
    cfg = RollupConfig(gapfill_method=method)
    tiers = build_all_tiers(read_sequences(spark, seq_fixture_small), cfg)
    raw_union = filled_union = None
    for t, df in tiers.items():
        raw_union = df if raw_union is None else raw_union.unionByName(df)
        f = gapfill.gapfill(df, t, cfg)
        filled_union = f if filled_union is None else filled_union.unionByName(f)
    got = detect.derive_fused(
        raw_union, cfg, emit_state=True, fill=method
    ).toPandas()
    exp = detect.derive_fused(filled_union, cfg, emit_state=True).toPandas()
    assert sorted(got["kind"].unique()) == sorted(exp["kind"].unique())
    for df in (got, exp):
        for c in ("ts_dod_blob", "val_xor_blob", "state"):
            df[c] = df[c].map(lambda b: None if b is None else bytes(b))
    assert_frame_byte_equal(
        got, exp,
        ["kind", "source", "tier", "detector", "metric", "bucket_start",
         "block_start"],
        msg=f"in-kernel fill ({method})",
    )
