"""Hot-source detector sharding (SURVEY.md §2.6): the sharded path —
W-1 halo for z-score, SCAN_CHUNK-aligned (s, v) carry for EWMA, Welford
triple carry — must be BYTE-identical to the unsharded whole-series path,
including warmup NaNs, window-boundary rows, and residual-stats finals."""

import numpy as np
import pandas as pd
import pytest

from tsrollup import kernels
from tsrollup.config import DetectorConfig, RollupConfig
from tsrollup.detect import residual_stats, score_tier, score_tier_sharded
from tsrollup.gapfill import gapfill
from tsrollup.rollup import build_all_tiers
from tsrollup.storage import read_sequences

from .conftest import assert_frame_byte_equal, normalize_ts


def _read(df):
    pdf = normalize_ts(df.toPandas(), ("bucket_start",))
    return pdf


@pytest.fixture(scope="module")
def filled_1m(spark, seq_fixture_small):
    cfg = RollupConfig()
    tiers = build_all_tiers(read_sequences(spark, seq_fixture_small), cfg)
    filled = gapfill(tiers["1m"], "1m", cfg).persist()
    filled.count()
    yield filled
    filled.unpersist()


def test_sharded_scores_byte_equal_unsharded(spark, filled_1m):
    cfg = RollupConfig()  # default detector (W=60)
    sharded_cfg = RollupConfig(
        detector=DetectorConfig(shard_buckets=2 * kernels.SCAN_CHUNK)
    )
    base = _read(score_tier(filled_1m, "1m", cfg))
    sc, st = score_tier_sharded(filled_1m, "1m", sharded_cfg)
    got = _read(sc)
    keys = ["source", "detector", "bucket_start"]
    assert_frame_byte_equal(got, base, keys, msg="sharded scores")

    base_st = _read(residual_stats(filled_1m, "1m", cfg))
    got_st = _read(st)
    assert_frame_byte_equal(
        got_st, base_st, ["source", "detector"], msg="sharded residual stats"
    )


def test_sharded_carry_never_collects_per_shard(spark, filled_1m, monkeypatch):
    """The carry chain flows through the distributed state table: exactly
    TWO driver collects regardless of shard count (the n_shards bound and
    the final stats), never one per shard."""
    cls = type(filled_1m)  # concrete class (Spark 4: classic.DataFrame)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    sharded_cfg = RollupConfig(
        detector=DetectorConfig(shard_buckets=kernels.SCAN_CHUNK)  # many shards
    )
    sc, st = score_tier_sharded(filled_1m, "1m", sharded_cfg)
    n_score_rows = sc.count()
    assert n_score_rows > 0 and st.count() > 0
    assert calls["n"] == 2, f"expected 2 driver collects, saw {calls['n']}"


def test_shard_alignment_validation(filled_1m):
    bad = RollupConfig(detector=DetectorConfig(shard_buckets=100))  # not %64
    with pytest.raises(ValueError, match="SCAN_CHUNK"):
        score_tier_sharded(filled_1m, "1m", bad)


def test_ewma_carry_is_bit_exact_kernel_level():
    """Kernel-level shard equivalence without Spark: split at a SCAN_CHUNK
    multiple, carry (s, v), compare every float bitwise."""
    rng = np.random.default_rng(3)
    x = rng.normal(300, 30, 1000)
    s, r, sc = kernels.ewma_detector(x, 0.3, 1e-12)
    cut = 5 * kernels.SCAN_CHUNK
    s1, r1, sc1, st1 = kernels.ewma_detector(x[:cut], 0.3, 1e-12, with_state=True)
    s2, r2, sc2 = kernels.ewma_detector(x[cut:], 0.3, 1e-12, init=st1)
    for full, a, b in ((s, s1, s2), (r, r1, r2), (sc, sc1, sc2)):
        joined = np.concatenate((a, b))
        assert np.array_equal(
            full.view(np.uint64), joined.view(np.uint64)
        ), "EWMA shard carry is not bit-exact"


def test_zscore_halo_is_bit_exact_kernel_level():
    rng = np.random.default_rng(4)
    x = rng.normal(10, 2, 500)
    W = 60
    z, _ = kernels.rolling_zscore(x, W, 3.0)
    cut = 200
    z1, _ = kernels.rolling_zscore(x[:cut], W, 3.0)
    tail = x[cut - (W - 1) : cut]
    z2_full, _ = kernels.rolling_zscore(np.concatenate((tail, x[cut:])), W, 3.0)
    z2 = z2_full[W - 1 :]
    joined = np.concatenate((z1, z2))
    assert np.array_equal(z.view(np.uint64), joined.view(np.uint64))


def test_welford_fold_carry_matches_whole():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 777)
    v[10] = np.nan
    whole = kernels.welford_fold(v)
    a = kernels.welford_fold(v[:300])
    b = kernels.welford_fold(v[300:], *a)
    assert whole == b


def test_two_wave_fused_plan_byte_equal_and_few_jobs(spark):
    """The common 2-wave hot-source case takes the FUSED lazy plan (no
    per-wave localCheckpoint jobs): byte-equal to unsharded, and the
    whole scores+stats consumption costs only a handful of Spark jobs
    (the wave loop pays ~2 localCheckpoint jobs per wave on top)."""
    rng = np.random.default_rng(17)
    frames = []
    for src, n in (("hot", 100), ("warm", 70)):
        frames.append(
            pd.DataFrame(
                {
                    "source": src,
                    "bucket_start": pd.Timestamp("2024-01-01")
                    + pd.to_timedelta(np.arange(n), unit="m"),
                    "n_tok_mean": rng.normal(250.0, 30.0, n),
                }
            )
        )
    filled = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    cfg = RollupConfig()
    sharded_cfg = RollupConfig(
        detector=DetectorConfig(shard_buckets=kernels.SCAN_CHUNK)  # 64 -> 2 waves
    )

    SparkDF = type(filled)  # concrete class (Spark 4: classic.DataFrame)
    checkpoints = {"n": 0}
    orig_lc = SparkDF.localCheckpoint

    def run(fuse: bool, monkey):
        checkpoints["n"] = 0
        if monkey:
            SparkDF.localCheckpoint = lambda self, *a, **k: (
                checkpoints.__setitem__("n", checkpoints["n"] + 1)
                or orig_lc(self, *a, **k)
            )
        try:
            sc_df, st_df = score_tier_sharded(
                filled, "1m", sharded_cfg, fuse_two_waves=fuse
            )
            return _read(sc_df), _read(st_df), checkpoints["n"]
        finally:
            SparkDF.localCheckpoint = orig_lc

    got, got_st, fused_cp = run(True, monkey=True)
    loop, loop_st, loop_cp = run(False, monkey=True)

    base = _read(score_tier(filled, "1m", cfg))
    base_st = _read(residual_stats(filled, "1m", cfg))
    keys = ["source", "detector", "bucket_start"]
    assert_frame_byte_equal(got, base, keys, msg="2-wave fused scores")
    assert_frame_byte_equal(loop, base, keys, msg="2-wave loop scores")
    assert_frame_byte_equal(
        got_st, base_st, ["source", "detector"], msg="2-wave fused stats"
    )
    assert_frame_byte_equal(
        loop_st, base_st, ["source", "detector"], msg="2-wave loop stats"
    )
    # the fused plan materializes NOTHING eagerly — the wave loop pays a
    # full localCheckpoint write of each wave's output (+ state tables).
    # (Job COUNTS are not the right meter here: AQE splits one action into
    # many jobs and both paths land within one job of each other.)
    assert fused_cp == 0, f"fused path localCheckpointed {fused_cp}x"
    assert loop_cp >= 3, f"wave loop expected >=3 checkpoints, saw {loop_cp}"
