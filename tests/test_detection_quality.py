"""Planted-anomaly sanity (FIXTURES.md §A ground truth): the detectors must
actually FIND the synthesized anomalies — spikes flagged by z-score, level
shift flagged by EWMA at onset, deleted spans synthesized by gap-fill.
These are detection-quality checks, not byte-parity (that's test_rollup_parity).
"""

import pytest
from pyspark.sql import functions as F

from tsrollup.config import RollupConfig
from tsrollup.detect import score_tier
from tsrollup.gapfill import gapfill
from tsrollup.rollup import build_all_tiers
from tsrollup.storage import read_sequences


@pytest.fixture(scope="module")
def scored(spark, seq_fixture_small):
    cfg = RollupConfig()
    df = read_sequences(spark, seq_fixture_small)
    tiers = build_all_tiers(df, cfg)
    filled = gapfill(tiers["1m"], "1m", cfg).persist()
    scores = score_tier(filled, "1m", cfg).persist()
    exp = spark.read.parquet(
        seq_fixture_small.replace("sequences.parquet", "expected_anomalies.parquet")
    )
    yield filled, scores, exp
    filled.unpersist()
    scores.unpersist()


def _inside(df, windows):
    return df.join(
        windows,
        (df.source == windows.source)
        & (df.bucket_start >= windows.window_start)
        & (df.bucket_start < windows.window_end),
    )


def test_spikes_flagged_by_zscore(scored):
    _filled, scores, exp = scored
    spikes = exp.where("kind='spike'")
    assert spikes.count() == 3
    flagged = _inside(scores.where("detector='zscore' and is_anomaly"), spikes)
    # every planted spike window contains at least one flagged bucket
    per_window = flagged.groupBy(spikes.source).count()
    assert per_window.count() == 3


def test_shift_flagged_by_ewma(scored):
    _filled, scores, exp = scored
    shift = exp.where("kind='shift'")
    onset = shift.collect()[0]
    hits = (
        scores.where("detector='ewma' and is_anomaly")
        .where(F.col("source") == onset.source)
        .where(
            (F.col("bucket_start") >= onset.window_start)
            & (F.col("bucket_start") < F.lit(onset.window_start) + F.expr("INTERVAL 30 MINUTES"))
        )
    )
    assert hits.count() >= 1, "EWMA must flag the level-shift onset"


def test_gaps_synthesized(scored):
    filled, _scores, exp = scored
    gaps = exp.where("kind='gap'")
    assert gaps.count() == 2
    gf = _inside(filled.where("gap_filled"), gaps)
    per_window = gf.groupBy(gaps.source).count()
    assert per_window.count() == 2, "each planted deletion span must yield gap buckets"
    # gap rows carry no mass and LOCF'd values
    rows = gf.select(filled.cnt, filled.n_tok_mean).collect()
    assert all(r.cnt == 0 for r in rows)
    assert all(r.n_tok_mean is not None for r in rows)
