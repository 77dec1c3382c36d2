"""End-to-end parity: Spark engine vs the pandas/NumPy oracle (SURVEY.md §5.3).

Every tier's rollup rows, gap-filled rows, and anomaly scores must be
byte-identical to tsrollup.reference_impl on the deterministic fixture.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tsrollup import reference_impl as oracle
from tsrollup.config import RollupConfig
from tsrollup.detect import residual_stats, score_tier
from tsrollup.gapfill import gapfill
from tsrollup.rollup import build_all_tiers
from tsrollup.storage import read_sequences

from .conftest import assert_frame_byte_equal, normalize_ts

TS_COLS = ("bucket_start", "event_ts")


@pytest.fixture(scope="module")
def seq_pdf(seq_fixture_small):
    return pq.read_table(seq_fixture_small).to_pandas()


@pytest.fixture(scope="module")
def spark_tiers(spark, seq_fixture_small):
    df = read_sequences(spark, seq_fixture_small)
    tiers = build_all_tiers(df, RollupConfig())
    # persist: every parity test re-actions these lazy plans otherwise
    tiers = {t: d.persist() for t, d in tiers.items()}
    yield tiers
    for d in tiers.values():
        d.unpersist()


@pytest.fixture(scope="module")
def oracle_tiers(seq_pdf):
    cfg = RollupConfig()
    tiers = {}
    from tsrollup.config import CASCADE_FROM

    for tier in cfg.tiers:
        src = CASCADE_FROM[tier]
        tiers[tier] = (
            oracle.rollup_from_raw(seq_pdf, tier) if src is None else oracle.cascade(tiers[src], tier)
        )
    return tiers


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_rollup_tier_parity(spark_tiers, oracle_tiers, tier):
    got = normalize_ts(spark_tiers[tier].toPandas(), TS_COLS)
    exp = normalize_ts(oracle_tiers[tier], TS_COLS)
    assert_frame_byte_equal(got, exp, ["source", "bucket_start"], msg=f"tier {tier}")


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_gapfill_parity(spark, spark_tiers, oracle_tiers, method):
    cfg = RollupConfig(gapfill_method=method)
    tier = "1m"
    got = normalize_ts(gapfill(spark_tiers[tier], tier, cfg).toPandas(), TS_COLS)
    exp = normalize_ts(oracle.gapfill(oracle_tiers[tier], tier, method), TS_COLS)
    assert_frame_byte_equal(got, exp, ["source", "bucket_start"], msg=f"gapfill {method}")
    # gap rows exist and carry no mass
    gaps = got[got["gap_filled"]]
    assert len(gaps) > 0
    assert (gaps["cnt"] == 0).all()
    assert gaps["n_tok_sum"].isna().all()


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_score_parity(spark, spark_tiers, oracle_tiers, tier):
    cfg = RollupConfig()
    filled_s = gapfill(spark_tiers[tier], tier, cfg)
    filled_o = oracle.gapfill(oracle_tiers[tier], tier, cfg.gapfill_method)
    got = normalize_ts(score_tier(filled_s, tier, cfg).toPandas(), TS_COLS)
    exp = normalize_ts(oracle.score_tier(filled_o, tier, cfg), TS_COLS)
    assert_frame_byte_equal(
        got, exp, ["source", "detector", "bucket_start"], msg=f"scores {tier}"
    )


def test_residual_stats_parity(spark, spark_tiers, oracle_tiers):
    cfg = RollupConfig()
    tier = "1m"
    filled_s = gapfill(spark_tiers[tier], tier, cfg)
    filled_o = oracle.gapfill(oracle_tiers[tier], tier, cfg.gapfill_method)
    got = residual_stats(filled_s, tier, cfg).toPandas()
    exp = oracle.residual_stats(filled_o, tier, cfg)
    assert_frame_byte_equal(got, exp, ["source", "detector"], msg="residual stats")


def test_token_bit_identity(spark, seq_fixture_small, seq_pdf):
    """BASELINE.json per-row invariant: tokens survive the pipeline
    bit-identical int32 (the engine only ever passes the column through)."""
    df = read_sequences(spark, seq_fixture_small).select("doc_id", "tokens")
    got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = seq_pdf[["doc_id", "tokens"]].sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for a, e in zip(got["tokens"], exp["tokens"]):
        a = np.asarray(a)
        e = np.asarray(e)
        assert a.dtype == np.int32 and e.dtype == np.int32
        assert np.array_equal(a, e)


def test_cascade_equals_direct(spark, spark_tiers, seq_fixture_small):
    """§5.4(b) cascade exactness: every cascaded tier equals the same tier
    aggregated DIRECTLY from raw (algebraic partials compose exactly)."""
    from tsrollup.rollup import rollup_from_raw

    df = read_sequences(spark, seq_fixture_small)
    for tier in ("1h", "1d"):
        direct = normalize_ts(rollup_from_raw(df, tier, None).toPandas(), TS_COLS)
        casc = normalize_ts(spark_tiers[tier].toPandas(), TS_COLS)
        assert_frame_byte_equal(
            casc, direct, ["source", "bucket_start"], msg=f"cascade {tier} vs direct"
        )


def test_partitioning_invariance(spark, seq_fixture_small):
    """Engine output is independent of physical partitioning: salted vs
    unsalted aggregation, different range-partition counts, and an input
    repartition all yield byte-identical scores (§2.2/§2.4). The real
    local[8]-vs-local[32] run happens in bench/scaling.py (separate JVMs —
    getOrCreate can't switch masters in-process)."""
    variants = {
        "a": (RollupConfig(salt_buckets=None, range_partitions=2), 1),
        "b": (RollupConfig(salt_buckets=8, range_partitions=32), 17),
    }
    results = {}
    for name, (cfg, n_part) in variants.items():
        df = read_sequences(spark, seq_fixture_small).repartition(n_part)
        tiers = build_all_tiers(df, cfg)
        filled = gapfill(tiers["1m"], "1m", cfg)
        results[name] = normalize_ts(score_tier(filled, "1m", cfg).toPandas(), TS_COLS)
    assert_frame_byte_equal(
        results["a"],
        results["b"],
        ["source", "detector", "bucket_start"],
        msg="partitioning invariance",
    )


def test_token_fold_kernel_matches_expression(spark):
    """The Arrow fold kernel (batch scan path) is bit-identical to the
    expression fold streaming uses (`token_reduce_cols`) — the pin that
    keeps the two prereduce paths from drifting. Covers the adversarial
    shapes: empty array (sentinel contract), single element, negatives,
    int32 extremes, and a long mixed array."""
    import datetime

    from pyspark.sql import functions as F

    from tsrollup.rollup import bucketize, token_prereduce, token_reduce_cols

    ts = datetime.datetime(2031, 3, 1, 12, 34, 56, tzinfo=datetime.timezone.utc)
    rows = [
        ("d0", [], 0, "s0", ts),
        ("d1", [7], 1, "s0", ts),
        ("d2", [-5, 3, -2147483648, 2147483647], 4, "s1", ts),
        ("d3", [2147483647, 2147483647, 2147483647], 3, "s1", ts),
        ("d4", list(range(-500, 500)), 1000, "s2", ts),
        ("d5", [0, 0, 0], 3, "s2", ts),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, "
              "event_ts timestamp"
    )
    b = bucketize(df, "1m")
    kern = token_prereduce(b, with_hash=True).toPandas()
    expr = b.select(
        "doc_id", "source", "bucket_start", *token_reduce_cols(),
        F.xxhash64("tokens").alias("row_hash"),
    ).toPandas()
    kern = kern.sort_values("doc_id").reset_index(drop=True)
    expr = expr.sort_values("doc_id").reset_index(drop=True)
    assert list(kern.columns) == list(expr.columns)
    for col in expr.columns:
        for a, e in zip(kern[col], expr[col]):
            assert a == e, f"{col}: kernel {a!r} != expression {e!r}"
