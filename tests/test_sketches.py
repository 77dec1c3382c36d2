"""Mergeability properties of the sketch rollups (tsrollup/sketches.py).

The contract under test is the same one rollup.py holds for its algebraic
aggregates: building partials at a FINER key set and merging them up must
equal computing directly at the coarser key set — that is what makes the
1m → 1h → 1d cascade legal without re-scanning raw data.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup import sketches
from tsrollup.config import CASCADE_FROM, TIER_TRUNC
from tsrollup.storage import read_sequences

from .conftest import assert_frame_byte_equal


@pytest.fixture(scope="module")
def raw(spark, seq_fixture_small):
    df = read_sequences(spark, seq_fixture_small)
    df.cache().count()
    yield df
    df.unpersist()


# ------------------------------------------------------------------ histogram

def test_hist_merge_equals_direct(spark, raw):
    """Partials at (source, doc_id%4) merged to source == direct at source."""
    finer = raw.withColumn("split", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    parts = sketches.hist_partials(finer, ["source", "split"], "n_tok", bin_width=8.0)
    merged = sketches.hist_merge(parts, ["source"]).toPandas()
    direct = sketches.hist_partials(raw, ["source"], "n_tok", bin_width=8.0).toPandas()
    direct = direct.rename(columns={"bin_cnt": "bin_cnt"})
    assert_frame_byte_equal(
        merged.astype({"bin_cnt": "int64"}),
        direct.astype({"bin_cnt": "int64"}),
        ["source", "bin"],
        "hist merge",
    )


def test_hist_percentiles_vs_numpy(spark, raw):
    """Histogram percentile upper-edge estimate brackets the true percentile
    within one bin width, and totals are conserved."""
    w = 8.0
    parts = sketches.hist_partials(raw, ["source"], "n_tok", bin_width=w)
    pct = sketches.hist_percentiles(parts, ["source"], [500, 950, 990], bin_width=w)
    got = pct.toPandas().set_index("source")
    pdf = raw.select("source", "n_tok").toPandas()
    for source, grp in pdf.groupby("source"):
        vals = grp["n_tok"].to_numpy()
        for q, col in [(0.5, "p500"), (0.95, "p950"), (0.99, "p990")]:
            # inverted-CDF percentile: smallest x with CDF(x) >= q
            true = np.sort(vals)[int(np.ceil(q * len(vals))) - 1]
            est = got.loc[source, col]
            assert est - w <= true <= est, (source, col, true, est)


def test_hist_total_conserved(spark, raw):
    parts = sketches.hist_partials(raw, ["source"], "n_tok", bin_width=8.0)
    total = parts.agg(F.sum("bin_cnt")).collect()[0][0]
    assert total == raw.where(F.col("n_tok").isNotNull()).count()


# -------------------------------------------------------------- second moments

def test_moments_merge_equals_direct_and_numpy(spark, raw):
    split = raw.withColumn("split", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    finer = sketches.moment_partials(split, ["source", "split"], "n_tok")
    merged = sketches.moment_finalize(
        sketches.moment_merge(finer, ["source"])
    ).toPandas()
    pdf = raw.select("source", "n_tok").toPandas()
    for _, row in merged.iterrows():
        vals = pdf.loc[pdf["source"] == row["source"], "n_tok"].to_numpy(np.float64)
        assert row["cnt"] == len(vals)
        assert row["mean"] == pytest.approx(vals.mean(), abs=1e-6)
        assert row["var_pop"] == pytest.approx(vals.var(), rel=1e-9, abs=1e-6)
        assert row["stddev_pop"] == pytest.approx(vals.std(), rel=1e-9, abs=1e-6)


def test_moments_decimal_exact_beyond_float(spark):
    """s2 must be exact where float64 accumulation is not: values ~2^30 so
    each square is ~2^60 and the float64-representable grid is 2^8 apart."""
    base = 1_073_741_827  # 2^30 + 3, odd so squares exercise low bits
    vals = [(base + i,) for i in range(200)]
    df = spark.createDataFrame(vals, "v long").withColumn("k", F.lit("g"))
    merged = sketches.moment_merge(
        sketches.moment_partials(df, ["k"], "v"), ["k"]
    ).collect()[0]
    exact_s1 = sum(v for (v,) in vals)
    exact_s2 = sum(v * v for (v,) in vals)
    assert int(merged["m_s1"]) == exact_s1
    assert int(merged["m_s2"]) == exact_s2  # would fail with float64 sums


# ------------------------------------------------------------------------ HLL

def test_hll_tier_cascade_matches_exact_distinct(spark, raw):
    """Tiered HLL sketches. At 1m the per-bucket cardinality sits in the
    sketch's exact coupon regime → estimates equal true count-distinct.
    At 1d cardinality (~3k) the sketch is in HLL mode → (a) estimates stay
    inside the lgK=12 error envelope and (b) the CASCADED 1d (union of 1m
    sketches up through 1h) estimates within a tight envelope of a
    direct-from-raw 1d sketch — the property that makes the tier cascade
    legal."""
    tiers = sketches.hll_rollup_tiers(
        raw, CASCADE_FROM, TIER_TRUNC, value_col="doc_id", ts_col="event_ts"
    )

    def truth(tier):
        return (
            raw.withColumn(
                "bucket_start", F.date_trunc(TIER_TRUNC[tier], "event_ts")
            )
            .groupBy("source", "bucket_start")
            .agg(F.count_distinct("doc_id").alias("approx_distinct"))
            .toPandas()
        )

    est_1m = sketches.hll_estimate(tiers["1m"]).toPandas()
    assert_frame_byte_equal(
        est_1m.astype({"approx_distinct": "int64"}),
        truth("1m").astype({"approx_distinct": "int64"}),
        ["source", "bucket_start"],
        "hll 1m",
    )

    est_1d = (
        sketches.hll_estimate(tiers["1d"])
        .toPandas()
        .set_index(["source", "bucket_start"])["approx_distinct"]
    )
    true_1d = truth("1d").set_index(["source", "bucket_start"])["approx_distinct"]
    rel = ((est_1d - true_1d).abs() / true_1d).max()
    assert rel <= 0.05, f"1d HLL estimate outside error envelope: {rel:.4f}"

    # Cascade vs direct: the union is an equally-accurate estimator of the
    # same set but NOT register-identical to a direct build once sketches
    # leave the coupon regime (measured: ~0.3% apart on this fixture) — so
    # compare as estimators, tightly.
    direct_1d = (
        sketches.hll_estimate(
            sketches.hll_partials(
                raw.withColumn("bucket_start", F.date_trunc("day", "event_ts")),
                ["source", "bucket_start"],
                "doc_id",
            )
        )
        .toPandas()
        .set_index(["source", "bucket_start"])["approx_distinct"]
    )
    # each estimate has sd ~1.04/sqrt(2^12) = 1.6% at lgK=12; allow ~1.3
    # combined-sigma for the DIFFERENCE of two estimates of the same set
    # (they share most register state, so observed drift is far below the
    # independent-estimates bound; measured 0.3-1.0% on fixture variants)
    drift = ((est_1d - direct_1d).abs() / direct_1d).max()
    assert drift <= 0.03, f"cascade vs direct sketch drift too large: {drift:.4f}"


def test_hll_union_equals_direct_sketch(spark, raw):
    """Union of per-day sketches stays within a tight envelope of one direct
    sketch over the same rows — the union does not degrade the estimator
    (the HLL merge is register-max, same lgK), it just isn't guaranteed
    register-identical once sketches are past the coupon regime."""
    direct = (
        sketches.hll_estimate(sketches.hll_partials(raw, ["source"], "doc_id"))
        .toPandas()
        .set_index("source")["approx_distinct"]
    )
    daily = sketches.hll_partials(
        raw.withColumn("day", F.to_date("event_ts")), ["source", "day"], "doc_id"
    )
    unioned = (
        sketches.hll_estimate(sketches.hll_merge(daily, ["source"]))
        .toPandas()
        .set_index("source")["approx_distinct"]
    )
    drift = ((unioned - direct).abs() / direct).max()
    assert drift <= 0.03, f"union vs direct sketch drift: {drift:.4f}"


# ------------------------------------------------------------------ CMS

def test_cms_upper_bound_and_merge(spark, raw):
    """Count-Min invariants over the token payload: (1) est(x) >= true(x)
    for EVERY token; (2) each depth row conserves the total token count;
    (3) shard-built sketches merged cell-wise equal the whole-corpus
    sketch (the 100-TB build shape); (4) 64 cells vs a larger vocab must
    show at least one genuine overestimate (min-over-rows is doing work)."""
    from tsrollup.tokenstats import token_histogram

    W, D = 64, 3
    hist = token_histogram(raw).localCheckpoint()
    cms = sketches.cms_from_counts(hist, "token_id", "cnt", width=W, depth=D)
    cms_pd = cms.toPandas()
    total = hist.agg(F.sum("cnt")).collect()[0][0]
    per_row = cms_pd.groupby("r")["cnt"].sum()
    assert (per_row == total).all(), "each CMS row must conserve the corpus total"

    est = sketches.cms_estimate(cms, hist, "token_id", width=W, depth=D).toPandas()
    truth = hist.toPandas().set_index("token_id")["cnt"]
    est = est.set_index("item")["cnt_cms"]
    assert set(est.index) == set(truth.index)
    diffs = est.reindex(truth.index) - truth
    assert (diffs >= 0).all(), "CMS may never underestimate"
    assert (diffs > 0).any(), "64 cells vs the vocab must collide somewhere"

    # shard-and-merge == direct: split the histogram rows two ways, build a
    # sketch per shard, add cell-wise
    h_a = hist.where(F.col("token_id") % 2 == 0)
    h_b = hist.where(F.col("token_id") % 2 == 1)
    merged = (
        sketches.cms_from_counts(h_a, "token_id", "cnt", width=W, depth=D)
        .unionByName(sketches.cms_from_counts(h_b, "token_id", "cnt", width=W, depth=D))
        .groupBy("r", "cell")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
    )
    key = ["r", "cell"]
    a = merged.sort_values(key).reset_index(drop=True)
    b = cms_pd.sort_values(key).reset_index(drop=True)
    assert a.equals(b), "cell-wise shard merge must equal the direct sketch"


def test_cms_rejects_bad_shape():
    with pytest.raises(ValueError, match="positive"):
        sketches.cms_from_counts(None, "t", "c", width=0, depth=3)


# ------------------------------------------------------------------------ KLL

def test_kll_exact_regime_merge_equals_direct(spark, raw):
    """n <= k per group: the sketch is lossless, so (a) fine partials
    merged up carry EXACTLY the same multiset as a direct coarse build
    (every item at level 0, weight 1) and (b) percentiles equal the exact
    discrete value-at-rank."""
    k = 100_000  # far above any group size in the fixture
    finer = raw.withColumn("split", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    fine = sketches.kll_partials(finer, ["source", "split"], "n_tok", k=k)
    merged = sketches.kll_merge(fine, ["source"], k=k)
    direct = sketches.kll_partials(raw, ["source"], "n_tok", k=k)
    m = merged.toPandas().sort_values(["source", "level", "value"]).reset_index(drop=True)
    d = direct.toPandas().sort_values(["source", "level", "value"]).reset_index(drop=True)
    assert (m["level"] == 0).all() and (d["level"] == 0).all()
    pd.testing.assert_frame_equal(m, d)

    got = (
        sketches.kll_percentiles(merged, ["source"], [500, 950, 990])
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    pdf = raw.select("source", "n_tok").toPandas()
    for src, grp in pdf.groupby("source"):
        v = np.sort(grp["n_tok"].to_numpy())
        n = len(v)
        for q in (500, 950, 990):
            exact = v[int(np.ceil(q * n / 1000.0)) - 1]  # value at rank ceil(qn/1000)
            assert got.loc[src, f"p{q}"] == exact, (src, q)


def test_kll_rank_error_envelope(spark):
    """Compaction regime: absolute rank error of every extracted quantile
    stays within 3n/k (conservative vs the KLL O(n/k) bound; measured
    ~1.7n/k worst-case on this fixture) — for a direct build AND for a
    sharded build merged up, on adversarially skewed data."""
    rng = np.random.default_rng(7)
    n, k = 60_000, 200
    vals = np.concatenate(
        [rng.standard_normal(n // 2) * 10, rng.exponential(100, n // 2)]
    )
    pdf = pd.DataFrame(
        {"g": "all", "shard": np.arange(n) % 16, "v": vals}
    )
    df = spark.createDataFrame(pdf)
    svals = np.sort(vals)

    def max_rank_err(pctl_pdf):
        worst = 0
        for q in (100, 250, 500, 750, 900, 950, 990, 999):
            est = pctl_pdf[f"p{q}"].iloc[0]
            # rank of the estimate vs target rank
            r_est = np.searchsorted(svals, est, side="right")
            worst = max(worst, abs(r_est - q * n / 1000.0))
        return worst

    qs = [100, 250, 500, 750, 900, 950, 990, 999]
    direct = sketches.kll_percentiles(
        sketches.kll_partials(df, ["g"], "v", k=k), ["g"], qs
    ).toPandas()
    sharded = sketches.kll_percentiles(
        sketches.kll_merge(
            sketches.kll_partials(df, ["g", "shard"], "v", k=k), ["g"], k=k
        ),
        ["g"],
        qs,
    ).toPandas()
    bound = 3.0 * n / k
    e_direct, e_sharded = max_rank_err(direct), max_rank_err(sharded)
    assert e_direct <= bound, f"direct rank error {e_direct} > {bound}"
    assert e_sharded <= bound, f"sharded+merged rank error {e_sharded} > {bound}"


def test_kll_tier_cascade_long_format(spark, raw):
    """The rollup-store shape: 1m partials -> 1h merge -> 1d merge, all in
    the long (keys..., level, value) format; total sketch WEIGHT (sum of
    2^level) tracks the input row count within the compaction rounding
    budget (an odd-length buffer compaction shifts weight by +-2^h; even
    ones conserve it exactly), so every tier still "represents" n rows."""
    k = 64
    base = raw.withColumn("bucket_start", F.date_trunc("minute", "event_ts"))
    m1 = sketches.kll_partials(base, ["source", "bucket_start"], "n_tok", k=k)
    h1 = sketches.kll_merge(
        m1.withColumn("bucket_start", F.date_trunc("hour", "bucket_start")),
        ["source", "bucket_start"],
        k=k,
    )
    d1 = sketches.kll_merge(
        h1.withColumn("bucket_start", F.date_trunc("day", "bucket_start")),
        ["source", "bucket_start"],
        k=k,
    )
    n_rows = raw.where(F.col("n_tok").isNotNull()).count()
    for tier in (m1, h1, d1):
        w = (
            tier.select(F.expr("CAST(pow(2, level) AS BIGINT)").alias("w"))
            .agg(F.sum("w"))
            .collect()[0][0]
        )
        assert abs(w - n_rows) <= max(64, n_rows // 20), (
            f"sketch weight {w} drifted from input rows {n_rows}"
        )
