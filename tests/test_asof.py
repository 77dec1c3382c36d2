"""asof_join (tsrollup.asof) vs pandas.merge_asof — the independent
reference implementation of backward as-of semantics."""

import numpy as np
import pandas as pd
import pytest

from tsrollup.asof import asof_join


def _mk(spark, pdf):
    return spark.createDataFrame(pdf)


def _rand_frames(seed, n_left=400, n_right=300, n_keys=7):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": base + rng.integers(0, 10**9, n_left).astype("timedelta64[us]"),
            "lv": rng.normal(size=n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": base + rng.integers(0, 10**9, n_right).astype("timedelta64[us]"),
            "rv": rng.normal(size=n_right),
        }
    )
    # unique per (k, ts) — the asof contract (and merge_asof determinism)
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    return left, right


def _reference(left, right, tolerance_us=None):
    kw = {}
    if tolerance_us is not None:
        kw["tolerance"] = pd.Timedelta(microseconds=tolerance_us)
    return pd.merge_asof(
        left.sort_values(["ts", "k"], kind="mergesort").reset_index(drop=True),
        right.sort_values(["ts", "k"], kind="mergesort").reset_index(drop=True),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_r"),
        **kw,
    )


def _canon(pdf, cols):
    return (
        pdf[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_pandas_merge_asof(spark, seed):
    left, right = _rand_frames(seed)
    got = asof_join(
        _mk(spark, left), _mk(spark, right), on=["k"],
        left_ts="ts", right_ts="ts",
    ).toPandas()
    ref = _reference(left, right)
    got["rv"] = got["rv_asof"]
    ref_c = _canon(ref, ["k", "ts", "lv", "rv"])
    got_c = _canon(got, ["k", "ts", "lv", "rv"])
    pd.testing.assert_frame_equal(got_c, ref_c, check_dtype=False)
    # matched instants come along and respect right_ts <= left_ts
    m = got[got["ts_asof"].notna()]
    assert (m["ts_asof"] <= m["ts"]).all()


def test_asof_equal_timestamp_matches(spark):
    left = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-01 00:00:00")], "lv": [1.0]}
    )
    right = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-01 00:00:00")], "rv": [9.0]}
    )
    got = asof_join(_mk(spark, left), _mk(spark, right), on=["k"]).toPandas()
    assert got["rv_asof"].iloc[0] == 9.0  # <= contract: same instant matches


def test_asof_no_prior_is_null(spark):
    left = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-01 00:00:00")], "lv": [1.0]}
    )
    right = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-02 00:00:00")], "rv": [9.0]}
    )
    got = asof_join(_mk(spark, left), _mk(spark, right), on=["k"]).toPandas()
    assert got["rv_asof"].isna().all() and got["ts_asof"].isna().all()


@pytest.mark.parametrize("tol_us", [50_000_000, 500_000_000])
def test_asof_tolerance_matches_pandas(spark, tol_us):
    left, right = _rand_frames(3)
    got = asof_join(
        _mk(spark, left), _mk(spark, right), on=["k"],
        left_ts="ts", right_ts="ts", tolerance_us=tol_us,
    ).toPandas()
    ref = _reference(left, right, tolerance_us=tol_us)
    got["rv"] = got["rv_asof"]
    pd.testing.assert_frame_equal(
        _canon(got, ["k", "ts", "lv", "rv"]),
        _canon(ref, ["k", "ts", "lv", "rv"]),
        check_dtype=False,
    )


def test_interpolated_read_semantics(spark):
    """Lerp between bracketing observations; exact-coincident sample
    wins (factor 0); edges clamp; no-obs key yields NULL."""
    import pandas as pd

    from tsrollup.asof import interpolated_read

    obs = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["a"] * 3 + ["b"],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                     "2024-01-01 02:00:00", "2024-01-01 00:30:00"]
                ),
                "value": [10.0, 20.0, 40.0, 7.0],
                "event_id": [1, 2, 3, 4],
            }
        )
    )
    qs = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["a"] * 5 + ["c"],
                "qid": [1, 2, 3, 4, 5, 6],
                "ts": pd.to_datetime(
                    ["2024-01-01 00:15:00",  # lerp 10->20 at 1/4: 12.5
                     "2024-01-01 01:00:00",  # coincident: exactly 20
                     "2024-01-01 01:45:00",  # lerp 20->40 at 3/4: 35
                     "2023-12-31 23:00:00",  # before first: clamp 10
                     "2024-01-01 03:00:00",  # after last: clamp 40
                     "2024-01-01 00:15:00"]  # key with no obs: NULL
                ),
            }
        )
    )
    out = {
        r["qid"]: r.asDict()
        for r in interpolated_read(
            qs, obs, on=["key"], tiebreak="event_id"
        ).collect()
    }
    assert out[1]["value_interp_r"] == 12.5
    assert out[2]["value_interp_r"] == 20.0
    assert out[2]["us_since_prev"] == 0
    assert out[3]["value_interp_r"] == 35.0
    assert out[4]["value_interp_r"] == 10.0 and out[4]["us_since_prev"] is None
    assert out[5]["value_interp_r"] == 40.0 and out[5]["us_to_next"] is None
    assert out[6]["value_interp_r"] is None
