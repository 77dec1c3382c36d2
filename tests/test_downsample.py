"""M4 + LTTB downsampling (tsrollup.downsample).

The LTTB reference here is an INDEPENDENT straight-from-the-thesis loop
(Steinarsson 2013, §4.2) — no shared code with the engine kernel — so
kernel == reference is a real cross-check, not a tautology.
"""

import numpy as np
import pandas as pd
import pytest

from tsrollup.downsample import (
    downsample_lttb,
    downsample_lttb_grid,
    downsample_m4,
    lttb_grid_kernel,
    lttb_kernel,
)


# ------------------------------------------------------------------- M4

def test_m4_matches_pandas_reference(spark):
    rng = np.random.default_rng(7)
    n = 5000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n).astype(str),
            "ts": base + rng.integers(0, 3 * 86400 * 10**6, n).astype("timedelta64[us]"),
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    got = (
        downsample_m4(
            spark.createDataFrame(pdf), keys=["k"], ts_col="ts",
            value_col="v", bucket="hour", order_tiebreak="eid",
        )
        .toPandas()
        .sort_values(["k", "bucket"], kind="mergesort")
        .reset_index(drop=True)
    )
    ref_rows = []
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    for (k, b), g in pdf.sort_values(["ts", "eid"], kind="mergesort").groupby(
        ["k", "bucket"], sort=True
    ):
        ref_rows.append(
            (k, b, g["v"].iloc[0], g["v"].iloc[-1], g["v"].min(), g["v"].max(), len(g))
        )
    ref = pd.DataFrame(
        ref_rows, columns=["k", "bucket", "v_first", "v_last", "v_min", "v_max", "n_pts"]
    ).sort_values(["k", "bucket"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_m4_preserves_envelope(spark):
    # the whole point of M4: per-bucket min/max survive exactly
    rng = np.random.default_rng(8)
    n = 2000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    pdf = pd.DataFrame(
        {
            "k": ["s"] * n,
            "ts": base + np.sort(rng.integers(0, 86400 * 10**6, n)).astype("timedelta64[us]"),
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n) * 100,
        }
    )
    got = downsample_m4(
        spark.createDataFrame(pdf), keys=["k"], ts_col="ts",
        value_col="v", bucket="hour", order_tiebreak="eid",
    ).toPandas()
    assert got["v_min"].min() == pdf["v"].min()
    assert got["v_max"].max() == pdf["v"].max()


# ------------------------------------------------------------------ LTTB

def lttb_reference(x, y, n_out):
    """Thesis-literal loop (independent of the engine kernel)."""
    n = len(x)
    if n_out >= n or n <= 2:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = int(np.floor((i + 1) * every)) + 1
        nlo = hi
        nhi = int(np.floor((i + 2) * every)) + 1
        nhi = min(nhi, n)
        if nhi <= nlo:
            cx, cy = x[n - 1], y[n - 1]
        else:
            cx = float(np.mean(x[nlo:nhi]))
            cy = float(np.mean(y[nlo:nhi]))
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (x[a] - cx) * (y[j] - y[a]) - (x[a] - x[j]) * (cy - y[a])
            )
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        a = best
    out.append(n - 1)
    return out


@pytest.mark.parametrize("seed,n,n_out", [(0, 500, 50), (1, 1000, 3), (2, 997, 101), (3, 50, 49)])
def test_lttb_kernel_matches_reference(seed, n, n_out):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    v = rng.normal(size=n)
    got = lttb_kernel(ts, v, n_out)
    ref = lttb_reference(ts.astype(float), v, n_out)
    assert got.tolist() == ref


def test_lttb_identity_when_budget_covers():
    ts = np.arange(10, dtype=np.int64)
    v = np.arange(10, dtype=float)
    assert lttb_kernel(ts, v, 10).tolist() == list(range(10))
    assert lttb_kernel(ts, v, 50).tolist() == list(range(10))


def lttb_grid_reference(x, y, n_out):
    """Independent exact-integer LTTB loop: Python big-int arithmetic
    (no numpy, no int64 ceiling), area scaled by the next bucket's size
    m instead of dividing by it — the grid-twin recurrence."""
    n = len(x)
    if n_out >= n or n <= 2:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(np.floor(i * every)) + 1
        hi = int(np.floor((i + 1) * every)) + 1
        nlo, nhi = hi, min(int(np.floor((i + 2) * every)) + 1, n)
        if nhi <= nlo:
            sx, sy, m = int(x[n - 1]), int(y[n - 1]), 1
        else:
            sx = sum(int(t) for t in x[nlo:nhi])
            sy = sum(int(t) for t in y[nlo:nhi])
            m = nhi - nlo
        ax, ay = int(x[a]), int(y[a])
        best, best_area = lo, -1
        for j in range(lo, hi):
            area = abs(
                (ax * m - sx) * (int(y[j]) - ay)
                - (ax - int(x[j])) * (sy - ay * m)
            )
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        a = best
    out.append(n - 1)
    return out


@pytest.mark.parametrize(
    "seed,n,n_out", [(0, 500, 50), (1, 1000, 3), (2, 997, 101), (3, 50, 49)]
)
def test_lttb_grid_kernel_matches_bigint_reference(seed, n, n_out):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.integers(0, 10**6, n)).astype(np.int64)
    v = rng.integers(-(10**6), 10**6, n).astype(np.int64)
    got = lttb_grid_kernel(x, v, n_out)
    assert got.tolist() == lttb_grid_reference(x, v, n_out)


def test_lttb_grid_tiebreak_earliest_index():
    # a flat series makes EVERY candidate area 0 — each bucket must keep
    # its earliest index on both engines (the twin's determinism pin)
    x = np.arange(100, dtype=np.int64) * 7
    v = np.full(100, 42, dtype=np.int64)
    got = lttb_grid_kernel(x, v, 12)
    every = (100 - 2) / (12 - 2)
    expect = [0] + [int(np.floor(b * every)) + 1 for b in range(10)] + [99]
    assert got.tolist() == expect


def test_lttb_grid_kernel_overflow_raises():
    x = np.array([0, 2**40, 2**41, 2**42, 2**42 + 1], dtype=np.int64)
    v = np.array([0, 2**40, -(2**40), 2**40, 0], dtype=np.int64)
    with pytest.raises(ValueError, match="magnitude bound"):
        lttb_grid_kernel(x, v, 4)


def test_lttb_grid_spark_matches_local(spark):
    # the applyInPandas wrapper reproduces the kernel run locally on the
    # same (sorted, grid-quantized) series, per key
    rng = np.random.default_rng(13)
    n = 1200
    base = np.datetime64("2024-03-01T00:00:00", "us")
    pdf = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], n // 2),
            "ts": np.tile(
                base
                + np.sort(
                    rng.integers(0, 86400 * 10**6, n // 2)
                ).astype("timedelta64[us]"),
                2,
            ),
            "eid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n) * 250,
        }
    )
    got = (
        downsample_lttb_grid(
            spark.createDataFrame(pdf), keys=["k"], ts_col="ts",
            value_col="v", n_out=32, order_tiebreak="eid",
        )
        .toPandas()
        .sort_values(["k", "sel_i"], kind="mergesort")
        .reset_index(drop=True)
    )
    for k, g in got.groupby("k"):
        loc = (
            pdf[pdf["k"] == k]
            .sort_values(["ts", "eid"], kind="mergesort")
            .reset_index(drop=True)
        )
        tus = loc["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        x = (tus - tus[0]) // 1_000_000
        v = np.floor(loc["v"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        idx = lttb_grid_kernel(x, v, 32)
        assert g["sel_i"].tolist() == idx.tolist()
        assert g["x_s"].tolist() == x[idx].tolist()
        assert g["v_grid"].tolist() == v[idx].tolist()


def test_lttb_endpoints_and_subset(spark):
    rng = np.random.default_rng(11)
    n = 3000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    pdf = pd.DataFrame(
        {
            "k": np.repeat(["a", "b", "c"], n // 3),
            "ts": np.tile(
                base + np.sort(rng.integers(0, 86400 * 10**6, n // 3)).astype("timedelta64[us]"),
                3,
            ),
            "v": rng.normal(size=n),
        }
    ).drop_duplicates(["k", "ts"])
    got = downsample_lttb(
        spark.createDataFrame(pdf), keys=["k"], ts_col="ts", value_col="v", n_out=64
    ).toPandas()
    src = pdf.set_index(["k", "ts"])["v"]
    for k, g in got.groupby("k"):
        gk = pdf[pdf["k"] == k].sort_values("ts")
        assert len(g) == 64
        assert g["ts"].min() == gk["ts"].iloc[0]
        assert g["ts"].max() == gk["ts"].iloc[-1]
        # every selected point is a REAL input point, value bit-exact
        for ts_, v_ in zip(g["ts"], g["v"]):
            assert src.loc[(k, ts_)] == v_
