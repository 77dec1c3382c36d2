"""Pinned NumPy/pandas detector kernels (SURVEY.md §2.4).

PARITY CONTRACT: these exact code objects are executed by BOTH the Spark
`applyInPandas` wrappers (tsrollup.detect) and the single-node oracle
(tsrollup.reference_impl). Byte-parity between the distributed engine and
the oracle is therefore structural, not incidental — change a formula here
and both sides move together.

All recurrences consume a WHOLE per-(source, tier) series in bucket order
inside one pandas group, so results are independent of executor count —
the property the N-vs-4N scaling-parity check relies on. Never re-express
these as tree aggregations (float addition is non-associative).

Everything is float64. Warmup regions are NaN scores with null anomaly
flags; "no signal yet" scores are exactly 0.0 by definition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rolling_zscore(x: np.ndarray, window: int, tau: float) -> tuple[np.ndarray, np.ndarray]:
    """W1 — trailing-window z-score.

    mu_t = mean(x[t-W+1..t]); sigma_t = std(..., ddof=0) (population);
    z_t = (x_t - mu_t) / sigma_t if sigma_t > 0 else 0.0;
    first W-1 points: z = NaN. is_anomaly = |z| >= tau (NaN -> <NA>).

    Returns (z: float64[n], is_anomaly: pandas nullable-boolean array).
    """
    s = pd.Series(x, dtype="float64")
    roll = s.rolling(window, min_periods=window)
    mu = roll.mean().to_numpy()
    sigma = roll.std(ddof=0).to_numpy()
    z = np.where(sigma > 0.0, (x - mu) / np.where(sigma > 0.0, sigma, 1.0), 0.0)
    z = np.where(np.isnan(mu), np.nan, z)
    flag = pd.array(np.abs(z) >= tau, dtype="boolean")
    flag[np.isnan(z)] = pd.NA
    return z.astype(np.float64), flag


def ewma_detector(
    x: np.ndarray, alpha: float, eps: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """W2 — EWMA control chart.

    s_0 = x_0; s_t = alpha*x_t + (1-alpha)*s_{t-1}   (pandas adjust=False)
    r_0 = 0.0; r_t = x_t - s_{t-1}                   (one-step-ahead residual)
    v_0 = 0.0; v_t = (1-alpha) * (v_{t-1} + alpha * r_t^2)
    score_0 = 0.0; score_t = r_t / sqrt(v_{t-1}) if v_{t-1} > eps else 0.0

    Returns (s, r, score) — all float64[n].
    """
    n = x.shape[0]
    s = pd.Series(x, dtype="float64").ewm(alpha=alpha, adjust=False).mean().to_numpy()
    r = np.zeros(n, dtype=np.float64)
    if n > 1:
        r[1:] = x[1:] - s[:-1]
    v = np.zeros(n, dtype=np.float64)
    score = np.zeros(n, dtype=np.float64)
    one_m_a = 1.0 - alpha
    v_prev = 0.0
    for t in range(1, n):
        rt = r[t]
        if v_prev > eps:
            score[t] = rt / np.sqrt(v_prev)
        v_prev = one_m_a * (v_prev + alpha * rt * rt)
        v[t] = v_prev
    return s, r, score


def welford(values: np.ndarray) -> tuple[int, float, float]:
    """W3 — streaming residual statistics: sequential Welford over the
    finite entries of `values`, in order. Returns (n, mean, var_pop) with
    var_pop = M2/n (population). n == 0 -> (0, nan, nan).

    Sequential by design: this is the same update order the streaming
    variant applies per micro-batch, so batch and streaming finals match.
    """
    n = 0
    mean = 0.0
    m2 = 0.0
    for val in values:
        if not np.isfinite(val):
            continue
        n += 1
        delta = val - mean
        mean += delta / n
        m2 += delta * (val - mean)
    if n == 0:
        return 0, float("nan"), float("nan")
    return n, mean, m2 / n


def welford_merge(
    n_a: int, mean_a: float, m2_a: float, n_b: int, mean_b: float, m2_b: float
) -> tuple[int, float, float]:
    """Chan's pairwise merge — kept for completeness; the engine avoids
    needing it by keeping each source's stream in one state partition
    (determinism beats generality, SURVEY.md §2.4). Returns (n, mean, M2)."""
    n = n_a + n_b
    if n == 0:
        return 0, 0.0, 0.0
    delta = mean_b - mean_a
    mean = mean_a + delta * (n_b / n)
    m2 = m2_a + m2_b + delta * delta * (n_a * n_b / n)
    return n, mean, m2


def linear_fill(values: np.ndarray, observed: np.ndarray) -> np.ndarray:
    """G2 'linear' — fill gap positions by linear interpolation between the
    surrounding observed points (pandas `interpolate(method='linear')`,
    pinned float64). Positions before the first observation keep NaN;
    trailing gaps extend the last observation (limit_direction='forward'
    then back-fill is NOT applied — trailing rows get LOCF semantics via
    ffill, matching the LOCF path for suffixes).

    `observed` is a boolean mask; non-observed entries of `values` are
    ignored regardless of content.
    """
    s = pd.Series(np.where(observed, values, np.nan), dtype="float64")
    out = s.interpolate(method="linear", limit_area="inside")
    out = out.ffill()
    return out.to_numpy(dtype=np.float64)


def locf_fill(values: np.ndarray, observed: np.ndarray) -> np.ndarray:
    """G2 'locf' — last observation carried forward (exact copy, no
    arithmetic). The Spark path expresses this as
    `last(col, ignorenulls=True) over (partition by source order by bucket)`;
    this twin exists for the oracle."""
    s = pd.Series(np.where(observed, values, np.nan), dtype="float64")
    return s.ffill().to_numpy(dtype=np.float64)
