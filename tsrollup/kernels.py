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

#: chunk width of the EWMA affine scan AND the alignment unit for detector
#: sharding: shard boundaries must sit on multiples of this so a sharded
#: run reproduces the unsharded chunk grid bit-for-bit (detect.py).
SCAN_CHUNK = 64

#: rolling-window chunk: bounds the (chunk, W) temporaries so very long
#: series never materialize an (n, W) matrix. Chunking is exact: every
#: window is computed independently of its neighbors.
_ROLL_CHUNK = 65_536


def rolling_mean_std(
    x: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Trailing-window mean and POPULATION std with min_periods=window
    (NaN before the window fills). Each window is computed locally
    (np.mean / np.mean of squared deviations over that window only), so
    the value at position t depends on x[t-W+1..t] ALONE — the property
    that makes sharded scoring with a W-1 halo byte-exact (a running
    add/subtract implementation would leak summation history across
    shard boundaries)."""
    n = x.shape[0]
    mu = np.full(n, np.nan, dtype=np.float64)
    sigma = np.full(n, np.nan, dtype=np.float64)
    if n < window:
        return mu, sigma
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(np.asarray(x, dtype=np.float64), window)
    m = wins.shape[0]  # = n - window + 1
    for c0 in range(0, m, _ROLL_CHUNK):
        c1 = min(c0 + _ROLL_CHUNK, m)
        w = wins[c0:c1]
        mu_c = w.mean(axis=1)
        var_c = ((w - mu_c[:, None]) ** 2).mean(axis=1)
        mu[window - 1 + c0 : window - 1 + c1] = mu_c
        sigma[window - 1 + c0 : window - 1 + c1] = np.sqrt(var_c)
    return mu, sigma


def zscore_from_stats(
    x: np.ndarray, mu: np.ndarray, sigma: np.ndarray, tau: float
) -> tuple[np.ndarray, np.ndarray]:
    """The pinned z formula given trailing-window stats: z = (x-mu)/sigma
    when sigma > 0 else 0.0; NaN where the window is unfilled. Shared by
    the whole-series path and the sharded path (same code object)."""
    z = np.where(sigma > 0.0, (x - mu) / np.where(sigma > 0.0, sigma, 1.0), 0.0)
    z = np.where(np.isnan(mu), np.nan, z)
    flag = pd.array(np.abs(z) >= tau, dtype="boolean")
    flag[np.isnan(z)] = pd.NA
    return z.astype(np.float64), flag


def rolling_zscore(x: np.ndarray, window: int, tau: float) -> tuple[np.ndarray, np.ndarray]:
    """W1 — trailing-window z-score.

    mu_t = mean(x[t-W+1..t]); sigma_t = std(..., ddof=0) (population);
    z_t = (x_t - mu_t) / sigma_t if sigma_t > 0 else 0.0;
    first W-1 points: z = NaN. is_anomaly = |z| >= tau (NaN -> <NA>).

    Returns (z: float64[n], is_anomaly: pandas nullable-boolean array).
    """
    x = np.asarray(x, dtype=np.float64)
    mu, sigma = rolling_mean_std(x, window)
    return zscore_from_stats(x, mu, sigma, tau)


def _affine_scan(b: np.ndarray, c: float, y_init: float) -> np.ndarray:
    """y_t = c * y_{t-1} + b_t with y_{-1} = y_init, evaluated as a chunked
    scan: within each SCAN_CHUNK, y_j = c^j * (c*y_start + cumsum(b_k c^-k)).
    The chunk grid is anchored at b[0]; callers that shard a series MUST cut
    at multiples of SCAN_CHUNK so the grid (and therefore every float
    rounding) is identical to the unsharded evaluation. Falls back to the
    sequential loop when c is tiny (c^-CHUNK would overflow) — same grid
    irrelevance because the loop is position-independent."""
    n = b.shape[0]
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    if c == 0.0:
        out[:] = b
        return out
    if abs(c) < 0.05:  # c^-64 > 1e83: scan scaling would overflow
        y = y_init
        bl = b.tolist()
        for t in range(n):
            y = c * y + bl[t]
            out[t] = y
        return out
    neg = float(c) ** -np.arange(SCAN_CHUNK, dtype=np.float64)
    pos = float(c) ** np.arange(SCAN_CHUNK, dtype=np.float64)
    # vectorize ACROSS chunks: all within-chunk scaled cumsums at once,
    # then a scalar loop over chunk-end states only (1 mul-add per chunk)
    nc = -(-n // SCAN_CHUNK)
    bp = b if n == nc * SCAN_CHUNK else np.pad(b, (0, nc * SCAN_CHUNK - n))
    S = np.cumsum(bp.reshape(nc, SCAN_CHUNK) * neg, axis=1)
    pos_end = float(pos[SCAN_CHUNK - 1])
    s_end = S[:, SCAN_CHUNK - 1].tolist()
    y0 = np.empty(nc, dtype=np.float64)  # chunk-start carry states
    y = y_init
    for kk in range(nc):
        y0[kk] = y
        y = pos_end * (c * y + s_end[kk])
    out_full = pos * (c * y0[:, None] + S)
    out[:] = out_full.reshape(-1)[:n]
    return out


def ewma_detector(
    x: np.ndarray,
    alpha: float,
    eps: float,
    init: tuple[float, float] | None = None,
    with_state: bool = False,
) -> tuple:
    """W2 — EWMA control chart (vectorized chunked-scan evaluation).

    s_0 = x_0; s_t = alpha*x_t + (1-alpha)*s_{t-1}   (adjust=False)
    r_0 = 0.0; r_t = x_t - s_{t-1}                   (one-step-ahead residual)
    v_0 = 0.0; v_t = (1-alpha) * (v_{t-1} + alpha * r_t^2)
    score_0 = 0.0; score_t = r_t / sqrt(v_{t-1}) if v_{t-1} > eps else 0.0

    Both recurrences are first-order affine (y_t = c*y_{t-1} + b_t) and are
    evaluated with _affine_scan on the fixed SCAN_CHUNK grid — the pinned
    numerics ARE the chunked evaluation (oracle shares this code object).

    `init=(s_prev, v_prev)` continues a series: x[0] is then an ordinary
    step (r_0 = x_0 - s_prev, score_0 from v_prev) and the caller must cut
    shards at multiples of SCAN_CHUNK (see detect.score_tier sharding).

    Returns (s, r, score) — all float64[n].
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    c = 1.0 - alpha
    if n == 0:
        e = np.empty(0, dtype=np.float64)
        if with_state:
            st = init if init is not None else (float("nan"), 0.0)
            return e, e.copy(), e.copy(), st
        return e, e.copy(), e.copy()
    if init is None:
        # s_0 = x_0 exactly, with the scan grid anchored at index 0 (so a
        # sharded continuation on the same 64-grid is bit-identical):
        # y_{-1} = 0 and b_0 = x_0 gives y_0 = c*0 + x_0 = x_0
        b_s = alpha * x
        b_s[0] = x[0]
        s = _affine_scan(b_s, c, 0.0)
        r = np.zeros(n, dtype=np.float64)
        r[1:] = x[1:] - s[:-1]
        v_prev0 = 0.0
    else:
        s_prev, v_prev0 = init
        s = _affine_scan(alpha * x, c, s_prev)
        r = np.empty(n, dtype=np.float64)
        r[0] = x[0] - s_prev
        r[1:] = x[1:] - s[:-1]
    # v_t = c * v_{t-1} + (c*alpha) * r_t^2 ; v_0 = 0 when init is None
    b = (c * alpha) * (r * r)
    if init is None:
        b[0] = 0.0
    v = _affine_scan(b, c, v_prev0)
    v_lag = np.empty(n, dtype=np.float64)
    v_lag[0] = v_prev0
    v_lag[1:] = v[:-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        score = np.where(v_lag > eps, r / np.sqrt(np.where(v_lag > 0, v_lag, 1.0)), 0.0)
    if with_state:
        return s, r, score, (float(s[-1]), float(v[-1]))
    return s, r, score


def hw_detector(
    x: np.ndarray, alpha: float, beta: float, eps: float = 1e-12
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Holt's double exponential smoothing (additive trend) as a
    forecast-based detector — pinned numerics:

    l_0 = x_0; b_0 = 0
    f_t = l_{t-1} + b_{t-1}                       (one-step forecast)
    l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
    r_0 = 0;  r_t = x_t - f_t                     (forecast residual)
    v_0 = 0;  v_t = (1-alpha)*(v_{t-1} + alpha*r_t^2)   (EW residual var,
                                                   same form as ewma_detector)
    score_t = r_t / sqrt(v_{t-1}) if v_{t-1} > eps else 0.0

    Element-sequential loop BY CONTRACT (the coupled (l, b) recurrence is
    a 2x2 affine scan; the chunked-matrix vectorization exists if a
    profile ever demands it, but the loop IS the pinned evaluation —
    Python-float arithmetic == IEEE float64, and the SQL twin's recursive
    CTE evaluates the identical expressions in the identical order).
    Returns (level, trend, resid, score), float64[n].
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    level = np.empty(n, dtype=np.float64)
    trend = np.empty(n, dtype=np.float64)
    resid = np.zeros(n, dtype=np.float64)
    score = np.zeros(n, dtype=np.float64)
    if n == 0:
        return level, trend, resid, score
    from math import sqrt  # correctly-rounded IEEE sqrt == SQL sqrt()

    xl = x.tolist()
    l_prev = xl[0]
    b_prev = 0.0
    v_prev = 0.0
    level[0] = l_prev
    trend[0] = 0.0
    for t in range(1, n):
        f = l_prev + b_prev
        r = xl[t] - f
        score[t] = r / sqrt(v_prev) if v_prev > eps else 0.0
        l_t = alpha * xl[t] + (1.0 - alpha) * f
        b_t = beta * (l_t - l_prev) + (1.0 - beta) * b_prev
        # alpha * (r*r), parenthesized to match the SQL twin's association
        v_prev = (1.0 - alpha) * (v_prev + alpha * (r * r))
        level[t] = l_t
        trend[t] = b_t
        resid[t] = r
        l_prev, b_prev = l_t, b_t
    return level, trend, resid, score


def welford_fold(
    values: np.ndarray, n: int = 0, mean: float = 0.0, m2: float = 0.0
) -> tuple[int, float, float]:
    """Fold the FINITE entries of `values`, in order, into Welford state
    (n, mean, M2). Element-sequential BY CONTRACT — never a chunked merge:
    the streaming variant folds per micro-batch with arbitrary batch
    boundaries, and only a left fold makes batch and streaming finals
    bit-identical. Python-float arithmetic == IEEE float64 (same bits);
    the to-list conversion just removes per-element numpy overhead."""
    finite = np.asarray(values, dtype=np.float64)
    finite = finite[np.isfinite(finite)]
    for val in finite.tolist():
        n += 1
        delta = val - mean
        mean += delta / n
        m2 += delta * (val - mean)
    return n, mean, m2


def welford(values: np.ndarray) -> tuple[int, float, float]:
    """W3 — streaming residual statistics: sequential Welford over the
    finite entries of `values`, in order. Returns (n, mean, var_pop) with
    var_pop = M2/n (population). n == 0 -> (0, nan, nan).
    """
    n, mean, m2 = welford_fold(values)
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


def spectral_residual(
    x: np.ndarray,
    q: int = 3,
    z: int = 21,
    eps: float = 1e-8,
) -> tuple[np.ndarray, np.ndarray]:
    """Spectral Residual saliency detector (Ren et al., "Time-Series
    Anomaly Detection Service at Microsoft", KDD 2019 §3.1 — public):

    f  = FFT(x);  A = |f|;  P = f / max(A, eps)        (phase)
    L  = log(A + eps)
    AL = moving average of L over q (centered, edge-padded)
    S  = |IFFT(exp(L - AL) * P)|                        (saliency map)
    score_t = (S_t - M_t) / max(M_t, eps),  M = moving average of S
              over z (centered, edge-padded)

    Frequency-domain novelty: a spike or step contributes energy across
    the spectrum, so its log-amplitude sticks out from the local
    spectral average and the saliency map lights up AT the event —
    windowless in the time domain (no warmup region) and complementary
    to the forecasting detectors (z-score/EWMA/Holt) whose residuals
    smear over the window after the event.

    Returns (saliency, score) float64[n]. Parity: pinned against an
    independent O(n^2) explicit-DFT reference in tests (different FFT
    algorithm => agreement to ~1e-8 relative, asserted there)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        e = np.empty(0, dtype=np.float64)
        return e, e.copy()

    def _avg(v: np.ndarray, w: int) -> np.ndarray:
        w = max(1, min(w, v.shape[0]))
        pad = np.pad(v, (w // 2, w - 1 - w // 2), mode="edge")
        return np.convolve(pad, np.full(w, 1.0 / w), mode="valid")

    f = np.fft.fft(x)
    amp = np.abs(f)
    phase = f / np.maximum(amp, eps)
    logamp = np.log(amp + eps)
    resid = logamp - _avg(logamp, q)
    sal = np.abs(np.fft.ifft(np.exp(resid) * phase))
    m = _avg(sal, z)
    score = (sal - m) / np.maximum(m, eps)
    return sal, score


def _window_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Mean and population std of every length-m sliding window of x,
    computed from the windows themselves (stable; no cumsum cancellation)."""
    sw = np.lib.stride_tricks.sliding_window_view(x, m)
    return sw.mean(axis=1), sw.std(axis=1)


def cross_matrix_profile(
    a: np.ndarray,
    b: np.ndarray,
    m: int,
    ia: int = 0,
    ib: int = 0,
    excl: int = 0,
    eps: float = 1e-13,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """AB-join matrix profile partial (STOMP recurrence — Zhu et al.
    ICDM 2016, public): for every length-m window of `a`, the minimum
    z-normalized Euclidean distance to any window of `b` (and the
    symmetric b-vs-a side), excluding trivial matches whose GLOBAL
    window indices (ia+i vs ib+j) are within `excl` of each other.

    The self-join profile is the special case a is b, ia == ib,
    excl = m//4 (the standard trivial-match exclusion zone).

    Dot products walk the STOMP diagonal recurrence QT[i,j] =
    QT[i-1,j-1] + a[i+m-1]·b[j+m-1] − a[i-1]·b[j-1], one O(nb) vector
    row at a time (O(na·nb) time, O(nb) memory — no QT matrix), with
    first row/column seeded by np.correlate. Distances come from the
    closed form d² = 2m(1 − (QT − m·µa·µb)/(m·σa·σb)), clipped at 0.
    Constant-window convention (stumpy's documented one): both windows
    constant → d = 0; exactly one constant → d = √m.

    Returns (mpa, mpia, mpb, mpib): per-a-window min distance and the
    GLOBAL index of its nearest b-window, and vice versa. Windows with
    every candidate excluded get d = +inf and idx = -1.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = a.shape[0] - m + 1, b.shape[0] - m + 1
    if na <= 0 or nb <= 0:
        e = np.empty(0, dtype=np.float64)
        ei = np.empty(0, dtype=np.int64)
        return (
            (np.full(max(na, 0), np.inf), np.full(max(na, 0), -1, np.int64),
             np.full(max(nb, 0), np.inf), np.full(max(nb, 0), -1, np.int64))
            if (na > 0 or nb > 0) else (e, ei, e.copy(), ei.copy())
        )
    mua, sa = _window_stats(a, m)
    mub, sb = _window_stats(b, m)
    consta, constb = sa < eps, sb < eps

    row = np.correlate(b, a[:m], mode="valid").astype(np.float64)  # QT[0, :]
    col0 = np.correlate(a, b[:m], mode="valid").astype(np.float64)  # QT[:, 0]
    jb = ib + np.arange(nb, dtype=np.int64)

    mpa = np.full(na, np.inf)
    mpia = np.full(na, -1, dtype=np.int64)
    mpb = np.full(nb, np.inf)
    mpib = np.full(nb, -1, dtype=np.int64)

    fm = float(m)
    sqm = np.sqrt(fm)
    for i in range(na):
        if i > 0:
            row[1:] = row[:-1] + a[i + m - 1] * b[m:] - a[i - 1] * b[: nb - 1]
            row[0] = col0[i]
        if consta[i]:
            d = np.where(constb, 0.0, sqm)
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                corr = (row - fm * mua[i] * mub) / (fm * sa[i] * sb)
            d = np.sqrt(np.clip(2.0 * fm * (1.0 - corr), 0.0, None))
            d = np.where(constb, sqm, d)
        if excl >= 0:
            d = np.where(np.abs((ia + i) - jb) <= excl, np.inf, d)
        j = int(np.argmin(d))
        if d[j] < mpa[i]:
            mpa[i], mpia[i] = d[j], jb[j]
        upd = d < mpb
        mpb[upd] = d[upd]
        mpib[upd] = ia + i
    return mpa, mpia, mpb, mpib


def matrix_profile(
    x: np.ndarray, m: int, excl: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile of x at window m: per window, the
    z-normalized distance to its nearest NON-TRIVIAL neighbor and that
    neighbor's index (exclusion zone `excl` defaults to max(1, m//4),
    the STOMP-paper convention). High profile values are DISCORDS — the
    subsequences least like anything else in the series — the anomaly
    reading; low values are motifs. Returns (mp, mp_idx) of length
    n-m+1 (inf/-1 when nothing admissible)."""
    if excl is None:
        excl = max(1, m // 4)
    mpa, mpia, _, _ = cross_matrix_profile(x, x, m, 0, 0, excl)
    return mpa, mpia


def dtw_l1_batch(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Exact-integer DTW (L1 cell cost, full grid, no band) over a BATCH
    of series pairs: X (P, n) vs Y (P, m) int64 -> (P,) int64 distances.

    The DP runs n*m sequential steps, each VECTORIZED across the whole
    batch — Arrow hands a pandas UDF thousands of pairs at once, so the
    per-pair Python overhead is n*m/P, not n*m (the same SIMT batching
    discipline as the codec kernels). Costs are integers throughout, so
    the result is bit-twinnable against the recursive-CTE DP the oracle
    runs (driver_queries.w20_dtw).

    INF is a barrier only: every interior cell is reachable on the full
    grid, so INF never flows into a sum past the first row/column and
    values stay far below int64 range for realistic counts.
    """
    X = np.asarray(X, dtype=np.int64)
    Y = np.asarray(Y, dtype=np.int64)
    if X.ndim != 2 or Y.ndim != 2 or X.shape[0] != Y.shape[0]:
        raise ValueError(f"batch shapes {X.shape} vs {Y.shape}")
    P, n = X.shape
    m = Y.shape[1]
    INF = np.int64(1) << 60
    D = np.full((P, m + 1), INF, dtype=np.int64)
    D[:, 0] = 0  # D[0][0]; row 0 cells j>0 stay INF
    for i in range(1, n + 1):
        base = np.abs(X[:, i - 1][:, None] - Y)  # (P, m) cell costs
        new = np.empty((P, m + 1), dtype=np.int64)
        new[:, 0] = INF
        for j in range(1, m + 1):
            new[:, j] = base[:, j - 1] + np.minimum(
                np.minimum(D[:, j], D[:, j - 1]), new[:, j - 1]
            )
        D = new
    return D[:, m]


def kalman_level(
    x: np.ndarray, q: float, r: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Local-level (random-walk + noise) Kalman filter, PINNED loop.

    Recurrences (scalar float64, this exact op order — the recursive-CTE
    oracle twin evaluates the identical expressions):

        x̂_1 = x_1 ; P_1 = r
        P⁻  = P + q
        K   = P⁻ / (P⁻ + r)
        ν   = x_t − x̂          (innovation)
        x̂  = x̂ + K · ν
        P   = (1 − K) · P⁻
        score_t = ν / sqrt(P⁻ + r)   (standardized innovation; 0 at t=1)

    Unlike EWMA's fixed α, the gain K_t starts high (uncertain level,
    track fast) and converges to the steady-state Riccati gain — the
    principled warm-up the ad-hoc detectors approximate. Returns
    (estimate, innovation, score) arrays.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    est = np.empty(n)
    innov = np.zeros(n)
    score = np.zeros(n)
    if n == 0:
        return est, innov, score
    xh = float(x[0])
    p = float(r)
    est[0] = xh
    for t in range(1, n):
        p_pred = p + q
        k = p_pred / (p_pred + r)
        nu = float(x[t]) - xh
        xh = xh + k * nu
        p = (1.0 - k) * p_pred
        est[t] = xh
        innov[t] = nu
        score[t] = nu / np.sqrt(p_pred + r)
    return est, innov, score


def burst_states(
    x: np.ndarray, lam0_u: int, lam1_u: int, gamma_u: int, scale: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Two-state burst detection as an EXACT-INTEGER min-cost path
    (Kleinberg's 2-state automaton with L1 emission costs instead of
    -log-likelihoods, so the whole DP is integer and hash-twinnable).

    All rates are in SCALED units (default x4, so a median of integers
    — possibly k+0.5 — and its 1.5x multiple both stay integral). Per
    step t with count n_t:

        emit_s(t) = |scale·n_t − λs_u|
        fwd_s(t)  = emit_s(t) + min(fwd_s(t−1), fwd_{1−s}(t−1) + γ_u)
        bwd symmetric (emission charged at the step itself)

    A bucket is in the burst state iff
    fwd₁+bwd₁−emit₁ < fwd₀+bwd₀−emit₀ at that index (the emission is
    double-counted by fwd+bwd; ties resolve to the base state) — the
    standard optimal-path membership test, deterministic because every
    quantity is an integer. Returns (fwd0/fwd1 arrays unused externally)
    -> (state array int8, fwd_total0, fwd_total1, total_min)."""
    xs = int(scale) * np.asarray(x, dtype=np.int64)
    n = len(xs)
    e0 = np.abs(xs - lam0_u)
    e1 = np.abs(xs - lam1_u)
    f0 = np.empty(n, dtype=np.int64)
    f1 = np.empty(n, dtype=np.int64)
    b0 = np.empty(n, dtype=np.int64)
    b1 = np.empty(n, dtype=np.int64)
    if n == 0:
        return np.empty(0, dtype=np.int8), f0, f1, 0
    f0[0], f1[0] = e0[0], e1[0] + gamma_u  # paths start in state 0
    for t in range(1, n):
        f0[t] = e0[t] + min(f0[t - 1], f1[t - 1] + gamma_u)
        f1[t] = e1[t] + min(f1[t - 1], f0[t - 1] + gamma_u)
    b0[n - 1], b1[n - 1] = e0[n - 1], e1[n - 1]
    for t in range(n - 2, -1, -1):
        b0[t] = e0[t] + min(b0[t + 1], b1[t + 1] + gamma_u)
        b1[t] = e1[t] + min(b1[t + 1], b0[t + 1] + gamma_u)
    tot0 = f0 + b0 - e0
    tot1 = f1 + b1 - e1
    state = (tot1 < tot0).astype(np.int8)
    return state, f0, f1, int(min(f0[n - 1], f1[n - 1]))


def page_hinkley(
    x: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Page-Hinkley drift statistic (Page 1954, the sequential form the
    streaming-drift literature uses), PINNED float64 loop.

    Recurrences (this exact op order — the recursive-CTE oracle twin
    evaluates the identical expressions):

        s_t   = s_{t-1} + x_t            (running sum; mean_t = s_t / t)
        cum_t = cum_{t-1} + (x_t - mean_t - delta)
        mn_t  = min(mn_{t-1}, cum_t)     (mn_0 = +inf)
        ph_t  = cum_t - mn_t             (>= 0; 0 until an upward drift)

    delta is the magnitude tolerance: shifts smaller than delta never
    accumulate. Complements CUSUM (c6, closed form, known baseline) —
    PH self-estimates the baseline as the running mean, so it needs no
    in-control segment. Returns (mean, ph) arrays.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    mean = np.empty(n)
    ph = np.empty(n)
    s = 0.0
    cum = 0.0
    mn = np.inf
    for t in range(n):
        s = s + float(x[t])
        m = s / float(t + 1)
        cum = cum + (float(x[t]) - m - delta)
        mn = min(mn, cum)
        mean[t] = m
        ph[t] = cum - mn
    return mean, ph
