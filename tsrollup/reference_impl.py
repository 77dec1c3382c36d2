"""Single-node pandas/NumPy oracle (SURVEY.md §0 item 2, §5).

The reference tree is empty, so the parity target is THIS implementation:
a deterministic, single-threaded twin of the distributed pipeline that
shares the pinned kernel code objects (tsrollup.kernels). The Spark engine
must byte-match the oracle at every tier and at every parallelism level.

Exactness argument: all stored aggregates are int64 (associative), means
are derived by one float division, detector floats come from the shared
kernels run over identically-ordered series — so equality is bit-level,
not approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import kernels
from .config import CASCADE_FROM, RollupConfig

_PD_FREQ = {"1m": "min", "1h": "h", "1d": "D"}

ROLLUP_COLS = [
    "source", "bucket_start", "tier",
    "cnt", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean",
    "tok_sum", "tok_cnt", "tok_min", "tok_max", "tok_mean",
    "gap_filled",
]


def _floor(ts: pd.Series, tier: str) -> pd.Series:
    return ts.dt.floor(_PD_FREQ[tier])


def rollup_from_raw(seq: pd.DataFrame, tier: str) -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "source": seq["source"],
            "bucket_start": _floor(seq["event_ts"], tier),
            "n_tok_l": seq["n_tok"].astype(np.int64),
            "n_tok_i": seq["n_tok"].astype(np.int32),
            "row_tok_sum": [int(np.asarray(t, dtype=np.int64).sum()) for t in seq["tokens"]],
            "row_tok_cnt": [len(t) for t in seq["tokens"]],
            "row_tok_min": [int(np.asarray(t).min()) for t in seq["tokens"]],
            "row_tok_max": [int(np.asarray(t).max()) for t in seq["tokens"]],
        }
    )
    g = df.groupby(["source", "bucket_start"], sort=True)
    out = g.agg(
        cnt=("n_tok_l", "size"),
        n_tok_sum=("n_tok_l", "sum"),
        n_tok_min=("n_tok_i", "min"),
        n_tok_max=("n_tok_i", "max"),
        tok_sum=("row_tok_sum", "sum"),
        tok_cnt=("row_tok_cnt", "sum"),
        tok_min=("row_tok_min", "min"),
        tok_max=("row_tok_max", "max"),
    ).reset_index()
    return _finalize(out, tier)


def _finalize(out: pd.DataFrame, tier: str) -> pd.DataFrame:
    out["tier"] = tier
    out["cnt"] = out["cnt"].astype(np.int64)
    out["n_tok_mean"] = out["n_tok_sum"].astype(np.float64) / out["cnt"].astype(np.float64)
    out["tok_mean"] = out["tok_sum"].astype(np.float64) / out["tok_cnt"].astype(np.float64)
    out["n_tok_min"] = out["n_tok_min"].astype(np.int32)
    out["n_tok_max"] = out["n_tok_max"].astype(np.int32)
    out["tok_min"] = out["tok_min"].astype(np.int32)
    out["tok_max"] = out["tok_max"].astype(np.int32)
    out["gap_filled"] = False
    return out[ROLLUP_COLS]


def cascade(finer: pd.DataFrame, to_tier: str) -> pd.DataFrame:
    df = finer[~finer["gap_filled"]].copy()
    df["bucket_start"] = _floor(df["bucket_start"], to_tier)
    g = df.groupby(["source", "bucket_start"], sort=True)
    out = g.agg(
        cnt=("cnt", "sum"),
        n_tok_sum=("n_tok_sum", "sum"),
        n_tok_min=("n_tok_min", "min"),
        n_tok_max=("n_tok_max", "max"),
        tok_sum=("tok_sum", "sum"),
        tok_cnt=("tok_cnt", "sum"),
        tok_min=("tok_min", "min"),
        tok_max=("tok_max", "max"),
    ).reset_index()
    return _finalize(out, to_tier)


def gapfill(rollup: pd.DataFrame, tier: str, method: str = "locf") -> pd.DataFrame:
    freq = _PD_FREQ[tier]
    pieces = []
    for src, grp in rollup.groupby("source", sort=True):
        grp = grp.sort_values("bucket_start", kind="mergesort")
        spine = pd.date_range(grp["bucket_start"].iloc[0], grp["bucket_start"].iloc[-1], freq=freq)
        filled = grp.set_index("bucket_start").reindex(spine)
        filled.index.name = "bucket_start"
        filled = filled.reset_index()
        gap = filled["cnt"].isna()
        filled["source"] = src
        filled["tier"] = tier
        filled["cnt"] = filled["cnt"].fillna(0).astype(np.int64)
        filled["gap_filled"] = np.where(gap, True, False)
        observed = ~gap.to_numpy()
        fill = kernels.locf_fill if method == "locf" else kernels.linear_fill
        for c in ("n_tok_mean", "tok_mean"):
            filled[c] = fill(filled[c].to_numpy(dtype="float64"), observed)
        pieces.append(filled[ROLLUP_COLS])
    return pd.concat(pieces, ignore_index=True)


def score_tier(filled: pd.DataFrame, tier: str, cfg: RollupConfig | None = None) -> pd.DataFrame:
    cfg = cfg or RollupConfig()
    det = cfg.detector
    pieces = []
    for src, grp in filled.groupby("source", sort=True):
        grp = grp.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = grp[det.value_col].to_numpy(dtype="float64")
        z, z_flag = kernels.rolling_zscore(x, det.window, det.tau)
        _s, _r, e_score = kernels.ewma_detector(x, det.alpha, det.eps)
        e_flag = pd.array(np.abs(e_score) >= det.tau, dtype="boolean")
        for name, score, flag in (("zscore", z, z_flag), ("ewma", e_score, e_flag)):
            pieces.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "bucket_start": grp["bucket_start"],
                        "tier": tier,
                        "detector": name,
                        "value": x,
                        "score": score,
                        "is_anomaly": flag,
                    }
                )
            )
    return pd.concat(pieces, ignore_index=True)


def residual_stats(filled: pd.DataFrame, tier: str, cfg: RollupConfig | None = None) -> pd.DataFrame:
    cfg = cfg or RollupConfig()
    det = cfg.detector
    rows = []
    for src, grp in filled.groupby("source", sort=True):
        grp = grp.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = grp[det.value_col].to_numpy(dtype="float64")
        mu, _sigma = kernels.rolling_mean_std(x, det.window)
        _s, e_resid, _sc = kernels.ewma_detector(x, det.alpha, det.eps)
        for name, resid in (("zscore", x - mu), ("ewma", e_resid)):
            n, mean, var_pop = kernels.welford(resid)
            rows.append((src, tier, name, n, mean, var_pop))
    return pd.DataFrame(rows, columns=["source", "tier", "detector", "n", "mean", "var_pop"])


def full_pipeline(seq: pd.DataFrame, cfg: RollupConfig | None = None):
    """raw → tiers → gapfill → scores. Returns (tiers, filled, scores) dicts
    keyed by tier — the oracle for the end-to-end parity test (§5.3)."""
    cfg = cfg or RollupConfig()
    tiers: dict[str, pd.DataFrame] = {}
    for tier in cfg.tiers:
        src = CASCADE_FROM[tier]
        tiers[tier] = rollup_from_raw(seq, tier) if src is None else cascade(tiers[src], tier)
    filled = {t: gapfill(tiers[t], t, cfg.gapfill_method) for t in cfg.tiers}
    scores = {t: score_tier(filled[t], t, cfg) for t in cfg.tiers}
    return tiers, filled, scores
