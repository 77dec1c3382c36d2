"""Anomaly detectors as partition-parallel grouped-map transforms
(SURVEY.md §2.4, operators W1–W3).

Each (source) group's whole per-tier series is scored inside ONE pandas
kernel invocation, in bucket order — the pinned recurrences in
tsrollup.kernels are inherently sequential (EWMA/Welford), and running
them per-group in a defined sort order is what makes output independent
of parallelism level.

Partitioning note (measured, see git history): grouped-map requires hash
clustering on the group key and inserts its own Exchange; a
repartitionByRange in front of it does NOT satisfy that requirement and
just doubles the shuffles. The gap-fill window has already hash-partitioned
the frame by source, so the grouped-map here reuses that layout where
Catalyst allows and otherwise performs the one required shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernels, schemas
from .config import DetectorConfig, RollupConfig


def _score_kernel(cfg: DetectorConfig, tier: str):
    """Build the per-source grouped-map function. cfg/tier are plain
    picklable values captured in the closure — no Spark objects."""
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        src = pdf["source"]
        bucket = pdf["bucket_start"]

        z, z_flag = kernels.rolling_zscore(x, window, tau)
        _s, _r, e_score = kernels.ewma_detector(x, alpha, eps)
        e_flag = pd.array(np.abs(e_score) >= tau, dtype="boolean")

        out_z = pd.DataFrame(
            {
                "source": src, "bucket_start": bucket, "tier": tier,
                "detector": "zscore", "value": x, "score": z, "is_anomaly": z_flag,
            }
        )
        out_e = pd.DataFrame(
            {
                "source": src, "bucket_start": bucket, "tier": tier,
                "detector": "ewma", "value": x, "score": e_score, "is_anomaly": e_flag,
            }
        )
        return pd.concat([out_z, out_e], ignore_index=True)

    return score_group


def score_tier(
    filled: DataFrame, tier: str, cfg: RollupConfig | None = None
) -> DataFrame:
    """W1+W2 — z-score and EWMA scores for one gap-filled tier."""
    cfg = cfg or RollupConfig()
    det = cfg.detector
    slim = filled.select("source", "bucket_start", det.value_col)
    return slim.groupBy("source").applyInPandas(
        _score_kernel(det, tier), schema=schemas.SCORE_SCHEMA
    )


def _residual_kernel(cfg: DetectorConfig, tier: str):
    window, alpha, eps, value_col = cfg.window, cfg.alpha, cfg.eps, cfg.value_col

    def residual_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        src = pdf["source"].iloc[0]

        mu = pd.Series(x).rolling(window, min_periods=window).mean().to_numpy()
        z_resid = x - mu  # NaN in warmup -> skipped by welford
        _s, e_resid, _score = kernels.ewma_detector(x, alpha, eps)

        rows = []
        for det, resid in (("zscore", z_resid), ("ewma", e_resid)):
            n, mean, var_pop = kernels.welford(resid)
            rows.append((src, tier, det, n, mean, var_pop))
        return pd.DataFrame(
            rows, columns=["source", "tier", "detector", "n", "mean", "var_pop"]
        )

    return residual_group


def residual_stats(
    filled: DataFrame, tier: str, cfg: RollupConfig | None = None
) -> DataFrame:
    """W3 — per-(source, tier, detector) Welford finals over residuals."""
    cfg = cfg or RollupConfig()
    det = cfg.detector
    slim = filled.select("source", "bucket_start", det.value_col)
    return slim.groupBy("source").applyInPandas(
        _residual_kernel(det, tier), schema=schemas.RESIDUAL_STATS_SCHEMA
    )
