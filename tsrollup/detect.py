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

        mu, _sigma = kernels.rolling_mean_std(x, window)
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


# ------------------------------------------------------------- sharding
#
# SURVEY.md §2.6: for very long series (1m tier over 100x horizons) one
# source's whole history in a single pandas task is a straggler and a
# memory ceiling. The sharded path cuts each source's gap-filled spine
# into fixed-length index ranges and scores them in order, carrying
# exactly the state each kernel needs:
#   z-score      the last W-1 values (windows are locally determined —
#                kernels.rolling_mean_std — so a W-1 halo is sufficient)
#   EWMA         (s, v) at the shard boundary; shard length is a multiple
#                of kernels.SCAN_CHUNK so the chunked-scan grid — and
#                therefore every float rounding — matches the unsharded
#                evaluation bit-for-bit
#   Welford      the (n, mean, M2) triples (a left fold carries exactly)
# Within a shard all sources score in parallel; the driver loop is over
# shard INDEXES only (a handful of sequential Spark jobs). Output is
# byte-identical to the unsharded path (tests/test_sharding.py).

_STATE_ROW = "__state__"

_SHARD_SCHEMA = (
    "source string, bucket_start timestamp, tier string, detector string, "
    "value double, score double, is_anomaly boolean, state string"
)


def _pack_state(tail: np.ndarray, s: float, v: float, welf: tuple) -> str:
    import base64

    head = np.array([s, v, *[float(w) for w in welf]], dtype=np.float64)
    return base64.b64encode(
        head.tobytes() + np.asarray(tail, dtype=np.float64).tobytes()
    ).decode("ascii")


def _unpack_state(blob: str) -> tuple[np.ndarray, float, float, tuple]:
    import base64

    arr = np.frombuffer(base64.b64decode(blob), dtype=np.float64)
    s, v = float(arr[0]), float(arr[1])
    welf = (int(arr[2]), float(arr[3]), float(arr[4]),
            int(arr[5]), float(arr[6]), float(arr[7]))
    return arr[8:].copy(), s, v, welf


def _sharded_kernel(cfg: DetectorConfig, tier: str, states: dict[str, str]):
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        src = pdf["source"].iloc[0]
        packed = states.get(src)
        if packed is None:
            tail = np.empty(0, dtype=np.float64)
            init = None
            nz_, mz, m2z, ne_, me, m2e = 0, 0.0, 0.0, 0, 0.0, 0.0
        else:
            tail, s_prev, v_prev, (nz_, mz, m2z, ne_, me, m2e) = _unpack_state(packed)
            init = (s_prev, v_prev)

        xx = np.concatenate((tail, x))
        mu, sigma = kernels.rolling_mean_std(xx, window)
        z, z_flag = kernels.zscore_from_stats(xx, mu, sigma, tau)
        off = tail.shape[0]
        z, z_flag, mu_s = z[off:], z_flag[off:], mu[off:]
        s_arr, r, e_score, (s_end, v_end) = kernels.ewma_detector(
            x, alpha, eps, init=init, with_state=True
        )
        e_flag = pd.array(np.abs(e_score) >= tau, dtype="boolean")

        nz_, mz, m2z = kernels.welford_fold(x - mu_s, nz_, mz, m2z)
        ne_, me, m2e = kernels.welford_fold(r, ne_, me, m2e)
        new_tail = xx[max(0, xx.shape[0] - (window - 1)):] if window > 1 else xx[:0]
        state = _pack_state(new_tail, s_end, v_end, (nz_, mz, m2z, ne_, me, m2e))

        bucket = pdf["bucket_start"]
        out_z = pd.DataFrame(
            {
                "source": pdf["source"], "bucket_start": bucket, "tier": tier,
                "detector": "zscore", "value": x, "score": z,
                "is_anomaly": z_flag, "state": None,
            }
        )
        out_e = pd.DataFrame(
            {
                "source": pdf["source"], "bucket_start": bucket, "tier": tier,
                "detector": "ewma", "value": x, "score": e_score,
                "is_anomaly": e_flag, "state": None,
            }
        )
        st_row = pd.DataFrame(
            {
                "source": [src], "bucket_start": [bucket.iloc[-1]], "tier": tier,
                "detector": [_STATE_ROW], "value": [np.nan], "score": [np.nan],
                "is_anomaly": [None], "state": [state],
            }
        )
        return pd.concat([out_z, out_e, st_row], ignore_index=True)

    return run


def score_tier_sharded(
    filled: DataFrame, tier: str, cfg: RollupConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """W1–W3 sharded: returns (scores, residual_stats), each byte-identical
    to the unsharded score_tier / residual_stats output."""
    from .config import TIER_US

    cfg = cfg or RollupConfig()
    det = cfg.detector
    shard = det.shard_buckets
    if not shard:
        raise ValueError("cfg.detector.shard_buckets must be set for sharding")
    if shard % kernels.SCAN_CHUNK:
        raise ValueError(
            f"shard_buckets must be a multiple of kernels.SCAN_CHUNK "
            f"({kernels.SCAN_CHUNK}) for bit-exact EWMA scan alignment"
        )
    spark = filled.sparkSession
    tier_s = TIER_US[tier] // 1_000_000
    slim = filled.select("source", "bucket_start", det.value_col)
    bounds = slim.groupBy("source").agg(F.min("bucket_start").alias("_b0"))
    with_idx = (
        slim.join(F.broadcast(bounds), "source")
        .withColumn(
            "_idx",
            ((F.col("bucket_start").cast("long") - F.col("_b0").cast("long"))
             / F.lit(tier_s)).cast("long"),
        )
        .withColumn("_shard", (F.col("_idx") / F.lit(shard)).cast("long"))
        .drop("_b0", "_idx")
    )
    n_shards = with_idx.agg(F.max("_shard")).collect()[0][0]
    if n_shards is None:
        empty_scores = spark.createDataFrame([], schemas.SCORE_SCHEMA)
        empty_stats = spark.createDataFrame([], schemas.RESIDUAL_STATS_SCHEMA)
        return empty_scores, empty_stats
    states: dict[str, str] = {}
    parts = []
    for sid in range(int(n_shards) + 1):
        part = with_idx.where(F.col("_shard") == sid).drop("_shard")
        res = (
            part.groupBy("source")
            .applyInPandas(_sharded_kernel(det, tier, dict(states)), schema=_SHARD_SCHEMA)
            .localCheckpoint()  # materialize: state rows + final union reuse it
        )
        for row in res.where(F.col("detector") == _STATE_ROW).select("source", "state").collect():
            states[row["source"]] = row["state"]
        parts.append(res.where(F.col("detector") != _STATE_ROW).drop("state"))
    scores = parts[0]
    for p in parts[1:]:
        scores = scores.unionByName(p)
    stats_rows = []
    for src in sorted(states):
        _tail, _s, _v, (nz_, mz, m2z, ne_, me, m2e) = _unpack_state(states[src])
        for name, (wn, wmean, wm2) in (("zscore", (nz_, mz, m2z)), ("ewma", (ne_, me, m2e))):
            if wn == 0:
                stats_rows.append((src, tier, name, 0, float("nan"), float("nan")))
            else:
                stats_rows.append((src, tier, name, wn, wmean, wm2 / wn))
    stats = spark.createDataFrame(stats_rows, schemas.RESIDUAL_STATS_SCHEMA)
    return scores, stats


# ----------------------------------------------------- fused derived phase
#
# Scores (W1+W2), residual stats (W3) and Gorilla blocks (C1+C2) are all
# per-(source, tier) functions of the same gap-filled series. Running them
# as three grouped-map passes (round-1 design) shuffles and Arrow-transfers
# the identical frame three times and sorts every group three times; at
# corpus scale that is 3x the derived phase's shuffle I/O for zero extra
# information. The fused kernel makes ONE pass: one shuffle clustered on
# (source, tier) across ALL tiers, one Arrow exchange, one sort, every
# shared intermediate (rolling mean/std, the EWMA recurrence) computed
# once. Output is a long-format union tagged by `kind`
# ('score' | 'stat' | 'block'); pipeline.derive() splits it into the three
# sink tables from the persisted result. Byte-parity with the per-pass
# path is structural: kernels.rolling_zscore IS
# zscore_from_stats(rolling_mean_std(...)) (kernels.py), and both old
# kernels called ewma_detector on the same array.

FUSED_SCHEMA = (
    "source string, tier string, kind string, detector string, "
    "bucket_start timestamp, value double, score double, is_anomaly boolean, "
    "n long, mean double, var_pop double, "
    "metric string, block_start timestamp, n_points int, "
    "ts_dod_blob binary, val_xor_blob binary"
)


def _fused_kernel(cfg: DetectorConfig, metrics: tuple[str, ...]):
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )
    from .codec import encode_dod_batch, encode_xor_batch

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        src = pdf["source"].iloc[0]
        tier = pdf["tier"].iloc[0]
        x = pdf[value_col].to_numpy(dtype="float64")
        bucket = pdf["bucket_start"]
        nb = len(pdf)

        mu, sigma = kernels.rolling_mean_std(x, window)
        z, z_flag = kernels.zscore_from_stats(x, mu, sigma, tau)
        _s, e_resid, e_score = kernels.ewma_detector(x, alpha, eps)
        e_flag = pd.array(np.abs(e_score) >= tau, dtype="boolean")

        def score_rows(det: str, sc: np.ndarray, flag) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "source": pdf["source"], "tier": tier, "kind": "score",
                    "detector": det, "bucket_start": bucket, "value": x,
                    "score": sc, "is_anomaly": flag,
                    "n": pd.array([None] * nb, dtype="Int64"),
                    "mean": np.nan, "var_pop": np.nan, "metric": None,
                    "block_start": pd.NaT,
                    "n_points": pd.array([None] * nb, dtype="Int64"),
                    "ts_dod_blob": None, "val_xor_blob": None,
                }
            )

        out = [score_rows("zscore", z, z_flag), score_rows("ewma", e_score, e_flag)]

        stat = [
            (det, *kernels.welford(resid))
            for det, resid in (("zscore", x - mu), ("ewma", e_resid))
        ]
        out.append(
            pd.DataFrame(
                {
                    "source": src, "tier": tier, "kind": "stat",
                    "detector": [r[0] for r in stat],
                    "bucket_start": pd.NaT, "value": np.nan, "score": np.nan,
                    "is_anomaly": pd.array([None] * len(stat), dtype="boolean"),
                    "n": pd.array([r[1] for r in stat], dtype="Int64"),
                    "mean": [r[2] for r in stat],
                    "var_pop": [r[3] for r in stat],
                    "metric": None, "block_start": pd.NaT,
                    "n_points": pd.array([None] * len(stat), dtype="Int64"),
                    "ts_dod_blob": None, "val_xor_blob": None,
                }
            )
        )

        # Gorilla blocks: identical splitting + batch encoders as
        # codec.compress_tier (day-blocks contiguous in the sorted frame)
        ts_us = bucket.to_numpy().astype("datetime64[us]").view(np.int64)
        blocks = pdf["block_start"].to_numpy()
        cut = np.flatnonzero(np.concatenate(([True], blocks[1:] != blocks[:-1])))
        ends = np.concatenate((cut[1:], [nb]))
        spans = list(zip(cut, ends))
        ts_blobs = encode_dod_batch([ts_us[a:b] for a, b in spans])
        brows = []
        for m in metrics:
            vals = pdf[m].to_numpy(dtype=np.float64)
            val_blobs = encode_xor_batch([vals[a:b] for a, b in spans])
            for i, (a, b) in enumerate(spans):
                brows.append(
                    (m, pdf["block_start"].iloc[a], int(b - a), ts_blobs[i], val_blobs[i])
                )
        out.append(
            pd.DataFrame(
                {
                    "source": src, "tier": tier, "kind": "block",
                    "detector": None, "bucket_start": pd.NaT,
                    "value": np.nan, "score": np.nan,
                    "is_anomaly": pd.array([None] * len(brows), dtype="boolean"),
                    "n": pd.array([None] * len(brows), dtype="Int64"),
                    "mean": np.nan, "var_pop": np.nan,
                    "metric": [r[0] for r in brows],
                    "block_start": [r[1] for r in brows],
                    "n_points": pd.array([r[2] for r in brows], dtype="Int64"),
                    "ts_dod_blob": [r[3] for r in brows],
                    "val_xor_blob": [r[4] for r in brows],
                }
            )
        )
        return pd.concat(out, ignore_index=True)

    return run


def derive_fused(filled: DataFrame, cfg: RollupConfig | None = None) -> DataFrame:
    """One grouped-map pass over a (possibly multi-tier) gap-filled frame
    producing scores + residual stats + compressed blocks, long format.
    `filled` must carry a `tier` column (gapfill emits it)."""
    from .codec import BLOCK_METRICS

    cfg = cfg or RollupConfig()
    det = cfg.detector
    cols = sorted(set(BLOCK_METRICS) | {det.value_col})
    slim = filled.select(
        "source", "tier", "bucket_start",
        F.date_trunc("day", "bucket_start").alias("block_start"),
        *[F.col(m).cast("double").alias(m) for m in cols],
    )
    return slim.groupBy("source", "tier").applyInPandas(
        _fused_kernel(det, BLOCK_METRICS), schema=FUSED_SCHEMA
    )
