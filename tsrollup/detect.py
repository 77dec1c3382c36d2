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
from .gapfill import VALUE_COLS as GAP_VALUE_COLS

_DAY_US = 86_400_000_000


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


def _sharded_kernel(cfg: DetectorConfig, tier: str):
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        src = pdf["source"].iloc[0]
        packed = pdf["_carry"].iloc[0] if "_carry" in pdf.columns else None
        if packed is not None and not isinstance(packed, str):  # NaN from join
            packed = None
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
    filled: DataFrame, tier: str, cfg: RollupConfig | None = None,
    fuse_two_waves: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """W1–W3 sharded: returns (scores, residual_stats), each byte-identical
    to the unsharded score_tier / residual_stats output.

    `fuse_two_waves=False` forces the generic wave loop even for the
    2-shard case (test/measurement hook — the fused plan is the default)."""
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
    # Carry chain through a distributed STATE TABLE: each shard wave joins
    # the previous wave's (source, _carry) rows into its input (broadcast —
    # O(sources) rows) and the kernel resumes from the column. The
    # sequencing is inherent (shard k+1 needs k's state), but the driver
    # never collects state between waves and the closure ships no
    # per-source dict — state stays executor-side.
    if n_shards == 1 and fuse_two_waves:
        # The common hot-source case (exactly 2 waves) fuses into ONE lazy
        # plan: wave-0 output is cache-persisted, its state rows feed
        # wave-1 through the broadcast join, and the final union consumes
        # both from cache — no per-wave localCheckpoint jobs; the only
        # extra job is the broadcast build, which also populates the
        # cache (measured: ~2 jobs vs ~5 on the wave loop,
        # tests/test_sharding.py job-count regression).
        kern = _sharded_kernel(det, tier)
        part0 = (
            with_idx.where(F.col("_shard") == 0)
            .drop("_shard")
            .withColumn("_carry", F.lit(None).cast("string"))
        )
        res0 = part0.groupBy("source").applyInPandas(
            kern, schema=_SHARD_SCHEMA
        ).persist()
        states0 = res0.where(F.col("detector") == _STATE_ROW).select(
            "source", F.col("state").alias("_carry")
        )
        part1 = (
            with_idx.where(F.col("_shard") == 1)
            .drop("_shard")
            .join(F.broadcast(states0), "source", "left")
        )
        res1 = part1.groupBy("source").applyInPandas(
            kern, schema=_SHARD_SCHEMA
        ).persist()
        states1 = res1.where(F.col("detector") == _STATE_ROW).select(
            "source", F.col("state").alias("_carry")
        )
        # a source whose series ends in shard 0 keeps its state for stats
        state_df = states1.unionByName(
            states0.join(states1, "source", "left_anti")
        )
        scores = (
            res0.where(F.col("detector") != _STATE_ROW)
            .drop("state")
            .unionByName(res1.where(F.col("detector") != _STATE_ROW).drop("state"))
        )
    else:
        state_df = None
        parts = []
        for sid in range(int(n_shards) + 1):
            part = with_idx.where(F.col("_shard") == sid).drop("_shard")
            if state_df is None:
                part = part.withColumn("_carry", F.lit(None).cast("string"))
            else:
                part = part.join(F.broadcast(state_df), "source", "left")
            res = (
                part.groupBy("source")
                .applyInPandas(_sharded_kernel(det, tier), schema=_SHARD_SCHEMA)
                .localCheckpoint()  # materialize: state rows + final union reuse
            )
            new_states = res.where(F.col("detector") == _STATE_ROW).select(
                "source", F.col("state").alias("_carry")
            )
            if state_df is None:
                state_df = new_states.localCheckpoint()
            else:
                # a source whose series ended in an earlier shard emits no
                # new state row but must keep its state for the final stats
                state_df = new_states.unionByName(
                    state_df.join(new_states, "source", "left_anti")
                ).localCheckpoint()
            parts.append(res.where(F.col("detector") != _STATE_ROW).drop("state"))
        scores = parts[0]
        for p in parts[1:]:
            scores = scores.unionByName(p)
    # ONE O(sources) collect at the very end (not per shard): final
    # residual stats come from the terminal state table
    states = {r["source"]: r["_carry"] for r in state_df.collect()}
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
    "ts_dod_blob binary, val_xor_blob binary, "
    "g_bucket timestamp, end_bucket timestamp, p_bucket timestamp, "
    "carry_bucket timestamp, carry_n_tok_mean double, carry_tok_mean double, "
    "state binary"
)

#: state blob layout (float64 array): [g_index, series_len, ewma_s, ewma_v,
#: nz, mz, m2z, ne, me, m2e] + z-score tail (last W-1 filled values before
#: the grid cut). ewma_s = NaN encodes "no EWMA state yet" (g_index == 0).
_INC_HEADER = 10


def pack_inc_state(
    g_index: int, series_len: int, ewma: tuple[float, float],
    welf_z: tuple, welf_e: tuple, tail: np.ndarray,
) -> bytes:
    head = np.array(
        [float(g_index), float(series_len), ewma[0], ewma[1],
         float(welf_z[0]), welf_z[1], welf_z[2],
         float(welf_e[0]), welf_e[1], welf_e[2]],
        dtype=np.float64,
    )
    return head.tobytes() + np.asarray(tail, dtype=np.float64).tobytes()


def unpack_inc_state(blob: bytes):
    arr = np.frombuffer(blob, dtype=np.float64)
    g_index, series_len = int(arr[0]), int(arr[1])
    ewma = (float(arr[2]), float(arr[3]))
    welf_z = (int(arr[4]), float(arr[5]), float(arr[6]))
    welf_e = (int(arr[7]), float(arr[8]), float(arr[9]))
    return g_index, series_len, ewma, welf_z, welf_e, arr[_INC_HEADER:].copy()


def _null_state_cols() -> dict:
    return {
        "g_bucket": pd.NaT, "end_bucket": pd.NaT, "p_bucket": pd.NaT,
        "carry_bucket": pd.NaT,
        "carry_n_tok_mean": np.nan, "carry_tok_mean": np.nan,
        "state": None,
    }


def make_state_row(
    src: str, tier: str, bucket: pd.Series, observed: np.ndarray,
    x: np.ndarray, g_index: int, series_start, step_us: int,
    ewma_state: tuple[float, float], welf_z: tuple, welf_e: tuple,
    tail: np.ndarray, prev_carry: tuple | None, span_us: int = _DAY_US,
) -> pd.DataFrame:
    """Build the kind='state' row: grid-cut detector state + the gap-fill
    carry anchor (last OBSERVED row strictly before p = start of the tier's
    block SPAN containing the grid-cut bucket — config.BLOCK_SPAN_DAYS; the
    partial block at the cut re-encodes from its span start, so the
    incremental segment must reach back that far). `bucket`/`observed`/`x`
    cover the
    frame the kernel saw; `prev_carry` is the consumed state's carry
    (bucket, n_tok_mean, tok_mean) for when no local observed row
    precedes p."""
    g_bucket = series_start + np.timedelta64(g_index * step_us, "us")
    g_us = int(g_bucket.astype("datetime64[us]").view("int64"))
    span_start = np.datetime64((g_us // span_us) * span_us, "us")
    p_bucket = max(span_start, np.datetime64(series_start, "us"))
    b_arr = bucket.to_numpy().astype("datetime64[us]")
    cand = np.flatnonzero(observed & (b_arr < p_bucket))
    if cand.size:
        i = int(cand[-1])
        carry = (b_arr[i], float(x[i][0]), float(x[i][1]))
    elif prev_carry is not None:
        carry = prev_carry
    else:
        carry = None
    series_len = int(
        (b_arr[-1] - np.datetime64(series_start, "us"))
        // np.timedelta64(step_us, "us")
    ) + 1
    blob = pack_inc_state(g_index, series_len, ewma_state, welf_z, welf_e, tail)
    return pd.DataFrame(
        {
            "source": [src], "tier": [tier], "kind": ["state"],
            "detector": [None], "bucket_start": [pd.NaT],
            "value": [np.nan], "score": [np.nan],
            "is_anomaly": pd.array([None], dtype="boolean"),
            "n": pd.array([None], dtype="Int64"),
            "mean": [np.nan], "var_pop": [np.nan], "metric": [None],
            "block_start": [pd.NaT],
            "n_points": pd.array([None], dtype="Int64"),
            "ts_dod_blob": [None], "val_xor_blob": [None],
            "g_bucket": [pd.Timestamp(g_bucket)],
            "end_bucket": [pd.Timestamp(b_arr[-1])],
            "p_bucket": [pd.Timestamp(p_bucket)],
            "carry_bucket": [pd.Timestamp(carry[0]) if carry else pd.NaT],
            "carry_n_tok_mean": [carry[1] if carry else np.nan],
            "carry_tok_mean": [carry[2] if carry else np.nan],
            "state": [blob],
        }
    )



def _fill_group_pdf(
    pdf: pd.DataFrame, step_us: int, method: str, cols: tuple[str, ...],
    span_us: int = _DAY_US,
) -> pd.DataFrame:
    """In-kernel G1+G2 for one (source, tier) group: rebuild the
    gap-filled frame (grid spine, cnt=0 on gap rows, LOCF/linear value
    fill, block_start) from the group's RAW rollup rows.

    Byte-identical to gapfill() for every column the fused kernel reads
    (tests/test_derive_fused.py): the spine is the same per-source
    min..max grid, LOCF is the same pure copy of observed doubles,
    linear runs the same pinned kernel. Fusing the fill here removes the
    spine explode+join, the LOCF window sort, and roughly half the Arrow
    exchange volume from the derived phase — the gap-filled frame never
    exists as a distributed dataset, which is the difference between
    shuffling the raw tier rows and shuffling the (much larger) dense
    grid at corpus scale."""
    pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
    ts = pdf["bucket_start"].to_numpy().astype("datetime64[us]").view(np.int64)
    t0 = int(ts[0])
    nslots = int((int(ts[-1]) - t0) // step_us) + 1
    pos = (ts - t0) // step_us
    observed = np.zeros(nslots, dtype=bool)
    observed[pos] = True
    grid = t0 + np.arange(nslots, dtype=np.int64) * step_us
    out: dict = {
        "source": pdf["source"].iloc[0],
        "tier": pdf["tier"].iloc[0],
        "bucket_start": pd.Series(grid.view("datetime64[us]")),
        # span floor (== codec.block_start_col) for the engine's
        # post-epoch timestamps
        "block_start": pd.Series(((grid // span_us) * span_us).view("datetime64[us]")),
    }
    locf_idx = None
    for c in cols:
        v = np.full(nslots, np.nan)
        v[pos] = pdf[c].to_numpy(dtype="float64")
        if c == "cnt":
            v[~observed] = 0.0  # gap buckets carry no mass
        elif c in GAP_VALUE_COLS:
            if method == "locf":
                if locf_idx is None:
                    locf_idx = np.maximum.accumulate(
                        np.where(observed, np.arange(nslots), 0)
                    )
                v = v[locf_idx]
            else:
                v = kernels.linear_fill(v, observed)
        # any other column keeps NaN on gap rows (gapfill() leaves
        # sums/extrema null there)
        out[c] = v
    out["gap_filled"] = ~observed
    return pd.DataFrame(out)


def _fused_kernel(
    cfg: DetectorConfig, metrics: tuple[str, ...],
    emit_state: bool = False, steps_us: dict | None = None,
    fill: str | None = None, fill_cols: tuple[str, ...] = (),
    block_layout: str = "decomposed", spans_us: dict | None = None,
):
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )
    from .codec import encode_block_rows

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if fill:
            t0 = pdf["tier"].iloc[0]
            pdf = _fill_group_pdf(
                pdf, steps_us[t0], fill, fill_cols,
                (spans_us or {}).get(t0, _DAY_US),
            )
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        src = pdf["source"].iloc[0]
        tier = pdf["tier"].iloc[0]
        if pdf["bucket_start"].isna().any():
            # NULL event time upstream (e.g. a mis-pointed scan reading an
            # unrelated parquet under the declared schema) previously
            # surfaced as an opaque datetime64 OverflowError here
            raise ValueError(
                f"derive kernel got NULL bucket_start rows for "
                f"(source={src!r}, tier={tier!r}) — input rows with NULL "
                f"event time; check the sequences scan path/schema"
            )
        x = pdf[value_col].to_numpy(dtype="float64")
        bucket = pdf["bucket_start"]
        nb = len(pdf)

        mu, sigma = kernels.rolling_mean_std(x, window)
        z, z_flag = kernels.zscore_from_stats(x, mu, sigma, tau)
        state_frame = None
        if emit_state:
            # split evaluation at the 64-grid cut g so the EWMA/Welford
            # state at g is extracted bit-exactly (the sharded-path
            # construction, tests/test_sharding.py); concatenated outputs
            # are byte-identical to the unsplit run.
            g = (nb // kernels.SCAN_CHUNK) * kernels.SCAN_CHUNK
            z_resid = x - mu
            if g > 0:
                _s1, r1, e1, ew_g = kernels.ewma_detector(
                    x[:g], alpha, eps, with_state=True
                )
                _s2, r2, e2, _ew_end = kernels.ewma_detector(
                    x[g:], alpha, eps, init=ew_g, with_state=True
                )
                e_resid = np.concatenate((r1, r2))
                e_score = np.concatenate((e1, e2))
                wz_g = kernels.welford_fold(z_resid[:g], 0, 0.0, 0.0)
                we_g = kernels.welford_fold(r1, 0, 0.0, 0.0)
            else:
                _s, e_resid, e_score = kernels.ewma_detector(x, alpha, eps)
                ew_g = (float("nan"), 0.0)
                wz_g = (0, 0.0, 0.0)
                we_g = (0, 0.0, 0.0)
            tail = x[max(0, g - (window - 1)):g]
            observed = (~pdf["gap_filled"].to_numpy()) if "gap_filled" in pdf else np.ones(nb, dtype=bool)
            step_us = steps_us[tier]
            state_frame = make_state_row(
                src, tier, bucket, observed,
                np.column_stack([pdf["n_tok_mean"].to_numpy(dtype="float64"),
                                 pdf["tok_mean"].to_numpy(dtype="float64")]),
                g, bucket.iloc[0].to_datetime64(), step_us,
                ew_g, wz_g, we_g, tail, None,
                span_us=(spans_us or {}).get(tier, _DAY_US),
            )
        else:
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
                    **_null_state_cols(),
                }
            )

        out = [score_rows("zscore", z, z_flag), score_rows("ewma", e_score, e_flag)]
        if state_frame is not None:
            out.append(state_frame)

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
                    **_null_state_cols(),
                }
            )
        )

        # Gorilla blocks: the SAME shared day-block builder as
        # codec.compress_tier (decomposed rows where the block verifies,
        # classic per-metric XOR rows otherwise — identical splitting)
        brows = encode_block_rows(pdf, block_layout)
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
                    **_null_state_cols(),
                }
            )
        )
        return pd.concat(out, ignore_index=True)

    return run


def derive_fused(
    filled: DataFrame,
    cfg: RollupConfig | None = None,
    emit_state: bool = False,
    fill: str | None = None,
) -> DataFrame:
    """One grouped-map pass over a (possibly multi-tier) frame producing
    scores + residual stats + compressed blocks, long format. The input
    must carry a `tier` column. With emit_state=True, also one
    kind='state' row per (source, tier): the grid-cut detector state +
    gap-fill carry anchor that lets the NEXT derive run resume
    incrementally (increment.py); score/stat/block output is
    byte-identical either way (split-at-grid evaluation, the sharded-path
    property).

    fill=None expects an already gap-filled frame (gapfill()); fill=
    'locf'|'linear' takes RAW rollup rows and performs the gap-fill
    INSIDE the kernel (_fill_group_pdf) — byte-identical output, but the
    dense grid never shuffles: the exchange moves only the raw rows, and
    the spine join + LOCF window sort disappear from the plan."""
    from .codec import BLOCK_METRICS, BLOCK_SUM_COLS
    from .config import TIER_US

    cfg = cfg or RollupConfig()
    det = cfg.detector
    # the decomposed block layout needs the integer sum columns in-kernel
    # (they delta-pack to a few bits and the means re-derive exactly)
    sum_cols = (
        tuple(c for c in BLOCK_SUM_COLS if c in filled.columns)
        if cfg.block_layout == "decomposed"
        else ()
    )
    cols = sorted(set(BLOCK_METRICS) | {det.value_col} | set(sum_cols))
    spans_us = cfg.span_map_us()
    if fill is None:
        extra = ["gap_filled"] if emit_state else []
        if all(v == _DAY_US for v in spans_us.values()):
            bs = F.date_trunc("day", "bucket_start")
        else:
            # per-tier span floor on a multi-tier frame: CASE over the
            # configured tiers (same arithmetic as codec.block_start_col)
            us = F.unix_micros("bucket_start")
            bs = F.timestamp_micros(us - F.pmod(us, F.lit(_DAY_US)))
            for t, span in spans_us.items():
                bs = F.when(
                    F.col("tier") == t,
                    F.timestamp_micros(us - F.pmod(us, F.lit(span))),
                ).otherwise(bs)
        slim = filled.select(
            "source", "tier", "bucket_start",
            bs.alias("block_start"),
            *[F.col(m).cast("double").alias(m) for m in cols],
            *extra,
        )
    else:
        # raw rows only: block_start/gap_filled are grid facts the kernel
        # derives itself
        slim = filled.select(
            "source", "tier", "bucket_start",
            *[F.col(m).cast("double").alias(m) for m in cols],
        )
    return slim.groupBy("source", "tier").applyInPandas(
        _fused_kernel(
            det, BLOCK_METRICS, emit_state=emit_state, steps_us=dict(TIER_US),
            fill=fill, fill_cols=tuple(cols), block_layout=cfg.block_layout,
            spans_us=spans_us,
        ),
        schema=FUSED_SCHEMA,
    )
