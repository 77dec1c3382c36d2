"""Exactly-incremental derived phase (scores / residual stats / blocks).

The round-1 derived phase recomputed the FULL history of every touched
source_bucket each batch — correct, but O(retained store) for a
steady-state batch that touches every source. This module makes the
derived wall proportional to the BATCH (plus a bounded halo):

- `derive_fused(..., emit_state=True)` checkpoints, per (source, tier),
  the detector state at the last 64-grid index g (EWMA (s, v) and Welford
  triples at g — bit-exact because the chunk-scan grid is cut at a
  multiple of kernels.SCAN_CHUNK, the sharded-path property — plus the
  z-score W-1 tail) and the gap-fill carry anchor (last observed row
  before p = start of the day containing bucket(g)).
- The next batch, for every (source, tier) whose new data is a pure
  append (min new bucket > checkpointed end), re-derives ONLY
  [p, new end]: the RAW segment rows (plus a synthetic carry row that
  anchors LOCF/linear across the cut) go straight into the kernel, which
  rebuilds the gap-filled grid in-kernel (detect._fill_group_pdf) and
  trims to >= p; scores resume from the grid state, stats fold on from
  the Welford triples, and blocks re-encode only spans >= span(g). Output
  is byte-identical to a full recompute (tests/test_increment.py).
- Late/backfilled data (min new bucket <= checkpointed end, or no state)
  falls back to a full re-derive of that (source, tier) only.
- Sink writes are preserve-union partition overwrites: within each
  affected (tier, day, source_bucket) partition, rows of sources that
  were not re-derived — and pre-cut rows of sources that were — are read
  back and unioned with the recomputed rows, so dynamic partition
  overwrite never drops a neighbor's data.

At 10^12 rows this is the difference between a derived phase that scans
the store every batch and one that touches O(batch + one span-partial
halo per source, bounded by config.BLOCK_SPAN_DAYS).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernels
from .config import TIER_US, DetectorConfig, RollupConfig
from .detect import (
    FUSED_SCHEMA,
    _null_state_cols,
    derive_fused,
    make_state_row,
    unpack_inc_state,
)
from .rollup import ROLLUP_COLS
from .storage import n_source_buckets

STATE_DIR = "derive_state"

STATE_COLS = (
    "source", "tier", "g_bucket", "end_bucket", "p_bucket",
    "carry_bucket", "carry_n_tok_mean", "carry_tok_mean", "state",
)


def _bucket_col() -> F.Column:
    return F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int")


def write_states(states: DataFrame, out_base: str) -> None:
    """Dynamic-partition-overwrite the (tier, source_bucket) state
    partitions present in `states`."""
    (
        states.select(*STATE_COLS)
        .withColumn("source_bucket", _bucket_col())
        .repartition("tier", "source_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tier", "source_bucket")
        .parquet(os.path.join(out_base, STATE_DIR))
    )


# ------------------------------------------------------- incremental kernel


def _inc_kernel(
    cfg: DetectorConfig, metrics: tuple[str, ...], steps_us: dict,
    fill: str | None = None, block_layout: str = "decomposed",
    spans_us: dict | None = None,
):
    """Per-(source, tier) grouped map over the SEGMENT [p, end] with the
    checkpointed state joined on. Emits the same long format as
    detect._fused_kernel: score rows for [g, end], stat rows (full-series
    totals via the carried Welford triples), block rows for every local
    span-block, and the refreshed kind='state' row.

    With `fill` set, the input is the RAW segment rows (carry anchor +
    [p, end]) and the gap-filled grid is rebuilt in-kernel
    (detect._fill_group_pdf — anchor first, trim to >= p after); fill=None
    keeps the legacy already-filled contract."""
    window, tau, alpha, eps, value_col = (
        cfg.window, cfg.tau, cfg.alpha, cfg.eps, cfg.value_col,
    )
    from .codec import BLOCK_SUM_COLS, encode_block_rows
    from .detect import _fill_group_pdf

    sum_cols = BLOCK_SUM_COLS if block_layout == "decomposed" else ()
    fill_cols = tuple(sorted(set(metrics) | {value_col} | set(sum_cols)))
    const_cols = (
        "g_bucket", "p_bucket", "carry_bucket",
        "carry_n_tok_mean", "carry_tok_mean", "state",
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if fill:
            consts = {c: pdf[c].iloc[0] for c in const_cols if c in pdf.columns}
            t0 = pdf["tier"].iloc[0]
            filled = _fill_group_pdf(
                pdf, steps_us[t0], fill, fill_cols,
                (spans_us or {}).get(t0, 86_400_000_000),
            )
            filled = filled[
                filled["bucket_start"] >= consts["p_bucket"]
            ].reset_index(drop=True)
            for c, v in consts.items():
                filled[c] = v
            pdf = filled
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        src = pdf["source"].iloc[0]
        tier = pdf["tier"].iloc[0]
        step_us = steps_us[tier]
        g_index, _old_len, ewma_st, wz, we, tail = unpack_inc_state(
            bytes(pdf["state"].iloc[0])
        )
        g_bucket = pdf["g_bucket"].iloc[0].to_datetime64()
        series_start = g_bucket - np.timedelta64(g_index * step_us, "us")
        bucket = pdf["bucket_start"]
        b_arr = bucket.to_numpy().astype("datetime64[us]")
        x = pdf[value_col].to_numpy(dtype="float64")
        nb = len(pdf)
        local_g = int((g_bucket - b_arr[0]) // np.timedelta64(step_us, "us"))
        assert 0 <= local_g <= nb, (local_g, nb)
        seg = x[local_g:]
        seg_bucket = bucket.iloc[local_g:].reset_index(drop=True)
        seg_src = pdf["source"].iloc[local_g:].reset_index(drop=True)

        # z-score: tail + segment, locally-determined windows
        xx = np.concatenate((tail, seg))
        mu, sigma = kernels.rolling_mean_std(xx, window)
        z_all, zf_all = kernels.zscore_from_stats(xx, mu, sigma, tau)
        off = tail.shape[0]
        z, z_flag, mu_seg = z_all[off:], zf_all[off:], mu[off:]
        z_resid = seg - mu_seg

        # EWMA + Welford: resume at g, split at the NEW grid cut g_new so
        # next state is extracted bit-exactly
        n_total = g_index + seg.shape[0]
        g_new = (n_total // kernels.SCAN_CHUNK) * kernels.SCAN_CHUNK
        split = g_new - g_index
        init = None if (g_index == 0 and np.isnan(ewma_st[0])) else ewma_st
        if split > 0:
            _s1, r1, e1, st_g = kernels.ewma_detector(
                seg[:split], alpha, eps, init=init, with_state=True
            )
            _s2, r2, e2, _st = kernels.ewma_detector(
                seg[split:], alpha, eps, init=st_g, with_state=True
            )
            e_resid = np.concatenate((r1, r2))
            e_score = np.concatenate((e1, e2))
            wz_new = kernels.welford_fold(z_resid[:split], *wz)
            we_new = kernels.welford_fold(r1, *we)
            wz_tot = kernels.welford_fold(z_resid[split:], *wz_new)
            we_tot = kernels.welford_fold(r2, *we_new)
        else:
            _s, e_resid, e_score, _st = kernels.ewma_detector(
                seg, alpha, eps, init=init, with_state=True
            )
            st_g = init if init is not None else (float("nan"), 0.0)
            wz_new, we_new = wz, we
            wz_tot = kernels.welford_fold(z_resid, *wz)
            we_tot = kernels.welford_fold(e_resid, *we)
        e_flag = pd.array(np.abs(e_score) >= tau, dtype="boolean")
        ns = seg.shape[0]

        def score_rows(det: str, sc: np.ndarray, flag) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "source": seg_src, "tier": tier, "kind": "score",
                    "detector": det, "bucket_start": seg_bucket, "value": seg,
                    "score": sc, "is_anomaly": flag,
                    "n": pd.array([None] * ns, dtype="Int64"),
                    "mean": np.nan, "var_pop": np.nan, "metric": None,
                    "block_start": pd.NaT,
                    "n_points": pd.array([None] * ns, dtype="Int64"),
                    "ts_dod_blob": None, "val_xor_blob": None,
                    **_null_state_cols(),
                }
            )

        out = [score_rows("zscore", z, z_flag), score_rows("ewma", e_score, e_flag)]

        stat = []
        for det, (n_, mean_, m2_) in (("zscore", wz_tot), ("ewma", we_tot)):
            if n_ == 0:
                stat.append((det, 0, float("nan"), float("nan")))
            else:
                stat.append((det, n_, mean_, m2_ / n_))
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

        # blocks: every local day [p .. end], the SAME shared builder as
        # the fused path (identical content -> identical layout decision
        # -> byte-identical rows, the incremental-parity contract)
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

        # refreshed state at g_new; z tail = filled values [g_new-(W-1), g_new)
        vals_to_gnew = np.concatenate((tail, seg[:split]))
        new_tail = vals_to_gnew[-min(window - 1, g_new):] if g_new > 0 else seg[:0]
        observed = ~pdf["gap_filled"].to_numpy()
        pc = pdf["carry_bucket"].iloc[0]
        prev_carry = None
        if pd.notna(pc):
            prev_carry = (
                pc.to_datetime64(),
                float(pdf["carry_n_tok_mean"].iloc[0]),
                float(pdf["carry_tok_mean"].iloc[0]),
            )
        out.append(
            make_state_row(
                src, tier, bucket, observed,
                np.column_stack([
                    pdf["n_tok_mean"].to_numpy(dtype="float64"),
                    pdf["tok_mean"].to_numpy(dtype="float64"),
                ]),
                g_new, series_start, step_us,
                st_g, wz_new, we_new, new_tail, prev_carry,
                span_us=(spans_us or {}).get(tier, 86_400_000_000),
            )
        )
        return pd.concat(out, ignore_index=True)

    return run


# ----------------------------------------------------------- orchestration


def _synth_carry_rows(cut: DataFrame) -> DataFrame:
    """One synthetic OBSERVED row per (source, tier) at the carry anchor —
    the LOCF/linear anchor for the first local gap run. It sits strictly
    before p, so it never reaches the kernel or any sink."""
    has = cut.where(F.col("carry_bucket").isNotNull())
    return has.select(
        "source",
        F.col("carry_bucket").alias("bucket_start"),
        "tier",
        F.lit(0).cast("long").alias("cnt"),
        F.lit(None).cast("long").alias("n_tok_sum"),
        F.lit(None).cast("int").alias("n_tok_min"),
        F.lit(None).cast("int").alias("n_tok_max"),
        F.col("carry_n_tok_mean").alias("n_tok_mean"),
        F.lit(None).cast("long").alias("tok_sum"),
        F.lit(None).cast("long").alias("tok_cnt"),
        F.lit(None).cast("int").alias("tok_min"),
        F.lit(None).cast("int").alias("tok_max"),
        F.col("carry_tok_mean").alias("tok_mean"),
        F.lit(False).alias("gap_filled"),
    )


def incremental_derive(
    spark: SparkSession,
    out_base: str,
    cfg: RollupConfig,
    batch_bounds: DataFrame,
    touched_buckets: list[int] | None,
    phases: dict,
) -> dict:
    """Derive scores/stats/blocks/state for exactly the batch's
    (source, tier) pairs: incrementally where the checkpointed state
    allows, full-series otherwise. Returns rows-per-tier of the
    re-derived gap-filled segments."""
    import time

    from .pipeline import BLOCKS_DIR, ROLLUP_DIR, SCORES_DIR, STATS_DIR

    def _mark(name: str, since: float) -> float:
        now = time.monotonic()
        phases[name] = round(phases.get(name, 0.0) + (now - since), 3)
        return now

    tp = time.monotonic()
    states = spark.read.parquet(os.path.join(out_base, STATE_DIR))
    if touched_buckets is not None:
        states = states.where(
            F.col("source_bucket").isin([int(b) for b in touched_buckets])
        )
    plan = batch_bounds.join(states, ["source", "tier"], "left")
    inc_cut = plan.where(
        F.col("state").isNotNull() & (F.col("min_bucket") > F.col("end_bucket"))
    ).select(*STATE_COLS).persist()
    fb_keys = plan.where(
        F.col("state").isNull() | (F.col("min_bucket") <= F.col("end_bucket"))
    ).select("source", "tier").persist()
    n_inc = inc_cut.count()
    n_fb = fb_keys.count()

    store = spark.read.parquet(os.path.join(out_base, ROLLUP_DIR))
    if touched_buckets is not None:
        store = store.where(
            F.col("source_bucket").isin([int(b) for b in touched_buckets])
        )

    recomputed = None
    if n_inc:
        min_day = inc_cut.agg(F.min(F.to_date("p_bucket"))).first()[0]
        seg_rows = (
            store.where(F.col("day") >= F.lit(min_day.isoformat()).cast("date"))
            .select(*ROLLUP_COLS)
            .join(F.broadcast(inc_cut.select("source", "tier", "p_bucket")),
                  ["source", "tier"])
            .where(F.col("bucket_start") >= F.col("p_bucket"))
            .drop("p_bucket")
            .unionByName(_synth_carry_rows(inc_cut))
        )
        # raw segment rows (carry anchor + [p, end]) straight into the
        # kernel; the gap-filled grid is rebuilt in-kernel from the carry
        # anchor and trimmed to >= p there (detect._fill_group_pdf) — no
        # spine join / LOCF window sort / dense-grid shuffle, same bytes
        det = cfg.detector
        from .codec import BLOCK_METRICS, BLOCK_SUM_COLS

        sum_cols = BLOCK_SUM_COLS if cfg.block_layout == "decomposed" else ()
        cols = sorted(set(BLOCK_METRICS) | {det.value_col} | set(sum_cols))
        slim = (
            seg_rows.join(
                F.broadcast(
                    inc_cut.select(
                        "source", "tier", "g_bucket", "p_bucket",
                        "carry_bucket", "carry_n_tok_mean", "carry_tok_mean",
                        "state",
                    )
                ),
                ["source", "tier"],
            )
            .select(
                "source", "tier", "bucket_start",
                *[F.col(m).cast("double").alias(m) for m in cols],
                "g_bucket", "p_bucket", "carry_bucket",
                "carry_n_tok_mean", "carry_tok_mean", "state",
            )
        )
        recomputed = slim.groupBy("source", "tier").applyInPandas(
            _inc_kernel(det, BLOCK_METRICS, dict(TIER_US), fill=cfg.gapfill_method,
                        block_layout=cfg.block_layout, spans_us=cfg.span_map_us()),
            schema=FUSED_SCHEMA,
        )
    if n_fb:
        fb_rows = store.select(*ROLLUP_COLS).join(
            F.broadcast(fb_keys), ["source", "tier"], "left_semi"
        )
        # raw rows in, gap-fill inside the kernel (same bytes, no spine
        # join / window sort / dense-grid shuffle — detect.derive_fused)
        fb_out = derive_fused(fb_rows, cfg, emit_state=True, fill=cfg.gapfill_method)
        recomputed = fb_out if recomputed is None else recomputed.unionByName(fb_out)
    if recomputed is None:
        inc_cut.unpersist()
        fb_keys.unpersist()
        return {}
    recomputed = recomputed.persist()
    counts = (
        recomputed.where("kind = 'score' AND detector = 'zscore'")
        .groupBy("tier").count().collect()
    )
    rows_per_tier = {r["tier"]: r["count"] for r in counts}
    for tier in cfg.tiers:
        rows_per_tier.setdefault(tier, 0)
    tp = _mark("derive_inc", tp)

    # cut table for preserve-union. Three cases for an existing row in an
    # affected partition, keyed by its (source, tier):
    #   no cuts row            -> not re-derived this batch: preserve ALL
    #   is_cut, cut_bucket set -> incremental: preserve rows before the cut
    #   is_cut, cut_bucket null-> fallback full recompute: preserve NONE
    cuts = (
        inc_cut.select("source", "tier", F.col("g_bucket").alias("cut_bucket"))
        .unionByName(
            fb_keys.select(
                "source", "tier", F.lit(None).cast("timestamp").alias("cut_bucket")
            )
        )
        .withColumn("is_cut", F.lit(True))
    )

    bucket = _bucket_col()

    def _preserved(existing: DataFrame, affected: DataFrame,
                   part_cols: list[str], keep: F.Column) -> DataFrame:
        """Rows of affected partitions that must survive the overwrite:
        not re-derived at all, or before the source's cut."""
        return (
            existing.join(F.broadcast(affected), part_cols, "left_semi")
            .join(F.broadcast(cuts), ["source", "tier"], "left")
            .where(keep)
            .drop("cut_bucket", "is_cut")
        )

    def _write(df: DataFrame, path: str, parts: list[str]) -> None:
        (
            df.repartition(*parts)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(path)
        )

    # ---- the four preserve-union sink overwrites, submitted CONCURRENTLY.
    # Safety of each self-read-overwrite rests on dynamic-partition-
    # overwrite commit ordering alone (see the comment above the pool):
    # preserved rows are read during task execution and the matched
    # partitions are deleted only at job commit, after every task has
    # finished. The four sinks touch disjoint paths, so the writes are
    # independent jobs and the phase costs max(walls) not the sum.
    tp = time.monotonic()

    scores_new = (
        recomputed.where("kind = 'score'")
        .select("source", "bucket_start", "tier", "detector", "value",
                "score", "is_anomaly")
        .withColumn("day", F.to_date("bucket_start"))
        .withColumn("source_bucket", bucket)
    )
    sp = ["tier", "day", "source_bucket"]
    scores_path = os.path.join(out_base, SCORES_DIR)
    preserved = _preserved(
        spark.read.parquet(scores_path), scores_new.select(*sp).distinct(), sp,
        F.col("is_cut").isNull()
        | (F.col("cut_bucket").isNotNull()
           & (F.col("bucket_start") < F.col("cut_bucket"))),
    )
    scores_out = scores_new.unionByName(preserved)

    stats_new = (
        recomputed.where("kind = 'stat'")
        .select("source", "tier", "detector",
                F.col("n").cast("long").alias("n"), "mean", "var_pop")
        .withColumn("source_bucket", bucket)
    )
    pp = ["tier", "source_bucket"]
    stats_path = os.path.join(out_base, STATS_DIR)
    st_keep = (
        spark.read.parquet(stats_path)
        .join(F.broadcast(stats_new.select(*pp).distinct()), pp, "left_semi")
        .join(F.broadcast(cuts.select("source", "tier")), ["source", "tier"], "left_anti")
    )
    stats_out = stats_new.unionByName(st_keep)

    blocks_new = (
        recomputed.where("kind = 'block'")
        .select("source", "tier", "metric", "block_start", "n_points",
                "ts_dod_blob", "val_xor_blob")
        .withColumn("day", F.to_date("block_start"))
        .withColumn("source_bucket", bucket)
    )
    bp = ["tier", "day", "source_bucket"]
    blocks_path = os.path.join(out_base, BLOCKS_DIR)
    # the incremental kernel re-encodes every block from p = span-floor of
    # the cut onward (cfg.block_span_days), so preserved block rows are
    # those strictly BEFORE the cut's span floor — day granularity would
    # double-keep the partial block at the cut for tiers with >1-day spans
    cut_us = F.unix_micros("cut_bucket")
    cut_floor = F.timestamp_micros(cut_us - F.pmod(cut_us, F.lit(86_400_000_000)))
    for t, span in cfg.span_map_us().items():
        if span != 86_400_000_000:
            cut_floor = F.when(
                F.col("tier") == t,
                F.timestamp_micros(cut_us - F.pmod(cut_us, F.lit(span))),
            ).otherwise(cut_floor)
    bl_keep = _preserved(
        spark.read.parquet(blocks_path), blocks_new.select(*bp).distinct(), bp,
        F.col("is_cut").isNull()
        | (F.col("cut_bucket").isNotNull()
           & (F.col("day") < F.to_date(cut_floor))),
    )
    blocks_out = blocks_new.unionByName(bl_keep)

    states_new = recomputed.where("kind = 'state'")
    st_path_aff = states_new.select(
        "tier", bucket.alias("source_bucket")
    ).distinct()
    keep_states = (
        spark.read.parquet(os.path.join(out_base, STATE_DIR))
        .join(F.broadcast(st_path_aff), ["tier", "source_bucket"], "left_semi")
        .join(F.broadcast(cuts.select("source", "tier")), ["source", "tier"], "left_anti")
        .select(*STATE_COLS)
    )
    states_out = states_new.select(*STATE_COLS).unionByName(keep_states)

    # Self-read-overwrite per sink is safe: the preserved rows are read
    # during job execution, and dynamic partition overwrite only deletes
    # the matched partitions at commit, after every task has finished
    # (byte-exactness pinned by tests/test_increment.py). Across sinks the
    # four writes are fully independent, so they run concurrently.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(_write, scores_out, scores_path, sp),
            pool.submit(_write, stats_out, stats_path, pp),
            pool.submit(_write, blocks_out, blocks_path, bp),
            pool.submit(write_states, states_out, out_base),
        ]
        for f in futs:
            f.result()
    tp = _mark("sink_writes", tp)

    recomputed.unpersist()
    inc_cut.unpersist()
    fb_keys.unpersist()
    return rows_per_tier
