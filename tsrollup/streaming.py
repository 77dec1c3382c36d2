"""Structured Streaming variant (SURVEY.md §2.10, T1–T5).

Batch is primary: the 10^12 rollup is an `availableNow` batch job. The
streaming surface reuses the SAME algebraic aggregates and pinned kernels:

  T1/T3  tumbling 1-minute aggregates with a watermark; late rows beyond the
         watermark are dropped by the engine and surfaced via the query's
         numRowsDroppedByWatermark progress metric (returned by
         run_streaming_rollup) — late data is reconciled by the batch path:
         resume.invalidate_units() tombstones the affected (source_bucket,
         day) units and the next rollup_build re-rolls them (keeps
         streaming state tiny).
  T4     per-source Welford residual state via applyInPandasWithState —
         the same (n, mean, M2) update order as kernels.welford, so
         streaming finals equal the batch oracle's when events arrive in
         event-time order.
  T5     exactly-once sink: foreachBatch writing one overwrite-by-batch_id
         directory per micro-batch (idempotent on restart-replay), the
         parquet shim for an Iceberg MERGE keyed (source, bucket_start, tier).
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


class _ProgressAccumulator(StreamingQueryListener):
    """T3 metrics accumulator: sums per-batch watermark-drop counts across
    ALL progress events (per query id), immune to the recentProgress cap."""

    def __init__(self) -> None:
        self.batches: dict[str, int] = {}
        self.late_rows: dict[str, int] = {}

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        qid = str(p.id)
        self.batches[qid] = self.batches.get(qid, 0) + 1
        late = 0
        for op in p.stateOperators or []:
            late += int(op.numRowsDroppedByWatermark or 0)
        self.late_rows[qid] = self.late_rows.get(qid, 0) + late

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass

from . import kernels, schemas
from .rollup import _partial_aggs, token_reduce_cols


def read_sequence_stream(
    spark: SparkSession, in_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schemas.SEQUENCE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(in_dir)


def streaming_rollup_1m(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """T1+T3 — tumbling 1m aggregates (same algebraic partials as batch).
    Append mode: a bucket row is emitted once its window falls behind the
    watermark, so emitted rows are FINAL — byte-comparable to the batch
    rollup for the same buckets."""
    wm = stream.withWatermark("event_ts", watermark)
    # slim per-row pre-reduce that KEEPS the watermarked event_ts column
    # (renaming/dropping it would detach the watermark and break append mode)
    pre = wm.select(
        "source",
        "event_ts",
        *token_reduce_cols(),
    )
    agg = (
        pre.groupBy(F.window("event_ts", "1 minute"), F.col("source"))
        .agg(*_partial_aggs())
    )
    return agg.select(
        "source",
        F.col("window.start").alias("bucket_start"),
        F.lit("1m").alias("tier"),
        "cnt",
        "n_tok_sum", "n_tok_min", "n_tok_max",
        (F.col("n_tok_sum").cast("double") / F.col("cnt")).alias("n_tok_mean"),
        "tok_sum", "tok_cnt", "tok_min", "tok_max",
        (F.col("tok_sum").cast("double") / F.col("tok_cnt")).alias("tok_mean"),
        F.lit(False).alias("gap_filled"),
    )


def run_streaming_rollup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> dict:
    """availableNow batch-drain of the stream into a parquet sink (T5 via
    the built-in file-sink transaction log: exactly-once per batch).

    Returns run metrics, including the T3 late-data accounting:
    {batches, late_rows_dropped} — late_rows_dropped sums the engine's
    numRowsDroppedByWatermark across micro-batches."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    rolled = streaming_rollup_1m(stream, watermark)
    # Accumulate metrics with a listener: recentProgress retains only the
    # last ~100 updates, which silently undercounts runs with
    # maxFilesPerTrigger=1 over >100 files.
    listener = _ProgressAccumulator()
    spark.streams.addListener(listener)
    try:
        q = (
            rolled.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        qid = str(q.id)
        # listener events arrive on a separate thread — drain until the
        # count catches up with the (possibly capped) recentProgress floor
        # and stays stable
        floor = len(q.recentProgress)
        deadline = time.monotonic() + 10.0
        last = -1
        while time.monotonic() < deadline:
            got = listener.batches.get(qid, 0)
            if got >= floor and got == last:
                break
            last = got
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    return {
        "batches": listener.batches.get(qid, 0),
        "late_rows_dropped": listener.late_rows.get(qid, 0),
    }


# ------------------------------------------------------------------ T4

WELFORD_STATE_SCHEMA = "n long, mean double, m2 double"
WELFORD_OUT_SCHEMA = "source string, n long, mean double, var_pop double"


def _welford_update(key, pdf_iter, state: GroupState):
    """Per-source Welford over n_tok (µ/σ² of sequence lengths per source,
    the streaming residual-statistics state). Same update order as
    kernels.welford: rows sorted by event_ts within each batch."""
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    # Concatenate ALL Arrow chunks for the group, then sort ONCE: a group
    # whose micro-batch exceeds arrow.maxRecordsPerBatch arrives as several
    # chunks in arbitrary relative order — per-chunk sorting would break the
    # event-time update order the batch parity contract pins.
    chunks = [pdf for pdf in pdf_iter]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("event_ts", kind="mergesort")
        n, mean, m2 = kernels.welford_fold(
            pdf["n_tok"].to_numpy(dtype="float64"), n, mean, m2
        )
    state.update((n, mean, m2))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "n": [n],
            "mean": [mean],
            "var_pop": [m2 / n if n else float("nan")],
        }
    )


def streaming_welford(stream: DataFrame) -> DataFrame:
    """T4 — applyInPandasWithState: one (n, mean, M2) triple per source,
    updated per micro-batch; each batch emits the source's running stats."""
    return (
        stream.select("source", "event_ts", "n_tok")
        .groupBy("source")
        .applyInPandasWithState(
            _welford_update,
            outputStructType=WELFORD_OUT_SCHEMA,
            stateStructType=WELFORD_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_welford(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """T4+T5 — stateful Welford drained with availableNow; foreachBatch
    writes each micro-batch to an overwrite-by-batch_id subdir (replaying a
    batch after a crash overwrites the same dir: idempotent)."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    stats = streaming_welford(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    q = (
        stats.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------------- streaming sketches

def streaming_hll_distinct_1m(
    stream: DataFrame, watermark: str = "10 minutes", value_col: str = "doc_id"
) -> DataFrame:
    """T1-family sketch tier: per-(source, 1m bucket) HLL distinct of
    `value_col` under the same watermark contract as the rollup — append
    mode emits a bucket's sketch once it is FINAL, so the streamed
    estimates equal the batch tier's (sketches.hll_partials) for the same
    buckets. The emitted `hll` binary is store-ready: the batch cascade
    (sketches.hll_merge) unions streamed 1m sketches up to 1h/1d unchanged.
    """
    from .sketches import HLL_LGK

    wm = stream.withWatermark("event_ts", watermark)
    agg = (
        wm.groupBy(F.window("event_ts", "1 minute"), F.col("source"))
        .agg(F.hll_sketch_agg(value_col, F.lit(HLL_LGK)).alias("hll"))
    )
    return agg.select(
        "source", F.col("window.start").alias("bucket_start"), "hll"
    )


# ------------------------------------------------------------- T6
# stream-static enrichment join: the remaining Structured Streaming
# join surface (stream x batch dim). Spark executes it as a per-batch
# broadcast hash join against the static side — no state store, no
# watermark interaction from the join itself; the windowed agg after it
# finalizes exactly like streaming_rollup_1m.

def streaming_enriched_rollup_1m(
    stream: DataFrame, dim: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """T6 — enrich the sequence stream with a static dimension table
    (source -> region) via a broadcast stream-static join, then tumbling
    1m aggregates per REGION. Append mode: emitted rows are final. The
    join must happen BEFORE the aggregation but the watermark attaches to
    the stream side first; the static side never advances it."""
    wm = stream.withWatermark("event_ts", watermark)
    joined = wm.join(F.broadcast(dim), "source")
    agg = (
        joined.select("region", "event_ts", F.col("n_tok"))
        .groupBy(F.window("event_ts", "1 minute"), F.col("region"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tok").alias("n_tok_sum"),
        )
    )
    return agg.select(
        "region",
        F.col("window.start").alias("bucket_start"),
        "cnt",
        "n_tok_sum",
    )


def run_streaming_enriched(
    spark: SparkSession,
    in_dir: str,
    dim: DataFrame,
    out_dir: str,
    checkpoint: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain of the enriched rollup into a parquet sink
    (same exactly-once file-sink contract as run_streaming_rollup)."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    enriched = streaming_enriched_rollup_1m(stream, dim, watermark)
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------ stream-stream join (T12)

def streaming_pair_join(
    left: DataFrame,
    right: DataFrame,
    tolerance_s: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """T12 — watermarked STREAM-STREAM inner join: co-occurrence pairs of
    two live event streams within ±tolerance seconds on the same source
    (the correlation primitive: "which A-events happened near which
    B-events"). Both sides carry watermarks and the join condition is a
    time-INTERVAL range — exactly the condition Spark's state store
    needs to evict matched-out rows, so state stays bounded by
    (watermark + tolerance) of stream history, never the whole stream.

    Inner-join emission is match-driven (not watermark-gated), and the
    state watermark is derived FROM the interval condition: a buffered
    row is evicted only once the event-time watermark passes
    row_ts + tolerance, i.e. once no future in-order partner can exist.
    So for ANY tolerance, watermark-correct (in-order) input loses no
    match — the drained output equals the batch range-join, which is
    what makes the entry oracle-twinnable.
    """
    lw = left.withWatermark("event_ts", watermark).select(
        F.col("source").alias("l_source"),
        F.col("doc_id").alias("doc_a"),
        F.col("event_ts").alias("l_ts"),
    )
    rw = right.withWatermark("event_ts", watermark).select(
        F.col("source").alias("r_source"),
        F.col("doc_id").alias("doc_b"),
        F.col("event_ts").alias("r_ts"),
    )
    cond = (
        (F.col("l_source") == F.col("r_source"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {tolerance_s} SECONDS"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {tolerance_s} SECONDS"))
    )
    return lw.join(rw, cond, "inner").select(
        F.col("l_source").alias("source"),
        "doc_a",
        "doc_b",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("gap_us"),
    )


def run_streaming_pair_join(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    tolerance_s: int = 60,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain of the stream-stream pair join into a parquet
    sink (same exactly-once file-sink contract as run_streaming_rollup).
    The two sides are disjoint halves of ONE source stream (doc-hash
    parity), so a single file source feeds both join inputs."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    par = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    joined = streaming_pair_join(
        stream.where(par == 0),
        stream.where(par == 1),
        tolerance_s,
        watermark,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------------- streaming scores
#
# Per-bucket detector scores ON THE STREAM: the stage after the
# streaming rollup reads the finalized 1m bucket rows (append-mode
# output is final by the watermark contract) and scores each source's
# series incrementally with applyInPandasWithState. The state carries
# the same grid-cut discipline as the exactly-incremental batch path
# (increment._inc_kernel): EWMA (s, v) at the last multiple-of-
# kernels.SCAN_CHUNK index g — so the chunked-scan grid, and therefore
# every float rounding, matches the batch evaluation bit-for-bit — plus
# the filled values [g - (W-1), n) that re-anchor the z-score windows
# and the post-g EWMA segment. Gap buckets are rebuilt in-kernel (LOCF
# only: linear interpolation needs future values and cannot stream).
# Emitted scores are BYTE-IDENTICAL to detect.score_tier over the
# gap-filled batch tier for the same buckets (tests/test_streaming.py).

SCORES_STATE_SCHEMA = (
    "series_start long, n long, ewma_s double, ewma_v double, buf binary"
)
SCORES_OUT_SCHEMA = (
    "source string, bucket_start timestamp, tier string, detector string, "
    "value double, score double, is_anomaly boolean, gap_filled boolean"
)


def _scores_update(window: int, tau: float, alpha: float, eps: float,
                   value_col: str, step_us: int, tier: str):
    import numpy as np

    chunk = kernels.SCAN_CHUNK

    def upd(key, pdf_iter, state: GroupState):
        chunks = [p for p in pdf_iter]
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            "bucket_start", kind="mergesort"
        )
        b = pdf["bucket_start"].to_numpy().astype("datetime64[us]").view(np.int64)
        vals = pdf[value_col].to_numpy(dtype="float64")
        if state.exists:
            ss, n, es, ev, buf_b = state.get
            buf = (
                np.frombuffer(buf_b, dtype=np.float64)
                if buf_b
                else np.empty(0, dtype=np.float64)
            )
        else:
            ss, n, es, ev = int(b[0]), 0, float("nan"), 0.0
            buf = np.empty(0, dtype=np.float64)
        rel = b - ss
        if np.any(rel % step_us):
            raise ValueError(f"bucket not on the {tier} grid for {key[0]!r}")
        idx = rel // step_us
        if idx.shape[0] != np.unique(idx).shape[0]:
            raise ValueError(f"duplicate finalized bucket for {key[0]!r}")
        if int(idx[0]) < n:
            raise ValueError(
                f"late bucket for {key[0]!r} behind streamed end — finalized "
                "rows must be in order; late data reconciles via the batch "
                "re-roll path (T3 contract)"
            )
        n_end = int(idx[-1]) + 1
        # rebuild the dense grid for the new slots (in-kernel G1 + LOCF G2)
        new = np.full(n_end - n, np.nan, dtype=np.float64)
        obs_new = np.zeros(n_end - n, dtype=bool)
        new[idx - n] = vals
        obs_new[idx - n] = True
        g = (n // chunk) * chunk
        tail_len = min(window - 1, g)
        xx = np.concatenate((buf, new))  # covers slots [g - tail_len, n_end)
        # LOCF copy of observed doubles (same pure-copy semantics as
        # gapfill: every filled value is a bit-copy of an observed one)
        miss = np.isnan(xx) & np.concatenate(
            (np.zeros(buf.shape[0], dtype=bool), ~obs_new)
        )
        pos = np.arange(xx.shape[0])
        src_idx = np.maximum.accumulate(np.where(miss, -1, pos))
        xx = xx[np.maximum(src_idx, 0)]

        seg = xx[tail_len:]  # slots [g, n_end)
        mu, sigma = kernels.rolling_mean_std(xx, window)
        z_all, zf_all = kernels.zscore_from_stats(xx, mu, sigma, tau)
        off_new = tail_len + (n - g)
        z_new, zf_new = z_all[off_new:], zf_all[off_new:]

        g_new = (n_end // chunk) * chunk
        split = g_new - g
        init = None if (g == 0 and np.isnan(es)) else (es, ev)
        if split > 0:
            _s1, _r1, e1, st_g = kernels.ewma_detector(
                seg[:split], alpha, eps, init=init, with_state=True
            )
            _s2, _r2, e2, _st = kernels.ewma_detector(
                seg[split:], alpha, eps, init=st_g, with_state=True
            )
            e_score = np.concatenate((e1, e2))
        else:
            _s, _r, e_score, _st = kernels.ewma_detector(
                seg, alpha, eps, init=init, with_state=True
            )
            st_g = init if init is not None else (float("nan"), 0.0)
        e_new = e_score[(n - g):]
        e_flag = pd.array(np.abs(e_new) >= tau, dtype="boolean")

        # refreshed state: buf covers [g_new - min(W-1, g_new), n_end)
        tail_new = min(window - 1, g_new)
        start_xx = tail_len + (g_new - tail_new - g)
        state.update(
            (
                int(ss), int(n_end), float(st_g[0]), float(st_g[1]),
                xx[start_xx:].tobytes(),
            )
        )

        n_out = n_end - n
        buckets = pd.Series(
            (ss + (np.arange(n, n_end) * step_us)).astype("datetime64[us]")
        )
        val_new = xx[off_new:]
        gap = pd.array(~obs_new, dtype="boolean")
        yield pd.DataFrame(
            {
                "source": [key[0]] * (2 * n_out),
                "bucket_start": pd.concat([buckets, buckets], ignore_index=True),
                "tier": tier,
                "detector": ["zscore"] * n_out + ["ewma"] * n_out,
                "value": np.concatenate((val_new, val_new)),
                "score": np.concatenate((z_new, e_new)),
                "is_anomaly": pd.array(list(zf_new) + list(e_flag), dtype="boolean"),
                "gap_filled": pd.array(list(gap) + list(gap), dtype="boolean"),
            }
        )

    return upd


def streaming_scores(bucket_stream: DataFrame, tier: str = "1m", cfg=None) -> DataFrame:
    """Stateful per-bucket z-score + EWMA scores over a stream of
    FINALIZED rollup bucket rows (the append-mode output of
    streaming_rollup_1m or any time-ordered feed of final buckets).
    Output rows are byte-identical to the batch detect.score_tier over
    the gap-filled tier (plus a gap_filled flag). LOCF gap-fill only —
    linear interpolation cannot stream (raises).

    Ordering contract: each source's buckets must be non-decreasing
    ACROSS micro-batches (within a batch the kernel sorts). Finalized
    windows satisfy this naturally — the watermark is monotone — but
    when chaining from a file sink, trigger on batch-aligned file sets:
    one upstream micro-batch spreads a source's windows across many
    part files, so file-at-a-time triggers would interleave. A violated
    contract raises loudly (late data reconciles via the batch re-roll
    path, the T3 contract)."""
    from .config import TIER_US, RollupConfig

    cfg = cfg or RollupConfig()
    if cfg.gapfill_method != "locf":
        raise ValueError(
            f"streaming scores require gapfill_method='locf' "
            f"(got {cfg.gapfill_method!r}): linear interpolation needs "
            "future buckets and cannot stream"
        )
    det = cfg.detector
    return (
        bucket_stream.select("source", "bucket_start", det.value_col)
        .groupBy("source")
        .applyInPandasWithState(
            _scores_update(
                det.window, det.tau, det.alpha, det.eps, det.value_col,
                dict(TIER_US)[tier], tier,
            ),
            outputStructType=SCORES_OUT_SCHEMA,
            stateStructType=SCORES_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_scores(
    spark: SparkSession,
    bucket_dir: str,
    out_dir: str,
    checkpoint: str,
    tier: str = "1m",
    cfg=None,
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain: read finalized bucket rows as a file stream,
    score statefully, append to a parquet sink (exactly-once via the
    file-sink transaction log)."""
    from . import schemas

    reader = spark.readStream.schema(schemas.ROLLUP_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(bucket_dir)
    scored = streaming_scores(stream, tier, cfg)
    q = (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# -------------------------------------------------- streaming token stats

TOKEN_HIST_PARTIAL_SCHEMA = "bucket timestamp, token_id int, cnt long"


def _token_hist_partials(batches):
    """Per-Arrow-batch (1m bucket, token_id, cnt) bincount partials —
    the tokenstats explode-free pattern on the stream: each batch emits
    at most |V| rows per bucket instead of one row per token."""
    import numpy as np

    from .tokenstats import _exact_counts

    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.assign(bucket=pdf["event_ts"].dt.floor("min"))
        outs = []
        for b, g in pdf.groupby("bucket", sort=False):
            flat = np.concatenate(g["tokens"].to_list())
            if not flat.size:
                continue
            ids, cnts = _exact_counts(flat)
            outs.append(
                pd.DataFrame(
                    {
                        "bucket": b,
                        "token_id": ids.astype(np.int32),
                        "cnt": cnts.astype(np.int64),
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)


def streaming_token_hist_1m(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Per-(1m bucket, token_id) EXACT token counts on the stream — the
    tokens x streaming composition: vocab-bounded mapInPandas bincount
    partials (stateless, so legal before the stateful agg), then a
    watermarked windowed SUM. The watermark attaches to the PARTIALS'
    bucket column (mapInPandas detaches the original event-time
    attribute — same reason streaming_rollup_1m must not rename
    event_ts): bucket = floor_minute(event_ts) <= event_ts, so
    finalization is conservative by < 1 minute and append-mode rows
    remain FINAL exact counts, byte-comparable to the batch histogram
    for the same buckets."""
    partials = stream.select("event_ts", "tokens").mapInPandas(
        _token_hist_partials, TOKEN_HIST_PARTIAL_SCHEMA
    )
    agg = (
        partials.withWatermark("bucket", watermark)
        .groupBy(F.window("bucket", "1 minute"), F.col("token_id"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    return agg.select(
        F.col("window.start").alias("bucket_start"), "token_id", "cnt"
    )


def run_streaming_token_hist(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain of the streamed token histogram into a parquet
    sink (exactly-once via the file-sink transaction log)."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    hist = streaming_token_hist_1m(stream, watermark)
    q = (
        hist.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------- T9
# Streaming silence detection (dead-man switch): emit a row for every
# FINALIZED bucket in which a previously-active source produced no
# events — the monitoring primitive that catches a source going dark,
# which no per-arriving-row operator can see (absence has no rows).
# Event-time timeouts make the detector fire while the source stays
# silent: the watermark (attached to the FLOORED bucket column, same
# contract as streaming_token_hist_1m) keeps advancing on other
# sources' traffic, and each group's timeout re-arms one bucket ahead.
# Finality rule (the twin's cut): bucket + step <= wm where
# wm = floor(step, max event_ts) - delay; emitted rows are final and
# exactly equal the batch spine-gap computation below that cut.

SILENCE_STATE_SCHEMA = "first_idx long, emitted_until long, obs binary"
SILENCE_OUT_SCHEMA = "source string, bucket_start timestamp"


def _silence_update(step_us: int):
    import numpy as np

    step_ms = step_us // 1000

    def upd(key, pdf_iter, state: GroupState):
        chunks = [p for p in pdf_iter]
        wm_ms = state.getCurrentWatermarkMs()
        cut = int(wm_ms // step_ms)  # bucket idx < cut is FINAL
        new_idx: set[int] = set()
        for pdf in chunks:
            if len(pdf):
                b = (
                    pdf["bucket"].to_numpy().astype("datetime64[us]")
                    .view(np.int64)
                )
                new_idx.update((b // step_us).tolist())
        if state.exists:
            first, emitted_until, obs_b = state.get
            obs = (
                set(np.frombuffer(obs_b, dtype=np.int64).tolist())
                if obs_b else set()
            )
        else:
            if not new_idx:  # timeout for a group we never saw: impossible
                return
            first = min(new_idx)
            emitted_until = first
            obs = set()
        obs |= new_idx
        if new_idx and min(new_idx) < first:
            # earlier-than-first data still inside the watermark window:
            # silence below it was never resolved (cut <= bucket), so the
            # origin simply moves back
            first = min(new_idx)
            emitted_until = min(emitted_until, first)
        start = emitted_until + 1
        silent = [i for i in range(start, cut) if i not in obs]
        if cut - 1 > emitted_until:
            emitted_until = cut - 1
        # prune on the WATERMARK cut, not emitted_until: at group init
        # emitted_until = first can sit far ABOVE the cut (source ahead
        # of the watermark), and a later above-watermark event can move
        # the origin back below it — a bucket pruned at `> emitted_until`
        # would then be falsely re-reported silent. Buckets below the cut
        # are final and can never be re-scanned (every future scan range
        # starts above some past cut), so `>= cut` is both safe and the
        # tight bound.
        obs = {i for i in obs if i >= cut}
        state.update((
            int(first), int(emitted_until),
            np.array(sorted(obs), dtype=np.int64).tobytes(),
        ))
        # fire again when the watermark finalizes the next bucket
        state.setTimeoutTimestamp((cut + 1) * step_ms)
        if silent:
            yield pd.DataFrame({
                "source": [key[0]] * len(silent),
                "bucket_start": pd.Series(
                    np.array(silent, dtype=np.int64) * step_us
                ).astype("datetime64[us]"),
            })

    return upd


def streaming_silence(
    stream: DataFrame, tier: str = "1h", watermark: str = "10 minutes"
) -> DataFrame:
    """T9 — per-source silence rows over the event stream: one output
    row per finalized `tier` bucket with NO events from a source that
    had produced events before (origin = the source's first observed
    bucket; interior gaps and open-ended trailing silence both emit).
    Append-mode, final rows only — twinnable against the batch
    spine-anti-join below the same watermark cut."""
    from .config import TIER_US

    unit = {"1m": "minute", "1h": "hour", "1d": "day"}[tier]
    step_us = TIER_US[tier]
    bucketed = stream.select(
        "source", F.date_trunc(unit, "event_ts").alias("bucket")
    ).withWatermark("bucket", watermark)
    return bucketed.groupBy("source").applyInPandasWithState(
        _silence_update(step_us),
        outputStructType=SILENCE_OUT_SCHEMA,
        stateStructType=SILENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_streaming_silence(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    tier: str = "1h",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain of the silence detector into a parquet sink
    (the final flush applies the fully-advanced watermark, so trailing
    silence up to the cut is emitted before the query stops)."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    sil = streaming_silence(stream, tier, watermark)
    q = (
        sil.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------- T10
# Streaming exact payload dedup: emit each distinct tokens payload ONCE
# across all micro-batches — the ingestion-time guard that keeps exact
# duplicates from ever entering the store. Keyed on xxhash64(tokens)
# (the same Catalyst array fold the batch keeper table and the DuckDB
# xxh64_intlist macro pin bit-for-bit), so arrays never enter the state
# store — only 8-byte hashes.


def streaming_dedup(stream: DataFrame) -> DataFrame:
    """T10 — first-occurrence pass-through on the stream via
    dropDuplicates on the payload hash. State is one 8-byte key per
    DISTINCT payload and the guarantee is GLOBAL exact dedup (a
    duplicate arriving hours later is still suppressed) — the right
    trade for corpus ingestion, where hash cardinality is bounded by the
    corpus itself. For unbounded streams where state must stay finite,
    `dropDuplicatesWithinWatermark` is the bounded-state variant (dups
    beyond the horizon re-emit and are reconciled by the batch dedup,
    the same late-data division of labor as T3).

    Emitted rows are (h, n_tok): the SET emitted is exactly the distinct
    payload set, deterministic even when two copies land in one
    micro-batch (whichever row wins carries identical h and n_tok), so
    the operator is twinnable against batch DISTINCT."""
    return (
        stream.select(F.xxhash64("tokens").alias("h"), "n_tok")
        .dropDuplicates(["h"])
    )


def run_streaming_dedup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup_bounded(
    stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """T10b — BOUNDED-STATE streaming dedup via
    dropDuplicatesWithinWatermark: state for a payload hash lives only
    until the event-time watermark passes the first occurrence's
    timestamp, so on an infinite stream the state store holds O(distinct
    payloads per horizon) 8-byte keys instead of growing forever (the
    global-exact variant above is the right trade for corpus ingestion,
    where cardinality is bounded by the corpus; THIS is the right trade
    for unbounded telemetry).

    Contract (pinned by test_streaming): a duplicate arriving while its
    key's state is live is suppressed; a duplicate arriving AFTER the
    watermark evicted the key RE-EMITS. Eviction runs at micro-batch END
    (measured: a re-occurrence landing in the same batch as its key's
    eviction is still swallowed against the stale entry), so the
    re-emit guarantee is at batch granularity. Downstream reconciliation
    is the batch exact dedup (SD1/SD2) — the same late-data division of
    labor as T3's tombstone re-roll: the stream guarantees at-most-once
    per horizon, the batch pass restores exactly-once per corpus."""
    return (
        stream.withWatermark("event_ts", watermark)
        .select(F.xxhash64("tokens").alias("h"), "n_tok", "event_ts")
        .dropDuplicatesWithinWatermark(["h"])
        .select("h", "n_tok", "event_ts")
    )


def run_streaming_dedup_bounded(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    q = (
        streaming_dedup_bounded(stream, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------- T11
# Streaming session windows: per-source activity sessions (gap-based)
# merged ACROSS micro-batches in the state store — the stateful shape
# tumbling windows can't express (a session's events may arrive in many
# batches; the window end moves as events arrive). Append mode: a
# session emits once the watermark passes its end (last event + gap),
# so emitted rows are FINAL and equal the batch lag/cumsum
# sessionization below the same cut.


def streaming_sessions(
    stream: DataFrame, gap: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """T11 — F.session_window aggregation on the event stream. Boundary
    semantics (pinned by test): an event exactly ``gap`` after the
    previous one still MERGES (touching windows coalesce), so the batch
    twin's new-session predicate is ts - prev_ts > gap — the same
    convention as the batch t2 sessionization. Emitted rows: (source,
    session_start, session_end, n_events, n_tok_sum); session_end =
    last event + gap."""
    wm = stream.withWatermark("event_ts", watermark)
    agg = (
        wm.groupBy(F.session_window("event_ts", gap), F.col("source"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_tok").cast("long").alias("n_tok_sum"),
        )
    )
    return agg.select(
        "source",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "n_tok_sum",
    )


def run_streaming_sessions(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    gap: str = "1 hour",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    q = (
        streaming_sessions(stream, gap, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------------------------------ T13

def streaming_ohlc_1m(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """T13 — streaming OHLC candles: per (source, 1m window), the first/
    last n_tok in (event_ts, doc_id) order plus the extremes and count —
    the b3_ohlc semantics on the live stream. min_by/max_by on a struct
    ordering are algebraic aggregates, so they run as ordinary
    watermarked partials (append mode: emitted candles are FINAL and
    byte-comparable to the batch candle for the same bucket)."""
    wm = stream.withWatermark("event_ts", watermark)
    key = F.struct(F.col("event_ts"), F.col("doc_id"))
    agg = wm.groupBy(F.window("event_ts", "1 minute"), F.col("source")).agg(
        F.min_by("n_tok", key).alias("open"),
        F.max("n_tok").alias("high"),
        F.min("n_tok").alias("low"),
        F.max_by("n_tok", key).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return agg.select(
        "source",
        F.col("window.start").alias("bucket_start"),
        "open", "high", "low", "close", "n",
    )


def run_streaming_ohlc(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain of the candle stream into a parquet sink —
    same exactly-once file-sink discipline as run_streaming_rollup."""
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger)
    q = (
        streaming_ohlc_1m(stream, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
