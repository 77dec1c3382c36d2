"""Streaming-variant tests (SURVEY.md §2.10): the streamed 1m rollup must
byte-match the batch rollup on every FINALIZED bucket (those behind the
final watermark), and the stateful Welford finals must equal the batch
kernel run over the same events in event-time order."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from tsrollup import kernels
from tsrollup.rollup import rollup_from_raw
from tsrollup.storage import read_sequences
from tsrollup.streaming import run_streaming_rollup, run_streaming_welford

from .conftest import assert_frame_byte_equal, normalize_ts

BASE = "/tmp/tsrollup_stream_test"


@pytest.fixture(scope="module")
def stream_input(seq_fixture_small):
    """Split the fixture into 3 files by event-time thirds — processed as
    ordered micro-batches via maxFilesPerTrigger=1."""
    import pyarrow.compute as pc

    t = pq.read_table(seq_fixture_small)
    ts = t["event_ts"]
    qs = [0.0, 1 / 3, 2 / 3, 1.0]
    srt = pc.sort_indices(ts)
    shutil.rmtree(BASE, ignore_errors=True)
    in_dir = os.path.join(BASE, "in")
    os.makedirs(in_dir)
    n = t.num_rows
    for i in range(3):
        lo, hi = int(qs[i] * n), int(qs[i + 1] * n)
        part = t.take(srt.slice(lo, hi - lo))
        pq.write_table(part, os.path.join(in_dir, f"part-{i}.parquet"))
    return in_dir


def test_streaming_rollup_matches_batch(spark, stream_input):
    out = os.path.join(BASE, "rollup_out")
    ckpt = os.path.join(BASE, "rollup_ckpt")
    run_streaming_rollup(spark, stream_input, out, ckpt, watermark="10 minutes",
                         max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0, "no finalized buckets emitted"
    # batch twin over the same input
    batch = rollup_from_raw(read_sequences(spark, stream_input), "1m", None).toPandas()
    got = normalize_ts(got, ("bucket_start",))
    batch = normalize_ts(batch, ("bucket_start",))
    # streaming emits only buckets finalized behind the last watermark:
    # compare exactly on the emitted set, and check the set is the right one
    emitted = set(zip(got["source"], got["bucket_start"]))
    sub = batch[[(s, b) in emitted for s, b in zip(batch["source"], batch["bucket_start"])]]
    assert_frame_byte_equal(got, sub, ["source", "bucket_start"], msg="streamed rollup")
    # nothing behind the watermark horizon was missed: every batch bucket
    # older than (max_ts - watermark) must have been emitted
    horizon = batch["bucket_start"].max() - np.timedelta64(20, "m")
    missed = batch[(batch["bucket_start"] < horizon)]
    missed = missed[[(s, b) not in emitted for s, b in zip(missed["source"], missed["bucket_start"])]]
    assert len(missed) == 0, f"{len(missed)} finalized buckets missing from stream output"


def test_late_rows_dropped_and_counted(spark, stream_input):
    """T3: rows arriving behind the watermark are dropped by the engine and
    surfaced via numRowsDroppedByWatermark; the emitted output is unaffected
    by the late file."""
    import pyarrow as pa

    late_dir = os.path.join(BASE, "in_late")
    shutil.rmtree(late_dir, ignore_errors=True)
    shutil.copytree(stream_input, late_dir)
    # a 4th file, arriving last, whose rows are 2 days older than everything
    t = pq.read_table(os.path.join(stream_input, "part-0.parquet")).slice(0, 100)
    ts = t["event_ts"].to_numpy().astype("datetime64[us]") - np.timedelta64(2, "D")
    t = t.set_column(
        t.schema.get_field_index("event_ts"),
        t.schema.field("event_ts"),
        pa.array(ts.astype("int64"), pa.timestamp("us", tz="UTC")),
    )
    pq.write_table(t, os.path.join(late_dir, "part-9-late.parquet"))

    out = os.path.join(BASE, "late_out")
    ckpt = os.path.join(BASE, "late_ckpt")
    metrics = run_streaming_rollup(
        spark, late_dir, out, ckpt, watermark="10 minutes", max_files_per_trigger=1
    )
    assert metrics["batches"] >= 4
    # the counter tallies post-partial-aggregation group rows, not raw rows
    assert metrics["late_rows_dropped"] > 0
    got = normalize_ts(spark.read.parquet(out).toPandas(), ("bucket_start",))
    # none of the late rows' (2-days-old) buckets were emitted
    cutoff = got["bucket_start"].min()
    late_min = pd.Timestamp(ts.min())
    assert late_min < cutoff - pd.Timedelta(days=1)
    # emitted rows are uncontaminated: byte-equal to the batch twin over the
    # ON-TIME files only
    batch = normalize_ts(
        rollup_from_raw(read_sequences(spark, stream_input), "1m", None).toPandas(),
        ("bucket_start",),
    )
    emitted = set(zip(got["source"], got["bucket_start"]))
    sub = batch[[(s, b) in emitted for s, b in zip(batch["source"], batch["bucket_start"])]]
    assert_frame_byte_equal(got, sub, ["source", "bucket_start"], msg="late-input stream")


def test_streaming_welford_matches_batch_kernel(spark, stream_input):
    out = os.path.join(BASE, "welford_out")
    ckpt = os.path.join(BASE, "welford_ckpt")
    run_streaming_welford(spark, stream_input, out, ckpt, max_files_per_trigger=1)
    batch_dirs = sorted(glob.glob(os.path.join(out, "batch_id=*")))
    assert len(batch_dirs) >= 2, "expected multiple micro-batches"
    # final stats = last batch's emission per source
    import pandas as pd

    frames = []
    for d in batch_dirs:
        bid = int(d.rsplit("=", 1)[1])
        pdf = pq.read_table(d).to_pandas()
        pdf["batch_id"] = bid
        frames.append(pdf)
    allb = pd.concat(frames, ignore_index=True)
    finals = (
        allb.sort_values("batch_id")
        .groupby("source", sort=True)
        .tail(1)
        .set_index("source")
        .sort_index()
    )
    # oracle: sequential Welford over each source's n_tok in event order
    seq = pq.read_table(stream_input).to_pandas()
    for src, grp in seq.groupby("source", sort=True):
        grp = grp.sort_values("event_ts", kind="mergesort")
        n, mean, var_pop = kernels.welford(grp["n_tok"].to_numpy(dtype="float64"))
        row = finals.loc[src]
        assert row["n"] == n, src
        assert row["mean"] == mean, src
        assert row["var_pop"] == var_pop, src


def test_streaming_hll_matches_batch_sketch(spark, stream_input):
    """Streamed per-bucket HLL sketches must estimate identically to batch
    sketches over the same buckets (finalized set only, append mode) — the
    property that lets the batch cascade union streamed 1m sketches."""
    from pyspark.sql import functions as F

    from tsrollup import sketches
    from tsrollup.streaming import read_sequence_stream, streaming_hll_distinct_1m

    out = os.path.join(BASE, "hll_out")
    ckpt = os.path.join(BASE, "hll_ckpt")
    stream = read_sequence_stream(spark, stream_input, max_files_per_trigger=1)
    q = (
        streaming_hll_distinct_1m(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sketches.hll_estimate(spark.read.parquet(out)).toPandas()
    assert len(got) > 0, "no finalized sketch buckets emitted"

    raw = read_sequences(spark, stream_input).withColumn(
        "bucket_start", F.date_trunc("minute", "event_ts")
    )
    batch = sketches.hll_estimate(
        sketches.hll_partials(raw, ["source", "bucket_start"], "doc_id")
    ).toPandas()
    got = normalize_ts(got, ("bucket_start",))
    batch = normalize_ts(batch, ("bucket_start",))
    emitted = set(zip(got["source"], got["bucket_start"]))
    sub = batch[[(s, b) in emitted for s, b in zip(batch["source"], batch["bucket_start"])]]
    assert_frame_byte_equal(
        got.astype({"approx_distinct": "int64"}),
        sub.astype({"approx_distinct": "int64"}),
        ["source", "bucket_start"],
        msg="streamed hll",
    )


def test_streaming_enriched_join_matches_batch(spark, stream_input):
    """T6 stream-static broadcast join: the streamed region-level rollup
    equals the batch groupBy over the SAME join on the emitted (finalized)
    window set — and every region is a genuine multi-source group (the
    join really merged sources, not renamed them)."""
    from pyspark.sql import functions as F

    from tsrollup.streaming import run_streaming_enriched

    dim = (
        read_sequences(spark, stream_input)
        .select("source")
        .distinct()
        .select(
            "source",
            F.concat(
                F.lit("r"), F.pmod(F.xxhash64("source"), F.lit(3)).cast("string")
            ).alias("region"),
        )
    )
    out = os.path.join(BASE, "enriched_out")
    ckpt = os.path.join(BASE, "enriched_ckpt")
    run_streaming_enriched(spark, stream_input, dim, out, ckpt,
                           max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0

    batch = (
        read_sequences(spark, stream_input)
        .join(dim, "source")
        .groupBy("region", F.date_trunc("minute", "event_ts").alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("n_tok_sum"))
        .toPandas()
    )
    got = normalize_ts(got, ("bucket_start",))
    batch = normalize_ts(batch, ("bucket_start",))
    emitted = set(zip(got["region"], got["bucket_start"]))
    sub = batch[[(r, b) in emitted for r, b in zip(batch["region"], batch["bucket_start"])]]
    assert_frame_byte_equal(got, sub, ["region", "bucket_start"], msg="enriched rollup")
    # the dim actually coalesces: fewer regions than sources
    n_src = dim.count()
    n_reg = dim.select("region").distinct().count()
    assert 1 < n_reg < n_src


# ----------------------------------------------------- streaming scores


def _batch_scores(spark, tier_df, cfg):
    from tsrollup.detect import score_tier
    from tsrollup.gapfill import gapfill

    return score_tier(gapfill(tier_df, "1m", cfg), "1m", cfg).toPandas()


def test_streaming_scores_match_batch(spark, stream_input):
    """Feed the batch 1m tier as 3 time-ordered slices through the
    stateful scores operator: every emitted (bucket, detector) row must
    be byte-identical to detect.score_tier over the gap-filled batch
    tier — the grid-cut state discipline at work across micro-batches."""
    from tsrollup.config import RollupConfig
    from tsrollup.streaming import run_streaming_scores

    cfg = RollupConfig()
    tier = rollup_from_raw(read_sequences(spark, stream_input), "1m", None)
    tier_pdf = tier.toPandas().sort_values("bucket_start", kind="mergesort")
    bdir = os.path.join(BASE, "buckets_in")
    shutil.rmtree(bdir, ignore_errors=True)
    os.makedirs(bdir)
    n = len(tier_pdf)
    for i, (lo, hi) in enumerate(((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n))):
        spark.createDataFrame(tier_pdf.iloc[lo:hi]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(bdir, f"slice-{i}"))
    # flatten: file source needs a flat dir of parquet files
    flat = os.path.join(BASE, "buckets_flat")
    shutil.rmtree(flat, ignore_errors=True)
    os.makedirs(flat)
    base_t = 1_700_000_000
    for i in range(3):
        (f,) = glob.glob(os.path.join(bdir, f"slice-{i}", "*.parquet"))
        dst = os.path.join(flat, f"part-{i}.parquet")
        shutil.copy(f, dst)
        # FileStreamSource orders by mtime truncated to MILLISECONDS —
        # same-ms files can batch in reverse; space them a second apart
        os.utime(dst, (base_t + i, base_t + i))
    out = os.path.join(BASE, "scores_out")
    ckpt = os.path.join(BASE, "scores_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_scores(spark, flat, out, ckpt, "1m", cfg,
                         max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0
    want = _batch_scores(spark, tier, cfg)
    assert_frame_byte_equal(
        normalize_ts(got.drop(columns=["gap_filled"]), ("bucket_start",)),
        normalize_ts(want, ("bucket_start",)),
        ["source", "detector", "bucket_start"],
        "streamed scores vs batch",
    )


def test_streaming_scores_chained_from_streaming_rollup(spark, stream_input):
    """Two-stage pipeline: streamed rollup sink -> streamed scores. The
    scored output must equal the batch detectors over the gap-filled
    FINALIZED bucket set (a per-source time-prefix of the tier)."""
    from tsrollup.config import RollupConfig
    from tsrollup.streaming import run_streaming_scores

    cfg = RollupConfig()
    r_out = os.path.join(BASE, "chain_rollup_out")
    r_ckpt = os.path.join(BASE, "chain_rollup_ckpt")
    shutil.rmtree(r_out, ignore_errors=True)
    shutil.rmtree(r_ckpt, ignore_errors=True)
    run_streaming_rollup(spark, stream_input, r_out, r_ckpt,
                         watermark="10 minutes", max_files_per_trigger=1)
    # no maxFilesPerTrigger here: one upstream micro-batch spreads a
    # source's windows across MANY part files (the agg's shuffle
    # partitioning), so file-at-a-time triggering would violate the
    # per-source order contract. Consuming batch-aligned file sets (here:
    # all of them at once; the kernel sorts within a batch) is the
    # documented deployment rule for chaining the scores stage.
    s_out = os.path.join(BASE, "chain_scores_out")
    s_ckpt = os.path.join(BASE, "chain_scores_ckpt")
    shutil.rmtree(s_out, ignore_errors=True)
    shutil.rmtree(s_ckpt, ignore_errors=True)
    run_streaming_scores(spark, r_out, s_out, s_ckpt, "1m", cfg)
    got = spark.read.parquet(s_out).toPandas()
    assert len(got) > 0
    # batch twin restricted to the finalized buckets the stream saw
    emitted = spark.read.parquet(r_out).select("source", "bucket_start")
    tier = rollup_from_raw(read_sequences(spark, stream_input), "1m", None)
    sub = tier.join(emitted, ["source", "bucket_start"], "left_semi")
    want = _batch_scores(spark, sub, cfg)
    assert_frame_byte_equal(
        normalize_ts(got.drop(columns=["gap_filled"]), ("bucket_start",)),
        normalize_ts(want, ("bucket_start",)),
        ["source", "detector", "bucket_start"],
        "chained streamed scores vs batch over finalized set",
    )


def test_streaming_scores_rejects_linear_and_late(spark):
    """linear gap-fill cannot stream (needs future buckets); a bucket
    behind the streamed end is a contract violation surfaced loudly."""
    from dataclasses import replace

    from tsrollup.config import RollupConfig
    from tsrollup.streaming import _scores_update, streaming_scores

    cfg = RollupConfig()
    lin = replace(cfg, gapfill_method="linear")
    empty = os.path.join(BASE, "empty_in")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(ValueError, match="linear"):
        streaming_scores(spark.readStream.schema(
            "source string, bucket_start timestamp, n_tok_mean double"
        ).parquet(empty), "1m", lin)

    # drive the kernel directly for the late-data path
    class FakeState:
        exists = True
        get = (0, 10, float("nan"), 0.0, b"")

        def update(self, v):
            pass

    upd = _scores_update(60, 3.0, 0.3, 1e-12, "n_tok_mean", 60_000_000, "1m")
    pdf = pd.DataFrame(
        {
            "source": ["s"],
            "bucket_start": [pd.Timestamp("1970-01-01 00:01:00")],  # slot 1 < n=10
            "n_tok_mean": [1.0],
        }
    )
    with pytest.raises(ValueError, match="late bucket"):
        list(upd(("s",), iter([pdf]), FakeState()))


def test_streaming_token_hist_matches_batch(spark, stream_input):
    """Streamed per-(1m bucket, token) counts must equal the batch
    explode histogram exactly on every finalized bucket, and the
    finalized set must be the watermark-threshold subset."""
    from pyspark.sql import functions as F

    from tsrollup.streaming import run_streaming_token_hist

    out = os.path.join(BASE, "tokhist_out")
    ckpt = os.path.join(BASE, "tokhist_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_token_hist(spark, stream_input, out, ckpt,
                             watermark="10 minutes", max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0

    seq = read_sequences(spark, stream_input)
    batch = (
        seq.select(F.date_trunc("minute", "event_ts").alias("bucket_start"),
                   F.explode("tokens").alias("token_id"))
        .groupBy("bucket_start", "token_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
    )
    wm = (seq.agg(F.max("event_ts")).first()[0].replace(second=0, microsecond=0)
          - pd.Timedelta(minutes=10))
    final = batch[batch["bucket_start"] + pd.Timedelta(minutes=1) <= wm]
    g = normalize_ts(got, ("bucket_start",)).sort_values(
        ["bucket_start", "token_id"]).reset_index(drop=True)
    w = normalize_ts(final, ("bucket_start",)).sort_values(
        ["bucket_start", "token_id"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["token_id"].to_numpy() == w["token_id"].to_numpy()).all()
    assert (g["cnt"].to_numpy() == w["cnt"].to_numpy()).all()


def test_streaming_silence_matches_batch_spine(spark):
    """T9 — the silence detector must emit EXACTLY the per-source finalized
    buckets with no events after the source's first observed bucket:
    interior gaps, trailing (open-ended) silence, and a late-starting
    source, all cut at wm = floor(1m, max event_ts) - delay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.streaming import run_streaming_silence

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    minute = np.timedelta64(60_000_000, "us")

    def rows(source, minutes):
        return [(f"{source}-{m}", [1, 2], source, 2, t0 + m * minute)
                for m in minutes]

    # src_a carries the watermark (every minute 0..120); src_b has an
    # interior gap 21..30 and goes dark after 60; src_c starts at 40,
    # dark after 50.
    data = (rows("src_a", range(0, 121))
            + rows("src_b", list(range(0, 21)) + list(range(31, 61)))
            + rows("src_c", range(40, 51)))
    data.sort(key=lambda r: (r[4], r[0]))
    schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()), ("n_tok", pa.int32()),
        ("event_ts", pa.timestamp("us")),
    ])
    tbl = pa.Table.from_pylist(
        [dict(zip([f.name for f in schema], r)) for r in data], schema=schema)
    in_dir = os.path.join(BASE, "silence_in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    import time as _time
    now = int(_time.time())
    step = (tbl.num_rows + 2) // 3
    for i in range(3):
        f = os.path.join(in_dir, f"part-{i}.parquet")
        pq.write_table(tbl.slice(i * step, step), f)
        os.utime(f, (now + i, now + i))  # mtime order == event-time order

    out = os.path.join(BASE, "silence_out")
    ckpt = os.path.join(BASE, "silence_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_silence(spark, in_dir, out, ckpt, tier="1m",
                          watermark="10 minutes", max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    got_set = set(zip(got["source"],
                      normalize_ts(got, ("bucket_start",))["bucket_start"]))
    assert len(got) == len(got_set), "duplicate silence rows emitted"

    # batch twin: wm = floor(minute, max ts) - 10m; final iff b + 1m <= wm
    cut_last = 120 - 10 - 1  # last final minute index
    expect = set()
    obs = {"src_a": set(range(0, 121)),
           "src_b": set(range(0, 21)) | set(range(31, 61)),
           "src_c": set(range(40, 51))}
    for src, seen in obs.items():
        for m in range(min(seen) + 1, cut_last + 1):
            if m not in seen:
                expect.add((src, pd.Timestamp((t0 + m * minute).item())))
    assert expect, "fixture must plant silence"
    assert got_set == expect


def test_streaming_dedup_exactly_once_across_batches(spark):
    """T10 — a payload duplicated across micro-batches (and within one)
    must emit exactly once; the emitted set equals batch DISTINCT."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.streaming import run_streaming_dedup

    t0 = np.datetime64("2024-04-01T00:00:00", "us")
    minute = np.timedelta64(60_000_000, "us")
    pay_a, pay_b, pay_c = [1, 2, 3], [4, 5], [6, 7, 8, 9]
    # a appears in files 0,1,2; b twice in file 0; c once in file 2
    files = [
        [("d0", pay_a, "s", 3, t0), ("d1", pay_b, "s", 2, t0 + minute),
         ("d2", pay_b, "s", 2, t0 + 2 * minute)],
        [("d3", pay_a, "s", 3, t0 + 10 * minute)],
        [("d4", pay_a, "s", 3, t0 + 20 * minute),
         ("d5", pay_c, "s", 4, t0 + 21 * minute)],
    ]
    schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()), ("n_tok", pa.int32()),
        ("event_ts", pa.timestamp("us")),
    ])
    in_dir = os.path.join(BASE, "dedup_in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    import time as _time
    now = int(_time.time())
    for i, rows in enumerate(files):
        f = os.path.join(in_dir, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pylist(
            [dict(zip([x.name for x in schema], r)) for r in rows],
            schema=schema), f)
        os.utime(f, (now + i, now + i))

    out = os.path.join(BASE, "dedup_out")
    ckpt = os.path.join(BASE, "dedup_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_dedup(spark, in_dir, out, ckpt, max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 3, f"expected 3 distinct payloads, got\n{got}"
    batch = (
        read_sequences(spark, in_dir)
        .select(F.xxhash64("tokens").alias("h"), "n_tok")
        .distinct()
        .toPandas()
    )
    g = got.sort_values("h").reset_index(drop=True)
    b = batch.sort_values("h").reset_index(drop=True)
    assert (g["h"] == b["h"]).all() and (g["n_tok"] == b["n_tok"]).all()


def test_streaming_sessions_merge_across_batches(spark):
    """T11 — session semantics pinned: events of ONE session arriving in
    different micro-batches merge in state before emission; an event
    exactly gap after the previous one starts a NEW session; emitted
    set = sessions with end <= final watermark."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.streaming import run_streaming_sessions

    t0 = np.datetime64("2024-05-01T00:00:00", "us")
    mn = np.timedelta64(60_000_000, "us")

    def row(doc, src, t):
        return (doc, [1], src, 1, t)

    # session A: events at 0, 3, 6 min (split across files 0 and 1)
    # boundary pin: the event at exactly +5min after 6 -> 11 min MERGES
    # (touching windows coalesce — same convention as batch t2)
    # session C: singleton at 40min. Carrier events at 120..180 push wm.
    files = [
        [row("a0", "s", t0), row("a1", "s", t0 + 3 * mn)],
        [row("a2", "s", t0 + 6 * mn), row("b0", "s", t0 + 11 * mn)],
        [row("c0", "s", t0 + 40 * mn),
         row("w0", "carrier", t0 + 120 * mn),
         row("w1", "carrier", t0 + 180 * mn)],
    ]
    schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()), ("n_tok", pa.int32()),
        ("event_ts", pa.timestamp("us")),
    ])
    in_dir = os.path.join(BASE, "sess_in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    import time as _time
    now = int(_time.time())
    for i, rows in enumerate(files):
        f = os.path.join(in_dir, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pylist(
            [dict(zip([x.name for x in schema], r)) for r in rows],
            schema=schema), f)
        os.utime(f, (now + i, now + i))

    out = os.path.join(BASE, "sess_out")
    ckpt = os.path.join(BASE, "sess_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_sessions(spark, in_dir, out, ckpt, gap="5 minutes",
                           watermark="10 minutes", max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    got = normalize_ts(got, ("session_start", "session_end"))
    got = got.sort_values(["source", "session_start"]).reset_index(drop=True)
    ts = lambda m: pd.Timestamp((t0 + m * mn).item())
    # final wm = max_ts - 10min = t0+170min; finalized: end <= wm
    rows = list(zip(got["source"], got["session_start"], got["session_end"],
                    got["n_events"]))
    assert ("s", ts(0), ts(16), 4) in rows, (
        f"cross-batch merge (incl. the exactly-gap event) broken:\n{got}"
    )
    assert ("s", ts(40), ts(45), 1) in rows
    assert ("carrier", ts(120), ts(125), 1) in rows
    assert len(rows) == 3, f"unexpected extra/missing sessions:\n{got}"


def test_streaming_silence_out_of_order_origin_moveback(spark):
    """Regression: a source whose first-seen buckets sit far ABOVE the
    watermark, followed by an out-of-order (but above-watermark) earlier
    event, must NOT re-report its originally-observed buckets as silent
    (the obs set must be pruned on the CUT, not emitted_until)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.streaming import run_streaming_silence

    t0 = np.datetime64("2024-06-01T00:00:00", "us")
    mn = np.timedelta64(60_000_000, "us")

    def row(doc, src, m):
        return (doc, [1], src, 1, t0 + m * mn)

    files = [
        # carrier fills 0..59; 'late' first appears at 100 and 102 —
        # way ahead of the watermark (wm after this batch: 102-10=92)
        [row(f"c{m}", "carrier", m) for m in range(0, 60)]
        + [row("l100", "late", 100), row("l102", "late", 102)],
        # out-of-order for 'late' at 95 (>= wm 92: accepted) — origin
        # moves back below the already-initialized emitted_until
        [row("l95", "late", 95), row("c60", "carrier", 60)],
        # push the final watermark to 110 so trailing silence finalizes
        [row("c120", "carrier", 120)],
    ]
    schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()), ("n_tok", pa.int32()),
        ("event_ts", pa.timestamp("us")),
    ])
    in_dir = os.path.join(BASE, "sil_ooo_in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    import time as _time
    now = int(_time.time())
    for i, rows in enumerate(files):
        f = os.path.join(in_dir, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pylist(
            [dict(zip([x.name for x in schema], r)) for r in rows],
            schema=schema), f)
        os.utime(f, (now + i, now + i))

    out = os.path.join(BASE, "sil_ooo_out")
    ckpt = os.path.join(BASE, "sil_ooo_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_silence(spark, in_dir, out, ckpt, tier="1m",
                          watermark="10 minutes", max_files_per_trigger=1)
    got = spark.read.parquet(out).toPandas()
    got_set = set(zip(got["source"],
                      normalize_ts(got, ("bucket_start",))["bucket_start"]))
    assert len(got) == len(got_set), "duplicate silence rows"
    # batch twin: cut = 120 - 10 = 110; silence = (first_obs, 110) \ obs
    obs = {"carrier": set(range(0, 61)) | {120},
           "late": {95, 100, 102}}
    expect = set()
    for src, seen in obs.items():
        for m in range(min(seen) + 1, 110):
            if m not in seen:
                expect.add((src, pd.Timestamp((t0 + m * mn).item())))
    assert got_set == expect, (
        f"missing: {sorted(expect - got_set)[:5]} "
        f"extra: {sorted(got_set - expect)[:5]}"
    )


def test_streaming_pair_join_matches_batch_range_join(spark, stream_input):
    """T12 stream-stream: the drained inner interval join over the parity
    halves equals the BATCH range join row-for-row (state eviction is
    condition-derived, so in-order input loses no match), and every gap
    honors the tolerance."""
    from tsrollup.streaming import run_streaming_pair_join

    out = os.path.join(BASE, "pairs_out")
    ckpt = os.path.join(BASE, "pairs_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    tol = 120
    run_streaming_pair_join(
        spark, stream_input, out, ckpt, tolerance_s=tol,
        max_files_per_trigger=1,
    )
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["source", "doc_a", "doc_b"], kind="mergesort")
        .reset_index(drop=True)
    )
    seq = read_sequences(spark, stream_input)
    par = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    l = seq.where(par == 0).select(
        "source", F.col("doc_id").alias("doc_a"),
        F.unix_micros("event_ts").alias("lts"))
    r = seq.where(par == 1).select(
        F.col("source").alias("r_source"), F.col("doc_id").alias("doc_b"),
        F.unix_micros("event_ts").alias("rts"))
    want = (
        l.join(r, (F.col("source") == F.col("r_source"))
               & (F.col("rts") >= F.col("lts") - tol * 1_000_000)
               & (F.col("rts") <= F.col("lts") + tol * 1_000_000))
        .select("source", "doc_a", "doc_b",
                (F.col("rts") - F.col("lts")).alias("gap_us"))
        .toPandas()
        .sort_values(["source", "doc_a", "doc_b"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(want) > 0
    assert got.equals(want)
    assert (got["gap_us"].abs() <= tol * 1_000_000).all()


def test_streaming_dedup_bounded_state_contract(spark):
    """T10b — dropDuplicatesWithinWatermark variant: a duplicate within
    the watermark horizon is suppressed; a duplicate arriving after the
    watermark evicted its key RE-EMITS (the documented bounded-state
    contract — batch dedup reconciles). Carrier payloads advance the
    watermark between micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.streaming import run_streaming_dedup_bounded

    t0 = np.datetime64("2024-04-02T00:00:00", "us")
    mn = np.timedelta64(60_000_000, "us")
    pay_a, pay_b, pay_c, pay_d = [11, 12, 13], [14, 15], [16, 17, 18, 19], [20]
    # file0: A at t0, B (carrier) at t0+1m
    # file1: A again at t0+5m (within 10m horizon of t0 -> SUPPRESSED),
    #        C (carrier) at t0+30m -> watermark for the NEXT batch = t0+20m
    # file2: D (carrier) — during this batch wm=t0+20m, and state eviction
    #        runs at batch END (measured Spark semantics: a re-occurrence
    #        landing in the SAME batch as its key's eviction is still
    #        swallowed against the stale entry), so A's key leaves the
    #        store here
    # file3: A again at t0+50m (state evicted one batch ago -> RE-EMITS)
    files = [
        [("d0", pay_a, "s", 3, t0), ("d1", pay_b, "s", 2, t0 + mn)],
        [("d2", pay_a, "s", 3, t0 + 5 * mn), ("d3", pay_c, "s", 4, t0 + 30 * mn)],
        [("d4", pay_d, "s", 1, t0 + 35 * mn)],
        [("d5", pay_a, "s", 3, t0 + 50 * mn)],
    ]
    schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("source", pa.string()), ("n_tok", pa.int32()),
        ("event_ts", pa.timestamp("us")),
    ])
    in_dir = os.path.join(BASE, "dedup_b_in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    import time as _time
    now = int(_time.time())
    for i, rows in enumerate(files):
        f = os.path.join(in_dir, f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pylist(
            [dict(zip([x.name for x in schema], r)) for r in rows],
            schema=schema), f)
        os.utime(f, (now + i, now + i))

    out = os.path.join(BASE, "dedup_b_out")
    ckpt = os.path.join(BASE, "dedup_b_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    run_streaming_dedup_bounded(
        spark, in_dir, out, ckpt, watermark="10 minutes", max_files_per_trigger=1
    )
    got = spark.read.parquet(out).toPandas()
    from pyspark.sql import functions as FF
    ha = spark.createDataFrame([(pay_a,)], "tokens array<int>").select(
        FF.xxhash64("tokens")).collect()[0][0]
    hb = spark.createDataFrame([(pay_b,)], "tokens array<int>").select(
        FF.xxhash64("tokens")).collect()[0][0]
    hc = spark.createDataFrame([(pay_c,)], "tokens array<int>").select(
        FF.xxhash64("tokens")).collect()[0][0]
    hd = spark.createDataFrame([(pay_d,)], "tokens array<int>").select(
        FF.xxhash64("tokens")).collect()[0][0]
    counts = got.groupby("h").size().to_dict()
    assert counts.get(hb) == 1 and counts.get(hc) == 1 and counts.get(hd) == 1, counts
    # the horizon-bounded contract: suppressed within, re-emitted beyond
    assert counts.get(ha) == 2, (
        f"expected A to emit twice (t0 emit, t0+5m suppressed, t0+50m "
        f"re-emit after eviction), got {counts}"
    )
    assert len(got) == 5
