"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full tsrollup engine (tokenize → tiered
                rollup → gap-fill → z-score/EWMA detectors) over a sequence
                table derived from sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2.1 +
                datapipe ops); SQL-expressible ones have DuckDB twins in
                oracle_sql(); engine-internal ones (detector kernels, codec,
                LSH-ANN, multimodal plumbing) are rows-only here and
                byte-parity-tested against the NumPy oracle in tests/.
oracle_sql()  — DuckDB SQL with IDENTICAL column aliases per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsrollup.driver_queries import ORACLE, SPARK  # noqa: E402

def _read_table(spark, sf_dir, name, spread=False):
    """Driver-table read through storage.read_table (scan-parallelism
    guard for unsplittable single-file inputs, guide §2.5); spread is
    opt-in where the scan stage carries heavy per-row work."""
    from tsrollup.storage import read_table

    return read_table(spark, sf_dir, name, spread=spread)



def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: full-engine anomaly scores."""
    from tsrollup.flagship import flagship_scores

    return flagship_scores(spark, "/root/testdata/sf0.001", tier="1h")


def _pow2_case(col: str) -> str:
    """Smallest power of two >= col as a literal integer CASE ladder —
    identical text runs in Spark SQL and DuckDB, with none of the
    last-ulp knife edges a float pow(2, ceil(log2(n))) would have."""
    arms = " ".join(
        f"WHEN {col} <= {1 << k} THEN CAST({1 << k} AS BIGINT)"
        for k in range(0, 21)
    )
    return f"CASE {arms} ELSE CAST({1 << 21} AS BIGINT) END"


def _engine_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Rows-only entries: operators whose semantics aren't ANSI-SQL
    expressible (sequential recurrences, bit-level codecs, NumPy LSH)."""
    from pyspark.sql import functions as F

    from tsrollup.config import RollupConfig
    from tsrollup.codec import compress_tier, decompress_blocks
    from tsrollup.datapipe import ann_lsh_topk, multimodal_features
    from tsrollup.detect import residual_stats
    from tsrollup.flagship import flagship_scores, sequences_from_documents
    from tsrollup.gapfill import gapfill
    from tsrollup.rollup import build_all_tiers

    def _scores_projection(sc_df, window: int):
        """Shared oracle-ready projection of a scores frame (PROMOTED to
        oracle-twinned, round 3).

        The z-score SCORE is masked to NULL on constant trailing windows
        (min == max over the W-window of the bit-exact filled series, an
        identical comparison on both sides): there the kernel's window
        mean differs from the value by an ulp (pairwise-summation
        artifact), sigma is ulp-scale, and z is exactly 0 or ±1 depending
        on numpy's rounding — honest SQL cannot reproduce WHICH, but
        |z| <= 1 < tau is PROVABLE (every deviation in a constant window
        is the same e, so z = -e/|e| or 0), so `is_anomaly` stays fully
        twinned everywhere. Warmup scores (NaN) map to NULL on both
        sides. EWMA rows are fully twinned: the recurrence is evaluated
        by a recursive CTE in DuckDB and 6-dp rounding absorbs the
        chunked-affine-scan vs sequential float differences. `value`
        stays RAW (bit-exact: LOCF copies bits and the mean is a single
        division both sides perform identically)."""
        from pyspark.sql import Window as Wd

        w = (
            Wd.partitionBy("source", "detector")
            .orderBy("bucket_start")
            .rowsBetween(-(window - 1), 0)
        )
        const_w = (F.count(F.lit(1)).over(w) == window) & (
            F.min("value").over(w) == F.max("value").over(w)
        )
        is_z = F.col("detector") == "zscore"
        # warmup scores surface as NULL (Arrow maps the kernel's NaN to
        # null through applyInPandas) — test both spellings
        warm = F.col("score").isNull() | F.isnan("score")
        # noise floor: |score| < 1e-4 publishes as exactly 0.0. Deep in a
        # constant-value run the EWMA score decays geometrically through
        # every magnitude; its tiny values come from catastrophic
        # cancellation (r = x - s with s within an ulp of x), so their
        # low bits are evaluation-order-dependent and 6-dp rounding can
        # straddle a boundary between the two sides. At the 1e-4 CLAMP
        # boundary the absolute error is ~1e-14, so the clamp itself is
        # deterministic; tau = 3 is 4+ orders above, flags unaffected.
        score_r = (
            F.when(is_z & (warm | const_w), F.lit(None))
            .when(F.abs("score") < 1e-4, F.lit(0.0))
            .otherwise(F.round("score", 6))
        )
        # flag as INT (-1 = warmup null): NULL booleans canonicalize
        # differently (None vs NaN object cells) between Spark and DuckDB.
        # The flag is recomputed from the ROUNDED score: at |z| exactly on
        # the tau boundary the two sides' unrounded scores land on
        # opposite sides (integer-valued series make z = ±tau exactly
        # reachable), while the rounded scores are proven equal — so a
        # flag derived from them is deterministic on both. Constant
        # windows are provably |z| <= 1 < tau -> 0; the kernel's own
        # unrounded flag stays pytest-covered.
        anom_i = (
            F.when(is_z & warm, F.lit(-1))
            .when(is_z & const_w, F.lit(0))
            .otherwise((F.abs(F.round("score", 6)) >= 3.0).cast("int"))
        )
        return sc_df.select(
            "source",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            "detector",
            F.col("value").alias("value_d"),
            score_r.alias("score_r"),
            anom_i.alias("anom_i"),
        )

    def engine_zscore_1h(spark, sf_dir):
        return _scores_projection(
            flagship_scores(spark, sf_dir, tier="1h"), window=12
        )

    def engine_residual_stats(spark, sf_dir):
        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        tiers = build_all_tiers(seq, cfg)
        rs = residual_stats(gapfill(tiers["1h"], "1h", cfg), "1h", cfg)
        # NaN (empty-fold) -> NULL so the DuckDB twin's empty-set
        # aggregates compare equal; 6-dp rounding absorbs Welford-vs-SQL
        # float ordering
        def nn(c):
            return F.when(F.isnan(c), F.lit(None)).otherwise(F.round(c, 6))

        return rs.select(
            "source", "tier", "detector", "n",
            nn(F.col("mean")).alias("mean_r"),
            nn(F.col("var_pop")).alias("var_r"),
        )

    def engine_codec_blocks(spark, sf_dir):
        """C1+C2+C3 round trip of the gap-filled 1h tier. Raw doubles, no
        rounding: the Gorilla codec is lossless and every encoded metric
        is either an exact integer count or a single exact division, so
        the DuckDB oracle (spine + LOCF + 3-metric unpivot) matches
        bit-for-bit — the codec round trip itself sits on the oracle
        board."""
        from pyspark.sql import functions as F

        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        tiers = build_all_tiers(seq, cfg)
        filled = gapfill(tiers["1h"], "1h", cfg)
        blocks = compress_tier(filled, "1h", cfg)
        return decompress_blocks(blocks).select(
            "source", "tier", "metric",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            F.col("value").alias("value_d"),
        )

    def engine_codec_blocks_spans(spark, sf_dir):
        """Same C1+C2+C3 round trip as engine_codec_blocks but under the
        round-5 MULTI-DAY block spans (block_span_days=(("1h", 16),) —
        codec.block_start_col span floors, explicit base_us): spans change
        block framing, never content, so the IDENTICAL DuckDB oracle must
        match bit-for-bit. Puts the span layout itself on the value-exact
        board (size/parity contracts in tests/test_block_spans.py)."""
        from pyspark.sql import functions as F

        cfg = RollupConfig(block_span_days=(("1h", 16),))
        seq = sequences_from_documents(spark, sf_dir)
        tiers = build_all_tiers(seq, cfg)
        filled = gapfill(tiers["1h"], "1h", cfg)
        blocks = compress_tier(filled, "1h", cfg)
        return decompress_blocks(blocks).select(
            "source", "tier", "metric",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            F.col("value").alias("value_d"),
        )

    def ann_lsh(spark, sf_dir):
        """Promoted to oracle-twinned (round 3): the driver query runs the
        literal-plane fold variant (datapipe.ann_lsh_query) whose every
        arithmetic step DuckDB reproduces; the pandas-UDF matmul kernel
        (ann_lsh_topk) remains the at-scale path, covered by
        tests/test_datapipe.py determinism + recall tests."""
        from tsrollup.datapipe import ann_lsh_query

        return ann_lsh_query(spark, sf_dir)

    def mm_features2(spark, sf_dir):
        """Media-type dispatch across THREE registered decoders, two of
        them real pure-NumPy parsers (24-bit BMP, 16-bit PCM WAV) —
        datapipe.multimodal_features_mixed. Same fixed-precision string
        projection as mm_features for the rows-only hash."""
        from pyspark.sql import functions as F

        from tsrollup.datapipe import multimodal_features_mixed

        df = multimodal_features_mixed(spark, sf_dir)
        feat_str = F.concat_ws(
            ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
        )
        return df.select(
            "doc_id", "media_type", "n_bytes", "width", "height",
            feat_str.alias("feature_csv"),
        )

    def mm_thumbnails(spark, sf_dir):
        """Multimodal thumbnail pass (datapipe.multimodal_thumbnails):
        decode BMP payloads -> exact nearest-neighbor resize to 4x8 ->
        re-encode, binary in / binary out in ONE mapInPandas stage — the
        'resize' member of decode/feature/resize/frame-sample. Thumb
        bytes projected to hex for the rows-only hash (exact-integer
        kernel, stable run to run; byte-pinned in tests)."""
        from pyspark.sql import functions as F

        from tsrollup.datapipe import multimodal_thumbnails

        df = multimodal_thumbnails(spark, sf_dir)
        return df.select(
            "doc_id", "width", "height", "thumb_w", "thumb_h",
            F.hex("thumb").alias("thumb_hex"),
        )

    def mm_audio_resample(spark, sf_dir):
        """Multimodal audio resample pass (datapipe.
        multimodal_audio_resample): parse RIFF/WAV payloads -> EXACT
        int64 linear resample to 4 kHz -> re-encode, binary in / binary
        out in ONE mapInPandas stage — the audio member of the
        decode/feature/resize/frame-sample transform family. Bytes
        projected to hex for the rows-only hash (integer-exact kernel,
        stable run to run; parity vs a pure-python reference in
        tests/test_datapipe.py)."""
        from pyspark.sql import functions as F

        from tsrollup.datapipe import multimodal_audio_resample

        df = multimodal_audio_resample(spark, sf_dir, rate_out=4000)
        return df.select(
            "doc_id", "n_in", "rate_in", "n_out", "rate_out",
            F.hex("resampled").alias("resampled_hex"),
        )

    def mm_scene_cuts(spark, sf_dir):
        """Video scene-change detection (datapipe.video_scene_cuts):
        demux TSVR -> decode consecutive BMP frames -> exact integer
        |Δpixel| sums; cut verdict is the pure integer inequality
        100·diff ≥ n_px. Rows-only (binary fan-in); planted-scene
        semantics pinned in tests/test_datapipe.py."""
        from tsrollup.datapipe import video_scene_cuts

        return video_scene_cuts(spark, sf_dir)

    def mm_features(spark, sf_dir):
        # The driver canonicalizer sorts/hashes every column, and pandas
        # can't factorize list cells — project the feature array to a
        # fixed-precision string so the rows-only check is hashable.
        from pyspark.sql import functions as F

        df = multimodal_features(spark, sf_dir)
        feat_str = F.concat_ws(
            ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
        )
        return df.select(
            "doc_id", "media_type", "n_bytes", "width", "height",
            feat_str.alias("feature_csv"),
        )

    # ---- scratch-backed rows-only entries: streaming (T1/T3/T4/T5),
    # resume/lineage (S3), retention (R1). Each runs the real engine path
    # into a private scratch dir and returns a deterministic projection.
    import shutil

    # per-PID scratch root: two harness processes (e.g. pytest and
    # bench/oracle_check.py running concurrently) must not share a store
    # — dynamic-partition-overwrite commits rename out of a
    # .spark-staging dir inside the store, and a concurrent overwrite of
    # the same store deletes it mid-commit (observed as
    # FileNotFoundException on .spark-staging-*/tier=...).
    scratch_base = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", str(os.getpid())
    )

    # reap scratch roots left by exited processes so rounds don't
    # accumulate stores (live PIDs are left untouched). The liveness probe
    # alone can mistake a RECYCLED or other-user PID for a live builder
    # (PermissionError keeps the dir forever), so stale dirs are ALSO
    # age-gated: anything untouched for 12h is reaped regardless of PID.
    import time as _time

    _scratch_ttl_s = 12 * 3600
    for d in os.listdir(os.path.dirname(scratch_base)) if os.path.isdir(
        os.path.dirname(scratch_base)
    ) else []:
        if d.isdigit() and d != str(os.getpid()):
            p = os.path.join(os.path.dirname(scratch_base), d)
            try:
                stale = _time.time() - os.path.getmtime(p) > _scratch_ttl_s
            except OSError:
                stale = False
            try:
                os.kill(int(d), 0)
                if stale:
                    shutil.rmtree(p, ignore_errors=True)
            except ProcessLookupError:
                shutil.rmtree(p, ignore_errors=True)
            except PermissionError:
                if stale:
                    shutil.rmtree(p, ignore_errors=True)

    def _scratch(name: str) -> str:
        p = os.path.join(scratch_base, name)
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        return p

    def _seq_files(spark, sf_dir, base, n_files=4):
        """Sequence fixture written as n parquet files sliced in EVENT-TIME
        order with strictly increasing mtimes — the realistic streaming
        arrival layout (files land in time order). Consequences the
        streaming entries' DuckDB oracles rely on: the watermark advances
        monotonically across micro-batches, no row is ever late (zero
        watermark drops), and the emitted/finalized bucket set is exactly
        the SQL-expressible subset {bucket_end <= max(event_ts) - 10min}."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        seq = sequences_from_documents(spark, sf_dir)
        pdf = (
            seq.toPandas()
            .sort_values(["event_ts", "doc_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("tokens", pa.list_(pa.int32())),
                ("source", pa.string()),
                ("n_tok", pa.int32()),
                ("event_ts", pa.timestamp("us")),
            ]
        )
        tbl = pa.Table.from_pandas(
            pdf[[f.name for f in schema]], schema=schema, preserve_index=False
        )
        path = os.path.join(base, "seq")
        os.makedirs(path, exist_ok=True)
        step = (tbl.num_rows + n_files - 1) // n_files
        now = int(__import__("time").time())
        for i in range(n_files):
            f = os.path.join(path, f"part-{i:05d}.parquet")
            pq.write_table(tbl.slice(i * step, step), f)
            # pin mtimes ascending so the file stream source's
            # modification-time ordering equals event-time ordering
            os.utime(f, (now + i, now + i))
        return path

    def engine_streaming_rollup(spark, sf_dir):
        """T1+T3+T5: availableNow watermarked 1m rollup through the file
        sink, read back (finalized buckets only, append mode)."""
        from pyspark.sql import functions as F

        from tsrollup.streaming import run_streaming_rollup

        base = _scratch("streaming")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "rolled")
        run_streaming_rollup(
            spark, in_dir, out, os.path.join(base, "ckpt"), max_files_per_trigger=1
        )
        return spark.read.parquet(out).select(
            "source",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            "cnt", "n_tok_sum", "n_tok_min", "n_tok_max", "tok_sum", "tok_cnt",
        )

    def engine_streaming_ohlc(spark, sf_dir):
        """T13: streaming OHLC candles (streaming.streaming_ohlc_1m) —
        min_by/max_by struct-ordered open/close as watermarked algebraic
        partials, drained availableNow through the exactly-once file
        sink; finalized candles only (append mode). The DuckDB twin
        re-derives every candle with ordered-set first()/last() and the
        same watermark cut as the rollup twin."""
        from tsrollup.streaming import run_streaming_ohlc

        base = _scratch("streaming_ohlc")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "candles")
        run_streaming_ohlc(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            max_files_per_trigger=1,
        )
        return spark.read.parquet(out).select(
            "source",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            "open", "high", "low", "close", "n",
        )

    def engine_streaming_scores(spark, sf_dir):
        """Streamed per-bucket detectors (streaming.streaming_scores):
        the 1h tier is written as 3 time-ordered bucket-file slices and
        drained through the stateful applyInPandasWithState scorer —
        EWMA state carried at the SCAN_CHUNK grid cut plus the z-window
        tail, gaps LOCF-rebuilt in-kernel — then projected exactly like
        engine_zscore_1h. The STREAMED path therefore sits on the same
        independent DuckDB twin (recursive-CTE EWMA + constant-window-
        masked z); byte-parity with batch score_tier across micro-batch
        cuts is additionally pinned in tests/test_streaming.py."""
        import glob as _glob
        import shutil as _shutil

        from dataclasses import replace

        from tsrollup.streaming import run_streaming_scores

        cfg = RollupConfig()
        cfg = replace(cfg, detector=replace(cfg.detector, window=12))
        seq = sequences_from_documents(spark, sf_dir)
        tier = build_all_tiers(seq, cfg)["1h"]
        base = _scratch("streaming_scores")
        flat = os.path.join(base, "buckets")
        os.makedirs(flat, exist_ok=True)
        pdf = (
            tier.toPandas()
            .sort_values(["bucket_start", "source"], kind="mergesort")
            .reset_index(drop=True)
        )
        n = len(pdf)
        cuts = (0, n // 3, 2 * n // 3, n)
        for i in range(3):
            sl = os.path.join(base, f"slice-{i}")
            spark.createDataFrame(pdf.iloc[cuts[i]:cuts[i + 1]]).coalesce(
                1
            ).write.mode("overwrite").parquet(sl)
            (f,) = _glob.glob(os.path.join(sl, "*.parquet"))
            dst = os.path.join(flat, f"part-{i}.parquet")
            _shutil.copy(f, dst)
            # FileStreamSource orders by ms-truncated mtime: space slices
            # a second apart so micro-batches arrive in event-time order
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        out = os.path.join(base, "scored")
        run_streaming_scores(
            spark, flat, out, os.path.join(base, "ckpt"), "1h", cfg,
            max_files_per_trigger=1,
        )
        return _scores_projection(
            spark.read.parquet(out).drop("gap_filled"), window=12
        )

    def engine_spectral_residual(spark, sf_dir):
        """Spectral Residual saliency detector (Ren et al. KDD 2019;
        tsops.spectral_residual_scores) over the gap-filled 1h tier —
        the frequency-domain member of the detector family (windowless
        in the time domain; complementary to the forecast-residual
        detectors). ROWS-ONLY: an FFT has no ANSI-SQL expression; the
        kernel is pinned against an independent O(n^2) explicit-DFT
        reference plus planted-spike behavior in tests/test_tsops.py."""
        from tsrollup.tsops import spectral_residual_scores

        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        filled = gapfill(build_all_tiers(seq, cfg)["1h"], "1h", cfg)
        out = spectral_residual_scores(
            filled, ["source"], "bucket_start", "n_tok_mean"
        )
        return out.select(
            "source", F.unix_timestamp("bucket_start").alias("bucket_s"),
            "x", F.round("saliency", 6).alias("saliency_r"),
            F.round("score", 6).alias("score_r"), "is_anomaly",
        )

    def engine_matrix_profile(spark, sf_dir):
        """Matrix profile discords (STOMP recurrence, Zhu et al. ICDM
        2016; tsops.matrix_profile_scores) over the gap-filled 1h tier:
        per source, the z-normalized distance from each 24h window to
        its nearest non-trivial neighbor — the model-free anomaly lens
        where high values are DISCORDS (subsequences unlike anything
        else in the series). Emits each source's top-5 discord windows.
        ROWS-ONLY: float sqrt/argmin chains have no hash-twinnable SQL
        expression; the kernel is pinned against an explicit O(n^2 m)
        z-normalizing reference (exact index agreement) and the
        distributed blocked variant is parity-tested against it in
        tests/test_tsops.py."""
        from pyspark.sql import Window
        from tsrollup.tsops import matrix_profile_scores

        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        filled = gapfill(build_all_tiers(seq, cfg)["1h"], "1h", cfg)
        mp = matrix_profile_scores(
            filled, ["source"], "bucket_start", "n_tok_mean", m=24
        )
        w = Window.partitionBy("source").orderBy(
            F.desc("mp"), F.asc("bucket_start")
        )
        return (
            mp.where(F.col("mp").isNotNull() & ~F.isnan("mp"))
            .withColumn("rk", F.row_number().over(w))
            .where("rk <= 5")
            .select(
                "source", F.unix_timestamp("bucket_start").alias("bucket_s"),
                F.round("x", 6).alias("x_r"), F.round("mp", 6).alias("mp_r"),
                "mp_idx", "rk",
            )
        )

    def engine_streaming_token_hist(spark, sf_dir):
        """Tokens x streaming composition: exact per-(1m bucket, token)
        counts ON THE STREAM (streaming.streaming_token_hist_1m) —
        vocab-bounded mapInPandas bincount partials, then a watermarked
        windowed sum. The watermark attaches to the partials' floored
        bucket column, so the finalization threshold the oracle
        reproduces is date_trunc(minute, max event_ts) - 10min; emitted
        rows are FINAL exact counts equal to the batch histogram for
        those buckets."""
        from tsrollup.streaming import run_streaming_token_hist

        base = _scratch("streaming_tokhist")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "hist")
        run_streaming_token_hist(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            max_files_per_trigger=1,
        )
        return spark.read.parquet(out).select(
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            "token_id", "cnt",
        )

    def mm_video_frames(spark, sf_dir):
        """Multimodal frame sampling (datapipe.video_frame_features):
        deterministic TSVR videos (6 real BMP frames per doc), demuxed
        with byte-offset skip, every 2nd frame decoded through the
        registered BMP parser, ONE ROW PER SAMPLED FRAME. Rows-only:
        binary demux/decode has no SQL expression; frame-level parity is
        pytest-pinned (tests/test_datapipe.py)."""
        from tsrollup.datapipe import video_frame_features

        return video_frame_features(spark, sf_dir, stride=2, n_frames=6)

    def engine_streaming_silence(spark, sf_dir):
        """T9: dead-man silence detection ON THE STREAM
        (streaming.streaming_silence): one row per FINALIZED 1m bucket in
        which a previously-active source produced no events. Event-time
        timeouts make absence observable — the watermark advances on other
        sources' traffic and re-arms each group one bucket ahead, so a
        source going dark still emits rows. Emitted rows are final and
        equal the batch spine-anti-join below the same cut
        (bucket + 1m <= date_trunc(minute, max event_ts) - 10min), which
        is exactly what the oracle computes."""
        from tsrollup.streaming import run_streaming_silence

        base = _scratch("streaming_silence")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "silence")
        run_streaming_silence(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            tier="1m", max_files_per_trigger=1,
        )
        return spark.read.parquet(out).select(
            "source", F.unix_timestamp("bucket_start").alias("bucket_s")
        )

    def engine_token_movers(spark, sf_dir):
        """Token top-movers: per source, the 5 token ids whose counts
        changed most between the corpus's first and second time halves
        (split at the midpoint of the GLOBAL event-time range — a
        deterministic cut both engines re-derive). The curation signal
        behind 'what vocabulary is this source drifting toward':
        complements engine_token_drift's KL scalar with the WHICH.
        Rank on (|delta| DESC, token_id) — exact integers throughout."""
        from pyspark.sql import Window as W

        seq = sequences_from_documents(spark, sf_dir)
        # midpoint compare with NO division: 2*ts >= min+max is exact
        # integer arithmetic (a /2 would truncate in Spark's cast but
        # round in DuckDB's — a knife edge on odd sums)
        mid = seq.agg(
            (F.unix_micros(F.min("event_ts"))
             + F.unix_micros(F.max("event_ts"))).alias("m2")
        )
        tok = (
            seq.crossJoin(F.broadcast(mid))
            .select(
                "source",
                (F.unix_micros("event_ts") * 2 >= F.col("m2")).alias("h2"),
                F.explode("tokens").alias("token_id"),
            )
            .groupBy("source", "token_id")
            .agg(
                F.sum(F.when(~F.col("h2"), 1).otherwise(0)).alias("c1"),
                F.sum(F.when(F.col("h2"), 1).otherwise(0)).alias("c2"),
            )
        )
        d = tok.select(
            "source", "token_id", "c1", "c2",
            (F.col("c2") - F.col("c1")).alias("delta"),
        )
        wr = W.partitionBy("source").orderBy(
            F.abs(F.col("delta")).desc(), F.col("token_id").asc()
        )
        return (
            d.withColumn("rnk", F.row_number().over(wr))
            .where(F.col("rnk") <= 5)
            .select("source", "rnk", "token_id", "c1", "c2", "delta")
        )

    def engine_len_hist(spark, sf_dir):
        """Sequence-length histogram in power-of-two buckets per source —
        the padding/packing-efficiency profile (how much of each batch
        would be pad at a given max_len). Bucket = 2^ceil(log2(n_tok)),
        computed with integer bit arithmetic (no float log knife edges)."""
        seq = sequences_from_documents(spark, sf_dir)
        b = F.expr(_pow2_case("n_tok"))
        return (
            seq.select("source", b.alias("len_bucket"), "n_tok")
            .groupBy("source", "len_bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").cast("long").alias("tok_sum"),
            )
        )

    def engine_streaming_dedup(spark, sf_dir):
        """T10: exact payload dedup ON THE STREAM
        (streaming.streaming_dedup): dropDuplicates keyed on
        xxhash64(tokens) — one 8-byte state key per distinct payload,
        arrays never enter the state store. Exactly-once emission across
        micro-batches means the emitted set EQUALS batch DISTINCT, which
        is what the oracle computes (via the bit-exact xxh64_intlist
        macro)."""
        from tsrollup.streaming import run_streaming_dedup

        base = _scratch("streaming_dedup")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "dedup")
        run_streaming_dedup(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            max_files_per_trigger=1,
        )
        return spark.read.parquet(out).select("h", "n_tok")

    def engine_streaming_sessions(spark, sf_dir):
        """T11: session windows ON THE STREAM
        (streaming.streaming_sessions): per-source activity sessions
        (1h inactivity gap) merged across micro-batches in the state
        store — the moving-window-end stateful shape tumbling windows
        can't express. Boundary semantics pinned by test: touching
        windows coalesce, so the oracle's new-session predicate is
        ts - prev > gap; emitted sessions are those with
        end (= last event + gap) <= final watermark."""
        from tsrollup.streaming import run_streaming_sessions

        base = _scratch("streaming_sessions")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "sessions")
        run_streaming_sessions(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            gap="1 hour", max_files_per_trigger=1,
        )
        return spark.read.parquet(out).select(
            "source",
            F.unix_timestamp("session_start").alias("start_s"),
            F.unix_timestamp("session_end").alias("end_s"),
            "n_events", "n_tok_sum",
        )

    def engine_streaming_join(spark, sf_dir):
        """T6: stream-static BROADCAST join (sequence stream enriched with
        a deterministic source->region dim) feeding a watermarked 1m
        window agg per region, through the exactly-once file sink.
        Twinned: the oracle re-derives the same region assignment from
        the same bytes (xxh64 macro) and the same watermark cut."""
        from pyspark.sql import functions as F

        from tsrollup.streaming import run_streaming_enriched

        base = _scratch("streaming_join")
        in_dir = _seq_files(spark, sf_dir, base)
        dim = (
            spark.read.parquet(in_dir)
            .select("source")
            .distinct()
            .select(
                "source",
                F.concat(
                    F.lit("r"), F.pmod(F.xxhash64("source"), F.lit(3)).cast("string")
                ).alias("region"),
            )
        )
        out = os.path.join(base, "enriched")
        run_streaming_enriched(
            spark, in_dir, dim, out, os.path.join(base, "ckpt"),
            max_files_per_trigger=2,
        )
        return spark.read.parquet(out).select(
            "region",
            F.unix_timestamp("bucket_start").alias("bucket_s"),
            "cnt",
            "n_tok_sum",
        )

    def engine_streaming_welford(spark, sf_dir):
        """T4+T5: stateful per-source Welford via applyInPandasWithState,
        idempotent overwrite-by-batch sink; returns the last batch's
        running stats (rounded: update-order across executors is pinned
        per batch, values verified byte-exact in tests/)."""
        from pyspark.sql import functions as F

        from tsrollup.streaming import run_streaming_welford

        from pyspark.sql import Window as Wd

        base = _scratch("welford")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "stats")
        run_streaming_welford(
            spark, in_dir, out, os.path.join(base, "ckpt"), max_files_per_trigger=2
        )
        # each source's LAST emission (update mode re-emits only sources
        # present in a batch) folds ALL of its rows — so the per-source
        # latest rows equal whole-input Welford finals, which is exactly
        # what the DuckDB twin aggregates (PROMOTED to oracle-twinned)
        all_b = spark.read.parquet(out)  # batch_id= partition discovery
        w = Wd.partitionBy("source").orderBy(F.col("batch_id").desc())
        last = all_b.withColumn("rk", F.row_number().over(w)).where("rk = 1")
        return last.select(
            "source", "n", F.round("mean", 6).alias("mean_r"),
            F.round("var_pop", 6).alias("var_r"),
        )

    def engine_resume_ledger(spark, sf_dir):
        """S3/J4: two incremental rollup_build runs over a growing input;
        returns the per-unit lineage ledger (deterministic columns)."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import rollup_build
        from tsrollup.resume import read_ledger

        base = _scratch("resume")
        in_dir = _seq_files(spark, sf_dir, base)
        seq = spark.read.parquet(in_dir)
        day0 = seq.agg(F.min(F.to_date("event_ts"))).collect()[0][0]
        first = seq.where(F.to_date("event_ts") <= F.lit(day0))
        first_path = os.path.join(base, "first")
        first.write.mode("overwrite").parquet(first_path)
        out = os.path.join(base, "store")
        cfg = RollupConfig()
        rollup_build(spark, first_path, out, cfg, run_id="r1", derived=False)
        rollup_build(spark, in_dir, out, cfg, run_id="r2", derived=False)
        return (
            read_ledger(spark, out)
            .select("unit_id", "input_rows", "token_checksum",
                    "out_rows_1m", "out_rows_1h", "out_rows_1d")
        )

    def engine_time_travel(spark, sf_dir):
        """S6: snapshot time travel (resume.read_rollup_asof) — ledger
        seqs are snapshot ids: build day-0 only (commit seq 1), then the
        full input incrementally (seq 2), and read the store AS OF seq 1.
        The twin recomputes the 1m rollup from ONLY the day-0 sequences:
        a green hash proves the as-of read reconstructs the historical
        snapshot exactly (membership via ledger, not directory listing).
        The strict rewritten-after-snapshot guard is pytest-covered."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.resume import read_rollup_asof

        base = _scratch("time_travel")
        in_dir = _seq_files(spark, sf_dir, base)
        seq = spark.read.parquet(in_dir)
        day0 = seq.agg(F.min(F.to_date("event_ts"))).collect()[0][0]
        first_path = os.path.join(base, "first")
        seq.where(F.to_date("event_ts") <= F.lit(day0)).write.mode(
            "overwrite"
        ).parquet(first_path)
        out = os.path.join(base, "store")
        cfg = RollupConfig()
        rollup_build(spark, first_path, out, cfg, run_id="r1", derived=False)
        rollup_build(spark, in_dir, out, cfg, run_id="r2", derived=False)
        return (
            read_rollup_asof(spark, out, ROLLUP_DIR, seq=1)
            .where(F.col("tier") == "1m")
            .select(
                "source",
                F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "tok_sum",
            )
        )

    def engine_backfill(spark, sf_dir):
        """S8: late-data backfill — the tombstone → re-roll lifecycle
        end-to-end ON THE BOARD (tests pin it byte-exact; this makes it
        an oracle row): build a store from an input missing one
        source's max-day rows (late data not yet arrived), then the
        late rows land, the affected units are invalidated, and a
        rebuild re-rolls ONLY those units (commit seq supersedes the
        tombstone). The twin recomputes the 1m rollup from the FULL
        sequences: green = the backfilled store equals a never-late
        build exactly."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.resume import invalidate_units
        from tsrollup.storage import n_source_buckets

        base = _scratch("backfill")
        in_dir = _seq_files(spark, sf_dir, base)
        seq = spark.read.parquet(in_dir)
        # the "late" slice: src0's rows on the corpus max day
        mx = seq.agg(F.max(F.to_date("event_ts"))).collect()[0][0]
        late_pred = (F.col("source") == "src0") & (
            F.to_date("event_ts") == F.lit(mx)
        )
        early_path = os.path.join(base, "early")
        seq.where(~late_pred).write.mode("overwrite").parquet(early_path)
        out = os.path.join(base, "store")
        cfg = RollupConfig()
        rollup_build(spark, early_path, out, cfg, run_id="r1", derived=False)
        # late data arrives -> tombstone the affected unit, rebuild on full
        bucket = seq.where(late_pred).select(
            F.pmod(F.xxhash64("source"), F.lit(n_source_buckets()))
            .cast("int").alias("b")
        ).limit(1).collect()[0]["b"]
        invalidate_units(out, [f"{bucket}/{mx.isoformat()}"])
        rollup_build(spark, in_dir, out, cfg, run_id="r2", derived=False)
        return (
            spark.read.parquet(os.path.join(out, ROLLUP_DIR))
            .where(F.col("tier") == "1m")
            .select(
                "source",
                F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "tok_sum",
            )
        )

    def engine_freshness(spark, sf_dir):
        """OPS1: ingestion freshness/lag report — the on-call view of a
        live store: per source, row count, newest event (epoch s), lag
        behind the corpus max ("now" — the deterministic --now-day
        discipline), trailing-hour row count, and a stale verdict as an
        exact integer-seconds inequality (lag > 600 s). One hash agg +
        a 1-row broadcast "now"; all integers."""
        from pyspark.sql import functions as F

        seq = sequences_from_documents(spark, sf_dir)
        e = seq.select(
            "source", F.unix_timestamp("event_ts").alias("s")
        )
        now = e.agg(F.max("s").alias("now_s"))
        return (
            e.crossJoin(F.broadcast(now))
            .groupBy("source", "now_s")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.max("s").alias("max_event_s"),
                F.count_if(F.col("s") > F.col("now_s") - 3600).alias("rows_1h"),
            )
            .select(
                "source", "n_rows", "max_event_s",
                (F.col("now_s") - F.col("max_event_s")).alias("lag_s"),
                "rows_1h",
                (F.col("now_s") - F.col("max_event_s") > 600).alias("is_stale"),
            )
        )

    def engine_schema_evolution(spark, sf_dir):
        """S7: widen-only schema evolution (storage.read_sink_merged) —
        build a store, then a "later pipeline version" rewrites the
        NEWEST 1m day-leaf with an added pipeline_ver column (the
        add-a-field lifecycle every long-lived table hits). A plain read
        would silently drop the new column; the merged read unions
        footers so old leaves surface it as NULL. The twin recomputes
        the 1m rollup tagging rows of the max day with ver 2 and the
        rest NULL — value-exact proof that evolution changed the SCHEMA
        and nothing else."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.storage import read_sink_merged

        base = _scratch("schema_evo")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        rollup_path = os.path.join(out, ROLLUP_DIR)
        tier_dir = os.path.join(rollup_path, "tier=1m")
        max_day = sorted(
            d.split("=")[1] for d in os.listdir(tier_dir) if d.startswith("day=")
        )[-1]
        # later-version rewrite of that day's leaves: same rows + new col
        day_dir = os.path.join(tier_dir, f"day={max_day}")
        evolved = spark.read.parquet(day_dir).withColumn(
            "pipeline_ver", F.lit(2)
        )
        tmp = os.path.join(base, "evolved_day")
        # preserve the store's leaf layout (…/day=D/source_bucket=N/)
        evolved.write.mode("overwrite").partitionBy("source_bucket").parquet(tmp)
        import shutil

        shutil.rmtree(day_dir)
        os.rename(tmp, day_dir)
        return (
            read_sink_merged(spark, out, ROLLUP_DIR)
            .where(F.col("tier") == "1m")
            .select(
                "source",
                F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "tok_sum", "pipeline_ver",
            )
        )

    def engine_retention(spark, sf_dir):
        """R1: build a store, expire the oldest 1m day, return the
        surviving (tier, day) partition inventory."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.storage import drop_expired_partitions

        base = _scratch("retention")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        rollup_path = os.path.join(out, ROLLUP_DIR)
        tier_dir = os.path.join(rollup_path, "tier=1m")
        days = sorted(d.split("=")[1] for d in os.listdir(tier_dir) if d.startswith("day="))
        import datetime as dt

        span = (dt.date.fromisoformat(days[-1]) - dt.date.fromisoformat(days[0])).days
        removed = drop_expired_partitions(rollup_path, "1m", max(span - 1, 1), days[-1])
        assert removed or span <= 1, "retention should prune the oldest day"
        return (
            spark.read.parquet(rollup_path)
            .groupBy("tier", "day")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select("tier", F.col("day").cast("string").alias("day_s"), "n_rows")
        )

    def engine_targeted_delete(spark, sf_dir):
        """R2: targeted row deletion (storage.targeted_delete) — build a
        store, purge two sources from the 1m rollup sink with the
        verify-then-atomic-swap contract (rows_after == rows_before -
        matched per leaf; only AFFECTED leaves rewritten), and return
        the surviving 1m rows. The twin recomputes the whole 1m rollup
        from the sequences EXCLUDING those sources — a green hash proves
        the purge removed exactly the targeted rows and disturbed
        nothing else."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.storage import targeted_delete

        base = _scratch("targeted_delete")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        rollup_path = os.path.join(out, ROLLUP_DIR)
        done = targeted_delete(
            spark, out, ROLLUP_DIR, "source IN ('src0', 'src5')"
        )
        assert done, "the purge must touch at least one leaf"
        assert all(d["rows_after"] == d["rows_before"] - d["deleted"]
                   for d in done)
        return (
            spark.read.parquet(rollup_path)
            .where(F.col("tier") == "1m")
            .select(
                "source",
                F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "tok_sum",
            )
        )

    def engine_vacuum(spark, sf_dir):
        """S5: store vacuum + crash recovery (storage.vacuum_store) —
        build a store, then plant all three crash-leftover classes the
        swap-based maintenance ops can leave: a completed-swap orphan
        (.__compact_old beside a live leaf), a CRASHED swap (a leaf
        renamed away to .__delete_old — the store is serving a hole),
        and a stale .__compact_tmp. Vacuum must remove the garbage and
        RESTORE the missing leaf. The twin recomputes the full 1m rollup
        from the sequences: a green hash proves the restored store
        serves exactly the pre-crash rows — recovery, not just GC."""
        import shutil

        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.storage import vacuum_store

        base = _scratch("vacuum")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        rollup_path = os.path.join(out, ROLLUP_DIR)
        leaves = sorted(
            root
            for root, _d, files in os.walk(rollup_path)
            if any(f.endswith(".parquet") for f in files)
        )
        assert len(leaves) >= 3, f"fixture too small: {len(leaves)} leaves"
        p0, l0 = os.path.split(leaves[0])
        shutil.copytree(leaves[0], os.path.join(p0, f".{l0}.__compact_old"))
        p1, l1 = os.path.split(leaves[1])
        os.rename(leaves[1], os.path.join(p1, f".{l1}.__delete_old"))
        p2, l2 = os.path.split(leaves[2])
        shutil.copytree(leaves[2], os.path.join(p2, f".{l2}.__compact_tmp"))

        done = vacuum_store(out, ROLLUP_DIR)
        acts = sorted(d["action"] for d in done)
        assert acts == ["removed", "removed", "restored"], acts
        assert not any(
            d.startswith(".")
            for root, dirs, _f in os.walk(rollup_path)
            for d in dirs
        )
        return (
            spark.read.parquet(rollup_path)
            .where(F.col("tier") == "1m")
            .select(
                "source",
                F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "tok_sum",
            )
        )

    def engine_compaction(spark, sf_dir):
        """S4: small-file compaction (storage.compact_store) — build a
        store, FRAGMENT the rollup sink (rewrite with a row-hash
        repartition so every leaf gets many slivers, the shape a
        long-append history leaves), compact back to 1 file per leaf
        with verify-then-atomic-swap, assert every leaf is single-file,
        and publish the per-(tier, day) inventory + event totals. A green
        twin proves compaction changed the FILE layout and nothing
        else."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.storage import compact_store

        base = _scratch("compaction")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        rollup_path = os.path.join(out, ROLLUP_DIR)
        frag_path = os.path.join(out, "rollup_frag")
        rolled = spark.read.parquet(rollup_path)
        (
            rolled.repartition(8, F.xxhash64("source", "bucket_start"))
            .write.mode("overwrite")
            .partitionBy("tier", "day")
            .parquet(frag_path)
        )
        done = compact_store(spark, out, "rollup_frag", target_files=1)
        assert done, "fragmented store must have compactable leaves"
        for root, _dirs, files in os.walk(frag_path):
            pq = [f for f in files if f.endswith(".parquet")]
            assert len(pq) <= 1, f"leaf {root} still fragmented"
        return (
            spark.read.parquet(frag_path)
            .groupBy("tier", "day")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cnt").cast("long").alias("ev_sum"),
            )
            .select(
                "tier", F.col("day").cast("string").alias("day_s"),
                "n_rows", "ev_sum",
            )
        )

    def engine_read_range(spark, sf_dir):
        """Read-side planner (query.py): build a store, then read one day
        back at 1h resolution through choose_tier + read_range (partition
        pruning verified in tests/test_query.py; here the planner's row
        output goes on the correctness board)."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import ROLLUP_DIR, rollup_build
        from tsrollup.query import read_range

        base = _scratch("readrange")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig(), derived=False)
        days = sorted(
            r["day"].isoformat()
            for r in spark.read.parquet(os.path.join(out, ROLLUP_DIR))
            .where("tier='1h'").select("day").distinct().collect()
        )
        rr = read_range(
            spark, out,
            f"{days[-1]}T00:00:00", f"{days[-1]}T23:59:59", resolution_s=3600,
        )
        return rr.select(
            "source", F.unix_timestamp("bucket_start").alias("bucket_s"),
            "tier", "cnt", "n_tok_sum", "tok_sum", "tok_cnt",
        )

    def engine_read_decoded(spark, sf_dir):
        """Cold-read path (query.read_range_decoded): build a derived
        store, then serve one day of the 1h tier from the Gorilla BLOCK
        table — partition-pruned blob read + Arrow-batched decode. Rows
        byte-match the gap-filled tier (tests/test_query.py); here the
        decoded points go on the correctness board."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import BLOCKS_DIR, rollup_build
        from tsrollup.query import read_range_decoded

        base = _scratch("readdecoded")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "store")
        rollup_build(spark, in_dir, out, RollupConfig())
        days = sorted(
            r["day"].isoformat()
            for r in spark.read.parquet(os.path.join(out, BLOCKS_DIR))
            .where("tier='1h'").select("day").distinct().collect()
        )
        dec = read_range_decoded(
            spark, out,
            f"{days[-1]}T00:00:00", f"{days[-1]}T23:59:59",
            metric="n_tok_mean", resolution_s=3600,
        )
        # raw doubles, no rounding: the Gorilla round-trip is lossless and
        # the gap-filled mean is a single exact division, so the DuckDB
        # oracle reproduces the bits exactly
        return dec.select(
            "source", F.unix_timestamp("bucket_start").alias("bucket_s"),
            "tier", "metric", F.col("value").alias("value_d"),
        )

    def engine_incremental_derive(spark, sf_dir):
        """Exactly-incremental derive (increment.py): build a store in two
        day-split batches (second batch resumes from the per-(source, tier)
        state checkpoint), return the final scores table — byte-identical
        to a single-shot build (tests/test_increment.py)."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.pipeline import SCORES_DIR, rollup_build

        base = _scratch("incderive")
        in_dir = _seq_files(spark, sf_dir, base)
        seq = spark.read.parquet(in_dir)
        last_day = seq.agg(F.max(F.to_date("event_ts"))).collect()[0][0]
        b1 = os.path.join(base, "b1")
        b2 = os.path.join(base, "b2")
        seq.where(F.to_date("event_ts") < F.lit(last_day)).write.parquet(b1)
        seq.where(F.to_date("event_ts") >= F.lit(last_day)).write.parquet(b2)
        out = os.path.join(base, "store")
        cfg = RollupConfig()
        rollup_build(spark, b1, out, cfg)
        s2 = rollup_build(spark, b2, out, cfg)
        assert "derive_inc" in s2["phases"], s2["phases"]
        sc = spark.read.parquet(os.path.join(out, SCORES_DIR))
        # same oracle-ready projection as engine_zscore_1h, at the
        # pipeline's default window (PROMOTED to oracle-twinned: the
        # two-batch incremental store is byte-identical to single-shot,
        # and single-shot is what the DuckDB twin recomputes)
        return _scores_projection(
            sc.where("tier = '1h'"), window=cfg.detector.window
        )

    def engine_streamed_ingest(spark, sf_dir):
        """T+ — full streaming loop: watermarked drain of finalized 1m
        buckets -> store commit -> exact re-cascade of affected 1h/1d ->
        derived phase. Returns the store's 1h tier (deterministic: the
        drained-finalized subset is a pure function of the input)."""
        from pyspark.sql import functions as F

        from tsrollup.config import RollupConfig
        from tsrollup.ingest import ingest_streamed_rollup
        from tsrollup.pipeline import ROLLUP_DIR
        from tsrollup.streaming import run_streaming_rollup

        base = _scratch("streamingest")
        in_dir = _seq_files(spark, sf_dir, base)
        sink = os.path.join(base, "sink")
        store = os.path.join(base, "store")
        run_streaming_rollup(spark, in_dir, sink, os.path.join(base, "ckpt"))
        ingest_streamed_rollup(spark, sink, store, RollupConfig())
        return (
            spark.read.parquet(os.path.join(store, ROLLUP_DIR))
            .where("tier = '1h'")
            .select(
                "source", F.unix_timestamp("bucket_start").alias("bucket_s"),
                "cnt", "n_tok_sum", "n_tok_min", "n_tok_max", "tok_sum", "tok_cnt",
            )
        )

    def engine_token_hist(spark, sf_dir):
        """Corpus top-20 token ids by exact count (tokenstats.top_tokens):
        mapInPandas bincount partials bounded by vocab size — the
        explode-free scale path — then one vocab-sized hash agg and a
        TakeOrdered. Counts are exact BIGINTs; ties break on token_id, so
        the set is deterministic and the DuckDB unnest twin matches
        bit-exactly."""
        from tsrollup.tokenstats import top_tokens

        return top_tokens(sequences_from_documents(spark, sf_dir), 20)

    def engine_token_profile(spark, sf_dir):
        """Per-source token-distribution profile (tokenstats.
        source_token_profile): vocab coverage, total tokens, Shannon
        entropy in nats from the exact (source, token_id, cnt) histogram.
        Entropy is one closed-form reduction over exact integers — 6-dp
        rounding absorbs the last-ulp summation-order difference vs the
        SQL twin."""
        from tsrollup.tokenstats import source_token_profile

        prof = source_token_profile(sequences_from_documents(spark, sf_dir))
        return prof.select(
            "source", "n_distinct", "tok_total",
            F.round("entropy", 6).alias("entropy_r"),
        )

    def tx_bigram_lift(spark, sf_dir):
        """Token-bigram association mining: lift (pointwise mutual
        information before the log) for every adjacent token pair with
        cxy >= 5 — lift = P(x,y)/(P(x)P(y)) = cxy*Nu^2/(Nb*cx*cy), exact
        BIGINT counts with ONE float expression both engines evaluate
        identically (rounded 6dp; ordering ties break on x,y so the
        top-50 selection is deterministic). Bigrams explode as JVM
        struct pairs straight into a hash agg (no token-position window,
        no self-join); unigram counts come from the explode-free
        bincount histogram and broadcast into the bigram table; the two
        corpus scalars ride a 1-row broadcast cross join. Collocation
        extraction is the standard phrase/tokenizer-audit signal over a
        pre-tokenized corpus."""
        from tsrollup.tokenstats import token_histogram

        seq = sequences_from_documents(spark, sf_dir)
        uni = token_histogram(seq).localCheckpoint()
        nu = uni.agg(F.sum("cnt").cast("long").alias("nu"))
        pairs = (
            seq.where(F.size("tokens") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(tokens)-1),"
                        " i -> struct(tokens[i-1] AS x, tokens[i] AS y))"
                    )
                ).alias("p")
            )
            .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        )
        bc = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
        nb = bc.agg(F.sum("cxy").cast("long").alias("nb"))
        j = (
            bc.where(F.col("cxy") >= 5)
            .join(F.broadcast(uni.select(F.col("token_id").alias("x"),
                                         F.col("cnt").alias("cx"))), "x")
            .join(F.broadcast(uni.select(F.col("token_id").alias("y"),
                                         F.col("cnt").alias("cy"))), "y")
            .crossJoin(F.broadcast(nu))
            .crossJoin(F.broadcast(nb))
        )
        lifted = j.select(
            F.col("x").cast("int").alias("x"),
            F.col("y").cast("int").alias("y"),
            "cxy", "cx", "cy",
            F.expr(
                "round((CAST(cxy AS DOUBLE) * nu * nu) / (CAST(nb AS DOUBLE) * cx * cy), 6)"
            ).alias("lift_r"),
        )
        return lifted.orderBy(F.desc("lift_r"), "x", "y").limit(50)

    def engine_token_drift(spark, sf_dir):
        """Per-(source, day) token-distribution drift vs the whole
        corpus that day (tokenstats.token_drift): exact KL divergence
        assembled the bigram-LM way — each token's c*ln((c*M)/(N*C))
        term is ONE float division of exact BIGINT products, rounded to
        integer micro-nats BEFORE the cross-token sum, so the aggregate
        is an order-free BIGINT and the published kl_nats is a single
        exact-integer division. The time x token signature signal: a
        source whose token mix shifts away from the day's corpus flags
        scraper drift or template floods before volume moves."""
        from tsrollup.tokenstats import token_drift

        out = token_drift(sequences_from_documents(spark, sf_dir))
        return out.select(
            "source",
            F.unix_timestamp("bucket").alias("bucket_s"),
            "n_tok", "n_distinct", "kl_unats", "kl_nats",
        )

    def engine_seq_dedup(spark, sf_dir):
        """Exact sequence-level dedup on the TOKEN PAYLOAD: group by
        xxhash64(tokens) (Catalyst's int-fold over the array — one
        JVM-side hash per row, the token arrays themselves never
        shuffle), keep the min doc_id, count members — the keeper table
        a dedup pass writes (the fixture has no exact token dups, so
        every group has size 1 and the entry's value is that ALL ~10k
        per-row hash folds must match). The DuckDB twin
        re-evaluates the same fold via the xxh64_intlist macro, so hash
        values — not just group shapes — must match bit-for-bit."""
        return (
            sequences_from_documents(spark, sf_dir)
            .groupBy(F.xxhash64("tokens").alias("tok_hash"))
            .agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.min("doc_id").alias("keeper_doc_id"),
            )
        )

    def engine_seq_pack(spark, sf_dir):
        """Sequence packing (packing.pack_sequences): each source's
        token stream — ordered by (event_ts, doc_id), a total order — is
        concatenated and split into 512-token training chunks in one
        applyInPandas kernel per source. The entry publishes each chunk's
        xxhash64 (Catalyst's int-fold over the array), so the twin proves
        the packed streams are BIT-identical: the DuckDB oracle rebuilds
        the same flatten+slice in SQL (list ORDER BY + flatten + array
        slicing) and re-evaluates the same hash fold via xxh64_intlist."""
        from tsrollup.packing import pack_sequences

        packed = pack_sequences(
            sequences_from_documents(spark, sf_dir), max_len=512
        )
        return packed.select(
            "source", "chunk_id", "n_tok", "n_docs",
            F.xxhash64("tokens").alias("tok_hash"),
        )

    def engine_seq_chunk(spark, sf_dir):
        """Context-window chunking with overlap
        (packing.chunk_sequences): per-document 32-token windows every
        24 tokens (8-token halo) — the document-local batching
        transform (packing crosses doc boundaries; this never does).
        Embarrassingly parallel: one bounded sequence-explode + JVM
        slice, NO shuffle, no Python. The entry publishes each chunk's
        xxhash64 int-fold, so the twin proves every chunk's token
        window is BIT-identical to the oracle's list slice."""
        from tsrollup.packing import chunk_sequences

        out = chunk_sequences(
            sequences_from_documents(spark, sf_dir), max_len=32, stride=24
        )
        return out.select(
            "doc_id", "chunk_id", "start", "chunk_len",
            F.xxhash64("chunk").alias("tok_hash"),
        )

    def engine_token_heavy(spark, sf_dir):
        """Distributed heavy hitters over the token payload
        (sketches.heavy_hitters): per-partition Misra-Gries summaries
        (budget 40) generate a guaranteed-superset candidate list, a
        broadcast-semi-join recount makes the surviving counts EXACT, so
        the frequent set above N/(k+1) is oracle-twinnable even though a
        sketch drives the scan."""
        from tsrollup.sketches import heavy_hitters

        seq = sequences_from_documents(spark, sf_dir)
        return heavy_hitters(seq, "tokens", k=40, flatten_arrays=True).select(
            F.col("item").alias("token_id"), "cnt"
        )

    def mx_split(spark, sf_dir):
        """Deterministic train/val/test assignment (mixing.hash_split):
        bucket = pmod(xxhash64("<doc_id>#seed"), 10k) — a stateless
        filterable column, stable under corpus growth. Row-level twin:
        every doc's assignment must match the oracle's re-evaluation of
        the same hash."""
        from tsrollup.mixing import hash_split

        d = _read_table(spark, sf_dir, "documents")
        return hash_split(d, "doc_id", 500, 500, seed=0).select("doc_id", "split")

    def mx_sample(spark, sf_dir):
        """Per-source mixture sampling (mixing.stratified_sample):
        broadcast rates table, hash-range membership — reproducible and
        row-auditable, which is exactly what lets the oracle verify
        membership doc-by-doc."""
        from tsrollup.mixing import stratified_sample

        d = _read_table(spark, sf_dir, "documents")
        return stratified_sample(
            d, {"src0": 5000, "src5": 2500}, "source", "doc_id",
            default_per10k=1000, seed=1,
        ).select("doc_id", "source")

    def mx_shuffle(spark, sf_dir):
        """Epoch-keyed deterministic global shuffle (mixing.shuffle_rank):
        rank = row_number over (xxhash64("<doc_id>#epoch"), doc_id). The
        twin proves the whole permutation, not just membership."""
        from tsrollup.mixing import shuffle_rank

        d = _read_table(spark, sf_dir, "documents")
        return shuffle_rank(d, "doc_id", epoch=2).select("doc_id", "shuffle_rank")

    def mx_reservoir(spark, sf_dir):
        """Deterministic per-source UNIFORM k-sample (mixing.
        reservoir_topk) — weighted_sample_topk's uniform sibling for
        eval-set / human-review draws: rank by (xxhash64(id#seed), id)
        within each source, keep 5. The twin re-derives every rank, so
        the whole draw — not just membership — is value-checked."""
        from tsrollup.mixing import reservoir_topk

        d = _read_table(spark, sf_dir, "documents")
        return reservoir_topk(d, "source", "doc_id", k=5, seed=7).select(
            "source", "doc_id", "rnk"
        )

    def mx_weighted(spark, sf_dir):
        """Weighted sampling without replacement, top-5 per source
        (mixing.weighted_sample_topk, Efraimidis-Spirakis): rank by
        ln(u)/w with u hash-derived and w = n_chars — longer docs win
        proportionally more often, and the oracle re-derives the exact
        keys from the same bytes (rank on the rounded key, doc-id
        tiebreak, so ln() last-ulp drift can't flip an order)."""
        from tsrollup.mixing import weighted_sample_topk

        d = _read_table(spark, sf_dir, "documents")
        return weighted_sample_topk(d, "n_chars", k=5, seed=3).select(
            "source", "doc_id", "es_key", "rnk"
        )

    def mx_quota(spark, sf_dir):
        """EXACT-SIZE stratified sample (mixing.quota_sample): exactly
        100 docs, allocated per source by largest-remainder rounding of
        the proportional quota, drawn within each stratum by the
        reservoir hash rank. Both layers — the integer allocation AND
        every rank — are re-derived by the oracle, so the twin proves
        the budget arithmetic, not just membership."""
        from tsrollup.mixing import quota_sample

        d = _read_table(spark, sf_dir, "documents")
        return quota_sample(d, 100, "source", "doc_id", seed=9).select(
            "source", "doc_id", "alloc", "rnk"
        )

    def dd_substring(spark, sf_dir):
        """Substring-level exact dedup, the Lee-et-al-2022 duplicated-span
        family (datapipe.substring_duplication): every 8-token window of
        the token payload gets a rolling xxhash64 fingerprint; windows
        whose fingerprint occurs in >= 2 distinct docs are duplicated,
        and the per-doc rate is the union-coverage of those windows —
        all exact BIGINTs. The DuckDB twin groups windows by CONTENT
        (the token slice itself), so the entry cross-checks the
        fingerprint semantics against literal window equality — a hash
        collision or slice-offset drift would hash-mismatch."""
        from tsrollup.datapipe import substring_duplication

        return substring_duplication(sequences_from_documents(spark, sf_dir), k=8)

    def dd_substring_removal(spark, sf_dir):
        """Span-removal transform (datapipe.substring_span_removal):
        keeper = corpus-min (doc_id, pos) occurrence per duplicated
        8-token window; every other occurrence's positions are dropped.
        Publishes xxhash64 of each kept array so the twin proves the
        REWRITTEN token payloads are bit-identical, not just counts —
        the same fold the seq-dedup/pack twins pin via xxh64_intlist."""
        from tsrollup.datapipe import substring_span_removal

        out = substring_span_removal(sequences_from_documents(spark, sf_dir), k=8)
        return out.select(
            "doc_id", "n_tok", "n_kept",
            F.xxhash64("tokens_kept").alias("kept_hash"),
        )

    def dd_cdc_chunks(spark, sf_dir):
        """Content-defined chunking dedup estimate
        (datapipe.cdc_chunk_stats): chunk boundaries where the rolling
        4-token xxhash64 fingerprint is 0 mod 64 (offset-shift-immune,
        unlike fixed blocks), chunk identity = xxhash64 of the chunk's
        token slice — the same fold engine_seq_dedup pins bit-for-bit
        against the xxh64_intlist macro, so the twin re-derives every
        boundary AND every chunk hash exactly. One summary row per
        source with the chunk-level storage-dedup ratio."""
        from tsrollup.datapipe import cdc_chunk_stats

        return cdc_chunk_stats(
            sequences_from_documents(spark, sf_dir), window=4, mask=64
        )

    def tx_bloom_decontam(spark, sf_dir):
        """Broadcast-Bloom decontamination (datapipe.bloom_decontaminate)
        — the scale path of tx_decontam: the benchmark side folds into a
        65536-bit Bloom filter (k=3, Kirsch-Mitzenmacher double hashing
        over ONE xxhash64), shipped as an array<bigint> literal; corpus
        3-grams are membership-tested JVM-side in the scan stage and
        only Bloom-positive grams reach the exact verify join. The twin
        rebuilds the identical filter as a bit-position SET from
        xxh64u(gram), so candidates — false positives INCLUDED — and the
        exactly-verified hit counts both match bit-for-bit."""
        from tsrollup.datapipe import bloom_decontaminate

        docs = _read_table(spark, sf_dir, "documents")
        return bloom_decontaminate(
            docs.where(F.col("doc_id") % 37 != 0),
            docs.where(F.col("doc_id") % 37 == 0),
            "doc_id", "text", n=3, m_bits=65536, k=3, min_candidates=1,
        )

    def engine_streaming_pair_join(spark, sf_dir):
        """T12: watermarked STREAM-STREAM inner join (streaming.
        streaming_pair_join) — co-occurrence pairs of two live halves of
        the sequence stream (doc-hash parity split) within ±1 h on the
        same source, drained availableNow through the exactly-once file
        sink. The time-interval join condition is what lets Spark's
        state store evict matched-out rows (a buffered row drops only
        once the watermark passes row_ts + tolerance — state bounded,
        never the whole stream); with in-order arrival no match can be
        lost at ANY tolerance, so the drained output equals the batch
        range-join the oracle runs."""
        from pyspark.sql import functions as F

        from tsrollup.streaming import run_streaming_pair_join

        base = _scratch("streaming_pairjoin")
        in_dir = _seq_files(spark, sf_dir, base)
        out = os.path.join(base, "pairs")
        run_streaming_pair_join(
            spark, in_dir, out, os.path.join(base, "ckpt"),
            tolerance_s=3600, max_files_per_trigger=2,
        )
        return spark.read.parquet(out).select(
            "source", "doc_a", "doc_b", "gap_us"
        )

    def dd_phash(spark, sf_dir):
        """Perceptual-hash image near-dup (datapipe.image_phash_neardup):
        every doc's synthesized BMP decodes through the REAL parser
        (bmp_pixels) into an exact-integer 64-bit aHash; 4x16-bit bands
        generate candidates (pigeonhole-complete for hamming <= 3), full
        Hamming verifies via bit_count(xor). The DuckDB twin re-derives
        each hash FROM THE TEXT BYTES — legitimate because BMP
        encode -> decode is a pixel identity (pinned by the round-trip
        tests), so the twin cross-checks the entire synth + parse + hash
        + band + verify chain bit-for-bit."""
        from tsrollup.datapipe import image_phash_neardup

        return image_phash_neardup(spark, sf_dir, ham=3)

    def dd_audio_fp(spark, sf_dir):
        """Audio fingerprints (datapipe.audio_fingerprint via the
        audio_fp_neardup adapter's hashing stage): every doc's
        synthesized WAV parses through the REAL RIFF walker into an
        exact-integer 64-bit energy-delta fingerprint. The DuckDB twin
        re-derives every fingerprint FROM THE TEXT BYTES (pcm =
        (byte-128)*256, frame energies as prefix-sum slices, band-wise
        bit packing) — legitimate because WAV encode -> parse is a
        sample identity pinned by the round-trip tests. The entry twins
        the per-doc HASHES (one row per doc — the fixture's near-dup
        texts sit beyond hamming 3 on this all-bytes fingerprint, so the
        pair set would be empty here); the banded near-dup JOIN path is
        exercised on a planted fixture in test_datapipe, symmetric with
        dd_phash."""
        from pyspark.sql import functions as F

        from tsrollup.datapipe import audio_fingerprint, make_wav, wav_samples
        import numpy as np
        import pandas as pd

        d = _read_table(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lower("text").alias("text"),
        )

        def fp_batch(batches):
            for pdf in batches:
                ids, fps = [], []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    raw = text.encode("utf-8")
                    if not raw:
                        continue
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    pcm = ((arr.astype(np.int32) - 128) * 256).astype(np.int16)
                    got, _rate = wav_samples(make_wav(pcm))
                    ids.append(doc_id)
                    fps.append(audio_fingerprint(got))
                yield pd.DataFrame(
                    {"doc_id": ids, "fp": np.array(fps, dtype=np.int64)}
                )

        return d.mapInPandas(fp_batch, schema="doc_id long, fp long")

    def sk_cms_heavy(spark, sf_dir):
        """Count-Min sketch over the token payload (sketches.
        cms_from_counts/cms_estimate): a 3x512 BIGINT cell table built
        from the explode-free exact histogram, point-queried for the
        exact top-30 tokens. Publishes (token_id, cnt_exact, cnt_cms) so
        the twin checks BOTH the sketch upper-bound estimates (cell
        hashing included — DuckDB re-derives every cell via
        xxh64_intlist([token, r])) and the exact counts they bound.
        512 cells vs ~vocab-size distinct tokens forces real collisions,
        so cnt_cms > cnt_exact rows prove the min-over-rows actually
        selects across depth. The histogram is localCheckpointed: cms
        build + probe list share one bincount scan."""
        from tsrollup.sketches import cms_estimate, cms_from_counts
        from tsrollup.tokenstats import token_histogram

        seq = sequences_from_documents(spark, sf_dir)
        hist = token_histogram(seq).localCheckpoint()
        cms = cms_from_counts(hist, "token_id", "cnt", width=512, depth=3)
        probes = hist.orderBy(F.desc("cnt"), "token_id").limit(30)
        est = cms_estimate(cms, probes, "token_id", width=512, depth=3)
        return (
            probes.select(
                F.col("token_id").cast("int").alias("token_id"),
                F.col("cnt").alias("cnt_exact"),
            )
            .join(est.withColumnRenamed("item", "token_id"), "token_id")
            .select("token_id", "cnt_exact", "cnt_cms")
        )

    def engine_bucketed_join(spark, sf_dir):
        """K5: bucketed co-located join — the shuffle-elimination layout
        for repeated big-big joins: both tables written ONCE with
        `bucketBy(8, key).sortBy(key)` (external location, so the
        managed-table warehouse never leaks outside scratch), after
        which every join on the key is exchange-free — the 100-TB win
        is paying the layout shuffle once instead of per-query. The
        entry asserts the property it claims: broadcast is disabled for
        the probe and the physical plan must contain NO Exchange.
        Result (and the DuckDB twin) is the plain join + aggregate, so
        the oracle proves the layout changed the PLAN and nothing
        else."""
        base = _scratch("bucketed_join")
        spark.sql("DROP TABLE IF EXISTS bj_orders")
        spark.sql("DROP TABLE IF EXISTS bj_lineitem")
        # repartition to the bucket layout BEFORE the write (round 6):
        # the single-file parquet scan otherwise makes ONE task sort and
        # write all 8 buckets serially; pre-clustering by the bucket key
        # gives 8 parallel sorted writers, one file per bucket (measured
        # 2.6 s -> 1.1 s for the lineitem write at sf0.1). Bucket
        # contents are identical (same hash assignment).
        # the two layout writes are independent jobs — submit them from a
        # thread pool (guide §2.6) so the one-time layout cost is
        # max(write walls), not their sum
        def _write_orders():
            (
                _read_table(spark, sf_dir, "orders")
                .repartition(8, "o_orderkey")
                .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
                .option("path", os.path.join(base, "orders"))
                .mode("overwrite").saveAsTable("bj_orders")
            )

        def _write_lineitem():
            (
                _read_table(spark, sf_dir, "lineitem")
                .withColumnRenamed("l_orderkey", "o_orderkey")
                .repartition(8, "o_orderkey")
                .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
                .option("path", os.path.join(base, "lineitem"))
                .mode("overwrite").saveAsTable("bj_lineitem")
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(_write_orders), pool.submit(_write_lineitem)]:
                f.result()
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            pairs = spark.table("bj_orders").join(
                spark.table("bj_lineitem"), "o_orderkey"
            )
            # the JOIN subtree must be exchange-free (the aggregate on a
            # different key downstream legitimately shuffles once)
            plan = pairs._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, (
                "bucketed co-located join must plan no shuffle:\n" + plan
            )
            assert "Bucketed: true" in plan, plan
            joined = pairs.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum(F.col("l_quantity").cast("long"))
                .cast("long")
                .alias("qty_sum"),
            )
            # materialize while the conf override is still active
            joined = spark.createDataFrame(
                joined.collect(), joined.schema
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return joined

    def engine_bpe_train(spark, sf_dir):
        """TK4: distributed BPE merge training (bpe.bpe_train) over the
        documents-derived token sequences — tokenizer training as a
        pipeline operator. 8 merge rounds, each = one vocab-bounded
        mapInPandas pair-count + hash agg, a 1-row argmax collect, and
        one rewrite pass (left-to-right non-overlap), checkpointed per
        round. Rows-only: the sequential merge loop is not
        SQL-expressible; tests/test_bpe.py pins the whole merge table
        AND the rewritten corpus against a pure-python reference."""
        from tsrollup.bpe import bpe_train
        from tsrollup.flagship import sequences_from_documents

        seq = sequences_from_documents(spark, sf_dir).select("doc_id", "tokens")
        merges, _ = bpe_train(seq, "tokens", n_merges=8, new_id_base=1_000_000)
        return spark.createDataFrame(
            [(i,) + m for i, m in enumerate(merges)],
            "rnd int, a long, b long, new_id long, cnt long",
        )

    def engine_bpe_encode(spark, sf_dir):
        """TK6: BPE encode + decode round trip (bpe.bpe_encode /
        bpe_decode) — tokenize with a trained merge table (ONE corpus
        scan applying all merges in-kernel, vs training's sequential
        rounds), then expand back in reverse merge order. Twinned by
        publishing the DECODED payload's xxhash64 + length per doc
        against the oracle hashing the ORIGINAL tokens: the board proves
        the encode is losslessly invertible row-by-row, bit-for-bit.
        Encode-side parity (encode(train corpus) == train's merged
        corpus; compression of the encoded lengths) is pytest-pinned in
        tests/test_bpe.py."""
        from tsrollup.bpe import bpe_decode, bpe_encode, bpe_train
        from tsrollup.flagship import sequences_from_documents

        seq = sequences_from_documents(spark, sf_dir).select("doc_id", "tokens")
        merges, _ = bpe_train(seq, "tokens", n_merges=8, new_id_base=1_000_000)
        dec = bpe_decode(bpe_encode(seq, merges), merges)
        return dec.select(
            "doc_id",
            F.size("tokens").cast("long").alias("n_tok"),
            F.xxhash64("tokens").alias("roundtrip_hash"),
        )

    def x1_ab_test(spark, sf_dir):
        """X1: A/B experiment readout — users deterministically split
        into two arms by pmod(xxhash64("<user_id>#ab"), 2) (the mx_split
        stateless-assignment discipline, so an experiment's arms are
        reproducible and join-free), then per event_type a two-proportion
        z-test on user-level conversion: z = (pA - pB) /
        sqrt(p̂(1-p̂)(1/nA + 1/nB)). Counts are exact integers; the one
        float z is computed by the identical expression text in both
        engines and rounded 1e-6; the significance verdict compares the
        ROUNDED z against 1.959964 so it is a pure function of the
        twinned value."""
        ev = _read_table(spark, sf_dir, "events")
        u = (
            ev.select("user_id")
            .distinct()
            .withColumn(
                "arm",
                F.pmod(
                    F.xxhash64(
                        F.concat(F.col("user_id").cast("string"), F.lit("#ab"))
                    ),
                    F.lit(2),
                ),
            )
        )
        n = u.groupBy().agg(
            F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
            F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        )
        ue = ev.select("event_type", "user_id").distinct().join(u, "user_id")
        c = ue.groupBy("event_type").agg(
            F.sum((F.col("arm") == 0).cast("long")).alias("c_a"),
            F.sum((F.col("arm") == 1).cast("long")).alias("c_b"),
        )
        j = c.crossJoin(F.broadcast(n))
        pa = F.col("c_a").cast("double") / F.col("n_a")
        pb = F.col("c_b").cast("double") / F.col("n_b")
        pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
            F.col("n_a") + F.col("n_b")
        )
        # degenerate pooled rates (0 or 1 — e.g. every user has a 'view')
        # have zero variance: z is NULL, never a divide error
        conv = F.col("c_a") + F.col("c_b")
        tot = F.col("n_a") + F.col("n_b")
        z = F.when(
            (conv > 0) & (conv < tot),
            (pa - pb)
            / F.sqrt(
                pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
        )
        return j.select(
            "event_type", "c_a", "c_b", "n_a", "n_b",
            F.round(z, 6).alias("z_r"),
            F.coalesce(
                F.abs(F.round(z, 6)) >= 1.959964, F.lit(False)
            ).alias("significant"),
        )

    return {
        "engine_bucketed_join": engine_bucketed_join,
        "x1_ab_test": x1_ab_test,
        "engine_bpe_train": engine_bpe_train,
        "engine_bpe_encode": engine_bpe_encode,
        "tx_bloom_decontam": tx_bloom_decontam,
        "sk_cms_heavy": sk_cms_heavy,
        "dd_phash": dd_phash,
        "dd_audio_fp": dd_audio_fp,
        "engine_streaming_pair_join": engine_streaming_pair_join,
        "engine_compaction": engine_compaction,
        "engine_targeted_delete": engine_targeted_delete,
        "engine_vacuum": engine_vacuum,
        "engine_time_travel": engine_time_travel,
        "engine_schema_evolution": engine_schema_evolution,
        "engine_freshness": engine_freshness,
        "engine_backfill": engine_backfill,
        "tx_bigram_lift": tx_bigram_lift,
        "dd_substring": dd_substring,
        "dd_substring_removal": dd_substring_removal,
        "dd_cdc_chunks": dd_cdc_chunks,
        "engine_token_drift": engine_token_drift,
        "mx_split": mx_split,
        "mx_sample": mx_sample,
        "mx_shuffle": mx_shuffle,
        "mx_weighted": mx_weighted,
        "mx_reservoir": mx_reservoir,
        "mx_quota": mx_quota,
        "engine_seq_dedup": engine_seq_dedup,
        "engine_seq_pack": engine_seq_pack,
        "engine_seq_chunk": engine_seq_chunk,
        "engine_token_heavy": engine_token_heavy,
        "engine_token_hist": engine_token_hist,
        "engine_token_profile": engine_token_profile,
        "engine_zscore_1h": engine_zscore_1h,
        "engine_streaming_scores": engine_streaming_scores,
        "engine_streaming_token_hist": engine_streaming_token_hist,
        "engine_spectral_residual": engine_spectral_residual,
        "engine_matrix_profile": engine_matrix_profile,
        "engine_residual_stats": engine_residual_stats,
        "engine_codec_blocks": engine_codec_blocks,
        "engine_codec_blocks_spans": engine_codec_blocks_spans,
        "ann_lsh": ann_lsh,
        "mm_features": mm_features,
        "mm_thumbnails": mm_thumbnails,
        "mm_audio_resample": mm_audio_resample,
        "mm_scene_cuts": mm_scene_cuts,
        "mm_features2": mm_features2,
        "mm_video_frames": mm_video_frames,
        "engine_streaming_rollup": engine_streaming_rollup,
        "engine_streaming_ohlc": engine_streaming_ohlc,
        "engine_streaming_silence": engine_streaming_silence,
        "engine_token_movers": engine_token_movers,
        "engine_len_hist": engine_len_hist,
        "engine_streaming_dedup": engine_streaming_dedup,
        "engine_streaming_sessions": engine_streaming_sessions,
        "engine_streaming_join": engine_streaming_join,
        "engine_streaming_welford": engine_streaming_welford,
        "engine_resume_ledger": engine_resume_ledger,
        "engine_retention": engine_retention,
        "engine_read_range": engine_read_range,
        "engine_read_decoded": engine_read_decoded,
        "engine_incremental_derive": engine_incremental_derive,
        "engine_streamed_ingest": engine_streamed_ingest,
    }


def _engine_oracles() -> dict[str, str]:
    """DuckDB twins for the engine entries whose rows derive from the
    `documents` table through Spark's xxhash64 (event-time spread + token
    ids): tsrollup.duck_oracle re-expresses XXH64 as pure SQL macros, so
    these oracles re-derive the sequence table INDEPENDENTLY and recompute
    each entry's semantics in ANSI-ish SQL. Streaming finalization is
    SQL-expressible because _seq_files writes time-ordered slices (zero
    watermark drops; finalized = bucket_end <= max(event_ts) - 10min)."""
    from tsrollup.duck_oracle import engine_oracle

    _pow2_case_sql = _pow2_case("n_tok")

    agg_cols = """
         count(*)::BIGINT AS cnt,
         sum(n_tok)::BIGINT AS n_tok_sum,
         min(n_tok)::INTEGER AS n_tok_min,
         max(n_tok)::INTEGER AS n_tok_max,
         sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum,
         sum(n_tok)::BIGINT AS tok_cnt"""

    streaming_rollup = engine_oracle(f""",
    wm AS (SELECT max(event_ts) - INTERVAL 10 MINUTE AS w FROM seq),
    agg AS (
      SELECT source, date_trunc('minute', event_ts) AS bucket_start,
             {agg_cols}
      FROM seq GROUP BY 1, 2
    )
    SELECT source, epoch(bucket_start)::BIGINT AS bucket_s,
           cnt, n_tok_sum, n_tok_min, n_tok_max, tok_sum, tok_cnt
    FROM agg, wm WHERE bucket_start + INTERVAL 1 MINUTE <= wm.w
    """)

    streaming_ohlc = engine_oracle(""",
    wm AS (SELECT max(event_ts) - INTERVAL 10 MINUTE AS w FROM seq),
    agg AS (
      SELECT source, date_trunc('minute', event_ts) AS bucket_start,
             first(n_tok ORDER BY event_ts, doc_id) AS open,
             max(n_tok) AS high,
             min(n_tok) AS low,
             last(n_tok ORDER BY event_ts, doc_id) AS close,
             CAST(count(*) AS BIGINT) AS n
      FROM seq GROUP BY 1, 2
    )
    SELECT source, epoch(bucket_start)::BIGINT AS bucket_s,
           open, high, low, close, n
    FROM agg, wm WHERE bucket_start + INTERVAL 1 MINUTE <= wm.w
    """)

    # T7 silence: per source, every finalized 1m bucket AFTER the source's
    # first observed bucket with no events. The watermark is attached to
    # the floored bucket column, so the cut the stream applies is
    # bucket + 1m <= date_trunc(minute, max event_ts) - 10min.
    streaming_silence = engine_oracle(""",
    wm AS (SELECT date_trunc('minute', max(event_ts)) - INTERVAL 10 MINUTE
                  AS w FROM seq),
    obs AS (SELECT DISTINCT source, date_trunc('minute', event_ts) AS bucket
            FROM seq),
    org AS (SELECT source, min(bucket) AS first_b FROM obs GROUP BY 1),
    bounds AS (SELECT min(first_b) AS lo FROM org),
    mins AS (SELECT unnest(generate_series(
                 (SELECT lo FROM bounds),
                 (SELECT w - INTERVAL 1 MINUTE FROM wm),
                 INTERVAL 1 MINUTE)) AS bucket),
    spine AS (SELECT org.source, m.bucket
              FROM org JOIN mins m ON m.bucket > org.first_b)
    SELECT s.source, epoch(s.bucket)::BIGINT AS bucket_s
    FROM spine s
    WHERE NOT EXISTS (SELECT 1 FROM obs o
                      WHERE o.source = s.source AND o.bucket = s.bucket)
    """)

    token_movers_o = engine_oracle(""",
    mid AS (SELECT (epoch_us(min(event_ts)) + epoch_us(max(event_ts)))::BIGINT
                   AS m2 FROM seq),
    tok AS (SELECT source,
                   (epoch_us(event_ts) * 2 >= mid.m2) AS h2,
                   unnest(tokens) AS token_id
            FROM seq, mid),
    cnt AS (SELECT source, token_id,
                   sum(CASE WHEN NOT h2 THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN h2 THEN 1 ELSE 0 END)::BIGINT AS c2
            FROM tok GROUP BY 1, 2),
    d AS (SELECT source, token_id, c1, c2, c2 - c1 AS delta FROM cnt),
    r AS (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY abs(delta) DESC, token_id)
                      AS rnk
          FROM d)
    SELECT source, rnk::INTEGER AS rnk, token_id, c1, c2, delta
    FROM r WHERE rnk <= 5
    """)

    len_hist_o = engine_oracle(f""",
    b AS (SELECT source, {_pow2_case_sql} AS len_bucket, n_tok FROM seq)
    SELECT source, len_bucket, count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS tok_sum
    FROM b GROUP BY 1, 2
    """)

    streaming_dedup_o = engine_oracle(""",
    d AS (SELECT DISTINCT xxh64_intlist(tokens) AS h, n_tok FROM seq)
    SELECT h, n_tok::INTEGER AS n_tok FROM d
    """)

    # T11 sessions: lag/cumsum sessionization with the pinned touching-
    # windows-coalesce convention (new session iff ts - prev > gap);
    # finalized = session end (last event + gap) <= max(event_ts) - 10min
    streaming_sessions_o = engine_oracle(""",
    wm AS (SELECT max(event_ts) - INTERVAL 10 MINUTE AS w FROM seq),
    l AS (SELECT source, doc_id, event_ts, n_tok,
                 lag(event_ts) OVER (PARTITION BY source
                                     ORDER BY event_ts, doc_id) AS prev_ts
          FROM seq),
    -- the cumsum MUST use the same (event_ts, doc_id) total order the
    -- lag assigned flags under: ordering by prev_ts would sort the
    -- NULL-prev (flag-1) row AFTER its same-timestamp twin and split
    -- one session in two
    s AS (SELECT source, event_ts, n_tok,
                 sum(CASE WHEN prev_ts IS NULL
                               OR event_ts - prev_ts > INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY source ORDER BY event_ts, doc_id)
                   AS sid
          FROM l),
    sess AS (SELECT source, sid,
                    min(event_ts) AS st,
                    max(event_ts) + INTERVAL 1 HOUR AS en,
                    count(*)::BIGINT AS n_events,
                    sum(n_tok)::BIGINT AS n_tok_sum
             FROM s GROUP BY 1, 2)
    SELECT source, epoch(st)::BIGINT AS start_s, epoch(en)::BIGINT AS end_s,
           n_events, n_tok_sum
    FROM sess, wm WHERE en <= wm.w
    """)

    streaming_join = engine_oracle(""",
    wm AS (SELECT max(event_ts) - INTERVAL 10 MINUTE AS w FROM seq),
    enr AS (
      SELECT 'r' || xxpmod(xxh64(source), 3)::VARCHAR AS region,
             date_trunc('minute', event_ts) AS bucket_start,
             n_tok
      FROM seq
    ),
    agg AS (
      SELECT region, bucket_start,
             count(*)::BIGINT AS cnt, sum(n_tok)::BIGINT AS n_tok_sum
      FROM enr GROUP BY 1, 2
    )
    SELECT region, epoch(bucket_start)::BIGINT AS bucket_s, cnt, n_tok_sum
    FROM agg, wm WHERE bucket_start + INTERVAL 1 MINUTE <= wm.w
    """)

    read_range = engine_oracle(""",
    agg AS (
      SELECT source, date_trunc('hour', event_ts) AS bucket_start,
             count(*)::BIGINT AS cnt,
             sum(n_tok)::BIGINT AS n_tok_sum,
             sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum,
             sum(n_tok)::BIGINT AS tok_cnt
      FROM seq GROUP BY 1, 2
    ),
    last_day AS (SELECT max(event_ts::DATE) AS d FROM seq)
    SELECT source, epoch(bucket_start)::BIGINT AS bucket_s,
           '1h' AS tier, cnt, n_tok_sum, tok_sum, tok_cnt
    FROM agg, last_day WHERE bucket_start::DATE = last_day.d
    """)

    streamed_ingest = engine_oracle(f""",
    wm AS (SELECT max(event_ts) - INTERVAL 10 MINUTE AS w FROM seq),
    fin AS (
      SELECT seq.* FROM seq, wm
      WHERE date_trunc('minute', event_ts) + INTERVAL 1 MINUTE <= wm.w
    )
    SELECT source,
           epoch(date_trunc('hour', event_ts))::BIGINT AS bucket_s,
           {agg_cols}
    FROM fin GROUP BY source, date_trunc('hour', event_ts)
    """)

    # retention: survivors after expiring the oldest 1m day (horizon =
    # span-1, cutoff = first+1 — storage.drop_expired_partitions); one
    # store row per (source, bucket), partitioned (tier, day)
    retention = engine_oracle(""",
    b AS (
      SELECT source, date_trunc('minute', event_ts) AS b1m,
             date_trunc('hour', event_ts) AS b1h,
             date_trunc('day', event_ts) AS b1d
      FROM seq
    ),
    rows_ AS (
      SELECT '1m' AS tier, day, count(*)::BIGINT AS n_rows FROM
        (SELECT DISTINCT source, b1m, b1m::DATE AS day FROM b) GROUP BY day
      UNION ALL
      SELECT '1h', day, count(*)::BIGINT FROM
        (SELECT DISTINCT source, b1h, b1h::DATE AS day FROM b) GROUP BY day
      UNION ALL
      SELECT '1d', day, count(*)::BIGINT FROM
        (SELECT DISTINCT source, b1d, b1d::DATE AS day FROM b) GROUP BY day
    ),
    span AS (SELECT min(day) AS mn, max(day) AS mx
             FROM rows_ WHERE tier = '1m')
    SELECT tier, day::VARCHAR AS day_s, n_rows FROM rows_, span
    WHERE NOT (tier = '1m' AND day = span.mn AND (span.mx - span.mn) >= 2)
    """)

    # resume/lineage ledger: the oracle computes every unit's ground truth
    # (per-(source_bucket, day) row count, bit_xor token checksum over
    # Spark-exact ARRAY<INT> hashes, per-tier output rows) in one shot —
    # so a green row proves the TWO-RUN resumed build committed each unit
    # exactly once with exactly its own rows.
    from tsrollup.storage import n_source_buckets

    nb = n_source_buckets()
    resume_ledger = engine_oracle(f""",
    r AS (
      SELECT source, event_ts,
             xxpmod(xxh64(source), {nb}) AS sb,
             event_ts::DATE AS day,
             xxh64_intlist(tokens) AS row_hash
      FROM seq
    ),
    units AS (
      SELECT sb, day, count(*)::BIGINT AS input_rows,
             bit_xor(row_hash)::BIGINT AS token_checksum
      FROM r GROUP BY sb, day
    ),
    t1m AS (SELECT sb, day, count(*)::BIGINT AS n FROM
      (SELECT DISTINCT source, date_trunc('minute', event_ts), sb, day FROM r)
      GROUP BY sb, day),
    t1h AS (SELECT sb, day, count(*)::BIGINT AS n FROM
      (SELECT DISTINCT source, date_trunc('hour', event_ts), sb, day FROM r)
      GROUP BY sb, day),
    t1d AS (SELECT sb, day, count(*)::BIGINT AS n FROM
      (SELECT DISTINCT source, date_trunc('day', event_ts), sb, day FROM r)
      GROUP BY sb, day)
    SELECT sb::VARCHAR || '/' || day::VARCHAR AS unit_id,
           input_rows, token_checksum,
           t1m.n AS out_rows_1m, t1h.n AS out_rows_1h, t1d.n AS out_rows_1d
    FROM units
    JOIN t1m USING (sb, day) JOIN t1h USING (sb, day) JOIN t1d USING (sb, day)
    """)

    # cold-read path: decoded Gorilla blocks must round-trip to the
    # gap-filled 1h mean series BIT-exactly — the oracle rebuilds the
    # per-source hour spine, LOCF-fills the one-division mean, and
    # compares raw doubles (no rounding anywhere)
    read_decoded = engine_oracle(""",
    hb AS (
      SELECT source, date_trunc('hour', event_ts) AS b,
             sum(n_tok)::BIGINT AS s, count(*)::BIGINT AS c
      FROM seq GROUP BY 1, 2
    ),
    bounds AS (SELECT source, min(b) AS b0, max(b) AS b1 FROM hb GROUP BY source),
    spine AS (
      SELECT source, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
      FROM bounds
    ),
    filled AS (
      SELECT sp.source, sp.b,
             last_value(hb.s::DOUBLE / hb.c IGNORE NULLS) OVER (
               PARTITION BY sp.source ORDER BY sp.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_d
      FROM spine sp LEFT JOIN hb ON hb.source = sp.source AND hb.b = sp.b
    ),
    last_day AS (SELECT max(event_ts::DATE) AS d FROM seq)
    SELECT source, epoch(b)::BIGINT AS bucket_s,
           '1h' AS tier, 'n_tok_mean' AS metric, value_d
    FROM filled, last_day WHERE b::DATE = last_day.d
    """)

    # codec round trip: the decoded block points of the filled 1h tier,
    # all three encoded metrics, raw doubles (lossless codec + exact
    # divisions — see engine_codec_blocks docstring)
    codec_blocks = engine_oracle(""",
    hb AS (
      SELECT source, date_trunc('hour', event_ts) AS b,
             count(*)::BIGINT AS c, sum(n_tok)::BIGINT AS s,
             sum(list_aggregate(tokens, 'sum'))::BIGINT AS ts_,
             sum(n_tok)::BIGINT AS tc
      FROM seq GROUP BY 1, 2
    ),
    bounds AS (SELECT source, min(b) AS b0, max(b) AS b1 FROM hb GROUP BY source),
    spine AS (
      SELECT source, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
      FROM bounds
    ),
    filled AS (
      SELECT sp.source, sp.b,
             coalesce(hb.c, 0)::DOUBLE AS cnt_v,
             last_value(hb.s::DOUBLE / hb.c IGNORE NULLS) OVER w AS ntm,
             last_value(hb.ts_::DOUBLE / hb.tc IGNORE NULLS) OVER w AS tkm
      FROM spine sp LEFT JOIN hb ON hb.source = sp.source AND hb.b = sp.b
      WINDOW w AS (PARTITION BY sp.source ORDER BY sp.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT source, '1h' AS tier, 'cnt' AS metric,
           epoch(b)::BIGINT AS bucket_s, cnt_v AS value_d FROM filled
    UNION ALL SELECT source, '1h', 'n_tok_mean', epoch(b)::BIGINT, ntm FROM filled
    UNION ALL SELECT source, '1h', 'tok_mean', epoch(b)::BIGINT, tkm FROM filled
    """)

    # ---- detector twins (PROMOTED round 3). The gap-filled 1h series is
    # rebuilt exactly as in the read_decoded oracle (bit-exact LOCF of the
    # one-division mean); the z-score is a plain window aggregate with the
    # constant-window mask described in _scores_projection; the EWMA
    # recurrence (s_t = a*x_t + c*s_{t-1}; v_t = c*v_{t-1} + c*a*r_t^2;
    # score_t = r_t/sqrt(v_{t-1}) gated on v_{t-1} > eps) runs as a
    # RECURSIVE CTE — one step per bucket index, all sources advancing in
    # lockstep. Float literals are repr() of the kernel's Python-computed
    # constants so both sides use the identical doubles; 6-dp rounding
    # absorbs chunked-scan vs sequential evaluation order.
    _a = 0.3
    _c = 1.0 - _a
    _ca = _c * _a
    _eps = 1e-12
    _tau = 3.0

    def _filled_cte() -> str:
        return """,
    hb AS (
      SELECT source, date_trunc('hour', event_ts) AS b,
             sum(n_tok)::BIGINT AS s, count(*)::BIGINT AS c
      FROM seq GROUP BY 1, 2
    ),
    bounds AS (SELECT source, min(b) AS b0, max(b) AS b1 FROM hb GROUP BY source),
    spine AS (
      SELECT source, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
      FROM bounds
    ),
    f0 AS (
      SELECT sp.source, sp.b,
             last_value(hb.s::DOUBLE / hb.c IGNORE NULLS) OVER (
               PARTITION BY sp.source ORDER BY sp.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
      FROM spine sp LEFT JOIN hb ON hb.source = sp.source AND hb.b = sp.b
    ),
    f AS (
      SELECT source, b, x,
             row_number() OVER (PARTITION BY source ORDER BY b) - 1 AS i
      FROM f0
    )"""

    def _zs_cte(W: int) -> str:
        return f""",
    zs AS (
      SELECT source, b, x,
             avg(x)        OVER w AS mu,
             stddev_pop(x) OVER w AS sigma,
             count(*)      OVER w AS cw,
             min(x)        OVER w AS mn,
             max(x)        OVER w AS mx
      FROM f
      WINDOW w AS (PARTITION BY source ORDER BY b
                   ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
    )"""

    def _ew_cte() -> str:
        return f""",
    ew AS (
      SELECT source, b, i, x, x AS s, 0.0::DOUBLE AS v,
             0.0::DOUBLE AS r, 0.0::DOUBLE AS score
      FROM f WHERE i = 0
      UNION ALL
      SELECT f.source, f.b, f.i, f.x,
             {_a!r} * f.x + {_c!r} * ew.s,
             {_c!r} * ew.v + {_ca!r} * ((f.x - ew.s) * (f.x - ew.s)),
             f.x - ew.s,
             CASE WHEN ew.v > {_eps!r}
                  THEN (f.x - ew.s) / sqrt(ew.v) ELSE 0.0 END
      FROM ew JOIN f ON f.source = ew.source AND f.i = ew.i + 1
    )"""

    def _scores_oracle(W: int) -> str:
        return engine_oracle(
            _filled_cte() + _zs_cte(W) + _ew_cte() + f"""
    SELECT source, epoch(b)::BIGINT AS bucket_s, 'zscore' AS detector,
           x AS value_d,
           CASE WHEN cw < {W} OR mn = mx THEN NULL
                WHEN sigma > 0 THEN
                  CASE WHEN abs((x - mu) / sigma) < 1e-4 THEN 0.0
                       ELSE round((x - mu) / sigma, 6) END
                ELSE 0.0 END AS score_r,
           CASE WHEN cw < {W} THEN -1
                WHEN mn = mx THEN 0
                WHEN sigma > 0
                  THEN (abs(round((x - mu) / sigma, 6)) >= {_tau!r})::INT
                ELSE 0 END AS anom_i
    FROM zs
    UNION ALL
    SELECT source, epoch(b)::BIGINT, 'ewma', x,
           CASE WHEN abs(score) < 1e-4 THEN 0.0 ELSE round(score, 6) END,
           (abs(round(score, 6)) >= {_tau!r})::INT
    FROM ew
    """,
            recursive=True,
        )

    zscore_1h = _scores_oracle(12)        # flagship uses window=12
    incremental_derive = _scores_oracle(60)  # pipeline default window

    resid_stats = engine_oracle(
        _filled_cte() + _zs_cte(60) + _ew_cte() + """,
    srcs AS (SELECT DISTINCT source FROM f),
    zagg AS (
      SELECT source, count(*)::BIGINT AS n,
             avg(x - mu) AS mean, var_pop(x - mu) AS var
      FROM zs WHERE cw = 60 GROUP BY source
    ),
    eagg AS (
      SELECT source, count(*)::BIGINT AS n,
             avg(r) AS mean, var_pop(r) AS var
      FROM ew GROUP BY source
    )
    SELECT s.source, '1h' AS tier, 'zscore' AS detector,
           coalesce(z.n, 0)::BIGINT AS n,
           round(z.mean, 6) AS mean_r, round(z.var, 6) AS var_r
    FROM srcs s LEFT JOIN zagg z USING (source)
    UNION ALL
    SELECT source, '1h', 'ewma', n, round(mean, 6), round(var, 6)
    FROM eagg
    """,
        recursive=True,
    )

    # streaming Welford finals: each source's last update-mode emission
    # folds all of its rows, so whole-input per-source stats are the twin
    streaming_welford = engine_oracle("""
    SELECT source, count(*)::BIGINT AS n,
           round(avg(n_tok), 6) AS mean_r,
           round(var_pop(n_tok), 6) AS var_r
    FROM seq GROUP BY source
    """)

    token_hist = engine_oracle("""
    , tok AS (SELECT unnest(tokens) AS token_id FROM seq),
    h AS (SELECT token_id::INTEGER AS token_id, count(*)::BIGINT AS cnt
          FROM tok GROUP BY 1)
    SELECT token_id, cnt FROM (
      SELECT token_id, cnt,
             row_number() OVER (ORDER BY cnt DESC, token_id) AS rnk
      FROM h
    ) WHERE rnk <= 20
    """)

    token_profile = engine_oracle("""
    , tok AS (SELECT source, unnest(tokens) AS token_id FROM seq),
    h AS (SELECT source, token_id, count(*)::BIGINT AS cnt
          FROM tok GROUP BY 1, 2)
    SELECT source, count(*)::BIGINT AS n_distinct,
           sum(cnt)::BIGINT AS tok_total,
           round(ln(sum(cnt)::DOUBLE)
                 - sum(cnt::DOUBLE * ln(cnt::DOUBLE)) / sum(cnt)::DOUBLE,
                 6) AS entropy_r
    FROM h GROUP BY source
    """)

    seq_dedup = engine_oracle("""
    SELECT xxh64_intlist(tokens) AS tok_hash,
           count(*)::BIGINT AS n_dups,
           min(doc_id) AS keeper_doc_id
    FROM seq GROUP BY 1
    """)

    seq_chunk = engine_oracle("""
    , ck AS (
      SELECT doc_id, n_tok, tokens,
             unnest(range(CASE WHEN n_tok <= 32 THEN 1
                          ELSE (n_tok - 32 + 23) // 24 + 1 END)) AS chunk_id
      FROM seq
    )
    SELECT doc_id, chunk_id::INTEGER AS chunk_id,
           (chunk_id * 24)::INTEGER AS start,
           len(tokens[chunk_id * 24 + 1 : chunk_id * 24 + 32])::INTEGER
             AS chunk_len,
           xxh64_intlist(tokens[chunk_id * 24 + 1 : chunk_id * 24 + 32])
             AS tok_hash
    FROM ck
    """)

    seq_pack = engine_oracle("""
    , ord AS (
      SELECT source, tokens, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY event_ts, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS d_start
      FROM seq WHERE n_tok > 0
    ),
    flats AS (
      SELECT source, flatten(list(tokens ORDER BY event_ts, doc_id)) AS flat
      FROM seq GROUP BY source
    ),
    chunks AS (
      SELECT source, t.i AS chunk_id,
             flat[t.i * 512 + 1 : least((t.i + 1) * 512, len(flat))] AS ctoks
      FROM flats, unnest(range((len(flat) + 511) // 512)) AS t(i)
    )
    SELECT c.source, c.chunk_id,
           len(c.ctoks)::INTEGER AS n_tok,
           count(o.d_start)::INTEGER AS n_docs,
           xxh64_intlist(c.ctoks) AS tok_hash
    FROM chunks c JOIN ord o
      ON o.source = c.source
     AND o.d_start < (c.chunk_id + 1) * 512
     AND o.d_start + o.n_tok > c.chunk_id * 512
    GROUP BY c.source, c.chunk_id, c.ctoks
    """)

    token_drift = engine_oracle("""
    , tok AS (SELECT source, date_trunc('day', event_ts) AS bucket,
                     unnest(tokens) AS token_id FROM seq),
    h AS (SELECT source, bucket, token_id, count(*)::BIGINT AS cnt
          FROM tok GROUP BY 1, 2, 3),
    dt AS (SELECT bucket, token_id, sum(cnt)::BIGINT AS day_cnt
           FROM h GROUP BY 1, 2),
    ns AS (SELECT source, bucket, sum(cnt)::BIGINT AS n_sb
           FROM h GROUP BY 1, 2),
    mb AS (SELECT bucket, sum(day_cnt)::BIGINT AS m_b FROM dt GROUP BY 1),
    t AS (
      SELECT h.source, h.bucket, ns.n_sb,
             CAST(round(h.cnt * ln(CAST(h.cnt * mb.m_b AS DOUBLE)
                                   / CAST(ns.n_sb * dt.day_cnt AS DOUBLE))
                        * 1000000, 0) AS BIGINT) AS term_u
      FROM h
      JOIN dt ON dt.bucket = h.bucket AND dt.token_id = h.token_id
      JOIN ns ON ns.source = h.source AND ns.bucket = h.bucket
      JOIN mb ON mb.bucket = h.bucket
    )
    SELECT source, CAST(epoch(bucket) AS BIGINT) AS bucket_s,
           min(n_sb) AS n_tok,
           count(*)::BIGINT AS n_distinct,
           sum(term_u)::BIGINT AS kl_unats,
           CAST(sum(term_u) AS DOUBLE)
             / CAST(min(n_sb) * 1000000 AS DOUBLE) AS kl_nats
    FROM t GROUP BY 1, 2
    """)

    streaming_token_hist = engine_oracle("""
    , wm AS (SELECT date_trunc('minute', max(event_ts)) - INTERVAL 10 MINUTE
                    AS w FROM seq),
    tok AS (SELECT date_trunc('minute', event_ts) AS bucket,
                   unnest(tokens) AS token_id
            FROM seq)
    SELECT epoch(bucket)::BIGINT AS bucket_s,
           token_id::INTEGER AS token_id,
           count(*)::BIGINT AS cnt
    FROM tok, wm WHERE bucket + INTERVAL 1 MINUTE <= wm.w
    GROUP BY 1, 2
    """)

    token_heavy = engine_oracle("""
    , tok AS (SELECT unnest(tokens) AS token_id FROM seq),
    n AS (SELECT count(*)::BIGINT AS total FROM tok)
    SELECT token_id::BIGINT AS token_id, count(*)::BIGINT AS cnt
    FROM tok, n GROUP BY token_id, n.total
    HAVING count(*) * 41 > n.total
    """)

    mx_split_o = engine_oracle("""
    , d AS (SELECT doc_id,
                   xxpmod(xxh64(doc_id::VARCHAR || '#0'), 10000) AS b
            FROM documents)
    SELECT doc_id, CASE WHEN b < 500 THEN 'test'
                        WHEN b < 1000 THEN 'val'
                        ELSE 'train' END AS split
    FROM d
    """)

    mx_sample_o = engine_oracle("""
    , r AS (SELECT * FROM (VALUES ('src0', 5000), ('src5', 2500))
            AS t(source, rate))
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN r USING (source)
    WHERE xxpmod(xxh64(d.doc_id::VARCHAR || '#1'), 10000)
          < coalesce(r.rate, 1000)
    """)

    mx_shuffle_o = engine_oracle("""
    SELECT doc_id,
           (row_number() OVER (ORDER BY xxh64(doc_id::VARCHAR || '#2'),
                               doc_id) - 1)::BIGINT AS shuffle_rank
    FROM documents
    """)

    mx_reservoir_o = engine_oracle("""
    , r AS (SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                     ORDER BY xxh64(doc_id::VARCHAR || '#7'), doc_id) AS rnk
            FROM documents)
    SELECT source, doc_id, rnk FROM r WHERE rnk <= 5
    """)

    mx_weighted_o = engine_oracle("""
    , keyed AS (
      SELECT source, doc_id,
             round(ln((xxpmod(xxh64(doc_id::VARCHAR || '#3'), 1000000000)
                       + 1) / 1000000001.0) / n_chars, 9) AS es_key
      FROM documents
    )
    SELECT source, doc_id, es_key, rnk FROM (
      SELECT source, doc_id, es_key,
             row_number() OVER (PARTITION BY source
                                ORDER BY es_key DESC, doc_id) AS rnk
      FROM keyed) WHERE rnk <= 5
    """)

    bpe_encode_o = engine_oracle("""
    SELECT doc_id, n_tok::BIGINT AS n_tok,
           xxh64_intlist(tokens) AS roundtrip_hash
    FROM seq
    """)

    mx_quota_o = engine_oracle("""
    , s AS (SELECT source, count(*)::BIGINT AS c FROM documents
            GROUP BY source),
    tot AS (SELECT sum(c)::BIGINT AS t FROM s),
    a0 AS (SELECT source, (100 * c) // t AS base, (100 * c) % t AS rem
           FROM s, tot),
    l AS (SELECT (100 - sum(base))::BIGINT AS leftover FROM a0),
    alloc AS (
      SELECT source,
             (base + CASE WHEN row_number()
                            OVER (ORDER BY rem DESC, source) <= leftover
                     THEN 1 ELSE 0 END)::BIGINT AS alloc
      FROM a0, l
    ),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
               ORDER BY xxh64(d.doc_id::VARCHAR || '#9'), d.doc_id)::BIGINT
               AS rnk
      FROM documents d
    )
    SELECT r.source, r.doc_id, a.alloc, r.rnk
    FROM ranked r JOIN alloc a USING (source) WHERE r.rnk <= a.alloc
    """)

    # substring dedup twins: dup windows grouped by CONTENT (the literal
    # token slice), not by re-hashing — cross-checks the Spark side's
    # fingerprint equality against window equality itself.
    _SUB_WIN = """
    , p0 AS (
      SELECT doc_id, n_tok, tokens,
             unnest(generate_series(1, n_tok - 7)) AS pos
      FROM seq WHERE n_tok >= 8
    ),
    win AS (SELECT doc_id, pos, tokens[pos : pos + 7] AS w FROM p0),
    dup AS (
      SELECT w FROM (SELECT DISTINCT w, doc_id FROM win)
      GROUP BY w HAVING count(*) >= 2
    )
    """

    # CDC: boundaries are mod-64 hits of the rolling 4-token xxh64 (ends
    # forced); chunks re-hashed by content via the same intlist fold.
    dd_cdc_o = engine_oracle(""",
    p0 AS (SELECT doc_id, n_tok, tokens, unnest(generate_series(4, n_tok)) AS p
           FROM seq WHERE n_tok >= 4),
    bnd AS (SELECT doc_id, p FROM p0
            WHERE xxpmod(xxh64_intlist(tokens[p - 3 : p]), 64) = 0),
    allb AS (SELECT DISTINCT doc_id, p FROM (
               SELECT doc_id, p FROM bnd
               UNION ALL SELECT doc_id, n_tok AS p FROM seq WHERE n_tok >= 1)),
    spans AS (SELECT doc_id,
                     coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0)
                       + 1 AS s,
                     p AS e
              FROM allb),
    ch AS (SELECT seq.source, (spans.e - spans.s + 1)::BIGINT AS len,
                  xxh64_intlist(seq.tokens[spans.s : spans.e]) AS h
           FROM spans JOIN seq USING (doc_id)),
    ph AS (SELECT source, h, count(*)::BIGINT AS occ, min(len) AS len1
           FROM ch GROUP BY 1, 2)
    SELECT source, sum(occ)::BIGINT AS n_chunks,
           count(*)::BIGINT AS n_unique,
           sum(occ * len1)::BIGINT AS total_tokens,
           sum(len1)::BIGINT AS unique_tokens,
           (10000 * (sum(occ * len1) - sum(len1))
              // sum(occ * len1))::BIGINT AS dedup_per10k
    FROM ph GROUP BY 1
    """)

    dd_substring_o = engine_oracle(_SUB_WIN + """,
    dw AS (SELECT win.doc_id, win.pos FROM win JOIN dup USING (w)),
    cov AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_dup_windows,
             sum(coalesce(least(8, nxt - pos), 8))::BIGINT AS dup_tokens
      FROM (SELECT doc_id, pos,
                   lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
            FROM dw)
      GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_tok::BIGINT AS n_tok,
           greatest(s.n_tok - 7, 0)::BIGINT AS n_windows,
           coalesce(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
           coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
           (CASE WHEN s.n_tok > 0
                 THEN (10000 * coalesce(c.dup_tokens, 0)) // s.n_tok
                 ELSE 0 END)::BIGINT AS dup_per10k
    FROM seq s LEFT JOIN cov c USING (doc_id)
    """)

    dd_substring_removal_o = engine_oracle(_SUB_WIN + """,
    dw AS (
      SELECT win.doc_id, win.pos,
             row_number() OVER (PARTITION BY win.w
                                ORDER BY win.doc_id, win.pos) AS rn
      FROM win JOIN dup USING (w)
    ),
    rmp AS (SELECT DISTINCT doc_id,
                   unnest(generate_series(pos, pos + 7)) AS p
            FROM dw WHERE rn > 1),
    rml AS (SELECT doc_id, list_sort(list(p)) AS rm FROM rmp GROUP BY doc_id),
    kept AS (
      SELECT s.doc_id, s.n_tok,
             CASE WHEN r.rm IS NULL THEN s.tokens
                  ELSE [s.tokens[i] for i in generate_series(1, len(s.tokens))
                        if NOT list_contains(r.rm, i)]
             END AS tk
      FROM seq s LEFT JOIN rml r USING (doc_id)
    )
    SELECT doc_id, n_tok::BIGINT AS n_tok,
           len(tk)::BIGINT AS n_kept,
           xxh64_intlist(tk) AS kept_hash
    FROM kept
    """)

    # Bloom decontamination: rebuild the SAME 65536-bit filter the engine
    # broadcasts, as a set of bit positions derived from xxh64u(gram) by
    # the identical (h1 + i*h2) mod m double hashing — exact HUGEINT
    # arithmetic, so candidates (FPs included) match the bitset test.
    bloom_decontam_o = engine_oracle(""",
    g AS (SELECT doc_id, string_split(lower(text), ' ') AS words
          FROM documents),
    ng AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 1, 1)),
               i -> array_to_string(words[i:i+2], ' ')))) AS ngram
      FROM g
    ),
    bg AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 37 = 0),
    bh AS (SELECT ngram, xxh64u(ngram) AS u FROM bg),
    bpos AS (
      SELECT DISTINCT ((u // 4294967296) + i.i * (u % 4294967296)) % 65536
               AS pos
      FROM bh CROSS JOIN (SELECT unnest(range(3)) AS i) i
    ),
    cg AS (SELECT DISTINCT doc_id AS c_id, ngram FROM ng
           WHERE doc_id % 37 <> 0),
    ch AS (SELECT c_id, ngram, xxh64u(ngram) AS u FROM cg),
    cand AS (
      SELECT c_id, ngram FROM ch
      WHERE (u // 4294967296) % 65536 IN (SELECT pos FROM bpos)
        AND ((u // 4294967296) + (u % 4294967296)) % 65536
              IN (SELECT pos FROM bpos)
        AND ((u // 4294967296) + 2 * (u % 4294967296)) % 65536
              IN (SELECT pos FROM bpos)
    )
    SELECT c_id AS doc_id,
           count(DISTINCT cand.ngram)::BIGINT AS n_candidates,
           count(DISTINCT b.ngram)::BIGINT AS n_hits
    FROM cand LEFT JOIN bg b ON b.ngram = cand.ngram
    GROUP BY 1
    """)

    # Count-Min sketch: DuckDB rebuilds the 3x512 cell table from the
    # exact unnest histogram via the same xxhash64 fold over (token, r)
    # INT pairs, then min-over-rows point queries for the top-30 probes.
    cms_heavy_o = engine_oracle(""",
    tok AS (SELECT unnest(tokens) AS token_id FROM seq),
    hist AS (SELECT token_id, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
    rr AS (SELECT unnest(range(3)) AS r),
    cms AS (
      SELECT r, xxpmod(xxh64_intlist([token_id::INTEGER, r::INTEGER]), 512)
               AS cell,
             sum(cnt)::BIGINT AS c
      FROM hist CROSS JOIN rr GROUP BY 1, 2
    ),
    probes AS (SELECT token_id, cnt FROM hist
               ORDER BY cnt DESC, token_id LIMIT 30)
    SELECT p.token_id::INTEGER AS token_id, p.cnt AS cnt_exact,
           min(m.c)::BIGINT AS cnt_cms
    FROM probes p CROSS JOIN rr
    JOIN cms m ON m.r = rr.r
      AND m.cell = xxpmod(xxh64_intlist([p.token_id::INTEGER,
                                         rr.r::INTEGER]), 512)
    GROUP BY 1, 2
    """)

    # Bigram lift: same exact integer counts, same single float
    # expression text — round(6) + (x, y) tiebreak pins the top-50.
    bigram_lift_o = engine_oracle(""",
    tok AS (SELECT unnest(tokens) AS t FROM seq),
    uni AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY 1),
    nu AS (SELECT sum(c)::BIGINT AS nu FROM uni),
    bg AS (
      SELECT unnest(list_transform(range(1, len(tokens)),
               i -> struct_pack(x := tokens[i], y := tokens[i+1]))) AS p
      FROM seq WHERE len(tokens) >= 2
    ),
    bc AS (SELECT p.x AS x, p.y AS y, count(*)::BIGINT AS cxy
           FROM bg GROUP BY 1, 2),
    nb AS (SELECT sum(cxy)::BIGINT AS nb FROM bc),
    j AS (
      SELECT x, y, cxy, ux.c AS cx, uy.c AS cy
      FROM bc JOIN uni ux ON ux.t = bc.x JOIN uni uy ON uy.t = bc.y
      WHERE cxy >= 5
    )
    SELECT x::INTEGER AS x, y::INTEGER AS y, cxy, cx, cy,
           round((CAST(cxy AS DOUBLE) * nu.nu * nu.nu) / (CAST(nb.nb AS DOUBLE) * cx * cy), 6)
             AS lift_r
    FROM j, nu, nb
    ORDER BY lift_r DESC, x, y LIMIT 50
    """)

    # Perceptual-hash near-dup: the oracle recomputes each doc's exact-
    # integer aHash straight from the utf-8 bytes (np.resize tiling ==
    # cyclic byte indexing; BMP encode->decode is pixel identity), then
    # replays the band join + Hamming verify.
    phash_o = engine_oracle(""",
    pre AS (
      SELECT doc_id::BIGINT AS doc_id, xxbytes(text) AS bts,
             len(xxbytes(text))::BIGINT AS n,
             greatest(1, least(8, len(xxbytes(text)) // 48))::BIGINT AS hh
      FROM documents WHERE len(xxbytes(text)) > 0
    ),
    smp AS (
      SELECT doc_id,
             list_transform(range(64), s ->
                 bts[((((s // 8) * hh) // 8) * 48 + (s % 8) * 6 + 0) % n + 1]
               + bts[((((s // 8) * hh) // 8) * 48 + (s % 8) * 6 + 1) % n + 1]
               + bts[((((s // 8) * hh) // 8) * 48 + (s % 8) * 6 + 2) % n + 1]
             ) AS sv
      FROM pre
    ),
    ms AS (SELECT doc_id, sv, list_sum(sv) // 64 AS m FROM smp),
    bnd AS (
      SELECT doc_id,
             list_transform(range(4), k ->
               coalesce(list_sum(list_transform(range(16), t ->
                 CASE WHEN sv[k * 16 + t + 1] > m
                      THEN (1::BIGINT << t) ELSE 0 END)), 0)::BIGINT
             ) AS bands
      FROM ms
    ),
    bd AS (SELECT doc_id, bands, unnest(range(4)) AS k FROM bnd),
    bd2 AS (SELECT doc_id, bands, k, bands[k + 1] AS v FROM bd),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.bands AS ba, y.bands AS bb
      FROM bd2 x JOIN bd2 y
        ON x.k = y.k AND x.v = y.v AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b,
           ( bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
           + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4]))
           )::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
        + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4])) <= 3
    """)

    # Stream-stream pair join: with in-order files + 10-min watermark no
    # match is lost, so the drained output is the plain batch range-join.
    streaming_pair_join_o = engine_oracle(""",
    l AS (SELECT source, doc_id AS doc_a, event_ts AS lts FROM seq
          WHERE xxpmod(xxh64(doc_id), 2) = 0),
    r AS (SELECT source, doc_id AS doc_b, event_ts AS rts FROM seq
          WHERE xxpmod(xxh64(doc_id), 2) = 1)
    SELECT l.source, doc_a, doc_b,
           (epoch_us(rts) - epoch_us(lts))::BIGINT AS gap_us
    FROM l JOIN r ON r.source = l.source
      AND rts BETWEEN lts - INTERVAL 3600 SECOND
                  AND lts + INTERVAL 3600 SECOND
    """)

    # Compaction: the store's logical content must be untouched — the
    # oracle recomputes the full per-(tier, day) inventory from scratch.
    compaction_o = engine_oracle(""",
    b AS (
      SELECT source, date_trunc('minute', event_ts) AS b1m,
             date_trunc('hour', event_ts) AS b1h,
             date_trunc('day', event_ts) AS b1d
      FROM seq
    ),
    rows_ AS (
      SELECT '1m' AS tier, b1m::DATE AS day, source, b1m AS bucket FROM b
      UNION ALL
      SELECT '1h', b1h::DATE, source, b1h FROM b
      UNION ALL
      SELECT '1d', b1d::DATE, source, b1d FROM b
    )
    SELECT tier, day::VARCHAR AS day_s,
           count(DISTINCT (source, bucket))::BIGINT AS n_rows,
           count(*)::BIGINT AS ev_sum
    FROM rows_ GROUP BY 1, 2
    """)

    # Audio fingerprint: frame energies from inclusive byte slices; empty
    # frames (n < 65) coalesce to 0 exactly like an empty numpy sum.
    audio_fp_o = engine_oracle(""",
    pre AS (
      SELECT doc_id::BIGINT AS doc_id, xxbytes(lower(text)) AS bts,
             len(xxbytes(lower(text)))::BIGINT AS n
      FROM documents WHERE len(xxbytes(lower(text))) > 0
    ),
    eng AS (
      SELECT doc_id,
             list_transform(range(65), s ->
               256 * coalesce(list_sum(list_transform(
                 bts[((s * n) // 65 + 1)::BIGINT : (((s + 1) * n) // 65)::BIGINT],
                 x -> abs(x - 128))), 0)) AS e
      FROM pre
    ),
    bnd AS (
      SELECT doc_id,
             list_transform(range(4), k ->
               coalesce(list_sum(list_transform(range(16), t ->
                 CASE WHEN e[k * 16 + t + 2] > e[k * 16 + t + 1]
                      THEN (1::BIGINT << t) ELSE 0 END)), 0)::BIGINT
             ) AS bands
      FROM eng
    ),
    u AS (
      SELECT doc_id,
             (bands[1]::HUGEINT + bands[2]::HUGEINT * 65536
              + bands[3]::HUGEINT * 4294967296
              + bands[4]::HUGEINT * 281474976710656) AS uf
      FROM bnd
    )
    SELECT doc_id,
           (CASE WHEN uf >= 9223372036854775808
                 THEN uf - 18446744073709551616 ELSE uf END)::BIGINT AS fp
    FROM u
    """)

    ab_test_o = engine_oracle("""
    , u AS (
      SELECT DISTINCT user_id,
             xxpmod(xxh64(user_id::VARCHAR || '#ab'), 2) AS arm
      FROM events
    ),
    n AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM u
    ),
    ue AS (SELECT DISTINCT e.event_type, e.user_id, u.arm
           FROM events e JOIN u USING (user_id)),
    c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
      FROM ue GROUP BY event_type
    )
    , zz AS (
      SELECT event_type, c_a, c_b, n_a, n_b,
             CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
               round((c_a::DOUBLE / n_a - c_b::DOUBLE / n_b)
                     / sqrt(((c_a + c_b)::DOUBLE / (n_a + n_b))
                            * (1.0 - (c_a + c_b)::DOUBLE / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6)
             END AS z_r
      FROM c CROSS JOIN n
    )
    SELECT event_type, c_a, c_b, n_a, n_b, z_r,
           coalesce(abs(z_r) >= 1.959964, FALSE) AS significant
    FROM zz
    """)

    targeted_delete_o = engine_oracle("""
    SELECT source, epoch(date_trunc('minute', event_ts))::BIGINT AS bucket_s,
           count(*)::BIGINT AS cnt,
           sum(n_tok)::BIGINT AS n_tok_sum,
           sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum
    FROM seq WHERE source NOT IN ('src0', 'src5')
    GROUP BY 1, 2
    """)

    vacuum_o = engine_oracle("""
    SELECT source, epoch(date_trunc('minute', event_ts))::BIGINT AS bucket_s,
           count(*)::BIGINT AS cnt,
           sum(n_tok)::BIGINT AS n_tok_sum,
           sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum
    FROM seq GROUP BY 1, 2
    """)

    time_travel_o = engine_oracle("""
    , d0 AS (SELECT min(event_ts::DATE) AS d FROM seq)
    SELECT source, epoch(date_trunc('minute', event_ts))::BIGINT AS bucket_s,
           count(*)::BIGINT AS cnt,
           sum(n_tok)::BIGINT AS n_tok_sum,
           sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum
    FROM seq, d0 WHERE event_ts::DATE <= d0.d
    GROUP BY 1, 2
    """)

    schema_evo_o = engine_oracle("""
    , mx AS (SELECT max(event_ts::DATE) AS d FROM seq)
    SELECT source, epoch(date_trunc('minute', event_ts))::BIGINT AS bucket_s,
           count(*)::BIGINT AS cnt,
           sum(n_tok)::BIGINT AS n_tok_sum,
           sum(list_aggregate(tokens, 'sum'))::BIGINT AS tok_sum,
           CASE WHEN event_ts::DATE = mx.d THEN 2 END AS pipeline_ver
    FROM seq, mx
    GROUP BY 1, 2, 6
    """)

    freshness_o = engine_oracle("""
    , e AS (SELECT source, epoch(event_ts)::BIGINT AS s FROM seq),
    now_t AS (SELECT max(s) AS now_s FROM e)
    SELECT source,
           count(*)::BIGINT AS n_rows,
           max(s)::BIGINT AS max_event_s,
           (now_s - max(s))::BIGINT AS lag_s,
           (count(*) FILTER (s > now_s - 3600))::BIGINT AS rows_1h,
           (now_s - max(s) > 600) AS is_stale
    FROM e, now_t GROUP BY source, now_s
    """)

    bucketed_join_o = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """

    return {
        "engine_bucketed_join": bucketed_join_o,
        "engine_targeted_delete": targeted_delete_o,
        "engine_vacuum": vacuum_o,
        "engine_time_travel": time_travel_o,
        "engine_schema_evolution": schema_evo_o,
        "engine_freshness": freshness_o,
        "engine_backfill": vacuum_o,  # same full-1m recompute as vacuum
        "x1_ab_test": ab_test_o,
        "tx_bloom_decontam": bloom_decontam_o,
        "sk_cms_heavy": cms_heavy_o,
        "dd_phash": phash_o,
        "dd_audio_fp": audio_fp_o,
        "engine_streaming_pair_join": streaming_pair_join_o,
        "engine_compaction": compaction_o,
        "tx_bigram_lift": bigram_lift_o,
        "dd_substring": dd_substring_o,
        "dd_cdc_chunks": dd_cdc_o,
        "dd_substring_removal": dd_substring_removal_o,
        "engine_token_drift": token_drift,
        "mx_split": mx_split_o,
        "mx_sample": mx_sample_o,
        "mx_shuffle": mx_shuffle_o,
        "mx_weighted": mx_weighted_o,
        "mx_reservoir": mx_reservoir_o,
        "mx_quota": mx_quota_o,
        "engine_bpe_encode": bpe_encode_o,
        "engine_seq_dedup": seq_dedup,
        "engine_seq_pack": seq_pack,
        "engine_seq_chunk": seq_chunk,
        "engine_token_heavy": token_heavy,
        "engine_token_hist": token_hist,
        "engine_token_profile": token_profile,
        "engine_streaming_rollup": streaming_rollup,
        "engine_streaming_ohlc": streaming_ohlc,
        "engine_streaming_silence": streaming_silence,
        "engine_token_movers": token_movers_o,
        "engine_len_hist": len_hist_o,
        "engine_streaming_dedup": streaming_dedup_o,
        "engine_streaming_sessions": streaming_sessions_o,
        "engine_streaming_join": streaming_join,
        "engine_read_range": read_range,
        "engine_streamed_ingest": streamed_ingest,
        "engine_retention": retention,
        "engine_resume_ledger": resume_ledger,
        "engine_read_decoded": read_decoded,
        "engine_codec_blocks": codec_blocks,
        "engine_codec_blocks_spans": codec_blocks,
        "engine_zscore_1h": zscore_1h,
        "engine_streaming_scores": zscore_1h,
        "engine_streaming_token_hist": streaming_token_hist,
        "engine_incremental_derive": incremental_derive,
        "engine_residual_stats": resid_stats,
        "engine_streaming_welford": streaming_welford,
        "ann_lsh": _ann_lsh_oracle(),
    }


def _ann_lsh_oracle() -> str:
    from tsrollup.datapipe import ann_lsh_sql

    return ann_lsh_sql()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK)
    out.update(_engine_queries())
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLE)
    out.update(_engine_oracles())
    return out
