"""Top-level entry points (SURVEY.md §3): rollup_build and score.

rollup_build is the flagship batch job:

    scan → resume-filter (anti-join vs ledger) → salted 1m aggregate →
    cascade 1h/1d → dynamic-partition-overwrite the pending units' rollup
    partitions → ledger commit → derived phase (gap-fill → detectors →
    residual stats → Gorilla blocks) over the TOUCHED source_buckets.

The aggregate phase is incremental and exactly-resumable (unit-local
outputs, SURVEY.md §2.9). The derived phase is incremental by
source_bucket: detectors are whole-series recurrences per source, so a
batch re-derives the full history of exactly the buckets it wrote
(partition-pruned read, dynamic-partition overwrite) and leaves the rest
of the derived store untouched — derived wall scales with the batch's
bucket footprint, not the store size.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import resume as res
from .codec import compress_tier
from .config import RollupConfig
from .detect import score_tier
from .gapfill import gapfill
from .rollup import ROLLUP_COLS, cascade, rollup_from_raw
from .storage import n_source_buckets, read_sequences, resolve_event_time

ROLLUP_DIR = "rollup"
SCORES_DIR = "scores"
BLOCKS_DIR = "blocks"
STATS_DIR = "residual_stats"


def _write_units(df: DataFrame, path: str) -> None:
    """Dynamic partition overwrite: only the (tier, day, source_bucket)
    partitions present in `df` — i.e. exactly the pending units — are
    replaced; committed units' partitions are untouched.

    The repartition on the partition columns is the small-files guard:
    without it every shuffle partition writes a sliver into every dir
    (dirs × shuffle.partitions files); with it each dir gets one file."""
    (
        df.repartition("tier", "day", "source_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tier", "day", "source_bucket")
        .parquet(path)
    )


def rollup_build(
    spark: SparkSession,
    input_path: str,
    out_base: str,
    cfg: RollupConfig | None = None,
    run_id: str | None = None,
    derived: bool = True,
) -> dict:
    """Returns a summary dict: {pending_units, input_rows, rows_per_tier,
    wall_agg_s, wall_derived_s, skipped}."""
    cfg = cfg or RollupConfig()
    run_id = run_id or uuid.uuid4().hex
    t0 = time.monotonic()
    phases: dict[str, float] = {}

    def _mark(name: str, since: float) -> float:
        now = time.monotonic()
        phases[name] = round(phases.get(name, 0.0) + (now - since), 3)
        return now

    seq = res.with_unit(resolve_event_time(read_sequences(spark, input_path)))
    done = res.completed_unit_ids(spark, out_base)
    pending = res.filter_pending(seq, done)
    bounds = None
    rollup_path = os.path.join(out_base, ROLLUP_DIR)
    summary: dict = {"run_id": run_id}
    if done is not None:
        # Accounting for rows anti-joined away as already-committed (late
        # data for committed units is NOT silently merged — re-roll it via
        # resume.invalidate_units). The count is an empty-projection scan
        # (parquet footers), cheap even at corpus scale.
        summary["rows_skipped_committed"] = seq.count()  # pending subtracted below

    # ONE scan of the raw corpus: the 1m aggregation carries a per-bucket
    # bit_xor token-hash partial, so unit metrics (row counts + token
    # checksum) fall out of the persisted 1m tier instead of a second pass.
    tp = time.monotonic()
    r1m = rollup_from_raw(pending, "1m", cfg.salt_buckets, with_hash=True).persist()
    unit_stats = (
        r1m.withColumn("unit_id", res.unit_id_col_from_bucket())
        .groupBy("unit_id")
        .agg(
            F.sum("cnt").alias("input_rows"),
            F.expr("bit_xor(hash_xor)").alias("token_checksum"),
        )
        .collect()
    )
    metrics = {r["unit_id"]: dict(r.asDict()) for r in unit_stats}
    summary["pending_units"] = len(metrics)
    tp = _mark("scan_agg_1m", tp)

    if metrics:
        tiers = {"1m": r1m.select(*ROLLUP_COLS)}
        # no eager materialization between cascades (round 6, guide §1.2
        # fewer jobs): the write job materializes both persisted cascade
        # tiers; the 1h subtree appearing under both the union branch and
        # the 1d cascade is an 8k-row agg over the cached 1m tier, so the
        # worst-case duplicate evaluation inside that one job is far
        # cheaper than the extra scheduling round the old count() paid
        tiers["1h"] = cascade(tiers["1m"], "1h").persist()
        tiers["1d"] = cascade(tiers["1h"], "1d").persist()
        tp = _mark("cascade", tp)
        tagged = None
        for df in tiers.values():
            t = df.withColumn("day", F.to_date("bucket_start")).withColumn(
                "source_bucket",
                F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int"),
            )
            tagged = t if tagged is None else tagged.unionByName(t)
        _write_units(tagged, rollup_path)
        tp = _mark("rollup_write", tp)

        # per-unit output-row counts from the persisted (in-memory) tiers —
        # never rescan the store (it grows with history, a batch doesn't);
        # one job over the already-built union instead of one per tier.
        # Runs in a thread OVERLAPPED with the derived phase (guide §2.6):
        # the derive jobs read the just-written store from disk, never the
        # ledger, and the current ordering already commits the ledger
        # before derive — so crash semantics are unchanged while the
        # count job + ledger I/O back-fill the derive stages' tail. The
        # tier caches stay pinned until the thread finishes (the join is
        # before unpersist below).
        def _ledger_commit():
            out_counts = (
                tagged.select(res.unit_id_col().alias("unit_id"), "tier")
                .groupBy("unit_id", "tier")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            wall_ms = int((time.monotonic() - t0) * 1000)
            for r in out_counts:
                if r["unit_id"] in metrics:
                    metrics[r["unit_id"]][f"out_rows_{r['tier']}"] = r["n"]
            for m in metrics.values():
                m["wall_ms"] = wall_ms
            res.commit_ledger(out_base, list(metrics.values()), run_id)

        from concurrent.futures import ThreadPoolExecutor

        ledger_pool = ThreadPoolExecutor(max_workers=1)
        ledger_fut = ledger_pool.submit(_ledger_commit)
        summary["input_rows"] = sum(m["input_rows"] for m in metrics.values())
        if "rows_skipped_committed" in summary:
            summary["rows_skipped_committed"] -= summary["input_rows"]
        if (
            derived
            and cfg.incremental
            and not cfg.detector.shard_buckets
            # only pay the bounds job when the incremental path can run:
            # without per-(source, tier) state checkpoints derive() falls
            # back to the full recompute and never reads `bounds` (first
            # build of a store — the bench shape — saved one eager job)
            and os.path.exists(os.path.join(out_base, increment_mod().STATE_DIR))
        ):
            # the batch's per-(source, tier) bounds feed the incremental
            # derived phase; checkpointed eagerly while `tagged` is cached
            # (O(sources x tiers) rows, stays distributed)
            bounds = (
                tagged.groupBy("source", "tier")
                .agg(
                    F.min("bucket_start").alias("min_bucket"),
                    F.max("bucket_start").alias("max_bucket"),
                )
                .localCheckpoint(eager=True)
            )
    else:
        r1m.unpersist()
        summary["input_rows"] = 0
        summary["skipped"] = True
        ledger_fut = ledger_pool = None

    summary["wall_agg_s"] = time.monotonic() - t0

    try:
        if derived:
            t1 = time.monotonic()
            touched = sorted({int(u.split("/")[0]) for u in metrics}) if metrics else []
            summary["touched_buckets"] = len(touched)
            summary["rows_per_tier"] = derive(
                spark, out_base, cfg, touched_buckets=touched, phases=phases,
                batch_bounds=bounds,
            )
            summary["wall_derived_s"] = time.monotonic() - t1
    finally:
        # ledger thread joins before the tier caches it reads go away
        if ledger_fut is not None:
            ledger_fut.result()
            ledger_pool.shutdown()
        if metrics:
            for df in tiers.values():
                df.unpersist()
            r1m.unpersist()
    summary["phases"] = phases
    return summary


def increment_mod():
    from . import increment

    return increment


def derive(
    spark: SparkSession,
    out_base: str,
    cfg: RollupConfig | None = None,
    touched_buckets: list[int] | None = None,
    phases: dict | None = None,
    batch_bounds: DataFrame | None = None,
) -> dict:
    """Derived phase: gap-fill → scores → residual stats → blocks per tier.

    Incremental by source_bucket: detectors are whole-series recurrences
    per SOURCE, so the exact unit of re-derivation is a source's full
    history — i.e. a source_bucket partition (partition-pruned read: a
    bucket's history lives under tier=*/day=*/source_bucket=<b>). With
    `touched_buckets` (the buckets the batch wrote), only those are
    recomputed and dynamic-partition-overwritten; untouched buckets'
    derived partitions are untouched — derived wall scales with the
    batch's bucket footprint, not the store. None = full recompute.
    Byte-equality with the full recompute is guaranteed because derived
    tables are pure per-source functions of the rollup store
    (tests/test_resume.py exercises this through rollup_build)."""
    cfg = cfg or RollupConfig()
    phases = phases if phases is not None else {}

    def _mark(name: str, since: float) -> float:
        now = time.monotonic()
        phases[name] = round(phases.get(name, 0.0) + (now - since), 3)
        return now

    rollup_path = os.path.join(out_base, ROLLUP_DIR)
    if touched_buckets is not None and not touched_buckets:
        return {}  # empty batch: nothing to derive (store may not even exist)
    store = spark.read.parquet(rollup_path)
    if touched_buckets is not None:
        store = store.where(F.col("source_bucket").isin([int(b) for b in touched_buckets]))

    # Exactly-incremental path: when per-(source, tier) detector-state
    # checkpoints exist and the batch's bounds are known, re-derive ONLY
    # the appended segments (+ a bounded day-partial halo); late data
    # falls back to per-source full recompute inside the same call.
    # Byte-identical to the full path (tests/test_increment.py).
    if (
        cfg.incremental
        and not cfg.detector.shard_buckets
        and batch_bounds is not None
        and os.path.exists(os.path.join(out_base, increment_mod().STATE_DIR))
    ):
        return increment_mod().incremental_derive(
            spark, out_base, cfg, batch_bounds, touched_buckets, phases
        )

    rows_per_tier = {}
    scores_all = stats_all = blocks_all = None
    persisted = []
    tp = time.monotonic()
    if not cfg.detector.shard_buckets:
        # Fused path (default): run gap-fill + scores + residual stats +
        # Gorilla blocks in ONE grouped-map pass clustered on
        # (source, tier) across ALL tiers — one shuffle of the RAW tier
        # rows and one Arrow exchange; the dense gap-filled grid is built
        # inside the kernel and never shuffles (detect._fill_group_pdf).
        # The split into the three sink tables reads the persisted kernel
        # output. emit_state=True checkpoints the per-(source, tier)
        # grid-cut detector state that enables the incremental path next
        # run.
        from .detect import derive_fused

        raw_union = store.where(F.col("tier").isin(list(cfg.tiers))).select(
            *ROLLUP_COLS
        )
        fused = derive_fused(
            raw_union, cfg, emit_state=True, fill=cfg.gapfill_method
        ).persist()
        persisted.append(fused)
        counts = (
            fused.where("kind = 'score' AND detector = 'zscore'")
            .groupBy("tier").count().collect()
        )
        rows_per_tier = {r["tier"]: r["count"] for r in counts}
        for tier in cfg.tiers:
            rows_per_tier.setdefault(tier, 0)
        tp = _mark("derive_fused", tp)
        scores_all = fused.where("kind = 'score'").select(
            "source", "bucket_start", "tier", "detector", "value", "score", "is_anomaly"
        )
        stats_all = fused.where("kind = 'stat'").select(
            "source", "tier", "detector",
            F.col("n").cast("long").alias("n"), "mean", "var_pop",
        )
        blocks_all = fused.where("kind = 'block'").select(
            "source", "tier", "metric", "block_start", "n_points",
            "ts_dod_blob", "val_xor_blob",
        )
    else:
        for tier in cfg.tiers:
            tier_df = store.where(F.col("tier") == tier).select(*ROLLUP_COLS)
            filled = gapfill(tier_df, tier, cfg).persist()
            persisted.append(filled)
            rows_per_tier[tier] = filled.count()
            tp = _mark("gapfill", tp)
            from .detect import score_tier_sharded

            sc, st = score_tier_sharded(filled, tier, cfg)
            bl = compress_tier(filled, tier, cfg)
            scores_all = sc if scores_all is None else scores_all.unionByName(sc)
            stats_all = st if stats_all is None else stats_all.unionByName(st)
            blocks_all = bl if blocks_all is None else blocks_all.unionByName(bl)

    bucket = F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int")

    def _write(df: DataFrame, path: str, parts: tuple[str, ...]) -> None:
        (
            df.repartition(*parts)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(path)
        )

    # The sink writes are independent jobs over the same persisted kernel
    # output — submit them CONCURRENTLY (py4j job submission is
    # thread-safe; Spark's scheduler interleaves the stages), so the
    # derived phase pays max(write walls), not their sum. At small batch
    # sizes the writes are the fixed-latency floor of the whole job.
    tp = time.monotonic()
    jobs = [
        (
            "scores_write",
            scores_all.withColumn("day", F.to_date("bucket_start"))
            .withColumn("source_bucket", bucket),
            os.path.join(out_base, SCORES_DIR),
            ("tier", "day", "source_bucket"),
        ),
        (
            "stats_write",
            stats_all.withColumn("source_bucket", bucket),
            os.path.join(out_base, STATS_DIR),
            ("tier", "source_bucket"),
        ),
        (
            "blocks_write",
            blocks_all.withColumn("day", F.to_date("block_start"))
            .withColumn("source_bucket", bucket),
            os.path.join(out_base, BLOCKS_DIR),
            ("tier", "day", "source_bucket"),
        ),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(_write, df, path, parts) for _n, df, path, parts in jobs]
        if not cfg.detector.shard_buckets:
            from .increment import STATE_COLS, write_states

            futs.append(
                pool.submit(
                    write_states,
                    persisted[0].where("kind = 'state'").select(*STATE_COLS),
                    out_base,
                )
            )
        for f in futs:
            f.result()
    tp = _mark("sink_writes", tp)
    for df in persisted:
        df.unpersist()
    return rows_per_tier


def score(
    spark: SparkSession, out_base: str, tier: str, cfg: RollupConfig | None = None
) -> DataFrame:
    """§3.2 — detector-only pass over an existing rollup store (re-score
    with new tau/alpha/W without re-aggregating). Partition-pruned read."""
    cfg = cfg or RollupConfig()
    store = spark.read.parquet(os.path.join(out_base, ROLLUP_DIR))
    tier_df = store.where(F.col("tier") == tier).select(*ROLLUP_COLS)
    return score_tier(gapfill(tier_df, tier, cfg), tier, cfg)
