"""Storage layer: Iceberg in production, Parquet shim in the sandbox.

The sandbox has no Iceberg runtime jar and no network (SURVEY.md §0), so all
local paths go through Parquet with the SAME DataFrame code. `fmt='iceberg'`
switches to an Iceberg catalog table at deploy time — the engine never
depends on which one is active.

Layout (S2): rollups/scores/blocks partitioned by (tier, day) so retention
(R1) and time-range reads are partition-pruned; `source_bucket` (a stable
hash bucket of source) bounds per-partition file counts at 10^12 scale
without creating one directory per source.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

# Source hash-bucket count: sized so each (tier, day, source_bucket)
# partition holds a healthy parquet file (hundreds of MB at production
# scale). It is a SIZE target, not a fixed constant — 64+ at 10^12 rows,
# smaller for sandbox fixtures (overridable via env for benches). Read at
# CALL time, not import time, so harnesses may set the env var after
# importing tsrollup (an import-time constant silently ignored it).


def n_source_buckets() -> int:
    return int(os.environ.get("TSROLLUP_SOURCE_BUCKETS", "64"))


#: per-path decision cache for `read_table` (metadata only — partition
#: count and file size; never query results)
_SCAN_SPREAD: dict[str, bool] = {}


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver testdata table, restoring scan parallelism when the
    input arrives unsplittable (optimization guide §2.5).

    The driver's tables are single parquet files, so every one scans as
    1-3 partitions regardless of session cores — and then EVERY scan-stage
    expression (char-n-gram builds, lower/regex, JSON extraction,
    levenshtein bands) runs nearly serially: the documents char-5-gram
    build measured 1.8-2.1 s on the 1-partition scan vs 0.31 s after a
    round-robin spread at sf0.1. The spread only fires when the scan has
    at least 4x fewer partitions than the session has cores AND the file
    is big enough to matter (>=256 KB — dimension tables like region/
    nation stay as-is so broadcast-join plans are untouched); a real
    corpus scans as thousands of splits, so this is a no-op at scale.
    Column pruning and predicate pushdown both traverse Repartition, so
    the exchange carries only the projected columns and PushedFilters
    still reach the scan (verified in-plan). The decision is cached per
    path — partition-count and file-size METADATA, never results."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not spread:
        return df
    do = _SCAN_SPREAD.get(path)
    if do is None:
        try:
            size = (
                os.path.getsize(path)
                if os.path.isfile(path)
                else sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _d, fs in os.walk(path)
                    for f in fs
                )
            )
            do = (
                size >= 262_144
                and 4 * df.rdd.getNumPartitions()
                <= spark.sparkContext.defaultParallelism
            )
        except OSError:
            do = False
        _SCAN_SPREAD[path] = do
    if do:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def read_sequences(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1 — scan of the sequence table.

    Keeps predicates pushable: returns the raw declared-schema scan; callers
    add plain column filters (never UDFs in predicates, SURVEY.md §4).
    """
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
    else:
        df = spark.read.schema(schemas.SEQUENCE_SCHEMA).parquet(path)
    return df


def resolve_event_time(df: DataFrame) -> DataFrame:
    """Single owner of the event-time decision (SURVEY.md §1.2): use
    `event_ts` when present; otherwise derive a deterministic timestamp
    from doc_id (stable hash spread over a fixed 30-day window)."""
    if "event_ts" in df.columns:
        return df
    span_s = 30 * 86400
    return df.withColumn(
        "event_ts",
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("doc_id"), F.lit(span_s))
        ),
    )


def with_source_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "source_bucket", F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int")
    )


def write_partitioned(df: DataFrame, path: str, partition_cols=("tier", "day"), mode: str = "overwrite") -> None:
    """S2 — partitioned columnar sink. Adds a `day` partition column derived
    from bucket_start/block_start when absent."""
    if "day" not in df.columns:
        ts_col = "bucket_start" if "bucket_start" in df.columns else "block_start"
        df = df.withColumn("day", F.to_date(ts_col))
    (df.write.mode(mode).partitionBy(*partition_cols).parquet(path))


def drop_expired_partitions(
    base_path: str, tier: str, horizon_days: int | None, now_day: str,
    span_days: int = 1,
) -> list[str]:
    """R1 — retention enforcement, sandbox realization: prune partition
    directories older than the tier horizon. Iceberg deploy would instead
    issue `DELETE WHERE day < cutoff` + `expire_snapshots`.

    `span_days` is the number of days a partition's rows may extend past
    its `day=` value (block sinks under RollupConfig.block_span_days — a
    span-block partition holds [day, day + span) and is dropped only once
    its WHOLE span is past the horizon, so retention errs toward keeping).

    Returns the list of removed partition dirs. `now_day` is 'YYYY-MM-DD'
    (passed in — the engine never reads the wall clock in kernels)."""
    import datetime as _dt

    if horizon_days is None:
        return []
    cutoff = _dt.date.fromisoformat(now_day) - _dt.timedelta(days=horizon_days)
    tier_dir = os.path.join(base_path, f"tier={tier}")
    removed = []
    if not os.path.isdir(tier_dir):
        return removed
    for name in sorted(os.listdir(tier_dir)):
        if not name.startswith("day="):
            continue
        day = _dt.date.fromisoformat(name.split("=", 1)[1])
        if day + _dt.timedelta(days=span_days - 1) < cutoff:
            shutil.rmtree(os.path.join(tier_dir, name))
            removed.append(os.path.join(tier_dir, name))
    return removed


def retain_store(
    out_base: str, now_day: str, sink_retention: dict | None = None,
    block_span_days: dict | None = None,
) -> dict[str, list[str]]:
    """R1 across the whole store: enforce per-sink, per-tier horizons on
    every day-partitioned sink (rollup, scores, blocks). The default
    policy keeps blocks far longer than the columnar sinks — after the
    rollup partitions expire, the range stays readable via
    query.read_range_decoded (tested end-to-end)."""
    from .config import SINK_RETENTION_DAYS

    policy = SINK_RETENTION_DAYS if sink_retention is None else sink_retention
    spans = block_span_days or {}
    removed: dict[str, list[str]] = {}
    for sink, tiers in policy.items():
        base = os.path.join(out_base, sink)
        if not os.path.isdir(base):
            continue
        gone: list[str] = []
        for tier, horizon in tiers.items():
            span = int(spans.get(tier, 1)) if sink == "blocks" else 1
            gone += drop_expired_partitions(base, tier, horizon, now_day, span)
        removed[sink] = gone
    return removed


def compact_store(
    spark: SparkSession,
    out_base: str,
    sink: str,
    target_files: int = 1,
) -> list[dict]:
    """Small-file compaction — retention's operational sibling. Long-lived
    stores accrete files per partition (every incremental append adds
    one per touched unit); scan cost then tracks FILE count, not byte
    count. For every leaf partition dir of ``<out_base>/<sink>`` holding
    more parquet files than ``target_files``: read the leaf, coalesce,
    write to a hidden sibling tmp dir (dot-prefixed — Spark's file
    index ignores hidden paths, so concurrent readers never see scratch
    dirs as partitions), VERIFY the row count, then atomically swap
    directory names (rename leaf -> .old, tmp -> leaf, drop .old). A
    crash between the renames leaves a recoverable hidden
    ``.__compact_old`` (operator renames it back); leaves already compact are untouched, so
    the pass is idempotent. Iceberg deploy: this job is
    `rewrite_data_files` + `expire_snapshots`; the sandbox realization
    keeps the same verify-then-swap contract on plain dirs.

    Returns one summary dict per compacted leaf:
    (path, files_before, files_after, rows)."""
    base = os.path.join(out_base, sink)
    results: list[dict] = []
    for root, dirs, files in os.walk(base):
        if "__compact" in root:
            continue
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq or len(pq) <= target_files:
            continue
        df = spark.read.parquet(root)
        rows_before = df.count()
        # dot-prefixed siblings: Spark's file index ignores hidden paths,
        # so a concurrent (or crashed-over) reader of the parent never
        # sees the scratch dirs as partitions
        parent, leafname = os.path.split(root)
        tmp = os.path.join(parent, f".{leafname}.__compact_tmp")
        old = os.path.join(parent, f".{leafname}.__compact_old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        rows_after = spark.read.parquet(tmp).count()
        if rows_after != rows_before:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction row-count mismatch in {root}: "
                f"{rows_before} -> {rows_after}; leaf left untouched"
            )
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
        results.append(
            {
                "path": root,
                "files_before": len(pq),
                "files_after": len(
                    [f for f in os.listdir(root) if f.endswith(".parquet")]
                ),
                "rows": rows_before,
            }
        )
    return results


def targeted_delete(
    spark: SparkSession,
    out_base: str,
    sink: str,
    predicate_sql: str,
) -> list[dict]:
    """Targeted row deletion across a partitioned store — the
    right-to-be-forgotten / bad-source purge operation a production lake
    must support. For every leaf partition dir of ``<out_base>/<sink>``
    holding rows matching ``predicate_sql``: rewrite the leaf WITHOUT
    them into a hidden sibling tmp dir, VERIFY the arithmetic
    (rows_after == rows_before - matched), then atomically swap —
    compact_store's verify-then-swap contract, applied to deletes.
    Untouched leaves are never rewritten, so cost tracks the number of
    AFFECTED partitions, not store size; when the delete key correlates
    with the partition layout (e.g. source buckets) that is a tiny
    fraction. Iceberg deploy: this job is a DELETE writing positional
    delete files + rewrite_data_files; the sandbox realization keeps
    the same verify contract on plain dirs.

    Returns one dict per rewritten leaf: (path, rows_before, deleted,
    rows_after)."""
    base = os.path.join(out_base, sink)
    results: list[dict] = []
    for root, _dirs, files in os.walk(base):
        if "__compact" in root or "__delete" in root:
            continue
        pq = [f for f in files if f.endswith(".parquet")]
        if not pq:
            continue
        df = spark.read.parquet(root)
        # NULL-predicate rows (predicate over a nullable column) are
        # RETAINED, not deleted: match-count and keep-filter both coalesce
        # NULL to false so the verify arithmetic below holds exactly
        n_match = df.where(f"coalesce(({predicate_sql}), false)").count()
        if n_match == 0:
            continue
        rows_before = df.count()
        parent, leafname = os.path.split(root)
        tmp = os.path.join(parent, f".{leafname}.__delete_tmp")
        old = os.path.join(parent, f".{leafname}.__delete_old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        (
            df.where(f"NOT coalesce(({predicate_sql}), false)")
            .coalesce(len(pq))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        rows_after = spark.read.parquet(tmp).count()
        if rows_after != rows_before - n_match:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"targeted delete count mismatch in {root}: "
                f"{rows_before} - {n_match} != {rows_after}; leaf untouched"
            )
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
        results.append(
            {
                "path": root,
                "rows_before": rows_before,
                "deleted": n_match,
                "rows_after": rows_after,
            }
        )
    return results


#: scratch-dir suffixes the swap-based maintenance ops may leave behind
#: if they crash between steps (compact_store / targeted_delete)
_SCRATCH_SUFFIXES = (
    ".__compact_tmp", ".__compact_old", ".__delete_tmp", ".__delete_old",
)


def vacuum_store(out_base: str, sink: str) -> list[dict]:
    """Store GC + crash recovery — the vacuum pass that makes the
    verify-then-swap maintenance ops (compact_store, targeted_delete)
    safe to crash ANYWHERE: their scratch dirs are hidden (invisible to
    readers) but they hold bytes, and one crash window — after
    ``rename(leaf, old)`` but before ``rename(tmp, leaf)`` — leaves the
    leaf itself missing. Per hidden scratch dir found:

    - ``.<leaf>.__*_old`` with the leaf MISSING → **restored**: the old
      dir is the last good copy; rename it back (crash recovery).
    - ``.<leaf>.__*_old`` with the leaf present → **removed**: the swap
      completed; the old copy is garbage.
    - ``.<leaf>.__*_tmp`` → **removed**: tmp contents are either
      incomplete or already swapped in under the leaf name; with the
      leaf present-or-restored they are never the only copy.

    Also drops empty leaf directories (left by retention/delete of every
    file). Pure filesystem pass — no Spark job, O(dirs) metadata work;
    Iceberg deploy: `expire_snapshots` + `remove_orphan_files`.
    Idempotent; returns one dict (path, action) per change."""
    base = os.path.join(out_base, sink)
    results: list[dict] = []
    if not os.path.isdir(base):
        return results
    for root, dirs, files in os.walk(base, topdown=False):
        for d in list(dirs):
            full = os.path.join(root, d)
            suffix = next(
                (s for s in _SCRATCH_SUFFIXES if d.endswith(s)), None
            )
            if suffix is None:
                # empty non-scratch dir (no files anywhere below): drop
                if not os.listdir(full):
                    os.rmdir(full)
                    results.append({"path": full, "action": "removed_empty"})
                continue
            leaf = os.path.join(root, d[1 : -len(suffix)])  # strip . and suffix
            if suffix.endswith("_old") and not os.path.exists(leaf):
                os.rename(full, leaf)
                results.append({"path": leaf, "action": "restored"})
            else:
                shutil.rmtree(full)
                results.append({"path": full, "action": "removed"})
    return results


def read_sink_merged(spark: SparkSession, out_base: str, sink: str) -> DataFrame:
    """Schema-evolution read: a long-lived store's leaves legitimately
    disagree on columns (a later pipeline version ADDS one — rollup rows
    gain a field; old leaves predate it). Plain parquet reads take the
    first footer's schema and silently DROP the new column from newer
    leaves; ``mergeSchema`` unions all footers so old rows surface the
    added column as NULL — the Iceberg add-column semantics (there it's
    pure metadata; here the footers carry it). Dropping or renaming a
    column is NOT supported on plain dirs (that genuinely needs Iceberg
    metadata) — widen-only evolution, the append-friendly subset."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(out_base, sink))
    )
