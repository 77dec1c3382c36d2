"""Streamed-rollup ingestion: commit finalized streaming 1m buckets into
the rollup STORE and run the derived phase incrementally.

The streaming drain (streaming.run_streaming_rollup) emits FINAL 1m
rollup rows — append mode under a watermark guarantees each (source,
bucket) is emitted exactly once across drains, strictly later per source
than any previous drain's buckets (the file-sink transaction log makes
the drain itself exactly-once). This module closes the loop:

  drain dir → append 1m rows into the store's tier=1m partitions
            → RE-CASCADE exactly the affected 1h / 1d buckets from the
              store's (now complete) 1m tier — an hour straddling two
              drains is re-aggregated from all of its minutes, so the
              coarser tiers stay exact across drain boundaries
            → preserve-union overwrite of the affected coarse partitions
            → derive(batch_bounds=…): the standard derived phase; with
              state checkpoints present it takes the exactly-incremental
              path (straddling coarse buckets re-enter as non-append and
              fall back per source automatically — exactness first)

Consistency model: ingest is IDEMPOTENT, two layers deep. (a) A
content fingerprint of each drain (row count + order-independent
xxhash64 over all rollup columns) is recorded as a marker in the store
after a successful ingest; re-running the same drain is a no-op skip.
(b) If a crash lands between the 1m commit and the marker (or a caller
replays without markers), the 1m write itself replaces matching
(source, bucket_start, tier) keys instead of blind-appending, and the
re-cascade re-aggregates affected coarse buckets from the store — so a
replay converges to the same bytes instead of double-counting.
Equivalence contract: ingesting drains 1..k yields a store
byte-identical to rollup_build over the raw rows of the finalized
buckets (tests/test_ingest.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import TIER_TRUNC, RollupConfig
from .pipeline import ROLLUP_DIR, derive
from .rollup import ROLLUP_COLS, cascade
from .storage import n_source_buckets


def _bucket_col() -> F.Column:
    return F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int")


def _tag(df: DataFrame) -> DataFrame:
    return df.withColumn("day", F.to_date("bucket_start")).withColumn(
        "source_bucket", _bucket_col()
    )


def _overwrite_replacing(
    spark: SparkSession, new_rows: DataFrame, store_path: str
) -> None:
    """Dynamic-partition overwrite of the partitions present in
    `new_rows`, preserving existing rows in those partitions whose
    (source, bucket_start) key is NOT being replaced."""
    parts = ["tier", "day", "source_bucket"]
    tagged = _tag(new_rows)
    affected = tagged.select(*parts).distinct()
    keys = tagged.select("source", "bucket_start", "tier").distinct()
    keep = (
        spark.read.parquet(store_path)
        .join(F.broadcast(affected), parts, "left_semi")
        .join(F.broadcast(keys), ["source", "bucket_start", "tier"], "left_anti")
    )
    (
        tagged.unionByName(keep)
        .repartition(*parts)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*parts)
        .parquet(store_path)
    )


def ingest_streamed_rollup(
    spark: SparkSession,
    streamed_1m: str | DataFrame,
    out_base: str,
    cfg: RollupConfig | None = None,
    derived: bool = True,
) -> dict:
    """Commit one drain's finalized 1m rows into the store; re-cascade the
    affected 1h/1d buckets; run the (incremental) derived phase. Returns a
    summary {ingested_1m, recascaded per tier, rows_per_tier}."""
    cfg = cfg or RollupConfig()
    new1m = (
        spark.read.parquet(streamed_1m)
        if isinstance(streamed_1m, str)
        else streamed_1m
    ).select(*ROLLUP_COLS)
    new1m = new1m.localCheckpoint(eager=True)  # pin: store is rewritten below
    fp_row = new1m.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: order-independent, cannot overflow under ANSI
        F.sum(F.xxhash64(*ROLLUP_COLS).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    n_new = fp_row["n"]
    summary: dict = {"ingested_1m": n_new}
    if n_new == 0:
        summary["skipped"] = True
        return summary
    drain_id = f"{n_new}_{int(fp_row['h'] or 0) & ((1 << 64) - 1):016x}"
    marker = os.path.join(out_base, "_ingested", f"{drain_id}.marker")
    if os.path.exists(marker):
        summary["skipped_duplicate"] = True
        summary["drain_id"] = drain_id
        return summary
    store_path = os.path.join(out_base, ROLLUP_DIR)

    # ---- 1m commit. First drain bootstraps the store with an append;
    # after that the write REPLACES matching (source, bucket_start, tier)
    # keys (preserve-union dynamic-partition overwrite) so a replayed or
    # crash-retried drain converges instead of double-counting.
    if not os.path.isdir(store_path):
        (
            _tag(new1m)
            .repartition("tier", "day", "source_bucket")
            .write.mode("append")
            .partitionBy("tier", "day", "source_bucket")
            .parquet(store_path)
        )
    else:
        _overwrite_replacing(spark, new1m, store_path)

    # ---- re-cascade affected coarse buckets from the store's finer tier.
    # An affected coarse bucket is any one containing a new finer row; it
    # is re-aggregated from ALL of its finer rows (pruned read + semi-join
    # on the truncated bucket), so straddling drains stays exact.
    bounds = [
        new1m.groupBy("source", "tier").agg(
            F.min("bucket_start").alias("min_bucket"),
            F.max("bucket_start").alias("max_bucket"),
        )
    ]
    finer_new = new1m
    for tier in cfg.tiers:
        if tier == "1m":
            continue
        trunc = TIER_TRUNC[tier]
        affected_buckets = (
            finer_new.select(
                "source",
                F.date_trunc(trunc, "bucket_start").alias("bucket_start"),
            ).distinct()
        ).localCheckpoint(eager=True)
        days = affected_buckets.select(
            F.to_date("bucket_start").alias("day")
        ).distinct()
        finer_tier = "1m" if tier == "1h" else "1h"
        finer_rows = (
            spark.read.parquet(store_path)
            .where(F.col("tier") == finer_tier)
            .join(F.broadcast(days), ["day"], "left_semi")
            .select(*ROLLUP_COLS)
            .withColumn("_coarse", F.date_trunc(trunc, "bucket_start"))
            .join(
                F.broadcast(
                    affected_buckets.withColumnRenamed("bucket_start", "_coarse")
                ),
                ["source", "_coarse"],
                "left_semi",
            )
            .drop("_coarse")
        )
        re_agg = cascade(finer_rows, tier).localCheckpoint(eager=True)
        summary[f"recascaded_{tier}"] = re_agg.count()
        _overwrite_replacing(spark, re_agg, store_path)
        bounds.append(
            re_agg.groupBy("source", "tier").agg(
                F.min("bucket_start").alias("min_bucket"),
                F.max("bucket_start").alias("max_bucket"),
            )
        )
        finer_new = re_agg

    if derived:
        batch_bounds = bounds[0]
        for b in bounds[1:]:
            batch_bounds = batch_bounds.unionByName(b)
        touched = sorted(
            r[0]
            for r in _tag(new1m).select("source_bucket").distinct().collect()
        )
        phases: dict = {}
        summary["rows_per_tier"] = derive(
            spark, out_base, cfg, touched_buckets=touched,
            phases=phases, batch_bounds=batch_bounds.localCheckpoint(eager=True),
        )
        summary["phases"] = phases

    # commit the drain marker LAST (atomic rename): a crash anywhere above
    # leaves no marker, and the retry converges via the key-replacing 1m
    # write + store-side re-cascade.
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(drain_id)
    os.replace(tmp, marker)
    summary["drain_id"] = drain_id
    return summary
