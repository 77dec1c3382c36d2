"""Read-side query planner: tier selection + pruned range reads.

A continuous-aggregate store is only useful if readers never touch more
data than the question needs. This module is that read path:

- `choose_tier` picks the COARSEST tier that still satisfies the requested
  output resolution — coarser tiers have ~60× fewer rows per step, so a
  dashboard asking for hourly points over a year reads the 1h tier
  (~8.8k rows/source), never the 1m tier (~526k rows/source).
- Retention-aware: a tier whose horizon has already expired over part of
  the requested range can't serve it (the rows are gone, R1); the planner
  falls back to the coarsest *retained* tier that covers the range.
- `read_range` turns (start, end) into BOTH a `day` partition predicate
  (prunes directories/manifests before any I/O — the store is partitioned
  by (tier, day), storage.py) and a `bucket_start` row predicate (parquet
  min/max pushdown within the surviving files).

At 10^12 rows the difference between "scan the store" and "open three
day-partitions of the 1d tier" is the whole game; the tests assert the
pruning is visible in the physical plan, not just hoped for.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import SINK_RETENTION_DAYS, TIER_RETENTION_DAYS, TIER_US, TIERS
from .pipeline import ROLLUP_DIR


def _to_dt(x: str | _dt.datetime) -> _dt.datetime:
    return _dt.datetime.fromisoformat(x) if isinstance(x, str) else x


def choose_tier(
    start: str | _dt.datetime,
    end: str | _dt.datetime,
    resolution_s: int | None = None,
    now_day: str | None = None,
    retention: dict | None = None,
) -> str:
    """Pick the coarsest tier that satisfies `resolution_s` AND still
    retains the whole requested range.

    resolution_s=None means "as coarse as retention allows" (aggregate
    overviews); resolution_s=60 forces the 1m tier while it's retained.
    Raises if no retained tier can serve the range (older than every
    retained horizon) — callers must widen resolution or shrink the range.
    """
    start, end = _to_dt(start), _to_dt(end)
    if end < start:
        raise ValueError(f"end {end} before start {start}")
    retention = TIER_RETENTION_DAYS if retention is None else retention

    def retained_from(tier: str) -> _dt.date | None:
        horizon = retention.get(tier)
        if horizon is None or now_day is None:
            return None  # kept forever (or caller opted out of the check)
        return _dt.date.fromisoformat(now_day) - _dt.timedelta(days=horizon)

    candidates = []
    for tier in TIERS:  # finest → coarsest
        if resolution_s is not None and TIER_US[tier] > resolution_s * 1_000_000:
            continue  # bucket wider than the requested resolution
        edge = retained_from(tier)
        if edge is not None and start.date() < edge:
            continue  # range reaches past this tier's retention horizon
        candidates.append(tier)
    if not candidates:
        raise ValueError(
            f"no retained tier serves [{start}, {end}] at resolution "
            f"{resolution_s}s (retention: {retention}, now={now_day})"
        )
    return candidates[-1]  # coarsest survivor


def read_range(
    spark: SparkSession,
    out_base: str,
    start: str | _dt.datetime,
    end: str | _dt.datetime,
    resolution_s: int | None = None,
    sources: list[str] | None = None,
    now_day: str | None = None,
    dataset: str = ROLLUP_DIR,
) -> DataFrame:
    """Pruned range read of the rollup store at the chosen tier.

    The `day` predicate is the partition-pruning one (directories never
    listed); `bucket_start` bounds rows within surviving files via parquet
    min/max stats; an optional `source` IN-list rides the same scan.
    Gap-filled rows are included (they ARE the tier's contract); callers
    that want raw-mass-only add `~gap_filled`.
    """
    start_dt, end_dt = _to_dt(start), _to_dt(end)
    tier = choose_tier(start_dt, end_dt, resolution_s, now_day)
    df = (
        spark.read.parquet(os.path.join(out_base, dataset))
        .where(F.col("tier") == tier)
        .where(
            (F.col("day") >= F.lit(start_dt.date().isoformat()).cast("date"))
            & (F.col("day") <= F.lit(end_dt.date().isoformat()).cast("date"))
        )
        .where(
            (F.col("bucket_start") >= F.lit(start_dt))
            & (F.col("bucket_start") < F.lit(end_dt))
        )
    )
    if sources:
        df = df.where(F.col("source").isin(list(sources)))
    return df


def read_range_decoded(
    spark: SparkSession,
    out_base: str,
    start: str | _dt.datetime,
    end: str | _dt.datetime,
    metric: str = "n_tok_mean",
    resolution_s: int | None = None,
    sources: list[str] | None = None,
    now_day: str | None = None,
    retention: dict | None = None,
    block_span_days: dict | None = None,
) -> DataFrame:
    """Pruned range read served from the COMPRESSED block store.

    Same planner contract as read_range, but the bytes come from the
    Gorilla/delta-of-delta blobs (one row per (source, tier, metric,
    span-block)) instead of the columnar rollup partitions: `day` prunes
    block partitions before any I/O (a block never crosses its tier's
    span boundary, codec.compress_tier), the decode is an Arrow-batched
    mapInPandas, and the bucket_start range trims the decoded points.
    This is the cold-read path — it stays valid after the rollup tier's
    columnar partitions age out, as long as the denser block retention
    keeps them (blocks are ~8-20x smaller, so their horizon is longer at
    equal budget). Decoded points byte-match the gap-filled tier
    (tests/test_codec.py round-trip; tests/test_query.py end-to-end).
    """
    from .codec import DEC_METRIC, decompress_blocks
    from .pipeline import BLOCKS_DIR

    start_dt, end_dt = _to_dt(start), _to_dt(end)
    # Tier choice must follow the BLOCK store's horizons, not the columnar
    # tier's: serving ranges after columnar expiry is this path's whole
    # point (blocks keep 90/365-day horizons, SINK_RETENTION_DAYS).
    blocks_retention = SINK_RETENTION_DAYS["blocks"] if retention is None else retention
    tier = choose_tier(start_dt, end_dt, resolution_s, now_day, blocks_retention)
    # a decomposed row holds ALL metrics of its day-block, so the pushed
    # predicate keeps both the requested classic rows and __dec__ rows;
    # decompress re-derives only the requested metric from the latter
    # a block's rows extend up to block_span_days past its day= value
    # (RollupConfig.block_span_days used at build time), so the pruning
    # lower bound reaches back span-1 days; the upper bound is exact (a
    # block never starts after its first point)
    spans = block_span_days or {}
    lo = start_dt.date() - _dt.timedelta(days=int(spans.get(tier, 1)) - 1)
    bl = (
        spark.read.parquet(os.path.join(out_base, BLOCKS_DIR))
        .where(F.col("tier") == tier)
        .where(F.col("metric").isin(metric, DEC_METRIC))
        .where(
            (F.col("day") >= F.lit(lo.isoformat()).cast("date"))
            & (F.col("day") <= F.lit(end_dt.date().isoformat()).cast("date"))
        )
    )
    if sources:
        bl = bl.where(F.col("source").isin(list(sources)))
    dec = decompress_blocks(bl, wanted=metric)
    return dec.where(
        (F.col("bucket_start") >= F.lit(start_dt))
        & (F.col("bucket_start") < F.lit(end_dt))
    )
