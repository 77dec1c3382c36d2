"""Gap-fill: per-source bucket spine + LOCF / linear interpolation
(SURVEY.md §2.5, operators G1/G2).

Spine = `sequence(min_bucket, max_bucket, tier_interval)` per source —
each source's own active span, never a global range. Rollup rows
left-join onto the spine; synthesized rows get cnt=0, gap_filled=true,
and interpolated VALUE columns only (n_tok_mean, tok_mean). Sums, counts
and extrema are never interpolated (they'd stop being algebraic facts).

LOCF is a pure copy — expressed as a Spark window (`last ignorenulls`),
exactly matching the oracle's ffill. Linear interpolation is float math,
so it runs through the pinned kernel (kernels.linear_fill) inside one
applyInPandas per source.

Scale note: a source spanning Y years at the 1m tier yields ~525k×Y spine
entries from ONE sequence() array. The spine generator therefore chunks
the range by day first (sequence of days, explode, then sequence of
buckets within each day) so no single array exceeds 1440 elements.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import kernels
from .config import TIER_INTERVAL, RollupConfig

VALUE_COLS = ("n_tok_mean", "tok_mean")


def build_spine(rollup: DataFrame, tier: str) -> DataFrame:
    """G1 — one row per (source, expected bucket) over each source's span."""
    bounds = rollup.groupBy("source").agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    if tier == "1d":
        return bounds.select(
            "source",
            F.explode(F.expr(f"sequence(b0, b1, {TIER_INTERVAL[tier]})")).alias("bucket_start"),
        )
    # chunk by day so no sequence() array exceeds one day of buckets
    days = bounds.select(
        "source", "b0", "b1",
        F.explode(F.expr("sequence(date_trunc('day', b0), date_trunc('day', b1), INTERVAL 1 DAY)")).alias("day_start"),
    )
    return days.select(
        "source",
        F.explode(
            F.expr(
                f"sequence(greatest(day_start, b0), "
                f"least(day_start + INTERVAL 1 DAY - {TIER_INTERVAL[tier]}, b1), "
                f"{TIER_INTERVAL[tier]})"
            )
        ).alias("bucket_start"),
    )


def gapfill(rollup: DataFrame, tier: str, cfg: RollupConfig | None = None) -> DataFrame:
    """G1+G2 — left-join rollup onto the spine and fill value columns."""
    cfg = cfg or RollupConfig()
    spine = build_spine(rollup, tier)
    joined = spine.join(rollup, ["source", "bucket_start"], "left")
    filled = joined.select(
        "source",
        "bucket_start",
        F.lit(tier).alias("tier"),
        F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"),
        "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean",
        "tok_sum", "tok_cnt", "tok_min", "tok_max", "tok_mean",
        F.coalesce("gap_filled", F.lit(True)).alias("gap_filled"),
    )
    if cfg.gapfill_method == "locf":
        w = (
            Window.partitionBy("source")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in VALUE_COLS:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return filled
    if cfg.gapfill_method == "linear":
        return _linear_gapfill(filled)
    raise ValueError(f"unknown gapfill method {cfg.gapfill_method!r}")


def _linear_gapfill(filled: DataFrame) -> DataFrame:
    """G2 'linear' via the pinned kernel, one pandas group per source."""
    schema = filled.schema

    def fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start", kind="mergesort").reset_index(drop=True)
        observed = ~pdf["gap_filled"].to_numpy()
        for c in VALUE_COLS:
            pdf[c] = kernels.linear_fill(pdf[c].to_numpy(dtype="float64"), observed)
        return pdf

    return filled.groupBy("source").applyInPandas(fill_group, schema=schema)
