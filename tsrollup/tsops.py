"""Monitoring-style derived series: counter increase/rate, seasonal-naive
deviation, exact windowed correlation.

Three analytics every time-series store ends up serving, each expressed
entirely in built-in expressions (no Python on the scan path):

- **Counter increase / rate** (the PromQL ``increase()``/``rate()``
  semantics): a monotonically-increasing counter that occasionally
  RESETS to zero (process restart) yields per-bucket consumption as the
  sum of positive adjacent deltas, where a negative delta is a reset and
  contributes the post-reset value. One window pass per series key (lag)
  + one hash aggregate on (keys, bucket). The first row of a series has
  no attributable increase and is excluded (matches the "no extrapolation"
  reading; extrapolating partial windows is a presentation choice layered
  on top).

- **Seasonal-naive deviation**: per-bucket count vs the SAME bucket one
  season earlier (e.g. 24 h), the classic "today vs yesterday" anomaly
  baseline. Implemented as an equi-self-join on ``bucket - season`` —
  time-based, so missing seasons give NULL rather than silently comparing
  against the wrong row (a row-based ``lag(24)`` breaks on gaps). All
  outputs are exact integers.

- **Exact correlation** of two bucketed count series: Pearson r assembled
  from six BIGINT sums (n, Σx, Σy, Σxy, Σx², Σy²) cast to double only in
  the final closed-form expression. Because the accumulators are exact
  integers, the float result is a deterministic function of the data —
  no summation-order noise — so it can be hash-compared against a SQL
  oracle that uses the identical expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per (keys, time bucket) counter consumption with reset handling.

    Returns keys + ``bucket`` + ``increase`` (double: sum of
    reset-adjusted adjacent deltas whose RIGHT endpoint falls in the
    bucket) + ``n_resets`` (bigint) + ``n_samples`` (bigint, delta count).
    `tiebreak` pins the order of equal timestamps (required for
    deterministic deltas).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value_col).over(w)
    delta = F.col(value_col) - prev
    adj = F.when(prev.isNull(), None).otherwise(
        F.when(delta < 0, F.col(value_col)).otherwise(delta)
    )
    with_delta = df.select(
        *keys,
        F.date_trunc(bucket, ts_col).alias("bucket"),
        adj.alias("__adj"),
        F.when(delta < 0, F.lit(1)).otherwise(F.lit(0)).alias("__reset"),
    ).where(F.col("__adj").isNotNull())
    return with_delta.groupBy(*keys, "bucket").agg(
        F.sum("__adj").alias("increase"),
        F.sum("__reset").cast("bigint").alias("n_resets"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def counter_rate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    bucket_seconds: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """``counter_increase`` divided by the bucket span — per-second rate."""
    inc = counter_increase(df, keys, ts_col, value_col, bucket, tiebreak)
    return inc.withColumn(
        "rate_per_s", F.col("increase") / F.lit(float(bucket_seconds))
    )


def seasonal_naive(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    bucket: str = "hour",
    season: str = "24 hours",
) -> DataFrame:
    """Per (keys, bucket) count vs the same bucket one `season` earlier.

    Returns keys + ``bucket`` + ``cnt`` + ``cnt_season`` (NULL when the
    seasonal bucket has no rows — e.g. the first day) + ``dev``
    (cnt - cnt_season, NULL-propagating). Exact integer arithmetic.
    """
    cnts = df.groupBy(*keys, F.date_trunc(bucket, ts_col).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    season_expr = F.expr(f"bucket - INTERVAL {season}")
    left = cnts.withColumn("__season_bucket", season_expr)
    right = cnts.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        F.col("bucket").alias("__r_bucket"),
        F.col("cnt").alias("cnt_season"),
    )
    cond = [left[k] == right[f"__r_{k}"] for k in keys] + [
        left["__season_bucket"] == right["__r_bucket"]
    ]
    return (
        left.join(right, cond, "left")
        .select(
            *keys,
            "bucket",
            "cnt",
            "cnt_season",
            (F.col("cnt") - F.col("cnt_season")).alias("dev"),
        )
    )


def exact_corr_pair(
    df: DataFrame,
    group: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pearson r of (x_col, y_col) per `group`, assembled from exact
    BIGINT sums so the double result is summation-order-free.

    Input columns must be integral (counts). Returns group + ``n_pts`` +
    ``r`` (NULL when either series is constant — zero variance).
    """
    sums = df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x_col).alias("__sx"),
        F.sum(y_col).alias("__sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("__sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("__sxx"),
        F.sum(F.col(y_col) * F.col(y_col)).alias("__syy"),
    )
    n = F.col("n_pts").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    r = F.when(
        (varx > 0) & (vary > 0),
        (n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)),
    )
    return sums.select(*group, "n_pts", r.alias("r"))
