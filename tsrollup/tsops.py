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

- **CUSUM changepoint detector** (Page 1954, tabular form): the usual
  statement is a sequential recurrence g⁺_t = max(0, g⁺_{t-1} + (x_t −
  μ₀ − kσ)) — but reflection-at-zero has a closed form: with S_t the
  prefix sum of the increments, g⁺_t = S_t − min(0, min_{j≤t} S_j). That
  turns the "inherently sequential" detector into TWO running window
  aggregates (a cumulative sum and a running min over it) — pure
  whole-stage-codegen window algebra, no kernel, no Arrow exchange, and
  the identical closed form runs in the SQL oracle. μ₀/σ are the per-key
  population moments assembled from exact integer sums (inputs are
  counts), so both engines evaluate the same doubles in the same order.

- **Robust rolling z-score**: median/IQR replace mean/std — one wild
  outlier inside the trailing window no longer poisons the baseline that
  judges its successors (the classic masking failure of moment-based
  detectors). Spark's exact `percentile` aggregate runs over a row frame
  (median() does not), and DuckDB's `quantile_cont` pins the same
  (n−1)·p linear interpolation, so the twin is value-exact on integral
  inputs.

- **Exact percentile rollup**: per-bucket p50/p90/p99 via the same exact
  percentile aggregate — the go-to latency/size rollup. For re-aggregable
  (approximate, mergeable) percentiles across tiers see
  tsrollup.sketches; this operator is the exact single-pass form.
"""

from __future__ import annotations

import pandas as pd
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


#: seconds per date_trunc bucket name — used to derive/validate the span
#: counter_rate divides by (a 'day' bucket with a silently-default 3600
#: would inflate rates 24x).
_BUCKET_SECONDS = {"minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def counter_rate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    bucket_seconds: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """``counter_increase`` divided by the bucket span — per-second rate.

    ``bucket_seconds`` is derived from the bucket name; passing it
    explicitly for a known bucket must agree (consistency-checked)."""
    known = _BUCKET_SECONDS.get(bucket)
    if bucket_seconds is None:
        if known is None:
            raise ValueError(
                f"bucket {bucket!r} has no known span; pass bucket_seconds"
            )
        bucket_seconds = known
    elif known is not None and bucket_seconds != known:
        raise ValueError(
            f"bucket_seconds={bucket_seconds} contradicts bucket "
            f"{bucket!r} ({known}s)"
        )
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


def cusum(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    k_sigmas: float = 0.5,
    h_sigmas: float = 5.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided tabular CUSUM per series key, closed-form (module doc).

    Baseline μ₀ and population σ are computed per key from exact sums
    (`value_col` should be integral — counts — for a bit-deterministic
    result): σ = sqrt(n·Σx² − (Σx)²)/n. Allowance k = k_sigmas·σ,
    threshold h = h_sigmas·σ. Returns keys + ts + value + ``g_pos`` +
    ``g_neg`` (the one-sided statistics, ≥0) + ``is_change`` (either side
    over h; false everywhere when σ = 0 — a constant series has no
    changepoints).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__sx"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    stats = stats.select(
        *keys,
        (sx / n).alias("__mu0"),
        (F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))) / n).alias("__sigma"),
    )
    x = F.col(value_col).cast("double")
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s_pos = F.sum(x - F.col("__mu0") - F.lit(k_sigmas) * F.col("__sigma")).over(run)
    s_neg = F.sum(F.col("__mu0") - x - F.lit(k_sigmas) * F.col("__sigma")).over(run)
    carry = [tiebreak] if tiebreak and tiebreak not in (ts_col, value_col) else []
    d = df.join(stats, on=keys, how="inner").select(
        *keys, ts_col, value_col, *carry, "__sigma",
        s_pos.alias("__sp"), s_neg.alias("__sn"),
    )
    g_pos = F.col("__sp") - F.least(F.lit(0.0), F.min("__sp").over(run))
    g_neg = F.col("__sn") - F.least(F.lit(0.0), F.min("__sn").over(run))
    h = F.lit(h_sigmas) * F.col("__sigma")
    return d.select(
        *keys, ts_col, value_col,
        g_pos.alias("g_pos"), g_neg.alias("g_neg"),
        (
            (F.col("__sigma") > 0.0)
            & ((g_pos > h) | (g_neg > h))
        ).alias("is_change"),
    )


def robust_zscore(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window: int = 24,
    tau: float = 3.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Rolling median/IQR robust z per series key (module doc).

    Trailing `window` rows (min_periods = window: NULL score until the
    frame fills). ``robust_z`` = (x − median) / IQR when IQR > 0 else
    0.0, with IQR = q75 − q25 of the same frame; ``is_anomaly`` =
    |robust_z| ≥ tau (NULL in the warmup region). Uses Spark's EXACT
    `percentile` aggregate over the row frame — the (n−1)·p linear
    interpolation DuckDB's quantile_cont also pins.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        -(window - 1), Window.currentRow
    )
    x = F.col(value_col).cast("double")
    vq = value_col.replace("`", "``")  # backquote: names with spaces/dots
    med = F.expr(f"percentile(`{vq}`, 0.5)").over(w)
    q1 = F.expr(f"percentile(`{vq}`, 0.25)").over(w)
    q3 = F.expr(f"percentile(`{vq}`, 0.75)").over(w)
    filled = F.count(F.lit(1)).over(w) >= window
    iqr = q3 - q1
    z = F.when(iqr > 0.0, (x - med) / iqr).otherwise(F.lit(0.0))
    z = F.when(filled, z)
    return df.select(
        *keys, ts_col, value_col,
        F.when(filled, med).alias("med"),
        F.when(filled, iqr).alias("iqr"),
        z.alias("robust_z"),
        F.when(filled, F.abs(z) >= tau).alias("is_anomaly"),
    )


def _pctl_name(p: float) -> str:
    """Column name for a quantile, from an integer basis-points basis so
    every p in [0, 1] gets an unambiguous name: p50/p90/p99 for the common
    two-decimal quantiles (stable with the existing oracle twins), p100
    for 1.0, per-mille/basis-point digits only when needed (0.999 → p999,
    0.9995 → p9995 — any name with >3 digits or value >100 is sub-percent
    resolution by construction)."""
    bp = int(round(p * 10000))
    if not 0 <= bp <= 10000:
        raise ValueError(f"quantile {p} outside [0, 1]")
    if bp % 100 == 0:
        return f"p{bp // 100}"
    if bp % 10 == 0:
        return f"p{bp // 10}"
    return f"p{bp}"


def pctl_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "day",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-(keys, bucket) percentiles of `value_col` — one column
    ``p<NN>`` per requested quantile, plus ``n`` (module doc)."""
    vq = value_col.replace("`", "``")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.expr(f"percentile(`{vq}`, {p!r})").alias(_pctl_name(p)) for p in ps
    ]
    return df.groupBy(
        *keys, F.date_trunc(bucket, ts_col).alias("bucket")
    ).agg(*aggs)


def holt_winters(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Holt double-exponential (level+trend) forecast detector per series
    key over the OBSERVED series (no gap-fill — semantics are row-ordered;
    feed a gap-filled frame for grid semantics). One applyInPandas per
    key running kernels.hw_detector (pinned loop; see its docstring for
    the recurrences). Returns keys + ts + value + level/trend/resid/score.

    Unlike the EWMA detector, the trend term tracks drifting series, so a
    slow ramp stops looking anomalous while a step change still spikes
    the one-step forecast residual.
    """
    import numpy as np
    import pandas as pd

    from .kernels import hw_detector

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    out_schema = (
        f"{key_schema}, {ts_col} {ts_type}, x double, level double, "
        "trend double, resid double, score double"
    )
    # tiebreak pins the order under equal timestamps (same contract as
    # counter_increase/cusum — without it, duplicate-ts inputs would make
    # the recurrence partition-order-dependent)
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    carry = [tiebreak] if tiebreak and tiebreak not in (ts_col, value_col) else []

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        level, trend, resid, score = hw_detector(x, alpha, beta)
        out = {k: pdf[k].to_numpy() for k in keys}
        out[ts_col] = pdf[ts_col].to_numpy()
        out.update(x=x, level=level, trend=trend, resid=resid, score=score)
        return pd.DataFrame(out)

    return (
        df.select(*keys, ts_col, value_col, *carry)
        .groupBy(*keys)
        .applyInPandas(_hw, out_schema)
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


def interval_overlap_join(
    a: DataFrame, b: DataFrame, bucket_us: int = 3_600_000_000
) -> DataFrame:
    """Bounded-duration interval overlap join: all (a, b) pairs whose
    [start_us, end_us] intervals intersect, with the exact intersection
    length. Inputs are (id, start_us, end_us) frames (BIGINT
    microseconds, start <= end); output is (a_id, b_id, overlap_us).

    Scale shape: a naive range-predicate join compiles to a broadcast
    nested loop (quadratic — dead at any real volume). Instead each
    interval is exploded to the `bucket_us`-sized epoch buckets it
    covers (ceil(duration / bucket_us) + 1 rows, O(1) when durations are
    bounded by construction, e.g. sessions/incidents), the join becomes
    an EQUI-join on bucket that hash-partitions and AQE sizes, and the
    exact overlap predicate verifies inside each bucket. A pair spanning
    several buckets would match more than once, so each pair is CLAIMED
    exactly once — only in the bucket containing the overlap's start —
    which removes the de-dup shuffle a distinct() would cost. All bucket
    arithmetic stays in BIGINT (`div`), never double-floor, so epoch
    microseconds round-trip exactly.
    """
    def cov(df: DataFrame, p: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{p}_id"),
            F.col("start_us").alias(f"{p}_start_us"),
            F.col("end_us").alias(f"{p}_end_us"),
            F.explode(
                F.sequence(
                    F.expr(f"start_us div {bucket_us}"),
                    F.expr(f"end_us div {bucket_us}"),
                )
            ).alias("bucket"),
        )

    ov_start = F.greatest("a_start_us", "b_start_us")
    return (
        cov(a, "a")
        .join(cov(b, "b"), "bucket")
        .where(
            (F.col("a_start_us") <= F.col("b_end_us"))
            & (F.col("b_start_us") <= F.col("a_end_us"))
            & (F.col("bucket") == F.expr(f"greatest(a_start_us, b_start_us) div {bucket_us}"))
        )
        .select(
            "a_id",
            "b_id",
            (F.least("a_end_us", "b_end_us") - ov_start).alias("overlap_us"),
        )
    )


def collapse_islands(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    value_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse CONSECUTIVE flagged buckets (rows of
    `df`, one per flagged bucket, integer index `idx_col`) into maximal
    runs per key group — the step that turns per-bucket anomaly flags
    into reportable incident INTERVALS (which e.g. interval_overlap_join
    can then correlate against deploy/maintenance windows).

    The classic trick: idx - row_number() over (keys, ORDER BY idx) is
    constant exactly within a consecutive run, so islands fall out of
    ONE window pass + ONE hash aggregate — no self-join, no iteration.
    Window and aggregate both partition by the keys, so the second
    shuffle reuses the first's partitioning at scale. Output per island:
    keys, start/end index, n_buckets, total/peak of `value_col` — all
    exact integers (hash-twinnable).
    """
    w = Window.partitionBy(*keys).orderBy(idx_col)
    grp = (F.col(idx_col) - F.row_number().over(w)).alias("_grp")
    return (
        df.select(*keys, idx_col, value_col, grp)
        .groupBy(*keys, "_grp")
        .agg(
            F.min(idx_col).alias("start_idx"),
            F.max(idx_col).alias("end_idx"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(value_col).alias("total"),
            F.max(value_col).alias("peak"),
        )
        .drop("_grp")
    )


def xcorr_lags(
    x: DataFrame,
    y: DataFrame,
    lags: list[int],
    idx_col: str = "i",
    val_col: str = "c",
) -> DataFrame:
    """Lagged cross-correlation of two integral bucket series: for each
    lag L, Pearson r over the inner-joined pairs (x[i], y[i+L]) — the
    "does series x lead series y, and by how much?" diagnostic (the r-vs-L
    profile peaks at the lead time). Inputs are (idx_col BIGINT bucket
    index, val_col integral count) frames; output one row per lag:
    (lag, n_pts, r) via exact_corr_pair's BIGINT-sum assembly, so r is
    summation-order-free and hash-twinnable.

    Scale shape: the lag set is a tiny literal array exploded onto the x
    side (|lags| copies — a constant factor, not a join), and the shift
    becomes ONE equi-join on the computed key i + lag that Catalyst
    hash-partitions; per-lag reduction is one hash agg on `lag`. No
    window over the full series, no |lags| separate passes.
    """
    xs = x.select(F.col(idx_col).alias("i"), F.col(val_col).alias("xv"))
    ys = y.select(F.col(idx_col).alias("j"), F.col(val_col).alias("yv"))
    ex = xs.select(
        "i", "xv", F.explode(F.array(*[F.lit(int(l)) for l in lags])).alias("lag")
    )
    joined = ex.join(ys, ex["i"] + ex["lag"] == ys["j"]).select("lag", "xv", "yv")
    return exact_corr_pair(joined, group=["lag"], x_col="xv", y_col="yv")


def acf_lags(
    df: DataFrame,
    keys: list[str],
    lags: list[int],
    idx_col: str = "i",
    val_col: str = "c",
) -> DataFrame:
    """Autocorrelation profile per series key: for each positive lag L,
    Pearson r over the pairs (x[i], x[i+L]) of the SAME bucketed count
    series — the correlogram that surfaces periodicity (daily/weekly
    seasonality shows as peaks at L = period) and distinguishes trending
    from white-noise sources. This is the "Pearson on overlapping lagged
    pairs" correlogram variant (each lag re-centers on its own pair
    means), which stays exact on integer counts; the textbook
    fixed-mean/biased-denominator ACF is a rescaling of the same six
    sums.

    Input is a (keys..., idx_col BIGINT bucket index, val_col integral
    count) frame; output one row per (keys..., lag): (keys, lag, n_pts,
    r) assembled from exact BIGINT sums (exact_corr_pair), so r is
    summation-order-free and hash-twinnable.

    Scale shape: identical to xcorr_lags — the lag set is a tiny literal
    array exploded onto one side (|lags| copies, a constant factor) and
    the shift is ONE equi-join on (keys, i + lag) that Catalyst
    hash-partitions; per-(key, lag) reduction is one hash agg. No
    window over the full series, no per-lag pass, and the join key
    includes the series key so partitioning stays aligned with the
    series layout.
    """
    xs = df.select(*keys, F.col(idx_col).alias("i"), F.col(val_col).alias("xv"))
    # rename the y-side keys so the self-join condition binds each side
    # unambiguously (a bare ex[k] == ys[k] on a shared-lineage frame is
    # the classic trivially-true-predicate trap)
    ys = df.select(
        *[F.col(k).alias(f"__y_{k}") for k in keys],
        F.col(idx_col).alias("j"),
        F.col(val_col).alias("yv"),
    )
    ex = xs.select(
        *keys, "i", "xv",
        F.explode(F.array(*[F.lit(int(l)) for l in lags])).alias("lag"),
    )
    cond = [F.col(k) == F.col(f"__y_{k}") for k in keys]
    cond.append(F.col("i") + F.col("lag") == F.col("j"))
    joined = ex.join(ys, cond).select(*keys, "lag", "xv", "yv")
    return exact_corr_pair(joined, group=[*keys, "lag"], x_col="xv", y_col="yv")


def point_in_interval_join(
    points: DataFrame, intervals: DataFrame, bucket_us: int = 3_600_000_000
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair where the
    point's timestamp falls inside the interval — the enrichment step
    that tags raw events with the incident/deploy/session window they
    occurred in. `points` is (id, t_us), `intervals` is (id, start_us,
    end_us) with bounded durations; output (p_id, iv_id, offset_us =
    t - start).

    Same scale shape as interval_overlap_join: intervals explode to the
    epoch buckets they cover, points land in exactly ONE bucket, and the
    containment predicate verifies inside an EQUI-join on bucket — no
    broadcast nested loop, and (unlike interval x interval) no claim
    step is needed because a point's single bucket can only match a
    covering interval once. BIGINT `div` throughout.
    """
    iv = intervals.select(
        F.col("id").alias("iv_id"),
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {bucket_us}"),
                F.expr(f"end_us div {bucket_us}"),
            )
        ).alias("bucket"),
    )
    pt = points.select(
        F.col("id").alias("p_id"),
        "t_us",
        F.expr(f"t_us div {bucket_us}").alias("bucket"),
    )
    return (
        pt.join(iv, "bucket")
        .where((F.col("t_us") >= F.col("start_us")) & (F.col("t_us") <= F.col("end_us")))
        .select("p_id", "iv_id", (F.col("t_us") - F.col("start_us")).alias("offset_us"))
    )


def spectral_residual_scores(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    q: int = 3,
    z: int = 21,
    tau: float = 3.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Spectral Residual saliency detector per series key
    (kernels.spectral_residual — Ren et al. KDD 2019): one applyInPandas
    per key over the time-ordered series; returns keys + ts + value +
    saliency + score + is_anomaly (score >= tau; SR flags positive
    saliency spikes). Windowless in the time domain — no warmup NaNs —
    and complementary to the forecast-residual detectors."""
    import numpy as np
    import pandas as pd

    from .kernels import spectral_residual

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    out_schema = (
        f"{key_schema}, {ts_col} {ts_type}, x double, saliency double, "
        "score double, is_anomaly boolean"
    )
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    carry = [tiebreak] if tiebreak and tiebreak not in (ts_col, value_col) else []

    def _sr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        sal, score = spectral_residual(x, q, z)
        out = {k: pdf[k].to_numpy() for k in keys}
        out[ts_col] = pdf[ts_col].to_numpy()
        out.update(
            x=x, saliency=sal, score=score,
            is_anomaly=pd.array(score >= tau, dtype="boolean"),
        )
        return pd.DataFrame(out)

    return (
        df.select(*keys, ts_col, value_col, *carry)
        .groupBy(*keys)
        .applyInPandas(_sr, out_schema)
    )


def matrix_profile_scores(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    m: int = 24,
    tiebreak: str | None = None,
) -> DataFrame:
    """Self-join matrix profile per series key (kernels.matrix_profile —
    STOMP recurrence, Zhu et al. ICDM 2016): per length-m window, the
    z-normalized distance to its nearest non-trivial neighbor. High
    values are DISCORDS — subsequences unlike anything else in the
    series — the anomaly lens that needs no model, threshold, or
    training window. One applyInPandas per key over the time-ordered
    series; emits one row per WINDOW START (n-m+1 rows per series):
    keys + ts + x + mp + mp_idx (the neighbor's window index).

    For a series too long for one task, see matrix_profile_blocked —
    the segmented all-pairs form this kernel is the building block of.
    """
    import numpy as np
    import pandas as pd

    from .kernels import matrix_profile

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    out_schema = (
        f"{key_schema}, {ts_col} {ts_type}, x double, mp double, mp_idx long"
    )
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    carry = [tiebreak] if tiebreak and tiebreak not in (ts_col, value_col) else []

    def _mp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n_out = max(len(x) - m + 1, 0)
        mp, mpi = matrix_profile(x, m)
        head = pdf.iloc[:n_out]
        out = {k: head[k].to_numpy() for k in keys}
        out[ts_col] = head[ts_col].to_numpy()
        out.update(
            x=x[:n_out],
            mp=np.where(np.isfinite(mp), mp, np.nan),
            mp_idx=mpi,
        )
        return pd.DataFrame(out)

    return (
        df.select(*keys, ts_col, value_col, *carry)
        .groupBy(*keys)
        .applyInPandas(_mp, out_schema)
    )


def matrix_profile_blocked(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    value_col: str,
    m: int = 24,
    block: int = 4096,
) -> DataFrame:
    """Distributed self-join matrix profile: the segmented all-pairs
    form for series too long to profile in one task. The series is cut
    into `block`-sized segments (each carrying the m-1 values that spill
    into it from the left so every window is computable somewhere), the
    segment table self-joins on the key into B(B+1)/2 ordered pairs, one
    vectorized cross_matrix_profile kernel call per pair emits partial
    (window, dist, neighbor) rows for BOTH sides, and a final min-reduce
    per (key, window) — via min(struct(dist, neighbor)), deterministic
    tie-break on neighbor index — assembles the exact profile.

    This IS the scale shape: matrix profile is inherently O(n²) work;
    the pair fan-out distributes that work across the cluster while
    each task stays O(block²) with O(block) memory (STOMP row
    recurrence, no QT matrix). Input is (keys..., idx_col = dense
    0-based position BIGINT, value_col numeric); output (keys..., w =
    window start index, mp, mp_idx). Exactly equal (same formula, same
    conventions) to matrix_profile_scores on the same series up to
    float associativity of the two recurrence paths (parity-tested).
    """
    import numpy as np
    import pandas as pd

    from .kernels import cross_matrix_profile

    excl = max(1, m // 4)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )

    # each row feeds its own segment, plus the previous one when it sits
    # in the first m-1 positions of its segment (left-spill duplication)
    seg = F.col(idx_col).cast("long")
    segs = df.select(
        *keys,
        F.col(idx_col).cast("long").alias("__i"),
        F.col(value_col).cast("double").alias("__v"),
        F.explode(
            F.when(
                (seg % block < m - 1) & (seg >= block),
                F.array((seg / block).cast("long") - 1, (seg / block).cast("long")),
            ).otherwise(F.array((seg / block).cast("long")))
        ).alias("__seg"),
    )

    seg_schema = f"{key_schema}, __seg long, __start long, __vals array<double>"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__i", kind="mergesort")
        head = pdf.iloc[:1]
        out = {k: head[k].to_numpy() for k in keys}
        out["__seg"] = head["__seg"].to_numpy()
        out["__start"] = [int(pdf["__i"].iloc[0])]
        out["__vals"] = [pdf["__v"].to_numpy()]
        return pd.DataFrame(out)

    packed = segs.groupBy(*keys, "__seg").applyInPandas(_pack, seg_schema)

    a = packed.select(
        *keys,
        F.col("__seg").alias("__sa"),
        F.col("__start").alias("__starta"),
        F.col("__vals").alias("__valsa"),
    )
    b = packed.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        F.col("__seg").alias("__sb"),
        F.col("__start").alias("__startb"),
        F.col("__vals").alias("__valsb"),
    )
    cond = [F.col(k) == F.col(f"__bk_{k}") for k in keys]
    cond.append(F.col("__sb") >= F.col("__sa"))
    pairs = a.join(b, cond).select(
        *keys, "__starta", "__valsa", "__sa", "__sb", "__startb", "__valsb"
    )

    part_schema = f"{key_schema}, w long, d double, nn long"

    def _cross(it):
        for pdf in it:
            outs = []
            for pos in range(len(pdf)):  # rows are segment PAIRS — few per batch
                r = pdf.iloc[pos]
                av = np.asarray(r["__valsa"], dtype=np.float64)
                bv = np.asarray(r["__valsb"], dtype=np.float64)
                ia, ib = int(r["__starta"]), int(r["__startb"])
                self_pair = r["__sa"] == r["__sb"]
                mpa, mpia, mpb, mpib = cross_matrix_profile(
                    av, bv, m, ia, ib, excl
                )
                na, nb = len(mpa), len(mpb)
                kd = {k: r[k] for k in keys}
                if na:
                    outs.append(pd.DataFrame({
                        **{k: np.repeat(np.array([v]), na) for k, v in kd.items()},
                        "w": ia + np.arange(na, dtype=np.int64),
                        "d": mpa, "nn": mpia,
                    }))
                if nb and not self_pair:
                    outs.append(pd.DataFrame({
                        **{k: np.repeat(np.array([v]), nb) for k, v in kd.items()},
                        "w": ib + np.arange(nb, dtype=np.int64),
                        "d": mpb, "nn": mpib,
                    }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = pairs.mapInPandas(_cross, part_schema).where(
        ~F.col("d").eqNullSafe(float("inf"))
    )
    best = (
        partials.groupBy(*keys, "w")
        .agg(F.min(F.struct("d", "nn")).alias("__best"))
        .select(
            *keys,
            "w",
            F.col("__best.d").alias("mp"),
            F.col("__best.nn").alias("mp_idx"),
        )
    )
    return best


def seasonal_decompose(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    val_col: str,
    period: int = 24,
    trend_window: int = 24,
) -> DataFrame:
    """Additive seasonal-trend decomposition (classical/STL-lite) of a
    DENSE integral bucket series per key: value = trend + seasonal +
    resid, where trend is a rows-centered moving mean over
    `trend_window` buckets, seasonal is the per-phase (idx % period)
    MEDIAN of the detrended series (median, not mean — robust to a few
    anomalous days contaminating the profile), and resid is what
    detectors should score once the daily shape is explained away.

    Input must be gap-free per key (`idx_col` a dense BIGINT bucket
    index — feed a zero-filled spine); `val_col` integral so every
    derived double is an exact-integer division and the whole output is
    deterministic / hash-twinnable. Edge buckets use the shrunken
    window (same semantics as SQL ROWS frames).

    Scale shape: ONE rows-frame window pass (partitioned by key) for
    the trend, one hash agg to the tiny (keys × period) phase table,
    one broadcast join back — the raw series shuffles once on key.
    Returns keys + idx + val + trend + seasonal + resid.
    """
    half_lo = (trend_window - 1) // 2
    half_hi = trend_window // 2
    w = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(-half_lo, half_hi)
    )
    # explicit sum/count (NOT avg) so the oracle can pin the identical
    # exact-BIGINT-sum-then-divide formula
    trended = df.select(
        *keys,
        F.col(idx_col).alias("i"),
        F.col(val_col).cast("long").alias("val"),
        (
            F.sum(F.col(val_col).cast("long")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("trend"),
        (F.col(idx_col) % period).alias("__phase"),
    ).withColumn("__det", F.col("val").cast("double") - F.col("trend"))
    phase = trended.groupBy(*keys, "__phase").agg(
        F.expr("percentile(__det, 0.5)").alias("seasonal")
    )
    return (
        trended.join(F.broadcast(phase), [*keys, "__phase"])
        .select(
            *keys,
            "i",
            "val",
            "trend",
            "seasonal",
            (F.col("__det") - F.col("seasonal")).alias("resid"),
        )
    )


def theil_sen_slope(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    val_col: str,
) -> DataFrame:
    """Theil–Sen robust trend estimate per key group: the MEDIAN of all
    pairwise slopes (v_j − v_i)/(x_j − x_i), j > i — the classic
    breakdown-point-29% slope that one wild outlier (or several) cannot
    drag the way least squares is dragged. Input (keys..., idx_col
    BIGINT, val_col integral); returns keys + n_pairs + slope.

    Contract: the GROUP is the bounded unit (e.g. hours within one day
    — ≤276 pairs), so the pairwise self-join is O(group²)·n_groups =
    O(n) total with a catalog-bounded constant, an EQUI-join on the
    keys that hash-partitions. (Unbounded-window Theil–Sen is inherently
    quadratic; bucket first.) Slopes are integer-ratio doubles, median
    is the exact (n−1)·p percentile — deterministic both engines.
    """
    a = df.select(
        *keys, F.col(idx_col).alias("__xi"), F.col(val_col).alias("__vi")
    )
    b = df.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        F.col(idx_col).alias("__xj"),
        F.col(val_col).alias("__vj"),
    )
    cond = [F.col(k) == F.col(f"__b_{k}") for k in keys]
    cond.append(F.col("__xj") > F.col("__xi"))
    pairs = a.join(b, cond).select(
        *keys,
        (
            (F.col("__vj") - F.col("__vi")).cast("double")
            / (F.col("__xj") - F.col("__xi")).cast("double")
        ).alias("__slope"),
    )
    return pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(__slope, 0.5)").alias("slope"),
    )


def gesd_outliers(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    val_col: str,
    max_k: int = 3,
    alpha: float = 0.05,
    min_n: int = 10,
) -> DataFrame:
    """Generalized ESD outlier test (Rosner, Technometrics 1983) per key
    group, fully DECLARATIVE: the classic "how many outliers, without
    fixing the count in advance" test. max_k rounds each remove the
    point with the largest |x − mean| (tie: lowest index), recording
    R_i = max|x − mean| / s; the verdict flags the first k* removed
    points where k* = max{i : R_i > λ_i} with Rosner's t-based critical
    values λ_i (tsrollup.stats.gesd_lambdas — pure-python t quantiles,
    no scipy).

    Twinnability: every statistic is assembled from exact BIGINT sums
    (mean = s/n, s² = (n·Σx² − s²)/(n(n−1)) — ONE pinned formula, not
    stddev_samp) so both engines see identical doubles, the argmax
    selection is on those identical doubles, and the λ are inlined
    deterministic literals. The K rounds unroll as K tiny
    groupBy+join+window passes over a shrinking per-group set — no
    kernel, no Python on the data path; the only collect is the
    DISTINCT GROUP SIZES (O(#sizes), bounded by the bucketing — e.g.
    ≤24 for hours-per-day groups) used to build the λ lookup that
    broadcasts back.

    Groups smaller than min_n are dropped (min_n must be ≥ max_k + 3 so
    a sample std survives the last round). Returns one row per REMOVED
    candidate: keys + idx + val + rnd + r_stat + lam + is_outlier.
    """
    if min_n < max_k + 3:
        raise ValueError(f"min_n={min_n} must be >= max_k + 3 = {max_k + 3}")
    from .stats import gesd_lambdas

    # Round-6 shape (guide §2.4/§4.2): ONE shuffle. The K remove-the-max
    # rounds run entirely inside an applyInPandas kernel per key group
    # (groups are bucket-bounded — e.g. ≤24 hourly points per day), which
    # replaces the old K × (groupBy + join + window) unrolled passes, the
    # K+1 eager localCheckpoints and the distinct-group-sizes collect
    # (measured 4.6 s -> ~0.6 s for w15_gesd at sf0.1). Exactness is
    # preserved operation-for-operation: group sums stay exact Python
    # ints (identical to BIGINT sums in any order), every float derives
    # from the SAME IEEE expression tree the old Spark columns evaluated
    # (mean = double(s)/double(n); r = dev / sqrt((n·q − s²)/(n·(n−1)))),
    # the argmax orders by (dev DESC, i ASC) on those identical doubles,
    # and λ comes from the same pure-python gesd_lambdas the old driver
    # lookup inlined. A zero-variance round yields NULL r (nullable
    # Float64), matching the old engine-side NULL contract.
    import math

    import pandas as pd

    base = df.select(
        *keys,
        F.col(idx_col).alias("__i"),
        F.col(val_col).cast("long").alias("__c"),
    )
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.schema.fields[: len(keys)]
    )
    idx_type = base.schema.fields[len(keys)].dataType.simpleString()
    out_schema = (
        f"{key_fields}, __i {idx_type}, __c long, rnd int, "
        "r_stat double, lam double, is_outlier boolean"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n0 = len(pdf)
        if n0 < min_n:
            return pd.DataFrame(
                columns=list(pdf.columns[: len(keys)])
                + ["__i", "__c", "rnd", "r_stat", "lam", "is_outlier"]
            )
        lams = gesd_lambdas(n0, max_k, alpha)
        iv = list(pdf["__i"])
        cv = [int(x) for x in pdf["__c"]]
        live = list(range(n0))
        rows = []  # (i, c, rnd, r or None, lam)
        for rnd in range(1, max_k + 1):
            n = len(live)
            s = sum(cv[j] for j in live)
            qq = sum(cv[j] * cv[j] for j in live)
            nd, sd, qd = float(n), float(s), float(qq)
            mean = sd / nd
            var_num = nd * qd - sd * sd
            best = min(live, key=lambda j: (-abs(float(cv[j]) - mean), iv[j]))
            dev = abs(float(cv[best]) - mean)
            r = (
                dev / math.sqrt(var_num / (nd * (nd - 1.0)))
                if var_num > 0
                else None
            )
            rows.append((iv[best], cv[best], rnd, r, lams[rnd - 1]))
            live.remove(best)
        kstar = 0
        for _i, _c, rnd, r, lam in rows:
            if r is not None and r > lam:
                kstar = max(kstar, rnd)
        out = {
            c: [pdf[c].iloc[0]] * len(rows) for c in pdf.columns[: len(keys)]
        }
        out["__i"] = [r[0] for r in rows]
        out["__c"] = pd.Series([r[1] for r in rows], dtype="int64")
        out["rnd"] = pd.Series([r[2] for r in rows], dtype="int32")
        out["r_stat"] = pd.Series([r[3] for r in rows], dtype="Float64")
        out["lam"] = pd.Series([r[4] for r in rows], dtype="float64")
        out["is_outlier"] = pd.Series(
            [r[2] <= kstar for r in rows], dtype="bool"
        )
        return pd.DataFrame(out)

    return (
        base.groupBy(*keys)
        .applyInPandas(kernel, out_schema)
        .select(
            *keys,
            F.col("__i").alias(idx_col),
            F.col("__c").alias(val_col),
            "rnd",
            "r_stat",
            "lam",
            "is_outlier",
        )
    )


def dominant_period(
    df: DataFrame,
    keys: list[str],
    lags: list[int],
    idx_col: str = "i",
    val_col: str = "c",
    min_pairs: int = 32,
    r_threshold: float = 0.3,
) -> DataFrame:
    """W17 — seasonality detection: the dominant period of each series is
    the candidate lag whose autocorrelation (acf_lags — exact BIGINT
    sums) is highest. One row per series key: (keys..., period, n_pts,
    r_r, is_seasonal).

    Determinism contract: the winner is ranked on the ROUNDED r (1e-6)
    with the SMALLER lag as tiebreak — the same rank-on-rounded idiom as
    tfidf/weighted sampling — so the argmax is hash-twinnable even though
    r is a double. Lags with fewer than ``min_pairs`` overlapping pairs
    are ineligible (short series produce spurious perfect correlations);
    series where every candidate lag is ineligible or degenerate (NULL r:
    a constant window) produce no row.

    Scale shape: acf_lags is one lag-exploded self-equi-join (|lags| is a
    small literal constant) + one hash agg; the argmax adds one
    row_number window over |keys|x|lags| rows — tiny. Nothing here
    touches the raw series a second time.
    """
    acf = acf_lags(df, keys, lags, idx_col, val_col)
    scored = (
        acf.where(F.col("n_pts") >= int(min_pairs))
        .select(*keys, "lag", "n_pts", F.round("r", 6).alias("r_r"))
        .where(F.col("r_r").isNotNull())
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("r_r"), F.asc("lag"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            *keys,
            F.col("lag").cast("long").alias("period"),
            "n_pts",
            "r_r",
            (F.col("r_r") >= F.lit(float(r_threshold))).alias("is_seasonal"),
        )
    )


def hysteresis_alerts(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    window: int = 24,
    hi: float = 2.0,
    lo: float = 1.0,
) -> DataFrame:
    """W18 — alert state machine with hysteresis (flap suppression): an
    alert ENTERS when the trailing-window z-score reaches ``hi`` and only
    EXITS once z falls below ``lo``; in the dead band [lo, hi) the
    previous state holds. Per series key, one summary row:
    (keys..., n_buckets, alert_buckets, episodes, naive_episodes) where
    naive_episodes counts the flappy single-threshold (z >= hi) alert's
    on-transitions — hysteresis can only merge or equal them, so
    episodes <= naive_episodes row-by-row.

    The state machine is declarative, not iterative: decisive buckets
    (z >= hi -> 1, z < lo -> 0, dead band -> NULL) feed a
    last-non-null carry (``F.last(ignorenulls=True)`` over an unbounded
    preceding frame), which IS the hysteresis state — the same
    gaps-and-islands discipline as w8's anomaly islands, one window pass,
    no per-row Python.

    Determinism contract: z is assembled from exact BIGINT window sums
    (n*v - sx) / sqrt(n*sxx - sx*sx) and ROUNDED to 1e-6 before every
    threshold comparison, so both engines compare identical doubles
    (thresholds are exact literals). Windows shorter than ``window`` rows
    or with zero variance are non-decisive (NULL z).

    Scale shape: two window passes over the bucketed series (sums+carry),
    one hash agg. The bucketed series is already tiny relative to raw
    events, and both windows share the same (keys, idx) sort order, so
    Catalyst plans ONE sort.
    """
    n = int(window)
    wsum = (
        Window.partitionBy(*keys).orderBy(idx_col).rowsBetween(-(n - 1), 0)
    )
    v = F.col(val_col).cast("long")
    base = df.select(
        *keys,
        F.col(idx_col).alias("__i"),
        v.alias("__v"),
        F.count(F.lit(1)).over(wsum).alias("__n"),
        F.sum(v).over(wsum).alias("__sx"),
        F.sum(v * v).over(wsum).alias("__sxx"),
    )
    var_n2 = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    z_r = F.round(
        (F.col("__n") * F.col("__v") - F.col("__sx")).cast("double")
        / F.sqrt(var_n2.cast("double")),
        6,
    )
    scored = base.select(
        *keys,
        "__i",
        F.when((F.col("__n") == n) & (var_n2 > 0), z_r).alias("__z"),
    )
    decisive = (
        F.when(F.col("__z") >= F.lit(float(hi)), F.lit(1))
        .when(F.col("__z") < F.lit(float(lo)), F.lit(0))
    )
    wcarry = (
        Window.partitionBy(*keys)
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    st = scored.select(
        *keys,
        "__i",
        F.coalesce(
            F.last(decisive, ignorenulls=True).over(wcarry), F.lit(0)
        ).alias("__st"),
        F.coalesce((F.col("__z") >= F.lit(float(hi))).cast("int"), F.lit(0))
        .alias("__naive"),
    )
    wlag = Window.partitionBy(*keys).orderBy("__i")
    tr = st.select(
        *keys,
        "__st",
        "__naive",
        (
            (F.col("__st") == 1)
            & (F.coalesce(F.lag("__st").over(wlag), F.lit(0)) == 0)
        ).cast("long").alias("__enter"),
        (
            (F.col("__naive") == 1)
            & (F.coalesce(F.lag("__naive").over(wlag), F.lit(0)) == 0)
        ).cast("long").alias("__nenter"),
    )
    return tr.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("__st").cast("long").alias("alert_buckets"),
        F.sum("__enter").alias("episodes"),
        F.sum("__nenter").alias("naive_episodes"),
    )


def sax_words(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    period: int = 24,
    n_segments: int = 6,
    alphabet: int = 4,
) -> DataFrame:
    """W19 — SAX-style symbolic day words + motif candidates: each series
    period (default one 24-bucket day) is piecewise-aggregated into
    ``n_segments`` segment sums (PAA with an integer sum instead of a
    mean — same information, exact), quantized to ``alphabet`` symbols by
    equal-width binning over the period's own [min, max] range, and
    concatenated into a word. Periods of the same key sharing a word are
    motif candidates (recurring daily shapes); output is one row per
    (keys..., word): (keys..., word, n_periods, first_period,
    last_period).

    This is the SAX pipeline (Lin et al. 2003) with the Gaussian
    z-breakpoints replaced by per-period equal-width integer quantization
    sym = (s - mn) * alphabet / (mx - mn + 1): every comparison is exact
    BIGINT arithmetic, so the words — and therefore the motif groups —
    are hash-twinnable, where z-normalized breakpoints would put symbols
    a last-ulp knife edge apart. A constant period (mx == mn) is all
    symbol 0 by construction.

    Only COMPLETE periods (all ``period`` buckets present after
    zero-filling inside the period's span) participate; the input is
    zero-filled per (key, period) from the bucket spine, so a missing
    bucket means the KEY had no bucket anywhere that period-slot — which
    can only happen at the series edges. Incomplete edge periods are
    dropped rather than padded (a partial day's shape is not comparable).

    Scale shape: one groupBy (keys, period, segment) hash agg over the
    bucketed series, one (keys, period) agg to build words, one
    (keys, word) agg for motif groups — three shrinking hash aggs, no
    window over raw data, no explode beyond the tiny per-period pivot.
    """
    per = int(period)
    nseg = int(n_segments)
    if per % nseg:
        raise ValueError(f"period={per} not divisible by n_segments={nseg}")
    a = int(alphabet)
    if not 2 <= a <= 10:
        raise ValueError("alphabet must be in [2, 10] (single-digit symbols)")
    # `div` is exact integer division in both engines (bucket indices are
    # non-negative, so div == floor); a float `/` here could land a
    # last-ulp below the true quotient and mis-bin a symbol.
    seg = (
        df.select(
            *keys,
            F.expr(f"`{idx_col}` div {per}").alias("__p"),
            F.expr(f"(`{idx_col}` % {per}) * {nseg} div {per}").alias("__seg"),
            F.col(val_col).cast("long").alias("__v"),
        )
        .groupBy(*keys, "__p", "__seg")
        .agg(F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__nb"))
    )
    words = (
        seg.groupBy(*keys, "__p")
        .agg(
            F.sum("__nb").alias("__nbt"),
            F.min("__s").alias("__mn"),
            F.max("__s").alias("__mx"),
            F.sort_array(F.collect_list(F.struct("__seg", "__s"))).alias("__a"),
        )
        .where(F.col("__nbt") == per)
        .select(
            *keys,
            "__p",
            F.expr(
                "array_join(transform(__a, s -> cast("
                f"(s.__s - __mn) * {a} div (__mx - __mn + 1)"
                " as string)), '')"
            ).alias("word"),
        )
    )
    return words.groupBy(*keys, "word").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.min("__p").alias("first_period"),
        F.max("__p").alias("last_period"),
    )


def dtw_daily_shape(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    period: int = 24,
) -> DataFrame:
    """W20 — DTW shape deviation between consecutive periods: for every
    complete ``period``-bucket day, the exact-integer L1 dynamic-time-
    warping distance to the PREVIOUS day's profile, alongside the rigid
    aligned L1 distance. dtw <= l1 always (alignment is one warping
    path); warp_gain = l1 - dtw is how much of the difference is mere
    time-shift (load arriving an hour late) rather than shape change —
    the classic reason DTW beats pointwise deviation for "did today look
    like yesterday".

    Output: (keys..., day_idx, dtw, l1, warp_gain) — all BIGINT, so the
    whole operator is hash-twinnable against a recursive-CTE DP
    (driver_queries.w20_dtw runs the same DP over anti-diagonals in
    DuckDB).

    Scale shape: one hash agg builds the per-period profile arrays
    (|period| elements each), one self-equi-join pairs consecutive
    periods (partitioned by the series keys), l1 is a JVM zip_with fold,
    and DTW runs in an Arrow-batched pandas UDF whose n*m DP steps are
    VECTORIZED across the batch (kernels.dtw_l1_batch) — per-pair Python
    overhead is O(period^2 / batch). Raw data is touched once.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from . import kernels

    per = int(period)
    day = df.select(
        *keys,
        F.expr(f"`{idx_col}` div {per}").alias("__p"),
        F.expr(f"`{idx_col}` % {per}").alias("__h"),
        F.col(val_col).cast("long").alias("__v"),
    )
    arrs = (
        day.groupBy(*keys, "__p")
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.expr(
                "transform(array_sort(collect_list(struct(__h, __v))),"
                " s -> s.__v)"
            ).alias("__a"),
        )
        .where(F.col("__nb") == per)
    )
    prev = arrs.select(
        *[F.col(k).alias(f"__y_{k}") for k in keys],
        (F.col("__p") + 1).alias("__p2"),
        F.col("__a").alias("__b"),
    )
    cond = [F.col(k) == F.col(f"__y_{k}") for k in keys]
    cond.append(F.col("__p") == F.col("__p2"))
    pairs = arrs.join(prev, cond).select(*keys, "__p", "__a", "__b")

    @pandas_udf("long")
    def _dtw(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if not len(xs):
            return pd.Series([], dtype="int64")
        X = np.stack(xs.to_numpy()).astype(np.int64)
        Y = np.stack(ys.to_numpy()).astype(np.int64)
        return pd.Series(kernels.dtw_l1_batch(X, Y))

    l1 = F.expr(
        "aggregate(zip_with(__a, __b, (u, v) -> abs(u - v)),"
        " 0L, (acc, e) -> acc + e)"
    )
    return pairs.select(
        *keys,
        F.col("__p").alias("day_idx"),
        _dtw("__a", "__b").alias("dtw"),
        l1.alias("l1"),
    ).withColumn("warp_gain", F.col("l1") - F.col("dtw"))


def binseg_split(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    min_seg: int = 12,
) -> DataFrame:
    """W21 — binary-segmentation changepoint (the primitive CART/ruptures
    recursion step): per series key, the split index that maximizes the
    SSE reduction gain = SSE_total − (SSE_left + SSE_right), where each
    SSE is assembled from exact BIGINT prefix sums
    (SSE = Σx² − (Σx)²/n). One row per key: (keys..., split_i, n_left,
    n_right, gain_r, mean_left_r, mean_right_r) — the split is the LAST
    index of the left segment; both segments must have at least
    ``min_seg`` points (series shorter than 2*min_seg emit nothing).

    Determinism contract: the argmax ranks on the ROUNDED gain (1e-6)
    with the smaller split index as tiebreak — the rank-on-rounded idiom
    — and every double is a fixed closed form of exact integer sums, so
    the winner is hash-twinnable. CUSUM (c6) detects WHEN a drift starts
    online; binseg is the offline "where is the single best break"
    answer that seeds recursive segmentation.

    Scale shape: one cumulative-sum window pass over the bucketed series
    + one per-key total join + one argmax window — all on the (already
    tiny) bucketed frame, nothing touches raw data twice.
    """
    ms = int(min_seg)
    if ms < 2:
        raise ValueError(f"min_seg={ms} must be >= 2 (sample SSE needs it)")
    v = F.col(val_col).cast("long")
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = df.select(
        *keys,
        F.col(idx_col).alias("__i"),
        F.row_number()
        .over(Window.partitionBy(*keys).orderBy(idx_col))
        .alias("__k"),
        F.sum(v).over(wcum).alias("__ps"),
        F.sum(v * v).over(wcum).alias("__pq"),
    )
    # totals from a direct agg (NOT max of the prefix sums — that would
    # silently require non-negative values)
    tot = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__q"),
    )
    j = pre.join(tot, keys).where(
        (F.col("__k") >= ms) & (F.col("__n") - F.col("__k") >= ms)
    )
    kd = F.col("__k").cast("double")
    nd = F.col("__n").cast("double")
    psd = F.col("__ps").cast("double")
    pqd = F.col("__pq").cast("double")
    sd = F.col("__s").cast("double")
    qd = F.col("__q").cast("double")
    sse_tot = qd - sd * sd / nd
    sse_l = pqd - psd * psd / kd
    sse_r = (qd - pqd) - (sd - psd) * (sd - psd) / (nd - kd)
    scored = j.select(
        *keys,
        "__i",
        "__k",
        "__n",
        F.round(sse_tot - sse_l - sse_r, 6).alias("gain_r"),
        F.round(psd / kd, 6).alias("mean_left_r"),
        F.round((sd - psd) / (nd - kd), 6).alias("mean_right_r"),
    )
    wbest = Window.partitionBy(*keys).orderBy(F.desc("gain_r"), F.asc("__i"))
    return (
        scored.withColumn("__rk", F.row_number().over(wbest))
        .where(F.col("__rk") == 1)
        .select(
            *keys,
            F.col("__i").alias("split_i"),
            F.col("__k").cast("long").alias("n_left"),
            (F.col("__n") - F.col("__k")).cast("long").alias("n_right"),
            "gain_r",
            "mean_left_r",
            "mean_right_r",
        )
    )


def kalman_level_scores(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    q: float = 2.0,
    r: float = 10.0,
    tau: float = 3.0,
) -> DataFrame:
    """W22 — local-level Kalman filter detector per series key
    (kernels.kalman_level, pinned loop): level estimate, innovation, and
    standardized-innovation score per bucket, with is_anomaly at |score|
    >= tau. The gain schedule starts high and converges to the
    steady-state Riccati gain — the principled version of detector
    warm-up, where EWMA's fixed alpha over- or under-reacts early.

    Determinism contract: the kernel's float64 op order is pinned and
    identical to the recursive-CTE expressions the oracle evaluates
    (q, r enter as repr'd literals on both sides); outputs are rounded
    1e-6 before comparison/thresholding, the same belt as the EWMA twin.

    Scale shape: one applyInPandas over the series keys (the bucketed
    frame, tiny vs raw); the filter is inherently sequential per series
    but series are independent — the same partition-parallel discipline
    as score_tier.
    """
    import numpy as np

    from .kernels import kalman_level

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = (
        f"{key_schema}, {idx_col} long, x double, level double, "
        "score double"
    )
    qf, rf, tf = float(q), float(r), float(tau)

    def _kal(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col, kind="mergesort")
        x = pdf[val_col].to_numpy(dtype=np.float64)
        est, _, score = kalman_level(x, qf, rf)
        out = {k: pdf[k].to_numpy() for k in keys}
        out[idx_col] = pdf[idx_col].to_numpy()
        out.update(x=x, level=est, score=score)
        return pd.DataFrame(out)

    raw = (
        df.select(*keys, idx_col, val_col)
        .groupBy(*keys)
        .applyInPandas(_kal, out_schema)
    )
    # round JVM-side: SQL round() is half-away-from-zero in BOTH engines,
    # np.round is half-to-even — rounding inside the kernel would put the
    # twin a coin-flip apart on exact .5e-6 boundaries
    return raw.select(
        *keys,
        idx_col,
        "x",
        F.round("level", 6).alias("level_r"),
        F.round("score", 6).alias("score_r"),
        (F.abs(F.round("score", 6)) >= F.lit(tf)).alias("is_anomaly"),
    )


def burst_intervals(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
) -> DataFrame:
    """W23 — burst interval extraction via a two-state min-cost path
    (Kleinberg's burst automaton with L1 emission costs instead of
    −log-likelihoods, making the whole DP EXACT INTEGERS —
    kernels.burst_states). Base rate λ0 = the series median, burst rate
    λ1 = 1.5·λ0, transition penalty γ = 0.5·λ0 (all in quadrupled units
    so the half-integer median AND its 1.5x multiple stay integral); a
    bucket is bursting iff the best path through the burst state at
    that bucket is strictly cheaper. Contiguous bursting buckets collapse to one interval row:
    (keys..., start_i, end_i, n_buckets, max_c, sum_c) — the
    idx − row_number islands discipline (w8).

    Twin: the oracle replays the SAME integer DP as TWO recursive CTEs
    (forward and backward passes) and the same membership test, so the
    intervals are hash-twinnable. Scale shape: one exact-percentile agg
    for λ0, one applyInPandas over series keys (sequential DP per
    series, series independent), one window + agg for islands.
    """
    import numpy as np

    from .kernels import burst_states

    lam = df.groupBy(*keys).agg(
        (F.expr(f"percentile(`{val_col}`, 0.5)") * 4)
        .cast("long")
        .alias("__lam0u")
    )
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = f"{key_schema}, {idx_col} long, x long, state int"

    def _burst(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col, kind="mergesort")
        lam0 = int(pdf["__lam0u"].iloc[0])  # 4x median, always even
        st, _, _, _ = burst_states(
            pdf[val_col].to_numpy(dtype=np.int64),
            lam0, 3 * lam0 // 2, lam0 // 2,
        )
        out = {k: pdf[k].to_numpy() for k in keys}
        out[idx_col] = pdf[idx_col].to_numpy()
        out.update(x=pdf[val_col].to_numpy(dtype=np.int64),
                   state=st.astype(np.int32))
        return pd.DataFrame(out)

    states = (
        df.join(lam, keys)
        .select(*keys, idx_col, val_col, "__lam0u")
        .groupBy(*keys)
        .applyInPandas(_burst, out_schema)
    )
    burst = states.where(F.col("state") == 1)
    grp = (
        F.col(idx_col)
        - F.row_number().over(Window.partitionBy(*keys).orderBy(idx_col))
    ).alias("__g")
    return (
        burst.select(*keys, idx_col, "x", grp)
        .groupBy(*keys, "__g")
        .agg(
            F.min(idx_col).alias("start_i"),
            F.max(idx_col).alias("end_i"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("x").alias("max_c"),
            F.sum("x").cast("long").alias("sum_c"),
        )
        .drop("__g")
    )


def merge_intervals(
    df: DataFrame,
    start_col: str = "start_idx",
    end_col: str = "end_idx",
    adjacency: int = 1,
) -> DataFrame:
    """W24 — coalesce overlapping/adjacent intervals into maximal merged
    spans (interval union): intervals whose start is within ``adjacency``
    of the running maximum end so far join the current span; otherwise a
    new span opens. The classic sweep, expressed as two windows sharing
    one global (start, end) sort: running-max-of-previous-ends + a
    cumulative sum over the new-span flags = the span id. All exact
    integers.

    Input: one row per interval with integer ``start_col``/``end_col``
    (inclusive) plus any payload columns; output one row per merged
    span: (span_id, start_idx, end_idx, n_intervals) with the input
    payload aggregatable by the caller via span_id (returned frame keeps
    every input column).

    Scale note: the sweep is a global ordering over INTERVALS — already
    a tiny derived set (islands of flagged buckets), not raw data; at
    extreme interval counts, partition by coarse time ranges with a
    one-interval halo and merge the seams in a second tiny pass.
    """
    order = [F.col(start_col), F.col(end_col)]
    wprev = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    run_max_prev = F.max(end_col).over(wprev)
    flagged = df.withColumn(
        "__new",
        F.when(F.col(start_col) > run_max_prev + adjacency, F.lit(1))
        .when(run_max_prev.isNull(), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "span_id", F.sum("__new").over(wcum).cast("long")
    ).drop("__new")


def pattern_reversals(
    df: DataFrame,
    keys: list[str],
    ord_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection — the
    (UP){k,} DOWN pattern of SQL row-pattern matching (Trino/Flink CEP),
    which Spark has no clause for: flag every local peak ending a run of
    >= k consecutive strict rises that is followed by a strict fall.

    Expressed as windows over ONE partitioning (delta -> last-non-rise
    anchor -> lead), so Catalyst evaluates the whole pattern in a single
    sort+window stage per key: no explode, no self-join, exact integers
    end-to-end. ``ord_col`` must be a CONTIGUOUS integer index per key
    (a dense spine — gapfill first), since run length is computed as
    index distance from the last non-rising row.

    Returns (keys..., peak at ord_col, peak value, run_len = number of
    consecutive rises into the peak, drop_sz = size of the fall after
    it). At 100 TB the window partitioning is the rollup's own (source,
    tier) layout; nothing here shuffles twice.
    """
    w = Window.partitionBy(*keys).orderBy(ord_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    d = df.withColumn("_delta", F.col(value_col) - F.lag(value_col).over(w))
    # anchor: most recent index that did NOT strictly rise; the partition's
    # first row (NULL delta) anchors itself — condition must treat NULL as
    # non-rise, not propagate it
    anchored = d.withColumn(
        "_anchor",
        F.last(
            F.when(
                F.col("_delta").isNull() | (F.col("_delta") <= 0),
                F.col(ord_col),
            ),
            ignorenulls=True,
        ).over(wcum),
    ).withColumn("_next_delta", F.lead("_delta").over(w))
    return (
        anchored.withColumn(
            "run_len", (F.col(ord_col) - F.col("_anchor")).cast("long")
        )
        .where((F.col("run_len") >= k) & (F.col("_next_delta") < 0))
        .select(
            *keys,
            F.col(ord_col),
            F.col(value_col),
            "run_len",
            (-F.col("_next_delta")).cast("long").alias("drop_sz"),
        )
    )


def shesd_outliers(
    df: DataFrame,
    keys: list[str],
    idx_col: str,
    resid_col: str,
    max_k: int = 3,
    alpha: float = 0.05,
    min_n: int = 10,
) -> DataFrame:
    """Seasonal-Hybrid ESD's robust test stage (Twitter/Vallis-Hochenbaum-
    Kejariwal KDD'14 'hybrid' variant of Rosner's ESD): per key group,
    max_k rounds each remove the point with the largest |x − median|
    (tie: lowest index), with R_i = max|x − median| / (1.4826 · MAD) —
    median and MAD replacing mean and stddev so that up to ~50% of a
    window being anomalous cannot mask the test the way it breaks the
    classic GESD. Verdicts use the SAME Rosner t-based λ critical values
    (tsrollup.stats.gesd_lambdas) evaluated against the robust R.

    The caller passes a residual column already ROUNDED to 1e-6 (the
    cross-engine determinism boundary — see w13's discipline): from
    identical rounded inputs, both engines' medians interpolate the same
    doubles, devs/R evaluate the same expressions, and the argmax
    orders by (dev DESC, idx ASC) identically. A zero-MAD (constant
    majority) round yields NULL R — never flagged, never a divide error.

    Same scale shape as gesd_outliers: K unrolled groupBy+join+window
    passes over a shrinking per-group set (groups are bucket-bounded,
    e.g. ≤24 hours/day); the only collect is the distinct group sizes
    for the λ broadcast."""
    if min_n < max_k + 3:
        raise ValueError(f"min_n={min_n} must be >= max_k + 3 = {max_k + 3}")
    from .stats import gesd_lambdas

    # Round-6 shape: same single-shuffle applyInPandas kernel as
    # gesd_outliers (see that docstring) — the K robust rounds run
    # per bucket-bounded key group inside one grouped-map pass, killing
    # the K × (median agg + join + MAD agg + join + window) unrolled
    # chain and its K+1 eager localCheckpoints (measured 2.5 s -> ~1 s
    # for w27_shesd at sf0.1). The median replicates Spark's
    # `percentile(x, 0.5)` interpolation EXACTLY (lo + (hi−lo)·frac at
    # position 0.5·(n−1) over the sorted doubles — NOT numpy's (a+b)/2,
    # which can differ in the last ulp); dev/R evaluate the same IEEE
    # expressions as the old columns (r = dev / (1.4826 · mad)); the
    # argmax orders by (dev DESC, i ASC); zero-MAD rounds yield NULL R.
    import math

    import pandas as pd

    base = df.select(
        *keys,
        F.col(idx_col).alias("__i"),
        F.col(resid_col).cast("double").alias("__x"),
    )
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.schema.fields[: len(keys)]
    )
    idx_type = base.schema.fields[len(keys)].dataType.simpleString()
    out_schema = (
        f"{key_fields}, __i {idx_type}, __x double, rnd int, "
        "r_stat double, lam double, is_outlier boolean"
    )

    def _pctl50(vals: list) -> float:
        # Spark Percentile: position = 0.5·(n−1); lo + (hi−lo)·frac
        sv = sorted(vals)
        pos = 0.5 * (len(sv) - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        if lo == hi:
            return sv[lo]
        return sv[lo] + (sv[hi] - sv[lo]) * (pos - lo)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n0 = len(pdf)
        if n0 < min_n:
            return pd.DataFrame(
                columns=list(pdf.columns[: len(keys)])
                + ["__i", "__x", "rnd", "r_stat", "lam", "is_outlier"]
            )
        lams = gesd_lambdas(n0, max_k, alpha)
        iv = list(pdf["__i"])
        xv = [float(x) for x in pdf["__x"]]
        live = list(range(n0))
        rows = []  # (i, x, rnd, r or None, lam)
        for rnd in range(1, max_k + 1):
            med = _pctl50([xv[j] for j in live])
            devs = {j: abs(xv[j] - med) for j in live}
            mad = _pctl50(list(devs.values()))
            best = min(live, key=lambda j: (-devs[j], iv[j]))
            r = devs[best] / (1.4826 * mad) if mad > 0 else None
            rows.append((iv[best], xv[best], rnd, r, lams[rnd - 1]))
            live.remove(best)
        kstar = 0
        for _i, _x, rnd, r, lam in rows:
            if r is not None and r > lam:
                kstar = max(kstar, rnd)
        out = {
            c: [pdf[c].iloc[0]] * len(rows) for c in pdf.columns[: len(keys)]
        }
        out["__i"] = [r[0] for r in rows]
        out["__x"] = pd.Series([r[1] for r in rows], dtype="float64")
        out["rnd"] = pd.Series([r[2] for r in rows], dtype="int32")
        out["r_stat"] = pd.Series([r[3] for r in rows], dtype="Float64")
        out["lam"] = pd.Series([r[4] for r in rows], dtype="float64")
        out["is_outlier"] = pd.Series(
            [r[2] <= kstar for r in rows], dtype="bool"
        )
        return pd.DataFrame(out)

    return (
        base.groupBy(*keys)
        .applyInPandas(kernel, out_schema)
        .select(
            *keys,
            F.col("__i").alias(idx_col),
            F.col("__x").alias(resid_col),
            "rnd",
            "r_stat",
            "lam",
            "is_outlier",
        )
    )


def page_hinkley_scores(
    df: DataFrame,
    keys: list[str],
    idx_col: str = "i",
    val_col: str = "c",
    delta: float = 0.5,
    lam: float = 10.0,
) -> DataFrame:
    """W32 — Page-Hinkley drift detector per series key
    (kernels.page_hinkley, pinned loop): running-mean estimate and the
    PH statistic per bucket, with is_drift at ph >= lam. CUSUM (c6)
    answers 'did the level shift from a KNOWN baseline'; PH
    self-estimates the baseline as the running mean, so it works on
    series with no in-control calibration segment — the standard
    streaming-drift test alongside the KS (w31) and PSI (x6) batch
    tests.

    Determinism contract: the kernel's float64 op order is pinned and
    identical to the recursive-CTE expressions the oracle evaluates
    (delta, lam enter as repr'd literals on both sides); outputs round
    1e-6 JVM-side before thresholding — the W22 Kalman discipline.

    Scale shape: one applyInPandas over series keys (bucketed frame,
    tiny vs raw); sequential per series, independent across series.
    """
    import numpy as np

    from .kernels import page_hinkley

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = (
        f"{key_schema}, {idx_col} long, x double, mean double, ph double"
    )
    dl, lm = float(delta), float(lam)

    def _ph(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col, kind="mergesort")
        x = pdf[val_col].to_numpy(dtype=np.float64)
        mean, ph = page_hinkley(x, dl)
        out = {k: pdf[k].to_numpy() for k in keys}
        out[idx_col] = pdf[idx_col].to_numpy()
        out.update(x=x, mean=mean, ph=ph)
        return pd.DataFrame(out)

    raw = (
        df.select(*keys, idx_col, val_col)
        .groupBy(*keys)
        .applyInPandas(_ph, out_schema)
    )
    # round JVM-side (SQL round is half-away on both engines; np.round
    # is half-to-even — the w22 boundary discipline)
    return raw.select(
        *keys,
        idx_col,
        "x",
        F.round("mean", 6).alias("mean_r"),
        F.round("ph", 6).alias("ph_r"),
        (F.round("ph", 6) >= F.lit(lm)).alias("is_drift"),
    )
