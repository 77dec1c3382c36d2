"""Read-side visualization downsampling: M4 and LTTB.

Two published algorithms a time-series store serves plots with, at two
cost/fidelity points:

- **M4** (Jugel et al., "M4: A Visualization-Oriented Time Series Data
  Aggregation", VLDB 2014): per pixel-column bucket keep the first, last,
  min and max values — the four points that make the rasterized line
  pixel-identical to plotting every raw point. Pure built-in expressions
  (two window row_numbers + one hash aggregate, ONE shuffle on
  (keys, bucket)) — fully SQL-expressible, so the driver query
  `g3_m4_downsample` carries an exact DuckDB twin.

- **LTTB** (Steinarsson, "Downsampling Time Series for Visual
  Representation", MSc thesis, U. Iceland 2013): fixed output budget of
  n_out points chosen to maximize the triangle area against the
  previously SELECTED point and the next bucket's centroid. The anchor
  recurrence is sequential across buckets, so each key's series runs in
  one vectorized NumPy kernel inside applyInPandas (same partition-
  parallel shape as the detector kernels: group = one series, NEVER a
  cross-series dependency). Not ANSI-expressible (the argmax depends on
  the previous argmax) — driver entry `ds_lttb` is rows-only and the
  kernel is pinned against an independent pure-loop reference in
  tests/test_downsample.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def downsample_m4(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """M4 aggregate per (keys, time bucket): v_first / v_last / v_min /
    v_max / n_pts. `order_tiebreak` (a column name) pins first/last when
    multiple rows share a timestamp — required for deterministic output
    (and for the oracle twin)."""
    order_cols = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    part = [*keys, "__bucket"]
    w_a = Window.partitionBy(*part).orderBy(*order_cols)
    w_d = Window.partitionBy(*part).orderBy(*[c.desc() for c in order_cols])
    # bucket materialized BEFORE the windows (a lateral alias can't be a
    # window partition key)
    bucketed = df.withColumn("__bucket", F.date_trunc(bucket, ts_col))
    ranked = bucketed.select(
        *keys, "__bucket", F.col(value_col).alias("__v"),
        F.row_number().over(w_a).alias("__rn_a"),
        F.row_number().over(w_d).alias("__rn_d"),
    )
    return ranked.groupBy(*keys, "__bucket").agg(
        F.max(F.when(F.col("__rn_a") == 1, F.col("__v"))).alias("v_first"),
        F.max(F.when(F.col("__rn_d") == 1, F.col("__v"))).alias("v_last"),
        F.min("__v").alias("v_min"),
        F.max("__v").alias("v_max"),
        F.count(F.lit(1)).alias("n_pts"),
    ).withColumnRenamed("__bucket", "bucket")


def lttb_kernel(ts_us: np.ndarray, values: np.ndarray, n_out: int) -> np.ndarray:
    """LTTB point selection for ONE series already sorted by time.

    Returns the int64 indexes of the selected points (ascending). The
    first and last points are always kept; interior points fall into
    n_out - 2 equal-width index buckets; each bucket keeps the point
    maximizing the triangle area spanned by (previous selected point,
    candidate, next bucket's mean point). Ties break to the EARLIEST
    index (np.argmax first-occurrence), which pins determinism.
    """
    n = ts_us.shape[0]
    if n_out >= n or n <= 2:
        return np.arange(n, dtype=np.int64)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    x = ts_us.astype(np.float64)
    y = values.astype(np.float64)
    # bucket b (0-based interior) covers indexes [edges[b], edges[b+1]).
    # `every` is computed ONCE then multiplied (the thesis-literal
    # evaluation order) — fused i*(n-2)/(n_out-2) rounds differently on
    # exact divisions and shifts an edge by one
    every = (n - 2) / (n_out - 2)
    edges = 1 + np.floor(
        np.arange(n_out - 1, dtype=np.float64) * every
    ).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0  # previously selected index
    for b in range(n_out - 2):
        lo, hi = int(edges[b]), int(edges[b + 1])
        nlo, nhi = hi, int(edges[b + 2]) if b + 2 < edges.shape[0] else n
        if nhi <= nlo:  # next bucket empty -> anchor on the last point
            cx, cy = x[n - 1], y[n - 1]
        else:
            cx = x[nlo:nhi].mean()
            cy = y[nlo:nhi].mean()
        ax, ay = x[a], y[a]
        # 2x the triangle area of (a, candidate, c), all candidates at once
        area = np.abs(
            (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
        )
        a = lo + int(np.argmax(area))
        out[b + 1] = a
    return out


def lttb_grid_kernel(
    x_int: np.ndarray, v_int: np.ndarray, n_out: int
) -> np.ndarray:
    """Exact-integer LTTB selection for ONE series (same recurrence as
    `lttb_kernel`, but on an integer (x, v) grid so the argmax is
    bit-identical across engines — the twin discipline).

    Instead of the float centroid (cx, cy) = mean of the next bucket,
    every candidate's doubled triangle area is scaled by the next
    bucket's size m (constant within a bucket, so the argmax is
    unchanged):

        area*m = |(ax*m - sum_x) * (v - av) - (ax - x) * (sum_v - av*m)|

    evaluated in int64 (np.int64 after an explicit < 2**62 bound check —
    overflow raises instead of wrapping). Bucket edges use the identical
    thesis-literal float math as `lttb_kernel` (one IEEE divide, one
    multiply, one floor — bit-identical in DuckDB). Ties break to the
    earliest index, as everywhere.
    """
    n = x_int.shape[0]
    if n_out >= n or n <= 2:
        return np.arange(n, dtype=np.int64)
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    x = x_int.astype(np.int64)
    v = v_int.astype(np.int64)
    every = (n - 2) / (n_out - 2)
    edges = 1 + np.floor(
        np.arange(n_out - 1, dtype=np.float64) * every
    ).astype(np.int64)
    # conservative magnitude bound: the largest product this kernel forms
    # is (|x|max * m + |sum_x|) * 2*|v|max; raise loudly before int64 wraps
    xa = int(np.abs(x).max())
    va = int(np.abs(v).max())
    m_max = n  # next-bucket size is < n
    bound = 2 * (xa * m_max + xa * m_max) * (2 * va + 1)
    if bound >= 2**62:
        raise ValueError(
            f"lttb_grid_kernel magnitude bound exceeded: |x|<= {xa}, "
            f"|v| <= {va}, n = {n} — coarsen the grid scales"
        )
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0
    for b in range(n_out - 2):
        lo, hi = int(edges[b]), int(edges[b + 1])
        nlo, nhi = hi, int(edges[b + 2]) if b + 2 < edges.shape[0] else n
        if nhi <= nlo:  # next bucket empty -> anchor on the last point
            sx, sy, m = int(x[n - 1]), int(v[n - 1]), 1
        else:
            sx = int(x[nlo:nhi].sum())
            sy = int(v[nlo:nhi].sum())
            m = nhi - nlo
        ax, av = int(x[a]), int(v[a])
        area = np.abs(
            (ax * m - sx) * (v[lo:hi] - av) - (ax - x[lo:hi]) * (sy - av * m)
        )
        a = lo + int(np.argmax(area))
        out[b + 1] = a
    return out


def downsample_lttb_grid(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
    order_tiebreak: str,
    value_scale: float = 1000.0,
) -> DataFrame:
    """Twin-able LTTB: runs `lttb_grid_kernel` per key group over the
    exact-integer grid x = seconds since the key's first sample
    (floor-div of the microsecond delta) and v = floor(value*scale+0.5).
    `order_tiebreak` pins the 0-based series index under equal
    timestamps (required for the oracle twin's row_number). Output:
    keys + (sel_i, x_s, v_grid) — all integers, hash-exact across
    engines."""
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    schema = f"{key_fields}, sel_i bigint, x_s bigint, v_grid bigint"
    slim = df.select(*keys, ts_col, value_col, order_tiebreak)

    def select_points(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [ts_col, order_tiebreak], kind="mergesort"
        ).reset_index(drop=True)
        tus = pdf[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        x = (tus - tus[0]) // 1_000_000
        v = np.floor(
            pdf[value_col].to_numpy(dtype=np.float64) * value_scale + 0.5
        ).astype(np.int64)
        idx = lttb_grid_kernel(x, v, n_out)
        out = pdf.iloc[idx][keys].copy()
        out["sel_i"] = idx
        out["x_s"] = x[idx]
        out["v_grid"] = v[idx]
        return out

    return slim.groupBy(*keys).applyInPandas(select_points, schema=schema)


def downsample_lttb(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """LTTB per key group via applyInPandas (see module docstring). Output
    columns: keys + (ts_col, value_col) of the selected points."""
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    schema = f"{key_fields}, {ts_col} timestamp, {value_col} double"
    slim = df.select(*keys, ts_col, value_col)

    def select_points(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        idx = lttb_kernel(
            ts, pdf[value_col].to_numpy(dtype=np.float64), n_out
        )
        return pdf.iloc[idx]

    return slim.groupBy(*keys).applyInPandas(select_points, schema=schema)
