"""As-of (nearest-prior) join — the time-series join Spark lacks natively.

Semantics (backward as-of, the TSDB default): for each LEFT row, attach
the single RIGHT row with the greatest ``right_ts <= left_ts`` within the
same key group, optionally bounded by a tolerance. This is the join behind
"latest quote at trade time" / "last config before this event" queries.

Implementation is the SCALE pattern, not a range join: both sides are
union-tagged into one stream, shuffled ONCE on the keys, and a single
ordered window pass carries the latest right-side payload forward
(``last(struct, ignorenulls=True)``). Cost is one shuffle + one sort —
O(n log n) per key group — where an inequality join would explode to a
per-key cross product and a broadcast-range join would need value
bucketing. Equal timestamps: right rows sort BEFORE left rows at the same
instant, so ``right_ts == left_ts`` matches (the <= contract).

The right side must be unique per (keys, right_ts); callers pre-aggregate
duplicates (the driver query dedupes with ``.distinct()``) — the same
contract DuckDB's ASOF JOIN has for deterministic output, which is exactly
what makes the oracle twin (`j6_asof_join`) well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join of `right` onto `left` (see module docstring).

    Returns all `left` columns plus every non-key right column renamed
    with `suffix`, plus ``<right_ts><suffix>`` (the matched instant) —
    NULL where no prior right row exists (or none within `tolerance_us`).
    """
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias(right_ts + suffix),
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_tag"),
        payload.alias("__asof_payload"),
    )
    lcols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_tag"),
    )
    both = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__asof_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "__asof_carry", F.last("__asof_payload", ignorenulls=True).over(w)
    ).where(F.col("__asof_tag") == 1)
    if tolerance_us is not None:
        matched_ts = F.col("__asof_carry")[right_ts + suffix]
        # cast: parquet TIMESTAMP_NTZ is rejected by unix_micros; the
        # session timezone is pinned UTC so the cast is exact either way
        in_tol = (
            F.unix_micros(F.col(left_ts).cast("timestamp"))
            - F.unix_micros(matched_ts.cast("timestamp"))
        ) <= F.lit(int(tolerance_us))
        carried = carried.withColumn(
            "__asof_carry",
            F.when(in_tol, F.col("__asof_carry")),
        )
    out_cols = [F.col(c) for c in lcols]
    out_cols.append(
        F.col("__asof_carry")[right_ts + suffix].alias(right_ts + suffix)
    )
    out_cols.extend(
        F.col("__asof_carry")[c + suffix].alias(c + suffix) for c in rcols
    )
    return carried.select(*out_cols)
