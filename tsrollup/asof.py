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


def interpolated_read(
    queries: DataFrame,
    obs: DataFrame,
    on: list[str],
    query_ts: str = "ts",
    obs_ts: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """J10 — linearly interpolated point-in-time read: for every query
    instant, the value lerped between the LAST observation at-or-before
    and the FIRST observation after (per key). The as-of join (J6)
    answers "last known value"; this answers "best estimate at t" for
    continuously-varying metrics — the standard read primitive for
    irregular samples.

    One UNION of queries into the observation stream + TWO window passes
    sharing a single (keys, ts) sort: prev = last non-null observation
    over the preceding frame (observations sort before queries at equal
    ts, so an exactly-coincident sample wins and the lerp factor is 0 —
    exact), next = first non-null over the strictly-following frame.
    Edge rows clamp (only-prev -> prev, only-next -> next, neither ->
    NULL). Timestamps subtract as exact microsecond BIGINTs; the lerp is
    one closed-form double rounded 1e-6, hash-twinnable.

    ``tiebreak`` pins the order of equal-timestamp observations (same
    contract as counter_increase); pass it whenever obs timestamps can
    collide within a key.

    Scale shape: ONE shuffle on the series keys covers both windows
    (same partitioning + sort order — Catalyst plans a single Exchange
    and sort); no join at all.
    """
    tb_obs = (
        [F.col(tiebreak)] if tiebreak and tiebreak in obs.columns else []
    )
    o = obs.select(
        *on,
        F.unix_micros(F.col(obs_ts).cast("timestamp")).alias("__us"),
        F.lit(0).alias("__tag"),
        F.col(value_col).cast("double").alias("__v"),
        *( [F.col(tiebreak).alias("__tb")] if tb_obs else [F.lit(0).alias("__tb")] ),
    )
    qcols = [c for c in queries.columns]
    qn = queries.select(
        *qcols,
        F.unix_micros(F.col(query_ts).cast("timestamp")).alias("__us"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(0).alias("__tb"),
    )
    # align schemas: carry query payload columns as NULL on the obs side
    extra = [c for c in qcols if c not in on and c != query_ts]
    o_full = o.select(
        *on,
        *[F.lit(None).cast(queries.schema[c].dataType).alias(c) for c in extra],
        F.lit(None).cast(queries.schema[query_ts].dataType).alias(query_ts)
        if query_ts not in on else F.col(query_ts),
        "__us", "__tag", "__v", "__tb",
    )
    q_full = qn.select(
        *on, *extra, query_ts, "__us", "__tag", "__v", "__tb"
    )
    u = o_full.unionByName(q_full)
    order = [F.col("__us"), F.col("__tag"), F.col("__tb")]
    wprev = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy(*on).orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pt = F.struct("__us", "__v")
    marked = u.select(
        *on, *extra, query_ts, "__us", "__tag",
        F.last(F.when(F.col("__tag") == 0, pt), ignorenulls=True)
        .over(wprev).alias("__prev"),
        F.first(F.when(F.col("__tag") == 0, pt), ignorenulls=True)
        .over(wnext).alias("__next"),
    ).where(F.col("__tag") == 1)
    p_us, p_v = F.col("__prev.__us"), F.col("__prev.__v")
    n_us, n_v = F.col("__next.__us"), F.col("__next.__v")
    interp = (
        F.when(F.col("__prev").isNull() & F.col("__next").isNull(), F.lit(None))
        .when(F.col("__prev").isNull(), n_v)
        .when(F.col("__next").isNull(), p_v)
        .when(n_us == p_us, p_v)
        .otherwise(
            p_v
            + (n_v - p_v)
            * ((F.col("__us") - p_us).cast("double")
               / (n_us - p_us).cast("double"))
        )
    )
    return marked.select(
        *on, *extra, query_ts,
        F.round(interp, 6).alias("value_interp_r"),
        (F.col("__us") - p_us).alias("us_since_prev"),
        (n_us - F.col("__us")).alias("us_to_next"),
    )
