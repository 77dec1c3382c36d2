"""Mergeable sketch rollups — approximate continuous aggregates that cascade.

The core rollup (rollup.py) stores only *algebraic* aggregates (sum/cnt/
min/max), which compose exactly across retention tiers. This module adds the
three sketch families a production rollup store keeps alongside them, each
chosen because its merge is associative, so the same 1m → 1h → 1d cascade
applies without re-scanning raw data:

- **Fixed-bin histograms** (percentiles): long-format `(keys…, bin, bin_cnt)`
  rows. Merge = re-aggregate summing `bin_cnt` — plain SQL, exactly
  oracle-able. Percentile extraction uses integer-only threshold math
  (`cum*1000 >= q‰*total`) so Spark and any ANSI engine agree bit-for-bit.
- **Second moments** (variance/stddev): `(cnt, s1, s2)` partials with the
  sums carried as DECIMAL(38,0) — exact integer arithmetic at 10^12-row
  scale where double accumulation would drift and int64 `s2` would overflow
  (10^12 · (4·10^3)² ≈ 1.6·10^19 > 2^63).
- **HLL distinct sketches** (Apache DataSketches, built into Spark ≥3.5):
  binary sketch column merged with `hll_union_agg`. Small cardinalities stay
  in the sketch's exact (coupon) regime, which the tests pin; estimates at
  scale are within the standard HLL error envelope.

Everything here is built-in JVM expressions — no Python in any hot path —
and every merge is a plain `groupBy().agg()`, so Catalyst plans it as an
ordinary partial-aggregate shuffle (map-side combine included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ histogram

def hist_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    bin_width: float,
    lo: float = 0.0,
) -> DataFrame:
    """Fixed-bin histogram partials: one row per (keys…, bin).

    `bin = floor((value - lo) / bin_width)`, clamped at 0 so out-of-range-low
    values land in the first bin (they still count toward totals). Long
    format keeps the merge SQL-expressible and lets Catalyst prune/aggregate
    it like any fact table; a map/array column would force a Python merge.
    """
    bin_col = F.greatest(
        F.lit(0),
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(bin_width)),
    ).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("bin_cnt"))
    )


def hist_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Cascade histograms to a coarser key set: sum counts per bin."""
    return partials.groupBy(*keys, "bin").agg(F.sum("bin_cnt").alias("bin_cnt"))


def hist_percentiles(
    hist: DataFrame,
    keys: list[str],
    qs_permille: list[int],
    bin_width: float,
    lo: float = 0.0,
) -> DataFrame:
    """Percentile estimates from a merged histogram.

    For each q (in permille, e.g. 500/950/990), the estimate is the UPPER
    edge of the first bin whose cumulative count reaches ceil(q‰ · total):
    `cum_cnt * 1000 >= q * total` — pure int64 comparisons, so any two
    engines computing this agree exactly; the only float is the final edge
    `lo + (bin+1)·bin_width`, a product of small exact values.
    Returns one row per key group with a `p{q}` column per requested q.
    """
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        "bin",
        F.sum("bin_cnt").over(w_cum).alias("cum_cnt"),
        F.sum("bin_cnt").over(w_all).alias("total_cnt"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum_cnt") * F.lit(1000) >= F.lit(q) * F.col("total_cnt"),
                F.lit(float(lo)) + (F.col("bin") + F.lit(1)) * F.lit(float(bin_width)),
            )
        ).alias(f"p{q}")
        for q in qs_permille
    ]
    return cum.groupBy(*keys).agg(*aggs)


# -------------------------------------------------------------- second moments

def moment_partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Exact (cnt, s1, s2) partials over an integer-valued column.

    DECIMAL(38,0) sums: associative AND exact, so the cascade re-aggregate
    is byte-deterministic regardless of shuffle order — the same contract
    rollup.py holds for its int64 counters, extended past int64 range.
    """
    v = F.col(value_col).cast("decimal(38,0)")
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("m_cnt"),
        F.sum(v).alias("m_s1"),
        F.sum(v * v).alias("m_s2"),
    )


def moment_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Cascade moments to coarser keys: all three components just sum."""
    return partials.groupBy(*keys).agg(
        F.sum("m_cnt").alias("m_cnt"),
        F.sum("m_s1").alias("m_s1"),
        F.sum("m_s2").alias("m_s2"),
    )


def moment_finalize(merged: DataFrame, round_to: int = 6) -> DataFrame:
    """Derive mean / var_pop / stddev_pop from exact partials.

    Division happens once, in float64, at the very end (same never-average-
    averages rule as rollup.py's means). Rounded so an independent engine's
    single-pass variance (different summation order) compares equal.
    """
    cnt = F.col("m_cnt").cast("double")
    mean = F.col("m_s1").cast("double") / cnt
    var = F.col("m_s2").cast("double") / cnt - mean * mean
    var = F.greatest(var, F.lit(0.0))  # clamp -0.0/-1e-18 float residue
    return merged.select(
        *[c for c in merged.columns if not c.startswith("m_")],
        F.col("m_cnt").alias("cnt"),
        F.round(mean, round_to).alias("mean"),
        F.round(var, round_to).alias("var_pop"),
        F.round(F.sqrt(var), round_to).alias("stddev_pop"),
    )


# ------------------------------------------------------------------------ HLL

#: lgConfigK for every sketch in the store. MUST be uniform: hll_union_agg
#: of mixed-k sketches silently degrades to the smallest k. 12 → ~1.6 KB max
#: per sketch, ±2.2% standard error, exact below the coupon-set promotion
#: threshold (hundreds of uniques) — right size for per-(source,bucket) rows.
HLL_LGK = 12


def hll_partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group HLL sketch of distinct `value_col` (binary column `hll`)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(HLL_LGK)).alias("hll")
    )


def hll_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Cascade: union sketches to coarser keys. Associative, so tier
    cascades (1m → 1h → 1d) never re-scan raw data to count distincts."""
    return partials.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimate(df: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Replace the sketch column with its rounded estimate (bigint)."""
    return df.select(
        *[c for c in df.columns if c != "hll"],
        F.round(F.hll_sketch_estimate("hll")).cast("long").alias(out_col),
    )


def hll_rollup_tiers(
    df: DataFrame,
    tiers_cascade: dict[str, str | None],
    tier_trunc: dict[str, str],
    value_col: str = "doc_id",
    ts_col: str = "event_ts",
) -> dict[str, DataFrame]:
    """Distinct-count sketch tier for the rollup store: per (source, bucket)
    HLL of `value_col` at the finest tier, coarser tiers by sketch union —
    mirrors rollup.build_all_tiers' cascade shape. Returns
    {tier: DF[source, bucket_start, hll]}.
    """
    out: dict[str, DataFrame] = {}
    for tier, src in tiers_cascade.items():
        if src is None:
            base = df.withColumn(
                "bucket_start", F.date_trunc(tier_trunc[tier], F.col(ts_col))
            )
            out[tier] = hll_partials(base, ["source", "bucket_start"], value_col)
        else:
            coarser = out[src].withColumn(
                "bucket_start", F.date_trunc(tier_trunc[tier], "bucket_start")
            )
            out[tier] = hll_merge(coarser, ["source", "bucket_start"])
    return out


# ------------------------------------------------------- heavy hitters (MG)

def mg_summary_partials(
    df: DataFrame, item_col: str, k: int, flatten_arrays: bool = False
) -> DataFrame:
    """Per-PARTITION Misra-Gries summaries of item frequencies, budget k.

    mapInPandas keeps one k-entry counter table per task and folds each
    Arrow batch's exact (np.unique) histogram into it with the summary
    MERGE rule (combine counts; if > k entries survive, subtract the
    (k+1)-largest count from all and keep positives — the mergeable-
    summaries form, error <= n_partition/(k+1)). Guarantee used
    downstream: any item whose TRUE count in a partition exceeds
    n_p/(k+1) is present in that partition's summary.

    `flatten_arrays=True` treats item_col as array<int> and counts
    elements (the token-payload case) — one np.concatenate per batch,
    no explode. Returns (item, cnt_lb, part_rows): the MG lower-bound
    count and the partition's row (or token) total; one extra MARKER row
    per non-empty partition (item NULL, cnt_lb 0) carries the partition
    total so callers can derive N without re-scanning the input.
    """
    import numpy as np
    import pandas as pd

    def _mg(batches):
        cnt: dict = {}
        total = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if flatten_arrays:
                arrs = [np.asarray(a) for a in pdf[item_col] if len(a)]
                if not arrs:
                    continue
                items = np.concatenate(arrs)
            else:
                items = pdf[item_col].to_numpy()
            total += items.shape[0]
            u, c = np.unique(items, return_counts=True)
            for it, ci in zip(u.tolist(), c.tolist()):
                cnt[it] = cnt.get(it, 0) + ci
            if len(cnt) > k:
                kth = sorted(cnt.values(), reverse=True)[k]
                cnt = {it: v - kth for it, v in cnt.items() if v > kth}
        if total:
            yield pd.DataFrame(
                {
                    "item": list(cnt.keys()) + [None],
                    "cnt_lb": np.array(list(cnt.values()) + [0], dtype=np.int64),
                    "part_rows": np.int64(total),
                }
            )

    return df.select(item_col).mapInPandas(_mg, "item long, cnt_lb long, part_rows long")


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int,
    flatten_arrays: bool = False,
) -> DataFrame:
    """EXACT frequent-item set above the N/(k+1) threshold, two scans.

    Scan 1: per-partition MG summaries (budget k) -> the candidate set.
    Completeness: an item with global count > N/(k+1) must exceed
    n_p/(k+1) in at least one partition (averaging argument), so it
    appears in that partition's summary — candidates are a guaranteed
    superset of the frequent set. Scan 2: exact recount of ONLY the
    candidates (broadcast semi-join of the small candidate list into the
    scan — the full item histogram is never built), then filter
    cnt > N/(k+1). Output is therefore EXACT (items + true counts), which
    is what makes the operator oracle-twinnable; the sketch bounds live
    in the tests. Candidate count <= k x partitions, bounded and small.
    N comes from the summaries' per-partition marker rows, so the input
    is scanned exactly TWICE (summaries, recount) — the small summary
    table is localCheckpointed so neither the candidate list nor the N
    aggregate re-runs the sketch scan. Items must be integral (token
    ids); string items would need a hash column first.
    """
    summ = mg_summary_partials(df, item_col, k, flatten_arrays).localCheckpoint()
    n_total = summ.where(F.col("item").isNull()).agg(
        F.coalesce(F.sum("part_rows"), F.lit(0))
    ).collect()[0][0]
    cands = summ.where(F.col("item").isNotNull()).select("item").distinct()
    if flatten_arrays:
        exploded = df.select(F.explode(item_col).alias("item"))
    else:
        exploded = df.select(F.col(item_col).cast("long").alias("item"))
    counted = (
        exploded.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.where(F.col("cnt") * (k + 1) > F.lit(n_total)).select(
        "item", "cnt"
    )


# ------------------------------------------------- count-min sketch (CMS)

def cms_from_counts(
    counts: DataFrame,
    item_col: str,
    cnt_col: str,
    width: int = 512,
    depth: int = 3,
) -> DataFrame:
    """Count-Min sketch table from an exact (item, count) histogram:
    depth x width BIGINT cells, cell(r, item) = pmod(xxhash64(int(item),
    int(r)), width), cnt = sum of colliding items' counts.

    The depth-r hash is Spark's xxhash64 fold over the two INT columns
    (item, r) — the exact fold duck_oracle.xxh64_intlist replicates — so
    a DuckDB oracle rebuilds the identical table and the sketch itself
    is value-twinnable, not just its downstream estimates.

    Built FROM the vocab-bounded histogram (tokenstats' explode-free
    partials), not from raw occurrences: the input to this operator is
    |V| rows, the output depth*width cells, and both are mergeable —
    CMS tables from disjoint corpus shards ADD cell-wise (same groupBy),
    which is what a 100-TB sharded build does. Estimates are upper
    bounds: est(x) = min_r cell(r, x) >= true(x), within eN/width with
    prob 1 - exp(-depth) (Cormode & Muthukrishnan '05)."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive, got {width}/{depth}")
    rows = counts.select(
        F.col(item_col).cast("int").alias("item"),
        F.col(cnt_col).cast("long").alias("cnt"),
        F.explode(
            F.array(*[F.lit(r).cast("int") for r in range(depth)])
        ).alias("r"),
    )
    return (
        rows.select(
            "r",
            F.pmod(F.xxhash64(F.col("item"), F.col("r")), F.lit(width)).alias("cell"),
            "cnt",
        )
        .groupBy("r", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, item_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query the CMS: est(item) = min over the depth rows of the
    item's cell count. One broadcast join of the (small) probe list onto
    the sketch — the original data is never touched, which is the whole
    point of keeping a sketch."""
    pr = probes.select(F.col(item_col).cast("int").alias("item")).distinct()
    cells = pr.select(
        "item",
        F.explode(
            F.array(*[F.lit(r).cast("int") for r in range(depth)])
        ).alias("r"),
    ).select(
        "item", "r",
        F.pmod(F.xxhash64(F.col("item"), F.col("r")), F.lit(width)).alias("cell"),
    )
    joined = F.broadcast(cells).join(cms, ["r", "cell"], "inner")
    return joined.groupBy("item").agg(F.min("cnt").alias("cnt_cms"))


# ----------------------------------------------------------------- KLL
# Rank-accurate MERGEABLE quantile sketch (Karnin-Lang-Liberty, FOCS'16).
# Closes the gap the fixed-bin histogram family leaves open: hist_partials
# needs pre-known bin edges and the exact percentile rollup cannot cascade,
# so arbitrary-range p99s over 1m -> 1h -> 1d tiers previously required a
# raw re-scan. KLL partials/merges are long-format (keys..., level, value)
# rows with weight 2^level — the same table shape as hist partials, so the
# same storage/cascade machinery applies — and percentile EXTRACTION is
# pure SQL window math over the long rows (integer threshold comparisons,
# cross-engine exact), keeping Python confined to the bounded-memory
# sketch build/merge inside applyInPandas (Arrow-batched, never per-row).
#
# Guarantees (paper form): rank error eps ~ O(1/k) with the (2/3)-decay
# capacities used here; a group whose item count never overflows the
# level-0 capacity (n <= k) is LOSSLESS — every item sits at level 0 with
# weight 1 and every quantile is the exact discrete value-at-rank. That
# exact regime is what the driver board twins (sk_kll_pctl), the same
# posture as sk_hll_distinct's coupon regime; the compaction regime is
# covered by a rank-error envelope test vs np.percentile.

#: default accuracy knob: max level-0 buffer length. eps ~= 1.7/k on the
#: envelope test (pinned at 3*n/k absolute rank error, conservative).
KLL_K = 200


def _kll_capacity(k: int, depth_from_top: int) -> int:
    """Capacity of a level `depth_from_top` levels below the highest:
    ceil(k * (2/3)^depth), floored at 2 (a 1-item buffer can't compact)."""
    import math

    return max(2, math.ceil(k * (2.0 / 3.0) ** depth_from_top))


def _kll_compact(levels: list, flips: list, k: int) -> None:
    """Compact every overfull level in place: sort the buffer, promote
    every other item (alternating offset per level — deterministic given
    insertion order; the classic coin flip only matters adversarially) to
    the level above at doubled weight, drop the rest. Repeats until all
    levels fit, because promoting can overflow the level above and
    growing H shrinks lower-level capacities."""
    import numpy as np

    changed = True
    while changed:
        changed = False
        for h in range(len(levels)):
            cap = _kll_capacity(k, len(levels) - 1 - h)
            if len(levels[h]) > cap:
                buf = np.sort(levels[h])
                off = flips[h] & 1
                flips[h] += 1
                if h + 1 == len(levels):
                    levels.append(np.array([], dtype=np.float64))
                    flips.append(0)
                levels[h + 1] = np.concatenate([levels[h + 1], buf[off::2]])
                levels[h] = np.array([], dtype=np.float64)
                changed = True
    return None


def _kll_from_values(values, k: int) -> list:
    """Build a KLL sketch from raw values, fed in level-0-capacity chunks
    (the streaming insertion order — memory stays O(k log(n/k)) even
    though the Arrow group hands us the whole array)."""
    import numpy as np

    levels = [np.array([], dtype=np.float64)]
    flips = [0]
    values = np.asarray(values, dtype=np.float64)
    for i in range(0, len(values), max(2, k)):
        levels[0] = np.concatenate([levels[0], values[i : i + max(2, k)]])
        _kll_compact(levels, flips, k)
    return levels


def _kll_long_rows(levels: list):
    """(level, value) long rows for a sketch."""
    import numpy as np

    if not any(len(b) for b in levels):
        return np.array([], dtype=np.int32), np.array([], dtype=np.float64)
    lv = np.concatenate(
        [np.full(len(b), h, dtype=np.int32) for h, b in enumerate(levels)]
    )
    va = np.concatenate([np.asarray(b, dtype=np.float64) for b in levels])
    return lv, va


def _keys_schema(df: DataFrame, keys: list[str]) -> str:
    return ", ".join(f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys)


def kll_partials(
    df: DataFrame, keys: list[str], value_col: str, k: int = KLL_K
) -> DataFrame:
    """Per-group KLL sketch of `value_col` as long-format rows
    (keys..., level int, value double). NULLs are excluded (same contract
    as hist_partials). One applyInPandas stage — grouped Arrow batches,
    bounded sketch memory, no per-row Python."""
    import pandas as pd

    schema = f"{_keys_schema(df, keys)}, level int, value double"

    def build(key, pdf):
        vals = pdf[value_col].to_numpy(dtype="float64")
        levels = _kll_from_values(vals, k)
        lv, va = _kll_long_rows(levels)
        out = pd.DataFrame({"level": lv, "value": va})
        for i, kc in enumerate(keys):
            out.insert(i, kc, pd.Series([key[i]] * len(out)))
        return out

    return (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, value_col)
        .groupBy(*keys)
        .applyInPandas(build, schema)
    )


def kll_merge(partials: DataFrame, keys: list[str], k: int = KLL_K) -> DataFrame:
    """Cascade KLL sketches to a coarser key set: per output group,
    concatenate the input sketches level-wise, then re-compact. Merge is
    associative in the rank-error budget (the KLL merge rule), so
    1m -> 1h -> 1d tier cascades never re-scan raw data."""
    import numpy as np
    import pandas as pd

    schema = f"{_keys_schema(partials, keys)}, level int, value double"

    def merge(key, pdf):
        hmax = int(pdf["level"].max())
        levels = [
            pdf.loc[pdf["level"] == h, "value"].to_numpy(dtype="float64")
            for h in range(hmax + 1)
        ]
        flips = [0] * (hmax + 1)
        _kll_compact(levels, flips, k)
        lv, va = _kll_long_rows(levels)
        out = pd.DataFrame({"level": lv, "value": va})
        for i, kc in enumerate(keys):
            out.insert(i, kc, pd.Series([key[i]] * len(out)))
        return out

    return (
        partials.select(*keys, "level", "value")
        .groupBy(*keys)
        .applyInPandas(merge, schema)
    )


def kll_percentiles(
    sketch: DataFrame, keys: list[str], qs_permille: list[int]
) -> DataFrame:
    """Quantile estimates from long-format KLL rows — pure SQL, no Python.

    Weight of a level-h item is 2^h (exact int64). The q-permille estimate
    is the smallest value whose cumulative weight reaches ceil(q . W/1000):
    `cum_w * 1000 >= q * total_w`, integer-only comparisons, so any ANSI
    engine extracting from the same rows agrees bit-for-bit (ties on value
    collapse to the same answer regardless of intra-tie window order)."""
    w = sketch.select(
        *keys,
        "value",
        F.expr("CAST(pow(2, level) AS BIGINT)").alias("wgt"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("value", "wgt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = w.select(
        *keys,
        "value",
        F.sum("wgt").over(w_cum).alias("cum_w"),
        F.sum("wgt").over(w_all).alias("total_w"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum_w") * F.lit(1000) >= F.lit(q) * F.col("total_w"),
                F.col("value"),
            )
        ).alias(f"p{q}")
        for q in qs_permille
    ]
    return cum.groupBy(*keys).agg(*aggs)
