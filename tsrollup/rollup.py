"""Continuous aggregates: bucketize → (salted) aggregate → tier cascade.

Exactness contract (SURVEY.md §2.2): every stored aggregate is algebraic —
int64 counters compose associatively, so shuffles may reorder partials
freely without changing a byte. Means are ALWAYS derived (`sum/cnt`) and
never averaged across tiers, which is what makes the cascade exact and
cross-parallelism byte-parity achievable.

Token-level statistics (A2) never explode the `tokens` array: a per-row
pre-reduction with `F.aggregate` / `array_min` / `array_max` runs inside
whole-stage codegen, then ordinary hash aggregation runs over scalars.
At 10^12 sequences an explode would be ~10^14–10^15 rows — a non-starter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import CASCADE_FROM, TIER_TRUNC, RollupConfig

#: columns every rollup row carries, in canonical order (matches
#: schemas.ROLLUP_SCHEMA).
ROLLUP_COLS = [
    "source", "bucket_start", "tier",
    "cnt", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean",
    "tok_sum", "tok_cnt", "tok_min", "tok_max", "tok_mean",
    "gap_filled",
]


def bucketize(df: DataFrame, tier: str, ts_col: str = "event_ts") -> DataFrame:
    """B1 — floor event time to the tier bucket."""
    return df.withColumn("bucket_start", F.date_trunc(TIER_TRUNC[tier], F.col(ts_col)))


#: int32 sentinels marking "no tokens seen" in the single-pass fold; the
#: aggregation null-guards them via row_tok_cnt so empty-array rows behave
#: exactly like array_min/array_max (null, excluded from group min/max).
_TOK_SENTINEL_MIN = 2147483647
_TOK_SENTINEL_MAX = -2147483648


def _token_fold():
    """One traversal of `tokens` folding (sum, min, max) into a struct.

    Replaces three separate HOF passes (aggregate-sum + array_min +
    array_max): measured 21% off the O(corpus) scan+agg phase at sf0.1,
    best-of-3 warm (5.81 s → 4.57 s). Whole-stage codegen's subexpression
    elimination evaluates the fold once even though the downstream
    aggregation reads all three fields. `least`/`greatest` skip nulls the
    same way array_min/array_max do."""
    acc0 = F.struct(
        F.lit(0).cast("long").alias("s"),
        F.lit(_TOK_SENTINEL_MIN).alias("mn"),
        F.lit(_TOK_SENTINEL_MAX).alias("mx"),
    )
    return F.aggregate(
        "tokens",
        acc0,
        lambda acc, x: F.struct(
            (acc["s"] + x.cast("long")).alias("s"),
            F.least(acc["mn"], x).alias("mn"),
            F.greatest(acc["mx"], x).alias("mx"),
        ),
    )


def token_reduce_cols() -> list:
    """The per-row token-reduction columns shared by the batch pre-reduce
    and the streaming pre-reduce (streaming.py) — one definition so the
    batch/streaming byte-parity contract can't drift."""
    return [
        F.col("n_tok").cast("long").alias("n_tok_l"),
        F.col("n_tok").alias("n_tok_i"),
        _token_fold().alias("row_red"),
        F.size("tokens").cast("long").alias("row_tok_cnt"),
    ]


def _token_fold_arrow(with_hash: bool):
    """Arrow-native (sum, min, max, size) fold over the `tokens` list column.

    `F.aggregate` is a higher-order function: Catalyst evaluates the lambda
    per element in INTERPRETED mode (no whole-stage codegen), and at ~291
    tokens/row the fold — not the parquet decode — was the scan_agg wall.
    Measured at sf0.1 (1M rows, noop sink, median of 3): HOF prereduce
    6.67 s vs this kernel 2.23 s, with scan-and-discard of the raw token
    column alone at 2.18 s — i.e. the kernel folds at the decode floor.
    numpy reduceat over the list offsets does the whole batch in three
    vectorized passes; sums accumulate in int64 (exact — max |token| * max
    len is far under 2^63), min/max are exact int32, so every output value
    is bit-identical to the interpreted fold (PARITY-checked incl. the
    sentinel empty-array contract, and pinned in tests/test_rollup_parity).

    xxhash64(tokens) stays a JVM expression computed BEFORE the kernel
    (Catalyst's array hashing is not worth replicating in Python); the
    kernel only passes it through. Schema contract (schemas.py): `tokens`
    is non-null with non-null elements, so only the empty-array shape
    needs the sentinel path here — matching `_token_fold`'s accumulator
    seeds exactly."""
    import numpy as np
    import pyarrow as pa

    def fold(it):
        for b in it:
            tok = b.column("tokens")
            off = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = tok.values.to_numpy(zero_copy_only=False)
            n = len(tok)
            starts, ends = off[:-1], off[1:]
            sizes = ends - starts
            nonempty = sizes > 0
            s = np.zeros(n, dtype=np.int64)
            mn = np.full(n, _TOK_SENTINEL_MIN, dtype=np.int32)
            mx = np.full(n, _TOK_SENTINEL_MAX, dtype=np.int32)
            if vals.size:
                idx = starts[nonempty]
                v64 = vals.astype(np.int64)
                s[nonempty] = np.add.reduceat(v64, idx)
                mn[nonempty] = np.minimum.reduceat(vals, idx)
                mx[nonempty] = np.maximum.reduceat(vals, idx)
            red = pa.StructArray.from_arrays(
                [pa.array(s, type=pa.int64()),
                 pa.array(mn, type=pa.int32()),
                 pa.array(mx, type=pa.int32())],
                names=["s", "mn", "mx"],
            )
            cols = [
                b.column("doc_id"), b.column("source"), b.column("bucket_start"),
                b.column("n_tok_l"), b.column("n_tok_i"), red,
                pa.array(sizes, type=pa.int64()),
            ]
            names = ["doc_id", "source", "bucket_start", "n_tok_l", "n_tok_i",
                     "row_red", "row_tok_cnt"]
            if with_hash:
                cols.append(b.column("row_hash"))
                names.append("row_hash")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return fold


def token_prereduce(df: DataFrame, with_hash: bool = False) -> DataFrame:
    """A2 pre-step — collapse the tokens array to per-row scalars without
    exploding (no 10^14-row blowup). tok_cnt uses the list size rather than
    trusting the denormalized n_tok, so the stats stay honest even if an
    upstream writer let them drift; n_tok itself is aggregated separately.

    with_hash adds xxhash64(tokens) so the lineage token-checksum rides the
    SAME scan as the aggregation — one pass over the raw corpus, not two.

    The fold itself runs in an Arrow kernel (`_token_fold_arrow`) — only
    the columns the fold needs cross the Python boundary, and the heavy
    token bytes never shuffle: the kernel's scalars feed the map-side
    partial aggregation in the same stage. Streaming keeps the expression
    fold (`token_reduce_cols`) — structured-streaming aggs can't host a
    mapInArrow — and tests/test_rollup_parity pins the two bit-identical."""
    cols = [
        F.col("doc_id"),
        F.col("source"),
        F.col("bucket_start"),
        F.col("n_tok").cast("long").alias("n_tok_l"),
        F.col("n_tok").alias("n_tok_i"),
        F.col("tokens"),
    ]
    schema = (
        "doc_id string, source string, bucket_start timestamp, "
        "n_tok_l long, n_tok_i int, "
        "row_red struct<s: bigint, mn: int, mx: int>, row_tok_cnt long"
    )
    if with_hash:
        cols.append(F.xxhash64("tokens").alias("row_hash"))
        schema += ", row_hash long"
    return df.select(*cols).mapInArrow(_token_fold_arrow(with_hash), schema)


def _partial_aggs(with_hash: bool = False):
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tok_l").alias("n_tok_sum"),
        F.min("n_tok_i").alias("n_tok_min"),
        F.max("n_tok_i").alias("n_tok_max"),
        F.sum(F.col("row_red")["s"]).alias("tok_sum"),
        F.sum("row_tok_cnt").alias("tok_cnt"),
        F.min(F.when(F.col("row_tok_cnt") > 0, F.col("row_red")["mn"])).alias("tok_min"),
        F.max(F.when(F.col("row_tok_cnt") > 0, F.col("row_red")["mx"])).alias("tok_max"),
    ]
    if with_hash:
        aggs.append(F.expr("bit_xor(row_hash)").alias("hash_xor"))
    return aggs


def _combine_aggs(with_hash: bool = False):
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("n_tok_sum").alias("n_tok_sum"),
        F.min("n_tok_min").alias("n_tok_min"),
        F.max("n_tok_max").alias("n_tok_max"),
        F.sum("tok_sum").alias("tok_sum"),
        F.sum("tok_cnt").alias("tok_cnt"),
        F.min("tok_min").alias("tok_min"),
        F.max("tok_max").alias("tok_max"),
    ]
    if with_hash:
        aggs.append(F.expr("bit_xor(hash_xor)").alias("hash_xor"))
    return aggs


def _finalize(df: DataFrame, tier: str, with_hash: bool = False) -> DataFrame:
    """Derive means, stamp tier/gap_filled, order columns canonically."""
    extra = [F.col("hash_xor")] if with_hash else []
    return df.select(
        "source",
        "bucket_start",
        F.lit(tier).alias("tier"),
        "cnt",
        "n_tok_sum",
        "n_tok_min",
        "n_tok_max",
        (F.col("n_tok_sum").cast("double") / F.col("cnt")).alias("n_tok_mean"),
        "tok_sum",
        "tok_cnt",
        "tok_min",
        "tok_max",
        (F.col("tok_sum").cast("double") / F.col("tok_cnt")).alias("tok_mean"),
        F.lit(False).alias("gap_filled"),
        *extra,
    )


def rollup_from_raw(
    df: DataFrame, tier: str, salt_buckets: int | None = None, with_hash: bool = False
) -> DataFrame:
    """A1+A2 (+K2) — per-(source, bucket) aggregate of the raw sequence table.

    With `salt_buckets`, runs the two-phase salted aggregation for skewed
    sources (SURVEY.md §2.6): phase 1 groups by (source, bucket, salt) —
    the shuffle spreads a hot (source, bucket) over `salt_buckets` reducers —
    phase 2 combines the algebraic partials exactly. Catalyst's map-side
    partial aggregation already bounds common skew; salting is the explicit
    escape hatch the spec mandates for 10^12-row hot keys.
    """
    pre = token_prereduce(bucketize(df, tier), with_hash)
    if salt_buckets and salt_buckets > 1:
        salted = pre.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
        phase1 = salted.groupBy("source", "bucket_start", "_salt").agg(*_partial_aggs(with_hash))
        agg = phase1.groupBy("source", "bucket_start").agg(*_combine_aggs(with_hash))
    else:
        agg = pre.groupBy("source", "bucket_start").agg(*_partial_aggs(with_hash))
    return _finalize(agg, tier, with_hash)


def cascade(finer: DataFrame, to_tier: str) -> DataFrame:
    """A3 — build a coarser tier exactly from the finer tier's partials.

    Gap-filled rows are excluded (they carry no mass, SURVEY.md §2.3);
    the coarser tier re-runs its own gap-fill afterwards.
    """
    unit = TIER_TRUNC[to_tier]
    agg = (
        finer.where(~F.col("gap_filled"))
        .withColumn("bucket_start", F.date_trunc(unit, "bucket_start"))
        .groupBy("source", "bucket_start")
        .agg(*_combine_aggs())
    )
    return _finalize(agg, to_tier)


def build_all_tiers(df: DataFrame, cfg: RollupConfig | None = None) -> dict[str, DataFrame]:
    """raw → 1m → 1h → 1d. The 1m result is the only tier computed from raw;
    coarser tiers cascade (cheaper, and exact by §2.2)."""
    cfg = cfg or RollupConfig()
    tiers: dict[str, DataFrame] = {}
    for tier in cfg.tiers:
        src = CASCADE_FROM[tier]
        if src is None:
            tiers[tier] = rollup_from_raw(df, tier, cfg.salt_buckets)
        else:
            tiers[tier] = cascade(tiers[src], tier)
    return tiers
