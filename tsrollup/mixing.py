"""Training-mix operators: deterministic split / per-source sampling /
global shuffle — the data-mixing layer between a curated corpus and a
training run.

Everything here is a pure function of (doc_id, seed) via Spark's
`xxhash64` — JVM-side, no Python, no RNG state:

- **hash_split**: assign each document to train/val/test by hash range.
  Stable under corpus growth (a doc's split never changes when other
  docs are added/removed), stable across runs and cluster sizes, and a
  filter — fully pushdown-friendly, no shuffle.
- **stratified_sample**: per-source sampling rates (the "mixture
  weights" of a training recipe) by the same hash-range test against a
  broadcast rates table. Exact determinism makes sampled-corpus
  experiments reproducible and AUDITABLE: membership is recomputable
  row-by-row, which is also what lets a SQL oracle check it.
- **shuffle_rank**: an epoch-keyed deterministic global order
  (rank = row_number over xxhash64(doc_id, epoch)): epoch 0 and epoch 1
  are decorrelated permutations, every worker agrees on the order
  without coordination, and resuming mid-epoch is a rank-range filter.

At 10^12 rows: split/sample are stateless filters fused into the scan;
shuffle_rank's global row_number is the only shuffle (a total sort by
hash — rank ranges can also be served per-partition by sorting WITHIN
hash-range partitions when a strict global rank is not required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: denominator of every hash-range test; rates are expressed in 1/10000ths
GRAIN = 10_000


def _seed_key(id_col, seed: int):
    """The hashed key is the STRING "<id>#<seed>" — one canonical byte
    encoding that any engine can reproduce (the DuckDB oracle re-evaluates
    the same XXH64 over the same bytes via the duck_oracle macros), rather
    than Spark's type-dependent multi-argument hash fold. Different seeds
    are fully decorrelated hash functions."""
    return F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))


def _bucket(id_col, seed: int):
    """Deterministic bucket in [0, GRAIN)."""
    return F.pmod(F.xxhash64(_seed_key(id_col, seed)), F.lit(GRAIN))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_per10k: int = 500,
    test_per10k: int = 500,
    seed: int = 0,
) -> DataFrame:
    """Add a ``split`` column: 'test' for bucket < test_per10k, 'val' for
    the next val_per10k buckets, 'train' for the rest."""
    if not (0 <= val_per10k and 0 <= test_per10k
            and val_per10k + test_per10k <= GRAIN):
        raise ValueError(
            f"val_per10k + test_per10k must be within [0, {GRAIN}]: "
            f"{val_per10k} + {test_per10k}"
        )
    b = _bucket(id_col, seed)
    return df.withColumn(
        "split",
        F.when(b < test_per10k, F.lit("test"))
        .when(b < test_per10k + val_per10k, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    rates_per10k: dict[str, int],
    strat_col: str = "source",
    id_col: str = "doc_id",
    default_per10k: int = 0,
    seed: int = 1,
) -> DataFrame:
    """Keep each row iff its hash bucket < its stratum's rate (per-10k).
    The rates table is broadcast-joined (strata counts are dim-sized);
    strata absent from `rates_per10k` use `default_per10k`."""
    spark = df.sparkSession
    rates = spark.createDataFrame(
        list(rates_per10k.items()), f"{strat_col} string, __rate int"
    )
    return (
        df.join(F.broadcast(rates), strat_col, "left")
        .withColumn("__rate", F.coalesce(F.col("__rate"), F.lit(default_per10k)))
        .where(_bucket(id_col, seed) < F.col("__rate"))
        .drop("__rate")
    )


#: hash-range buckets for the scalable global rank (top bits of the hash)
_RANK_BUCKETS_BITS = 12


def shuffle_rank(
    df: DataFrame, id_col: str = "doc_id", epoch: int = 0
) -> DataFrame:
    """Add ``shuffle_rank`` (0-based): the row's position in the epoch's
    deterministic global permutation, ordered by (xxhash64(id#epoch),
    id) — the id tiebreak makes the order total even under hash
    collisions.

    Scalable evaluation (identical result to a naive global row_number,
    which would funnel the corpus through ONE partition): the hash's top
    12 bits are a range-aligned bucket, so global rank = (prefix sum of
    bucket counts) + rank within the bucket. Bucket counts are one small
    aggregate (4096 rows collected — O(buckets), never O(rows)); the
    within-bucket row_numbers run as 4096 independent window partitions.

    Two-pass contract: `df` is evaluated twice (counts, then ranks) — as
    with ANY two-pass global rank, it must be deterministic. The offsets
    join is INNER, so if a nondeterministic upstream makes the second
    pass disagree with the first, the disagreeing rows disappear from
    the output (a countable symptom) instead of silently carrying NULL
    ranks.
    """
    from pyspark.sql import Window

    h = F.xxhash64(_seed_key(id_col, epoch))
    # signed >> keeps bucket monotone in the signed hash order;
    # +2^(bits-1) maps to [0, 2^bits)
    bucket = (
        F.shiftright(h, 64 - _RANK_BUCKETS_BITS)
        + F.lit(1 << (_RANK_BUCKETS_BITS - 1))
    ).alias("__rb")
    with_b = df.withColumn("__rb", bucket)
    counts = with_b.groupBy("__rb").count().collect()
    off, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["__rb"]):
        off[r["__rb"]] = acc
        acc += r["count"]
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        list(off.items()) or [(0, 0)], "__rb long, __off long"
    )
    w = Window.partitionBy("__rb").orderBy(h, F.col(id_col))
    return (
        with_b.join(F.broadcast(offsets), "__rb", "inner")
        .withColumn(
            "shuffle_rank",
            F.col("__off") + F.row_number().over(w).cast("long") - 1,
        )
        .drop("__rb", "__off")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int = 5,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 3,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, top-k per
    stratum (Efraimidis-Spirakis A-ES): each row draws u ~ U(0,1) and
    ranks by u^(1/w) — equivalently ln(u)/w, used here — and the k
    largest keys per stratum form an exact weighted sample (heavier
    rows win proportionally more often). The quality-weighted doc
    selection step of a training-mix pipeline, with the same
    replay-anywhere determinism as the rest of mixing.py: u comes from
    xxhash64("<id>#<seed>") folded to a 1e9 grid then shifted into
    (0, 1), so the oracle re-derives the identical key from the same
    bytes; ranking happens on the ROUNDED key (1e-9, doc-id tiebreak)
    so last-ulp ln() drift between engines can never flip a rank.

    One hash + one per-stratum top-k window — no shuffle beyond the
    stratum partitioning; weights must be > 0. Returns the sampled rows
    with ``es_key`` and ``rnk`` (1-based)."""
    from pyspark.sql import Window

    grain = 1_000_000_000
    u = (F.pmod(F.xxhash64(_seed_key(id_col, seed)), F.lit(grain)) + 1) / F.lit(
        float(grain + 1)
    )
    keyed = df.withColumn("es_key", F.round(F.log(u) / F.col(weight_col), 9))
    w = Window.partitionBy(strat_col).orderBy(F.desc("es_key"), F.asc(id_col))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def reservoir_topk(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-group UNIFORM k-sample without replacement —
    the eval-set / human-review draw (weighted_sample_topk's uniform
    sibling): rank = row_number over (xxhash64(id#seed), id) within each
    group, keep rank <= k. Every member is equally likely under the
    hash's uniformity, the draw is reproducible and row-auditable
    (membership recomputable per row), and different seeds give
    decorrelated samples. One shuffle on group_col; at corpus scale the
    per-group top-k is a per-partition heap, never a global sort."""
    h = F.xxhash64(_seed_key(id_col, seed))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return df.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )


def quota_sample(
    df: DataFrame,
    n_total: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 9,
) -> DataFrame:
    """EXACT-SIZE stratified sample: exactly ``n_total`` rows overall,
    allocated across strata proportionally to their row counts with
    largest-remainder (Hamilton) rounding — the fixed-budget companion
    to ``stratified_sample``'s per-10k rates (rates can't promise an
    exact total; eval-set construction and annotation budgets need
    one). Within each stratum the draw is the reservoir_topk uniform
    rank: (xxhash64(id#seed), id) order, keep the stratum's allocation.

    All-integer allocation arithmetic — base = (n_total*c) div T,
    leftovers go to the largest remainders ((n_total*c) mod T,
    stratum-name tiebreak) — so the allocation, not just the
    membership, is oracle-twinnable. Floor-div/mod agree across engines
    for the positive operands here while n_total*c < 2^52 (the repo's
    standing floor-div bound).

    Scale shape: one stratum hash agg (dim-sized), the allocation
    window runs over that DIM-SIZED set only (n_strata rows through
    one partition — never corpus rows), allocations broadcast back,
    then one per-stratum rank window. Returns sampled rows with
    ``alloc`` and ``rnk``."""
    from pyspark.sql import Window

    if n_total < 0:
        raise ValueError(f"n_total must be >= 0: {n_total}")
    s = df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = s.agg(F.sum("__c").cast("long").alias("__t"))
    a0 = s.crossJoin(F.broadcast(tot)).select(
        strat_col,
        F.expr(f"CAST({n_total} AS BIGINT) * __c div __t").alias("__base"),
        F.expr(f"CAST({n_total} AS BIGINT) * __c % __t").alias("__rem"),
    )
    wall = Window.partitionBy()  # dim-sized by construction (see doc)
    wrem = Window.orderBy(F.desc("__rem"), F.asc(strat_col))
    alloc = a0.select(
        strat_col,
        (
            F.col("__base")
            + (
                F.row_number().over(wrem)
                <= F.lit(n_total) - F.sum("__base").over(wall)
            ).cast("long")
        ).alias("alloc"),
    )
    h = F.xxhash64(_seed_key(id_col, seed))
    w = Window.partitionBy(strat_col).orderBy(h, F.col(id_col))
    return (
        df.join(F.broadcast(alloc), strat_col)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= F.col("alloc"))
    )
