"""K7 — explicit salted skew JOIN (hot keys only).

K2 (rollup.rollup_from_raw) salts skewed AGGREGATION; K3 leaves skewed
joins to AQE's runtime skew-split. This module is the explicit salting
escape hatch for the join case the spec names ("explicit salting + AQE"):
a 10^12-row fact stream where one key holds a double-digit share of the
rows makes one reducer the whole job's critical path, and AQE's skew-join
only fires for sort-merge joins above its size thresholds — an explicit,
plan-stable rewrite is the production control.

The rewrite (classic replicate-and-salt, e.g. the Spark AQE design docs
and every hand-tuned warehouse):

- FACT side: rows whose key is HOT get `_salt = pmod(xxhash64(salt_col),
  S)` — a deterministic, content-pure spread over S sub-keys; cold rows
  get `_salt = 0` and pay nothing.
- DIM side: hot-key rows are replicated S times (posexplode of a literal
  array — S is tens, dims are catalog-sized, so the blow-up is bounded
  and broadcast-friendly); cold rows keep one copy with `_salt = 0`.
- Join on (key, _salt). Every fact row finds exactly one dim copy, so
  the result is ROW-IDENTICAL to the unsalted join (pinned by twin +
  property test); the hot key's shuffle mass is spread over S reducers.

Salting ONLY the hot list matters at scale: salting every key would
multiply the whole dim shuffle by S and defeat dictionary-encoded
locality for the 99.9% of keys that were fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, factor: int = 2, cap: int = 1000) -> list:
    """Keys whose row count is >= `factor`x the mean rows-per-key — the
    same EXACT-INTEGER rule as the k6_skew_report verdict column
    (rows * n_keys >= factor * total; no float knife edge). Returns a
    bounded driver-side list (catalog-sized: hot keys are by definition
    few; `cap` is a safety valve, deterministic head by (-rows, key))."""
    s = df.groupBy(key).agg(F.count(F.lit(1)).alias("rows_"))
    tot = s.agg(
        F.sum("rows_").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    hot = (
        s.crossJoin(F.broadcast(tot))
        .where(F.col("rows_") * F.col("n_keys") >= F.lit(factor) * F.col("total"))
        .orderBy(F.desc("rows_"), key)
        .limit(cap)
    )
    return [r[0] for r in hot.select(key).collect()]


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot: list,
    salt_buckets: int,
    fact_salt_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join `fact` to `dim` on `key`, spreading each key in `hot` over
    `salt_buckets` reducers. `fact_salt_col` must be a high-cardinality
    fact column (row id / doc_id) — the salt is pmod(xxhash64(col), S),
    deterministic so reruns shuffle identically. Result rows are exactly
    the plain join's (property-tested); only the physical distribution
    changes. `how` supports inner / left joins (dim replicated either
    way)."""
    if salt_buckets < 2:
        raise ValueError(f"salt_buckets must be >= 2, got {salt_buckets}")
    if not hot:
        return fact.join(dim, key, how)
    hot_arr = F.array(*[F.lit(h) for h in hot])
    f = fact.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot_arr, F.col(key)),
            F.pmod(F.xxhash64(fact_salt_col), F.lit(salt_buckets)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    d = dim.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.array_contains(hot_arr, F.col(key)),
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
