"""K7 salted skew join (tsrollup/skewjoin.py).

The contract: salting changes only the PHYSICAL distribution — the result
rows are identical to the plain join — while the hot key's reducer group
shrinks ~S-fold, which is the whole point (no single-task straggler on a
planted 90%-skew fixture).
"""

import pytest
from pyspark.sql import functions as F

from tsrollup.skewjoin import hot_keys, salted_skew_join


@pytest.fixture(scope="module")
def skewed(spark):
    """200k fact rows, 90% on key 'k0', the rest uniform over 100 keys;
    dim has one row per key."""
    n, n_hot = 200_000, 180_000
    fact = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < n_hot, F.lit("k0"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100 + 1).cast("string")))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.createDataFrame(
        [(f"k{i}", i * 10) for i in range(101)], "k string, attr int"
    )
    fact.cache().count()
    yield fact, dim
    fact.unpersist()


def test_hot_keys_exact_rule(spark, skewed):
    fact, _ = skewed
    hot = hot_keys(fact, "k", factor=2)
    # k0 holds 90% of 200k rows over 101 keys: 180000*101 >= 2*200000 -> hot;
    # every other key holds 200 rows: 200*101 < 2*200000 -> cold
    assert hot == ["k0"]


def test_salted_join_rows_identical_to_plain(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_skew_join(fact, dim, "k", ["k0"], 32, "row_id")
    assert salted.columns == plain.columns
    # exact multiset equality via keyed checksums (row_id is unique)
    def sig(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("row_id", "k", "v", "attr").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
    ps, ss = sig(plain), sig(salted)
    assert (ps.n, ps.h) == (ss.n, ss.h)


def test_salted_join_left_outer(spark, skewed):
    fact, dim = skewed
    dim_missing = dim.where(F.col("k") != "k5")  # unmatched cold key
    plain = fact.join(dim_missing, "k", "left")
    salted = salted_skew_join(fact, dim_missing, "k", ["k0"], 16, "row_id", how="left")
    def sig(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("row_id", "k", "v", F.coalesce("attr", F.lit(-1))).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
    ps, ss = sig(plain), sig(salted)
    assert (ps.n, ps.h) == (ss.n, ss.h)


def test_no_single_reducer_straggler(spark, skewed):
    """The shuffle-key distribution is the straggler: plain join puts
    180k rows on ONE reducer key; salted spreads the hot key so the max
    (key, salt) group is ~S-fold smaller (within 2x of perfect balance,
    xxhash64 spread)."""
    fact, _ = skewed
    S = 32
    plain_max = (
        fact.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    salted_max = (
        fact.withColumn(
            "_salt",
            F.when(F.col("k") == "k0", F.pmod(F.xxhash64("row_id"), F.lit(S)))
            .otherwise(F.lit(0)),
        )
        .groupBy("k", "_salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert plain_max == 180_000
    assert salted_max <= 2 * plain_max // S, (
        f"hot key not spread: max group {salted_max} vs plain {plain_max}"
    )


def test_plan_joins_on_salt_and_replicates_dim(spark, skewed):
    fact, dim = skewed
    salted = salted_skew_join(fact, dim, "k", ["k0"], 8, "row_id")
    plan = salted._jdf.queryExecution().toString()
    assert "_salt" in plan, "join must include the salt key"
    # dim side replication is an explode (Generate) node
    assert "Generate explode" in plan or "explode" in plan


def test_contracts(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_skew_join(fact, dim, "k", ["k0"], 1, "row_id")
    # empty hot list degrades to the plain join
    out = salted_skew_join(fact.limit(100), dim, "k", [], 8, "row_id")
    assert out.count() == 100 and "_salt" not in out.columns
