"""Focused round-6 tests: the range-bucketed global rank and the exact
ntile-from-rank formula that replaced the one-partition ntile/row_number
windows (x4_rfm / x16_gini / ml_gains / fe_quantile_norm / k5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tsrollup.driver_queries import (
    _bucketed_rank,
    _bucketed_rank_n,
    _ntile_from_rank,
)


def _fixture(spark, n=997, seed=7):
    # keys with heavy bucket collisions + a unique tiebreaker
    return (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            F.pmod(F.xxhash64(F.col("id") + seed), F.lit(37)).alias("v"),
        )
    )


def test_bucketed_rank_equals_global_row_number(spark):
    df = _fixture(spark)
    got = _bucketed_rank(df, F.col("v"), ["v", "rid"]).select("rid", "__rank")
    w = Window.orderBy("v", "rid")
    want = df.select(
        "rid", (F.row_number().over(w) - 1).cast("long").alias("__rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucketed_rank_desc_order_with_coarse_buckets(spark):
    df = _fixture(spark)
    got = _bucketed_rank(
        df, -F.expr("v div 4"), ["v DESC", "rid"]
    ).select("rid", "__rank")
    w = Window.orderBy(F.desc("v"), "rid")
    want = df.select(
        "rid", (F.row_number().over(w) - 1).cast("long").alias("__rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("n,k", [(997, 5), (1000, 10), (3, 10), (10, 10), (11, 3)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    df = _fixture(spark, n=n)
    ranked, n_col = _bucketed_rank_n(df, F.col("v"), ["v", "rid"])
    got = ranked.select(
        "rid", _ntile_from_rank(F.col("__rank"), n_col, k).alias("t")
    )
    w = Window.orderBy("v", "rid")
    want = df.select("rid", F.ntile(k).over(w).cast("long").alias("t"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
