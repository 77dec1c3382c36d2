"""mixing: hash split / stratified sample / shuffle rank — determinism,
growth-stability, and scalable-rank == naive-global-rank equality."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from tsrollup.mixing import hash_split, shuffle_rank, stratified_sample


def _docs(spark, n=4000, n_src=4):
    pdf = pd.DataFrame(
        {
            "doc_id": [f"doc{i:06d}" for i in range(n)],
            "source": [f"s{i % n_src}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf).repartition(8)


class TestHashSplit:
    def test_proportions_and_determinism(self, spark):
        df = _docs(spark)
        out = hash_split(df, "doc_id", 500, 500, seed=0)
        counts = {r["split"]: r["cnt"] for r in
                  out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
        n = sum(counts.values())
        assert n == 4000
        # 5% each with binomial noise
        assert abs(counts["val"] / n - 0.05) < 0.02
        assert abs(counts["test"] / n - 0.05) < 0.02
        again = {r["doc_id"]: r["split"] for r in out.collect()}
        assert {r["doc_id"]: r["split"]
                for r in hash_split(df, "doc_id", 500, 500, 0).collect()} == again

    def test_stable_under_corpus_growth(self, spark):
        small = _docs(spark, 1000)
        big = _docs(spark, 4000)
        a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
        for k, v in a.items():
            assert b[k] == v  # a doc's split never changes as corpus grows


class TestStratifiedSample:
    def test_rates_and_membership_recomputable(self, spark):
        df = _docs(spark)
        out = stratified_sample(
            df, {"s0": 5000, "s1": 2500}, "source", "doc_id",
            default_per10k=1000, seed=1,
        )
        kept = out.groupBy("source").agg(F.count("*").alias("c")).collect()
        by_src = {r["source"]: r["c"] for r in kept}
        assert abs(by_src["s0"] / 1000 - 0.5) < 0.08
        assert abs(by_src["s1"] / 1000 - 0.25) < 0.07
        assert abs(by_src.get("s2", 0) / 1000 - 0.10) < 0.05
        # membership is a pure function: rerun == same set
        ids1 = {r["doc_id"] for r in out.collect()}
        ids2 = {r["doc_id"] for r in stratified_sample(
            df, {"s0": 5000, "s1": 2500}, "source", "doc_id", 1000, 1
        ).collect()}
        assert ids1 == ids2

    def test_zero_default_drops_unlisted(self, spark):
        df = _docs(spark)
        out = stratified_sample(df, {"s0": 10_000}, default_per10k=0)
        srcs = {r["source"] for r in out.select("source").distinct().collect()}
        assert srcs == {"s0"}
        assert out.count() == 1000  # rate 10000/10k = keep all of s0


class TestShuffleRank:
    def test_is_a_permutation_and_matches_naive(self, spark):
        df = _docs(spark, 2500)
        out = shuffle_rank(df, "doc_id", epoch=3)
        ranks = [r["shuffle_rank"] for r in out.collect()]
        assert sorted(ranks) == list(range(2500))
        # scalable bucketed evaluation == naive single-partition window
        key = F.concat(F.col("doc_id"), F.lit("#3"))
        naive = df.withColumn(
            "nr",
            F.row_number().over(
                Window.orderBy(F.xxhash64(key), F.col("doc_id"))
            ).cast("long") - 1,
        )
        merged = out.join(naive, "doc_id")
        assert merged.where(F.col("shuffle_rank") != F.col("nr")).count() == 0

    def test_epochs_decorrelated(self, spark):
        df = _docs(spark, 2000)
        a = {r["doc_id"]: r["shuffle_rank"]
             for r in shuffle_rank(df, "doc_id", 0).collect()}
        b = {r["doc_id"]: r["shuffle_rank"]
             for r in shuffle_rank(df, "doc_id", 1).collect()}
        ra = np.array([a[k] for k in sorted(a)])
        rb = np.array([b[k] for k in sorted(b)])
        r = np.corrcoef(ra, rb)[0, 1]
        assert abs(r) < 0.06  # independent permutations

    def test_empty(self, spark):
        df = _docs(spark, 10).where(F.lit(False))
        assert shuffle_rank(df).count() == 0


def test_weighted_sample_topk_bias_and_determinism(spark):
    """Efraimidis-Spirakis sampling: with one 500x-weight doc among five
    per stratum and k=1, the heavy doc must win ~w/(w+4) = 99.2% of 100
    strata (assert >= 90%). Exactly k rows per stratum, rnk is 1..k, and
    a second evaluation is bit-identical (stateless hash keys)."""
    from tsrollup.mixing import weighted_sample_topk

    rows = []
    for s in range(100):
        for i in range(5):
            rows.append((s * 10 + i, f"src{s}", 500 if i == 4 else 1))
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")

    out = weighted_sample_topk(df, "w", k=1, strat_col="source", id_col="doc_id")
    got = {(r["source"], r["doc_id"], r["es_key"], r["rnk"]) for r in out.collect()}
    assert len(got) == 100 and all(r == 1 for *_, r in got)
    heavy_wins = sum(1 for _, d, *_ in got if d % 10 == 4)
    assert heavy_wins >= 90

    again = {(r["source"], r["doc_id"], r["es_key"], r["rnk"])
             for r in weighted_sample_topk(
                 df, "w", k=1, strat_col="source", id_col="doc_id").collect()}
    assert again == got

    k3 = weighted_sample_topk(df, "w", k=3, strat_col="source", id_col="doc_id")
    per = k3.groupBy("source").count().collect()
    assert all(r["count"] == 3 for r in per)


def test_reservoir_topk_uniform_deterministic(spark):
    """Per-group uniform k-sample: ranks 1..k per group, byte-stable
    across runs, decorrelated across seeds, and roughly uniform over the
    group members across many seeds (the hash-uniformity sanity)."""
    from tsrollup.mixing import reservoir_topk

    rows = [(s * 100 + i, f"src{s}") for s in range(10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = reservoir_topk(df, "source", "doc_id", k=5, seed=0)
    got = {(r["source"], r["doc_id"], r["rnk"]) for r in out.collect()}
    per = {}
    for src, _d, rnk in got:
        per.setdefault(src, []).append(rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    assert len(per) == 10

    again = {(r["source"], r["doc_id"], r["rnk"])
             for r in reservoir_topk(df, "source", "doc_id", k=5, seed=0).collect()}
    assert again == got

    other = {(r["source"], r["doc_id"], r["rnk"])
             for r in reservoir_topk(df, "source", "doc_id", k=5, seed=1).collect()}
    assert other != got  # decorrelated draw

    # uniformity over 30 seeds: each member of one group sampled with
    # frequency ~ k/n = 1/8; no member should be wildly over/under drawn
    counts = {}
    for seed in range(30):
        for r in reservoir_topk(
            df.where("source = 'src0'"), "source", "doc_id", 5, seed
        ).collect():
            counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    # expectation 30 * 5/40 = 3.75 draws/member
    assert max(counts.values()) <= 12 and len(counts) >= 25


def test_quota_sample_exact_total_and_allocation(spark):
    from tsrollup.mixing import quota_sample

    # deliberately skewed strata: 70 / 25 / 5 rows
    rows = (
        [(i, "big") for i in range(70)]
        + [(100 + i, "mid") for i in range(25)]
        + [(200 + i, "tiny") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = quota_sample(df, 17, "source", "doc_id", seed=2).collect()
    assert len(out) == 17  # EXACT budget, no rate can promise this

    # pure-python largest-remainder reference
    counts = {"big": 70, "mid": 25, "tiny": 5}
    T = sum(counts.values())
    base = {s: 17 * c // T for s, c in counts.items()}
    rem = {s: 17 * c % T for s, c in counts.items()}
    left = 17 - sum(base.values())
    for s in sorted(counts, key=lambda s: (-rem[s], s))[:left]:
        base[s] += 1
    got_alloc = {}
    for r in out:
        got_alloc[r["source"]] = r["alloc"]
    assert got_alloc == {s: a for s, a in base.items() if a > 0}

    # per-stratum pick count == allocation; ranks are 1..alloc
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["rnk"])
    assert {s: sorted(v) for s, v in per.items()} == {
        s: list(range(1, base[s] + 1)) for s in base if base[s] > 0
    }

    # determinism + seed decorrelation
    again = {(r["doc_id"]) for r in
             quota_sample(df, 17, "source", "doc_id", seed=2).collect()}
    assert again == {r["doc_id"] for r in out}
    other = {r["doc_id"] for r in
             quota_sample(df, 17, "source", "doc_id", seed=3).collect()}
    assert other != again

    # degenerate budgets
    assert quota_sample(df, 0, "source", "doc_id").count() == 0
    assert quota_sample(df, 100, "source", "doc_id").count() == 100
