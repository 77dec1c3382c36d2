"""tokenstats: the bincount-partial scale path must equal the explode
built-in path exactly, and both must equal a pure-NumPy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.tokenstats import (
    source_token_profile,
    token_histogram,
    token_histogram_explode,
    top_tokens,
)


@pytest.fixture(scope="module")
def seq(spark):
    rng = np.random.default_rng(41)
    rows = []
    for i in range(400):
        n = int(rng.integers(0, 60))  # includes empty token arrays
        rows.append(
            (
                f"d{i}",
                rng.integers(0, 997, n).astype(np.int32).tolist(),
                f"src_{i % 5}",
            )
        )
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).repartition(7)  # several partitions -> several bincount partials


def _ref_counts(df):
    pdf = df.toPandas()
    flat = np.concatenate([np.asarray(t) for t in pdf["tokens"] if len(t)])
    c = np.bincount(flat)
    return {int(i): int(c[i]) for i in np.nonzero(c)[0]}


class TestTokenHistogram:
    def test_bincount_equals_explode_equals_numpy(self, spark, seq):
        got = {r["token_id"]: r["cnt"] for r in token_histogram(seq).collect()}
        exp = {r["token_id"]: r["cnt"]
               for r in token_histogram_explode(seq).collect()}
        assert got == exp == _ref_counts(seq)

    def test_by_source_partials_merge_exactly(self, spark, seq):
        got = {(r["source"], r["token_id"]): r["cnt"]
               for r in token_histogram(seq, by_source=True).collect()}
        exp = {(r["source"], r["token_id"]): r["cnt"]
               for r in token_histogram_explode(seq, by_source=True).collect()}
        assert got == exp
        # marginalizing over sources recovers the global histogram
        glob = {}
        for (_, tid), c in got.items():
            glob[tid] = glob.get(tid, 0) + c
        assert glob == _ref_counts(seq)

    def test_empty_input(self, spark, seq):
        assert token_histogram(seq.where(F.lit(False))).count() == 0

    def test_top_tokens_deterministic_tiebreak(self, spark, seq):
        top = top_tokens(seq, 10).collect()
        assert len(top) == 10
        ref = sorted(_ref_counts(seq).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [(r["token_id"], r["cnt"]) for r in top] == ref


class TestSourceTokenProfile:
    def test_matches_numpy_entropy(self, spark, seq):
        out = {r["source"]: r for r in source_token_profile(seq).collect()}
        pdf = seq.toPandas()
        for src, g in pdf.groupby("source"):
            toks = [np.asarray(t) for t in g["tokens"] if len(t)]
            flat = np.concatenate(toks)
            c = np.bincount(flat)
            c = c[c > 0].astype(np.float64)
            n = c.sum()
            want = np.log(n) - (c * np.log(c)).sum() / n
            row = out[src]
            assert row["n_distinct"] == len(c)
            assert row["tok_total"] == int(n)
            assert row["entropy"] == pytest.approx(want, rel=1e-10)
