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


class TestHeavyHitters:
    """sketches.heavy_hitters: exactness above threshold + MG guarantees
    in the genuinely-approximate regime (budget << distinct items)."""

    def _zipf_df(self, spark, n=30_000, vocab=2_000, seed=7, parts=8):
        import pandas as pd
        rng = np.random.default_rng(seed)
        items = rng.zipf(1.3, n) % vocab
        return spark.createDataFrame(
            pd.DataFrame({"item": items.astype(np.int64)})
        ).repartition(parts)

    def test_exact_above_threshold_small_budget(self, spark):
        from tsrollup.sketches import heavy_hitters

        df = self._zipf_df(spark)
        k = 16  # far below the ~2000 distinct items
        got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", k).collect()}
        pdf = df.toPandas()
        n = len(pdf)
        true = pdf["item"].value_counts()
        want = {int(i): int(c) for i, c in true.items() if c * (k + 1) > n}
        assert got == want and want  # the frequent set is EXACT, not approx

    def test_array_mode_matches_scalar_mode(self, spark):
        from tsrollup.sketches import heavy_hitters
        import pandas as pd

        rng = np.random.default_rng(9)
        rows = [
            (rng.zipf(1.4, int(rng.integers(1, 50))) % 300)
            .astype(np.int32).tolist()
            for _ in range(800)
        ]
        adf = spark.createDataFrame(
            pd.DataFrame({"tokens": rows}), "tokens array<int>"
        ).repartition(6)
        sdf = adf.select(F.explode("tokens").alias("item"))
        k = 12
        a = {r["item"]: r["cnt"]
             for r in heavy_hitters(adf, "tokens", k, flatten_arrays=True).collect()}
        b = {r["item"]: r["cnt"] for r in heavy_hitters(sdf, "item", k).collect()}
        assert a == b and a

    def test_mg_partial_lower_bounds(self, spark):
        """Every MG summary count is a LOWER bound on the item's true
        count in that partition's data, and the summary never exceeds
        the budget."""
        from tsrollup.sketches import mg_summary_partials

        df = self._zipf_df(spark, parts=1)  # one partition -> one summary
        k = 16
        rows = mg_summary_partials(df, "item", k).collect()
        markers = [r for r in rows if r["item"] is None]
        summ = [r for r in rows if r["item"] is not None]
        assert 0 < len(summ) <= k
        # the marker row carries the partition's exact item total
        assert len(markers) == 1 and markers[0]["part_rows"] == df.count()
        true = df.toPandas()["item"].value_counts()
        for r in summ:
            assert r["cnt_lb"] <= int(true.get(r["item"], 0))


class TestExactCountsContract:
    def test_negative_token_id_is_a_clear_error(self):
        """A -1 padding sentinel must raise a contract error, not an
        opaque executor-side np.bincount ValueError."""
        import numpy as np
        import pytest
        from tsrollup.tokenstats import _exact_counts

        with pytest.raises(ValueError, match="negative token id"):
            _exact_counts(np.array([3, -1, 7], dtype=np.int64))


class TestTokenDrift:
    def test_matches_numpy_reference(self, spark):
        """token_drift vs an independent pure-numpy KL computation over a
        synthetic (source, day) corpus with one deliberately-drifted
        source-day (narrow token range) that must rank highest."""
        import numpy as np
        import pandas as pd

        from tsrollup.tokenstats import token_drift

        rng = np.random.default_rng(23)
        rows = []
        days = [pd.Timestamp("2024-03-01"), pd.Timestamp("2024-03-02")]
        for day in days:
            for src in ("a", "b", "c"):
                for i in range(20):
                    if src == "c" and day == days[1]:
                        toks = rng.integers(0, 10, 40)  # drifted: narrow vocab
                    else:
                        toks = rng.integers(0, 500, 40)
                    ts = day + pd.Timedelta(minutes=int(rng.integers(0, 1440)))
                    rows.append(
                        (f"{src}{day.day}{i}", toks.astype(np.int32).tolist(),
                         len(toks), src, ts.to_pydatetime())
                    )
        seq = spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "event_ts timestamp",
        )
        got = token_drift(seq).toPandas()

        # reference
        pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok",
                                          "source", "event_ts"])
        pdf["bucket"] = pdf["event_ts"].dt.floor("D")
        ref = {}
        for (src, day), g in pdf.groupby(["source", "bucket"]):
            flat = np.concatenate(g["tokens"].to_list())
            ids, c = np.unique(flat, return_counts=True)
            all_day = np.concatenate(
                pdf[pdf["bucket"] == day]["tokens"].to_list()
            )
            dids, dc = np.unique(all_day, return_counts=True)
            dmap = dict(zip(dids, dc))
            N, M = len(flat), len(all_day)
            terms = [
                int(np.floor(abs(v) + 0.5) * np.sign(v))
                for v in (
                    c * np.log((c * M).astype(float) / (N * np.array([dmap[t] for t in ids])).astype(float)) * 1e6
                )
            ]
            ref[(src, day)] = (N, len(ids), sum(terms))
        assert len(got) == len(ref)
        for _, r in got.iterrows():
            n, nd, kl_u = ref[(r["source"], pd.Timestamp(r["bucket"]))]
            assert r["n_tok"] == n and r["n_distinct"] == nd
            assert r["kl_unats"] == kl_u, (r["source"], r["bucket"])
            assert r["kl_nats"] == kl_u / (n * 1e6)
        # the drifted source-day dominates
        top = got.sort_values("kl_nats", ascending=False).iloc[0]
        assert top["source"] == "c" and pd.Timestamp(top["bucket"]).day == 2
        # KL >= 0 within rounding (micro-nat units)
        assert (got["kl_unats"] >= -len(got) * 1).all()

    def test_keyed_histogram_equals_explode(self, spark):
        import numpy as np

        from tsrollup.tokenstats import token_histogram_keyed

        rng = np.random.default_rng(4)
        rows = [
            (f"d{i}", rng.integers(0, 50, rng.integers(1, 30)).astype(np.int32).tolist(),
             0, ["x", "y"][i % 2], ["g1", "g2", "g3"][i % 3])
            for i in range(200)
        ]
        seq = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string, grp string"
        )
        got = token_histogram_keyed(
            seq, ["source", "grp"], "source string, grp string"
        ).toPandas()
        want = (
            seq.select("source", "grp", F.explode("tokens").alias("token_id"))
            .groupBy("source", "grp", "token_id")
            .count()
            .toPandas()
        )
        g = got.sort_values(["source", "grp", "token_id"]).reset_index(drop=True)
        w = want.sort_values(["source", "grp", "token_id"]).reset_index(drop=True)
        assert (g["cnt"].to_numpy() == w["count"].to_numpy()).all()
        assert len(g) == len(w)
