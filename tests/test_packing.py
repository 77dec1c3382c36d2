"""pack_sequences: chunk stream == NumPy reference concat+slice, token
bits preserved, parallelism-invariant, edge policies (pad/drop/empty)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.packing import pack_sequences


def _mk(spark, n_docs=120, seed=13, n_src=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 40))
        rows.append(
            (
                f"d{i:04d}",
                rng.integers(0, 50_000, n).astype(np.int32).tolist(),
                f"s{i % n_src}",
                (pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(rng.integers(0, 86_400)))).to_pydatetime(),
            )
        )
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string, event_ts timestamp"
    ).repartition(5)


def _ref_chunks(df, max_len):
    pdf = df.toPandas().sort_values(["source", "event_ts", "doc_id"])
    out = {}
    for src, g in pdf.groupby("source"):
        arrs = [np.asarray(t, dtype=np.int32) for t in g["tokens"] if len(t)]
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.int32)
        out[src] = [flat[i:i + max_len] for i in range(0, len(flat), max_len)]
    return out


class TestPackSequences:
    def test_chunks_bit_identical_to_reference(self, spark):
        df = _mk(spark)
        got = pack_sequences(df, 64).toPandas()
        ref = _ref_chunks(df, 64)
        for src, chunks in ref.items():
            g = got[got["source"] == src].sort_values("chunk_id")
            assert list(g["chunk_id"]) == list(range(len(chunks)))
            for row, want in zip(g.itertuples(), chunks):
                have = np.asarray(row.tokens)
                assert have.dtype == np.int32
                np.testing.assert_array_equal(have, want)
                assert row.n_tok == len(want)

    def test_n_docs_counts_overlapping_docs(self, spark):
        # 3 docs of 10 tokens, max_len 16: chunk0 spans docs 1+2, chunk1
        # spans docs 2+3
        rows = [
            ("a", list(range(10)), "s", pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()),
            ("b", list(range(10, 20)), "s", pd.Timestamp("2024-01-01 00:00:01").to_pydatetime()),
            ("c", list(range(20, 30)), "s", pd.Timestamp("2024-01-01 00:00:02").to_pydatetime()),
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, source string, event_ts timestamp"
        )
        out = {r["chunk_id"]: r for r in pack_sequences(df, 16).collect()}
        assert out[0]["n_docs"] == 2 and out[0]["n_tok"] == 16
        assert out[1]["n_docs"] == 2 and out[1]["n_tok"] == 14

    def test_parallelism_invariance(self, spark):
        df = _mk(spark, seed=29)
        a = pack_sequences(df.coalesce(1), 48).collect()
        b = pack_sequences(df.repartition(16), 48).collect()
        ka = {(r["source"], r["chunk_id"]): (r["n_tok"], list(r["tokens"])) for r in a}
        kb = {(r["source"], r["chunk_id"]): (r["n_tok"], list(r["tokens"])) for r in b}
        assert ka == kb and ka

    def test_pad_and_drop_policies(self, spark):
        df = _mk(spark, n_docs=20, n_src=1)
        total = df.select(F.sum(F.size("tokens"))).collect()[0][0]
        L = 64
        plain = pack_sequences(df, L).collect()
        assert sum(r["n_tok"] for r in plain) == total
        padded = pack_sequences(df, L, pad_id=0).collect()
        assert all(len(r["tokens"]) == L for r in padded)
        assert sum(r["n_tok"] for r in padded) == total  # n_tok excludes pad
        dropped = pack_sequences(df, L, drop_last=True).collect()
        assert len(dropped) == total // L
        assert all(r["n_tok"] == L for r in dropped)
        with pytest.raises(ValueError):
            pack_sequences(df, L, pad_id=0, drop_last=True)

    def test_empty_input_and_empty_group(self, spark):
        df = _mk(spark, n_docs=6)
        assert pack_sequences(df.where(F.lit(False)), 32).count() == 0
        # a group whose docs are all empty-token vanishes
        empt = spark.createDataFrame(
            [("x", [], "e", pd.Timestamp("2024-01-01").to_pydatetime())],
            "doc_id string, tokens array<int>, source string, event_ts timestamp",
        )
        assert pack_sequences(empt, 32).count() == 0


class TestChunkSequences:
    def _ref(self, toks, max_len, stride):
        n = len(toks)
        if n <= max_len:
            ks = [0]
        else:
            ks = list(range((n - max_len + stride - 1) // stride + 1))
        return [(k, k * stride, toks[k * stride: k * stride + max_len])
                for k in ks]

    def test_matches_reference_and_covers_everything(self, spark):
        import numpy as np

        from tsrollup.packing import chunk_sequences

        rng = np.random.default_rng(21)
        docs = []
        for i, n in enumerate([1, 31, 32, 33, 57, 96, 97, 200, 0]):
            docs.append((f"d{i}", [int(x) for x in rng.integers(0, 50_000, n)]))
        df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
        got = chunk_sequences(df, max_len=32, stride=24).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        toks = dict(docs)
        for d, rows in by_doc.items():
            rows.sort(key=lambda r: r["chunk_id"])
            ref = self._ref(toks[d], 32, 24)
            assert len(rows) == len(ref)
            for r, (k, start, chunk) in zip(rows, ref):
                assert (r["chunk_id"], r["start"]) == (k, start)
                assert r["chunk"] == chunk          # bit-identical tokens
                assert r["chunk_len"] == len(chunk)
            # coverage: every token index inside some chunk; last chunk
            # reaches the end
            if toks[d]:
                covered = set()
                for _, start, chunk in ref:
                    covered.update(range(start, start + len(chunk)))
                assert covered == set(range(len(toks[d])))
        # the 200-token doc overlaps: consecutive chunks share 8 tokens
        rows = by_doc["d7"]
        for a, b in zip(rows, rows[1:]):
            if b["chunk_len"] >= 8:
                assert a["chunk"][-8:] == b["chunk"][:8]

    def test_stride_validation(self, spark):
        from tsrollup.packing import chunk_sequences

        df = spark.createDataFrame([("d", [1, 2, 3])],
                                   "doc_id string, tokens array<int>")
        import pytest as _pt
        with _pt.raises(ValueError, match="stride"):
            chunk_sequences(df, max_len=32, stride=0)
        with _pt.raises(ValueError, match="stride"):
            chunk_sequences(df, max_len=32, stride=40)
