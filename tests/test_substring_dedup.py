"""Substring-level exact dedup (datapipe.substring_duplication /
substring_span_removal) vs an independent pure-Python reference that
compares WINDOW CONTENT (token tuples) instead of fingerprints — so a
fingerprint collision or a hash-semantics drift would surface as a
parity failure here, never silently."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.datapipe import (
    substring_duplication,
    substring_fingerprints,
    substring_span_removal,
)

SEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _seq_df(spark, docs: dict[str, list[int]]):
    rows = [(d, toks, len(toks), "s0") for d, toks in docs.items()]
    return spark.createDataFrame(rows, SEQ_SCHEMA)


# ---------------------------------------------------------------- reference


def _ref_duplication(docs: dict[str, list[int]], k: int) -> pd.DataFrame:
    """Window-content reference: dup window = its k-tuple appears in >= 2
    distinct docs; coverage = union of [pos, pos+k) over dup windows."""
    owners: dict[tuple, set] = {}
    for d, toks in docs.items():
        for i in range(len(toks) - k + 1):
            owners.setdefault(tuple(toks[i : i + k]), set()).add(d)
    rows = []
    for d, toks in docs.items():
        n = len(toks)
        dup_pos = [
            i
            for i in range(n - k + 1)
            if len(owners[tuple(toks[i : i + k])]) >= 2
        ]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + k))
        rate = (10000 * len(covered)) // n if n else 0
        rows.append((d, n, max(n - k + 1, 0), len(dup_pos), len(covered), rate))
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id", "n_tok", "n_windows", "n_dup_windows",
            "dup_tokens", "dup_per10k",
        ],
    ).sort_values("doc_id").reset_index(drop=True)


def _ref_removal(docs: dict[str, list[int]], k: int) -> dict[str, list[int]]:
    """Keeper = corpus-min (doc_id, pos) per duplicated window content;
    every other occurrence's positions are removed."""
    occs: dict[tuple, list] = {}
    for d, toks in docs.items():
        for i in range(len(toks) - k + 1):
            occs.setdefault(tuple(toks[i : i + k]), []).append((d, i))
    removed: dict[str, set] = {d: set() for d in docs}
    for win, lst in occs.items():
        if len({d for d, _ in lst}) < 2:
            continue
        for d, i in sorted(lst)[1:]:
            removed[d].update(range(i, i + k))
    return {
        d: [t for i, t in enumerate(toks) if i not in removed[d]]
        for d, toks in docs.items()
    }


def _planted_corpus(seed: int = 7, n_docs: int = 40, span_len: int = 25):
    """Random docs + a planted span shared by 3 docs at DIFFERENT offsets
    + one exact-pair of docs + a doc with an internal repeat only."""
    rng = np.random.default_rng(seed)
    docs = {}
    for i in range(n_docs):
        docs[f"d{i:03d}"] = rng.integers(0, 50_000, rng.integers(30, 120)).tolist()
    span = rng.integers(0, 50_000, span_len).tolist()
    for d, off in (("d001", 3), ("d007", 11), ("d013", 0)):
        toks = docs[d]
        docs[d] = toks[:off] + span + toks[off:]
    docs["d020"] = list(docs["d021"])  # exact duplicate pair
    rep = rng.integers(0, 50_000, 10).tolist()
    docs["d030"] = rep + docs["d030"][:20] + rep  # within-doc repeat only
    docs["d031"] = rng.integers(0, 50_000, 5).tolist()  # shorter than k
    return docs


# ------------------------------------------------------------------- tests


class TestSubstringDuplication:
    K = 8

    def test_matches_content_reference_on_planted_corpus(self, spark):
        docs = _planted_corpus()
        got = (
            substring_duplication(_seq_df(spark, docs), self.K)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = _ref_duplication(docs, self.K)
        pd.testing.assert_frame_equal(
            got.astype({c: "int64" for c in ref.columns if c != "doc_id"}),
            ref.astype({c: "int64" for c in ref.columns if c != "doc_id"}),
        )
        by = got.set_index("doc_id")
        # the three span carriers cover >= span_len tokens each
        for d in ("d001", "d007", "d013"):
            assert by.loc[d, "dup_tokens"] >= 25
        # the exact pair is fully covered
        assert by.loc["d020", "dup_per10k"] == 10000
        assert by.loc["d021", "dup_per10k"] == 10000
        # within-doc repetition alone is NOT cross-doc duplication
        assert by.loc["d030", "n_dup_windows"] == 0
        # short doc present with zeros
        assert by.loc["d031", "n_windows"] == 0
        assert by.loc["d031", "dup_tokens"] == 0

    def test_select_mod_is_alignment_independent(self, spark):
        """Content-defined window selection must detect the same span at
        different offsets (a position stride would not)."""
        rng = np.random.default_rng(3)
        span = rng.integers(0, 50_000, 60).tolist()
        docs = {
            "a": rng.integers(0, 50_000, 40).tolist() + span,
            "b": span + rng.integers(0, 50_000, 33).tolist(),
            "c": rng.integers(0, 50_000, 90).tolist(),
        }
        out = (
            substring_duplication(_seq_df(spark, docs), self.K, select_mod=4)
            .toPandas()
            .set_index("doc_id")
        )
        # both carriers flag duplication despite different span offsets
        assert out.loc["a", "n_dup_windows"] > 0
        assert out.loc["b", "n_dup_windows"] > 0
        assert out.loc["a", "n_dup_windows"] == out.loc["b", "n_dup_windows"]
        assert out.loc["c", "n_dup_windows"] == 0
        # sampled postings are a subset: coverage never exceeds exact
        exact = (
            substring_duplication(_seq_df(spark, docs), self.K)
            .toPandas()
            .set_index("doc_id")
        )
        assert (out["dup_tokens"] <= exact["dup_tokens"]).all()

    def test_fingerprints_shape(self, spark):
        docs = {"x": list(range(20)), "y": list(range(5))}
        fp = substring_fingerprints(_seq_df(spark, docs), 8).toPandas()
        assert sorted(fp.columns) == ["doc_id", "fp", "pos"]
        assert (fp["doc_id"] == "x").all()  # y is shorter than k
        assert sorted(fp["pos"]) == list(range(1, 14))

    def test_empty_input(self, spark):
        out = substring_duplication(
            _seq_df(spark, {"x": list(range(20))}).where(F.lit(False)), self.K
        )
        assert out.count() == 0


class TestSubstringSpanRemoval:
    K = 8

    def test_matches_content_reference(self, spark):
        docs = _planted_corpus(seed=11)
        got = substring_span_removal(_seq_df(spark, docs), self.K).toPandas()
        ref = _ref_removal(docs, self.K)
        assert len(got) == len(docs)
        for _, r in got.iterrows():
            want = ref[r["doc_id"]]
            assert r["n_tok"] == len(docs[r["doc_id"]])
            assert r["n_kept"] == len(want), r["doc_id"]
            assert list(r["tokens_kept"]) == want, r["doc_id"]

    def test_keeper_survives_exact_pair(self, spark):
        toks = list(range(100, 130))
        docs = {"a": toks, "b": list(toks), "c": [1, 2, 3, 4, 5, 6, 7, 8, 9]}
        got = (
            substring_span_removal(_seq_df(spark, docs), self.K)
            .toPandas()
            .set_index("doc_id")
        )
        # 'a' (min doc_id) keeps everything, 'b' is emptied
        assert list(got.loc["a", "tokens_kept"]) == toks
        assert got.loc["b", "n_kept"] == 0
        # untouched doc passes through bit-identical, int dtype preserved
        assert list(got.loc["c", "tokens_kept"]) == docs["c"]

    def test_int32_payload_preserved(self, spark):
        docs = {"a": list(range(40)), "b": list(range(40))}
        out = substring_span_removal(_seq_df(spark, docs), self.K)
        assert dict(out.dtypes)["tokens_kept"] == "array<int>"
