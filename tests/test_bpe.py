"""BPE merge training (tsrollup/bpe.py) vs a pure-python reference:
the canonical 'aaabdaaabac' example, left-to-right non-overlap
semantics, tie-breaks, early stop, and the distributed result equal to
the reference on a multi-doc corpus."""

import numpy as np
import pandas as pd

from tsrollup.bpe import bpe_train, merge_pair_np


def _ref_pair_counts(seqs):
    c = {}
    for s in seqs:
        for a, b in zip(s, s[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    return c


def _ref_merge(s, a, b, new_id):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_bpe(seqs, n_merges, base):
    merges = []
    cur = [list(s) for s in seqs]
    for rnd in range(n_merges):
        counts = _ref_pair_counts(cur)
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        nid = base + rnd
        merges.append((a, b, nid, cnt))
        cur = [_ref_merge(s, a, b, nid) for s in cur]
    return merges, cur


def test_merge_pair_np_left_to_right():
    # 'aaa' with merge (a,a): leftmost wins, no overlap -> [(aa), a]
    a = np.array([1, 1, 1], dtype=np.int64)
    assert merge_pair_np(a, 1, 1, 9).tolist() == [9, 1]
    # 'aaaa' -> [(aa), (aa)]
    a = np.array([1, 1, 1, 1], dtype=np.int64)
    assert merge_pair_np(a, 1, 1, 9).tolist() == [9, 9]
    # no match / short input unchanged
    assert merge_pair_np(np.array([1], dtype=np.int64), 1, 1, 9).tolist() == [1]
    assert merge_pair_np(np.array([1, 2], dtype=np.int64), 2, 1, 9).tolist() == [1, 2]


def test_bpe_train_canonical_example(spark):
    """Sennrich's 'aaabdaaabac' (as ids a=1 b=2 d=4 c=3): first merge
    (a,a) cnt 4, then (aa,ab-part)... verified wholesale against the
    reference implementation."""
    seqs = [[1, 1, 1, 2, 4, 1, 1, 1, 2, 1, 3]]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d0"], "tokens": seqs})
    )
    merges, merged = bpe_train(df, "tokens", n_merges=3, new_id_base=100)
    ref_merges, ref_corpus = _ref_bpe(seqs, 3, 100)
    assert merges == ref_merges
    assert merges[0][:2] == (1, 1) and merges[0][3] == 4
    got = [r["tokens"] for r in merged.collect()]
    assert [list(map(int, g)) for g in got] == ref_corpus


def test_bpe_train_multidoc_matches_reference(spark):
    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 6, size=rng.integers(5, 30)).tolist()
            for _ in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [str(i) for i in range(40)], "tokens": seqs})
    )
    merges, merged = bpe_train(df, "tokens", n_merges=6, new_id_base=500)
    ref_merges, ref_corpus = _ref_bpe(seqs, 6, 500)
    assert merges == ref_merges
    got = {r["doc_id"]: list(map(int, r["tokens"])) for r in merged.collect()}
    for i, ref in enumerate(ref_corpus):
        assert got[str(i)] == ref, f"doc {i}"


def test_bpe_train_early_stop(spark):
    """All-unique adjacent pairs (every count 1) learn NO merges."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d0"], "tokens": [[1, 2, 3, 4, 5]]})
    )
    merges, merged = bpe_train(df, "tokens", n_merges=4, new_id_base=100)
    assert merges == []
    assert [list(map(int, r["tokens"])) for r in merged.collect()] == [[1, 2, 3, 4, 5]]


def test_bpe_encode_matches_train_output_and_compresses(spark):
    """encode(training corpus, trained table) == bpe_train's own merged
    corpus, array-for-array — the invariant that makes a table reusable
    on new shards; and encoding strictly shortens docs that contain a
    learned pair."""
    from tsrollup.bpe import bpe_encode

    rng = np.random.default_rng(23)
    seqs = [rng.integers(0, 5, size=rng.integers(4, 25)).tolist()
            for _ in range(30)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [str(i) for i in range(30)], "tokens": seqs})
    )
    merges, merged = bpe_train(df, "tokens", n_merges=5, new_id_base=900)
    assert merges  # fixture is pair-dense by construction

    enc = bpe_encode(df, merges)
    got = {r["doc_id"]: list(map(int, r["tokens"])) for r in enc.collect()}
    exp = {r["doc_id"]: list(map(int, r["tokens"])) for r in merged.collect()}
    assert got == exp

    total_in = sum(len(s) for s in seqs)
    total_out = sum(len(v) for v in got.values())
    assert total_out < total_in


def test_bpe_decode_roundtrip_and_edges(spark):
    """decode(encode(x)) == x bit-for-bit, including docs too short to
    merge; decoded dtype narrows back to array<int>."""
    from tsrollup.bpe import bpe_decode, bpe_encode

    rng = np.random.default_rng(29)
    seqs = [rng.integers(0, 4, size=rng.integers(2, 20)).tolist()
            for _ in range(20)] + [[7], [3, 3]]
    ids = [str(i) for i in range(len(seqs))]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "tokens": seqs}))
    merges, _ = bpe_train(df, "tokens", n_merges=4, new_id_base=800)

    dec = bpe_decode(bpe_encode(df, merges), merges)
    assert dict(dec.dtypes)["tokens"] == "array<int>"
    got = {r["doc_id"]: list(map(int, r["tokens"])) for r in dec.collect()}
    assert got == dict(zip(ids, seqs))


def test_expand_pair_np_nested_merges():
    """Reverse-order expansion unwinds merges that reference merge ids."""
    from tsrollup.bpe import expand_pair_np

    # merge0: (1,2)->10 ; merge1: (10,3)->11  =>  [11] decodes to [1,2,3]
    arr = np.array([11, 4, 11], dtype=np.int64)
    step1 = expand_pair_np(arr, 10, 3, 11)
    assert step1.tolist() == [10, 3, 4, 10, 3]
    step0 = expand_pair_np(step1, 1, 2, 10)
    assert step0.tolist() == [1, 2, 3, 4, 1, 2, 3]


def test_bpe_train_rejects_vocab_overlapping_merge_ids(spark):
    """ADVICE regression: token ids at/above new_id_base would alias
    merge ids and mis-expand on decode — bpe_train fails loud."""
    import pytest
    from tsrollup.bpe import bpe_train

    seq = spark.createDataFrame(
        [("d0", [1_000_001, 5, 5, 5])], "doc_id string, tokens array<long>"
    )
    with pytest.raises(ValueError, match="new_id_base"):
        bpe_train(seq, n_merges=2)
