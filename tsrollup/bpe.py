"""Distributed BPE merge training over the token payload (SURVEY.md
§2.1 row TK4) — tokenizer training as a data-pipeline operator.

Byte-pair encoding's training loop is "count adjacent symbol pairs,
merge the most frequent, repeat" (Sennrich ACL'16; the byte-level form
is GPT-2's tokenizer). Over a pre-tokenized corpus the same loop learns
merges over base ids. The Spark shape per round:

1. PAIR COUNT — mapInPandas partials: each Arrow batch zips every
   sequence against its own shift and emits (a, b, partial_count) rows
   via one np.unique over the batch's packed pairs. Partials are
   bounded by the batch's DISTINCT adjacent pairs, never by corpus
   length; one hash agg sums them (map-side combine applies).
2. ARGMAX — the winning pair by (count DESC, a ASC, b ASC): a 1-row
   collect, O(1) driver traffic per round.
3. APPLY — a mapInPandas kernel rewrites every sequence, replacing
   non-overlapping occurrences LEFT-TO-RIGHT (the canonical greedy
   semantics: "aaa" + merge(a,a) -> "(aa)a"). The rewritten corpus is
   localCheckpointed per round so round k+1's scan reads the k-merged
   corpus, not the whole re-derivation chain.

k merge rounds = k (count + apply) job pairs — the loop is inherently
sequential (each merge changes the pair distribution the next round
counts), exactly like Lloyd iterations in emb_kmeans. Everything is
exact integer counting, so the merge table is deterministic; pytest
pins it against a pure-python reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pack a pair (a, b) of non-negative ids < 2^31 into one int64
_PACK = np.int64(1) << np.int64(32)


def _pair_counts(seq: DataFrame, tokens_col: str) -> DataFrame:
    """Distributed adjacent-pair histogram: (a, b, cnt)."""

    def part(batches):
        for pdf in batches:
            acc: dict = {}
            packed_all = []
            for arr in pdf[tokens_col]:
                a = np.asarray(arr, dtype=np.int64)
                if a.shape[0] < 2:
                    continue
                packed_all.append(a[:-1] * _PACK + a[1:])
            if not packed_all:
                continue
            keys, cnts = np.unique(np.concatenate(packed_all), return_counts=True)
            yield pd.DataFrame(
                {
                    "a": (keys // _PACK).astype(np.int64),
                    "b": (keys % _PACK).astype(np.int64),
                    "c": cnts.astype(np.int64),
                }
            )

    parts = seq.mapInPandas(part, schema="a long, b long, c long")
    return parts.groupBy("a", "b").agg(F.sum("c").alias("cnt"))


def merge_pair_np(arr: np.ndarray, a: int, b: int, new_id: int) -> np.ndarray:
    """Replace non-overlapping (a, b) occurrences left-to-right with
    new_id — vectorized: candidate positions, then a linear pass only
    over the (sparse) candidate list to drop overlaps."""
    if arr.shape[0] < 2:
        return arr
    hits = np.flatnonzero((arr[:-1] == a) & (arr[1:] == b))
    if hits.size == 0:
        return arr
    keep = []
    last = -2
    for h in hits:  # loop over MATCHES only, not tokens
        if h > last + 1:
            keep.append(h)
            last = h
    keep = np.asarray(keep, dtype=np.int64)
    out = arr.copy()
    out[keep] = new_id
    mask = np.ones(arr.shape[0], dtype=bool)
    mask[keep + 1] = False
    return out[mask]


def bpe_train(
    seq: DataFrame,
    tokens_col: str = "tokens",
    n_merges: int = 8,
    new_id_base: int = 1_000_000,
) -> tuple[list[tuple[int, int, int, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns
    (merges, merged_corpus): merges is a list of (a, b, new_id, count)
    in training order; merged_corpus is ``seq`` with every learned
    merge applied. Ties on count break by (a ASC, b ASC) so the merge
    table is a pure function of the corpus."""
    # merge ids must not alias base-vocabulary ids: a corpus whose token
    # ids reach into [new_id_base, new_id_base + n_merges) would silently
    # conflate merges with real tokens and bpe_decode would mis-expand.
    # One cheap agg up front, fail loud.
    max_id = seq.agg(
        F.max(F.array_max(F.col(tokens_col))).alias("m")
    ).collect()[0]["m"]
    if max_id is not None and int(max_id) >= new_id_base:
        raise ValueError(
            f"bpe_train: corpus max token id {max_id} >= new_id_base "
            f"{new_id_base}; raise new_id_base above the base vocabulary"
        )
    merges: list[tuple[int, int, int, int]] = []
    cur = seq
    for rnd in range(n_merges):
        top = (
            _pair_counts(cur, tokens_col)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["cnt"])
        new_id = new_id_base + rnd
        merges.append((a, b, new_id, cnt))

        def apply(batches, a=a, b=b, new_id=new_id):
            for pdf in batches:
                pdf = pdf.copy()
                pdf[tokens_col] = [
                    merge_pair_np(
                        np.asarray(arr, dtype=np.int64), a, b, new_id
                    ).astype(np.int64)
                    for arr in pdf[tokens_col]
                ]
                yield pdf

        # tokens widen to long: new ids exceed the int32 base space
        widened = cur.withColumn(
            tokens_col, F.col(tokens_col).cast("array<long>")
        )
        cur = widened.mapInPandas(apply, schema=widened.schema).localCheckpoint(
            eager=True
        )
    return merges, cur


def bpe_encode(
    seq: DataFrame,
    merges: list[tuple[int, int, int, int]],
    tokens_col: str = "tokens",
) -> DataFrame:
    """Apply a TRAINED merge table to a corpus — the tokenize pass that
    pairs with ``bpe_train``: merges apply in training (priority) order,
    each left-to-right non-overlapping, the canonical greedy encode. On
    the training corpus itself this reproduces ``bpe_train``'s merged
    output bit-for-bit (pytest-pinned), which is what makes a separately
    trained table safely reusable on new shards.

    Scale shape: the merge table ships in the task closure (k entries —
    tokenizer-sized, broadcast by construction) and the whole encode is
    ONE mapInPandas corpus scan applying all k merges per sequence
    in-kernel — vs training's inherent k sequential count+apply rounds.
    Token ids widen to long (merge ids live above the int32 base)."""
    widened = seq.withColumn(tokens_col, F.col(tokens_col).cast("array<long>"))

    def apply(batches):
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for arr in pdf[tokens_col]:
                a_np = np.asarray(arr, dtype=np.int64)
                for a, b, new_id, _cnt in merges:
                    a_np = merge_pair_np(a_np, a, b, new_id)
                out.append(a_np)
            pdf[tokens_col] = out
            yield pdf

    return widened.mapInPandas(apply, schema=widened.schema)


def expand_pair_np(arr: np.ndarray, a: int, b: int, new_id: int) -> np.ndarray:
    """Inverse of one merge: every new_id becomes (a, b) — vectorized
    via a cumsum position map, no Python loop over tokens."""
    hits = arr == new_id
    if not hits.any():
        return arr
    reps = np.where(hits, 2, 1)
    starts = np.cumsum(reps) - reps
    out = np.empty(int(reps.sum()), dtype=np.int64)
    out[starts] = np.where(hits, a, arr)
    out[starts[hits] + 1] = b
    return out


def bpe_decode(
    seq: DataFrame,
    merges: list[tuple[int, int, int, int]],
    tokens_col: str = "tokens",
) -> DataFrame:
    """Expand merge ids back to base tokens — merges undo in REVERSE
    training order (later merges may reference earlier merge ids), so
    decode(encode(x)) == x for every sequence: BPE is lossless and the
    round trip is oracle-twinnable as a per-row hash of the decoded
    payload vs the original. Output tokens narrow back to array<int>
    (all surviving ids are base-vocabulary int32 ids by construction —
    the pipeline's standing token dtype invariant)."""

    def apply(batches):
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for arr in pdf[tokens_col]:
                a_np = np.asarray(arr, dtype=np.int64)
                for a, b, new_id, _cnt in reversed(merges):
                    a_np = expand_pair_np(a_np, a, b, new_id)
                out.append(a_np.astype(np.int32))
            pdf[tokens_col] = out
            yield pdf

    schema = ", ".join(
        f"{f.name} array<int>" if f.name == tokens_col
        else f"{f.name} {f.dataType.simpleString()}"
        for f in seq.schema.fields
    )
    return seq.mapInPandas(apply, schema=schema)
