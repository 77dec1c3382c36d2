"""Sequence packing: concatenate variable-length tokenized sequences into
fixed-length training chunks — the standard pre-training batching
transform (pack-then-split, as in public LLM training recipes).

Spark shape: one `applyInPandas` per pack key (default `source`) — the
packing order inside a key must be a total order over that key's
sequences, so the whole key's stream is rebuilt in one kernel call, the
same whole-series-per-group contract every detector kernel obeys
(kernels.py module doc). The concatenation is ONE NumPy op per group and
chunking is a view slice — no per-token Python. Keys are independent, so
the job parallelizes across sources and the group-size ceiling is a pack
key's total token count, not the corpus (a hot source can be pre-split by
a coarse time range upstream, same as detector sharding).

Determinism contract: with a fixed `order` (default event_ts, doc_id —
a total order because doc_id is unique), the emitted chunk stream is a
pure function of the input set, independent of partitioning/parallelism.
Token arrays flow through bit-identical: int32 in, asserted int32 out
(the BASELINE per-row invariant), and chunk c is literally
`concat(all tokens)[c*L : (c+1)*L]`.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "{key} , chunk_id long, tokens array<int>, n_tok int, n_docs int"
)


def pack_sequences(
    seq: DataFrame,
    max_len: int = 512,
    keys: Iterable[str] = ("source",),
    order: Iterable[str] = ("event_ts", "doc_id"),
    pad_id: int | None = None,
    drop_last: bool = False,
) -> DataFrame:
    """Pack each key's sequences (sorted by `order`) into chunks of
    `max_len` tokens. Returns keys + ``chunk_id`` (0-based within the
    key) + ``tokens`` (array<int>) + ``n_tok`` (REAL tokens in the chunk,
    excluding padding) + ``n_docs`` (input docs overlapping the chunk).

    The final partial chunk is kept as-is by default; `pad_id` right-pads
    it to max_len (n_tok still counts real tokens only); `drop_last`
    drops it instead (mutually exclusive with pad_id).
    """
    if pad_id is not None and drop_last:
        raise ValueError("pad_id and drop_last are mutually exclusive")
    keys = list(keys)
    order = list(order)

    def _empty(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series(dtype=o) for c, o in (
                [(k, pdf[k].dtype) for k in keys]
                + [("chunk_id", "int64"), ("tokens", "object"),
                   ("n_tok", "int32"), ("n_docs", "int32")]
            )}
        )

    def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        arrs = [np.asarray(a) for a in pdf["tokens"]]
        arrs = [a for a in arrs if a.size]
        if not arrs:
            return _empty(pdf)
        for a in arrs:
            if a.dtype != np.int32:  # data contract — must survive python -O
                raise TypeError(f"tokens upcast to {a.dtype}, expected int32")
        flat = np.concatenate(arrs)
        total = flat.shape[0]
        n_chunks = total // max_len if drop_last else -(-total // max_len)
        if n_chunks == 0:
            return _empty(pdf)
        # doc start offsets -> docs overlapping chunk [c*L, (c+1)*L):
        # overlap iff doc.start < chunk.end and doc.end > chunk.start
        lens = np.array([a.shape[0] for a in arrs], dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ends = starts + lens
        chunks = []
        n_tok = np.empty(n_chunks, dtype=np.int32)
        n_docs = np.empty(n_chunks, dtype=np.int32)
        for c in range(n_chunks):
            lo, hi = c * max_len, min((c + 1) * max_len, total)
            piece = flat[lo:hi]
            n_tok[c] = piece.shape[0]
            n_docs[c] = int(np.count_nonzero((starts < hi) & (ends > lo)))
            if pad_id is not None and piece.shape[0] < max_len:
                piece = np.concatenate(
                    [piece, np.full(max_len - piece.shape[0], pad_id, np.int32)]
                )
            chunks.append(piece.astype(np.int32, copy=False))
        out = {k: [pdf[k].iloc[0]] * n_chunks for k in keys}
        out.update(
            chunk_id=np.arange(n_chunks, dtype=np.int64),
            tokens=chunks, n_tok=n_tok, n_docs=n_docs,
        )
        return pd.DataFrame(out)

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in seq.select(*keys).schema.fields
    )
    out_schema = _OUT_SCHEMA.format(key=key_schema)
    return (
        seq.select(*keys, *order, "tokens")
        .groupBy(*keys)
        .applyInPandas(_pack_group, out_schema)
    )


def chunk_sequences(
    df: DataFrame,
    max_len: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-document context-window chunking with overlap — the OTHER
    standard batching transform (pack_sequences crosses document
    boundaries; this one never does, the shape used when examples must
    stay document-local, e.g. long-context eval or span-sensitive
    curation). Each document's tokens split into windows of `max_len`
    starting every `stride` tokens (stride < max_len → overlapping
    halo); the final window is the remainder (shorter), and a document
    shorter than max_len yields exactly one chunk.

    Chunk k covers tokens[k·stride : k·stride + max_len], with
    K = 1 if n ≤ max_len else ceil((n − max_len)/stride) + 1 —
    every token is covered and the last window always reaches the end.

    Scale shape: embarrassingly parallel — one projection with a
    bounded `sequence` explode and a JVM-side `slice`; NO shuffle, NO
    Python, and the token arrays never leave the executor row they
    arrived in. Returns id + chunk_id + start + chunk (array<int>) +
    chunk_len.
    """
    if stride is None:
        stride = max_len
    if not 0 < stride <= max_len:
        raise ValueError(f"stride={stride} must be in (0, max_len={max_len}]")
    n = f"size({tokens_col})"
    k = (
        f"CASE WHEN {n} <= {max_len} THEN 0 "
        f"ELSE ({n} - {max_len} + {stride} - 1) div {stride} END"
    )
    from pyspark.sql import functions as F

    return (
        df.select(
            id_col,
            tokens_col,
            F.explode(F.expr(f"sequence(0, {k})")).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            (F.col("chunk_id") * stride).alias("start"),
            F.expr(
                f"slice({tokens_col}, chunk_id * {stride} + 1, {max_len})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.size("chunk"))
    )
