"""Token-payload analytics over the sequence table — the corpus-level
statistics a pre-tokenized training store serves (vocab coverage, token
frequency, per-source distribution shape) WITHOUT exploding 10^12 × n_tok
rows.

The scale pattern: `mapInPandas` bincount partials. Each Arrow batch
concatenates its token arrays (one NumPy op) and reduces them to a
(token_id, cnt) histogram bounded by the VOCAB SIZE, not the token count
— so a batch of 10k sequences × 300 tokens emits at most |V| rows into
the downstream hash aggregate instead of 3M. The final `groupBy(token_id)`
shuffles only vocab-sized partials per task. Compared to the explode +
partial-agg plan (which is also shuffle-correct — partial aggregation
collapses map-side), the bincount path never materializes per-token rows
in codegen at all; both produce identical exact counts and the tests pin
them against each other.

Per-source statistics ride the same partials keyed by (source, token_id);
entropy / distinct-vocab / totals then reduce those exact integer counts
with closed-form float expressions (one log per distinct token, summed —
order noise bounded well below the 1e-6 oracle rounding belt).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HIST_SCHEMA = "token_id int, cnt long"
_SRC_HIST_SCHEMA = "source string, token_id int, cnt long"


#: above this id range, bincount's dense array (8 B per slot) stops being
#: the cheap path — np.unique is O(n log n) but allocation-bounded by the
#: BATCH, not the id space. Both are exact.
_BINCOUNT_MAX_ID = 1 << 24


def _exact_counts(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if flat.min() < 0:  # e.g. a -1 padding sentinel: bincount would raise
        raise ValueError(
            "negative token id in histogram input — token ids must be >= 0 "
            "(strip padding sentinels before token_histogram)"
        )
    if flat.max() < _BINCOUNT_MAX_ID:
        counts = np.bincount(flat)
        ids = np.nonzero(counts)[0]
        return ids, counts[ids]
    return np.unique(flat, return_counts=True)


def _batch_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        flat = np.concatenate(pdf["tokens"].to_list())
        if not flat.size:
            continue
        ids, cnts = _exact_counts(flat)
        yield pd.DataFrame(
            {"token_id": ids.astype(np.int32), "cnt": cnts.astype(np.int64)}
        )


def _batch_hist_by_source(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        out_src: list[str] = []
        out_ids: list[np.ndarray] = []
        out_cnt: list[np.ndarray] = []
        for src, g in pdf.groupby("source", sort=False):
            flat = np.concatenate(g["tokens"].to_list())
            if not flat.size:
                continue
            ids, cnts = _exact_counts(flat)
            out_src.extend([src] * len(ids))
            out_ids.append(ids.astype(np.int32))
            out_cnt.append(cnts.astype(np.int64))
        if out_src:
            yield pd.DataFrame(
                {
                    "source": out_src,
                    "token_id": np.concatenate(out_ids),
                    "cnt": np.concatenate(out_cnt),
                }
            )


def token_histogram_keyed(
    seq: DataFrame, keys: list[str], key_schema: str
) -> DataFrame:
    """Exact (keys..., token_id, cnt) histogram via the same vocab-bounded
    bincount partials, grouped by an arbitrary key tuple (e.g.
    (source, day) for drift analysis). `key_schema` declares the key
    columns' DDL (`"source string, bucket timestamp"`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for kv, g in pdf.groupby(keys, sort=False):
                flat = np.concatenate(g["tokens"].to_list())
                if not flat.size:
                    continue
                ids, cnts = _exact_counts(flat)
                kv = kv if isinstance(kv, tuple) else (kv,)
                d = {k: [v] * len(ids) for k, v in zip(keys, kv)}
                d["token_id"] = ids.astype(np.int32)
                d["cnt"] = cnts.astype(np.int64)
                outs.append(pd.DataFrame(d))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = seq.select(*keys, "tokens").mapInPandas(
        gen, f"{key_schema}, token_id int, cnt long"
    )
    return partials.groupBy(*keys, "token_id").agg(F.sum("cnt").alias("cnt"))


def token_drift(
    seq: DataFrame, ts_col: str = "event_ts", bucket: str = "day"
) -> DataFrame:
    """Per-(source, bucket) token-distribution DRIFT vs the whole corpus
    in that bucket: exact KL divergence D(p_source,bucket || p_bucket) —
    the time x token signature signal (a source whose token mix shifts
    away from the day's corpus flags ingestion regressions, scraper
    drift, or template floods long before volume metrics move).

    Exactness contract (the bigram-LM idiom): every per-token term
    c * ln((c * M) / (N * C)) is computed from ONE float division of two
    exact BIGINT products and rounded to integer MICRO-NAT units before
    the cross-token sum, so the aggregate is a BIGINT — summation-order
    free, hash-twinnable. The published ``kl_nats`` is one final division
    of exact integers.

    Scale shape: the (source, bucket, token) histogram comes from the
    vocab-bounded bincount partials (never an explode of the corpus);
    the three reference tables (per-bucket token totals, per-(source,
    bucket) totals, per-bucket totals) are all re-aggregations of that
    histogram — one extra shuffle each, all bounded by vocab x buckets.

    Returns (source, bucket, n_tok, n_distinct, kl_unats BIGINT,
    kl_nats double)."""
    d = seq.withColumn("bucket", F.date_trunc(bucket, ts_col))
    # EAGER checkpoint: the histogram feeds THREE consumers (per-bucket
    # totals, per-(source,bucket) totals, and the term join) — left lazy,
    # the bincount partials pass over the corpus runs three times
    h = token_histogram_keyed(
        d, ["source", "bucket"], "source string, bucket timestamp"
    ).localCheckpoint()
    day_tot = h.groupBy("bucket", "token_id").agg(F.sum("cnt").alias("day_cnt"))
    n_sb = h.groupBy("source", "bucket").agg(F.sum("cnt").alias("n_sb"))
    m_b = day_tot.groupBy("bucket").agg(F.sum("day_cnt").alias("m_b"))
    j = (
        h.join(day_tot, ["bucket", "token_id"])
        .join(n_sb, ["source", "bucket"])
        .join(F.broadcast(m_b), "bucket")
    )
    # exact integer products, ONE division, ln, micro-nat rounding
    ratio = (F.col("cnt") * F.col("m_b")).cast("double") / (
        F.col("n_sb") * F.col("day_cnt")
    ).cast("double")
    term_u = F.round(F.col("cnt").cast("double") * F.log(ratio) * 1e6, 0).cast("long")
    return (
        j.groupBy("source", "bucket")
        .agg(
            F.min("n_sb").alias("n_tok"),  # constant within the group
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(term_u).alias("kl_unats"),
        )
        .select(
            "source", "bucket", "n_tok", "n_distinct", "kl_unats",
            (F.col("kl_unats").cast("double")
             / (F.col("n_tok") * F.lit(1_000_000)).cast("double")).alias("kl_nats"),
        )
    )


def token_histogram(seq: DataFrame, by_source: bool = False) -> DataFrame:
    """Exact corpus token-frequency histogram (module doc). Input needs a
    `tokens: array<int>` column (plus `source` when by_source). Returns
    (token_id, cnt) or (source, token_id, cnt) with exact BIGINT counts."""
    if by_source:
        partials = seq.select("source", "tokens").mapInPandas(
            _batch_hist_by_source, _SRC_HIST_SCHEMA
        )
        return partials.groupBy("source", "token_id").agg(
            F.sum("cnt").alias("cnt")
        )
    partials = seq.select("tokens").mapInPandas(_batch_hist, _HIST_SCHEMA)
    return partials.groupBy("token_id").agg(F.sum("cnt").alias("cnt"))


def token_histogram_explode(seq: DataFrame, by_source: bool = False) -> DataFrame:
    """The pure-built-in twin of `token_histogram` (explode + hash agg with
    map-side partials). Same exact counts; kept as the cross-check and for
    engines/readers preferring zero Python. The bincount path wins on CPU
    because it never materializes per-token rows."""
    keys = (["source"] if by_source else []) + ["token_id"]
    return (
        seq.select(*(["source"] if by_source else []),
                   F.explode("tokens").alias("token_id"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_tokens(seq: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k token ids by exact count, ties broken by token_id —
    deterministic, so the result set is oracle-comparable. orderBy+limit
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort materialization) over the vocab-bounded histogram."""
    return (
        token_histogram(seq)
        .orderBy(F.desc("cnt"), "token_id")
        .limit(k)
    )


def source_token_profile(seq: DataFrame) -> DataFrame:
    """Per-source distribution shape from the exact (source, token_id, cnt)
    histogram: ``n_distinct`` vocab coverage, ``tok_total``, and Shannon
    ``entropy`` in nats (ln(N) − Σ c·ln(c)/N — exact integer counts, one
    closed-form float reduction)."""
    hist = token_histogram(seq, by_source=True)
    n = F.sum("cnt")
    plogp = F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double")))
    return hist.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        n.alias("tok_total"),
        (F.log(n.cast("double")) - plogp / n.cast("double")).alias("entropy"),
    )
