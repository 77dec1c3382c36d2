"""Flagship query for the driver smoke check: run the WHOLE engine —
tokenize → tiered rollup → gap-fill → detectors — over a sequence table
derived deterministically from the driver's `documents` fixture.

The testdata has no pre-tokenized sequence table, so we derive one with the
exact input_hint shape: tokens = xxhash64(word) mod vocab per word (a stand-in
tokenizer; deterministic, JVM-side, no Python), event_ts derived from doc_id
by the engine's standard resolve_event_time rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import RollupConfig
from .detect import score_tier
from .gapfill import gapfill
from .rollup import build_all_tiers
from .storage import resolve_event_time

VOCAB = 50257


def sequences_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = F.transform(
        F.split(F.lower("text"), " "),
        lambda w: F.pmod(F.xxhash64(w), F.lit(VOCAB)).cast("int"),
    )
    seq = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokens.alias("tokens"),
        "source",
    ).withColumn("n_tok", F.size("tokens"))
    return resolve_event_time(seq)


def flagship_scores(
    spark: SparkSession, sf_dir: str, tier: str = "1h", cfg: RollupConfig | None = None
) -> DataFrame:
    # documents-derived series are sparse (≈1 row per doc); a short z-score
    # window keeps the warmup region from swallowing the whole series
    cfg = cfg or RollupConfig()
    from dataclasses import replace

    cfg = replace(cfg, detector=replace(cfg.detector, window=12))
    seq = sequences_from_documents(spark, sf_dir)
    tiers = build_all_tiers(seq, cfg)
    filled = gapfill(tiers[tier], tier, cfg)
    return score_tier(filled, tier, cfg)
