"""Explicit schema constants (SURVEY.md §1). No schema inference in
production paths — every DataFrame boundary declares one of these."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Input sequence table (BASELINE.json input_hint) + derived event time.
SEQUENCE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("tokens", ArrayType(IntegerType(), containsNull=False), nullable=False),
        StructField("n_tok", IntegerType(), nullable=False),
        StructField("source", StringType(), nullable=False),
        StructField("event_ts", TimestampType(), nullable=False),
    ]
)

#: One rollup table per tier, identical schema (SURVEY.md §1.3).
ROLLUP_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("bucket_start", TimestampType(), nullable=False),
        StructField("tier", StringType(), nullable=False),
        StructField("cnt", LongType(), nullable=False),
        StructField("n_tok_sum", LongType(), nullable=True),
        StructField("n_tok_min", IntegerType(), nullable=True),
        StructField("n_tok_max", IntegerType(), nullable=True),
        StructField("n_tok_mean", DoubleType(), nullable=True),
        StructField("tok_sum", LongType(), nullable=True),
        StructField("tok_cnt", LongType(), nullable=True),
        StructField("tok_min", IntegerType(), nullable=True),
        StructField("tok_max", IntegerType(), nullable=True),
        StructField("tok_mean", DoubleType(), nullable=True),
        StructField("gap_filled", BooleanType(), nullable=False),
    ]
)

#: Detector output: one row per (source, bucket_start, tier, detector).
SCORE_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("bucket_start", TimestampType(), nullable=False),
        StructField("tier", StringType(), nullable=False),
        StructField("detector", StringType(), nullable=False),  # 'zscore' | 'ewma'
        StructField("value", DoubleType(), nullable=True),
        StructField("score", DoubleType(), nullable=True),      # NaN in warmup
        StructField("is_anomaly", BooleanType(), nullable=True),
    ]
)

#: Per-(source, tier) streaming residual statistics (Welford finals).
RESIDUAL_STATS_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("tier", StringType(), nullable=False),
        StructField("detector", StringType(), nullable=False),
        StructField("n", LongType(), nullable=False),
        StructField("mean", DoubleType(), nullable=True),
        StructField("var_pop", DoubleType(), nullable=True),
    ]
)

#: Compressed block table: one row per (source, tier, metric, block_start).
BLOCK_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("tier", StringType(), nullable=False),
        StructField("metric", StringType(), nullable=False),
        StructField("block_start", TimestampType(), nullable=False),
        StructField("n_points", IntegerType(), nullable=False),
        StructField("ts_dod_blob", BinaryType(), nullable=False),
        StructField("val_xor_blob", BinaryType(), nullable=False),
    ]
)

#: Lineage ledger: one row per completed work unit per run (SURVEY.md §2.9).
LEDGER_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), nullable=False),
        StructField("unit_id", StringType(), nullable=False),
        StructField("input_rows", LongType(), nullable=False),
        StructField("token_checksum", LongType(), nullable=False),
        StructField("out_rows_1m", LongType(), nullable=True),
        StructField("out_rows_1h", LongType(), nullable=True),
        StructField("out_rows_1d", LongType(), nullable=True),
        StructField("wall_ms", LongType(), nullable=True),
    ]
)

#: Planted-anomaly side table emitted by synth (FIXTURES.md §A).
EXPECTED_ANOMALIES_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("window_start", TimestampType(), nullable=False),
        StructField("window_end", TimestampType(), nullable=False),
        StructField("kind", StringType(), nullable=False),  # spike|shift|gap
    ]
)
