"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full tsrollup engine (tokenize → tiered
                rollup → gap-fill → z-score/EWMA detectors) over a sequence
                table derived from sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2.1 +
                datapipe ops); SQL-expressible ones have DuckDB twins in
                oracle_sql(); engine-internal ones (detector kernels, codec,
                LSH-ANN, multimodal plumbing) are rows-only here and
                byte-parity-tested against the NumPy oracle in tests/.
oracle_sql()  — DuckDB SQL with IDENTICAL column aliases per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsrollup.driver_queries import ORACLE, SPARK  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: full-engine anomaly scores."""
    from tsrollup.flagship import flagship_scores

    return flagship_scores(spark, "/root/testdata/sf0.001", tier="1h")


def _engine_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Rows-only entries: operators whose semantics aren't ANSI-SQL
    expressible (sequential recurrences, bit-level codecs, NumPy LSH)."""
    from tsrollup.config import RollupConfig
    from tsrollup.codec import compress_tier, decompress_blocks
    from tsrollup.datapipe import ann_lsh_topk, multimodal_features
    from tsrollup.detect import residual_stats
    from tsrollup.flagship import flagship_scores, sequences_from_documents
    from tsrollup.gapfill import gapfill
    from tsrollup.rollup import build_all_tiers

    def engine_zscore_1h(spark, sf_dir):
        return flagship_scores(spark, sf_dir, tier="1h")

    def engine_residual_stats(spark, sf_dir):
        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        tiers = build_all_tiers(seq, cfg)
        return residual_stats(gapfill(tiers["1h"], "1h", cfg), "1h", cfg)

    def engine_codec_blocks(spark, sf_dir):
        cfg = RollupConfig()
        seq = sequences_from_documents(spark, sf_dir)
        tiers = build_all_tiers(seq, cfg)
        filled = gapfill(tiers["1h"], "1h", cfg)
        blocks = compress_tier(filled, "1h", cfg)
        return decompress_blocks(blocks)

    def ann_lsh(spark, sf_dir):
        return ann_lsh_topk(spark, sf_dir)

    def mm_features(spark, sf_dir):
        # The driver canonicalizer sorts/hashes every column, and pandas
        # can't factorize list cells — project the feature array to a
        # fixed-precision string so the rows-only check is hashable.
        from pyspark.sql import functions as F

        df = multimodal_features(spark, sf_dir)
        feat_str = F.concat_ws(
            ",", F.transform("feature", lambda x: F.format_string("%.6f", x))
        )
        return df.select(
            "doc_id", "media_type", "n_bytes", "width", "height",
            feat_str.alias("feature_csv"),
        )

    return {
        "engine_zscore_1h": engine_zscore_1h,
        "engine_residual_stats": engine_residual_stats,
        "engine_codec_blocks": engine_codec_blocks,
        "ann_lsh": ann_lsh,
        "mm_features": mm_features,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK)
    out.update(_engine_queries())
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
