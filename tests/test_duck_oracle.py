"""DuckDB-side xxhash64 (tsrollup/duck_oracle.py) and the engine-entry
oracle twins registered by __spark_entry__._engine_oracles().

The oracle re-derives the sequence table from `documents` independently
(SQL XXH64 macros), so these tests pin the two load-bearing facts:
1. the SQL xxh64/xxpmod agree with Spark's F.xxhash64/F.pmod bit-for-bit
   on every length 0..31 plus unicode, and on every word of the fixture;
2. each engine entry's Spark result equals its DuckDB oracle exactly at
   sf0.001 (the driver re-checks at sf0.01).
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.duck_oracle import XXH64_PRELUDE

from .conftest import TESTDATA

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(XXH64_PRELUDE)
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def test_sql_xxh64_matches_spark(spark, duck):
    samples = [""]
    # every byte length 1..31, mixed alphabets, plus unicode multi-byte
    base = "the quick brown fox jumps over 0123456789_ABC-xyz"
    samples += [base[:n] for n in range(1, 32)]
    samples += ["0", "42", "499", "4999", "source_7", "héllo wörld", "日本"]
    got = [duck.execute("SELECT xxh64(?), xxpmod(xxh64(?), 50257)", [s, s]).fetchone()
           for s in samples]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    exp = df.select(
        F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(50257)).alias("p")
    ).collect()
    for s, (gh, gp), r in zip(samples, got, exp):
        assert gh == r["h"] and gp == r["p"], (s, gh, gp, r["h"], r["p"])


def test_sql_xxh64_null_guard(duck):
    """>= 32 bytes is outside the short-string variant: must be NULL (a
    violated precondition surfaces as a mismatch, never a wrong hash)."""
    assert duck.execute("SELECT xxh64(?)", ["x" * 32]).fetchone()[0] is None


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_words_within_precondition(sf):
    con = duckdb.connect()
    p = os.path.join(TESTDATA, sf, "documents.parquet")
    maxw, maxd = con.execute(
        f"""SELECT max(octet_length(encode(w))),
                   max(octet_length(encode(doc_id::VARCHAR)))
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS w, doc_id
                  FROM read_parquet('{p}'))"""
    ).fetchone()
    assert maxw < 32 and maxd < 32, (maxw, maxd)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_sql_intlist_hash_matches_spark(spark, duck):
    arrs = [[], [0], [1, 2, 3], [50256, 0, 49999], [2**31 - 1, -1, -(2**31)],
            list(range(200))]
    got = [duck.execute("SELECT xxh64_intlist(?::INT[])", [a]).fetchone()[0]
           for a in arrs]
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    schema = StructType([StructField("a", ArrayType(IntegerType()))])
    df = spark.createDataFrame([(a,) for a in arrs], schema)
    exp = [r[0] for r in df.select(F.xxhash64("a")).collect()]
    assert got == exp


ENGINE_ORACLE_NAMES = [
    "engine_streaming_rollup",
    "engine_read_range",
    "engine_streamed_ingest",
    "engine_retention",
    "engine_resume_ledger",
    "engine_read_decoded",
    "engine_codec_blocks",
    "tx_bloom_decontam",
    "sk_cms_heavy",
    "tx_bigram_lift",
    "dd_phash",
    "dd_audio_fp",
    "engine_bucketed_join",
    "x1_ab_test",
    "engine_streaming_ohlc",
    "engine_targeted_delete",
    "mx_quota",
    "engine_bpe_encode",
    "engine_vacuum",
    "engine_time_travel",
    "engine_schema_evolution",
    "engine_freshness",
    "engine_backfill",
]


@pytest.mark.parametrize("name", ENGINE_ORACLE_NAMES)
def test_engine_entry_matches_oracle(spark, duck, name):
    import __spark_entry__ as entry

    got = _normalize(entry.queries()[name](spark, SF_DIR).toPandas())
    exp = _normalize(duck.execute(entry.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = pd.array(got[c]), pd.array(exp[c])
        ok = (g == e) | (pd.isna(g) & pd.isna(e))
        ok = pd.array(ok, dtype="boolean").fillna(False).to_numpy(dtype=bool)
        assert ok.all(), f"{name}.{c}: {(~ok).sum()} mismatches"
