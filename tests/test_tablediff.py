"""tablediff.snapshot_diff: planted add/remove/change classified exactly,
null-safe compare (NULL -> value counts as changed, NULL == NULL does
not), and the fingerprint scale path equals the exact columns mode on
the real fixture."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsrollup.tablediff import snapshot_diff

from .conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def _changes(df):
    return {(r["k"], r["change"]) for r in df.collect()}


def test_planted_diff(spark):
    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3, 4, 5], "v": ["b", "CHANGED", "d", "e"]})
    )
    got = _changes(snapshot_diff(old, new, ["k"], ["v"]))
    assert got == {(1, "removed"), (3, "changed"), (5, "added")}


def test_null_safe_compare(spark):
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "y")], "k int, v string"
    )
    got = _changes(snapshot_diff(old, new, ["k"], ["v"]))
    # NULL == NULL is unchanged; NULL vs value is changed (both ways)
    assert got == {(2, "changed"), (3, "changed")}


def test_fingerprint_mode_equals_columns_mode(spark):
    """The thin-shuffle fingerprint path must classify identically to the
    exact compare on real data (same evolution as the driver query)."""
    a = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    b = a.where(F.col("doc_id") % 23 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "source",
        "n_chars",
    )
    cols = ["lang", "source", "n_chars"]
    exact = {(r["doc_id"], r["change"])
             for r in snapshot_diff(a, b, ["doc_id"], cols, "columns").collect()}
    fp = {(r["doc_id"], r["change"])
          for r in snapshot_diff(a, b, ["doc_id"], cols, "fingerprint").collect()}
    assert exact == fp and len(exact) > 0


def test_bad_mode(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["id"], ["id"], mode="bogus")


def test_null_key_raises(spark):
    """ADVICE regression: NULL join keys never match across snapshots
    (would double-report 'added'+'removed'); fail loud instead."""
    import pytest
    from tsrollup.tablediff import snapshot_diff

    a = spark.createDataFrame([(1, "x"), (None, "y")], "k int, v string")
    b = spark.createDataFrame([(1, "x"), (None, "y")], "k int, v string")
    with pytest.raises(ValueError, match="NULL in key"):
        snapshot_diff(a, b, ["k"], ["v"]).collect()
