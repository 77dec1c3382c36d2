"""tsrollup.dq declarative audit: planted violations of every rule class
are counted exactly, the fused scan really is ONE aggregate per table,
and the driver query's ledger fires on the real fixture's known dirt
(negative acctbals) while staying clean elsewhere."""

import pandas as pd
from pyspark.sql import functions as F

from tsrollup.dq import ColumnRule, RefRule, TableSpec, UniqueRule, audit


def _ledger(df):
    return {
        (r["tbl"], r["check"]): (r["violations"], r["checked"])
        for r in df.collect()
    }


def test_audit_planted_violations(spark):
    rows = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 2, 3, 4],          # one duplicate key
                "v": [5.0, -1.0, 3.0, -2.0, 8.0],  # two negatives
                "fk": [10, 10, 11, 12, 99],    # one orphan (99)
            }
        )
    )
    ref = spark.createDataFrame(pd.DataFrame({"rk": [10, 11, 12]}))
    out = audit(
        [
            TableSpec(
                "t",
                rows,
                column_rules=(ColumnRule("nonneg_v", "v < 0"),),
                unique_rules=(UniqueRule("pk_k", ("k",)),),
                ref_rules=(RefRule("fk_in_ref", "fk", ref, "rk"),),
            )
        ]
    )
    led = _ledger(out)
    assert led[("t", "nonneg_v")] == (2, 5)
    assert led[("t", "pk_k")] == (1, 5)
    assert led[("t", "fk_in_ref")][0] == 1
    assert led[("t", "fk_in_ref")][1] is None  # ref rules don't rescan


def test_audit_fused_rules_one_aggregate(spark):
    """k column rules + a uniqueness rule over one table must plan as a
    single Aggregate subtree — one scan, not k."""
    rows = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = audit(
        [
            TableSpec(
                "t",
                rows,
                column_rules=(
                    ColumnRule("a", "v < 0"),
                    ColumnRule("b", "v > 100"),
                    ColumnRule("c", "k < 0"),
                ),
                unique_rules=(UniqueRule("u", ("k",)),),
            )
        ]
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one Range source feeds the whole audit (no union of repeated scans)
    assert plan.count("Range (0, 100") == 1, plan
    led = _ledger(out)
    assert led == {
        ("t", "a"): (0, 100),
        ("t", "b"): (0, 100),
        ("t", "c"): (0, 100),
        ("t", "u"): (0, 100),
    }


def test_audit_requires_rules(spark):
    import pytest

    with pytest.raises(ValueError):
        audit([])


def test_unique_rule_null_keys_not_violations(spark):
    """ADVICE regression: NULL-keyed rows must not each count as a
    duplicate violation — distinct runs over a struct of the keys, so
    two DIFFERENT NULL-keyed rows group as one value (documented
    NULL==NULL grouping) and unique non-NULL keys report 0 violations."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d")], "k int, v string"
    )
    out = audit(
        [TableSpec("t", df, unique_rules=(UniqueRule("pk_k", ("k",)),))]
    ).toPandas()
    row = out[out["check"] == "pk_k"].iloc[0]
    # 4 rows, distinct struct keys {1, 2, NULL} -> exactly the one
    # NULL-group duplicate, not one violation per NULL row
    assert row["violations"] == 1
    assert row["checked"] == 4
