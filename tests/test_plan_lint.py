"""Systematic physical-plan lint over the driver-query surface: no
row-at-a-time Python anywhere (BatchEvalPython — the BASELINE 'no per-row
Python' mandate is a plan property, not a convention), and scan-heavy
entries keep their parquet scans (no accidental driver-side collects
materializing inputs)."""

from __future__ import annotations

import pytest

from tsrollup.driver_queries import SPARK

SF = "/root/testdata/sf0.001"

#: entries whose CONSTRUCTION runs jobs by design (eager checkpoints of
#: multi-consumer subtrees / iterative loops) — still linted, just noted
#: for the reader; none are excluded.
_EAGER = {"dd_containment", "dd_components", "dd_components_star",
          "dd_semantic", "tx_bigram_lm", "emb_kmeans"}


@pytest.mark.parametrize("name", sorted(SPARK))
def test_no_row_python_in_plan(spark, name):
    df = SPARK[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the physical plan"
    )
