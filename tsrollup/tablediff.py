"""Snapshot diff: added / removed / changed rows between two table
versions (SURVEY.md §2.1 row Q2).

The nightly question on a 100 TB lake is "what changed since the last
snapshot" — for incremental downstream rebuilds, audit ledgers, and CDC
backfill validation. The operator is ONE full-outer sort-merge join on
the key (the unavoidable shuffle), with two compare modes:

- ``mode="columns"``: null-safe per-column compare (`IS DISTINCT FROM`
  semantics via Spark's ``eqNullSafe``). Exact, and directly
  re-expressible in ANSI SQL — the DuckDB twin runs the same predicate.
- ``mode="fingerprint"``: each side pre-reduces its compare columns to a
  single ``xxhash64`` fingerprint BEFORE the shuffle, so only
  ``(key, 8-byte hash)`` moves for unchanged-row detection — the shape
  that matters when rows are wide (a 2 KB row shuffles as 16 bytes).
  Collision risk is 2^-64 per pair; tests pin fingerprint == columns on
  real data.

Output is thin by design: ``(key_cols..., change)`` with change in
{'added','removed','changed'} — unchanged rows never leave the join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    mode: str = "columns",
) -> DataFrame:
    """Rows added/removed/changed from ``old`` to ``new``, keyed by
    ``key_cols``, comparing ``compare_cols``. See module docstring for
    the two modes."""
    if mode not in ("columns", "fingerprint"):
        raise ValueError(f"unknown mode {mode!r}")
    # NULL keys never equi-join, so a NULL-keyed row would be reported as
    # both 'added' and 'removed' even when unchanged — fail loud instead
    # (diff keys are primary keys; a NULL there is a data bug upstream)
    null_key = reduce(
        lambda x, y: x | y, [F.col(c).isNull() for c in key_cols]
    )
    n_null = (
        old.where(null_key).limit(1).count() + new.where(null_key).limit(1).count()
    )
    if n_null:
        raise ValueError(
            f"snapshot_diff: NULL in key column(s) {key_cols} — NULL keys "
            "cannot be matched across snapshots; clean or coalesce them first"
        )
    if mode == "fingerprint":
        a = old.select(*key_cols, F.xxhash64(*compare_cols).alias("__ha"))
        b = new.select(*key_cols, F.xxhash64(*compare_cols).alias("__hb"))
        same = F.col("__ha") == F.col("__hb")
        present_a, present_b = F.col("__ha"), F.col("__hb")
    else:
        a = old.select(
            *key_cols,
            *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
            F.lit(True).alias("__pa"),
        )
        b = new.select(
            *key_cols,
            *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
            F.lit(True).alias("__pb"),
        )
        same = reduce(
            lambda x, y: x & y,
            [
                F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
                for c in compare_cols
            ],
        )
        present_a, present_b = F.col("__pa"), F.col("__pb")
    j = a.join(b, key_cols, "full_outer")
    change = (
        F.when(present_a.isNull(), F.lit("added"))
        .when(present_b.isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
