"""Declarative data-quality audit (SURVEY.md §2.1 row Q1).

A production ingest gate needs an assertion pass over every landed table:
null/domain/range rules, key uniqueness, referential integrity. The design
constraint at 100 TB is the same one the rollup path obeys everywhere —
ONE scan per table:

- every column rule and every uniqueness rule over a table fuses into a
  SINGLE hash-aggregate (`sum(cast(violation as long))` and
  `count(*) - count(distinct keys)` live in the same Aggregate node), so
  k rules cost one scan, not k;
- referential rules are LEFT ANTI joins, broadcast when the referenced
  key set is dim-sized (the caller passes the ref DataFrame, so
  `F.broadcast` composes from outside);
- the result is a long-format frame `(tbl, check, violations, checked)` —
  tiny (one row per rule), safe to collect, diff, or sink as an audit
  ledger partition.

Rules are plain SQL boolean expressions (True = violation), so the same
rule text can be re-evaluated by any ANSI engine — which is exactly how
the DuckDB oracle twins the audit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnRule:
    """Counted in the fused scan: `violation_sql` is a boolean SQL
    expression over the table's columns, True = this row violates."""

    name: str
    violation_sql: str


@dataclass(frozen=True)
class UniqueRule:
    """Key-uniqueness rule: violations = count(*) - count(distinct cols).
    Also fused into the single aggregate (distinct-count partials merge
    map-side like any other agg buffer)."""

    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class RefRule:
    """Referential rule: rows whose `col` has no match in `ref_col` of the
    referenced frame. Evaluated as a LEFT ANTI join + count."""

    name: str
    col: str
    ref: DataFrame
    ref_col: str
    broadcast: bool = True


@dataclass(frozen=True)
class TableSpec:
    tbl: str
    df: DataFrame
    column_rules: tuple[ColumnRule, ...] = field(default_factory=tuple)
    unique_rules: tuple[UniqueRule, ...] = field(default_factory=tuple)
    ref_rules: tuple[RefRule, ...] = field(default_factory=tuple)


_OUT_COLS = ("tbl", "check", "violations", "checked")


def _fused_scan(spec: TableSpec) -> DataFrame | None:
    """All column + uniqueness rules of one table as ONE aggregate over
    ONE scan, melted to long format with explode (the 1-row wide result
    never leaves the JVM)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in spec.column_rules:
        aggs.append(
            F.sum(F.expr(r.violation_sql).cast("long")).alias(f"c_{r.name}")
        )
    for r in spec.unique_rules:
        # distinct over a STRUCT of the key columns: a NULL key component
        # still forms a distinct (non-NULL) struct value, so NULL-keyed
        # rows group together instead of each counting as a violation
        # (bare count_distinct(cols...) skips any-NULL rows entirely) —
        # matches DuckDB's count(DISTINCT (a, b)) row-value semantics
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in r.cols]))
            ).alias(f"c_{r.name}")
        )
    names = [r.name for r in spec.column_rules] + [
        r.name for r in spec.unique_rules
    ]
    if not names:
        return None
    wide = spec.df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("check"),
                F.coalesce(F.col(f"c_{n}"), F.lit(0)).alias("violations"),
            )
            for n in names
        ]
    )
    return wide.select(
        F.lit(spec.tbl).alias("tbl"),
        F.explode(pairs).alias("p"),
        F.col("__n").alias("checked"),
    ).select(
        "tbl",
        F.col("p.check").alias("check"),
        F.col("p.violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
    )


def _ref_scan(spec: TableSpec, r: RefRule) -> DataFrame:
    ref = r.ref.select(F.col(r.ref_col).alias(r.col)).distinct()
    if r.broadcast:
        ref = F.broadcast(ref)
    orphans = spec.df.select(r.col).join(ref, r.col, "left_anti")
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    ).select(
        F.lit(spec.tbl).alias("tbl"),
        F.lit(r.name).alias("check"),
        "violations",
        F.lit(None).cast("long").alias("checked"),
    )


def audit(specs: list[TableSpec]) -> DataFrame:
    """Run every rule of every spec; returns the long-format audit frame
    `(tbl, check, violations BIGINT, checked BIGINT)`. `checked` is the
    table's row count for fused rules, NULL for referential rules (the
    anti-join never counts the full table a second time)."""
    parts: list[DataFrame] = []
    for spec in specs:
        fused = _fused_scan(spec)
        if fused is not None:
            parts.append(fused)
        for r in spec.ref_rules:
            parts.append(_ref_scan(spec, r))
    if not parts:
        raise ValueError("audit() needs at least one rule")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
