"""Per-partition lineage + exact resume (SURVEY.md §2.9, S3/J4).

Work unit = (source_bucket, day): a stable hash bucket of `source` crossed
with the event-time day. This keying makes EVERY tier's rollup rows
unit-local — 1m/1h/1d buckets never cross a day boundary and a source lives
in exactly one hash bucket — so a unit's outputs occupy exactly one
(tier, day, source_bucket) partition directory per tier, and exact resume is
"dynamic-partition-overwrite the pending units' directories, then commit
ledger rows". At-least-once writes + last-commit-wins = exactly-once effect.

The ledger is an append-only directory of small parquet files (one per
completed batch), written via an atomic tmp-file rename. `token_checksum`
(bit_xor of per-row xxhash64 over the tokens array — order-independent)
is the cheap always-on guard for the bit-identity invariant; full elementwise
equality runs in tests.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import n_source_buckets

LEDGER_DIRNAME = "_ledger"


def with_unit(df: DataFrame) -> DataFrame:
    """Tag each input row with its work-unit key columns."""
    return df.withColumn(
        "source_bucket", F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int")
    ).withColumn("day", F.to_date("event_ts"))


def unit_id_col():
    return F.concat_ws("/", F.col("source_bucket").cast("string"), F.col("day").cast("string"))


def unit_id_col_from_bucket():
    """Unit key recovered from rollup rows: the unit's (source_bucket, day)
    is a pure function of (source, bucket_start) — buckets never cross days."""
    return F.concat_ws(
        "/",
        F.pmod(F.xxhash64("source"), F.lit(n_source_buckets())).cast("int").cast("string"),
        F.to_date("bucket_start").cast("string"),
    )


def _ledger_files(path: str, prefix: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.startswith(prefix) and n.endswith(".parquet")
    ]


def _next_seq(path: str) -> int:
    """Monotone commit/tombstone sequence, allocated from filenames
    (single-driver store; the ledger dir is the coordination point)."""
    seq = 0
    if os.path.isdir(path):
        for n in os.listdir(path):
            parts = n.split("-")
            if len(parts) >= 3 and parts[0] in ("commit", "invalidate"):
                try:
                    seq = max(seq, int(parts[1]))
                except ValueError:
                    continue
    return seq + 1


def read_ledger(spark: SparkSession, base_path: str) -> DataFrame | None:
    files = _ledger_files(os.path.join(base_path, LEDGER_DIRNAME), "commit-")
    if not files:
        return None
    return spark.read.parquet(*files)


def read_tombstones(spark: SparkSession, base_path: str) -> DataFrame | None:
    files = _ledger_files(os.path.join(base_path, LEDGER_DIRNAME), "invalidate-")
    if not files:
        return None
    return spark.read.parquet(*files)


def completed_unit_ids(spark: SparkSession, base_path: str) -> DataFrame | None:
    """Units whose newest commit outlives any tombstone: a unit is pending
    again after invalidate_units() until a fresh commit supersedes the
    tombstone (the backfill re-roll path)."""
    led = read_ledger(spark, base_path)
    if led is None:
        return None
    committed = led.groupBy("unit_id").agg(F.max("seq").alias("cseq"))
    tomb = read_tombstones(spark, base_path)
    if tomb is None:
        return committed.select("unit_id")
    tombed = tomb.groupBy("unit_id").agg(F.max("seq").alias("tseq"))
    return (
        committed.join(tombed, "unit_id", "left")
        .where(F.col("cseq") > F.coalesce(F.col("tseq"), F.lit(-1)))
        .select("unit_id")
    )


def invalidate_units(base_path: str, unit_ids: list[str]) -> str:
    """Mark committed units pending again (late-data backfill): appends an
    atomic tombstone file; the next rollup_build re-rolls those units and
    its commit (higher seq) supersedes the tombstone."""
    path = os.path.join(base_path, LEDGER_DIRNAME)
    os.makedirs(path, exist_ok=True)
    seq = _next_seq(path)
    table = pa.Table.from_pylist(
        [{"unit_id": u, "seq": seq} for u in unit_ids],
        schema=pa.schema([("unit_id", pa.string()), ("seq", pa.int64())]),
    )
    final = os.path.join(path, f"invalidate-{seq:08d}-{uuid.uuid4().hex}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, final)
    return final


def filter_pending(df: DataFrame, done_units: DataFrame | None) -> DataFrame:
    """J4 — keep only rows whose unit has no ledger commit. The done-unit
    list is tiny relative to the input (one row per (bucket, day)), so the
    anti-join broadcasts."""
    df = df.withColumn("unit_id", unit_id_col())
    if done_units is None:
        return df
    return df.join(F.broadcast(done_units), "unit_id", "left_anti")


def unit_metrics(df: DataFrame) -> DataFrame:
    """Per-unit input_rows + order-independent token checksum (bit_xor of
    per-row xxhash64 — associative/commutative, overflow-free under ANSI)."""
    return (
        df.groupBy("unit_id")
        .agg(
            F.count(F.lit(1)).alias("input_rows"),
            F.expr("bit_xor(xxhash64(tokens))").alias("token_checksum"),
        )
    )


def commit_ledger(
    base_path: str,
    rows: list[dict],
    run_id: str | None = None,
) -> str:
    """Atomically append one parquet file of ledger rows (the commit point:
    outputs are written BEFORE this; a crash in between leaves unledgered
    outputs that the next run simply overwrites)."""
    path = os.path.join(base_path, LEDGER_DIRNAME)
    os.makedirs(path, exist_ok=True)
    run_id = run_id or uuid.uuid4().hex
    seq = _next_seq(path)
    table = pa.Table.from_pylist(
        [
            {
                "run_id": run_id,
                "seq": seq,
                "unit_id": r["unit_id"],
                "input_rows": int(r["input_rows"]),
                "token_checksum": int(r["token_checksum"]) if r["token_checksum"] is not None else 0,
                "out_rows_1m": int(r.get("out_rows_1m") or 0),
                "out_rows_1h": int(r.get("out_rows_1h") or 0),
                "out_rows_1d": int(r.get("out_rows_1d") or 0),
                "wall_ms": int(r.get("wall_ms") or 0),
            }
            for r in rows
        ],
        schema=pa.schema(
            [
                ("run_id", pa.string()),
                ("seq", pa.int64()),
                ("unit_id", pa.string()),
                ("input_rows", pa.int64()),
                ("token_checksum", pa.int64()),
                ("out_rows_1m", pa.int64()),
                ("out_rows_1h", pa.int64()),
                ("out_rows_1d", pa.int64()),
                ("wall_ms", pa.int64()),
            ]
        ),
    )
    final = os.path.join(path, f"commit-{seq:08d}-{run_id}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, final)  # atomic on POSIX — the commit point
    return final


def visible_units_asof(
    spark: SparkSession, base_path: str, seq: int
) -> DataFrame | None:
    """Snapshot membership at ledger sequence ``seq``: units whose newest
    commit at-or-before ``seq`` outlives any tombstone at-or-before
    ``seq`` — the unit set a reader at that point in history saw. Adds
    ``rewritten_since`` = a LATER ledger entry (commit or tombstone)
    touched the unit, i.e. the store's CURRENT bytes for it are newer
    than the snapshot."""
    led = read_ledger(spark, base_path)
    if led is None:
        return None
    c = (
        led.where(F.col("seq") <= seq)
        .groupBy("unit_id")
        .agg(F.max("seq").alias("cseq"))
    )
    tomb = read_tombstones(spark, base_path)
    if tomb is not None:
        tseq = (
            tomb.where(F.col("seq") <= seq)
            .groupBy("unit_id")
            .agg(F.max("seq").alias("tseq"))
        )
        c = c.join(tseq, "unit_id", "left").where(
            F.col("cseq") > F.coalesce(F.col("tseq"), F.lit(-1))
        )
    later = led.where(F.col("seq") > seq).select("unit_id")
    if tomb is not None:
        later = later.union(tomb.where(F.col("seq") > seq).select("unit_id"))
    later = later.distinct().withColumn("rewritten_since", F.lit(True))
    return (
        c.select("unit_id")
        .join(later, "unit_id", "left")
        .select(
            "unit_id",
            F.coalesce("rewritten_since", F.lit(False)).alias("rewritten_since"),
        )
    )


def read_rollup_asof(
    spark: SparkSession,
    out_base: str,
    rollup_dir: str,
    seq: int,
    strict: bool = True,
) -> DataFrame:
    """Time-travel read: the rollup store AS OF ledger sequence ``seq``.
    Ledger seqs are the store's snapshot ids (every build/backfill
    appends one atomically), so membership time travel is exact: rows
    filter to the units visible at ``seq`` via the (source, bucket)
    → unit key recovery, broadcast-semi-joined — one store scan.

    Honesty contract for the plain-dir sandbox store: dynamic-partition
    overwrite keeps only each unit's NEWEST bytes, so if a visible unit
    was re-rolled after ``seq`` the historical bytes are gone —
    ``strict=True`` (default) raises instead of silently serving newer
    data; ``strict=False`` returns the rows with a ``rewritten_since``
    column for the caller to judge. Iceberg deploy: snapshot reads keep
    the old data files, so the strict path never triggers there —
    `VERSION AS OF` replaces the membership filter wholesale."""
    vis = visible_units_asof(spark, out_base, seq)
    if vis is None:
        raise ValueError(f"no ledger under {out_base} — nothing to time-travel")
    if strict:
        bad = vis.where("rewritten_since").limit(1).collect()
        if bad:
            raise RuntimeError(
                f"unit {bad[0]['unit_id']} was rewritten after seq {seq}; "
                "its historical bytes are unavailable in a plain-dir store "
                "(use strict=False to read with rewritten_since flags)"
            )
    rows = spark.read.parquet(os.path.join(out_base, rollup_dir)).withColumn(
        "unit_id", unit_id_col_from_bucket()
    )
    out = rows.join(F.broadcast(vis), "unit_id")
    if strict:
        out = out.drop("rewritten_since")
    return out.drop("unit_id")
