"""Exactly-incremental derived phase (tsrollup/increment.py).

The invariant: building a store in TWO batches (second batch resuming
from the per-(source, tier) state checkpoints) yields byte-identical
scores / residual stats / blocks / states to building it in ONE shot
from the union of the rows. Late-arriving units fall back to per-source
full recompute inside the same call and keep the invariant.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tsrollup.config import RollupConfig
from tsrollup.increment import STATE_DIR
from tsrollup.pipeline import (
    BLOCKS_DIR,
    SCORES_DIR,
    STATS_DIR,
    rollup_build,
)

from .conftest import FIXTURE_DIR, assert_frame_byte_equal

BASE = os.path.join(FIXTURE_DIR, "increment")


def _split_fixture(seq_path: str, out_dir: str, mask_fn) -> str:
    """Write the subset of fixture rows where mask_fn(event_ts_us) is
    true, as a single parquet file."""
    parts = (
        sorted(glob.glob(os.path.join(seq_path, "*.parquet")))
        if os.path.isdir(seq_path)
        else [seq_path]
    )
    table = pa.concat_tables([pq.read_table(p) for p in parts])
    ts = table.column("event_ts").to_numpy()
    keep = mask_fn(ts)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "sequences.parquet")
    pq.write_table(table.filter(pa.array(keep)), out)
    return out


def _read_sorted(spark, base, sub, keys):
    df = spark.read.parquet(os.path.join(base, sub)).toPandas()
    return df, keys


def _compare_stores(spark, got_base, exp_base, msg):
    for sub, keys in (
        (SCORES_DIR, ["source", "tier", "detector", "bucket_start"]),
        (STATS_DIR, ["source", "tier", "detector"]),
        (BLOCKS_DIR, ["source", "tier", "metric", "block_start"]),
        (STATE_DIR, ["source", "tier"]),
    ):
        got = spark.read.parquet(os.path.join(got_base, sub)).toPandas()
        exp = spark.read.parquet(os.path.join(exp_base, sub)).toPandas()
        if sub in (SCORES_DIR, BLOCKS_DIR, STATE_DIR):
            got = got.drop(columns=["day"], errors="ignore")
            exp = exp.drop(columns=["day"], errors="ignore")
        # partition col dtype (category) normalization
        for df in (got, exp):
            for c in ("tier", "source_bucket"):
                if c in df:
                    df[c] = df[c].astype(str)
        assert_frame_byte_equal(got, exp, keys, msg=f"{msg}:{sub}")


@pytest.fixture(scope="module")
def day_boundary(spark, seq_fixture_small):
    from tsrollup.storage import read_sequences

    days = sorted(
        r[0]
        for r in read_sequences(spark, seq_fixture_small)
        .select(F.to_date("event_ts")).distinct().collect()
    )
    assert len(days) >= 2, days
    return days[-1]  # split before the last observed day


def _us(day) -> int:
    import datetime as dt

    return int(
        dt.datetime(day.year, day.month, day.day).timestamp() * 1_000_000
    )


def test_two_batch_incremental_matches_single_shot(spark, seq_fixture_small, day_boundary):
    cut_us = _us(day_boundary)
    b1 = _split_fixture(
        seq_fixture_small, os.path.join(BASE, "b1"),
        lambda ts: ts.astype("int64") < cut_us,
    )
    b2 = _split_fixture(
        seq_fixture_small, os.path.join(BASE, "b2"),
        lambda ts: ts.astype("int64") >= cut_us,
    )
    cfg = RollupConfig()
    inc_store = os.path.join(BASE, "store_inc")
    full_store = os.path.join(BASE, "store_full")
    import shutil

    shutil.rmtree(inc_store, ignore_errors=True)
    shutil.rmtree(full_store, ignore_errors=True)
    s1 = rollup_build(spark, b1, inc_store, cfg)
    assert "derive_fused" in s1["phases"], s1["phases"]
    s2 = rollup_build(spark, b2, inc_store, cfg)
    # the second batch must have taken the incremental path
    assert "derive_inc" in s2["phases"], s2["phases"]
    rollup_build(spark, seq_fixture_small, full_store, cfg)
    _compare_stores(spark, inc_store, full_store, "two-batch")


def test_late_unit_falls_back_and_matches(spark, seq_fixture_small, day_boundary):
    """Feed the LAST day first, then the earlier days (a late unit):
    every affected source falls back to full recompute; result still
    byte-equals single-shot."""
    cut_us = _us(day_boundary)
    late1 = _split_fixture(
        seq_fixture_small, os.path.join(BASE, "late1"),
        lambda ts: ts.astype("int64") >= cut_us,
    )
    late2 = _split_fixture(
        seq_fixture_small, os.path.join(BASE, "late2"),
        lambda ts: ts.astype("int64") < cut_us,
    )
    cfg = RollupConfig()
    inc_store = os.path.join(BASE, "store_late")
    full_store = os.path.join(BASE, "store_full2")
    import shutil

    shutil.rmtree(inc_store, ignore_errors=True)
    shutil.rmtree(full_store, ignore_errors=True)
    rollup_build(spark, late1, inc_store, cfg)
    s2 = rollup_build(spark, late2, inc_store, cfg)
    assert "derive_inc" in s2["phases"], s2["phases"]
    rollup_build(spark, seq_fixture_small, full_store, cfg)
    _compare_stores(spark, inc_store, full_store, "late-unit")


def test_partial_source_batch_preserves_neighbors(
    spark, seq_fixture_small, day_boundary, monkeypatch
):
    """Second batch carries only HALF the sources' last-day rows; sources
    sharing a source_bucket partition with updated ones must keep their
    derived rows (preserve-union). Compare against single-shot over the
    same effective row set. 4 source buckets force collisions."""
    monkeypatch.setenv("TSROLLUP_SOURCE_BUCKETS", "4")
    cut_us = _us(day_boundary)
    parts = sorted(glob.glob(os.path.join(seq_fixture_small, "*.parquet")))
    table = pa.concat_tables([pq.read_table(p) for p in parts])
    sources = sorted(set(table.column("source").to_pylist()))
    half = set(sources[: len(sources) // 2])
    src_arr = table.column("source").to_numpy(zero_copy_only=False)
    ts_arr = table.column("event_ts").to_numpy().astype("int64")

    b1 = _split_fixture(
        seq_fixture_small, os.path.join(BASE, "p1"),
        lambda ts: ts.astype("int64") < cut_us,
    )
    keep2 = (ts_arr >= cut_us) & pa.array(
        [s in half for s in src_arr]
    ).to_numpy(zero_copy_only=False)
    os.makedirs(os.path.join(BASE, "p2"), exist_ok=True)
    b2 = os.path.join(BASE, "p2", "sequences.parquet")
    pq.write_table(table.filter(pa.array(keep2)), b2)
    keep_all = (ts_arr < cut_us) | keep2
    os.makedirs(os.path.join(BASE, "pall"), exist_ok=True)
    ball = os.path.join(BASE, "pall", "sequences.parquet")
    pq.write_table(table.filter(pa.array(keep_all)), ball)

    cfg = RollupConfig()
    inc_store = os.path.join(BASE, "store_partial")
    full_store = os.path.join(BASE, "store_full3")
    import shutil

    shutil.rmtree(inc_store, ignore_errors=True)
    shutil.rmtree(full_store, ignore_errors=True)
    rollup_build(spark, b1, inc_store, cfg)
    s2 = rollup_build(spark, b2, inc_store, cfg)
    assert "derive_inc" in s2["phases"], s2["phases"]
    rollup_build(spark, ball, full_store, cfg)
    _compare_stores(spark, inc_store, full_store, "partial-batch")


def test_empty_batch_skips_derive_cleanly(spark, tmp_path):
    """An all-filtered (empty) first batch must not crash derive on the
    not-yet-existing rollup store (regression: the store read used to run
    before the empty-touched early return)."""
    import numpy as np
    import datetime as dt

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "tokens": pa.array([], type=pa.list_(pa.int32())),
            "n_tok": pa.array([], type=pa.int32()),
            "source": pa.array([], type=pa.string()),
            "event_ts": pa.array([], type=pa.timestamp("us")),
        }
    )
    p = os.path.join(str(tmp_path), "sequences.parquet")
    pq.write_table(empty, p)
    out = os.path.join(str(tmp_path), "store")
    s = rollup_build(spark, p, out, RollupConfig())
    assert s.get("skipped") is True
    assert s["input_rows"] == 0
