"""Multi-day block spans (RollupConfig.block_span_days).

Coarse tiers hold few buckets per day (1h: 24, 1d: 1), so on LONG-LIVED
sources the default one-day block degenerates to one point per block and
the store pays ~13 B of framing per 3 logical points. Span blocks
amortize that framing across config-chosen whole-day spans. These tests
pin the span path's contracts on a long-lived sparse fixture:

- decoded points are identical to the default layout (the span only
  changes framing, never content);
- span blocks are materially SMALLER on long-lived data (the reason the
  option exists — measured numbers in BENCH/BASELINE.md §block-spans);
- the exactly-incremental path stays byte-identical to a full rebuild
  under spans (the cut reaches back to the span floor, increment.py);
- retention drops a span partition only when its WHOLE span is expired;
- pruned cold reads reach back span-1 days for the lower bound.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tsrollup.codec import decompress_blocks
from tsrollup.config import RollupConfig
from tsrollup.pipeline import BLOCKS_DIR, rollup_build
from tsrollup.storage import drop_expired_partitions
from tsrollup.synth import write_fixture

from .conftest import FIXTURE_DIR

BASE = os.path.join(FIXTURE_DIR, "block_spans")

#: the non-default span map under test: 1m keeps day blocks, coarse
#: tiers span multi-day windows (whole-day multiples)
SPANS = (("1h", 16), ("1d", 128))


@pytest.fixture(scope="module")
def longlived_fixture():
    # rate_scale=0.001 -> 0.0002-0.005 events/min: ~250 rows/source
    # spread over months, the regime where day blocks degenerate to one
    # point per block on the 1h/1d tiers
    return write_fixture(
        os.path.join(BASE, "fx"), 2_000, 8, seed=7, rate_scale=0.001
    )


@pytest.fixture(scope="module")
def stores(spark, longlived_fixture):
    day_store = os.path.join(BASE, "store_day")
    span_store = os.path.join(BASE, "store_span")
    for p in (day_store, span_store):
        shutil.rmtree(p, ignore_errors=True)
    rollup_build(spark, longlived_fixture, day_store, RollupConfig())
    rollup_build(
        spark, longlived_fixture, span_store,
        RollupConfig(block_span_days=SPANS),
    )
    return day_store, span_store


def _blocks_pdf(spark, store):
    return (
        spark.read.parquet(os.path.join(store, BLOCKS_DIR))
        .select("source", "tier", "metric", "block_start", "n_points",
                "ts_dod_blob", "val_xor_blob")
        .toPandas()
    )


def test_span_blocks_decode_identically(spark, stores):
    day_store, span_store = stores
    keys = ["source", "tier", "metric", "bucket_start"]
    out = []
    for store in stores:
        bl = spark.read.parquet(os.path.join(store, BLOCKS_DIR))
        pdf = (
            decompress_blocks(bl)
            .toPandas()
            .sort_values(keys, kind="mergesort")
            .reset_index(drop=True)
        )
        out.append(pdf)
    got, exp = out[1], out[0]
    assert len(got) == len(exp) and len(got) > 0
    for c in got.columns:
        assert got[c].equals(exp[c]), f"decoded column {c} differs"


def test_span_blocks_are_smaller_on_longlived_sources(spark, stores):
    day_store, span_store = stores
    day = _blocks_pdf(spark, day_store)
    span = _blocks_pdf(spark, span_store)

    def nbytes(pdf, tier):
        sel = pdf[pdf.tier == tier]
        return int(
            sel["ts_dod_blob"].map(len).sum() + sel["val_xor_blob"].map(len).sum()
        )

    for tier in ("1h", "1d"):
        b_day, b_span = nbytes(day, tier), nbytes(span, tier)
        # the whole point of the option: materially smaller coarse tiers
        assert b_span < 0.7 * b_day, (tier, b_span, b_day)
        # and the blocks actually merged (fewer rows, >1 point per block)
        assert len(span[span.tier == tier]) < len(day[day.tier == tier])
    # 1m keeps day blocks -> byte-identical rows
    d1, s1 = day[day.tier == "1m"], span[span.tier == "1m"]
    assert len(d1) == len(s1)
    assert sorted(map(bytes, d1["val_xor_blob"])) == sorted(
        map(bytes, s1["val_xor_blob"])
    )


def test_span_incremental_matches_single_shot(spark, longlived_fixture, stores):
    parts = sorted(glob.glob(os.path.join(longlived_fixture, "*.parquet")))
    table = pa.concat_tables([pq.read_table(p) for p in parts])
    ts = table.column("event_ts").to_numpy().astype("int64")
    cut = int(ts.min()) + int((ts.max() - ts.min()) * 2 // 3)

    def write_split(name, keep):
        d = os.path.join(BASE, name)
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, "sequences.parquet")
        pq.write_table(table.filter(pa.array(keep)), out)
        return out

    b1 = write_split("b1", ts < cut)
    b2 = write_split("b2", ts >= cut)
    cfg = RollupConfig(block_span_days=SPANS)
    inc_store = os.path.join(BASE, "store_inc")
    shutil.rmtree(inc_store, ignore_errors=True)
    rollup_build(spark, b1, inc_store, cfg)
    s2 = rollup_build(spark, b2, inc_store, cfg)
    assert "derive_inc" in s2["phases"], s2["phases"]
    # single-shot reference = the module fixture's span store (same cfg,
    # same fixture — one fewer full build in the suite)
    full_store = stores[1]
    keys = ["source", "tier", "metric", "block_start"]
    got = _blocks_pdf(spark, inc_store).sort_values(keys).reset_index(drop=True)
    exp = _blocks_pdf(spark, full_store).sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    assert list(map(bytes, got["val_xor_blob"])) == list(
        map(bytes, exp["val_xor_blob"])
    ), "incremental span blocks differ from single-shot"
    assert list(map(bytes, got["ts_dod_blob"])) == list(
        map(bytes, exp["ts_dod_blob"])
    )


def test_span_retention_whole_span_guard(tmp_path):
    base = str(tmp_path / "blocks")
    for d in ("2024-01-01", "2024-01-17", "2024-02-02"):
        os.makedirs(os.path.join(base, "tier=1h", f"day={d}"))
    # horizon 30 days from 2024-03-01 -> cutoff 2024-01-31. Day blocks
    # would drop the first two dirs; a 16-day span must KEEP day=2024-01-17
    # (its span reaches 2024-02-01, inside the horizon).
    gone = drop_expired_partitions(base, "1h", 30, "2024-03-01", span_days=16)
    assert [os.path.basename(g) for g in gone] == ["day=2024-01-01"]
    assert os.path.isdir(os.path.join(base, "tier=1h", "day=2024-01-17"))


def test_span_read_range_decoded_reaches_back(spark, stores):
    from tsrollup.query import read_range_decoded

    _, span_store = stores
    bl = spark.read.parquet(os.path.join(span_store, BLOCKS_DIR))
    row = (
        bl.where("tier = '1d' AND n_points > 1")
        .select("block_start")
        .orderBy("block_start")
        .first()
    )
    assert row is not None, "fixture produced no multi-point 1d span block"
    # a range starting WELL past the block's day= value but inside its
    # span: day-granularity pruning would skip the partition entirely
    start = row["block_start"] + __import__("datetime").timedelta(days=40)
    end = start + __import__("datetime").timedelta(days=200)
    got = read_range_decoded(
        spark, span_store, start, end, metric="cnt",
        block_span_days=dict(SPANS),
    )
    missed = read_range_decoded(spark, span_store, start, end, metric="cnt")
    assert got.count() >= missed.count()
    # the decoded OBSERVED points agree with the columnar 1d tier over the
    # range (blocks also carry the gap-filled spine's cnt=0 slots, which
    # the raw columnar sink does not materialize)
    roll = (
        spark.read.parquet(os.path.join(span_store, "rollup"))
        .where("tier = '1d'")
        .where((F.col("bucket_start") >= F.lit(start)) & (F.col("bucket_start") < F.lit(end)))
    )
    assert got.where("value > 0").count() == roll.count(), (
        got.where("value > 0").count(), roll.count(),
    )
