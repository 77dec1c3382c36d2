"""Streamed-rollup ingestion (tsrollup/ingest.py).

Contract: after ingesting drains 1..k, the store (rollup tiers AND the
derived tables) is byte-identical to `rollup_build` over exactly the raw
rows of the finalized buckets — including 1h/1d buckets that STRADDLE a
drain boundary (re-cascaded from the store's complete 1m tier), and with
the second ingest's derived phase running incrementally off the state
checkpoint where sources are pure appends.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tsrollup.config import RollupConfig
from tsrollup.ingest import ingest_streamed_rollup
from tsrollup.pipeline import (
    BLOCKS_DIR,
    ROLLUP_DIR,
    SCORES_DIR,
    STATS_DIR,
    rollup_build,
)
from tsrollup.storage import read_sequences
from tsrollup.streaming import run_streaming_rollup

from .conftest import FIXTURE_DIR, assert_frame_byte_equal

BASE = os.path.join(FIXTURE_DIR, "ingest")


def _compare(spark, got_base, exp_base, msg):
    for sub, keys in (
        (ROLLUP_DIR, ["tier", "source", "bucket_start"]),
        (SCORES_DIR, ["source", "tier", "detector", "bucket_start"]),
        (STATS_DIR, ["source", "tier", "detector"]),
        (BLOCKS_DIR, ["source", "tier", "metric", "block_start"]),
    ):
        got = spark.read.parquet(os.path.join(got_base, sub)).toPandas()
        exp = spark.read.parquet(os.path.join(exp_base, sub)).toPandas()
        for df in (got, exp):
            for c in ("tier", "source_bucket", "day"):
                if c in df:
                    df[c] = df[c].astype(str)
        assert_frame_byte_equal(got, exp, keys, msg=f"{msg}:{sub}")


def _finalized_subset(spark, seq_path, sink, out_path):
    """Raw rows whose 1m bucket was emitted by the drain(s) so far."""
    drained = (
        spark.read.parquet(sink).select("source", "bucket_start").distinct()
    )
    raw = read_sequences(spark, seq_path)
    sub = raw.withColumn(
        "bucket_start", F.date_trunc("minute", "event_ts")
    ).join(F.broadcast(drained), ["source", "bucket_start"], "left_semi").drop(
        "bucket_start"
    )
    shutil.rmtree(out_path, ignore_errors=True)
    sub.write.parquet(out_path)
    return out_path


@pytest.mark.filterwarnings("ignore::ResourceWarning")
def test_ingest_drains_equals_batch_build(spark, seq_fixture_small):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    cfg = RollupConfig()

    # stream input fed as TIME-ORDERED slices (a bucket's rows must not be
    # scattered across drains ahead of the watermark): 6 slices, two
    # drains of 3. Buckets straddling the drain boundary stay un-finalized
    # (within the watermark) and are emitted complete by the next drain.
    parts_dir = os.path.join(BASE, "stream_in")
    os.makedirs(parts_dir)
    import pyarrow.parquet as pq

    fx_parts = (
        sorted(glob.glob(os.path.join(seq_fixture_small, "*.parquet")))
        if os.path.isdir(seq_fixture_small)
        else [seq_fixture_small]
    )
    import pyarrow as pa

    raw_t = pa.concat_tables([pq.read_table(p) for p in fx_parts])
    raw_t = raw_t.sort_by("event_ts")
    step = (raw_t.num_rows + 5) // 6
    for i in range(6):
        pq.write_table(
            raw_t.slice(i * step, step),
            os.path.join(parts_dir, f"part-{i:05d}.parquet"),
        )
    files = sorted(glob.glob(os.path.join(parts_dir, "part-*.parquet")))
    assert len(files) == 6
    feed = os.path.join(BASE, "feed")
    os.makedirs(feed)
    sink = os.path.join(BASE, "sink")
    ckpt = os.path.join(BASE, "ckpt")
    store = os.path.join(BASE, "store")

    # ---- drain 1 (first 3 files) and ingest
    for f in files[:3]:
        shutil.copy(f, os.path.join(feed, os.path.basename(f)))
    run_streaming_rollup(spark, feed, sink, ckpt)
    sink_files_1 = set(glob.glob(os.path.join(sink, "part-*")))
    assert sink_files_1, "drain 1 emitted nothing"
    s1 = ingest_streamed_rollup(
        spark, spark.read.parquet(*sorted(sink_files_1)), store, cfg
    )
    assert s1["ingested_1m"] > 0

    exp1 = os.path.join(BASE, "exp1")
    sub1 = _finalized_subset(spark, seq_fixture_small, sink, os.path.join(BASE, "sub1"))
    rollup_build(spark, sub1, exp1, cfg)
    _compare(spark, store, exp1, "after drain 1")

    # ---- drain 2 (remaining files) and ingest only the NEW sink rows
    for f in files[3:]:
        shutil.copy(f, os.path.join(feed, os.path.basename(f)))
    run_streaming_rollup(spark, feed, sink, ckpt)
    new_files = sorted(set(glob.glob(os.path.join(sink, "part-*"))) - sink_files_1)
    assert new_files, "drain 2 emitted nothing new"
    s2 = ingest_streamed_rollup(spark, spark.read.parquet(*new_files), store, cfg)
    assert s2["ingested_1m"] > 0
    # second ingest runs the derived phase off the state checkpoint
    assert "derive_inc" in s2["phases"], s2["phases"]

    exp2 = os.path.join(BASE, "exp2")
    sub2 = _finalized_subset(spark, seq_fixture_small, sink, os.path.join(BASE, "sub2"))
    rollup_build(spark, sub2, exp2, cfg)
    _compare(spark, store, exp2, "after drain 2")

    # ---- idempotence layer (a): replaying an already-committed drain is
    # a marker-skip no-op
    s2b = ingest_streamed_rollup(spark, spark.read.parquet(*new_files), store, cfg)
    assert s2b.get("skipped_duplicate"), s2b
    _compare(spark, store, exp2, "after duplicate replay")

    # ---- idempotence layer (b): crash-retry — marker lost (crash between
    # the 1m commit and the marker write), full re-ingest must CONVERGE
    # (key-replacing 1m write + store-side re-cascade), not double-count
    markers = glob.glob(os.path.join(store, "_ingested", "*.marker"))
    assert len(markers) == 2, markers  # one per committed drain
    for m in markers:
        os.remove(m)
    s2c = ingest_streamed_rollup(spark, spark.read.parquet(*new_files), store, cfg)
    assert not s2c.get("skipped_duplicate"), s2c
    assert s2c["ingested_1m"] == s2["ingested_1m"]
    _compare(spark, store, exp2, "after crash-retry replay")
