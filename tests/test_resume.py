"""Resume / lineage / retention tests (SURVEY.md §5.4d, §2.9, R1):
incremental runs converge to the single-shot result byte-exactly, a crash
between output-write and ledger-commit is repaired idempotently, and
retention prunes expired partitions."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from tsrollup.config import RollupConfig
from tsrollup.pipeline import ROLLUP_DIR, SCORES_DIR, rollup_build
from tsrollup.resume import LEDGER_DIRNAME

from .conftest import assert_frame_byte_equal, normalize_ts

BASE = "/tmp/tsrollup_resume_test"


@pytest.fixture(scope="module")
def split_inputs(seq_fixture_small):
    """Split the fixture at a day boundary (units are (source_bucket, day),
    so a mid-day split would leave half-complete committed units)."""
    import pyarrow.compute as pc

    t = pq.read_table(seq_fixture_small)
    days = pc.cast(t["event_ts"], "date32")
    uniq = sorted(set(days.to_pylist()))
    cut = uniq[len(uniq) // 2]
    first = t.filter(pc.less(days, cut))
    assert 0 < first.num_rows < t.num_rows
    os.makedirs(BASE, exist_ok=True)
    p1 = os.path.join(BASE, "input_first.parquet")
    pq.write_table(first, p1)
    return p1, seq_fixture_small


def _read_sorted(spark, path, keys):
    df = normalize_ts(spark.read.parquet(path).toPandas(), ("bucket_start",))
    drop = [c for c in ("day", "source_bucket") if c in df.columns]
    return df.drop(columns=drop)


def test_incremental_equals_single_shot(spark, split_inputs):
    first, full = split_inputs
    out_incr = os.path.join(BASE, "incr")
    out_full = os.path.join(BASE, "full")
    shutil.rmtree(out_incr, ignore_errors=True)
    shutil.rmtree(out_full, ignore_errors=True)
    cfg = RollupConfig()

    s1 = rollup_build(spark, first, out_incr, cfg, run_id="r1")
    assert s1["pending_units"] > 0
    s2 = rollup_build(spark, full, out_incr, cfg, run_id="r2")
    assert 0 < s2["pending_units"]
    # resume skipped the committed units: second run saw only the new rows
    assert s2["input_rows"] < s1["input_rows"] + s2["input_rows"]

    s3 = rollup_build(spark, full, out_full, cfg, run_id="r3")
    assert s3["input_rows"] == s1["input_rows"] + s2["input_rows"]

    keys = ["tier", "source", "bucket_start"]
    a = _read_sorted(spark, os.path.join(out_incr, ROLLUP_DIR), keys)
    e = _read_sorted(spark, os.path.join(out_full, ROLLUP_DIR), keys)
    assert_frame_byte_equal(a, e, keys, msg="incremental rollup store")

    ka = ["tier", "source", "detector", "bucket_start"]
    a = _read_sorted(spark, os.path.join(out_incr, SCORES_DIR), ka)
    e = _read_sorted(spark, os.path.join(out_full, SCORES_DIR), ka)
    assert_frame_byte_equal(a, e, ka, msg="incremental scores")

    # incremental derive() covered only the touched buckets on run 2, yet
    # blocks and residual stats must equal the full single-shot recompute
    from tsrollup.pipeline import BLOCKS_DIR, STATS_DIR

    kb = ["tier", "source", "metric", "block_start"]
    a = normalize_ts(spark.read.parquet(os.path.join(out_incr, BLOCKS_DIR)).toPandas(), ("block_start",))
    e = normalize_ts(spark.read.parquet(os.path.join(out_full, BLOCKS_DIR)).toPandas(), ("block_start",))
    drop = [c for c in ("day", "source_bucket") if c in a.columns]
    assert_frame_byte_equal(a.drop(columns=drop), e.drop(columns=drop), kb, msg="incremental blocks")

    ks = ["tier", "source", "detector"]
    a = _read_sorted(spark, os.path.join(out_incr, STATS_DIR), ks)
    e = _read_sorted(spark, os.path.join(out_full, STATS_DIR), ks)
    assert_frame_byte_equal(a, e, ks, msg="incremental residual stats")


def test_noop_rerun_skips_everything(spark, split_inputs):
    _first, full = split_inputs
    out_full = os.path.join(BASE, "full")  # built by previous test
    s = rollup_build(spark, full, out_full, RollupConfig(), run_id="r4", derived=False)
    assert s["pending_units"] == 0
    assert s.get("skipped") is True


def test_crash_between_write_and_commit_is_repaired(spark, split_inputs):
    first, _full = split_inputs
    out = os.path.join(BASE, "crash")
    ref = os.path.join(BASE, "crashref")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ref, ignore_errors=True)
    cfg = RollupConfig()

    # "crash": outputs written, then ledger commit lost
    rollup_build(spark, first, out, cfg, run_id="c1", derived=False)
    for f in glob.glob(os.path.join(out, LEDGER_DIRNAME, "*.parquet")):
        os.remove(f)
    # rerun repairs by overwriting the unledgered units' partitions
    s = rollup_build(spark, first, out, cfg, run_id="c2", derived=False)
    assert s["pending_units"] > 0

    rollup_build(spark, first, ref, cfg, run_id="c3", derived=False)
    keys = ["tier", "source", "bucket_start"]
    a = _read_sorted(spark, os.path.join(out, ROLLUP_DIR), keys)
    e = _read_sorted(spark, os.path.join(ref, ROLLUP_DIR), keys)
    assert_frame_byte_equal(a, e, keys, msg="crash-repaired store")
    # ledger holds exactly one commit per unit
    led = pq.read_table(os.path.join(out, LEDGER_DIRNAME)).to_pandas()
    assert led["unit_id"].is_unique


def test_ledger_token_checksum_present(spark, split_inputs):
    out_full = os.path.join(BASE, "full")
    led = pq.read_table(os.path.join(out_full, LEDGER_DIRNAME)).to_pandas()
    assert (led["input_rows"] > 0).all()
    assert (led["token_checksum"] != 0).all()
    assert (led[["out_rows_1m", "out_rows_1h", "out_rows_1d"]].sum(axis=1) > 0).all()


def test_invalidate_units_enables_backfill_reroll(spark, split_inputs):
    """Late-data reconciliation: tombstone a committed unit, re-run, and the
    unit is re-rolled; the re-commit supersedes the tombstone; skipped-row
    accounting reports what the anti-join dropped."""
    from tsrollup.resume import completed_unit_ids, invalidate_units

    first, _full = split_inputs
    out = os.path.join(BASE, "reroll")
    shutil.rmtree(out, ignore_errors=True)
    cfg = RollupConfig()

    s1 = rollup_build(spark, first, out, cfg, run_id="v1", derived=False)
    done1 = {r["unit_id"] for r in completed_unit_ids(spark, out).collect()}
    assert len(done1) == s1["pending_units"]

    # no-op rerun: everything already committed, accounted for explicitly
    s2 = rollup_build(spark, first, out, cfg, run_id="v2", derived=False)
    assert s2["pending_units"] == 0
    assert s2["rows_skipped_committed"] == s1["input_rows"]

    # tombstone two units -> they become pending again
    victims = sorted(done1)[:2]
    invalidate_units(out, victims)
    done2 = {r["unit_id"] for r in completed_unit_ids(spark, out).collect()}
    assert done2 == done1 - set(victims)

    # re-run re-rolls exactly the tombstoned units; commit supersedes
    s3 = rollup_build(spark, first, out, cfg, run_id="v3", derived=False)
    assert s3["pending_units"] == len(victims)
    assert s3["rows_skipped_committed"] + s3["input_rows"] == s1["input_rows"]
    done3 = {r["unit_id"] for r in completed_unit_ids(spark, out).collect()}
    assert done3 == done1

    # store byte-equal to an uninterrupted build
    ref = os.path.join(BASE, "rerollref")
    shutil.rmtree(ref, ignore_errors=True)
    rollup_build(spark, first, ref, cfg, run_id="v4", derived=False)
    keys = ["tier", "source", "bucket_start"]
    a = _read_sorted(spark, os.path.join(out, ROLLUP_DIR), keys)
    e = _read_sorted(spark, os.path.join(ref, ROLLUP_DIR), keys)
    assert_frame_byte_equal(a, e, keys, msg="post-reroll store")


def test_incremental_derive_leaves_untouched_buckets_alone(spark, split_inputs):
    """derive(touched_buckets=[b]) must rewrite ONLY bucket b's derived
    partitions — untouched buckets' files stay byte-for-byte (mtime) intact,
    which is what makes the derived wall proportional to the batch."""
    import time

    from tsrollup.pipeline import derive

    first, _full = split_inputs
    out = os.path.join(BASE, "derivetouch")
    shutil.rmtree(out, ignore_errors=True)
    cfg = RollupConfig()
    rollup_build(spark, first, out, cfg, run_id="d1")

    scores_dir = os.path.join(out, SCORES_DIR)
    buckets = sorted(
        {
            int(p.split("=")[1])
            for tier_d in os.listdir(scores_dir)
            if tier_d.startswith("tier=")
            for day_d in os.listdir(os.path.join(scores_dir, tier_d))
            if day_d.startswith("day=")
            for p in os.listdir(os.path.join(scores_dir, tier_d, day_d))
            if p.startswith("source_bucket=")
        }
    )
    assert len(buckets) >= 2
    victim, kept = buckets[0], buckets[1]

    def _mtimes(bucket):
        out_m = {}
        for root, _dirs, files in os.walk(scores_dir):
            if f"source_bucket={bucket}" in root:
                for f in files:
                    p = os.path.join(root, f)
                    out_m[p] = os.stat(p).st_mtime_ns
        return out_m

    before_kept = _mtimes(kept)
    before_victim = _mtimes(victim)
    time.sleep(0.05)
    derive(spark, out, cfg, touched_buckets=[victim])
    assert _mtimes(kept) == before_kept, "untouched bucket was rewritten"
    assert _mtimes(victim) != before_victim, "touched bucket was not rewritten"


def test_retention_prunes_expired_partitions(spark, split_inputs):
    from tsrollup.storage import drop_expired_partitions

    out_full = os.path.join(BASE, "full")
    rollup_path = os.path.join(out_full, ROLLUP_DIR)
    days = sorted(
        d.split("=")[1] for d in os.listdir(os.path.join(rollup_path, "tier=1m")) if d.startswith("day=")
    )
    assert len(days) >= 2
    # horizon chosen so the earliest day expires relative to the latest
    import datetime as dt

    span = (dt.date.fromisoformat(days[-1]) - dt.date.fromisoformat(days[0])).days
    removed = drop_expired_partitions(rollup_path, "1m", horizon_days=span - 1, now_day=days[-1])
    assert any(f"day={days[0]}" in r for r in removed)
    left = [d for d in os.listdir(os.path.join(rollup_path, "tier=1m")) if d.startswith("day=")]
    assert f"day={days[0]}" not in left
    # coarser tiers untouched
    assert os.path.isdir(os.path.join(rollup_path, "tier=1d"))


def test_compact_store_preserves_content(spark, seq_fixture_small, tmp_path):
    """Compaction changes the FILE layout and nothing else: frame
    byte-equal before/after, every leaf ends single-file, a second pass
    is a no-op, and crash leftovers (.__compact_* dirs) are skipped."""
    import os

    from pyspark.sql import functions as F

    from tsrollup.config import RollupConfig
    from tsrollup.pipeline import ROLLUP_DIR, rollup_build
    from tsrollup.storage import compact_store, read_sequences

    out = str(tmp_path / "store")
    rollup_build(spark, seq_fixture_small, out, RollupConfig(), derived=False)
    rollup_path = os.path.join(out, ROLLUP_DIR)
    frag = os.path.join(out, "frag")
    rolled = spark.read.parquet(rollup_path)
    (
        rolled.repartition(6, F.xxhash64("source", "bucket_start"))
        .write.mode("overwrite").partitionBy("tier", "day").parquet(frag)
    )

    def snapshot():
        return (
            spark.read.parquet(frag)
            .toPandas()
            .sort_values(["tier", "day", "source", "bucket_start"], kind="mergesort")
            .reset_index(drop=True)
        )

    def leaf_files():
        counts = {}
        for root, _dirs, files in os.walk(frag):
            pq = [f for f in files if f.endswith(".parquet")]
            if pq:
                counts[root] = len(pq)
        return counts

    before = snapshot()
    assert any(n > 1 for n in leaf_files().values()), "fixture must fragment"
    done = compact_store(spark, out, "frag", target_files=1)
    assert done
    assert all(n == 1 for n in leaf_files().values())
    after = snapshot()
    assert before.equals(after), "compaction must not change content"
    # idempotent: nothing left to compact
    assert compact_store(spark, out, "frag", target_files=1) == []
    # crash leftovers are skipped, not recursed into (hidden dot dirs:
    # Spark's reader must also keep ignoring them)
    some_leaf = next(iter(leaf_files()))
    parent, leafname = os.path.split(some_leaf)
    leftover = os.path.join(parent, f".{leafname}.__compact_old")
    os.makedirs(leftover, exist_ok=True)
    with open(os.path.join(leftover, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert compact_store(spark, out, "frag", target_files=1) == []
    assert snapshot().equals(after)


def test_vacuum_store_gc_and_crash_recovery(spark, seq_fixture_small, tmp_path):
    """vacuum_store removes completed-swap orphans and stale tmps,
    RESTORES a leaf whose swap crashed between the renames (old present,
    leaf missing), drops empty dirs, is idempotent, and the store's
    content afterwards equals the pre-crash content exactly."""
    import os
    import shutil

    from tsrollup.config import RollupConfig
    from tsrollup.pipeline import ROLLUP_DIR, rollup_build
    from tsrollup.storage import vacuum_store

    out = str(tmp_path / "store")
    rollup_build(spark, seq_fixture_small, out, RollupConfig(), derived=False)
    rollup_path = os.path.join(out, ROLLUP_DIR)

    def snapshot():
        return (
            spark.read.parquet(rollup_path)
            .toPandas()
            .sort_values(
                ["tier", "day", "source", "bucket_start"], kind="mergesort"
            )
            .reset_index(drop=True)
        )

    before = snapshot()
    leaves = sorted(
        root
        for root, _d, files in os.walk(rollup_path)
        if any(f.endswith(".parquet") for f in files)
    )
    assert len(leaves) >= 3

    # (a) completed swap left its old copy behind
    p0, l0 = os.path.split(leaves[0])
    orphan_old = os.path.join(p0, f".{l0}.__compact_old")
    shutil.copytree(leaves[0], orphan_old)
    # (b) crashed swap: leaf renamed away, new copy never moved in
    p1, l1 = os.path.split(leaves[1])
    os.rename(leaves[1], os.path.join(p1, f".{l1}.__delete_old"))
    # (c) stale tmp from an aborted rewrite
    p2, l2 = os.path.split(leaves[2])
    stale_tmp = os.path.join(p2, f".{l2}.__delete_tmp")
    shutil.copytree(leaves[2], stale_tmp)
    # (d) empty dangling partition dir
    empty = os.path.join(rollup_path, "tier=1m", "day=1999-01-01")
    os.makedirs(empty)

    done = vacuum_store(out, ROLLUP_DIR)
    by_action = {}
    for d in done:
        by_action.setdefault(d["action"], []).append(d["path"])
    assert by_action["restored"] == [leaves[1]]
    assert sorted(by_action["removed"]) == sorted([orphan_old, stale_tmp])
    assert by_action["removed_empty"] == [empty]
    assert os.path.isdir(leaves[1]) and not os.path.exists(orphan_old)
    assert not os.path.exists(stale_tmp) and not os.path.exists(empty)

    # content identical to pre-crash; second pass is a no-op
    assert snapshot().equals(before)
    assert vacuum_store(out, ROLLUP_DIR) == []
    # missing sink is a clean no-op
    assert vacuum_store(out, "no_such_sink") == []


def test_time_travel_asof_reconstructs_snapshot(spark, split_inputs):
    """read_rollup_asof(seq=1) == the store a reader saw after build 1,
    byte-for-byte; asof the latest seq == the current store; the strict
    guard raises once a visible unit is re-rolled after the snapshot,
    while strict=False serves the rows WITH rewritten_since flags."""
    import pytest as _pytest

    from tsrollup.resume import invalidate_units, read_rollup_asof

    first, full = split_inputs
    out = os.path.join(BASE, "asof")
    snap1 = os.path.join(BASE, "asof_snap1")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(snap1, ignore_errors=True)
    cfg = RollupConfig()
    rollup_build(spark, first, out, cfg, run_id="r1", derived=False)
    # independent copy of the post-build-1 store = the expected snapshot
    shutil.copytree(out, snap1)
    rollup_build(spark, full, out, cfg, run_id="r2", derived=False)

    keys = ["tier", "source", "bucket_start"]
    got = read_rollup_asof(spark, out, ROLLUP_DIR, seq=1).drop(
        "day", "source_bucket"
    )
    exp = spark.read.parquet(os.path.join(snap1, ROLLUP_DIR))
    a = normalize_ts(got.toPandas(), ("bucket_start",))
    e = normalize_ts(exp.drop("day", "source_bucket").toPandas(), ("bucket_start",))
    assert_frame_byte_equal(
        a.sort_values(keys, kind="mergesort").reset_index(drop=True),
        e.sort_values(keys, kind="mergesort").reset_index(drop=True),
        keys, msg="asof seq 1 vs physical snapshot",
    )

    # asof the current seq == the current store
    cur = read_rollup_asof(spark, out, ROLLUP_DIR, seq=2)
    assert cur.count() == spark.read.parquet(os.path.join(out, ROLLUP_DIR)).count()

    # re-roll one of snapshot 1's units -> its historical bytes are gone:
    # strict raises, non-strict flags
    unit = got.selectExpr(
        "concat_ws('/', cast(pmod(xxhash64(source), 64) as int), "
        "cast(to_date(bucket_start) as string)) AS u"
    ).limit(1).collect()[0]["u"]
    from tsrollup.storage import n_source_buckets
    assert n_source_buckets() == 64  # keep the inline unit recovery honest
    invalidate_units(out, [unit])          # seq 3 tombstone
    rollup_build(spark, full, out, cfg, run_id="r3", derived=False)  # seq 4
    with _pytest.raises(RuntimeError, match="rewritten after seq 1"):
        read_rollup_asof(spark, out, ROLLUP_DIR, seq=1).count()
    flagged = read_rollup_asof(spark, out, ROLLUP_DIR, seq=1, strict=False)
    assert "rewritten_since" in flagged.columns
    assert flagged.where("rewritten_since").count() > 0
    assert flagged.count() == len(a)  # same membership, newer bytes flagged

    # no ledger at all -> clean error
    with _pytest.raises(ValueError, match="no ledger"):
        read_rollup_asof(spark, os.path.join(BASE, "nowhere"), ROLLUP_DIR, 1)
