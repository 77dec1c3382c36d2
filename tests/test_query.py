"""Read-side planner (tsrollup/query.py): tier choice, retention fallback,
and — the part that matters at 10^12 rows — partition pruning that is
visible in the physical plan, not just assumed.
"""

import os

import pytest
from pyspark.sql import functions as F

from tsrollup.config import RollupConfig
from tsrollup.pipeline import ROLLUP_DIR, rollup_build
from tsrollup.query import choose_tier, read_range


# ------------------------------------------------------------- choose_tier

def test_choose_tier_resolution():
    # coarsest tier whose bucket fits the requested resolution
    assert choose_tier("2024-01-01", "2024-01-02", resolution_s=60) == "1m"
    assert choose_tier("2024-01-01", "2024-01-02", resolution_s=3600) == "1h"
    assert choose_tier("2024-01-01", "2024-01-02", resolution_s=7200) == "1h"
    assert choose_tier("2024-01-01", "2024-01-02", resolution_s=86400) == "1d"
    assert choose_tier("2024-01-01", "2024-01-02", resolution_s=None) == "1d"


def test_choose_tier_retention_fallback():
    # 1m retains 14d, 1h 90d (config.TIER_RETENTION_DAYS): a 60s-resolution
    # ask for data 30 days back can't be served by 1m anymore — and the
    # planner must refuse rather than silently serve coarser-than-asked.
    with pytest.raises(ValueError):
        choose_tier("2024-01-01", "2024-01-02", resolution_s=60, now_day="2024-01-31")
    # without a resolution cap it falls through to a retained coarser tier
    assert (
        choose_tier("2024-01-01", "2024-01-02", resolution_s=3600, now_day="2024-01-31")
        == "1h"
    )
    # past every finite horizon only the keep-forever tier survives
    assert (
        choose_tier("2020-01-01", "2020-01-02", now_day="2024-01-31") == "1d"
    )


def test_choose_tier_rejects_inverted_range():
    with pytest.raises(ValueError):
        choose_tier("2024-01-02", "2024-01-01")


# --------------------------------------------------------------- read_range

@pytest.fixture(scope="module")
def store(spark, seq_fixture_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("query_store"))
    rollup_build(spark, seq_fixture_small, out, RollupConfig(), derived=False)
    return out


def test_read_range_matches_direct_filter(spark, store):
    roll = spark.read.parquet(os.path.join(store, ROLLUP_DIR))
    days = sorted(
        r["day"].isoformat()
        for r in roll.where("tier = '1m'").select("day").distinct().collect()
    )
    assert len(days) >= 2, "fixture should span multiple days"
    start, end = f"{days[-1]}T00:00:00", f"{days[-1]}T23:59:59"

    got = read_range(spark, store, start, end, resolution_s=60)
    exp = roll.where(
        (F.col("tier") == "1m")
        & (F.col("bucket_start") >= F.lit(start.replace("T", " ")))
        & (F.col("bucket_start") < F.lit(end.replace("T", " ")))
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_read_range_prunes_partitions_in_plan(spark, store):
    days = sorted(
        r["day"].isoformat()
        for r in spark.read.parquet(os.path.join(store, ROLLUP_DIR))
        .where("tier = '1m'").select("day").distinct().collect()
    )
    one_day = read_range(
        spark, store, f"{days[-1]}T00:00:00", f"{days[-1]}T12:00:00", resolution_s=60
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition predicates on tier AND day must reach the scan node
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "tier" in pf and "day" in pf, pf
    # and the row predicate on bucket_start must be pushed to parquet
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "bucket_start" in pushed, pushed


def test_read_range_source_filter(spark, store):
    roll = spark.read.parquet(os.path.join(store, ROLLUP_DIR))
    src = roll.select("source").first()["source"]
    lo = roll.where("tier='1d'").agg(F.min("bucket_start")).first()[0]
    hi = roll.where("tier='1d'").agg(F.max("bucket_start")).first()[0]
    got = read_range(
        spark, store, lo.isoformat(), (hi.replace(hour=23, minute=59)).isoformat(),
        resolution_s=86400, sources=[src],
    )
    assert got.select("source").distinct().collect() == [(src,)]
    assert set(r["tier"] for r in got.select("tier").distinct().collect()) == {"1d"}


# ---------------------------------------------------- compressed-store read

@pytest.fixture(scope="module")
def store_derived(spark, seq_fixture_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("query_store_derived"))
    rollup_build(spark, seq_fixture_small, out, RollupConfig())
    return out


def test_read_range_decoded_matches_filled_tier(spark, store_derived):
    """Cold-read path: decoded block points byte-match the gap-filled tier
    over the same range (the blobs ARE the tier, compressed)."""
    from tsrollup.gapfill import gapfill
    from tsrollup.query import read_range_decoded
    from tsrollup.rollup import ROLLUP_COLS

    from .conftest import assert_frame_byte_equal

    roll = spark.read.parquet(os.path.join(store_derived, ROLLUP_DIR))
    days = sorted(
        r["day"].isoformat()
        for r in roll.where("tier = '1h'").select("day").distinct().collect()
    )
    lo, hi = f"{days[0]}T00:00:00", f"{days[-1]}T23:59:59"
    got = (
        read_range_decoded(
            spark, store_derived, lo, hi, metric="n_tok_mean", resolution_s=3600
        )
        .select("source", "bucket_start", "value")
        .toPandas()
    )
    assert set(
        r["tier"] for r in read_range_decoded(
            spark, store_derived, lo, hi, resolution_s=3600
        ).select("tier").distinct().collect()
    ) == {"1h"}
    filled = gapfill(
        roll.where("tier = '1h'").select(*ROLLUP_COLS), "1h", RollupConfig()
    )
    import datetime as dt

    exp = (
        filled.where(
            (F.col("bucket_start") >= F.lit(dt.datetime.fromisoformat(lo)))
            & (F.col("bucket_start") < F.lit(dt.datetime.fromisoformat(hi)))
        )
        .select("source", "bucket_start", F.col("n_tok_mean").cast("double").alias("value"))
        .toPandas()
    )
    assert len(got) > 0
    assert_frame_byte_equal(got, exp, ["source", "bucket_start"], msg="decoded vs filled")


def test_read_range_decoded_prunes_block_partitions(spark, store_derived):
    from tsrollup.query import read_range_decoded

    days = sorted(
        r["day"].isoformat()
        for r in spark.read.parquet(os.path.join(store_derived, "blocks"))
        .where("tier = '1m'").select("day").distinct().collect()
    )
    dec = read_range_decoded(
        spark, store_derived, f"{days[-1]}T00:00:00", f"{days[-1]}T12:00:00",
        resolution_s=60,
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "tier" in pf and "day" in pf, pf


def test_cold_read_survives_columnar_retention(spark, store_derived, tmp_path):
    """The blocks horizon outlives the columnar rollup/scores horizons:
    after retain_store expires a day's rollup+scores partitions, the same
    range is still served - value-exact - by read_range_decoded."""
    import shutil

    from tsrollup.query import read_range_decoded
    from tsrollup.storage import retain_store

    # private copy: store_derived is module-shared
    out = os.path.join(str(tmp_path), "store")
    shutil.copytree(store_derived, out)
    days = sorted(
        d.split("=")[1]
        for d in os.listdir(os.path.join(out, "rollup", "tier=1m"))
        if d.startswith("day=")
    )
    assert len(days) >= 2
    victim, now_day = days[0], days[-1]
    span = (
        __import__("datetime").date.fromisoformat(now_day)
        - __import__("datetime").date.fromisoformat(victim)
    ).days
    before = read_range_decoded(
        spark, out, f"{victim}T00:00:00", f"{victim}T23:59:59", resolution_s=60
    ).toPandas()

    removed = retain_store(
        out, now_day,
        {"rollup": {"1m": span - 1}, "scores": {"1m": span - 1},
         "blocks": {"1m": None}},
    )
    assert any(f"day={victim}" in r for r in removed["rollup"]), removed
    assert any(f"day={victim}" in r for r in removed["scores"]), removed
    assert removed["blocks"] == []
    assert not os.path.isdir(os.path.join(out, "rollup", "tier=1m", f"day={victim}"))

    after = read_range_decoded(
        spark, out, f"{victim}T00:00:00", f"{victim}T23:59:59", resolution_s=60
    ).toPandas()
    assert len(after) == len(before) > 0
    from .conftest import assert_frame_byte_equal

    assert_frame_byte_equal(
        after, before, ["source", "metric", "bucket_start"], msg="cold read post-retention",
    )

    # Retention-AWARE cold read (now_day set): the planner must follow the
    # BLOCK store's horizons, not the columnar tier's — under the columnar
    # policy the 1m tier looks expired (choose_tier raises), but the same
    # range decodes fine because read_range_decoded defaults to the blocks
    # policy for tier choice.
    with pytest.raises(ValueError, match="no retained tier"):
        choose_tier(
            f"{victim}T00:00:00", f"{victim}T23:59:59", 60, now_day,
            {"1m": span - 1},
        )
    aware = read_range_decoded(
        spark, out, f"{victim}T00:00:00", f"{victim}T23:59:59",
        resolution_s=60, now_day=now_day, retention={"1m": None},
    ).toPandas()
    assert_frame_byte_equal(
        aware, before, ["source", "metric", "bucket_start"],
        msg="retention-aware cold read",
    )


def test_targeted_delete_rewrites_only_affected_leaves(spark, tmp_path):
    """Purge by predicate: matched rows gone, untouched partitions keep
    their files byte-identical (never rewritten), a second pass is a
    no-op, and counts verify per leaf."""
    import os

    import pandas as pd

    from tsrollup.storage import targeted_delete

    base = str(tmp_path)
    sink = "tbl"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": list(range(100)),
                "grp": ["a"] * 50 + ["b"] * 50,
            }
        )
    )
    df.write.partitionBy("grp").parquet(os.path.join(base, sink))
    b_leaf = os.path.join(base, sink, "grp=b")
    b_files = {
        f: os.path.getmtime(os.path.join(b_leaf, f))
        for f in os.listdir(b_leaf)
        if f.endswith(".parquet")
    }

    done = targeted_delete(spark, base, sink, "k % 10 = 3 AND k < 50")
    assert len(done) == 1 and done[0]["deleted"] == 5
    left = spark.read.parquet(os.path.join(base, sink))
    assert left.count() == 95
    assert left.where("k % 10 = 3 AND k < 50").count() == 0
    # grp=b leaf untouched: same files, same mtimes
    b_now = {
        f: os.path.getmtime(os.path.join(b_leaf, f))
        for f in os.listdir(b_leaf)
        if f.endswith(".parquet")
    }
    assert b_now == b_files
    # idempotent: second pass finds nothing
    assert targeted_delete(spark, base, sink, "k % 10 = 3 AND k < 50") == []


def test_targeted_delete_null_predicate_rows_retained(spark, tmp_path):
    """ADVICE regression: a delete predicate over a nullable column
    evaluates to NULL on NULL rows — those rows are RETAINED (not
    deleted, not miscounted), so the per-leaf verify arithmetic holds."""
    import os

    import pandas as pd

    from tsrollup.storage import targeted_delete

    base = str(tmp_path)
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4, None, None], "grp": ["a"] * 6})
    )
    df.write.partitionBy("grp").parquet(os.path.join(base, "tbl"))
    done = targeted_delete(spark, base, "tbl", "k <= 2")
    assert len(done) == 1 and done[0]["deleted"] == 2
    left = spark.read.parquet(os.path.join(base, "tbl"))
    assert left.count() == 4
    assert left.where("k IS NULL").count() == 2, "NULL-predicate rows kept"
