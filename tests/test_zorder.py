"""zorder: Morton interleave matches a bit-by-bit python reference, and
the whole point — a z-ordered layout's zone maps prune 2-D box queries
in BOTH dimensions where a 1-D sort layout prunes only one."""

import pytest
from pyspark.sql import functions as F

from tsrollup.zorder import z_value16, zone_map, zorder_frame


def _py_z(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_reference(spark):
    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
            (255, 256), (32768, 1)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = [r["z"] for r in
           df.select(z_value16(F.col("x"), F.col("y")).alias("z")).collect()]
    assert got == [_py_z(x, y) for x, y in vals]


def test_zorder_prunes_both_dims(spark):
    """100x100 uniform grid, 64 'files'. A 10%x10% box query must touch
    a small fraction of z-buckets but EVERY bucket of an x-sorted layout
    (x-sort gives no y locality), and skipping must be lossless: every
    matching row lives in a bucket whose box overlaps the query."""
    grid = (
        spark.range(100)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(100).select(F.col("id").alias("y")))
    )
    zf = zorder_frame(grid, "x", "y", bucket_bits=6)  # 64 buckets
    zm = zone_map(zf, "z_bucket", ["x", "y"]).collect()
    assert len(zm) == 64

    qx0, qx1, qy0, qy1 = 40, 49, 40, 49

    def overlaps(r):
        return not (
            r["max_x"] < qx0 or r["min_x"] > qx1
            or r["max_y"] < qy0 or r["min_y"] > qy1
        )

    z_touched = sum(1 for r in zm if overlaps(r))
    # 1-D comparison layout: 64 equal x-ranges — every one spans all y
    xf = grid.withColumn("z_bucket", F.floor(F.col("x") / F.lit(100 / 64)))
    xm = zone_map(xf, "z_bucket", ["x", "y"]).collect()
    x_touched = sum(1 for r in xm if overlaps(r))
    assert x_touched >= 7 * len(xm) // 64  # x-sort prunes only the x dim
    assert z_touched <= len(zm) // 4, (z_touched, x_touched)
    assert z_touched < x_touched

    # losslessness: every matching row's bucket overlaps the query box
    hit_buckets = {
        r["z_bucket"]
        for r in zf.where(
            (F.col("x").between(qx0, qx1)) & (F.col("y").between(qy0, qy1))
        )
        .select("z_bucket")
        .distinct()
        .collect()
    }
    overlapping = {r["z_bucket"] for r in zm if overlaps(r)}
    assert hit_buckets <= overlapping


def test_zorder_degenerate_dim_and_guard(spark):
    df = spark.range(10).select(
        F.col("id").alias("x"), F.lit(7).cast("long").alias("y")
    )
    out = zorder_frame(df, "x", "y", bucket_bits=4)
    # constant y quantizes to 0 everywhere: z == spread(x), still valid
    assert out.where(F.col("z") < 0).count() == 0
    with pytest.raises(ValueError):
        zorder_frame(df, "x", "y", bucket_bits=0)


def test_pruned_read_skips_partitions_and_is_exact(spark, tmp_path):
    """write_zordered + pruned_read: the box scan's executed plan lists
    ONLY the surviving z_bucket directories (partition pruning at
    planning time), and the result equals the brute full-scan filter."""
    from tsrollup.zorder import pruned_read, write_zordered

    grid = (
        spark.range(100)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(100).select(F.col("id").alias("y")))
    )
    path = str(tmp_path / "ztable")
    write_zordered(grid, path, "x", "y", bucket_bits=6)

    box = (40, 49, 40, 49)
    got = pruned_read(spark, path, box, "x", "y")
    rows = {(r["x"], r["y"]) for r in got.select("x", "y").collect()}
    expect = {(x, y) for x in range(40, 50) for y in range(40, 50)}
    assert rows == expect

    # the executed scan's numFiles metric is the ground truth for
    # partition pruning (inputFiles() ignores later filters)
    n_full = len(spark.read.parquet(path).inputFiles())
    assert n_full >= 32, n_full
    leaves = got._jdf.queryExecution().executedPlan().collectLeaves()
    assert leaves.size() == 1
    n_read = leaves.apply(0).metrics().apply("numFiles").value()
    assert n_read <= n_full // 4, (n_read, n_full)
