"""Z-order (Morton) layout + zone maps (SURVEY.md §2.1 row K4).

Multi-dimensional data skipping: a table range-partitioned on ONE column
prunes scans filtered on that column and nothing else. Interleaving the
bits of two dimensions into a Morton code and range-partitioning on THAT
gives every file a small bounding box in BOTH dimensions, so min/max
zone maps prune 2-D box queries — the layout trick behind Delta's
OPTIMIZE ZORDER and the classic UB-tree.

Everything here is exact integer arithmetic (quantize → magic-number bit
spread → interleave), so the z-values — and therefore the bucket
assignment and the zone maps — are reproducible bit-for-bit by any
engine, which is how the DuckDB oracle twins the layout.

Scale shape: quantization needs one tiny min/max aggregate (broadcast
back); the z-value is 12 bitwise ops per row inside whole-stage codegen;
the layout write is a single repartitionByRange on the z-column (one
range shuffle — the same cost as sorting by any one column, but buying
pruning in BOTH dimensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number spread of a 16-bit value onto the even bits of 32
# (Hacker's Delight / standard Morton-code constants)
_SPREAD_STEPS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` onto bit positions 0,2,4,..,30."""
    for sh, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(mask))
    return c


def z_value16(x: Column, y: Column) -> Column:
    """Morton interleave of two 16-bit non-negative ints: x takes the
    even bits, y the odd bits, of a 32-bit z-value."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def quantize16(c: Column, cmin: Column, cmax: Column) -> Column:
    """Map ``c`` in [cmin, cmax] onto [0, 65535]. A degenerate range
    (cmax == cmin) maps everything to 0.

    Exactness contract: the quotient is evaluated as floor((c - cmin) *
    65535 / (cmax - cmin)). With the numerator below 2^52 (anything
    derived from ids / bucket indices qualifies; raw epoch-micros must
    be bucketed first) IEEE double division is correctly rounded and its
    floor equals the true integer floor, so Spark's float-div + floor
    and DuckDB's integer ``//`` produce the SAME value — the twin
    relies on this."""
    num = (c - cmin) * F.lit(65535)
    return F.when(
        cmax > cmin, F.floor(num / (cmax - cmin))
    ).otherwise(F.lit(0)).cast("long")


def zorder_frame(
    df: DataFrame, xcol: str, ycol: str, bucket_bits: int = 10
) -> DataFrame:
    """Annotate ``df`` with the z-value of (xcol, ycol) (after per-column
    min/max quantization to 16 bits) and a coarse ``z_bucket`` — the
    file surrogate: ``z >> (32 - bucket_bits)``, i.e. 2^bucket_bits
    leaves of the z-curve. Writing with
    ``df.repartitionByRange("z").write...`` realises the layout; the
    zone map of each bucket is ``zone_map(...)``."""
    if not 1 <= bucket_bits <= 31:
        raise ValueError(f"bucket_bits {bucket_bits} out of range")
    mm = df.agg(
        F.min(xcol).alias("__xmin"),
        F.max(xcol).alias("__xmax"),
        F.min(ycol).alias("__ymin"),
        F.max(ycol).alias("__ymax"),
    )
    q = df.crossJoin(F.broadcast(mm))
    z = z_value16(
        quantize16(F.col(xcol), F.col("__xmin"), F.col("__xmax")),
        quantize16(F.col(ycol), F.col("__ymin"), F.col("__ymax")),
    )
    return q.select(
        *df.columns,
        z.alias("z"),
        F.shiftrightunsigned(z, 32 - bucket_bits).alias("z_bucket"),
    )


def zone_map(df: DataFrame, bucket_col: str, dims: list[str]) -> DataFrame:
    """Per-bucket min/max bounding box over ``dims`` plus the row count —
    the data-skipping index a scan planner consults: a bucket whose box
    misses the query box is never read."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return df.groupBy(bucket_col).agg(*aggs)


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, bucket_bits: int = 6
) -> None:
    """Realize the layout: annotate with z/z_bucket, range-partition on z
    (so each output task owns a contiguous z-range), and write
    partitioned by z_bucket — one directory per z-curve leaf, the unit
    the pruned read skips."""
    zf = zorder_frame(df, xcol, ycol, bucket_bits)
    (
        zf.repartitionByRange(max(1, 2 ** (bucket_bits - 2)), "z")
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )


def pruned_read(
    spark,
    path: str,
    box: tuple[int, int, int, int],
    xcol: str,
    ycol: str,
) -> DataFrame:
    """Data-skipping read of a write_zordered() table for the 2-D box
    query (xmin, xmax, ymin, ymax): consult the store's own zone map
    (one tiny aggregate over the z_bucket partition column + dims),
    push the surviving bucket list into the partition filter — Spark
    prunes the skipped z_bucket directories at PLANNING time, their
    files are never listed into the scan — then apply the exact box
    predicate to the surviving rows.

    The zone-map aggregate reads only the pruned columns (column
    pruning keeps it cheap); in a metastore deployment the map would be
    a cached side table maintained at write time — same plan shape."""
    xmin, xmax, ymin, ymax = box
    t = spark.read.parquet(path)
    zm = zone_map(t, "z_bucket", [xcol, ycol])
    keep = [
        r["z_bucket"]
        for r in zm.where(
            ~(
                (F.col(f"max_{xcol}") < xmin)
                | (F.col(f"min_{xcol}") > xmax)
                | (F.col(f"max_{ycol}") < ymin)
                | (F.col(f"min_{ycol}") > ymax)
            )
        ).collect()
    ]
    return t.where(F.col("z_bucket").isin(keep)).where(
        F.col(xcol).between(xmin, xmax) & F.col(ycol).between(ymin, ymax)
    )
