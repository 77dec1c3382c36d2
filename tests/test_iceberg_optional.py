"""Iceberg runtime validation — runs ONLY when an Iceberg runtime jar is
present on the Spark classpath (none ships in this sandbox and there is no
network to fetch one, so here the test SKIPS; on a deploy image with
iceberg-spark-runtime it executes a write→snapshot-read round trip through
the same `fmt='iceberg'` switch storage.read_sequences exposes).

This pins the deploy-time risk noted in SURVEY.md §0 (env table): the
engine's Iceberg path is a format switch over identical DataFrame code,
but it has never executed in-sandbox. The moment a jar appears, this test
starts running and the risk note retires.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

SPARK_JARS = glob.glob("/opt/spark/jars/*iceberg*.jar")


@pytest.mark.skipif(
    not SPARK_JARS, reason="no iceberg-spark-runtime jar on the classpath"
)
def test_iceberg_write_read_roundtrip(tmp_path):
    """writeTo().createOrReplace() + snapshot read through a hadoop
    catalog; sequence schema incl. the tokens array must round-trip."""
    from pyspark.sql import SparkSession

    wh = os.path.join(str(tmp_path), "warehouse")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-roundtrip")
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .getOrCreate()
    )
    df = spark.createDataFrame(
        [("d1", [1, 2, 3], 3, "s1"), ("d2", [4], 1, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).withColumn("event_ts", F.timestamp_seconds(F.lit(1704067200)))
    df.writeTo("local.db.seq").createOrReplace()

    from tsrollup.storage import read_sequences

    back = read_sequences(spark, "local.db.seq", fmt="iceberg")
    rows = {r["doc_id"]: r for r in back.collect()}
    assert set(rows) == {"d1", "d2"}
    assert list(rows["d1"]["tokens"]) == [1, 2, 3]
    # snapshot metadata exists (time-travel surface)
    snaps = spark.sql("SELECT * FROM local.db.seq.snapshots").count()
    assert snaps >= 1
