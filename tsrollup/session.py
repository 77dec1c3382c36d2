"""SparkSession builder with the engine's pinned configuration.

Single place that owns session-level tuning (SURVEY.md §4): Arrow exchange
on, AQE + skew-join on, shuffle partitions sized for the sandbox. Production
deploys pass a real master / Iceberg catalog through `extra_conf`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # Arrow-vectorized JVM<->Python exchange — mandatory for the pandas
    # kernels ("no per-row Python", BASELINE.json).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # AQE: post-shuffle coalescing + skew-join splitting (K3).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # Let the planner pick shuffled-hash over sort-merge when its size
    # conditions hold (optimization guide §3.1/§9): skips both sort passes
    # on equi-joins whose per-partition build side fits in memory — the
    # planner's own size guards (canBuildLocalHashMap vs the advisory
    # partition size) still force sort-merge for big build sides, so this
    # is safe at scale. Interleaved A/B over 14 join-heavy queries at
    # sf0.1: 12.94 s -> 11.71 s best-of-2 sums, no query slower than
    # +0.011 s.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Keep timestamps µs/UTC everywhere (testdata parquet is timestamp[us]).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # v2 commit: single rename per task, not per file — matters when a
    # partitioned write lands thousands of dirs (cloud deploys would use a
    # manifest/Iceberg commit instead and skip renames entirely)
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    # quieter local runs
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
    # Pin the heap floor: G1 uncommits idle regions between jobs and the
    # OS takes the pages back; on hypervisors with lazy provisioning the
    # NEXT job then re-faults them at ~10 MB/s. -Xms keeps the mapping so
    # faulted pages stay resident across jobs (no AlwaysPreTouch: paying
    # the fault once on first use is fine, paying it per job is not).
    "spark.driver.extraJavaOptions": "-Xms8g -XX:-ShrinkHeapInSteps",
}


def get_spark(
    master: str = "local[*]",
    app_name: str = "tsrollup",
    extra_conf: dict | None = None,
) -> SparkSession:
    b = SparkSession.builder.master(master).appName(app_name)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
