"""Optimization-round measurement harness (bench.py is FROZEN; this file
holds the extra instrumentation the optimization guide §1 asks for).

Times individual `queries()` entries with the same `.count()` methodology
bench.py uses (plus optional noop-sink isolation), repeats each query
`--reps` times, and can dump `.explain("formatted")` to plans/<tag>/.

    python bench_extra.py [--reps 3] [--plans plans/r06 --tag before] \
        [--noop] [query ...]

Defaults to the heavy-query target list for round 6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: round-6 optimization targets (slowest entries of BENCH/bench_full_r06.json
#: at round start, + the five single-partition-window queries from VERDICT).
DEFAULT_TARGETS = [
    "dd_split_leakage",
    "x13_bfs",
    "dd_containment",
    "dd_minhash_lsh",
    "w15_gesd",
    "emb_kmeans",
    "tx_novelty",
    "engine_bucketed_join",
    "dd_snm",
    "tx_bloom_decontam",
    "tx_overlap_matrix",
    "dd_fuzzy",
    "x9_triangles",
    "w27_shesd",
    "x11_assoc",
    "k5_layout_skipping",
    "emb_pq_adc",
    "tx_ppl_buckets",
    "dd_threshold_sweep",
    "dd_semantic",
    "tx_bigram_lm",
    "tx_moore_lewis",
    "dq_checks",
    # single-partition-window queries (VERDICT #1)
    "x4_rfm",
    "x16_gini",
    "ml_gains",
    "mx_interleave",
    "tx_bm25",
]


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    plans_dir = None
    tag = "plan"
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        else:
            names.append(a); i += 1
    names = names or DEFAULT_TARGETS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from tsrollup.session import get_spark

    spark = get_spark(
        f"local[{cpus}]",
        app_name="tsrollup-bench-extra",
        extra_conf={"spark.sql.shuffle.partitions": str(2 * cpus)},
    )
    qs = entry.queries()

    # same warm-up class as bench.py's prefault (untimed): fault JVM heap
    # and spawn the Python workers so the first timed query isn't paying
    # session cold-start.
    from pyspark.sql import functions as F

    spark.range(0, 20_000_000, 1, cpus).groupBy(
        (F.col("id") % 100_000).alias("k")
    ).count().count()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if plans_dir:
            df = fn(spark, sf_dir)
            txt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            p = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(p, "w") as fh:
                fh.write(txt)
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(samples)[len(samples) // 2], "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    total = round(sum(v["median"] for v in out.values()), 3)
    print(json.dumps({"targets_total_median": total, "n": len(out)}))


if __name__ == "__main__":
    main()
