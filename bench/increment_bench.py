"""Incremental-derive benchmark: derived wall vs batch size, not store size.

Protocol: build a store from all days but the last of the 4M-row scaling
fixture (full derive + state checkpoint), then append the last day as a
second batch and measure its derived phase (the incremental path). The
claim under test: the append batch's derived wall tracks the BATCH
footprint (last day + one day-partial halo per source), not the retained
store — the property that keeps a 10^12-row store's derived phase O(new
data) per batch.

Reported to BENCH/increment.json:
  full_derive_s     derived wall of the initial (full) build
  inc_derive_s      derived wall of the append batch (incremental path)
  batch_fraction    appended rows / total rows
  inc_over_full     inc_derive_s / full_derive_s (compare with
                    batch_fraction: ~equal means wall tracks batch size)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    os.environ.setdefault("TSROLLUP_SOURCE_BUCKETS", "8")
    from tsrollup.config import RollupConfig
    from tsrollup.pipeline import rollup_build
    from tsrollup.session import get_spark
    from tsrollup.synth import write_fixture

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cache = os.path.join(REPO, ".bench_cache")
    fixture = write_fixture(
        os.path.join(cache, f"fx_scaling_{rows}"), rows, 200, seed=42,
        rate_scale=100.0,
    )
    # split at the last observed day (pure-append second batch)
    parts = sorted(glob.glob(os.path.join(fixture, "*.parquet")))
    table = pa.concat_tables([pq.read_table(p) for p in parts])
    ts = table.column("event_ts").to_numpy().astype("int64")
    day_us = 86_400_000_000
    cut = max(ts // day_us) * day_us
    b1_dir = os.path.join(cache, "inc_bench_b1")
    b2_dir = os.path.join(cache, "inc_bench_b2")
    for d, keep in ((b1_dir, ts < cut), (b2_dir, ts >= cut)):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        t = table.filter(pa.array(keep))
        step = max(1, t.num_rows // 16)
        for i in range(0, t.num_rows, step):
            pq.write_table(
                t.slice(i, step), os.path.join(d, f"part-{i // step:05d}.parquet")
            )
    n2 = int((ts >= cut).sum())

    spark = get_spark(
        "local[32]", app_name="inc-bench",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    out = "/tmp/inc_bench_store"
    # untimed warmup build (fault the JVM/python workers)
    shutil.rmtree(out + "_w", ignore_errors=True)
    warm = write_fixture(os.path.join(cache, "fx_warm"), 20_000, 20, seed=1)
    rollup_build(spark, warm, out + "_w", RollupConfig())

    shutil.rmtree(out, ignore_errors=True)
    s1 = rollup_build(spark, b1_dir, out, RollupConfig())
    s2 = rollup_build(spark, b2_dir, out, RollupConfig())
    assert "derive_inc" in s2["phases"], s2["phases"]
    report = {
        "fixture_rows": rows,
        "appended_rows": n2,
        "batch_fraction": round(n2 / rows, 4),
        "full_derive_s": round(s1["wall_derived_s"], 2),
        "inc_derive_s": round(s2["wall_derived_s"], 2),
        "inc_over_full": round(s2["wall_derived_s"] / s1["wall_derived_s"], 3),
        "full_phases": s1["phases"],
        "inc_phases": s2["phases"],
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "increment.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
