"""spark-submit entry point (BASELINE.json ship artifact:
`spark-submit --py-files tsrollup.zip -m tsrollup.cli ...`).

Subcommands:
  build   — rollup_build: incremental, exactly-resumable batch job
  score   — detector-only pass over an existing rollup store
  stream  — availableNow streaming drain (tumbling 1m rollup)
  synth   — write a deterministic synthetic fixture
  retain  — enforce per-tier retention on a rollup store
  query   — planned range read (tier choice + partition pruning); with
            --decoded, served from the Gorilla block store
  ingest  — commit a streaming drain's finalized 1m rows into the store
            (re-cascade affected 1h/1d, incremental derived phase)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tsrollup")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--salt", type=int, default=8)
    b.add_argument("--gapfill", choices=["locf", "linear"], default="locf")
    b.add_argument("--no-derived", action="store_true")
    b.add_argument("--no-incremental", action="store_true",
                   help="force full derived-phase recompute (skip state checkpoints)")

    s = sub.add_parser("score")
    s.add_argument("--out", required=True)
    s.add_argument("--tier", default="1h")
    s.add_argument("--window", type=int, default=60)
    s.add_argument("--tau", type=float, default=3.0)
    s.add_argument("--alpha", type=float, default=0.3)

    st = sub.add_parser("stream")
    st.add_argument("--input", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--watermark", default="10 minutes")

    sy = sub.add_parser("synth")
    sy.add_argument("--out", required=True)
    sy.add_argument("--rows", type=int, default=200_000)
    sy.add_argument("--sources", type=int, default=50)
    sy.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("retain")
    r.add_argument("--out", required=True)
    r.add_argument("--now-day", required=True, help="YYYY-MM-DD")

    ing = sub.add_parser("ingest")
    ing.add_argument("--streamed", required=True,
                     help="parquet dir/files of drained finalized 1m rows")
    ing.add_argument("--out", required=True, help="rollup store base dir")
    ing.add_argument("--no-derived", action="store_true")

    q = sub.add_parser("query")
    q.add_argument("--out", required=True, help="rollup store base dir")
    q.add_argument("--start", required=True, help="ISO timestamp")
    q.add_argument("--end", required=True, help="ISO timestamp")
    q.add_argument("--resolution", type=int, default=None, help="seconds")
    q.add_argument("--sources", default=None, help="comma-separated filter")
    q.add_argument("--decoded", action="store_true",
                   help="serve from the compressed block store")
    q.add_argument("--metric", default="n_tok_mean",
                   help="metric for --decoded reads")
    q.add_argument("--now-day", default=None, metavar="YYYY-MM-DD",
                   help="retention reference date: the planner skips tiers "
                        "whose horizon no longer covers the range (mirrors "
                        "`retain`; omit to trust every tier)")
    q.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .synth import write_fixture

        path = write_fixture(args.out, args.rows, args.sources, args.seed)
        print(json.dumps({"fixture": path}))
        return 0

    from .config import DetectorConfig, RollupConfig
    from .session import get_spark

    extra = {}
    if args.shuffle_partitions:
        extra["spark.sql.shuffle.partitions"] = str(args.shuffle_partitions)
    spark = get_spark(args.master, app_name=f"tsrollup-{args.cmd}", extra_conf=extra)

    if args.cmd == "build":
        from .pipeline import rollup_build

        cfg = RollupConfig(
            salt_buckets=args.salt or None, gapfill_method=args.gapfill,
            incremental=not args.no_incremental,
        )
        summary = rollup_build(spark, args.input, args.out, cfg, derived=not args.no_derived)
        print(json.dumps(summary, default=str))
        return 0

    if args.cmd == "score":
        from .pipeline import score

        cfg = RollupConfig(
            detector=DetectorConfig(window=args.window, tau=args.tau, alpha=args.alpha)
        )
        n = score(spark, args.out, args.tier, cfg).where("is_anomaly").count()
        print(json.dumps({"tier": args.tier, "anomalies": n}))
        return 0

    if args.cmd == "stream":
        from .streaming import run_streaming_rollup

        run_streaming_rollup(spark, args.input, args.out, args.checkpoint, args.watermark)
        print(json.dumps({"status": "drained"}))
        return 0

    if args.cmd == "ingest":
        from .ingest import ingest_streamed_rollup

        summary = ingest_streamed_rollup(
            spark, args.streamed, args.out, RollupConfig(),
            derived=not args.no_derived,
        )
        print(json.dumps(summary, default=str))
        return 0

    if args.cmd == "query":
        from .query import read_range, read_range_decoded

        srcs = args.sources.split(",") if args.sources else None
        if args.decoded:
            df = read_range_decoded(
                spark, args.out, args.start, args.end,
                metric=args.metric, resolution_s=args.resolution, sources=srcs,
                now_day=args.now_day,
            )
            order = ["source", "metric", "bucket_start"]
        else:
            df = read_range(
                spark, args.out, args.start, args.end,
                resolution_s=args.resolution, sources=srcs,
                now_day=args.now_day,
            )
            order = ["source", "bucket_start"]
        rows = df.orderBy(*order).limit(args.limit).collect()
        print(json.dumps({
            "rows": df.count(),
            "tier": rows[0]["tier"] if rows else None,
            "sample": [{k: str(v) for k, v in r.asDict().items()} for r in rows],
        }))
        return 0

    if args.cmd == "retain":
        from .storage import retain_store

        removed = retain_store(args.out, args.now_day)
        print(json.dumps({"removed_partitions": removed}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
