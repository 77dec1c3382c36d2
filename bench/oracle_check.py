"""Driver-harness pre-validation: run every `queries()` entry that has an
`oracle_sql()` twin side-by-side with DuckDB at sf0.01 (the driver's
correctness scale — tests/ run the same logic at sf0.001) and compare
rows, column names, and VALUES exactly.

Stricter than the driver on dtypes (pandas .equals is dtype-sensitive;
the driver widens ints), so an int32-vs-int64 "False" with `diffs 0`
printed is a dtype artifact, not a value mismatch.

    python bench/oracle_check.py [entry ...]      # default: all oracles
    python bench/oracle_check.py --json BENCH/board_r04.json   # persist board
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import importlib  # noqa: E402

entry = importlib.import_module("__spark_entry__")

from tsrollup.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    spark = get_spark("local[8]")
    qs, osql = entry.queries(), entry.oracle_sql()
    names = args or sorted(osql)
    board: dict = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    failures = 0
    for name in names:
        a = canon(qs[name](spark, SF).toPandas())
        b = canon(con.execute(osql[name]).df())
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = ok_rows and ok_cols and a.equals(b)
        if ok_rows and ok_cols and not ok_vals:
            # a.equals is dtype-sensitive; re-verdict per column with
            # value-level compare (both-NA == equal, matching .equals).
            # ok_vals becomes True only if EVERY column is value-equal —
            # a dtype-only column must never absolve a later real diff.
            dtype_only = True
            for c in a.columns:
                if not a[c].equals(b[c]):
                    mask = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
                    print(
                        f"  [{name}] col {c} dtype {a[c].dtype} vs "
                        f"{b[c].dtype} diffs {int(mask.sum())}"
                    )
                    if mask.sum():
                        dtype_only = False
                        print(a[mask].head(3))
                        print(b[mask].head(3))
            ok_vals = dtype_only
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        board[name] = {
            "status": status, "spark_rows": len(a), "oracle_rows": len(b),
            "rows_match": ok_rows, "cols_match": ok_cols, "values_match": bool(ok_vals),
        }
        print(f"{name}: {status} rows={len(a)}/{len(b)}")
    print(f"{len(names) - failures}/{len(names)} value-exact")
    if json_path:
        import json as _json
        import time as _time

        payload = {
            "sf_dir": SF,
            "n_queries": len(names),
            "n_value_exact": len(names) - failures,
            "timestamp": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
            "queries": board,
        }
        with open(json_path, "w") as f:
            _json.dump(payload, f, indent=2)
        print(f"board written to {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
