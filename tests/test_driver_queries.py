"""Local twin of the driver's correctness harness: run every SPARK query
and its DuckDB ORACLE side-by-side and compare values exactly
(order-insensitive, ints widened to int64, float64 bit-compared after each
side's own rounding). Runs at sf0.001 for speed; the driver runs sf0.01.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from tsrollup.driver_queries import ORACLE, SPARK

from .conftest import TESTDATA

SF_DIR = os.path.join(TESTDATA, "sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            # duckdb may hand back Decimals / numpy scalars
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(SPARK[name](spark, SF_DIR).toPandas())
    exp = _normalize(duck.execute(ORACLE[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype == np.float64 or e.dtype == np.float64:
            g = g.astype(np.float64).to_numpy()
            e = e.astype(np.float64).to_numpy()
            both_nan = np.isnan(g) & np.isnan(e)
            ok = (g == e) | both_nan
            assert ok.all(), (
                f"{name}.{c}: {(~ok).sum()} mismatches, first "
                f"{g[~ok][:3]} vs {e[~ok][:3]}"
            )
        else:
            gn = pd.array(g)
            en = pd.array(e)
            ok = (gn == en) | (pd.isna(gn) & pd.isna(en))
            ok = pd.array(ok, dtype="boolean").fillna(False).to_numpy(dtype=bool)
            assert ok.all(), (
                f"{name}.{c}: {(~ok).sum()} mismatches, first "
                f"{g[~ok].head(3).tolist()} vs {e[~ok].head(3).tolist()}"
            )


def test_all_spark_queries_run(spark):
    """Entries without an oracle still must execute and return a schema."""
    for name, fn in SPARK.items():
        if name in ORACLE:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
