import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsrollup.session import get_spark  # noqa: E402
from tsrollup.synth import write_fixture  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
FIXTURE_DIR = "/tmp/tsrollup_fixtures"


@pytest.fixture(scope="session")
def spark():
    # fewer shuffle partitions: test inputs are tiny, scheduling overhead
    # dominates at 32; correctness is partition-count-invariant by design
    # (and test_partitioning_invariance proves it).
    s = get_spark(
        "local[8]",
        app_name="tsrollup-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq_fixture_small():
    """N=10k, K=20 unit-test fixture (FIXTURES.md §A sizes)."""
    path = write_fixture(os.path.join(FIXTURE_DIR, "small"), 10_000, 20, seed=42)
    return path


@pytest.fixture(scope="session")
def seq_fixture_parity():
    """N=200k, K=50 parity/e2e fixture."""
    path = write_fixture(os.path.join(FIXTURE_DIR, "parity"), 200_000, 50, seed=42)
    return path


def assert_frame_byte_equal(actual: pd.DataFrame, expected: pd.DataFrame, keys: list[str], msg=""):
    """Order-insensitive, bit-exact frame comparison.

    Sorts both frames by `keys`, then compares column-by-column:
    float64 columns bitwise (NaN == NaN, -0.0 != 0.0), everything else
    with exact equality honoring nulls.
    """
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{msg} columns differ: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    a = actual.sort_values(keys, kind="mergesort").reset_index(drop=True)
    e = expected.sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(e), f"{msg} row count {len(a)} vs {len(e)}"
    for col in e.columns:
        av, ev = a[col], e[col]
        if ev.dtype == np.float64 and av.dtype == np.float64:
            ab = av.to_numpy().view(np.uint64)
            eb = ev.to_numpy().view(np.uint64)
            bad = ab != eb
            assert not bad.any(), (
                f"{msg} col {col}: {bad.sum()} bit-mismatches; first at sorted row "
                f"{np.flatnonzero(bad)[0]}: {av.iloc[np.flatnonzero(bad)[0]]!r} vs "
                f"{ev.iloc[np.flatnonzero(bad)[0]]!r}"
            )
        else:
            an = pd.array(av)
            en = pd.array(ev)
            eq = (an == en) | (pd.isna(an) & pd.isna(en))
            eq = pd.array(eq, dtype="boolean").fillna(False)
            bad = ~eq.to_numpy(dtype=bool)
            assert not bad.any(), (
                f"{msg} col {col}: {bad.sum()} mismatches; first at sorted row "
                f"{np.flatnonzero(bad)[0]}: {av.iloc[np.flatnonzero(bad)[0]]!r} vs "
                f"{ev.iloc[np.flatnonzero(bad)[0]]!r}"
            )


def normalize_ts(df: pd.DataFrame, cols) -> pd.DataFrame:
    """Strip tz + unify datetime64 resolution so Spark-toPandas and
    pyarrow-to-pandas frames compare on equal footing (values are µs UTC
    on both sides; only the container dtype differs)."""
    df = df.copy()
    for c in cols:
        if c in df.columns:
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df
