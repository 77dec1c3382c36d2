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


def test_dd_incremental_semantics(spark):
    """Incremental dedup vs a pure-python reference on planted dups:
    a new-batch doc duplicating an existing doc -> dup_of_existing with
    the existing keeper; two new docs sharing text -> min-id keeps
    'unique'/'dup_in_batch'; fresh text -> unique."""
    import hashlib

    import pandas as pd

    from tsrollup.driver_queries import SPARK

    docs = []
    for i in range(20):
        docs.append((str(i), f"existing text {i}", len(f"{i}"), "s0"))
    docs.append(("350", "existing text 3", 1, "s0"))     # dup of existing id 3
    docs.append(("351", "brand new text A", 1, "s0"))    # unique
    docs.append(("352", "brand new text B", 1, "s0"))    # batch keeper
    docs.append(("353", "brand new text B", 1, "s0"))    # dup in batch
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "n_chars", "source"])
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        out = {r["doc_id"]: (r["verdict"], r["keeper_doc_id"])
               for r in SPARK["dd_incremental"](spark, td).collect()}
    assert out[350] == ("dup_of_existing", 3)
    assert out[351] == ("unique", 351)
    assert out[352] == ("unique", 352)
    assert out[353] == ("dup_in_batch", 352)
    assert len(out) == 4  # existing docs never re-emitted


def test_dd_incremental_neardup_semantics(spark):
    """Planted near-dups across the existing/new split: a new doc that
    lightly edits an existing doc -> near_dup_of_existing; two similar
    new docs -> the later one near_dup_in_batch; fresh text -> unique."""
    import tempfile

    import pandas as pd

    from tsrollup.driver_queries import SPARK

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = []
    for i in range(20):
        docs.append((str(i), f"{base} marker{i}", 1, "s0"))
    docs.append(("350", f"{base} marker3 extra", 1, "s0"))   # ~near existing 3
    docs.append(("351", "totally different words entirely fresh content "
                        "nothing shared here at all whatsoever", 1, "s0"))
    docs.append(("352", f"{base} brandnew", 1, "s0"))        # near base family
    docs.append(("353", f"{base} brandnew tail", 1, "s0"))   # near 352
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "n_chars", "source"])
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        out = {r["doc_id"]: (r["verdict"], r["partner_doc_id"])
               for r in SPARK["dd_incremental_neardup"](spark, td).collect()}
    assert len(out) == 4
    assert out[351][0] == "unique" and out[351][1] is None
    assert out[350][0] == "near_dup_of_existing"
    assert out[350][1] < 350
    # 353 is nearest to 352 (within batch); 352's best partner is existing
    assert out[353][0] == "near_dup_in_batch" and out[353][1] == 352
    assert out[352][0] == "near_dup_of_existing"


def test_b3_ohlc_tie_and_extremes(spark, tmp_path):
    """Planted candle: open/close picked by (ts, event_id) order — the
    equal-timestamp tie resolves by event_id — and high/low are the
    extremes, not the endpoints."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "event_id": [2, 1, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05"] * 2 + ["2024-01-01 00:30:00",
                                               "2024-01-01 00:59:59"]
            ),
            "user_id": [1, 1, 1, 1],
            "event_type": ["click"] * 4,
            "value": [5.0, 1.0, 99.0, 7.0],
            "props": ["{}"] * 4,
        }
    )
    sf = str(tmp_path)
    rows.to_parquet(
        f"{sf}/events.parquet", index=False, coerce_timestamps="us"
    )
    from tsrollup.driver_queries import SPARK

    out = SPARK["b3_ohlc"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # ts tie at 00:00:05: event_id 1 (value 1.0) wins the open
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
        1.0, 99.0, 1.0, 7.0, 4
    )


def test_tx_bm25_ranking_semantics(spark, tmp_path):
    """Hand-checkable BM25: a doc with more query-term hits outranks one
    with fewer; among equal hit counts the SHORTER doc ranks higher
    (length normalization); docs with no query terms never appear."""
    import pandas as pd

    docs = [
        (1, "table table merge window pad pad", "en", "s0"),   # 4 hits, short
        (2, "table merge pad pad pad pad", "en", "s0"),        # 2 hits
        (3, "table merge pad pad pad pad pad pad pad pad pad pad", "en", "s0"),
        (4, "pad pad pad pad pad pad", "en", "s0"),             # 0 hits
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)
    from tsrollup.driver_queries import SPARK

    out = SPARK["tx_bm25"](spark, sf).toPandas().sort_values("rnk")
    assert list(out["doc_id"]) == [1, 2, 3], out
    assert (out["micro_score"] > 0).all()


def test_w28_slo_burn_planted_burst(spark, tmp_path):
    """A planted hour at 50% errors (burn 2.0 on a 25% budget) must page
    when the trailing day also runs hot, and a healthy hour must not."""
    import pandas as pd

    rows = []
    eid = 0
    # 24 healthy hours: 10 events, 1 error (burn 0.4)
    for h in range(24):
        for k in range(10):
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h, seconds=k),
                 1, "error" if k == 0 else "view", 1.0, "{}")
            )
            eid += 1
    # burst hour: 10 events, 5 errors -> burn_s 2.0; long window still
    # carries the burst, so page requires the long-run gate too
    for k in range(10):
        rows.append(
            (eid, pd.Timestamp("2024-01-02 00:00:00") + pd.Timedelta(seconds=k),
             1, "error" if k < 5 else "view", 1.0, "{}")
        )
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    from tsrollup.driver_queries import SPARK

    out = {r["i"]: r for r in SPARK["w28_slo_burn"](spark, sf).collect()}
    burst_i = int(pd.Timestamp("2024-01-02").timestamp() // 3600)
    healthy_i = burst_i - 1
    assert out[burst_i]["ticket"] and not out[healthy_i]["ticket"]
    # long window at the burst hour: 29 errors / 250 events = 0.116 <
    # 0.225 -> page gated off by the long window despite the hot hour
    assert not out[burst_i]["page"]
    assert abs(out[burst_i]["burn_s_r"] - 2.0) < 1e-9


def test_b4_sessionize_gap_split(spark, tmp_path):
    """Two bursts 31 minutes apart are two sessions; 29 minutes apart is
    one; durations are exact micros."""
    import pandas as pd

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: 2 events, 31-min gap -> 2 sessions of 1 event each
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + pd.Timedelta(minutes=31), 1, "view", 1.0, "{}"),
        # user 2: 3 events inside 29 minutes -> 1 session
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + pd.Timedelta(minutes=15), 2, "view", 1.0, "{}"),
        (5, t0 + pd.Timedelta(minutes=29), 2, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    from tsrollup.driver_queries import SPARK

    out = {r["user_id"]: r for r in SPARK["b4_sessionize"](spark, sf).collect()}
    assert out[1]["n_sessions"] == 2 and out[1]["total_dur_us"] == 0
    assert out[2]["n_sessions"] == 1 and out[2]["max_events"] == 3
    assert out[2]["total_dur_us"] == 29 * 60 * 1_000_000


def test_tx_zipf_known_slope(spark, tmp_path):
    """A corpus built to follow freq = 840 / rank exactly (840 = lcm 1..8,
    so every frequency is an exact integer) must fit slope -1 in log-log
    space; micro-unit rounding keeps it within 1e-3."""
    import pandas as pd

    words = []
    for rank in range(1, 9):          # 8 tokens, freq 840/rank exactly
        words += [f"w{rank:02d}"] * (840 // rank)
    docs = [(0, " ".join(words), "en", "s0")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)
    from tsrollup.driver_queries import SPARK

    out = SPARK["tx_zipf"](spark, sf).collect()
    assert len(out) == 1 and out[0]["n"] == 8
    assert abs(out[0]["zipf_slope_r"] + 1.0) < 1e-3, out


def test_w29_envelope_phase_specific_band(spark, tmp_path):
    """A value normal-for-midnight but absurd-for-noon is flagged only at
    noon: each hour is judged against its own phase's band."""
    import pandas as pd

    rows, eid = [], 0
    t0 = pd.Timestamp("2024-01-01")
    for day in range(10):
        for hour in range(24):
            # midnight hours run hot (20 events), others quiet (2)
            n = 20 if hour == 0 else 2
            # day 9 noon: a midnight-sized burst -> out of noon's band
            if day == 9 and hour == 12:
                n = 20
            for k in range(n):
                rows.append(
                    (eid, t0 + pd.Timedelta(days=day, hours=hour, seconds=k),
                     1, "click", 1.0, "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    from tsrollup.driver_queries import SPARK

    out = SPARK["w29_envelope"](spark, sf).toPandas()
    base_i = int(t0.timestamp() // 3600)
    noon9 = out[out["i"] == base_i + 9 * 24 + 12].iloc[0]
    assert noon9["out_of_band"], noon9       # 20 >> noon's p90 (2)
    mid9 = out[out["i"] == base_i + 9 * 24].iloc[0]
    assert not mid9["out_of_band"], mid9     # 20 is normal at midnight


def test_x2_survival_hand_computed(spark, tmp_path):
    """Hand-checkable KM curve: 4 users churn at days 0/0/1/2, one user
    censored at the horizon. S(0)=1-2/5=0.6, S(1)=0.6*(1-1/3)=0.4,
    S(2)=0.4*(1-1/2)=0.2; the censored user never drops the curve to 0."""
    import pandas as pd

    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0

    def span(uid, days):
        nonlocal eid
        rows.append((eid, t0, uid, "view", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=days), uid, "view", 1.0, "{}"))
        eid += 1

    span(1, 0)   # churn at day 0
    span(2, 0)   # churn at day 0
    span(3, 1)   # churn at day 1
    span(4, 2)   # churn at day 2
    span(5, 30)  # defines horizon; within 7d of it -> censored
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    from tsrollup.driver_queries import SPARK

    out = {r["dur_d"]: r for r in SPARK["x2_survival"](spark, sf).collect()}
    assert out[0]["n_risk"] == 5 and out[0]["d_churn"] == 2
    assert abs(out[0]["surv_r"] - 0.6) < 1e-3
    assert abs(out[1]["surv_r"] - 0.4) < 1e-3
    assert abs(out[2]["surv_r"] - 0.2) < 1e-3
    assert out[30]["surv_r"] > 0.19  # censored tail never forces 0


def test_x3_markov_rare_path_scores_higher(spark, tmp_path):
    """A user walking a transition no one else makes scores more
    surprise bits than users on the common path."""
    import pandas as pd

    rows, eid = [], 0
    t0 = pd.Timestamp("2024-01-01")
    # 10 users ping-pong view->click (common path)
    for u in range(10):
        for k in range(10):
            rows.append((eid, t0 + pd.Timedelta(seconds=eid), u,
                         "view" if k % 2 == 0 else "click", 1.0, "{}"))
            eid += 1
    # user 99 alternates error->purchase (rare transitions)
    for k in range(10):
        rows.append((eid, t0 + pd.Timedelta(seconds=eid), 99,
                     "error" if k % 2 == 0 else "purchase", 1.0, "{}"))
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    from tsrollup.driver_queries import SPARK

    out = {r["user_id"]: r["surprise_bits"]
           for r in SPARK["x3_markov"](spark, sf).collect()}
    common = max(v for u, v in out.items() if u != 99)
    assert out[99] > common, out


def _plant_events(tmp_path, counts_by_type):
    """Write an events.parquet with exactly `counts_by_type[t][h]` events
    in hour h for each event_type t (hours start 2024-01-01)."""
    import pandas as pd

    rows, eid = [], 0
    for etype, counts in counts_by_type.items():
        for h, n in enumerate(counts):
            for k in range(n):
                rows.append(
                    (eid,
                     pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h, seconds=k),
                     1, etype, 1.0, "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False, coerce_timestamps="us")
    return sf


def test_w42_runs_alternating_vs_trending(spark, tmp_path):
    """An alternating series flips sign every step (max runs, z > 0); a
    strictly increasing series has no negative diffs and emits nothing."""
    sf = _plant_events(
        tmp_path,
        {
            "alt": [1, 2] * 24,                 # diffs +1,-1,... 47 runs
            "trend": list(range(1, 25)),        # all diffs +1 -> n_neg=0
        },
    )
    from tsrollup.driver_queries import SPARK

    out = {r["event_type"]: r for r in SPARK["w42_runs_test"](spark, sf).collect()}
    assert "trend" not in out
    alt = out["alt"]
    assert alt["n_runs"] == alt["n_pos"] + alt["n_neg"] == 47
    assert alt["z_r"] > 0


def test_w39_ar2_block_persistent(spark, tmp_path):
    """A slow square wave (12 high hours, 12 low, repeated) is strongly
    positively autocorrelated at lag 1 AND lag 2; Yule-Walker puts the
    bulk of the weight on phi1 with phi1 + phi2 ~ r1 persistence."""
    sf = _plant_events(tmp_path, {"sq": ([10] * 12 + [1] * 12) * 4})
    from tsrollup.driver_queries import SPARK

    row = SPARK["w39_ar2_yw"](spark, sf).collect()[0]
    assert row["r1_r"] > 0.8 and row["r2_r"] > 0.5
    assert row["phi1_r"] > 0.8
    # lag-2 adds nothing beyond lag-1 persistence on a square wave
    assert abs(row["phi2_r"]) < 0.5


def test_w41_arch_planted_volatility_cluster(spark, tmp_path):
    """Calm half (constant counts, zero squared diffs) followed by a
    noisy half (alternating +/-9 diffs) clusters volatility: large z
    follows large z, so the squared-diff autocorrelation is positive."""
    sf = _plant_events(tmp_path, {"v": [5] * 24 + [1, 10] * 12})
    from tsrollup.driver_queries import SPARK

    row = SPARK["w41_arch_lm"](spark, sf).collect()[0]
    assert row["r_r"] > 0.5
    assert row["lm_r"] > 10.0


def test_tx_gopher_rules_planted(spark, tmp_path):
    """A 60-word normal doc passes; a 10-word doc fails on word count;
    a stopword-free doc fails on stop_hits."""
    import pandas as pd

    good = "the quick brown fox jumps over a lazy dog near the river " * 5
    short = "the quick brown fox jumps over a lazy dog now"
    nostop = "alpha beta gamma delta epsilon zeta " * 10
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [good.strip(), short, nostop.strip()]}
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)
    from tsrollup.driver_queries import SPARK

    out = {r["doc_id"]: r for r in SPARK["tx_gopher_rules"](spark, sf).collect()}
    assert out[1]["gopher_pass"] == 1 and out[1]["n_words"] == 60
    assert out[2]["gopher_pass"] == 0 and out[2]["n_words"] == 10
    assert out[3]["gopher_pass"] == 0 and out[3]["stop_hits"] == 0


def test_tx_rrf_fusion_planted(spark, tmp_path):
    """A doc matching BOTH arms outranks docs that win only one arm;
    the fused score is the exact integer micro sum of 1/(60+rank)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "spark spark spark join join join",  # wins BOTH arms
                "spark spark zzz",                   # arm A runner-up
                "join join zzz",                     # arm B runner-up
                "zzz zzz zzz zzz",                   # neither
            ],
        }
    )
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)
    from tsrollup.driver_queries import SPARK

    rows = SPARK["tx_rrf_fusion"](spark, sf).collect()
    assert rows[0]["doc_id"] == 1
    assert rows[0]["rank_a"] == rows[0]["rank_b"] == 1
    assert rows[0]["rrf_micro"] == 2 * (1000000 // 61)
