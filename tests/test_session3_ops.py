"""Independent-reference parity tests for the round-4 session-3
operators whose Spark implementations use nontrivial machinery —
each is checked against a small pure-Python reference (the
kernel==independent-loop-reference discipline), not just the DuckDB
twin (tests/test_driver_queries.py covers that side already).
"""

import os

import pytest

from tsrollup.driver_queries import SPARK, _bucketed_rank

from .conftest import TESTDATA

SF_DIR = os.path.join(TESTDATA, "sf0.001")


def test_clamped_balance_matches_loop_reference(spark):
    """x18's closed form b_t = S_t - min(0, running-min S) must equal the
    literal per-row fold b_t = max(0, b_{t-1} + d_t)."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS tus",
            "event_id",
            "CASE WHEN event_type = 'purchase' "
            "THEN CAST(round(value * 100, 0) AS BIGINT) "
            "WHEN event_type IN ('click', 'view') THEN -50L "
            "ELSE 0L END AS flow",
        )
        .collect()
    )
    ref = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.tus, r.event_id)):
        bal, n, clamped, peak = ref.get(r.user_id, (0, 0, 0, 0))
        nxt = max(0, bal + r.flow)
        # n_clamped counts rows where the post-clamp balance is 0 AND
        # the flow was negative (x18's definition)
        clamped += 1 if (nxt == 0 and r.flow < 0) else 0
        peak = max(peak, nxt)
        ref[r.user_id] = (nxt, n + 1, clamped, peak)

    got = {
        r.user_id: (r.final_cents, r.n_events, r.n_clamped, r.peak_cents)
        for r in SPARK["x18_clamped_balance"](spark, SF_DIR).collect()
    }
    assert set(got) == set(ref)
    for uid, (bal, n, clamped, peak) in ref.items():
        assert got[uid] == (bal, n, clamped, peak), uid


def test_bucketed_rank_equals_naive_global_rank(spark):
    """_bucketed_rank (range-bucket discipline behind k5 and fe2) must
    reproduce a naive global row_number exactly, including with skewed
    and colliding bucket keys."""
    import pyspark.sql.functions as F

    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 501).alias("k"), F.col("id").alias("tie")
    )
    ranked = _bucketed_rank(df, F.expr("k div 7"), ["k", "tie"]).collect()
    expect = {
        (r.k, r.tie): i
        for i, r in enumerate(sorted(ranked, key=lambda r: (r.k, r.tie)))
    }
    for r in ranked:
        assert r["__rank"] == expect[(r.k, r.tie)]


def test_bfs_matches_python_reference(spark):
    """x13's iterative frontier expansion must equal a textbook BFS."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    adj = {}
    for members in baskets.values():
        for a in members:
            for b in members:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    seeds = sorted(adj)[:3]
    from collections import deque

    best = {}  # node -> (dist, nearest_seed)
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 6:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for node, d in dist.items():
            cur = best.get(node)
            if cur is None or d < cur[0] or (d == cur[0] and s < cur[1]):
                best[node] = (d, s)

    got = {
        r.node: (r.dist, r.nearest_seed)
        for r in SPARK["x13_bfs"](spark, SF_DIR).collect()
    }
    assert got == best


def test_lsh_quality_confirms_verified_subset(spark):
    """The LSH pair list is exact-cosine verified, so it must be a
    subset of the brute-force truth: n_both == n_lsh and recall_bp
    is consistent with the counts."""
    row = SPARK["dd_lsh_quality"](spark, SF_DIR).collect()[0]
    assert row.n_both == row.n_lsh
    assert row.n_missed == row.n_exact - row.n_both
    assert row.recall_bp == 10000 * row.n_both // max(row.n_exact, 1)
    assert row.n_cand >= row.n_lsh, "candidates must superset verified pairs"


def test_lsh_recall_gate_sf001(spark):
    """Round-5 directive gate: the production banding (12x4) must measure
    recall_bp >= 9000 at sf0.01 on the repo's own audit, with the raw
    candidate fan-out reported (the honest cost of the recall)."""
    sf001 = os.path.join(TESTDATA, "sf0.01")
    row = SPARK["dd_lsh_quality"](spark, sf001).collect()[0]
    assert row.recall_bp >= 9000, (
        f"LSH recall regressed: {row.recall_bp} bp "
        f"(n_exact={row.n_exact}, n_both={row.n_both}, n_cand={row.n_cand})"
    )


def test_funnel_steps_matches_python_reference(spark):
    """x19's chained conditional mins must equal a literal per-user scan
    for the ordered chain signup -> later click -> later purchase."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("user_id", "event_type",
                    "unix_micros(CAST(ts AS TIMESTAMP)) AS tus")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.tus, r.event_type))
    c = [0, 0, 0]
    for evs in by_user.values():
        evs.sort()
        t1 = min((t for t, k in evs if k == "signup"), default=None)
        if t1 is None:
            continue
        c[0] += 1
        t2 = min((t for t, k in evs if k == "click" and t > t1), default=None)
        if t2 is None:
            continue
        c[1] += 1
        if any(k == "purchase" and t > t2 for t, k in evs):
            c[2] += 1
    got = {r.step: (r.users, r.prev_users, r.conv_bp)
           for r in SPARK["x19_funnel_steps"](spark, SF_DIR).collect()}
    assert got[1] == (c[0], c[0], 10000)
    assert got[2] == (c[1], c[0], 10000 * c[1] // max(c[0], 1))
    assert got[3] == (c[2], c[1], 10000 * c[2] // max(c[1], 1))


def test_bounce_report_matches_python_reference(spark):
    """x20's islands + entry/exit selection vs a literal sessionizer."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("user_id", "event_id", "event_type",
                    "unix_micros(CAST(ts AS TIMESTAMP)) AS tus")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.tus, r.event_id, r.event_type))
    agg = {}
    for evs in by_user.values():
        evs.sort()
        sessions, cur = [], []
        for tup in evs:
            if cur and tup[0] - cur[-1][0] > 1_800_000_000:
                sessions.append(cur)
                cur = []
            cur.append(tup)
        sessions.append(cur)
        for s in sessions:
            entry, exit_ = s[0][2], s[-1][2]
            a = agg.setdefault(entry, [0, 0, 0, 0, 0])
            a[0] += 1
            a[1] += 1 if len(s) == 1 else 0
            a[2] += len(s)
            a[3] += s[-1][0] - s[0][0]
            a[4] += 1 if exit_ == "purchase" else 0
    got = {r.entry_type: (r.sessions, r.bounces, r.bounce_bp, r.events,
                          r.dur_us_sum, r.purchase_exits)
           for r in SPARK["x20_bounce"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for k, (ses, b, ev, dur, px) in agg.items():
        assert got[k] == (ses, b, 10000 * b // ses, ev, dur, px), k


@pytest.mark.parametrize(
    "name,max_hash_exchanges,min_broadcast_joins",
    [
        # star join: five broadcast dims; the ONLY shuffle is the
        # 25-row nation agg
        ("j12_star_join", 1, 5),
        # clamped fold: both stacked windows + the final agg share one
        # user_id partitioning
        ("x18_clamped_balance", 1, 0),
        # PIT features: three RANGE-frame features share a single
        # (user_id) sort — one Exchange total
        ("fe_pit_features", 1, 0),
        # sessions: user shuffle + the catalog-sized entry_type agg
        ("x20_bounce", 2, 0),
    ],
)
def test_plan_shape_claims(spark, name, max_hash_exchanges, min_broadcast_joins):
    """The scale claims in the session-3 docstrings are PLAN properties —
    pin them so a refactor that silently adds a shuffle fails loudly."""
    import re

    plan = (
        SPARK[name](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    assert n_ex <= max_hash_exchanges, (
        f"{name}: {n_ex} hash exchanges (claimed <= {max_hash_exchanges})"
    )
    assert n_bhj >= min_broadcast_joins, (
        f"{name}: {n_bhj} broadcast joins (claimed >= {min_broadcast_joins})"
    )
    assert "SortMergeJoin" not in plan or name == "x20_bounce"
