"""Independent-definition truth tests for the round-5 batch-4 queries:
MAP/MRR (brute-force AP), power analysis (closed form), stratified ATT
(brute force), absorbing-Markov hitting probabilities (numpy linear
solve — NOT the Jacobi iteration both engines use, so an iteration bug
shows up here)."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from etl_file_sync_spark.queries import REGISTRY

# (event_id, day, sec, user_id, event_type, value)
EVENTS = [
    # user 1: purchases at ranks 1 and 3 of their value ordering
    (1, 5, 0, 1, "purchase", 300.0),
    (2, 5, 1, 1, "view", 200.0),
    (3, 5, 2, 1, "purchase", 100.0),
    # user 2: single purchase at rank 2
    (4, 5, 0, 2, "click", 250.0),
    (5, 20, 1, 2, "purchase", 150.0),
    # user 3: no purchase — excluded from MAP/MRR
    (6, 20, 0, 3, "view", 90.0),
    (7, 20, 1, 3, "error", 80.0),
    # user 4: purchase first (value tie with a view broken by event_id)
    (8, 20, 0, 4, "purchase", 205.0),
    (9, 20, 1, 4, "view", 205.0),
    # transitions fodder for the markov chain
    (10, 5, 3, 5, "view", 50.0),
    (11, 5, 4, 5, "click", 60.0),
    (12, 5, 5, 5, "error", 70.0),
    (13, 20, 2, 6, "signup", 40.0),
    (14, 20, 3, 6, "purchase", 240.0),
]


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("toy_b4"))
    spark.createDataFrame(
        [
            (i, f"2024-03-{day:02d} 00:00:{sec:02d}", u, et, v, "{}")
            for i, day, sec, u, et, v in EVENTS
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_map_mrr_matches_bruteforce(spark, toy_dir):
    got = REGISTRY["eval_map_mrr"].build(spark, toy_dir).collect()[0]
    by_user: dict[int, list] = {}
    for i, _d, _s, u, et, v in EVENTS:
        by_user.setdefault(u, []).append((-v, i, et == "purchase"))
    aps, rrs = [], []
    for u, evs in by_user.items():
        evs.sort()
        rel = [k + 1 for k, (_v, _i, r) in enumerate(evs) if r]
        if not rel:
            continue
        aps.append(sum((j + 1) / rk for j, rk in enumerate(rel)) / len(rel))
        rrs.append(1.0 / rel[0])
    assert got.n_users == len(aps)
    assert got.map == pytest.approx(sum(aps) / len(aps), abs=1e-5)
    assert got.mrr == pytest.approx(sum(rrs) / len(rrs), abs=1e-5)
    # user 4's tie (205.0 twice) must resolve by event_id: purchase first
    assert rrs and max(rrs) == 1.0


def test_power_analysis_closed_form(spark, toy_dir):
    got = REGISTRY["stat_power_analysis"].build(spark, toy_dir).collect()[0]
    # control = even users {2,4,6}; conv = purchase & value>200: u4 (205), u6 (240)
    n0, s0 = 3, 2
    p0 = s0 / n0
    p1 = min(1.0, p0 * 1.1)
    z2 = (1.96 + 0.8416) ** 2
    n_arm = math.ceil(z2 * (p0 * (1 - p0) + p1 * (1 - p1)) / (p1 - p0) ** 2)
    assert got.n_control_observed == n0
    assert got.p0 == pytest.approx(p0, abs=1e-5)
    assert got.n_per_arm == n_arm
    assert got.mde_at_n == pytest.approx(
        (1.96 + 0.8416) * math.sqrt(2 * p0 * (1 - p0) / n0), abs=1e-5
    )


def test_stratified_att_matches_bruteforce(spark, toy_dir):
    got = REGISTRY["stat_propensity_stratified_att"].build(spark, toy_dir).collect()[0]
    pre, post = {}, {}
    users = sorted({u for _i, _d, _s, u, _e, _v in EVENTS})
    for _i, day, _s, u, _et, v in EVENTS:
        tgt = pre if day < 16 else post
        tgt[u] = tgt.get(u, 0) + round(v * 100)
    n = len(users)
    order = sorted(users, key=lambda u: (pre.get(u, 0), u))
    stratum = {u: ((rn * 5) // n) + 1 for rn, u in enumerate(order)}
    cells: dict[int, list] = {}
    for u in users:
        cells.setdefault(stratum[u], []).append(u)
    att_num, nt_all, used = 0.0, 0, 0
    terms = []
    for s, members in cells.items():
        tr = [post.get(u, 0) for u in members if u % 2 == 1]
        ct = [post.get(u, 0) for u in members if u % 2 == 0]
        if tr and ct:
            used += 1
            nt_all += len(tr)
            terms.append((len(tr), sum(tr) / len(tr) - sum(ct) / len(ct)))
    att = sum(nt * d for nt, d in terms) / nt_all
    assert got.n_strata_used == used
    assert got.n_treated == nt_all
    assert got.att_cents == pytest.approx(att, abs=1e-3)


def test_markov_absorption_matches_linear_solve(spark, toy_dir):
    rows = {r.state: r.p_error_before_purchase
            for r in REGISTRY["behavior_markov_absorption"].build(spark, toy_dir).collect()}
    # empirical kernel from consecutive pairs per user
    by_user: dict[int, list] = {}
    for i, day, sec, u, et, _v in EVENTS:
        by_user.setdefault(u, []).append((day, sec, i, et))
    trans: dict[tuple, int] = {}
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, _, a), (_, _, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans})
    tot = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    # linear solve h = Ph with h(error)=1, h(purchase)=0 restricted to
    # source states (targets outside the source set contribute 0)
    trans_states = [s for s in states if s not in ("error", "purchase")]
    idx = {s: k for k, s in enumerate(trans_states)}
    A = np.eye(len(trans_states))
    b = np.zeros(len(trans_states))
    for (a, t), c in trans.items():
        if a in idx:
            pr = c / tot[a]
            if t == "error":
                b[idx[a]] += pr
            elif t in idx:
                A[idx[a], idx[t]] -= pr
    h = np.linalg.solve(A, b)
    for s in trans_states:
        assert rows[s] == pytest.approx(h[idx[s]], abs=1e-4), s
    assert rows.get("error", 1.0) == 1.0
    assert rows.get("purchase", 0.0) == 0.0
