"""Independent-definition truth tests for the experimentation & sketch
face (round 5): log-rank, two-proportion z, CUPED, count-min, Bloom,
PMI collocations, Mann-Kendall, md5 permutation test. Tiny
hand-enumerable tables, the REAL registered queries, and values
re-derived from brute-force / closed-form / hashlib definitions — a
formula mistranslated identically into both engines still fails here."""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter

import numpy as np
import pytest

from etl_file_sync_spark.queries import REGISTRY

# (event_id, day, sec, user_id, event_type, value) — March 2024
EVENTS = [
    (1, 5, 0, 1, "click", 50.0),
    (2, 5, 10, 1, "error", 250.0),
    (3, 5, 0, 2, "purchase", 300.0),
    (4, 20, 0, 2, "view", 10.0),
    (5, 5, 0, 3, "purchase", 150.0),
    (6, 20, 30, 3, "error", 20.0),
    (7, 20, 0, 4, "purchase", 250.0),
    (8, 5, 0, 5, "view", 90.0),
    (9, 5, 10, 5, "view", 80.0),
    (10, 5, 0, 6, "error", 100.0),
    (11, 20, 40, 6, "click", 60.0),
]

# (o_orderkey, o_custkey, o_totalprice, month, o_orderpriority) — the
# two URGENT >250k rows make customers 2 and 4 the Bloom member set
ORDERS = [
    (1, 1, 1000.00, "2024-01", "3-MEDIUM"),
    (2, 2, 1100.00, "2024-02", "3-MEDIUM"),
    (3, 3, 1050.00, "2024-03", "3-MEDIUM"),
    (4, 2, 260000.00, "2024-04", "1-URGENT"),
    (5, 5, 1300.00, "2024-05", "3-MEDIUM"),
    (6, 4, 300000.00, "2024-06", "1-URGENT"),
    (7, 6, 1250.00, "2024-07", "3-MEDIUM"),
]

# "data pipeline" occurs 6x (passes the min-support 5), "the data" 3x
DOCS = [
    (0, "the data pipeline runs the data pipeline twice daily", "en", "src0"),
    (1, "a data pipeline is a data pipeline at heart", "en", "src0"),
    (2, "the data pipeline scales and the pipeline holds", "en", "src1"),
    (3, "one data pipeline to rule them all", "en", "src1"),
]


def _md5_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("toy_experiment"))
    spark.createDataFrame(
        [
            (i, f"2024-03-{day:02d} 00:{sec // 60:02d}:{sec % 60:02d}", u, et, v, "{}")
            for i, day, sec, u, et, v in EVENTS
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    spark.createDataFrame(
        [(k, c, p, f"{m}-15", pr) for k, c, p, m, pr in ORDERS],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "'O' AS o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    spark.createDataFrame(
        [(int(k),) for k in range(1, 11)], "c_custkey bigint"
    ).selectExpr(
        "c_custkey", "'c' AS c_name", "'addr' AS c_address",
        "CAST(1 AS BIGINT) AS c_nationkey", "'p' AS c_phone",
        "0.0 AS c_acctbal", "'BUILDING' AS c_mktsegment", "'x' AS c_comment",
    ).coalesce(1).write.parquet(os.path.join(d, "customer.parquet"))

    spark.createDataFrame(
        DOCS, "doc_id bigint, text string, lang string, source string"
    ).selectExpr(
        "doc_id", "text", "lang", "source", "length(text) AS n_chars"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def _lifetimes():
    by_user: dict[int, list] = {}
    for _i, day, sec, u, et, _v in EVENTS:
        by_user.setdefault(u, []).append((day * 86400 + sec, et))
    out = {}
    for u, evs in by_user.items():
        ts = [t for t, _ in evs]
        out[u] = (
            max(ts) - min(ts),
            int(any(et == "error" for _, et in evs)),
            u % 2,
        )
    return out


def test_logrank_matches_direct_formula(spark, toy_dir):
    got = REGISTRY["stat_logrank_test"].build(spark, toy_dir).collect()[0]
    lt = _lifetimes()
    times = sorted({d for d, _o, _g in lt.values()})
    o_a = e_a = v = 0.0
    na_tot = sum(1 for _d, _o, g in lt.values() if g == 0)
    nb_tot = len(lt) - na_tot
    for t in times:
        n_a = sum(1 for d, _o, g in lt.values() if d >= t and g == 0)
        n_b = sum(1 for d, _o, g in lt.values() if d >= t and g == 1)
        d_a = sum(1 for d, o, g in lt.values() if d == t and o and g == 0)
        d_b = sum(1 for d, o, g in lt.values() if d == t and o and g == 1)
        dd, n = d_a + d_b, n_a + n_b
        if dd == 0:
            continue
        o_a += d_a
        e_a += dd * n_a / n
        if n > 1:
            v += n_a * n_b * dd * (n - dd) / (n * n * (n - 1))
    assert (got.n_a, got.n_b) == (na_tot, nb_tot)
    assert got.o_a == o_a
    assert got.e_a == pytest.approx(e_a, abs=1e-5)
    assert got.var_lr == pytest.approx(v, abs=1e-5)
    assert got.chi2 == pytest.approx((o_a - e_a) ** 2 / v, abs=1e-4)


def test_two_proportion_ztest_closed_form(spark, toy_dir):
    got = REGISTRY["stat_two_proportion_ztest"].build(spark, toy_dir).collect()[0]
    # conversions (purchase & value>200): u2 (300), u4 (250) — both even
    assert (got.n_a, got.s_a, got.n_b, got.s_b) == (3, 2, 3, 0)
    pa, pb, pp = 2 / 3, 0 / 3, 2 / 6
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 3 + 1 / 3))
    assert got.z == pytest.approx(z, abs=1e-5)


def test_cuped_matches_numpy(spark, toy_dir):
    rows = {r.variant: r for r in REGISTRY["stat_cuped_adjustment"].build(spark, toy_dir).collect()}
    xs, ys, grp = {}, {}, {}
    for _i, day, _s, u, _et, v in EVENTS:
        key = "x" if day < 16 else "y"
        (xs if key == "x" else ys).setdefault(u, 0)
        d = xs if key == "x" else ys
        d[u] = d.get(u, 0) + round(v * 100)
    users = sorted({u for _i, _d, _s, u, _e, _v in EVENTS})
    x = np.array([xs.get(u, 0) for u in users], dtype=float)
    y = np.array([ys.get(u, 0) for u in users], dtype=float)
    theta = np.sum((x - x.mean()) * (y - y.mean())) / np.sum((x - x.mean()) ** 2)
    rho2 = (
        np.sum((x - x.mean()) * (y - y.mean())) ** 2
        / (np.sum((x - x.mean()) ** 2) * np.sum((y - y.mean()) ** 2))
    )
    for variant in (0, 1):
        sel = [u for u in users if u % 2 == variant]
        my = float(np.mean([ys.get(u, 0) for u in sel]))
        mx = float(np.mean([xs.get(u, 0) for u in sel]))
        r = rows[variant]
        assert r.n_users == len(sel)
        assert r.mean_y_cents == pytest.approx(my, abs=1e-3)
        assert r.adj_mean_cents == pytest.approx(my - theta * (mx - x.mean()), abs=1e-3)
        assert r.theta == pytest.approx(theta, abs=1e-5)
        assert r.rho2 == pytest.approx(rho2, abs=1e-5)
    # variance reduction is a correlation^2: bounded [0, 1]
    assert 0.0 <= rows[0].rho2 <= 1.0


def test_count_min_matches_hashlib_sketch(spark, toy_dir):
    got = {r.tok: r for r in REGISTRY["sketch_count_min"].build(spark, toy_dir).collect()}
    true = Counter(t for _i, text, _l, _s in DOCS for t in text.split())
    sketch: dict[tuple[int, int], int] = {}
    for tok, c in true.items():
        for i in range(4):
            k = (i, _md5_mod(f"{i}:{tok}", 256))
            sketch[k] = sketch.get(k, 0) + c
    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert set(got) == {tok for tok, _ in top}
    for tok, c in top:
        est = min(sketch[(i, _md5_mod(f"{i}:{tok}", 256))] for i in range(4))
        r = got[tok]
        assert (r.true_count, r.cms_est) == (c, est), tok
        assert r.cms_est >= r.true_count  # CMS never underestimates
        assert r.overcount == est - c


def test_bloom_matches_hashlib_filter(spark, toy_dir):
    got = REGISTRY["sketch_bloom_prefilter"].build(spark, toy_dir).collect()[0]
    members = {c for _k, c, p, _m, pr in ORDERS if p > 250000 and pr == "1-URGENT"}
    bits = {_md5_mod(f"{i}:{k}", 4096) for k in members for i in range(3)}
    positive = {
        c
        for c in range(1, 11)
        if all(_md5_mod(f"{i}:{c}", 4096) in bits for i in range(3))
    }
    assert got.n_customers == 10
    assert got.n_members == len(members)
    assert got.n_positive == len(positive)
    assert got.n_false_pos == len(positive - members)
    assert members <= positive  # Bloom guarantee: no false negatives


def test_pmi_matches_bruteforce(spark, toy_dir):
    rows = REGISTRY["text_pmi_collocations"].build(spark, toy_dir).collect()
    toks = [text.split() for _i, text, _l, _s in DOCS]
    uni = Counter(t for tk in toks for t in tk)
    bi = Counter((a, b) for tk in toks for a, b in zip(tk, tk[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    want = {
        (a, b): (c, uni[a], uni[b], math.log(c * n_uni * n_uni / (uni[a] * uni[b] * n_bi)))
        for (a, b), c in bi.items()
        if c >= 5
    }
    got = {(r.w1, r.w2): r for r in rows}
    assert set(got) == set(want)  # only "data pipeline" passes min-support
    for key, (c, cx, cy, pmi) in want.items():
        r = got[key]
        assert (r.c_xy, r.c_x, r.c_y) == (c, cx, cy)
        assert r.pmi == pytest.approx(pmi, abs=1e-5)


def test_mann_kendall_matches_bruteforce(spark, toy_dir):
    got = REGISTRY["stat_mann_kendall"].build(spark, toy_dir).collect()[0]
    monthly: dict[str, int] = {}
    for _k, _c, p, m, _pr in ORDERS:
        monthly[m] = monthly.get(m, 0) + round(p * 100)
    xs = [monthly[m] for m in sorted(monthly)]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    cc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    assert (got.n_periods, got.s_stat) == (n, s)
    assert got.var_num18 == n * (n - 1) * (2 * n + 5) - tie_term
    assert got.z == pytest.approx(cc / math.sqrt(var), abs=1e-5)


def test_permutation_test_matches_hashlib(spark, toy_dir):
    got = REGISTRY["stat_permutation_test"].build(spark, toy_dir).collect()[0]
    spend: dict[int, int] = {}
    for _i, _d, _s, u, _et, v in EVENTS:
        spend[u] = spend.get(u, 0) + round(v * 100)

    def diff(assign):
        a = [c for u, c in spend.items() if assign(u) == 0]
        b = [c for u, c in spend.items() if assign(u) == 1]
        if not a or not b:
            return None
        return sum(a) / len(a) - sum(b) / len(b)

    obs = diff(lambda u: u % 2)
    diffs = [
        d
        for p in range(200)
        if (d := diff(lambda u, p=p: _md5_mod(f"{p}:{u}", 2))) is not None
    ]
    extreme = sum(1 for d in diffs if abs(d) >= abs(obs))
    assert got.n_users == len(spend)
    assert got.obs_diff_cents == pytest.approx(obs, abs=1e-3)
    assert got.n_perms == len(diffs)
    assert got.n_extreme == extreme
    assert got.p_value == pytest.approx((1 + extreme) / (1 + len(diffs)), abs=1e-5)
