"""Independent-definition truth tests for the round-5 batch-5 queries:
Holt linear smoothing (hand-computed recurrence), Nelson-Aalen
(direct formula), Cohen's d / Hedges g (numpy), KMV Jaccard
(hashlib brute force)."""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pytest

from etl_file_sync_spark.queries import REGISTRY

# (o_orderkey, o_totalprice, month) — 4 months, known cents
ORDERS = [
    (1, 100.00, "2024-01"),
    (2, 200.00, "2024-02"),
    (3, 150.00, "2024-03"),
    (4, 300.00, "2024-04"),
]

# (event_id, sec, user_id, event_type, value) — lifetimes 0/10/10/20/30
EVENTS = [
    (1, 0, 1, "click", 50.0),
    (2, 10, 1, "error", 150.0),
    (3, 0, 2, "click", 120.0),
    (4, 10, 2, "view", 80.0),
    (5, 0, 3, "click", 200.0),
    (6, 20, 3, "error", 30.0),
    (7, 5, 4, "view", 100.0),
    (8, 0, 5, "click", 101.0),
    (9, 30, 5, "error", 99.0),
]

DOCS = [
    (0, "a b c d e f g", "en", "src0"),
    (1, "a b c d x y z", "en", "src0"),
    (2, "p q r s t u v", "en", "src1"),
    (3, "a b c p q r s", "en", "src1"),
]


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("toy_b5"))
    spark.createDataFrame(
        [(k, p, f"{m}-10") for k, p, m in ORDERS],
        "o_orderkey bigint, o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "CAST(1 AS BIGINT) AS o_custkey", "'O' AS o_orderstatus",
        "o_totalprice", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    spark.createDataFrame(
        [(i, f"2024-03-01 00:00:{s:02d}", u, et, v, "{}") for i, s, u, et, v in EVENTS],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    spark.createDataFrame(
        DOCS, "doc_id bigint, text string, lang string, source string"
    ).selectExpr(
        "doc_id", "text", "lang", "source", "length(text) AS n_chars"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_holt_linear_hand_recurrence(spark, toy_dir):
    rows = sorted(
        REGISTRY["ts_holt_linear"].build(spark, toy_dir).collect(),
        key=lambda r: r.month,
    )
    y = [round(p * 100) for _k, p, _m in ORDERS]
    a, b = 0.5, 0.3
    l, tr = float(y[0]), float(y[1] - y[0])
    hand = []
    # t=2 (second month)
    fitted = l + tr
    l_new = a * y[1] + (1 - a) * (l + tr)
    tr = b * (l_new - l) + (1 - b) * tr
    l = l_new
    hand.append((y[1], l, tr, fitted, 0))
    for yt in y[2:]:
        fitted = l + tr
        l_new = a * yt + (1 - a) * (l + tr)
        tr = b * (l_new - l) + (1 - b) * tr
        l = l_new
        hand.append((yt, l, tr, fitted, 0))
    for h in (1, 2, 3):
        hand.append((None, l, tr, l + h * tr, h))
    assert len(rows) == len(hand)  # months 2..4 + 3 forecasts
    for r, (yy, ll, tt, ff, hh) in zip(rows, hand):
        assert r.y_cents == yy
        assert r.level == pytest.approx(ll, abs=1e-3)
        assert r.trend == pytest.approx(tt, abs=1e-3)
        assert r.fitted == pytest.approx(ff, abs=1e-3)
        assert r.horizon == hh
    # forecast months extend the calendar: 2024-05/06/07
    assert str(rows[-1].month)[:7] == "2024-07"


def test_nelson_aalen_direct_formula(spark, toy_dir):
    rows = {r.dur_s: r for r in REGISTRY["stat_nelson_aalen"].build(spark, toy_dir).collect()}
    # lifetimes: {1:10 obs, 2:10 cens, 3:20 obs, 4:0 cens, 5:30 obs}
    lt = {1: (10, 1), 2: (10, 0), 3: (20, 1), 4: (0, 0), 5: (30, 1)}
    times = sorted({d for d, _ in lt.values()})
    ch = vh = 0.0
    want = {}
    for tm in times:
        n = sum(1 for d, _ in lt.values() if d >= tm)
        dd = sum(1 for d, o in lt.values() if d == tm and o)
        if dd > 0:
            ch += dd / n
            vh += dd / (n * n)
            want[tm] = (dd, n, ch, vh)
    assert set(rows) == set(want)  # only event times emitted
    for tm, (dd, n, c, v) in want.items():
        r = rows[tm]
        assert (r.n_events, r.n_at_risk) == (dd, n)
        assert r.cum_hazard == pytest.approx(c, abs=1e-5)
        assert r.var_hazard == pytest.approx(v, abs=1e-5)
        assert r.surv_na == pytest.approx(math.exp(-c), abs=1e-5)
    # Nelson-Aalen survival dominates Kaplan-Meier everywhere
    km = {r.dur_s: r.survival for r in REGISTRY["stat_kaplan_meier"].build(spark, toy_dir).collect()}
    for tm in want:
        assert rows[tm].surv_na >= km[tm] - 1e-9


def test_cohens_d_matches_numpy(spark, toy_dir):
    got = REGISTRY["stat_cohens_d"].build(spark, toy_dir).collect()[0]
    spend: dict[int, int] = {}
    for _i, _s, u, _et, v in EVENTS:
        spend[u] = spend.get(u, 0) + round(v * 100)
    g0 = np.array([c for u, c in spend.items() if u % 2 == 0], dtype=float)
    g1 = np.array([c for u, c in spend.items() if u % 2 == 1], dtype=float)
    pooled = math.sqrt(
        ((len(g0) - 1) * g0.var(ddof=1) + (len(g1) - 1) * g1.var(ddof=1))
        / (len(g0) + len(g1) - 2)
    )
    d = (g1.mean() - g0.mean()) / pooled
    n = len(g0) + len(g1)
    assert (got.n_ctrl, got.n_treat) == (len(g0), len(g1))
    assert got.cohens_d == pytest.approx(d, abs=1e-5)
    assert got.hedges_g == pytest.approx(d * (1 - 3 / (4 * n - 9)), abs=1e-5)


def test_kmv_jaccard_matches_hashlib(spark, toy_dir):
    got = REGISTRY["sketch_kmv_jaccard"].build(spark, toy_dir).collect()[0]
    side = {0: set(), 1: set()}
    for i, text, _l, _s in DOCS:
        tk = text.split()
        side[i % 2] |= {" ".join(tk[k : k + 3]) for k in range(len(tk) - 2)}
    union = side[0] | side[1]
    inter = side[0] & side[1]
    hs = sorted(
        (int(hashlib.md5(g.encode()).hexdigest()[:15], 16), g) for g in union
    )
    k = min(256, len(hs))
    bottom = {g for _h, g in hs[:k]}
    overlap = len(bottom & inter)
    assert got.k_used == k
    assert got.overlap == overlap
    assert got.jaccard_est == pytest.approx(overlap / k, abs=1e-5)
    assert got.jaccard_true == pytest.approx(len(inter) / len(union), abs=1e-5)
    # tiny corpus: union <= k, so the estimate must be EXACT
    assert len(union) <= 256 and got.est_err == pytest.approx(0.0, abs=1e-5)


def test_kneser_ney_matches_pure_python(spark, toy_dir):
    rows = {r.source: r for r in REGISTRY["text_bigram_lm_kn"].build(spark, toy_dir).collect()}
    from collections import Counter

    inst = Counter()
    for _i, text, _l, src in DOCS:
        tk = text.split()
        for v, w in zip(tk, tk[1:]):
            inst[(src, v, w)] += 1
    cvw = Counter()
    for (src, v, w), m in inst.items():
        cvw[(v, w)] += m
    cv, n1p, n1w = Counter(), Counter(), Counter()
    for (v, w), c in cvw.items():
        cv[v] += c
        n1p[v] += 1
        n1w[w] += 1
    T = len(cvw)
    d = 0.75
    for src in {s for s, _v, _w in inst}:
        tot = lp = 0
        for (s, v, w), m in inst.items():
            if s != src:
                continue
            p = (cvw[(v, w)] - d) / cv[v] + (d * n1p[v] / cv[v]) * (n1w[w] / T)
            lp += m * math.log(p)
            tot += m
        r = rows[src]
        assert r.n_bigrams == tot, src
        assert r.cross_entropy_nats == pytest.approx(-lp / tot, abs=1e-5), src
        assert r.ppl == pytest.approx(math.exp(-lp / tot), abs=1e-3), src
    # KN probabilities must sum to 1 over the full vocab per context:
    # check one context against the closed form
    vocab = sorted({w for _v, w in cvw} | {v for v, _w in cvw})
    v0 = vocab[0] if cv[vocab[0]] > 0 else next(v for v in vocab if cv[v] > 0)
    mass = sum(
        (max(cvw.get((v0, w), 0) - d, 0)) / cv[v0]
        + (d * n1p[v0] / cv[v0]) * (n1w[w] / T)
        for w in {w for _v, w in cvw}
    )
    assert mass == pytest.approx(1.0, abs=1e-9)


def test_ece_matches_bruteforce_from_scores(spark, sf_dir):
    got = REGISTRY["eval_expected_calibration_error"].build(spark, sf_dir).collect()[0]
    scored = REGISTRY["text_quality_logistic"].build(spark, sf_dir).collect()
    import os

    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).collect()
    }
    bins: dict[int, list] = {}
    for r in scored:
        s = round(r.quality_prob, 4)
        b = min(int(s * 10), 9)
        bins.setdefault(b, []).append((s, 1 if langs[r.doc_id] == "en" else 0))
    n = sum(len(v) for v in bins.values())
    ece = mce = 0.0
    for b, items in bins.items():
        conf = sum(round(s * 10000) for s, _l in items) / (10000.0 * len(items))
        acc = sum(l for _s, l in items) / len(items)
        gap = abs(acc - conf)
        ece += len(items) / n * gap
        mce = max(mce, gap)
    assert got.n_bins == len(bins)
    assert got.n_docs == n
    assert got.ece == pytest.approx(ece, abs=1e-5)
    assert got.mce == pytest.approx(mce, abs=1e-5)
    assert 0.0 <= got.ece <= got.mce <= 1.0


def test_runs_test_hand_case(spark, toy_dir):
    got = REGISTRY["stat_runs_test"].build(spark, toy_dir).collect()[0]
    cents = [round(p * 100) for _k, p, _m in ORDERS]  # months in order
    n = len(cents)
    s = sum(cents)
    hi = [1 if c * n > s else 0 for c in cents]
    runs = 1 + sum(1 for a, b in zip(hi, hi[1:]) if a != b)
    n1, n2 = sum(hi), n - sum(hi)
    e = 1 + 2 * n1 * n2 / (n1 + n2)
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    assert (got.n, got.n1, got.n2, got.runs) == (n, n1, n2, runs)
    assert got.e_runs == pytest.approx(e, abs=1e-5)
    assert got.z == pytest.approx((runs - e) / math.sqrt(var), abs=1e-5)


def test_zorder_matches_bruteforce_morton(spark, toy_dir):
    rows = {r.z_bucket: r for r in REGISTRY["layout_zorder_buckets"].build(spark, toy_dir).collect()}
    import datetime

    o = [(k, 1, datetime.date.fromisoformat(f"{m}-10").toordinal() - datetime.date(1970, 1, 1).toordinal())
         for k, _p, m in ORDERS]
    n = len(o)
    by_cust = sorted(o, key=lambda r: (r[1], r[0]))
    by_day = sorted(o, key=lambda r: (r[2], r[0]))
    x = {k: ((rn * 65536) // n) for rn, (k, _c, _d) in enumerate(by_cust)}
    y = {k: ((rn * 65536) // n) for rn, (k, _c, _d) in enumerate(by_day)}

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want: dict[int, list] = {}
    for k, c, d in o:
        want.setdefault(morton(x[k], y[k]) // (1 << 28), []).append((c, d))
    assert set(rows) == set(want)
    for zb, members in want.items():
        r = rows[zb]
        assert r.n_orders == len(members)
        assert (r.min_cust, r.max_cust) == (min(c for c, _ in members), max(c for c, _ in members))
        assert (r.min_day, r.max_day) == (min(d for _, d in members), max(d for _, d in members))


def test_zorder_buckets_bound_both_dims_at_sf(spark, sf_dir):
    """The Z-order property on real data: per bucket, BOTH dimension
    spans are a fraction of the global span (a linear sort on custkey
    alone would leave day spans at ~100%)."""
    rows = REGISTRY["layout_zorder_buckets"].build(spark, sf_dir).collect()
    g_cust = max(r.max_cust for r in rows) - min(r.min_cust for r in rows)
    g_day = max(r.max_day for r in rows) - min(r.min_day for r in rows)
    weighted_cust = sum(r.n_orders * (r.max_cust - r.min_cust) for r in rows) / sum(
        r.n_orders for r in rows
    )
    weighted_day = sum(r.n_orders * (r.max_day - r.min_day) for r in rows) / sum(
        r.n_orders for r in rows
    )
    assert weighted_cust <= 0.6 * g_cust
    assert weighted_day <= 0.6 * g_day


def test_langid_confusion_matches_bruteforce(spark, sf_dir):
    import os

    from etl_file_sync_spark.operators import text as X

    rows = REGISTRY["eval_langid_confusion"].build(spark, sf_dir).collect()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).collect()
    from collections import Counter

    cells = Counter()
    for r in docs:
        words = set(r.text.split())
        hits = {lang: len(words & set(ws)) for lang, ws in X.LANG_PROFILES.items()}
        best = max(hits.values())
        if best == 0:
            pred = "und"
        else:
            # tie broken toward the max language code (zh > fr > es > en > de)
            pred = max((l for l, h in hits.items() if h == best))
        cells[(r.lang, pred)] += 1
    got = {(r.lang, r.lang_pred): r.n_docs for r in rows}
    assert got == dict(cells)
    tot = Counter()
    for (lang, _p), c in cells.items():
        tot[lang] += c
    for r in rows:
        assert r.frac_of_true_lang == pytest.approx(
            cells[(r.lang, r.lang_pred)] / tot[r.lang], abs=1e-5
        )


def test_holm_stepdown_matches_textbook(spark, sf_dir):
    rows = REGISTRY["stat_holm_stepdown"].build(spark, sf_dir).collect()
    # independent: textbook Holm on the same per-cell p-values (shared
    # construction with stat_bh_fdr, whose p-values have their own
    # truth tests) — adjusted p_(i) = max_{j<=i} (m-j+1) p_(j), clip 1
    ps = sorted((r.p_value, r.event_type, r.hr, r.p_holm) for r in rows)
    m = len(ps)
    run = 0.0
    for i, (p, _et, _hr, got_holm) in enumerate(ps, start=1):
        run = max(run, (m - i + 1) * p)
        assert got_holm == pytest.approx(min(1.0, run), abs=1e-5), (i, p)
    # monotonicity: rejections form a prefix of the p-ranked list
    rejects = [r for _p, _e, _h, r in [(p, e, h, g) for p, e, h, g in ps]]
    flags = [g <= 0.05 for _p, _e, _h, g in ps]
    assert flags == sorted(flags, reverse=True)
    # Holm (FWER) never rejects more than BH (FDR) at the same alpha
    bh = {(r.event_type, r.hr): r.reject for r in REGISTRY["stat_bh_fdr"].build(spark, sf_dir).collect()}
    holm = {(r.event_type, r.hr): r.reject for r in rows}
    assert all(bh[k] or not holm[k] for k in holm)


def test_brier_decomposition_matches_bruteforce(spark, sf_dir):
    got = REGISTRY["eval_brier_decomposition"].build(spark, sf_dir).collect()[0]
    import os

    scored = REGISTRY["text_quality_logistic"].build(spark, sf_dir).collect()
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).collect()
    }
    items = [
        (round(r.quality_prob, 4), 1 if langs[r.doc_id] == "en" else 0) for r in scored
    ]
    n = len(items)
    brier = sum((f - o) ** 2 for f, o in items) / n
    bins: dict[int, list] = {}
    for f, o in items:
        bins.setdefault(min(int(f * 10), 9), []).append((f, o))
    obar = sum(o for _f, o in items) / n
    rel = sum(
        len(v) / n * (sum(f for f, _o in v) / len(v) - sum(o for _f, o in v) / len(v)) ** 2
        for v in bins.values()
    )
    res = sum(
        len(v) / n * (sum(o for _f, o in v) / len(v) - obar) ** 2 for v in bins.values()
    )
    unc = obar * (1 - obar)
    assert got.n_docs == n
    assert got.brier == pytest.approx(brier, abs=1e-5)
    assert got.reliability == pytest.approx(rel, abs=1e-5)
    assert got.resolution == pytest.approx(res, abs=1e-5)
    assert got.uncertainty == pytest.approx(unc, abs=1e-5)
    # Murphy identity up to within-bin score variance (nonnegative gap)
    gap = brier - (rel - res + unc)
    assert -1e-9 <= gap <= 0.05


def test_freshness_sla_matches_bruteforce(spark, toy_dir):
    rows = {r.event_type: r for r in REGISTRY["dq_freshness_sla"].build(spark, toy_dir).collect()}
    last: dict[str, int] = {}
    for _i, sec, _u, et, _v in EVENTS:
        last[et] = max(last.get(et, 0), sec)
    hi = max(last.values())
    for et, s in last.items():
        r = rows[et]
        assert r.lag_s == hi - s, et
        assert bool(r.sla_breach) == ((hi - s) > 3600), et


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    got = REGISTRY["stat_brown_forsythe"].build(spark, sf_dir).collect()[0]
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).collect()
    by_pri: dict[str, list] = {}
    for r in orders:
        by_pri.setdefault(r.o_orderpriority, []).append(round(r.o_totalprice * 100))
    zs = []
    for pri, vals in by_pri.items():
        vals = sorted(vals)
        med = vals[((len(vals) - 1) * 50) // 100]  # exact type-1 median
        zs.append(np.abs(np.array(vals, dtype=float) - med))
    k = len(zs)
    nn = sum(len(z) for z in zs)
    zbar = sum(z.sum() for z in zs) / nn
    between = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = (nn - k) / (k - 1) * between / within
    assert (got.k_groups, got.n_total) == (k, nn)
    assert got.f_stat == pytest.approx(f, rel=1e-4)


def test_sim_topk_int8_matches_numpy_and_recalls_exact(spark, sf_dir):
    rows = REGISTRY["sim_topk_int8"].build(spark, sf_dir).collect()
    import os

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).collect()
    }

    def dequant(v):
        amax = np.max(np.abs(v))
        if amax == 0:
            return np.zeros_like(v)
        s = amax / 127.0
        return np.clip(np.floor(v / s + 0.5), -127, 127) * s

    dq = {k: dequant(v) for k, v in emb.items()}
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.neighbor_id, r.cosine))
    assert set(got) == set(range(5))
    for qid in range(5):
        qv = dq[qid]
        scores = sorted(
            (
                (-float(np.dot(dq[c], qv) / (np.linalg.norm(dq[c]) * np.linalg.norm(qv))), c)
                for c in dq
                if c != qid and np.linalg.norm(dq[c]) > 0
            ),
        )[:3]
        want = [(i + 1, c, round(-s, 6)) for i, (s, c) in enumerate(scores)]
        have = sorted(got[qid])
        assert [w[1] for w in want] == [h[1] for h in have], qid
        for w, h in zip(want, have):
            assert h[2] == pytest.approx(w[2], abs=1e-5)
        # quantized top-3 overlaps the EXACT (float) top-3 well: the
        # int8 grid moves cosines by ~1e-3 at most on unit-scale vectors
        exact = sorted(
            (
                (-float(np.dot(emb[c], emb[qid]) / (np.linalg.norm(emb[c]) * np.linalg.norm(emb[qid]))), c)
                for c in emb
                if c != qid
            ),
        )[:3]
        overlap = {c for _s, c in exact} & {h[1] for h in have}
        assert len(overlap) >= 2, qid


def test_fisher_exact_matches_lgamma(spark, sf_dir):
    """Independent definition: the hypergeometric pmf via math.lgamma
    (a DIFFERENT ln-factorial than the engines' ordered ln-folds), and
    the classic table [[1,9],[11,3]] against its textbook p=0.0027594."""
    got = REGISTRY["stat_fisher_exact"].build(spark, sf_dir).collect()[0]
    a, b, c, d = got.a, got.b, got.c, got.d

    def fisher(a, b, c, d):
        n, m, ab, cd = a + b + c + d, a + c, a + b, c + d

        def lnC(N, K):
            return math.lgamma(N + 1) - math.lgamma(K + 1) - math.lgamma(N - K + 1)

        lo, hi = max(0, m - cd), min(ab, m)
        base = math.exp(lnC(ab, a) + lnC(cd, m - a) - lnC(n, m)) * (1 + 1e-7)
        return sum(
            math.exp(lnC(ab, k) + lnC(cd, m - k) - lnC(n, m))
            for k in range(lo, hi + 1)
            if math.exp(lnC(ab, k) + lnC(cd, m - k) - lnC(n, m)) <= base
        )

    assert got.p_value == pytest.approx(fisher(a, b, c, d), abs=1e-5)
    assert 0.0 <= got.p_value <= 1.0 + 1e-9
    if b * c != 0:
        assert got.odds_ratio == pytest.approx((a * d) / (b * c), abs=1e-5)
    assert fisher(1, 9, 11, 3) == pytest.approx(0.0027594, abs=1e-6)
