"""Monte-Carlo CALIBRATION of the statistical-test machinery.

The one bug class every oracle layer is blind to is a convention error
mirrored into both engines AND the truth test — e.g. runs-up-and-down
moments stated in "number of signs" where the literature uses "number of
observations" (found by review in round 5; fixed). The oracle proves
Spark == DuckDB, the truth test proves Spark == the-test-author's-
reading; neither proves the formula is the CLASSICAL one.

This module closes that hole with a two-link chain per statistic:

1. CALIBRATION — an implementation of the statistic written here,
   independently from the literature formulas, is run on thousands of
   SIMULATED NULL datasets; its p-values must reject at ~alpha. A
   moments convention error (the round-5 bug biased E[R] low by 2/3)
   shifts the rejection rate and fails this immediately. Asymptotic
   tests get a tolerance band around alpha; exact/discrete tests must
   be conservative (rate <= alpha) but not degenerate.
2. AGREEMENT — the same independent implementation, fed the SAME tier
   input the registry query consumes (re-prepared from the parquet with
   pandas), must reproduce the Spark query's published statistic and
   p-value at the query's rounding grain.

Calibrated formula + engine agrees with formula => engine calibrated.

Normal tails here use exact math.erfc; the queries publish the
Abramowitz-Stegun 7.1.26 erf approximation (abs err <= 1.5e-7), so
p agreement tolerances carry a few-1e-7 allowance on top of the
published rounding. Chi-square tails are the exact even-df closed forms
in both places.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

ALPHA = 0.05
Z_SEED = 20260815

# ---------------------------------------------------------------- tails


def norm_sf_two_sided(z: float) -> float:
    return math.erfc(abs(z) / math.sqrt(2.0))


def chi2_sf_even_df(x: float, df: int) -> float:
    """Exact survival function for even df: exp(-x/2) * sum (x/2)^j / j!."""
    assert df % 2 == 0
    h = x / 2.0
    term, s = 1.0, 1.0
    for j in range(1, df // 2):
        term *= h / j
        s += term
    return math.exp(-h) * s


def binom_cdf_half(k: int, m: int) -> float:
    """P(Bin(m, 1/2) <= k) via log-factorials (exact to fp)."""
    lnf = [0.0] * (m + 1)
    for i in range(2, m + 1):
        lnf[i] = lnf[i - 1] + math.log(i)
    return sum(
        math.exp(lnf[m] - lnf[j] - lnf[m - j] - m * math.log(2.0)) for j in range(k + 1)
    )


def rate_band(rej: np.ndarray, lo: float = 0.03, hi: float = 0.07) -> None:
    r = float(np.mean(rej))
    assert lo <= r <= hi, f"null rejection rate {r:.4f} outside [{lo}, {hi}]"


# ================================================================ stats
# Each returns the published columns; written from the literature, used
# by BOTH the simulation and the tier-agreement checks.


def runs_up_down(x: np.ndarray) -> dict:
    """Runs up-and-down (difference signs, ties dropped). Classical
    moments in N = observations: E[R]=(2N-1)/3, Var[R]=(16N-29)/90;
    with n = retained signs and N = n+1: E=(2n+1)/3, Var=(16n-13)/90."""
    s = np.sign(np.diff(x))
    s = s[s != 0]
    n = len(s)
    runs = int(1 + np.sum(s[1:] != s[:-1]))
    e = (2.0 * n + 1) / 3
    v = (16.0 * n - 13) / 90
    z = (runs - e) / math.sqrt(v)
    return {"n_moves": n, "n_runs": runs, "z_stat": z, "p_value": norm_sf_two_sided(z)}


def runs_above_mean(x_int: np.ndarray) -> dict:
    """Wald-Wolfowitz runs around the MEAN (exact integer cross-multiply
    for the dichotomy, as the query does)."""
    n = len(x_int)
    tot = int(np.sum(x_int))
    hi = (x_int.astype(object) * n > tot).astype(int)
    n1 = int(np.sum(hi))
    n2 = n - n1
    runs = int(1 + np.sum(hi[1:] != hi[:-1]))
    e = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    z = (runs - e) / math.sqrt(v)
    return {"n": n, "n1": n1, "n2": n2, "runs": runs, "e_runs": e, "z": z}


def mann_kendall(x: np.ndarray) -> dict:
    """Mann-Kendall S with the tie-corrected variance and the +-1
    continuity correction (Kendall 1975)."""
    n = len(x)
    d = np.sign(x[None, :] - x[:, None])
    s = int(np.sum(np.triu(d, k=1)))
    _, counts = np.unique(x, return_counts=True)
    tie = int(np.sum(counts * (counts - 1) * (2 * counts + 5)))
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    cc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
    z = cc / math.sqrt(var)
    return {"n_periods": n, "s_stat": s, "z": z, "p_value": norm_sf_two_sided(z)}


def page_trend(y: np.ndarray) -> dict:
    """Page's L over a (b, k) block matrix, treatments ordered 1..k.
    E[L] = b k (k+1)^2 / 4, Var[L] = b k^2 (k+1)(k^2-1) / 144."""
    b, k = y.shape
    rk = pd.DataFrame(y.T).rank(axis=0, method="average").to_numpy()  # ranks in block
    rank_sum = rk.sum(axis=1)  # per treatment (index 0..k-1 = trt 1..k)
    treat = np.arange(1, k + 1)
    l_stat = float(np.sum(treat * rank_sum))
    e = b * k * (k + 1) ** 2 / 4.0
    v = b * k**2 * (k + 1) * (k**2 - 1) / 144.0
    z = (l_stat - e) / math.sqrt(v)
    return {"n_blocks": b, "l_stat": l_stat, "z_stat": z, "p_value": norm_sf_two_sided(z)}


def ljung_box(x: np.ndarray, h: int = 6) -> dict:
    """Ljung-Box Q over lags 1..h; chi-square df = h."""
    n = len(x)
    mu = float(np.mean(x))
    c = x - mu
    denom = float(np.sum(c * c))
    q = 0.0
    for k in range(1, h + 1):
        rk = float(np.sum(c[k:] * c[:-k])) / denom
        q += rk * rk / (n - k)
    q *= n * (n + 2.0)
    return {"n_days": n, "n_lags": h, "q_stat": q, "p_value": chi2_sf_even_df(q, h)}


def breusch_pagan(x: np.ndarray, y: np.ndarray) -> dict:
    """Koenker's studentized Breusch-Pagan LM: n * R^2 of e^2 on x
    (univariate regressor), chi-square df = 1."""
    n = len(x)
    mx, my = float(np.mean(x)), float(np.mean(y))
    sxx = float(np.sum((x - mx) ** 2))
    sxy = float(np.sum((x - mx) * (y - my)))
    e = (y - my) - sxy / sxx * (x - mx)
    e2 = e * e
    ue = float(np.mean(e2))
    sxu = float(np.sum((x - mx) * (e2 - ue)))
    suu = float(np.sum((e2 - ue) ** 2))
    lm = n * (sxu * sxu) / (sxx * suu)
    return {"n_rows": n, "bp_stat": lm, "p_value": math.erfc(math.sqrt(lm / 2.0))}


def g_test(table: np.ndarray) -> dict:
    """G-test of independence on an r x c count table."""
    nt = float(table.sum())
    rt = table.sum(axis=1, keepdims=True)
    ct = table.sum(axis=0, keepdims=True)
    e = rt * ct / nt
    mask = table > 0
    g = 2.0 * float(np.sum(table[mask] * np.log(table[mask] / e[mask])))
    df = (table.shape[0] - 1) * (table.shape[1] - 1)
    return {"g_stat": g, "p_value": chi2_sf_even_df(g, df)}


def cochran_q(t: np.ndarray) -> dict:
    """Cochran's Q over an (n, k) binary matrix; chi-square df = k-1."""
    n, k = t.shape
    cj = t.sum(axis=0).astype(float)
    ri = t.sum(axis=1).astype(float)
    sr, srr = float(ri.sum()), float(np.sum(ri * ri))
    q = k * (k - 1) * float(np.sum((cj - sr / k) ** 2)) / (k * sr - srr)
    return {"n_users": n, "q_stat": q, "p_value": chi2_sf_even_df(q, k - 1)}


def cochran_armitage(scores: np.ndarray, n_g: np.ndarray, x_g: np.ndarray) -> dict:
    """Cochran-Armitage trend z (Armitage 1955), unconditional variance."""
    nt, xt = float(n_g.sum()), float(x_g.sum())
    p = xt / nt
    t = float(np.sum(scores * x_g))
    sn = float(np.sum(scores * n_g))
    ssn = float(np.sum(scores * scores * n_g))
    z = (t - p * sn) / math.sqrt(p * (1 - p) * (ssn - sn * sn / nt))
    return {"n_orders": int(nt), "n_success": int(xt), "z_stat": z, "p_value": norm_sf_two_sided(z)}


def mood_median(groups: list[np.ndarray]) -> dict:
    """Mood's median test: grand LOWER median dichotomy, score chi-square
    with df = k-1."""
    allv = np.sort(np.concatenate(groups))
    n = len(allv)
    m = allv[(n + 1) // 2 - 1]  # lower median: smallest v with 2*cdf >= n
    a = np.array([float(np.sum(g <= m)) for g in groups])
    ng = np.array([float(len(g)) for g in groups])
    p = a.sum() / ng.sum()
    x2 = float(np.sum((a - ng * p) ** 2 / (ng * p * (1 - p))))
    return {
        "n_groups": len(groups),
        "n_rows": int(n),
        "n_at_or_below": int(a.sum()),
        "chi2_stat": x2,
        "p_value": chi2_sf_even_df(x2, len(groups) - 1),
    }


def welch_anova(groups: list[np.ndarray]) -> dict:
    """Welch's heteroskedastic one-way ANOVA (Welch 1951)."""
    k = len(groups)
    n = np.array([len(g) for g in groups], dtype=float)
    mean = np.array([float(np.mean(g)) for g in groups])
    var = np.array([float(np.var(g, ddof=1)) for g in groups])
    w = n / var
    sw = float(w.sum())
    grand = float(np.sum(w * mean)) / sw
    a_num = float(np.sum(w * (mean - grand) ** 2))
    h = float(np.sum((1 - w / sw) ** 2 / (n - 1)))
    f = (a_num / (k - 1)) / (1 + 2.0 * (k - 2) / (k * k - 1) * h)
    df2 = (k * k - 1) / (3.0 * h)
    return {"k_groups": k, "f_stat": f, "df1": k - 1, "df2": df2}


def friedman(y: np.ndarray) -> dict:
    """Friedman's Q with the tie-adjusted denominator:
    Q = (k-1) * sum_j (R_j - b(k+1)/2)^2 / (A - bk(k+1)^2/4)."""
    b, k = y.shape
    rk = pd.DataFrame(y.T).rank(axis=0, method="average").to_numpy()
    rank_sum = rk.sum(axis=1)
    a = float(np.sum(rk * rk))
    c = b * k * (k + 1) ** 2 / 4.0
    q = (k - 1) * float(np.sum((rank_sum - b * (k + 1) / 2.0) ** 2)) / (a - c)
    return {
        "n_blocks": b,
        "rank_sum": rank_sum,
        "q_stat": q,
        "p_value": chi2_sf_even_df(q, k - 1),
    }


def sign_test(d: np.ndarray) -> dict:
    """Exact two-sided binomial sign test, zeros dropped."""
    pos = int(np.sum(d > 0))
    neg = int(np.sum(d < 0))
    m = pos + neg
    if pos == neg:
        p = 1.0
    else:
        p = min(1.0, 2.0 * binom_cdf_half(min(pos, neg), m))
    return {"n_up": pos, "n_down": neg, "p_value": p}


def kendall_tau(x: np.ndarray, y: np.ndarray) -> dict:
    """Kendall's tau-b with the no-ties normal z (Kendall 1938):
    z = 3(C-D) / sqrt(n(n-1)(2n+5)/2)."""
    n = len(x)
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    c = int(np.sum(prod > 0))
    d = int(np.sum(prod < 0))
    tx = int(np.sum(dx[iu] == 0))
    ty = int(np.sum(dy[iu] == 0))
    half = n * (n - 1) / 2.0
    tau_b = (c - d) / math.sqrt((half - tx) * (half - ty))
    z = 3.0 * (c - d) / math.sqrt(n * (n - 1.0) * (2 * n + 5) / 2.0)
    return {
        "n_days": n,
        "concordant": c,
        "discordant": d,
        "tau_b": tau_b,
        "z_stat": z,
        "p_value": norm_sf_two_sided(z),
    }


def bowker(nij: np.ndarray, nji: np.ndarray) -> dict:
    """Bowker's symmetry statistic over k(k-1)/2 unordered pairs,
    chi-square df = number of pairs with n_ij + n_ji > 0."""
    tot = nij + nji
    mask = tot > 0
    b = float(np.sum((nij[mask] - nji[mask]) ** 2 / tot[mask]))
    n_pairs = int(np.sum(mask))
    return {"n_pairs": n_pairs, "b_stat": b, "p_value": chi2_sf_even_df(b, n_pairs)}


# ===================================================== null calibration


class TestCalibration:
    """Each statistic rejects a TRUE null at ~alpha. Asymptotic tests:
    rate within [0.03, 0.07] (B >= 2000 => se <= 0.005). Exact tests:
    conservative but not degenerate."""

    def test_runs_up_down(self):
        rng = np.random.default_rng(Z_SEED)
        x = rng.random((4000, 61))
        s = np.sign(np.diff(x, axis=1))
        n = s.shape[1]
        runs = 1 + np.sum(s[:, 1:] != s[:, :-1], axis=1)
        z = (runs - (2.0 * n + 1) / 3) / np.sqrt((16.0 * n - 13) / 90)
        rate_band(np.abs(z) > 1.959964)
        # the round-5 convention bug (moments in signs, not observations)
        # biased E[R] low by 2/3: with the WRONG moments the rate drifts
        z_bad = (runs - (2.0 * n - 1) / 3) / np.sqrt((16.0 * n - 29) / 90)
        assert np.mean(np.abs(z_bad) > 1.959964) > np.mean(np.abs(z) > 1.959964)

    def test_runs_above_mean(self):
        rng = np.random.default_rng(Z_SEED + 1)
        x = rng.normal(size=(4000, 80))
        hi = (x > x.mean(axis=1, keepdims=True)).astype(int)
        n1 = hi.sum(axis=1)
        n = hi.shape[1]
        n2 = n - n1
        runs = 1 + np.sum(hi[:, 1:] != hi[:, :-1], axis=1)
        e = 1.0 + 2.0 * n1 * n2 / n
        v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        z = (runs - e) / np.sqrt(v)
        rate_band(np.abs(z) > 1.959964)

    def test_mann_kendall(self):
        rng = np.random.default_rng(Z_SEED + 2)
        rej = []
        for _ in range(2000):
            r = mann_kendall(rng.random(40))
            rej.append(r["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_page_trend(self):
        rng = np.random.default_rng(Z_SEED + 3)
        rej = [page_trend(rng.random((12, 5)))["p_value"] < ALPHA for _ in range(3000)]
        rate_band(np.array(rej))

    def test_ljung_box(self):
        rng = np.random.default_rng(Z_SEED + 4)
        rej = [ljung_box(rng.normal(size=200))["p_value"] < ALPHA for _ in range(2000)]
        rate_band(np.array(rej))

    def test_breusch_pagan(self):
        rng = np.random.default_rng(Z_SEED + 5)
        rej = []
        for _ in range(2000):
            x = rng.random(150)
            y = 2.0 + 3.0 * x + rng.normal(size=150)  # homoskedastic null
            rej.append(breusch_pagan(x, y)["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_g_test(self):
        rng = np.random.default_rng(Z_SEED + 6)
        p = np.outer([0.3, 0.25, 0.2, 0.15, 0.1], [0.5, 0.5]).ravel()
        counts = rng.multinomial(2000, p, size=2000).reshape(2000, 5, 2)
        rej = [g_test(c)["p_value"] < ALPHA for c in counts]
        rate_band(np.array(rej))

    def test_cochran_q(self):
        rng = np.random.default_rng(Z_SEED + 7)
        rej = []
        for _ in range(2000):
            pi = rng.uniform(0.2, 0.8, size=300)[:, None]
            t = (rng.random((300, 3)) < pi).astype(int)
            rej.append(cochran_q(t)["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_cochran_armitage(self):
        rng = np.random.default_rng(Z_SEED + 8)
        scores = np.arange(1, 6)
        n_g = np.full(5, 200)
        rej = []
        for _ in range(3000):
            x_g = rng.binomial(200, 0.3, size=5)
            rej.append(cochran_armitage(scores, n_g, x_g)["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_mood_median(self):
        rng = np.random.default_rng(Z_SEED + 9)
        rej = []
        for _ in range(2000):
            groups = [rng.normal(size=100) for _ in range(5)]
            rej.append(mood_median(groups)["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_friedman(self):
        rng = np.random.default_rng(Z_SEED + 10)
        rej = [friedman(rng.random((12, 5)))["p_value"] < ALPHA for _ in range(3000)]
        rate_band(np.array(rej))

    def test_sign_test_exact_is_conservative(self):
        rng = np.random.default_rng(Z_SEED + 11)
        rej = [sign_test(rng.normal(size=101))["p_value"] < ALPHA for _ in range(4000)]
        r = float(np.mean(rej))
        assert 0.02 <= r <= ALPHA + 0.01, f"exact sign test rate {r:.4f}"

    def test_kendall_tau(self):
        rng = np.random.default_rng(Z_SEED + 12)
        rej = []
        for _ in range(2000):
            r = kendall_tau(rng.random(40), rng.random(40))
            rej.append(r["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_bowker(self):
        rng = np.random.default_rng(Z_SEED + 13)
        rej = []
        for _ in range(2000):
            nij = rng.poisson(30, size=10)
            nji = rng.poisson(30, size=10)
            rej.append(bowker(nij, nji)["p_value"] < ALPHA)
        rate_band(np.array(rej))

    def test_welch_anova_is_pivotal_under_unequal_variance(self):
        """No F tail here (df2 is fractional); instead verify the Welch
        statistic's defining property: under the null with WILDLY unequal
        variances its distribution is (approx) the same as with equal
        variances — classic ANOVA F fails exactly this. Compare the 95th
        percentile across the two regimes."""
        rng = np.random.default_rng(Z_SEED + 14)
        f_eq, f_ne = [], []
        for _ in range(1500):
            eq = [rng.normal(0, 1, size=30) for _ in range(4)]
            ne = [rng.normal(0, s, size=nn) for s, nn in ((1, 20), (4, 30), (8, 40), (16, 50))]
            f_eq.append(welch_anova(eq)["f_stat"])
            f_ne.append(welch_anova(ne)["f_stat"])
        q_eq, q_ne = np.quantile(f_eq, 0.95), np.quantile(f_ne, 0.95)
        assert abs(q_eq - q_ne) / q_eq < 0.2, (q_eq, q_ne)


# ==================================================== tier agreement
# The registry query's published numbers must equal the independent
# (calibration-verified) implementation fed the SAME input, re-prepared
# from the tier parquet with pandas. Tolerances = the query's rounding
# grain (+ a few 1e-7 for the A&S erf approximation in published p's).


def _cents(x: pd.Series) -> pd.Series:
    return np.round(x * 100).astype("int64")


@pytest.fixture(scope="module")
def orders_pd(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["day"] = o["o_orderdate"].dt.normalize()
    o["month"] = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    o["cents"] = _cents(o["o_totalprice"])
    return o


def _spark_row(spark, sf_dir, name) -> dict:
    from etl_file_sync_spark.queries import REGISTRY

    pdf = REGISTRY[name].build(spark, sf_dir).toPandas()
    assert len(pdf) >= 1
    return pdf


def _daily_cents(orders_pd) -> pd.Series:
    return orders_pd.groupby("day")["cents"].sum().sort_index()


def _monthly_cents(orders_pd) -> pd.Series:
    return orders_pd.groupby("month")["cents"].sum().sort_index()


class TestTierAgreement:
    def test_runs_up_down(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_runs_up_down").iloc[0]
        ref = runs_up_down(_daily_cents(orders_pd).to_numpy())
        # the query computes p FROM its 4-dp-rounded z column
        ref["p_value"] = norm_sf_two_sided(round(ref["z_stat"], 4))
        assert got["n_moves"] == ref["n_moves"] and got["n_runs"] == ref["n_runs"]
        assert abs(got["z_stat"] - ref["z_stat"]) < 5.1e-5
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_runs_above_mean(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_runs_test").iloc[0]
        ref = runs_above_mean(_monthly_cents(orders_pd).to_numpy())
        for c in ("n", "n1", "n2", "runs"):
            assert got[c] == ref[c], c
        assert abs(got["e_runs"] - ref["e_runs"]) < 1.1e-6
        assert abs(got["z"] - ref["z"]) < 1.1e-6

    def test_mann_kendall(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_mann_kendall").iloc[0]
        ref = mann_kendall(_monthly_cents(orders_pd).to_numpy())
        assert got["n_periods"] == ref["n_periods"] and got["s_stat"] == ref["s_stat"]
        assert abs(got["z"] - ref["z"]) < 1.1e-6

    def test_page_trend(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_page_trend").iloc[0]
        o = orders_pd.copy()
        o["trt"] = o["o_orderpriority"].str[0].astype(int)
        cell = o.groupby(["month", "trt"])["cents"].sum().unstack()
        cell = cell.dropna()  # complete blocks only (all 5 treatments)
        ref = page_trend(cell.to_numpy())
        ref["p_value"] = norm_sf_two_sided(round(ref["z_stat"], 4))
        assert got["n_blocks"] == ref["n_blocks"]
        assert abs(got["l_stat"] - ref["l_stat"]) < 5.1e-3
        assert abs(got["z_stat"] - ref["z_stat"]) < 5.1e-5
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_ljung_box(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "ts_ljung_box").iloc[0]
        ref = ljung_box(_daily_cents(orders_pd).to_numpy().astype(float), h=6)
        assert got["n_days"] == ref["n_days"] and got["n_lags"] == 6
        assert abs(got["q_stat"] - ref["q_stat"]) < 1.1e-6 * max(1.0, ref["q_stat"])
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_breusch_pagan(self, spark, sf_dir):
        got = _spark_row(spark, sf_dir, "stat_breusch_pagan").iloc[0]
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
        )
        ref = breusch_pagan(
            li["l_quantity"].to_numpy(dtype=float),
            _cents(li["l_extendedprice"]).to_numpy(dtype=float),
        )
        assert got["n_rows"] == ref["n_rows"]
        assert abs(got["bp_stat"] - ref["bp_stat"]) < 5.1e-5 * max(1.0, ref["bp_stat"])
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_g_test(self, spark, sf_dir):
        got = _spark_row(spark, sf_dir, "stat_g_test_independence").iloc[0]
        o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        n = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
        r = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
        j = (
            o.merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(n, left_on="c_nationkey", right_on="n_nationkey")
            .merge(r, left_on="n_regionkey", right_on="r_regionkey")
        )
        j["arm"] = np.where(j["o_custkey"] % 2 == 0, "even", "odd")
        table = j.groupby(["r_name", "arm"]).size().unstack(fill_value=0).to_numpy()
        ref = g_test(table)
        assert got["n_orders"] == int(table.sum())
        assert abs(got["g_stat"] - ref["g_stat"]) < 5.1e-5 * max(1.0, ref["g_stat"])
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_cochran_q(self, spark, sf_dir):
        got = _spark_row(spark, sf_dir, "stat_cochran_q").iloc[0]
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
        )
        pur = ev["event_type"] == "purchase"
        t = pd.DataFrame(
            {
                "t1": (pur & (ev["value"] > 100)),
                "t2": (pur & (ev["value"] > 200)),
                "t3": (pur & (ev["value"] > 300)),
                "user_id": ev["user_id"],
            }
        ).groupby("user_id").max().astype(int)
        ref = cochran_q(t.to_numpy())
        assert got["n_users"] == ref["n_users"]
        assert (got["conv100"], got["conv200"], got["conv300"]) == tuple(
            t.sum().astype(int)
        )
        assert abs(got["q_stat"] - ref["q_stat"]) < 1.1e-6 * max(1.0, ref["q_stat"])
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_cochran_armitage(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_cochran_armitage").iloc[0]
        o = orders_pd
        score = o["o_orderpriority"].str[0].astype(int)
        suc = (o["o_totalprice"] > 250000).astype(int)
        g = pd.DataFrame({"score": score, "suc": suc}).groupby("score").agg(
            n=("suc", "size"), x=("suc", "sum")
        )
        ref = cochran_armitage(
            g.index.to_numpy(float), g["n"].to_numpy(float), g["x"].to_numpy(float)
        )
        ref["p_value"] = norm_sf_two_sided(round(ref["z_stat"], 4))
        assert got["n_orders"] == ref["n_orders"] and got["n_success"] == ref["n_success"]
        assert abs(got["z_stat"] - ref["z_stat"]) < 5.1e-5
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_mood_median(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_mood_median_test").iloc[0]
        groups = [g["cents"].to_numpy() for _, g in orders_pd.groupby("o_orderpriority")]
        ref = mood_median(groups)
        for c in ("n_groups", "n_rows", "n_at_or_below"):
            assert got[c] == ref[c], c
        assert abs(got["chi2_stat"] - ref["chi2_stat"]) < 5.1e-5 * max(1.0, ref["chi2_stat"])
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_welch_anova(self, spark, sf_dir):
        got = _spark_row(spark, sf_dir, "stat_welch_anova").iloc[0]
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
        )
        li["cents"] = _cents(li["l_extendedprice"])
        groups = [g["cents"].to_numpy(float) for _, g in li.groupby("l_returnflag")]
        ref = welch_anova(groups)
        assert got["k_groups"] == ref["k_groups"] and got["df1"] == ref["df1"]
        assert abs(got["f_stat"] - ref["f_stat"]) < 1.1e-6 * max(1.0, ref["f_stat"])
        assert abs(got["df2"] - ref["df2"]) < 1.1e-6 * max(1.0, ref["df2"])

    def test_friedman(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_friedman_test")
        cell = orders_pd.groupby(["month", "o_orderpriority"])["cents"].sum().unstack()
        cell = cell.dropna()
        ref = friedman(cell.to_numpy())
        got = got.sort_values("treatment").reset_index(drop=True)
        assert (got["n_blocks"] == ref["n_blocks"]).all()
        np.testing.assert_allclose(
            got["rank_sum"].to_numpy(), ref["rank_sum"], atol=5.1e-3
        )
        assert abs(got["q_stat"].iloc[0] - ref["q_stat"]) < 5.1e-5 * max(1.0, ref["q_stat"])
        assert abs(got["p_value"].iloc[0] - ref["p_value"]) < 2e-6

    def test_sign_test_weekly(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_sign_test_weekly").iloc[0]
        daily = _daily_cents(orders_pd)
        prev = daily.reindex(daily.index - pd.Timedelta(days=7))
        d = daily.to_numpy() - prev.to_numpy()
        d = d[~np.isnan(d)]
        ref = sign_test(d)
        assert got["n_up"] == ref["n_up"] and got["n_down"] == ref["n_down"]
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_kendall_tau_daily(self, spark, sf_dir, orders_pd):
        got = _spark_row(spark, sf_dir, "stat_kendall_tau_daily").iloc[0]
        g = orders_pd.groupby("day").agg(rev=("cents", "sum"), n=("cents", "size"))
        ref = kendall_tau(g["rev"].to_numpy(float), g["n"].to_numpy(float))
        for c in ("n_days", "concordant", "discordant"):
            assert got[c] == ref[c], c
        assert abs(got["tau_b"] - ref["tau_b"]) < 1.1e-6
        assert abs(got["z_stat"] - ref["z_stat"]) < 5.1e-5
        assert abs(got["p_value"] - ref["p_value"]) < 2e-6

    def test_bowker_symmetry(self, spark, sf_dir):
        got = _spark_row(spark, sf_dir, "stat_bowker_symmetry").iloc[0]
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        ).sort_values(["user_id", "ts", "event_id"])
        ev["next"] = ev.groupby("user_id")["event_type"].shift(-1)
        tr = ev.dropna(subset=["next"])
        tr = tr[tr["event_type"] != tr["next"]]
        lo = np.minimum(tr["event_type"], tr["next"])
        hi = np.maximum(tr["event_type"], tr["next"])
        asc = tr["event_type"] < tr["next"]
        pairs = pd.DataFrame({"i": lo, "j": hi, "up": asc.astype(int), "dn": (~asc).astype(int)})
        agg = pairs.groupby(["i", "j"])[["up", "dn"]].sum()
        ref = bowker(agg["up"].to_numpy(float), agg["dn"].to_numpy(float))
        ref["p_value"] = chi2_sf_even_df(round(ref["b_stat"], 4), 10)
        assert got["n_pairs"] == ref["n_pairs"]
        assert abs(got["b_stat"] - ref["b_stat"]) < 5.1e-5 * max(1.0, ref["b_stat"])
        if ref["n_pairs"] == 10:
            assert abs(got["p_value"] - ref["p_value"]) < 2e-6
