"""Independent-definition truth tests for the round-4c statistics.

The DuckDB oracle proves Spark and DuckDB compute the SAME thing — not
that the thing is RIGHT. These tests write tiny hand-checkable tables,
run the REAL registered queries on them, and compare against values
derived from an INDEPENDENT definition of each statistic (pairwise-
probability AUC, brute-force lift enumeration, direct-formula JSD and
Kruskal-Wallis, numpy silhouette), so a formula mistranslated
identically into both engines still fails here.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from etl_file_sync_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    """A tiny sf-dir with hand-enumerable orders/documents/embeddings."""
    d = str(tmp_path_factory.mktemp("toy_sf"))
    orders = [
        # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        (1, 10, "O", 10.00, "1995-01-01", "1-URGENT"),
        (2, 11, "O", 20.00, "1995-01-02", "1-URGENT"),
        (3, 12, "F", 30.00, "1995-01-03", "1-URGENT"),
        (4, 13, "O", 20.00, "1995-01-04", "2-HIGH"),
        (5, 14, "F", 40.00, "1995-01-05", "2-HIGH"),
        (6, 15, "O", 50.00, "1995-01-06", "2-HIGH"),
        (7, 16, "F", 60.00, "1995-01-07", "3-MEDIUM"),
        (8, 17, "O", 70.00, "1995-01-08", "3-MEDIUM"),
        (9, 18, "F", 20.00, "1995-01-09", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    docs = [
        (0, "red fish blue fish", "en", "src0"),
        (1, "red red cat", "en", "src0"),
        (2, "blue dog blue dog", "fr", "src1"),
        (3, "cat dog fish", "fr", "src1"),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string"
    ).selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars").coalesce(
        1
    ).write.parquet(os.path.join(d, "documents.parquet"))

    rng = np.random.RandomState(7)
    vecs = rng.randn(120, 4).astype("float32")
    emb = [(int(i), [float(x) for x in vecs[i]], int(i % 3)) for i in range(120)]
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))

    lineitem = [
        # (l_orderkey, l_partkey) baskets: pairs {1,2} x3, {1,3} x2, {2,3} x2
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 3),
        (4, 1), (4, 3),
        (5, 2), (5, 3),
    ]
    spark.createDataFrame(lineitem, "l_orderkey bigint, l_partkey bigint").selectExpr(
        "l_orderkey",
        "l_partkey",
        "1.0 AS l_quantity",
        "1.0 AS l_extendedprice",
        "0.0 AS l_discount",
        "0.0 AS l_tax",
        "'N' AS l_returnflag",
        "'O' AS l_linestatus",
        "CAST('1995-06-01' AS DATE) AS l_shipdate",
        "CAST(1 AS BIGINT) AS l_suppkey",
        "CAST(1 AS INT) AS l_linenumber",
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


def test_kruskal_wallis_matches_direct_formula(spark, toy_dir):
    got = REGISTRY["stat_kruskal_wallis"].build(spark, toy_dir).collect()[0]
    # independent: rank all 9 prices with midranks, H with tie correction
    prices = {
        "1-URGENT": [10.0, 20.0, 30.0],
        "2-HIGH": [20.0, 40.0, 50.0],
        "3-MEDIUM": [60.0, 70.0, 20.0],
    }
    allv = sorted(v for vs in prices.values() for v in vs)
    n = len(allv)

    def midrank(v):
        idx = [i + 1 for i, x in enumerate(allv) if x == v]
        return sum(idx) / len(idx)

    h = 12.0 / (n * (n + 1)) * sum(
        sum(midrank(v) for v in vs) ** 2 / len(vs) for vs in prices.values()
    ) - 3 * (n + 1)
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    c = 1 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    assert got.n_total == n and got.n_groups == 3
    assert got.h_stat == pytest.approx(h, abs=1e-5)
    assert got.h_tie_adj == pytest.approx(h / c, abs=1e-5)


def test_js_divergence_matches_direct_formula(spark, toy_dir):
    got = REGISTRY["stat_js_divergence"].build(spark, toy_dir).collect()[0]
    a = {"red": 3, "fish": 2, "blue": 1, "cat": 1}          # src0 unigrams
    b = {"blue": 2, "dog": 3, "cat": 1, "fish": 1}          # src1 unigrams
    na, nb = sum(a.values()), sum(b.values())
    vocab = set(a) | set(b)
    jsd = 0.0
    for t in vocab:
        p, q = a.get(t, 0) / na, b.get(t, 0) / nb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log(q / m)
    assert (got.n_tokens_a, got.n_tokens_b, got.vocab) == (na, nb, len(vocab))
    assert got.shared_vocab == len(set(a) & set(b))
    assert got.jsd_nats == pytest.approx(jsd, abs=1e-5)
    assert 0.0 <= got.jsd_nats <= math.log(2) + 1e-12  # JSD's bound in nats


def test_roc_auc_matches_pairwise_definition(spark, toy_dir):
    """AUC re-derived from its probabilistic definition: P(score_pos >
    score_neg) + 0.5 P(tie) over ALL (pos, neg) pairs — no ranks at all."""
    got = REGISTRY["eval_roc_auc"].build(spark, toy_dir).collect()[0]
    scored = REGISTRY["text_quality_logistic"].build(spark, toy_dir).collect()
    langs = {r.doc_id: r.lang for r in
             spark.read.parquet(os.path.join(toy_dir, "documents.parquet")).collect()}
    pos = [round(r.quality_prob, 4) for r in scored if langs[r.doc_id] == "en"]
    neg = [round(r.quality_prob, 4) for r in scored if langs[r.doc_id] != "en"]
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert got.auc == pytest.approx(wins / (len(pos) * len(neg)), abs=1e-5)


def test_mba_lift_matches_bruteforce(spark, toy_dir):
    rows = REGISTRY["mba_pair_lift"].build(spark, toy_dir).collect()
    baskets = {1: {1, 2}, 2: {1, 2}, 3: {1, 2, 3}, 4: {1, 3}, 5: {2, 3}}
    n = len(baskets)
    item_n = {p: sum(1 for b in baskets.values() if p in b) for p in (1, 2, 3)}
    expected = {}
    for a in (1, 2, 3):
        for b in (1, 2, 3):
            if a < b:
                n_ab = sum(1 for bk in baskets.values() if a in bk and b in bk)
                if n_ab >= 2:
                    expected[(a, b)] = (
                        n_ab,
                        n_ab / n,
                        n_ab / item_n[a],
                        n_ab * n / (item_n[a] * item_n[b]),
                    )
    assert len(rows) == len(expected)
    for r in rows:
        n_ab, sup, conf, lift = expected[(r.part_a, r.part_b)]
        assert r.n_ab == n_ab
        assert r.support == pytest.approx(sup, abs=1e-5)
        assert r.confidence == pytest.approx(conf, abs=1e-5)
        assert r.lift == pytest.approx(lift, abs=1e-5)


def test_silhouette_matches_numpy(spark, toy_dir):
    rows = REGISTRY["cluster_silhouette"].build(spark, toy_dir).collect()
    emb = spark.read.parquet(os.path.join(toy_dir, "embeddings.parquet")).collect()
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    cents = {int(i // 50): V[i] for i in V if i % 50 == 0}  # stride seed
    per_cluster: dict[int, list[float]] = {}
    for vid, v in V.items():
        cos = {
            c: round(float(np.dot(v, cv) / (np.linalg.norm(v) * np.linalg.norm(cv))), 9)
            for c, cv in cents.items()
        }
        order = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
        (c1, s1), (_c2, s2) = order[0], order[1]
        a, b = 1 - s1, 1 - s2
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        per_cluster.setdefault(c1, []).append(s)
    assert {r.centroid_id for r in rows} == set(per_cluster)
    for r in rows:
        vals = per_cluster[r.centroid_id]
        assert r.n_members == len(vals)
        assert r.avg_silhouette == pytest.approx(sum(vals) / len(vals), abs=1e-4)


def test_logloss_brier_matches_numpy(spark, toy_dir):
    got = REGISTRY["eval_logloss_brier"].build(spark, toy_dir).collect()[0]
    scored = REGISTRY["text_quality_logistic"].build(spark, toy_dir).collect()
    langs = {r.doc_id: r.lang for r in
             spark.read.parquet(os.path.join(toy_dir, "documents.parquet")).collect()}
    s = np.array([round(r.quality_prob, 4) for r in scored])
    y = np.array([1.0 if langs[r.doc_id] == "en" else 0.0 for r in scored])
    p = np.clip(s, 1e-4, 1 - 1e-4)
    assert got.n == len(s)
    assert got.log_loss == pytest.approx(
        float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))), abs=1e-5
    )
    assert got.brier_score == pytest.approx(float(np.mean((s - y) ** 2)), abs=1e-5)


@pytest.fixture(scope="module")
def toy_dir2(spark, tmp_path_factory):
    """Second toy sf-dir: varied lineitem values (Spearman needs
    variance) and a purchase-events table (Welch)."""
    d = str(tmp_path_factory.mktemp("toy_sf2"))
    orders = [
        (1, 10, "O", 10.00, "1995-01-01", "1-URGENT"),
        (2, 11, "O", 20.00, "1995-01-02", "1-URGENT"),
        (3, 12, "F", 30.00, "1995-01-03", "1-URGENT"),
        (4, 13, "O", 20.00, "1995-01-04", "2-HIGH"),
        (5, 14, "F", 40.00, "1995-01-05", "2-HIGH"),
        (6, 15, "O", 50.00, "1995-01-06", "2-HIGH"),
        (7, 16, "F", 60.00, "1995-01-07", "3-MEDIUM"),
        (8, 17, "O", 70.00, "1995-01-08", "3-MEDIUM"),
        (9, 18, "F", 20.00, "1995-01-09", "3-MEDIUM"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    li = [  # (orderkey, partkey, quantity, extendedprice) — monotone-ish with ties
        (1, 1, 1.0, 100.0), (1, 2, 2.0, 150.0), (2, 1, 3.0, 150.0),
        (2, 2, 4.0, 300.0), (3, 1, 4.0, 500.0), (3, 2, 6.0, 450.0),
        (4, 3, 7.0, 700.0), (5, 3, 8.0, 650.0),
    ]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint, l_quantity double, l_extendedprice double"
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))

    ev = [  # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 10:00:00", 2, "purchase", 10.0),
        (2, "2024-01-01 10:01:00", 4, "purchase", 20.0),
        (3, "2024-01-01 10:02:00", 6, "purchase", 35.0),
        (4, "2024-01-01 10:03:00", 8, "purchase", 15.0),
        (5, "2024-01-01 10:04:00", 1, "purchase", 50.0),
        (6, "2024-01-01 10:05:00", 3, "purchase", 65.0),
        (7, "2024-01-01 10:06:00", 5, "purchase", 40.0),
        (8, "2024-01-01 10:07:00", 7, "view", 99.0),
    ]
    spark.createDataFrame(
        ev, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value",
        "'{}' AS props",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def _midranks(values):
    s = sorted(values)
    return {
        v: sum(i + 1 for i, x in enumerate(s) if x == v) / s.count(v)
        for v in set(s)
    }


def test_mannwhitney_u_matches_pairwise_definition(spark, toy_dir2):
    rows = {r.variant: r for r in
            REGISTRY["stat_mannwhitney_u"].build(spark, toy_dir2).collect()}
    a = [10.0, 30.0, 40.0, 60.0, 20.0]  # even custkeys 10,12,14,16,18
    b = [20.0, 20.0, 50.0, 70.0]        # odd custkeys 11,13,15,17
    u_a = sum(1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b)
    assert rows["A"].n == len(a) and rows["B"].n == len(b)
    assert rows["A"].u_stat == pytest.approx(u_a, abs=1e-6)
    assert rows["B"].u_stat == pytest.approx(len(a) * len(b) - u_a, abs=1e-6)
    mr = _midranks(a + b)
    assert rows["A"].rank_sum == pytest.approx(sum(mr[x] for x in a), abs=1e-6)


def test_ks_two_sample_matches_ecdf_definition(spark, toy_dir2):
    got = REGISTRY["stat_ks_two_sample"].build(spark, toy_dir2).collect()[0]
    a = sorted([10.0, 30.0, 40.0, 60.0, 20.0])
    b = sorted([20.0, 20.0, 50.0, 70.0])
    vals = sorted(set(a + b))
    gaps = {
        v: abs(sum(x <= v for x in a) / len(a) - sum(x <= v for x in b) / len(b))
        for v in vals
    }
    d = max(gaps.values())
    at = min(v for v, g in gaps.items() if g == pytest.approx(d))
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.ks_d == pytest.approx(d, abs=1e-6)
    assert got.at_value == pytest.approx(at, abs=1e-9)


def test_anova_f_matches_direct_formula(spark, toy_dir2):
    got = REGISTRY["stat_anova_oneway"].build(spark, toy_dir2).collect()[0]
    groups = [[1000, 2000, 3000], [2000, 4000, 5000], [6000, 7000, 2000]]  # cents
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (got.n_groups, got.n_rows) == (k, n)
    assert got.f_stat == pytest.approx(f, abs=1e-4)


def test_gini_matches_direct_formula(spark, toy_dir2):
    got = REGISTRY["stat_gini_customer_spend"].build(spark, toy_dir2).collect()[0]
    # one order per customer → spend = order cents, sorted asc (custkey ties)
    spend = sorted([1000, 2000, 3000, 2000, 4000, 5000, 6000, 7000, 2000])
    n, total = len(spend), sum(spend)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(spend)) / (n * total) - (n + 1) / n
    top = sum(x for i, x in enumerate(spend) if (i + 1) > 0.9 * n)
    assert got.n_customers == n
    assert got.gini == pytest.approx(gini, abs=1e-5)
    assert got.top10pct_share == pytest.approx(top / total, abs=1e-5)


def test_welch_t_matches_numpy(spark, toy_dir2):
    got = REGISTRY["stat_ab_welch_ttest"].build(spark, toy_dir2).collect()[0]
    a = np.array([10.0, 20.0, 35.0, 15.0])  # even user_ids
    b = np.array([50.0, 65.0, 40.0])        # odd user_ids
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.t_stat == pytest.approx(t, abs=1e-3)
    assert got.df_welch == pytest.approx(df, abs=5.1e-3)  # query rounds to 2dp


def test_spearman_matches_numpy_midranks(spark, toy_dir2):
    got = REGISTRY["stat_spearman_rank_corr"].build(spark, toy_dir2).collect()[0]
    q = [1.0, 2.0, 3.0, 4.0, 4.0, 6.0, 7.0, 8.0]
    p = [100.0, 150.0, 150.0, 300.0, 500.0, 450.0, 700.0, 650.0]
    mq, mp = _midranks(q), _midranks(p)
    rq = np.array([mq[x] for x in q])
    rp = np.array([mp[x] for x in p])
    rho = float(np.corrcoef(rq, rp)[0, 1])
    assert got.spearman_rho == pytest.approx(rho, abs=1e-5)


def test_autocorrelation_matches_numpy_lagged_pearson(spark, toy_dir2):
    rows = REGISTRY["ts_autocorrelation"].build(spark, toy_dir2).collect()
    cents = np.array([1000, 2000, 3000, 2000, 4000, 5000, 6000, 7000, 2000], dtype=float)
    for r in rows:
        x, y = cents[r.lag:], cents[:-r.lag]  # pair (t, t-lag)
        assert r.n_pairs == len(x)
        assert r.acf == pytest.approx(float(np.corrcoef(x, y)[0, 1]), abs=1e-5)
    assert {r.lag for r in rows} == set(range(1, 8))


def test_cusum_changepoint_matches_numpy(spark, toy_dir2):
    got = REGISTRY["ts_cusum_changepoint"].build(spark, toy_dir2).collect()[0]
    cents = np.array([1000, 2000, 3000, 2000, 4000, 5000, 6000, 7000, 2000], dtype=np.int64)
    n, total = len(cents), cents.sum()
    d = n * np.cumsum(cents) - np.arange(1, n + 1) * total
    k = int(np.argmax(np.abs(d)))  # earliest day attaining the max
    assert got.n_days == n
    assert str(got.cp_day)[:10] == f"1995-01-0{k + 1}"
    assert got.max_cusum == pytest.approx(abs(d[k]) / (100.0 * n), abs=1e-3)
