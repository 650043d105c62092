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
