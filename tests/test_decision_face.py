"""Independent-definition truth tests for the decision-analytics face
(round 5): largest-remainder apportionment, sweep-line concurrency,
Kaplan-Meier, corpus BLEU-2, Pareto skyline, int8 quantization, Wilson
CI, and calendar period growth. Same model as test_formula_truth.py:
tiny hand-enumerable tables, the REAL registered queries, and values
re-derived from an independent (brute-force / closed-form / numpy)
definition — a formula mistranslated identically into Spark and the
DuckDB oracle still fails here."""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pytest

from etl_file_sync_spark.queries import REGISTRY

T0 = "2024-03-01 00:00:00"


def _ts(offset_s: int) -> str:
    return f"2024-03-01 00:{offset_s // 60:02d}:{offset_s % 60:02d}"


EVENTS = [
    # (event_id, ts_offset_s, user_id, event_type, value)
    (0, 0, 1, "click", 50.0),
    (1, 10, 1, "error", 150.0),
    (2, 0, 2, "click", 120.0),
    (3, 10, 2, "view", 80.0),
    (4, 0, 3, "click", 200.0),
    (5, 20, 3, "error", 30.0),
    (6, 5, 4, "view", 100.0),  # exactly 100: NOT a success (strict >)
    (7, 0, 5, "click", 101.0),
    (8, 30, 5, "error", 99.0),
]

DOCS = [
    # sources 3/4/5 docs: quotas 2500 / 3333.33 / 4166.67 of K=10000
    (0, "the cat sat on the mat today", "en", "src0"),
    (1, "the cat sat on a mat yesterday", "en", "src0"),
    (2, "dogs bark at the moon every night", "en", "src0"),
    (3, "dogs bark at a moon some nights", "en", "src1"),
    (4, "red fish blue fish swim fast", "en", "src1"),
    (5, "red fish blue fish swim slowly home", "en", "src1"),
    (6, "spark shuffles data across the cluster", "en", "src1"),
    (7, "spark shuffles data across a cluster", "en", "src2"),
    (8, "one two three four five six", "en", "src2"),
    (9, "one two three four five seven", "en", "src2"),
    (10, "alpha beta gamma delta epsilon zeta", "en", "src2"),
    (11, "alpha beta gamma delta epsilon eta", "en", "src2"),
]

PARTS = [
    # (p_partkey, p_retailprice, p_size): skyline = min price, max size
    (1, 1.00, 5),
    (2, 2.00, 10),
    (3, 1.50, 5),
    (4, 1.00, 5),  # duplicate point of partkey 1 — both stay
    (5, 3.00, 2),
    (6, 1.20, 6),
]

ORDERS = [
    # (o_orderkey, o_totalprice, o_orderdate) — gap month 1995-03,
    # so 1995-04 has NULL MoM; 1996-02 has YoY vs 1995-02
    (1, 100.00, "1995-01-15"),
    (2, 110.00, "1995-02-10"),
    (3, 120.00, "1995-04-20"),
    (4, 121.00, "1996-02-01"),
]


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("toy_decision"))
    spark.createDataFrame(
        [(i, _ts(off), u, et, v, "{}") for i, off, u, et, v in EVENTS],
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

    spark.createDataFrame(
        PARTS, "p_partkey bigint, p_retailprice double, p_size int"
    ).coalesce(1).write.parquet(os.path.join(d, "part.parquet"))

    spark.createDataFrame(
        ORDERS, "o_orderkey bigint, o_totalprice double, o_orderdate string"
    ).selectExpr(
        "o_orderkey", "CAST(1 AS BIGINT) AS o_custkey", "'O' AS o_orderstatus",
        "o_totalprice", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))

    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 6).astype("float32")
    vecs[7] = 0.0  # all-zero vector: vec_ok drops it (no direction to quantize)
    spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], int(i % 2)) for i in range(40)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_largest_remainder_hand_case(spark, toy_dir):
    rows = {r.source: r for r in REGISTRY["alloc_largest_remainder"].build(spark, toy_dir).collect()}
    # quotas: src0 2500 exact, src1 3333 rem 4/12, src2 4166 rem 8/12 →
    # one leftover seat goes to src2 (largest remainder)
    assert (rows["src0"].base_seats, rows["src0"].seats) == (2500, 2500)
    assert (rows["src1"].base_seats, rows["src1"].seats) == (3333, 3333)
    assert (rows["src2"].base_seats, rows["src2"].seats) == (4166, 4167)
    assert sum(r.seats for r in rows.values()) == 10_000
    # Hamilton property: every allocation within 1 of its exact quota
    tot = sum(r.n_docs for r in rows.values())
    for r in rows.values():
        assert abs(r.seats - 10_000 * r.n_docs / tot) < 1


def test_max_concurrency_matches_bruteforce_sweep(spark, toy_dir):
    got = {r.event_type: r for r in REGISTRY["ops_max_concurrency"].build(spark, toy_dir).collect()}
    base = 1_709_251_200_000_000  # epoch_us of 2024-03-01 00:00:00 UTC
    intervals: dict[str, list[tuple[int, int]]] = {}
    for eid, off, _u, et, _v in EVENTS:
        s = base + off * 1_000_000
        intervals.setdefault(et, []).append((s, s + (600 + eid % 600) * 1_000_000))
    for et, iv in intervals.items():
        # brute force: concurrency evaluated at every start instant
        best, at = 0, None
        for t in sorted({s for s, _ in iv}):
            c = sum(1 for s, e in iv if s <= t < e)
            if c > best:
                best, at = c, t
        assert got[et].max_concurrent == best, et
        assert got[et].at_us == at, et


def test_kaplan_meier_hand_case(spark, toy_dir):
    rows = {r.dur_s: r for r in REGISTRY["stat_kaplan_meier"].build(spark, toy_dir).collect()}
    # lifetimes: u1 10s error, u2 10s censored, u3 20s error, u4 0s
    # censored, u5 30s error. N=5.
    assert rows[0].n_at_risk == 5 and rows[0].n_events == 0
    assert rows[0].survival == pytest.approx(1.0)
    assert rows[10].n_at_risk == 4 and rows[10].n_events == 1
    assert rows[10].survival == pytest.approx(0.75)
    assert rows[20].n_at_risk == 2 and rows[20].n_events == 1
    assert rows[20].survival == pytest.approx(0.375)
    # last subject dies: risk set extinguishes, survival exactly 0
    assert rows[30].n_at_risk == 1 and rows[30].n_events == 1
    assert rows[30].survival == 0.0


def _bleu2_bruteforce() -> tuple[int, int, int, int, int, int, float]:
    toks = {i: text.split() for i, text, _l, _s in DOCS}
    clip1 = tot1 = clip2 = tot2 = c_len = r_len = 0
    for i, tk in toks.items():
        ref = toks.get(i ^ 1)
        if ref is None:
            continue
        cand = tk[: max(1, (4 * len(tk)) // 5)]
        c_len += len(cand)
        r_len += len(ref)
        tot1 += len(cand)
        tot2 += len(cand) - 1
        cu, ru = Counter(cand), Counter(ref)
        clip1 += sum(min(c, ru[t]) for t, c in cu.items())
        cb = Counter(zip(cand, cand[1:]))
        rb = Counter(zip(ref, ref[1:]))
        clip2 += sum(min(c, rb[g]) for g, c in cb.items())
    return c_len, r_len, clip1, tot1, clip2, tot2, (
        math.exp(min(0.0, 1.0 - r_len / c_len))
        * math.sqrt((clip1 / tot1) * (clip2 / tot2))
    )


def test_corpus_bleu_matches_bruteforce(spark, toy_dir):
    got = REGISTRY["eval_corpus_bleu"].build(spark, toy_dir).collect()[0]
    c_len, r_len, clip1, tot1, clip2, tot2, bleu = _bleu2_bruteforce()
    assert (got.c_len, got.r_len) == (c_len, r_len)
    assert (got.clip1, got.tot1, got.clip2, got.tot2) == (clip1, tot1, clip2, tot2)
    assert got.bleu2 == pytest.approx(bleu, abs=1e-5)
    # truncation means a real brevity penalty: bleu strictly below the
    # geometric mean of the precisions
    assert got.bleu2 < math.sqrt((clip1 / tot1) * (clip2 / tot2))


def test_skyline_matches_bruteforce_dominance(spark, toy_dir):
    got = [(r.p_partkey, r.price_cents, r.p_size)
           for r in REGISTRY["ops_skyline_pareto"].build(spark, toy_dir).collect()]
    pts = [(k, round(p * 100), s) for k, p, s in PARTS]
    want = sorted(
        [
            (k, p, s)
            for k, p, s in pts
            if not any(
                (bp <= p and bs >= s and (bp < p or bs > s)) for _bk, bp, bs in pts
            )
        ],
        key=lambda x: (x[1], x[0]),
    )
    assert got == want
    # the duplicate cheapest point survives twice
    assert {k for k, _p, _s in got} >= {1, 4}


def test_int8_quant_matches_numpy(spark, toy_dir):
    rows = {r.vec_id: r for r in REGISTRY["embed_int8_quant"].build(spark, toy_dir).collect()}
    emb = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(os.path.join(toy_dir, "embeddings.parquet")).collect()}
    # the all-zero vector has no direction to quantize: vec_ok drops it
    # in both engines (round-7 zero-norm leg), same as the NULL posture
    assert 7 not in rows
    assert set(rows) == {vid for vid, v in emb.items() if np.any(v != 0)}
    for vid, v in emb.items():
        amax = float(np.max(np.abs(v)))
        if amax == 0:
            continue
        scale = amax / 127.0
        q = np.clip(np.floor(v / scale + 0.5), -127, 127)
        err = v - q * scale
        mse = float(sum(e * e for e in err) / len(v))  # sequential fold
        r = rows[vid]
        assert r.dim == len(v)
        assert r.q_l1 == int(np.sum(np.abs(q)))
        assert r.n_sat == int(np.sum(np.abs(q) == 127))
        assert r.mse == pytest.approx(mse, abs=1e-9)
        # max-abs coordinate always saturates on a nonzero vector
        if amax > 0:
            assert r.n_sat >= 1


def test_wilson_ci_matches_closed_form(spark, toy_dir):
    got = {r.event_type: r for r in REGISTRY["stat_wilson_ci"].build(spark, toy_dir).collect()}
    by_type: dict[str, list[float]] = {}
    for _i, _off, _u, et, v in EVENTS:
        by_type.setdefault(et, []).append(v)
    z = 1.96
    for et, vals in by_type.items():
        n, s = len(vals), sum(1 for v in vals if v > 100)
        center = (s + z * z / 2) / (n + z * z)
        half = (z / (n + z * z)) * math.sqrt(s * (n - s) / n + z * z / 4)
        r = got[et]
        assert (r.n, r.s) == (n, s), et
        assert r.wilson_lo == pytest.approx(center - half, abs=1e-5), et
        assert r.wilson_hi == pytest.approx(center + half, abs=1e-5), et
        # Wilson bounds always inside [0, 1], containing p_hat
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0, et
    # value == 100 exactly is NOT a success (strict >): view stays at 0
    assert got["view"].s == 0


def test_period_growth_hand_case(spark, toy_dir):
    rows = {str(r.month)[:7]: r for r in REGISTRY["ts_period_growth"].build(spark, toy_dir).collect()}
    assert rows["1995-01"].mom_pct is None and rows["1995-01"].yoy_pct is None
    assert rows["1995-02"].mom_pct == pytest.approx(10.0)
    # calendar gap (no 1995-03): April's MoM must be NULL, not vs Feb
    assert rows["1995-04"].mom_pct is None
    assert rows["1996-02"].yoy_pct == pytest.approx(10.0)
    assert rows["1996-02"].mom_pct is None
    assert rows["1995-02"].rev_cents == 11000


def test_largest_remainder_100tb_envelope(spark):
    """The K*n quota product at 100 TB corpus counts: n_docs ~ 4e15 per
    source pushes 10000*n to ~4e19, past BIGINT's 9.2e18 — the non-ANSI
    session would wrap it silently. The query's DECIMAL(38,0) spelling
    (queries/decision_face.py kn) must match Python's arbitrary-precision
    integers exactly; the old BIGINT spelling provably diverges on the
    same frame, so this test is load-bearing."""
    counts = [4_100_000_000_000_000, 3_300_000_000_000_007, 1_900_000_000_000_003]
    t = sum(counts)
    k = 10_000
    df = spark.createDataFrame(
        [(f"src{i}", n, t) for i, n in enumerate(counts)],
        "source string, n_docs bigint, t bigint",
    )
    kn = "CAST(10000 AS DECIMAL(38,0)) * n_docs"
    got = {
        r.source: r
        for r in df.selectExpr(
            "source",
            f"CAST(({kn}) div t AS BIGINT) AS base_seats",
            f"CAST(({kn}) - (({kn}) div t) * CAST(t AS DECIMAL(38,0)) AS BIGINT)"
            " AS remainder",
            "CAST((10000 * n_docs) div t AS BIGINT) AS wrapped_base",
        ).collect()
    }
    wrapped_diverged = False
    for i, n in enumerate(counts):
        r = got[f"src{i}"]
        assert r.base_seats == (k * n) // t, r
        assert r.remainder == k * n - ((k * n) // t) * t, r
        wrapped_diverged |= r.wrapped_base != r.base_seats
    assert wrapped_diverged, "BIGINT no longer wraps here — test is stale"
    # floored quotas still sum within K of the budget (leftover < #sources)
    assert 0 <= k - sum(r.base_seats for r in got.values()) < len(counts)
