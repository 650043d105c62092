"""Experimentation & sketch queries (round 5): log-rank survival
comparison, two-proportion z-test, CUPED variance reduction, an md5
count-min sketch, an md5 Bloom-filter prefilter, PMI collocations,
Mann-Kendall trend, and an md5-seeded permutation test — the A/B-test
readout layer plus the probabilistic-structure layer a large pipeline
uses to cheap-screen before exact work.

The reference (`/root/reference/`) has no analytics surface (SURVEY.md
§2.2); this face extends the LLM-data-pipeline component set. Sketches
use md5-derived hash positions (the repo's standardized-hash rule from
the round-3 verdict) so DuckDB reproduces the exact bit/bucket layout
and the oracle can check the sketch CONTENTS, not just shapes.
Cross-engine determinism: exact integer counts/cents everywhere, a
single division before each round(); group-aggregated double sums
(CUPED moments, log-rank expectation terms) carry the documented
summation-order ulp risk under round(6) (linear-regression precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.localrel import local_rows_df

from etl_file_sync_spark.operators.rankstats import bucketed_cumsums
from etl_file_sync_spark.queries.registry import register, t


def _md5_bucket(expr, mod: int):
    """First 8 hex chars of md5 as an integer in [0, mod) — the
    engine-portable hash (DuckDB: ('0x'||substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("bigint") % mod


def _user_lifetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (dur_s, obs, grp): lifetime seconds, death-observed flag
    (ever hit 'error'), and the even/odd-user A/B split."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 1000000").alias(
                "dur_s"
            ),
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("obs"),
        )
        .select(
            F.col("dur_s").cast("bigint").alias("dur_s"),
            "obs",
            (F.col("user_id") % 2).cast("bigint").alias("grp"),
        )
    )


@register(
    "stat_logrank_test",
    """
    WITH u AS (
      SELECT (max(epoch_us(CAST(ts AS TIMESTAMP)))
              - min(epoch_us(CAST(ts AS TIMESTAMP)))) // 1000000 AS dur_s,
             CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS obs,
             CAST(user_id % 2 AS BIGINT) AS grp
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(dur_s AS BIGINT) AS dur_s,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
             CAST(sum(CASE WHEN grp = 0 THEN obs ELSE 0 END) AS BIGINT) AS da,
             CAST(sum(CASE WHEN grp = 1 THEN obs ELSE 0 END) AS BIGINT) AS db
      FROM u GROUP BY dur_s
    ),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM g),
    risk AS (
      SELECT dur_s, da, db,
             (SELECT na FROM tot)
               - coalesce(sum(ca) OVER (ORDER BY dur_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_a,
             (SELECT nb FROM tot)
               - coalesce(sum(cb) OVER (ORDER BY dur_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_b
      FROM g
    ),
    terms AS (
      SELECT da, da + db AS d, n_a + n_b AS n, n_a, n_b,
             ((da + db) * n_a) * 1.0 / (n_a + n_b) AS e_a,
             CASE WHEN n_a + n_b > 1
                  THEN (n_a * n_b * (da + db) * (n_a + n_b - da - db)) * 1.0
                       / ((n_a + n_b) * (n_a + n_b) * (n_a + n_b - 1))
                  ELSE 0.0 END AS v
      FROM risk WHERE da + db > 0
    )
    SELECT (SELECT na FROM tot) AS n_a, (SELECT nb FROM tot) AS n_b,
           CAST(sum(da) AS BIGINT) AS o_a,
           round(sum(e_a), 6) AS e_a,
           round(sum(v), 6) AS var_lr,
           round((sum(da) - sum(e_a)) / sqrt(sum(v)), 6) AS z,
           round((sum(da) - sum(e_a)) * (sum(da) - sum(e_a)) / sum(v), 6) AS chi2
    FROM terms
    """,
    "stats",
    "survival",
    "ab-test",
    "distributed-rank",
)
def stat_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test comparing the survival (user-lifetime)
    curves of even- vs odd-id users — the hypothesis test that pairs
    with stat_kaplan_meier's estimator. Per event time: observed group-A
    deaths vs the hypergeometric expectation d*nA/n and variance
    nA*nB*d*(n-d)/(n^2*(n-1)), each an exact-integer numerator with ONE
    division; at-risk counts come from the EXCLUSIVE bucketed prefix
    sums of both groups in a single two-phase pass (no single-partition
    window). The final sums of e/v terms are group-aggregated doubles —
    summation-order ulp risk under round(6), the linear-regression
    precedent. Integer numerators overflow BIGINT only beyond ~3e4
    at-risk-squared-times-d per stratum at 9e18 — promote to double
    first at that scale."""
    u = _user_lifetimes(spark, sf_dir)
    g = u.groupBy("dur_s").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
        F.sum(F.when(F.col("grp") == 0, F.col("obs")).otherwise(0))
        .cast("bigint")
        .alias("da"),
        F.sum(F.when(F.col("grp") == 1, F.col("obs")).otherwise(0))
        .cast("bigint")
        .alias("db"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    cum = bucketed_cumsums(g, "dur_s", ["ca", "cb"], inclusive=False)
    risk = cum.crossJoin(F.broadcast(tot)).select(  # 1-row totals dimension
        "dur_s",
        "da",
        "db",
        (F.col("na") - F.col("cum_ca")).alias("n_a"),
        (F.col("nb") - F.col("cum_cb")).alias("n_b"),
    )
    d = F.col("da") + F.col("db")
    n = F.col("n_a") + F.col("n_b")
    terms = risk.where(d > 0).select(
        "da",
        "n_a",
        "n_b",
        (d * F.col("n_a") * F.lit(1.0) / n).alias("e_a"),
        F.when(
            n > 1,
            (F.col("n_a") * F.col("n_b") * d * (n - d)) * F.lit(1.0) / (n * n * (n - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    agg = terms.agg(
        F.sum("da").cast("bigint").alias("o_a"),
        F.sum("e_a").alias("se"),
        F.sum("v").alias("sv"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(  # 1-row totals dimension
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "o_a",
        F.round(F.col("se"), 6).alias("e_a"),
        F.round(F.col("sv"), 6).alias("var_lr"),
        F.round((F.col("o_a") - F.col("se")) / F.sqrt(F.col("sv")), 6).alias("z"),
        F.round(
            (F.col("o_a") - F.col("se")) * (F.col("o_a") - F.col("se")) / F.col("sv"), 6
        ).alias("chi2"),
    )


@register(
    "stat_two_proportion_ztest",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS s_a,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS s_b
      FROM u
    )
    SELECT n_a, s_a, n_b, s_b,
           round(s_a * 1.0 / n_a, 6) AS p_a,
           round(s_b * 1.0 / n_b, 6) AS p_b,
           round((s_a * 1.0 / n_a - s_b * 1.0 / n_b)
                 / sqrt(((s_a + s_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (s_a + s_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z
    FROM g
    """,
    "stats",
    "ab-test",
)
def stat_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test on user conversion (ever made a
    high-value purchase, value > 200 — strict enough that both
    converted and unconverted users exist at every tier, keeping the
    pooled variance nonzero) between the even/odd-id variants. Bit-exact across engines: counts
    are exact integers, every division is spelled identically, and sqrt
    is IEEE correctly-rounded — no accepted risk. One groupBy over the
    user-grain frame; the per-user reduction is the only corpus-scale
    pass."""
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("grp"), "conv")
    )
    g = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("s_b"),
    )
    pa = F.col("s_a") * 1.0 / F.col("n_a")
    pb = F.col("s_b") * 1.0 / F.col("n_b")
    pp = (F.col("s_a") + F.col("s_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    return g.select(
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(
            (pa - pb)
            / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))),
            6,
        ).alias("z"),
    )


@register(
    "stat_cuped_adjustment",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(coalesce(sum(CASE WHEN CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INTEGER) < 16
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INTEGER) >= 16
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my FROM u),
    c AS (
      SELECT sum((u.x - m.mx) * (u.x - m.mx)) AS sxx,
             sum((u.x - m.mx) * (u.y - m.my)) AS sxy,
             sum((u.y - m.my) * (u.y - m.my)) AS syy
      FROM u, m
    ),
    v AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM u GROUP BY grp
    )
    SELECT v.grp AS variant, v.n_users,
           round(v.sy * 1.0 / v.n_users, 4) AS mean_y_cents,
           round(v.sx * 1.0 / v.n_users, 4) AS mean_x_cents,
           round(v.sy * 1.0 / v.n_users
                 - (c.sxy / c.sxx) * (v.sx * 1.0 / v.n_users - m.mx), 4) AS adj_mean_cents,
           round(c.sxy / c.sxx, 6) AS theta,
           round(c.sxy * c.sxy / (c.sxx * c.syy), 6) AS rho2
    FROM v, c, m ORDER BY variant
    """,
    "stats",
    "ab-test",
    "cuped",
)
def stat_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013) variance-reduced A/B readout: per user,
    pre-period covariate x = day-of-month < 16 spend, experiment metric
    y = rest-of-month spend (exact integer cents), variants = even/odd
    user id. theta = cov(x,y)/var(x) fitted GLOBALLY (two-pass centered
    moments, the linear-regression algebra + its documented double-sum
    round() envelope); each variant reports its raw and adjusted mean
    (mean_y - theta*(mean_x - global mean_x)) and the achievable
    variance reduction rho². The per-user reduction is the only
    corpus-scale pass; everything after runs on the user-grain frame."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    pre = F.dayofmonth("ts") < 16
    u = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(pre, cents).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("x"),
            F.coalesce(F.sum(F.when(~pre, cents).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("grp"), "x", "y")
    )
    uc = u.cache()  # moments + per-variant sums reuse the user frame
    m = uc.agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("mx"), F.avg("y").alias("my")
    )
    c = uc.crossJoin(F.broadcast(m)).agg(  # 1-row moments dimension
        F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))).alias("sxx"),
        F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my"))).alias("sxy"),
        F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))).alias("syy"),
    )
    v = uc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    theta = F.col("sxy") / F.col("sxx")
    mean_y = F.col("sy") * 1.0 / F.col("n_users")
    mean_x = F.col("sx") * 1.0 / F.col("n_users")
    return (
        v.crossJoin(F.broadcast(c))  # 1-row co-moments dimension
        .crossJoin(F.broadcast(m))
        .select(
            F.col("grp").alias("variant"),
            "n_users",
            F.round(mean_y, 4).alias("mean_y_cents"),
            F.round(mean_x, 4).alias("mean_x_cents"),
            F.round(mean_y - theta * (mean_x - F.col("mx")), 4).alias("adj_mean_cents"),
            F.round(theta, 6).alias("theta"),
            F.round(
                F.col("sxy") * F.col("sxy") / (F.col("sxx") * F.col("syy")), 6
            ).alias("rho2"),
        )
        .orderBy("variant")
    )


_CMS_D, _CMS_W = 4, 256


@register(
    "sketch_count_min",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS tok
      FROM documents
    ),
    tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    cells AS (
      SELECT i.range AS row_i,
             CAST(('0x' || substr(md5(CAST(i.range AS VARCHAR) || ':' || tok), 1, 8))
                  AS BIGINT) % {_CMS_W} AS bucket,
             c
      FROM tc, range({_CMS_D}) i
    ),
    sketch AS (
      SELECT row_i, bucket, CAST(sum(c) AS BIGINT) AS total
      FROM cells GROUP BY row_i, bucket
    ),
    top AS (
      SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 20
    ),
    est AS (
      SELECT p.tok, p.c, min(s.total) AS cms_est
      FROM (SELECT top.tok, top.c, i.range AS row_i,
                   CAST(('0x' || substr(md5(CAST(i.range AS VARCHAR) || ':' || top.tok), 1, 8))
                        AS BIGINT) % {_CMS_W} AS bucket
            FROM top, range({_CMS_D}) i) p
      JOIN sketch s ON s.row_i = p.row_i AND s.bucket = p.bucket
      GROUP BY p.tok, p.c
    )
    SELECT tok, c AS true_count, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - c AS BIGINT) AS overcount
    FROM est ORDER BY true_count DESC, tok
    """,
    "sketch",
    "count-min",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the corpus
    unigram frequencies — depth 4 × width 256, md5-derived buckets so
    the oracle reproduces the EXACT cell totals, not just the shape.
    Reports the sketch estimate vs truth for the top-20 tokens; the CMS
    guarantee est >= true holds exactly (asserted in tests). Plan: one
    explode+groupBy token-count pass (vocab-bounded output), a 4x
    fan-out of the count frame into 1024 cells, and a broadcast-sized
    probe join — at 100 TB the sketch is the thing you SHIP (1024
    rows) instead of the vocabulary."""
    toks = t(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 0)
        ).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c")).cache()
    rows_i = spark.range(_CMS_D).select(F.col("id").cast("bigint").alias("row_i"))
    cells = tc.crossJoin(F.broadcast(rows_i)).select(  # 4-row depth dimension
        "row_i",
        _md5_bucket(
            F.concat(F.col("row_i").cast("string"), F.lit(":"), F.col("tok")), _CMS_W
        ).alias("bucket"),
        "c",
    )
    sketch = cells.groupBy("row_i", "bucket").agg(
        F.sum("c").cast("bigint").alias("total")
    )
    top = tc.orderBy(F.desc("c"), F.asc("tok")).limit(20)
    probe = top.crossJoin(F.broadcast(rows_i)).select(
        "tok",
        "c",
        "row_i",
        _md5_bucket(
            F.concat(F.col("row_i").cast("string"), F.lit(":"), F.col("tok")), _CMS_W
        ).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("tok", "c")
        .agg(F.min("total").cast("bigint").alias("cms_est"))
    )
    return est.select(
        "tok",
        F.col("c").alias("true_count"),
        "cms_est",
        (F.col("cms_est") - F.col("c")).cast("bigint").alias("overcount"),
    ).orderBy(F.desc("true_count"), F.asc("tok"))


_BLOOM_M, _BLOOM_K = 4096, 3


@register(
    "sketch_bloom_prefilter",
    f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_totalprice > 250000 AND o_orderpriority = '1-URGENT'
    ),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(i.range AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_BLOOM_M} AS pos
      FROM members, range({_BLOOM_K}) i
    ),
    probe AS (
      SELECT c.c_custkey,
             CAST(('0x' || substr(md5(CAST(i.range AS VARCHAR) || ':' || CAST(c.c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_BLOOM_M} AS pos
      FROM customer c, range({_BLOOM_K}) i
    ),
    hits AS (
      SELECT p.c_custkey,
             CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nhit
      FROM probe p LEFT JOIN bits b ON p.pos = b.pos
      GROUP BY p.c_custkey
    ),
    lab AS (
      SELECT h.c_custkey,
             CASE WHEN h.nhit = {_BLOOM_K} THEN 1 ELSE 0 END AS positive,
             CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS member
      FROM hits h LEFT JOIN members m ON h.c_custkey = m.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(member) AS BIGINT) AS n_members,
           CAST(sum(positive) AS BIGINT) AS n_positive,
           CAST(sum(CASE WHEN positive = 1 AND member = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           round(sum(CASE WHEN positive = 1 AND member = 0 THEN 1 ELSE 0 END) * 1.0
                 / (count(*) - sum(member)), 6) AS fp_rate
    FROM lab
    """,
    "sketch",
    "bloom",
)
def sketch_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prefilter: build a 4096-bit / 3-hash
    filter over the customers with an URGENT >250k order (a proper
    subset of customers at every tier, so non-members exist and the FP
    rate is well-defined; md5 positions, so the oracle reproduces the
    exact bit set), probe EVERY customer, and
    report the measured false-positive rate against exact membership.
    The no-false-negative guarantee holds exactly (asserted in tests:
    n_positive >= n_members). Plan: the bit set is a <= 4096-row frame
    — at 100 TB this is what a selective-join prefilter broadcasts
    instead of shuffling the fact table (same posture as Spark's own
    runtime Bloom injection, test_plans.py)."""
    members = (
        t(spark, sf_dir, "orders")
        .where((F.col("o_totalprice") > 250000) & (F.col("o_orderpriority") == "1-URGENT"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("bigint").alias("i"))
    bits = (
        members.crossJoin(F.broadcast(ks))  # 3-row hash dimension
        .select(
            _md5_bucket(
                F.concat(F.col("i").cast("string"), F.lit(":"), F.col("k").cast("string")),
                _BLOOM_M,
            ).alias("pos")
        )
        .distinct()
    )
    probe = (
        t(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(ks))
        .select(
            "c_custkey",
            _md5_bucket(
                F.concat(
                    F.col("i").cast("string"), F.lit(":"), F.col("c_custkey").cast("string")
                ),
                _BLOOM_M,
            ).alias("pos"),
        )
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("nhit"))
    )
    lab = hits.join(
        F.broadcast(members.withColumn("member", F.lit(1))),
        F.col("c_custkey") == F.col("k"),
        "left",
    ).select(
        (F.col("nhit") == _BLOOM_K).cast("int").alias("positive"),
        F.coalesce(F.col("member"), F.lit(0)).alias("member"),
    )
    fp = F.sum(((F.col("positive") == 1) & (F.col("member") == 0)).cast("int"))
    return lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("member").cast("bigint").alias("n_members"),
        F.sum("positive").cast("bigint").alias("n_positive"),
        fp.cast("bigint").alias("n_false_pos"),
        F.round(
            fp * F.lit(1.0) / (F.count(F.lit(1)) - F.sum("member")), 6
        ).alias("fp_rate"),
    )


@register(
    "text_pmi_collocations",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
      FROM documents
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY tok
    ),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
                   unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
            FROM toks)
      GROUP BY w1, w2
    ),
    nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
    nb AS (SELECT CAST(sum(c) AS BIGINT) AS n_bi FROM bi),
    scored AS (
      SELECT b.w1, b.w2, b.c AS c_xy, u1.c AS c_x, u2.c AS c_y,
             (CAST(b.c AS DOUBLE) * (SELECT n_uni FROM nu) * (SELECT n_uni FROM nu))
             / (CAST(u1.c AS DOUBLE) * u2.c * (SELECT n_bi FROM nb)) AS score
      FROM bi b JOIN uni u1 ON b.w1 = u1.tok JOIN uni u2 ON b.w2 = u2.tok
      WHERE b.c >= 5
    )
    SELECT w1, w2, c_xy, c_x, c_y, round(ln(score), 6) AS pmi
    FROM scored ORDER BY score DESC, w1, w2 LIMIT 20
    """,
    "text",
    "collocation",
    "pmi",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (Church & Hanks 1990) over corpus
    bigrams with a min-support floor of 5. The ranking key is the PMI
    ratio (c_xy·N_uni²)/(c_x·c_y·N_bi) computed as ONE identically-
    spelled double expression from exact integer counts, so both
    engines order identically; ln() is applied only to the reported
    value (round 6, libm ulp precedent). Plan: two explode+groupBy
    count passes (vocab-bounded outputs), two equi-joins keyed on the
    words, TakeOrdered top-20 — no window, no all-pairs."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 0).alias("tk"),
    ).cache()
    uni = (
        toks.select(F.explode("tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # vocabulary-bounded but consumed by three branches (totals +
        # both PMI margins): cache so the token explode runs once
        .cache()
    )
    pairs = toks.select(
        F.explode(
            F.when(F.size("tk") < 2, F.array().cast("array<struct<w1:string,w2:string>>")).otherwise(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nu = uni.agg(F.sum("c").cast("bigint").alias("n_uni"))
    nb = bi.agg(F.sum("c").cast("bigint").alias("n_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    scored = (
        bi.where(F.col("c") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))  # 1-row totals dimensions
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c").alias("c_xy"),
            "c_x",
            "c_y",
            (
                F.col("c").cast("double") * F.col("n_uni") * F.col("n_uni")
                / (F.col("c_x").cast("double") * F.col("c_y") * F.col("n_bi"))
            ).alias("score"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("w1"), F.asc("w2"))
        .limit(20)
        .select("w1", "w2", "c_xy", "c_x", "c_y", F.round(F.log("score"), 6).alias("pmi"))
    )


@register(
    "stat_mann_kendall",
    """
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      FROM m a JOIN m b ON b.month > a.month
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
    ties AS (
      SELECT CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT) AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS tc FROM m GROUP BY cents) WHERE tc > 1
    )
    SELECT (SELECT n FROM n) AS n_periods, s.s_stat,
           CAST((SELECT n FROM n) * ((SELECT n FROM n) - 1) * (2 * (SELECT n FROM n) + 5)
                - (SELECT tie_term FROM ties) AS BIGINT) AS var_num18,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                      ELSE 0 END
                 / sqrt(((SELECT n FROM n) * ((SELECT n FROM n) - 1) * (2 * (SELECT n FROM n) + 5)
                         - (SELECT tie_term FROM ties)) / 18.0), 6) AS z
    FROM s
    """,
    "stats",
    "trend",
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on monthly revenue: S = sum of
    sign(later - earlier) over all month pairs, tie-corrected variance,
    continuity-corrected z. The pair space is the CALENDAR-BOUNDED
    monthly frame (~80 rows at ANY corpus scale — the corpus-scale work
    is the one groupBy to cents), so the self-join is a broadcast over
    dozens of rows, not data. S, n, and the variance numerator (x18)
    are exact integers; the single division and sqrt make z bit-exact
    across engines."""
    m = (
        t(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .cache()  # bounded frame reused by pairs / count / ties
    )
    a = m.select(F.col("month").alias("ma"), F.col("cents").alias("xa"))
    b = m.select(F.col("month").alias("mb"), F.col("cents").alias("xb"))
    s = (
        a.join(F.broadcast(b), F.col("mb") > F.col("ma"))  # bounded ~80x80
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = m.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        m.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
        .where(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var_num = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    )
    cc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return (
        s.crossJoin(F.broadcast(n))  # 1-row totals dimensions
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_periods"),
            "s_stat",
            var_num.cast("bigint").alias("var_num18"),
            F.round(cc / F.sqrt(var_num / F.lit(18.0)), 6).alias("z"),
        )
    )


_N_PERMS = 200


@register(
    "stat_permutation_test",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT sum(CASE WHEN grp = 0 THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
             - sum(CASE WHEN grp = 1 THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS d
      FROM u
    ),
    perms AS (
      SELECT p.range AS perm,
             CAST(('0x' || substr(md5(CAST(p.range AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS side,
             u.cents
      FROM u, range({_N_PERMS}) p
    ),
    pd AS (
      SELECT perm,
             sum(CASE WHEN side = 0 THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
             - sum(CASE WHEN side = 1 THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS d
      FROM perms GROUP BY perm
      HAVING sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) > 0
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
           round((SELECT d FROM obs), 4) AS obs_diff_cents,
           CAST(count(*) AS BIGINT) AS n_perms,
           CAST(sum(CASE WHEN abs(pd.d) >= abs((SELECT d FROM obs)) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_extreme,
           round((1 + sum(CASE WHEN abs(pd.d) >= abs((SELECT d FROM obs)) THEN 1 ELSE 0 END))
                 * 1.0 / (1 + count(*)), 6) AS p_value
    FROM pd
    """,
    "stats",
    "ab-test",
    "permutation",
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the difference in mean user spend between
    the even/odd-id variants: 200 md5-seeded relabelings (deterministic
    and engine-portable — no RNG), add-one-smoothed two-sided p-value.
    Per-user spend is exact integer cents; every mean is one division;
    the |diff| comparisons are between identically-computed doubles, so
    the extreme-count is bit-exact across engines. Plan: the corpus-
    scale pass is the per-user reduction; the 200x fan-out runs on the
    USER-grain frame and shuffles on (perm) — linear in users, never
    in events. Degenerate one-sided relabelings (a side with zero
    users) are excluded in both engines."""
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .select("user_id", (F.col("user_id") % 2).cast("bigint").alias("grp"), "cents")
        .cache()  # observed diff + 200-perm fan-out reuse the user frame
    )
    obs = u.agg(
        (
            F.sum(F.when(F.col("grp") == 0, F.col("cents")).otherwise(0))
            * F.lit(1.0)
            / F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
            - F.sum(F.when(F.col("grp") == 1, F.col("cents")).otherwise(0))
            * F.lit(1.0)
            / F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        ).alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    ).localCheckpoint()  # 1-row observed stat, materialized once — it feeds
    # both the extreme-count agg and the final join (phash band pattern)
    perms = u.crossJoin(
        F.broadcast(spark.range(_N_PERMS).select(F.col("id").cast("bigint").alias("perm")))
    ).select(
        "perm",
        _md5_bucket(
            F.concat(
                F.col("perm").cast("string"), F.lit(":"), F.col("user_id").cast("string")
            ),
            2,
        ).alias("side"),
        "cents",
    )
    pd_ = (
        perms.groupBy("perm")
        .agg(
            F.sum(F.when(F.col("side") == 0, F.col("cents")).otherwise(0)).alias("s0"),
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("side") == 1, F.col("cents")).otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
        )
        .where((F.col("c0") > 0) & (F.col("c1") > 0))
        .select(
            (F.col("s0") * F.lit(1.0) / F.col("c0") - F.col("s1") * F.lit(1.0) / F.col("c1")).alias("d")
        )
    )
    extreme = F.sum(
        F.when(F.abs(F.col("d")) >= F.abs(F.col("obs_d")), 1).otherwise(0)
    ).cast("bigint")
    stats = (
        pd_.crossJoin(F.broadcast(obs.select(F.col("d").alias("obs_d"))))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            extreme.alias("n_extreme"),
            F.round(
                (F.lit(1) + extreme) * F.lit(1.0) / (F.lit(1) + F.count(F.lit(1))), 6
            ).alias("p_value"),
        )
    )
    # obs joins in as the oracle's scalar subquery does — a LEFT join on
    # TRUE, not a first() over the perm frame, which is EMPTY when every
    # relabeling is one-sided (a 1-user tier) and leaked NULL n_users
    return stats.join(F.broadcast(obs), F.lit(True), "left").select(
        "n_users",
        F.round(F.col("d"), 4).alias("obs_diff_cents"),
        "n_perms",
        "n_extreme",
        "p_value",
    )


@register(
    "stat_power_analysis",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS s0
      FROM u
    ),
    p AS (
      SELECT n0, s0, s0 * 1.0 / n0 AS p0,
             least(1.0, (s0 * 1.0 / n0) * 1.1) AS p1
      FROM g
    )
    SELECT n0 AS n_control_observed,
           round(p0, 6) AS p0,
           round(p1, 6) AS p1_target,
           CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416)
                     * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
                     / ((p1 - p0) * (p1 - p0))) AS BIGINT) AS n_per_arm,
           round((1.96 + 0.8416) * sqrt(2.0 * p0 * (1.0 - p0) / n0), 6) AS mde_at_n
    FROM p
    """,
    "stats",
    "ab-test",
    "power",
)
def stat_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size and MDE planning from the observed control
    conversion rate: n per arm to detect a +10% relative lift at
    alpha=0.05 two-sided, power=0.8 (z constants 1.96 / 0.8416 as
    identical decimal literals), and the minimum detectable absolute
    effect at the CURRENT control n (conservative 2*p0*(1-p0) variance).
    Exact integer counts, single divisions, correctly-rounded sqrt —
    bit-exact across engines except ceil at an exact-integer boundary
    (same class as the round() grain). One groupBy over the user
    frame."""
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("grp"), "conv")
    )
    g = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
    )
    p0 = F.col("s0") * 1.0 / F.col("n0")
    p1 = F.least(F.lit(1.0), p0 * F.lit(1.1))
    zsum2 = (F.lit(1.96) + F.lit(0.8416)) * (F.lit(1.96) + F.lit(0.8416))
    return g.select(
        F.col("n0").alias("n_control_observed"),
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1_target"),
        F.ceil(
            zsum2
            * (p0 * (F.lit(1.0) - p0) + p1 * (F.lit(1.0) - p1))
            / ((p1 - p0) * (p1 - p0))
        )
        .cast("bigint")
        .alias("n_per_arm"),
        F.round(
            (F.lit(1.96) + F.lit(0.8416))
            * F.sqrt(F.lit(2.0) * p0 * (F.lit(1.0) - p0) / F.col("n0")),
            6,
        ).alias("mde_at_n"),
    )


@register(
    "stat_propensity_stratified_att",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS treat,
             CAST(coalesce(sum(CASE WHEN CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INTEGER) < 16
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INTEGER) >= 16
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
    s AS (
      SELECT user_id, treat, y,
             ((row_number() OVER (ORDER BY x, user_id) - 1) * 5)
               // (SELECT n FROM n) + 1 AS stratum
      FROM u
    ),
    cells AS (
      SELECT stratum,
             CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
             CAST(sum(CASE WHEN treat = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
      FROM s GROUP BY stratum
    ),
    ok AS (SELECT * FROM cells WHERE nt > 0 AND nc > 0),
    tot AS (SELECT CAST(sum(nt) AS BIGINT) AS nt_all FROM ok)
    SELECT CAST((SELECT count(*) FROM ok) AS BIGINT) AS n_strata_used,
           (SELECT nt_all FROM tot) AS n_treated,
           round(sum((nt * 1.0 / (SELECT nt_all FROM tot))
                     * (syt * 1.0 / nt - syc * 1.0 / nc)), 4) AS att_cents
    FROM ok
    """,
    "stats",
    "causal",
    "distributed-rank",
)
def stat_propensity_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ATT (average treatment effect on the treated,
    Rosenbaum & Rubin 1984 subclassification): users stratified into
    quintiles of PRE-period spend (the confounder proxy) by global rank
    — the bucketed two-phase row_number, integer-division quintiles —
    then ATT = sum over strata of (treated share) x (treated mean -
    control mean of POST-period spend), skipping strata missing an arm.
    Exact integer cents and counts; the stratum terms are single
    divisions; the 5-term weighted sum rounds at 4 (the double-sum
    envelope). Corpus-scale work: one groupBy to the user grain and
    one ranking pass."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    pre = F.dayofmonth("ts") < 16
    u = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(pre, cents).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("x"),
            F.coalesce(F.sum(F.when(~pre, cents).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            "user_id",
            (F.col("user_id") % 2).cast("bigint").alias("treat"),
            "x",
            "y",
        )
        .cache()  # ranking + totals reuse the user frame
    )
    from etl_file_sync_spark.operators.rankstats import bucketed_row_number

    n = u.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = bucketed_row_number(u, "x", ["user_id"], out_col="rn")
    s = r.crossJoin(F.broadcast(n)).select(
        "treat",
        "y",
        (F.expr("((rn - 1) * 5) div n") + 1).cast("bigint").alias("stratum"),
    )
    cells = s.groupBy("stratum").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("syt"),
        F.sum(F.when(F.col("treat") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("syc"),
    )
    ok = cells.where((F.col("nt") > 0) & (F.col("nc") > 0)).cache()
    tot = ok.agg(F.sum("nt").cast("bigint").alias("nt_all"))
    return (
        ok.crossJoin(F.broadcast(tot))  # 1-row totals dimension
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_strata_used"),
            F.first("nt_all").alias("n_treated"),
            F.round(
                F.sum(
                    (F.col("nt") * F.lit(1.0) / F.col("nt_all"))
                    * (
                        F.col("syt") * F.lit(1.0) / F.col("nt")
                        - F.col("syc") * F.lit(1.0) / F.col("nc")
                    )
                ),
                4,
            ).alias("att_cents"),
        )
    )


@register(
    "stat_cohens_d",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN grp = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN grp = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN grp = 0 THEN CAST(cents AS HUGEINT) * cents
                           ELSE 0 END) AS DOUBLE) AS q0,
             CAST(sum(CASE WHEN grp = 1 THEN CAST(cents AS HUGEINT) * cents
                           ELSE 0 END) AS DOUBLE) AS q1
      FROM u
    ),
    c AS (
      SELECT n0, n1,
             s0 * 1.0 / n0 AS m0, s1 * 1.0 / n1 AS m1,
             (q0 - s0 * 1.0 / n0 * s0) / (n0 - 1) AS v0,
             (q1 - s1 * 1.0 / n1 * s1) / (n1 - 1) AS v1
      FROM g
    )
    SELECT n0 AS n_ctrl, n1 AS n_treat,
           round(m0, 4) AS mean_ctrl_cents, round(m1, 4) AS mean_treat_cents,
           round((m1 - m0) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)), 6) AS cohens_d,
           round(((m1 - m0) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)))
                 * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6) AS hedges_g
    FROM c
    """,
    "stats",
    "ab-test",
    "effect-size",
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size of the even/odd-id split on user spend:
    Cohen's d with the pooled sample SD, and the Hedges g small-sample
    correction (1 - 3/(4N-9)). Moments are exact integer sums of cents
    and squared cents; each variance/mean is single-division; sqrt is
    correctly rounded — bit-exact across engines. One groupBy to the
    user grain, one 1-row reduction."""
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("grp"), "cents")
    )
    g = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("grp") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        # squared per-user cents wrap BIGINT at 100 TB user counts:
        # exact DECIMAL accumulation (the oracle's HUGEINT), one cast
        F.sum(
            F.when(
                F.col("grp") == 0,
                F.col("cents").cast("decimal(18,0)") * F.col("cents").cast("decimal(18,0)"),
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        )
        .cast("double")
        .alias("q0"),
        F.sum(
            F.when(
                F.col("grp") == 1,
                F.col("cents").cast("decimal(18,0)") * F.col("cents").cast("decimal(18,0)"),
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        )
        .cast("double")
        .alias("q1"),
    )
    m0 = F.col("s0") * 1.0 / F.col("n0")
    m1 = F.col("s1") * 1.0 / F.col("n1")
    v0 = (F.col("q0") - F.col("s0") * 1.0 / F.col("n0") * F.col("s0")) / (F.col("n0") - 1)
    v1 = (F.col("q1") - F.col("s1") * 1.0 / F.col("n1") * F.col("s1")) / (F.col("n1") - 1)
    pooled = F.sqrt(
        ((F.col("n0") - 1) * v0 + (F.col("n1") - 1) * v1) / (F.col("n0") + F.col("n1") - 2)
    )
    d = (m1 - m0) / pooled
    return g.select(
        F.col("n0").alias("n_ctrl"),
        F.col("n1").alias("n_treat"),
        F.round(m0, 4).alias("mean_ctrl_cents"),
        F.round(m1, 4).alias("mean_treat_cents"),
        F.round(d, 6).alias("cohens_d"),
        F.round(
            d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (F.col("n0") + F.col("n1")) - F.lit(9.0))),
            6,
        ).alias("hedges_g"),
    )


@register(
    "stat_runs_test",
    """
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s FROM m),
    sg AS (
      -- above-mean indicator via the exact integer cross-multiply
      SELECT month,
             CASE WHEN cents * (SELECT n FROM tot) > (SELECT s FROM tot)
                  THEN 1 ELSE 0 END AS hi
      FROM m
    ),
    fl AS (
      SELECT hi, lag(hi) OVER (ORDER BY month) AS prev FROM sg
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hi) AS BIGINT) AS n1,
             CAST(count(*) - sum(hi) AS BIGINT) AS n2,
             CAST(1 + sum(CASE WHEN prev IS NOT NULL AND hi <> prev THEN 1 ELSE 0 END)
               AS BIGINT) AS runs
      FROM fl
    )
    SELECT n, n1, n2, runs,
           round(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6) AS e_runs,
           round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))), 6) AS z
    FROM agg
    """,
    "stats",
    "randomness",
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of monthly revenue
    around its mean: months flagged above/below the exact mean (integer
    cross-multiply cents*n > total — no division), runs counted over
    the CALENDAR-BOUNDED monthly frame (~80 rows, lag window free),
    then the closed-form E[R] and variance give z. Exact integers into
    single-division doubles and one sqrt — bit-exact across engines.
    A trending series produces few runs (z << 0); this pairs with
    stat_mann_kendall's direction test."""
    from pyspark.sql import Window as W

    m = (
        t(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.sum("cents").cast("bigint").alias("s_tot"),
    )
    sg = m.crossJoin(F.broadcast(tot)).select(  # 1-row totals dimension
        "month",
        F.when(F.col("cents") * F.col("n_tot") > F.col("s_tot"), 1)
        .otherwise(0)
        .alias("hi"),
    )
    # calendar-bounded frame (~80 rows): plain lag window is free here
    fl = sg.withColumn("prev", F.lag("hi").over(W.orderBy("month")))
    agg = fl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hi").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("hi")).cast("bigint").alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("hi") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    e_runs = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2"))
    var = (
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2.0) * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2"))
            * F.lit(1.0)
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return agg.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.round(e_runs, 6).alias("e_runs"),
        F.round((F.col("runs") - e_runs) / F.sqrt(var), 6).alias("z"),
    )


@register(
    "stat_brown_forsythe",
    """
    WITH o AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    g AS (
      SELECT pri, cents, CAST(count(*) AS BIGINT) AS w FROM o GROUP BY pri, cents
    ),
    cum AS (
      SELECT pri, cents, w,
             CAST(sum(w) OVER (PARTITION BY pri ORDER BY cents) AS BIGINT) AS cw
      FROM g
    ),
    ng AS (SELECT pri, CAST(sum(w) AS BIGINT) AS n FROM g GROUP BY pri),
    med AS (
      SELECT c.pri, min(c.cents) AS med
      FROM cum c JOIN ng ON c.pri = ng.pri
      WHERE c.cw >= ((ng.n - 1) * 50) // 100 + 1
      GROUP BY c.pri
    ),
    z AS (
      SELECT o.pri, abs(o.cents - med.med) AS z
      FROM o JOIN med ON o.pri = med.pri
    ),
    cells AS (
      SELECT pri, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS BIGINT) AS s,
             CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS ss
      FROM z GROUP BY pri
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS k
      FROM cells
    )
    SELECT (SELECT k FROM tot) AS k_groups, (SELECT nn FROM tot) AS n_total,
           round(((SELECT nn FROM tot) - (SELECT k FROM tot)) * 1.0
                 / ((SELECT k FROM tot) - 1)
                 * sum(n * (s * 1.0 / n - (SELECT st FROM tot) * 1.0 / (SELECT nn FROM tot))
                         * (s * 1.0 / n - (SELECT st FROM tot) * 1.0 / (SELECT nn FROM tot)))
                 / sum(ss - s * 1.0 / n * s), 6) AS f_stat
    FROM cells
    """,
    "stats",
    "variance-test",
    "distributed-rank",
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with MEDIAN centers — robust to
    non-normality) for variance homogeneity of order totals across
    priorities: per-group exact type-1 medians from the GROUPED
    bucketed cumulative plan, absolute deviations z = |cents - med|
    (exact integers!), then the one-way ANOVA F on z from integer
    moments (between-group SS via exact-ratio means, within-group SS
    via sum z² - (sum z)²/n). Single divisions throughout; the 5-term
    outer sums ride the round(6) envelope."""
    o = t(spark, sf_dir, "orders").where(
        # NULL group/value rows carry no variance information and would
        # poison the grouped rank plan (rankstats refuses NULL keys)
        F.col("o_orderpriority").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).cache()  # median machinery + deviation pass reuse this
    from etl_file_sync_spark.operators.rankstats import grouped_bucketed_cumsum

    g = o.groupBy("pri", "cents").agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    cum = grouped_bucketed_cumsum(g, ["pri"], "cents", "w", out_col="cw")
    ng = g.groupBy("pri").agg(F.sum("w").cast("bigint").alias("n"))
    med = (
        cum.join(F.broadcast(ng), "pri")
        .where(F.col("cw") >= F.expr("((n - 1) * 50) div 100") + 1)
        .groupBy("pri")
        .agg(F.min("cents").alias("med"))
    )
    z = o.join(F.broadcast(med), "pri").select(
        "pri", F.abs(F.col("cents") - F.col("med")).alias("z")
    )
    cells = z.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("s"),
        # squared row-grain deviations wrap BIGINT at 100 TB row counts:
        # exact DECIMAL accumulation, one cast into the double algebra
        F.sum(F.col("z").cast("decimal(18,0)") * F.col("z").cast("decimal(18,0)"))
        .cast("double")
        .alias("ss"),
    ).cache()  # k rows; consumed by tot, ss_agg AND (via tot) the final
    # join — uncached, the whole z/median/window subtree above executes
    # once per consumer (the 8 MiB window exchange materialized 2-3x and
    # the med broadcast built twice in the round-8 stage probe; ~15%
    # of the query's wall). Same caller-owned lifecycle as every other
    # in-query cache.
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    ).cache()  # 1 row; consumed by ss_agg and the final join
    zbar_g = F.col("s") * F.lit(1.0) / F.col("n")
    zbar = F.col("st") * F.lit(1.0) / F.col("nn")
    ss_agg = (
        cells.crossJoin(F.broadcast(tot))  # 1-row totals dimension
        .agg(
            F.sum(F.col("n") * (zbar_g - zbar) * (zbar_g - zbar)).alias("ssb"),
            F.sum(
                F.col("ss") - F.col("s") * F.lit(1.0) / F.col("n") * F.col("s")
            ).alias("ssw"),
        )
    )
    # totals from the always-1-row tot aggregate (the oracle's scalar
    # subquery shape), never a first() over the possibly-empty cells
    return tot.join(F.broadcast(ss_agg), F.lit(True), "left").select(
        F.col("k").alias("k_groups"),
        F.col("nn").alias("n_total"),
        F.round(
            (F.col("nn") - F.col("k"))
            * F.lit(1.0)
            / (F.col("k") - 1)
            * F.col("ssb")
            / F.col("ssw"),
            6,
        ).alias("f_stat"),
    )


@register(
    "stat_fisher_exact",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(max(CASE WHEN event_type = 'purchase' AND value > 200
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN grp = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN grp = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN grp = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN grp = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM u
    ),
    lf AS (
      -- lnfact(i) as an ORDERED prefix sum of ln(j): the identical
      -- fold the engine runs driver-side, so every pmf term matches
      SELECT i,
             coalesce(sum(CASE WHEN i = 0 THEN 0.0 ELSE ln(i) END)
               OVER (ORDER BY i), 0.0) AS lnf
      FROM (SELECT unnest(range(0, (SELECT a + b + c + d + 1 FROM cells))) AS i)
    ),
    km AS (
      SELECT cells.*, a + c AS m, a + b AS ab, c + d AS cd, a + b + c + d AS n,
             greatest(0, (a + c) - (c + d)) AS lo,
             least(a + b, a + c) AS hi
      FROM cells
    ),
    kk AS (SELECT km.*, unnest(range(km.lo, km.hi + 1)) AS k FROM km),
    terms AS (
      SELECT kk.*,
             (SELECT lnf FROM lf WHERE i = kk.ab)
               - (SELECT lnf FROM lf WHERE i = kk.k)
               - (SELECT lnf FROM lf WHERE i = kk.ab - kk.k)
             + (SELECT lnf FROM lf WHERE i = kk.cd)
               - (SELECT lnf FROM lf WHERE i = kk.m - kk.k)
               - (SELECT lnf FROM lf WHERE i = kk.cd - kk.m + kk.k)
             - ((SELECT lnf FROM lf WHERE i = kk.n)
               - (SELECT lnf FROM lf WHERE i = kk.m)
               - (SELECT lnf FROM lf WHERE i = kk.n - kk.m)) AS lnpmf
      FROM kk
    ),
    base AS (SELECT lnpmf AS lnbase FROM terms WHERE k = a)
    SELECT a, b, c, d,
           round(CASE WHEN b * c = 0 THEN NULL
                      ELSE (a * d) * 1.0 / (b * c) END, 6) AS odds_ratio,
           round(sum(CASE WHEN exp(lnpmf) <= exp((SELECT lnbase FROM base)) * (1 + 1e-7)
                          THEN exp(lnpmf) ELSE 0 END), 6) AS p_value
    FROM terms GROUP BY a, b, c, d
    """,
    "stats",
    "ab-test",
    "exact-test",
)
def stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test (two-sided, R's sum-of-smaller-pmfs
    convention with the standard 1+1e-7 tolerance) on the variant x
    high-value-conversion 2x2 table. The corpus-scale work is the
    distributed per-user reduction to four cells; the hypergeometric
    sum runs over the BOUNDED support [max(0, m-cd), min(ab, m)] with
    ln-factorials built as an ORDERED cumulative fold of ln(j) — the
    engine folds driver-side in exactly the order the oracle's window
    sum uses, so every pmf is the same IEEE sequence (same-libm exp/ln;
    the 1e-7 tie tolerance dwarfs any residual ulp). Driver-side cost
    is O(n_users) ln's — the small-sample test's own applicability
    bound; at millions of users use stat_two_proportion_ztest, whose
    normal approximation is exact in that regime."""
    import math

    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("conv")
        )
        .select((F.col("user_id") % 2).cast("bigint").alias("grp"), "conv")
    )
    cells = u.agg(
        F.sum(F.when((F.col("grp") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    row = cells.collect()[0]  # 2x2 metadata pull (Markov-kernel pattern)
    if row["a"] is None:  # empty input: the oracle's range-unnest over
        # NULL cells collapses to zero rows — match it exactly
        return cells.sparkSession.createDataFrame(
            [],
            "a bigint, b bigint, c bigint, d bigint, odds_ratio double, p_value double",
        )
    a, b, c, d = row["a"], row["b"], row["c"], row["d"]
    n, m, ab, cd = a + b + c + d, a + c, a + b, c + d
    # ordered prefix fold of ln(j) — identical sequence to the oracle
    lnf = [0.0] * (n + 1)
    acc = 0.0
    for j in range(1, n + 1):
        acc += math.log(j)
        lnf[j] = acc
    lo, hi = max(0, m - cd), min(ab, m)

    def lnpmf(k: int) -> float:
        return (
            lnf[ab] - lnf[k] - lnf[ab - k]
            + lnf[cd] - lnf[m - k] - lnf[cd - m + k]
            - (lnf[n] - lnf[m] - lnf[n - m])
        )

    base = math.exp(lnpmf(a)) * (1 + 1e-7)
    p = sum(math.exp(lnpmf(k)) for k in range(lo, hi + 1) if math.exp(lnpmf(k)) <= base)
    odds = round((a * d) * 1.0 / (b * c), 6) if b * c != 0 else None
    return local_rows_df(
        cells.sparkSession,
        [(a, b, c, d, odds, round(p, 6))],
        "a bigint, b bigint, c bigint, d bigint, odds_ratio double, p_value double",
    )
