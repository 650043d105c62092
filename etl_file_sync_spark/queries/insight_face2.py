"""Insight face 2: cohort LTV curves, Neyman-optimal stratified
allocation, term burstiness, Adamic-Adar link prediction, and corpus
language-diversity indices.

Plans follow the engine's scale rules: every per-row reduction is a
combiner-friendly groupBy; the only windows run on bounded frames
(cohort x age grid, the enum-bounded source frame); the link-prediction
two-hop join rides a support-thresholded, hub-capped edge list so the
fan-out is bounded by construction at any corpus size.

The reference (`/root/reference/`) has no analytics surface (SURVEY.md
§2.2); this face is engine-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t

_BUDGET = 10_000  # stratified sampling budget (documents)
_HUB_CAP = 500  # max degree for a common-neighbor middle node
_MIN_DF = 30  # burstiness: min document frequency per term


@register(
    "behavior_ltv_cohort_curves",
    """
    WITH p AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    cohort AS (SELECT user_id, min(day) AS c0 FROM p GROUP BY user_id),
    sized AS (SELECT c0, CAST(count(*) AS BIGINT) AS n_users FROM cohort
              GROUP BY c0),
    rev AS (
      SELECT cohort.c0,
             CAST(date_diff('day', cohort.c0, p.day) AS BIGINT) AS age_days,
             CAST(sum(p.cents) AS BIGINT) AS cents
      FROM p JOIN cohort USING (user_id)
      GROUP BY cohort.c0, date_diff('day', cohort.c0, p.day)
    ),
    cum AS (
      SELECT c0, age_days,
             sum(cents) OVER (PARTITION BY c0 ORDER BY age_days) AS cum_cents
      FROM rev
    )
    SELECT CAST(c0 AS TIMESTAMP) AS cohort_day,
           age_days, n_users,
           round(cum_cents / 100.0 / n_users, 4) AS cum_rev_per_user
    FROM cum JOIN sized USING (c0)
    ORDER BY cohort_day, age_days
    """,
    "behavior",
    "cohort",
    "ltv",
)
def behavior_ltv_cohort_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first-purchase
    DAY, cumulative purchase revenue per user by days-since-first —
    the revenue companion to retention_cohorts (daily grain because
    the events table spans ~one month). Revenue reduces to exact
    BIGINT cents before the single divide; the cumulative window is
    partitioned by cohort over the bounded (cohort x age) grid —
    never row-grain data."""
    p = (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    cohort = p.groupBy("user_id").agg(F.min("day").alias("c0"))
    sized = cohort.groupBy("c0").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    rev = (
        p.join(cohort, "user_id")
        .groupBy("c0", F.datediff(F.col("day"), F.col("c0")).cast("bigint").alias("age_days"))
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    w = W.partitionBy("c0").orderBy("age_days")
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w))
    return (
        cum.join(sized, "c0")
        .select(
            F.col("c0").cast("timestamp").alias("cohort_day"),
            "age_days",
            "n_users",
            F.round(F.col("cum_cents") / 100.0 / F.col("n_users"), 4).alias(
                "cum_rev_per_user"
            ),
        )
        .orderBy("cohort_day", "age_days")
    )


@register(
    "sample_neyman_allocation",
    f"""
    WITH m AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE) AS ss
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, n_docs,
             sqrt((ss - s * 1.0 / n_docs * s) / (n_docs - 1)) AS sd_chars
      FROM m
    ),
    w AS (
      -- HUGEINT (not DECIMAL) so // is INTEGER division; DuckDB's //
      -- on DECIMAL silently degrades to float division
      SELECT source, n_docs, sd_chars,
             CAST(round(n_docs * sd_chars * 1000) AS HUGEINT) AS wh
      FROM sd
    ),
    tot AS (SELECT CAST(sum(wh) AS HUGEINT) AS wt FROM w),
    q AS (
      SELECT source, n_docs, sd_chars, wh, wt,
             CAST(({_BUDGET} * wh) // wt AS BIGINT) AS base,
             {_BUDGET} * wh - (({_BUDGET} * wh) // wt) * wt AS rem
      FROM w, tot
    ),
    lo AS (SELECT {_BUDGET} - CAST(sum(base) AS BIGINT) AS leftover FROM q),
    rk AS (
      SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
               AS rn
      FROM q
    )
    SELECT source, n_docs, round(sd_chars, 4) AS sd_chars,
           CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_n
    FROM rk, lo ORDER BY source
    """,
    "sampling",
    "stratified",
    "decision",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation of a 10k-document
    budget across sources: n_h proportional to N_h * S_h (stratum size
    times within-stratum stddev of n_chars), integerized by largest
    remainder. S_h comes from exact integer moments; the weight is then
    frozen to an integer (round(N_h*S_h*1000) as DECIMAL(38,0)) so the
    quota floor/remainder arithmetic is EXACT in both engines — no
    summation-order ulp can flip a floor at an integer boundary (the
    failure mode a double Sum(w_h) would invite). Windows run on the
    enum-bounded source frame only."""
    nchars = F.col("n_chars").cast("decimal(18,0)")
    m = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("s"),
            F.sum(nchars * nchars).cast("double").alias("ss"),
        )
    )
    sd = m.select(
        "source",
        "n_docs",
        F.sqrt(
            (F.col("ss") - F.col("s") * 1.0 / F.col("n_docs") * F.col("s"))
            / (F.col("n_docs") - 1)
        ).alias("sd_chars"),
    )
    w = sd.withColumn(
        "wh",
        F.round(F.col("n_docs") * F.col("sd_chars") * 1000).cast("decimal(38,0)"),
    )
    tot = w.agg(F.sum("wh").cast("decimal(38,0)").alias("wt"))
    q = w.crossJoin(F.broadcast(tot)).select(  # 1-row totals dimension
        "source",
        "n_docs",
        "sd_chars",
        F.expr(f"CAST(({_BUDGET} * wh) div wt AS BIGINT)").alias("base"),
        F.expr(f"{_BUDGET} * wh - (({_BUDGET} * wh) div wt) * wt").alias("rem"),
    )
    lo = q.agg((F.lit(_BUDGET) - F.sum("base")).cast("bigint").alias("leftover"))
    # window over the enum-bounded source frame (<= 10 rows) — not data
    rn = F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source"))).cast("bigint")
    return (
        q.withColumn("rn", rn)
        .crossJoin(F.broadcast(lo))  # 1-row leftover dimension
        .select(
            "source",
            "n_docs",
            F.round("sd_chars", 4).alias("sd_chars"),
            (
                F.col("base") + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
            ).cast("bigint").alias("alloc_n"),
        )
        .orderBy("source")
    )


@register(
    "text_term_burstiness",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dt AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    per AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS tf,
             CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS ss
      FROM dt GROUP BY term HAVING count(*) >= {_MIN_DF}
    )
    SELECT term, df, tf,
           round(((ss - tf * 1.0 / n_docs * tf) / (n_docs - 1))
                 / (tf * 1.0 / n_docs), 6) AS dispersion
    FROM per, n
    ORDER BY dispersion DESC, term LIMIT 20
    """,
    "text",
    "quality",
    "curation",
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church-Gale index of dispersion): per-term
    variance-to-mean ratio of within-document counts across ALL corpus
    documents — zeros included implicitly, since a doc without the term
    contributes nothing to tf or ss while n_docs counts it. Dispersion
    ~1 means Poisson scatter (function words); >>1 means the term
    clumps into few documents (topical/bursty). The whole plan is two
    combiner-friendly groupBys (doc x term, then term) plus one global
    TakeOrdered top-20; exact integer tf/ss make the doubles identical
    across engines."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dt = (
        toks.where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    per = (
        dt.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("c").cast("bigint").alias("tf"),
            # squared per-doc term counts over 1e10+ docs brush the
            # BIGINT ceiling: exact DECIMAL accumulation, one cast
            F.sum(F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)"))
            .cast("double")
            .alias("ss"),
        )
        .where(F.col("df") >= _MIN_DF)
    )
    mean = F.col("tf") * 1.0 / F.col("n_docs")
    var = (F.col("ss") - mean * F.col("tf")) / (F.col("n_docs") - 1)
    return (
        per.crossJoin(F.broadcast(n))  # 1-row corpus-size dimension
        .select("term", "df", "tf", F.round(var / mean, 6).alias("dispersion"))
        .orderBy(F.desc("dispersion"), "term")
        .limit(20)
    )


@register(
    "graph_adamic_adar",
    f"""
    WITH pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS sup
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    edges AS (SELECT pa, pb FROM pairs WHERE sup >= 2),
    nb AS (
      SELECT pa AS x, pb AS y FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY x),
    mid AS (
      SELECT nb.x, nb.y, deg.d FROM nb JOIN deg ON nb.x = deg.x
      WHERE deg.d <= {_HUB_CAP}
    ),
    hops AS (
      SELECT l.y AS a, r.y AS c,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             sum(1.0 / ln(l.d)) AS score
      FROM mid l JOIN mid r ON l.x = r.x AND l.y < r.y
      GROUP BY l.y, r.y
    )
    SELECT h.a AS part_a, h.c AS part_b, h.common_neighbors,
           round(h.score, 6) AS aa_score
    FROM hops h
    LEFT JOIN edges e ON h.a = e.pa AND h.c = e.pb
    WHERE e.pa IS NULL
    ORDER BY aa_score DESC, part_a, part_b LIMIT 20
    """,
    "graph",
    "link-prediction",
    "topk",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase part graph:
    edges = part pairs co-ordered at least twice (support cut), score
    for a non-adjacent pair = sum over common neighbors of 1/ln(deg).
    The two-hop fan-out is bounded by construction — the support
    threshold prunes noise edges and middle nodes above the hub cap
    ({_HUB_CAP}) are excluded (a 100 TB graph's hubs would otherwise
    quadratically dominate the expansion; capping common-neighbor
    hubs is the standard AA trade and biases scores conservatively).
    Existing edges are removed with an anti join; output is a global
    top-20 TakeOrdered."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
    )
    # edges feeds the symmetrized adjacency AND the final LeftAnti; mid
    # feeds both sides of the wedge self-join — cache both so the
    # support-thresholded co-purchase groupBy runs once, not 4x
    edges = pairs.where(F.col("sup") >= 2).select("pa", "pb").cache()
    nb = edges.select(F.col("pa").alias("x"), F.col("pb").alias("y")).unionAll(
        edges.select(F.col("pb").alias("x"), F.col("pa").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    mid = nb.join(deg, "x").where(F.col("d") <= _HUB_CAP).cache()
    left = mid.select("x", F.col("y").alias("a"), "d")
    right = mid.select("x", F.col("y").alias("c"))
    hops = (
        left.join(right, "x")
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum(1.0 / F.log(F.col("d"))).alias("score"),
        )
    )
    non_adjacent = hops.join(
        edges,
        (hops.a == edges.pa) & (hops.c == edges.pb),
        "left_anti",
    )
    return (
        non_adjacent.select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "common_neighbors",
            F.round("score", 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "corpus_lang_diversity",
    """
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS k
      FROM c GROUP BY source
    )
    SELECT c.source, max(tot.nt) AS n_docs, max(tot.k) AS n_langs,
           round(sum((c.n * 1.0 / tot.nt) * (c.n * 1.0 / tot.nt)), 6)
             AS simpson,
           round(1.0 - sum((c.n * 1.0 / tot.nt) * (c.n * 1.0 / tot.nt)), 6)
             AS gini_simpson,
           round(-sum((c.n * 1.0 / tot.nt) * ln(c.n * 1.0 / tot.nt)), 6)
             AS shannon,
           round(CASE WHEN max(tot.k) > 1
                 THEN -sum((c.n * 1.0 / tot.nt) * ln(c.n * 1.0 / tot.nt))
                      / ln(max(tot.k)) END, 6) AS pielou_evenness
    FROM c JOIN tot ON c.source = tot.source
    GROUP BY c.source ORDER BY c.source
    """,
    "dq",
    "curation",
    "stats",
)
def corpus_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-diversity profile per source: Simpson concentration
    (sum p^2), Gini-Simpson diversity, Shannon entropy in nats, and
    Pielou evenness (Shannon / ln k, null for single-language
    sources) over the per-source language mix — the multi-index
    companion to dq_entropy_profile for corpus-curation dashboards.
    One (source x lang) groupBy (enum-bounded) feeds everything; the
    per-source folds are <= 5 terms, inside the documented
    summation-order ulp class under round(6)."""
    c = (
        t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = c.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    p = F.col("n") * 1.0 / F.col("nt")
    joined = c.join(tot, "source")
    return (
        joined.groupBy("source")
        .agg(
            F.max("nt").alias("n_docs"),
            F.max("k").alias("n_langs"),
            F.round(F.sum(p * p), 6).alias("simpson"),
            F.round(1.0 - F.sum(p * p), 6).alias("gini_simpson"),
            F.round(-F.sum(p * F.log(p)), 6).alias("shannon"),
            F.round(
                F.when(
                    F.max("k") > 1,
                    -F.sum(p * F.log(p)) / F.log(F.max("k").cast("double")),
                ),
                6,
            ).alias("pielou_evenness"),
        )
        .orderBy("source")
    )
