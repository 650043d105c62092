"""Privacy / data-forensics / concentration audits.

k-anonymity over quasi-identifiers, Benford first-digit forensics, and
the Gini coefficient of customer spend (global ranks via the bucketed
two-phase plan in operators/rankstats.py). All value-exact: counts are
BIGINT, money is integer cents, and every float is a short chain of IEEE
ops on exact integers, rounded in both engines.

The reference (`/root/reference/`) has no analytics surface (SURVEY.md
§2.2); this is the engine-only audit face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators.rankstats import bucketed_row_number
from etl_file_sync_spark.queries.registry import register, t


@register(
    "dq_k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(count(*) AS BIGINT) AS qi_groups,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_5,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS customers_below_5,
           round(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / sum(k), 6) AS reident_share
    FROM g
    """,
    "audit",
    "privacy",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (nation, market-segment) quasi-identifier
    pair: group sizes via one combiner-friendly groupBy, then the
    re-identification surface — groups below k=5 and the share of
    customers inside them. The release gate a privacy review runs
    before publishing a derived table."""
    g = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    below = F.when(F.col("k") < 5, F.col("k")).otherwise(F.lit(0))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("qi_groups"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum((F.col("k") < 5).cast("int")).cast("bigint").alias("groups_below_5"),
        F.sum(below).cast("bigint").alias("customers_below_5"),
        F.round(F.sum(below) / F.sum("k"), 6).alias("reident_share"),
    )


@register(
    "dq_benford_digits",
    """
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM c
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
    SELECT digit, observed,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           round(observed * 1.0 / n, 6) AS observed_share,
           round(pow(observed - n * log10(1.0 + 1.0 / digit), 2)
                 / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
    FROM obs, tot ORDER BY digit
    """,
    "audit",
    "forensics",
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit forensics on order totals. The first
    significant digit comes from the INTEGER cents string (log10-free
    digit extraction — log10(1000.0) returns 2.999... in some libms,
    which would misclassify exact powers of ten), then per-digit
    chi-square terms against log10(1+1/d). A fabricated-data screen
    over any monetary column."""
    c = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    d = c.select(F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"))
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    tot = obs.agg(F.sum("observed").cast("bigint").alias("n"))
    share = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))  # 1-row totals dimension
        .select(
            "digit",
            "observed",
            F.round(share, 6).alias("benford_share"),
            F.round(F.col("observed") / F.col("n"), 6).alias("observed_share"),
            F.round(
                F.pow(F.col("observed") - F.col("n") * share, 2) / (F.col("n") * share), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@register(
    "stat_gini_customer_spend",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents, o_custkey,
             row_number() OVER (ORDER BY cents, o_custkey) AS rn
      FROM spend
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS total FROM r),
    agg AS (
      SELECT CAST(sum(CAST(rn AS HUGEINT) * cents) AS DOUBLE) AS weighted,
             CAST(sum(CASE WHEN rn > 0.9 * (SELECT n FROM tot) THEN cents ELSE 0 END) AS BIGINT)
               AS top_decile
      FROM r
    )
    SELECT n AS n_customers,
           round(2.0 * weighted / (n * 1.0 * total) - (n + 1.0) / n, 6) AS gini,
           round(top_decile * 1.0 / total, 6) AS top10pct_share
    FROM agg, tot
    """,
    "audit",
    "concentration",
    "distributed-rank",
)
def stat_gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend: G = 2·Σ(rank·x) /
    (n·Σx) − (n+1)/n over spend sorted ascending (custkey tiebreak),
    plus the top-decile share. Ranks come from the bucketed two-phase
    row_number — the naive spelling's global window is exactly the
    single-partition cliff this avoids. The rank-weighted sum runs in
    exact DECIMAL (rank*cents scales like n^2 and would wrap BIGINT at
    ~3e9 customers); everything else stays exact integers until the
    two terminal divisions."""
    spend = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"))
    )
    r = bucketed_row_number(spend, "cents", ["o_custkey"], out_col="rn")
    # totals from `spend` (cached by the rank plan), not from `r`:
    # row_number adds no rows, so the counts/sums are identical, and a
    # second consumer of `r` would execute the whole rank window+join
    # subtree again just for this 1-row aggregate
    tot = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    sums = r.crossJoin(F.broadcast(tot)).agg(  # 1-row totals dimension
        # rank*cents is an n^2-scale product (rank runs to n customers):
        # BIGINT wraps past ~9.2e18, so accumulate exactly in DECIMAL
        # (the oracle's HUGEINT) and convert once for the Gini division
        F.sum(
            F.col("rn").cast("decimal(18,0)") * F.col("cents").cast("decimal(18,0)")
        )
        .cast("double")
        .alias("weighted"),
        F.sum(
            F.when(F.col("rn") > 0.9 * F.col("n"), F.col("cents")).otherwise(F.lit(0))
        ).cast("bigint").alias("top_decile"),
    )
    # totals from the always-1-row tot aggregate (the oracle's scalar
    # subquery shape), never a first() over the possibly-empty rank frame
    agg = tot.join(F.broadcast(sums), F.lit(True), "left")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(
            2.0 * F.col("weighted") / (F.col("n") * 1.0 * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
        F.round(F.col("top_decile") * 1.0 / F.col("total"), 6).alias("top10pct_share"),
    )


@register(
    "stat_decile_bands",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rn FROM spend
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r)
    SELECT CAST(1 + ((rn - 1) * 10) // (SELECT n FROM tot) AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(min(cents) AS BIGINT) / 100.0, 2) AS min_spend,
           round(CAST(max(cents) AS BIGINT) / 100.0, 2) AS max_spend,
           round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS total_spend
    FROM r GROUP BY 1 ORDER BY decile
    """,
    "audit",
    "distributed-rank",
    "ntile",
)
def stat_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile bands — a distributed ntile(10): global
    position from the bucketed two-phase row_number, decile =
    1 + (rn-1)*10/n in integer arithmetic (exactly Spark's ntile
    fill-order for n % 10 = 0; deterministic custkey tiebreak), then
    per-decile spend stats. The naive ntile() window is the same
    single-partition cliff the rank tests avoid."""
    spend = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"))
    )
    r = bucketed_row_number(spend, "cents", ["o_custkey"], out_col="rn")
    # count from `spend` (cached by the rank plan) — see
    # stat_gini_customer_spend: consuming `r` twice re-runs the rank
    # subtree for a row count row_number cannot have changed
    tot = spend.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        r.crossJoin(F.broadcast(tot))  # 1-row count dimension
        .groupBy(
            (1 + F.floor(((F.col("rn") - 1) * 10) / F.col("n"))).cast("int").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.min("cents").cast("bigint") / 100.0, 2).alias("min_spend"),
            F.round(F.max("cents").cast("bigint") / 100.0, 2).alias("max_spend"),
            F.round(F.sum("cents").cast("bigint") / 100.0, 2).alias("total_spend"),
        )
        .orderBy("decile")
    )
