"""TPC-H-style analytical queries over the synthetic star schema.

These exercise the core relational surface the reference lacks entirely
(SURVEY.md §2.2): multi-way joins, hash aggregation with partial+final
phases, semi-joins, top-k. Each query aliases every computed column
identically in the Spark build and the DuckDB oracle, and rounds double
aggregates in BOTH so the results are bit-identical despite differing
float summation orders.

Scale notes (100 TB posture): every join below is either a broadcast of a
dimension (region/nation/supplier/part at TPC-H proportions) or an
equi-join on the natural key that AQE handles with skew-join splitting;
aggregations are partial+final (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t

# Cut-off constants shared by Spark builds and SQL oracles.
Q1_CUTOFF = "1998-09-02"
Q3_DATE = "1998-03-15"
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"

# Exact-integer discounted revenue (the repo's summation-order-proof
# money convention): cents and basis-point factors are exact integers,
# so the per-row product l_extendedprice*(1-l_discount) is an exact
# DECIMAL(38,0) in 1e-4 dollars (1e-6 with the tax factor) and the sum
# is order-independent — a raw double sum rounds differently across
# engines/layouts whenever a group lands on a .xx5 boundary (caught by
# the shuffled-layout sweep on q09). DECIMAL(38,0), not BIGINT: at
# 100 TB row counts the basis-point sums pass BIGINT's 9.2e18 ceiling.
# The oracles accumulate the same integers in HUGEINT; both engines
# then cast the exact sum to double ONCE, divide by the same power of
# ten, and round — identical IEEE ops, identical output.
_D38 = "decimal(38,0)"


def rev_bp():
    """l_extendedprice*(1-l_discount) as an exact DECIMAL(38,0) in
    1e-4 dollars (cents x (100 - discount-in-hundredths))."""
    return F.round(F.col("l_extendedprice") * 100).cast(_D38) * (
        F.lit(100).cast(_D38) - F.round(F.col("l_discount") * 100).cast(_D38)
    )


def charge_mbp():
    """...*(1+l_tax): exact DECIMAL(38,0) in 1e-6 dollars."""
    return rev_bp() * (
        F.lit(100).cast(_D38) + F.round(F.col("l_tax") * 100).cast(_D38)
    )


REV_SQL = (
    "CAST(round(l_extendedprice * 100) AS HUGEINT)"
    " * (100 - CAST(round(l_discount * 100) AS HUGEINT))"
)
CHARGE_SQL = f"({REV_SQL}) * (100 + CAST(round(l_tax * 100) AS HUGEINT))"


def rev_sum(alias: str):
    return F.round(F.sum(rev_bp()).cast("double") / F.lit(10000.0), 2).alias(alias)



@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2)                   AS sum_disc_price,
           round(CAST(sum({CHARGE_SQL}) AS DOUBLE) / 1000000, 2)              AS sum_charge,
           round(avg(l_quantity), 4)                                          AS avg_qty,
           round(avg(l_extendedprice), 4)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    "agg",
    "scan-pushdown",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: grouped pricing summary with 8 aggregates.

    Reference has no aggregation operator (SURVEY.md §2.2); this is the
    canonical partial+final hash-agg exercise. Filter pushes to parquet.
    """
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        rev_sum("sum_disc_price"),
        F.round(F.sum(charge_mbp()).cast("double") / F.lit(1e6), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "join",
    "topk",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + group + deterministic top-10 by revenue."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_sum("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    "join",
    "broadcast",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; nation/region/supplier broadcast, fact joins shuffle.

    `broadcast()` hints keep the dimension joins shuffle-free — at 100 TB
    only the customer⋈orders⋈lineitem chain shuffles, on its natural keys.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rev_sum("revenue"))
    )


@register(
    "q06_forecast_revenue",
    f"""
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                        * CAST(round(l_discount * 100) AS HUGEINT)) AS DOUBLE)
                 / 1000000, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO}' AND l_shipdate < TIMESTAMP '{Q6_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "agg",
    "scan-pushdown",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — the predicate-pushdown showcase."""
    l = t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast(_D38)
                * F.round(F.col("l_discount") * 100).cast(_D38)
            ).cast("double")
            / F.lit(1e6),
            2,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q09_nation_year_profit",
    f"""
    SELECT n_name, CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS profit
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, o_year
    """,
    "join",
    "agg",
)
def q09_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit by supplier nation and order year."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name"), F.year("o_orderdate").alias("o_year"))
        .agg(rev_sum("profit"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS revenue,
           round(any_value(c_acctbal), 2) AS c_acctbal,
           any_value(n_name) AS n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "join",
    "topk",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            rev_sum("revenue"),
            F.round(F.any_value(F.col("c_acctbal")), 2).alias("c_acctbal"),
            F.any_value(F.col("n_name")).alias("n_name"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    "join",
    "having",
    "topk",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered agg joined back to orders/customer."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > 120)
        .select("l_orderkey", F.round("_tq", 2).alias("total_qty"))
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
