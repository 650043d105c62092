"""More TPC-H-style queries, including the SQL-face variants (correlated
subqueries, EXISTS in SQL, ratio aggregates) driven through spark.sql over
registered temp views — exercising the identical-Catalyst-plan SQL path
the DataFrame API uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_file_sync_spark.catalog import register_views
from etl_file_sync_spark.queries.registry import register, t
from etl_file_sync_spark.queries.tpch import REV_SQL, rev_bp, rev_sum


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "join",
    "exists",
    "sql-face",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS (non-equi condition) via the SQL face.

    The correlated predicate l_shipdate > o_orderdate makes this a true
    semi-join with a non-equi conjunct — Catalyst decorrelates it."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )


@register(
    "q07_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume_bp) AS DOUBLE) / 10000, 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
             {REV_SQL} AS volume_bp
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "join",
    "agg",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year."""
    s, l, o, c = (t(spark, sf_dir, x) for x in ("supplier", "lineitem", "orders", "customer"))
    n1 = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(rev_sum("revenue"))
    )


@register(
    "q12_priority_class",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    "agg",
    "conditional",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): high/low priority line counts per return flag."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REV_SQL} END) AS DOUBLE)
                 / CAST(sum({REV_SQL}) AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "agg",
    "ratio",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage (conditional-agg ratio)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = rev_bp()
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "join",
    "scalar-subquery",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (scalar subquery)."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        rev_sum("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#10'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    "join",
    "correlated-subquery",
    "sql-face",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part average), SQL face.

    Sums/avgs here are over whole-number quantities ⇒ exact in double on
    both engines, so the correlated threshold comparison is deterministic."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#10'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        """,
    )


@register(
    "sql_in_subquery",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    GROUP BY o_orderstatus
    """,
    "join",
    "in-subquery",
    "sql-face",
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (rewritten to a semi join by Catalyst), SQL face."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        GROUP BY o_orderstatus
        """,
    )


@register(
    "sql_scalar_subquery_threshold",
    """
    SELECT c_mktsegment, count(*) AS n_above
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_mktsegment = c.c_mktsegment)
    GROUP BY c_mktsegment
    """,
    "correlated-subquery",
    "sql-face",
)
def sql_scalar_subquery_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their segment average.

    Segment averages are sums of 2-decimal balances — not exact in double,
    but both engines sum ~thousands of values whose average differs only
    in final ulps; a customer balance landing within 1e-9 of the average
    would be required to flip the comparison."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_mktsegment, count(*) AS n_above
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_mktsegment = c.c_mktsegment)
        GROUP BY c_mktsegment
        """,
    )


@register(
    "dedup_latest_per_key",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_date
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    "dedup",
    "distinct-on",
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON-style dedup: keep each customer's latest order
    (the CDC/SCD 'latest record wins' pattern at 100 TB: one shuffle on
    the key, window + filter — no self-join)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_date"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "join",
    "agg",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (left join so
    zero-order customers count; count(col) skips the nulls)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_supplier_part_variety",
    """
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (5, 10, 15, 20)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    "join",
    "distinct",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted to lineitem, no partsupp table): distinct
    supplier count per (brand, type) for selected sizes."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 10, 15, 20))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT round(CAST(sum({REV_SQL}) AS DOUBLE) / 10000, 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#30' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
    "join",
    "disjunctive",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive brackets — the classic
    OR-of-ANDs predicate Catalyst must keep joinable (common l_partkey =
    p_partkey equi-condition extracted; brackets evaluated post-join)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        ((F.col("p_brand") == "Brand#10") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#30") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(bracket).agg(rev_sum("revenue"))


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0),
    eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer, avg_bal
      WHERE c_acctbal > ab
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01'))
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM eligible GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "join",
    "anti",
    "scalar-subquery",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted): high-balance customers with no recent orders,
    by nation — scalar subquery (global average) + anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    eligible = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        eligible.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )
