"""TPC-H queries 2, 8, 11, 20, 21 — completing the 22-query suite.

The synthetic schema (TESTDATA.md) has no `partsupp` table and lineitem
carries no commit/receipt dates, so — like q09/q16 in tpch.py/tpch2.py —
these four partsupp-dependent queries are adapted to the available star
schema while preserving the *query shape* TPC-H exercises:

- q02: correlated aggregate subquery (min per group) + multi-way dim join
- q08: national market share — conditional ratio aggregate over a 7-way join
- q11: scalar aggregate subquery threshold over a grouped value
- q20: doubly-nested IN subqueries with HAVING
- q21: EXISTS + NOT EXISTS pair correlated on the same fact table

Money math is done in exact integer cents (prices and discounts are
2-decimal values in the test data) wherever a value is compared or
joined on — float sum order differs between engines and a `round(...,2)`
can land on opposite sides of a half-cent boundary.

Scale notes (100 TB posture): every dimension join below is broadcast;
the only shuffles are on the fact table's natural keys (l_partkey /
l_suppkey / l_orderkey), where AQE handles skew. The correlated
subqueries are expressed as window-min / scalar-agg-crossjoin /
semi-anti joins — shapes Catalyst plans without driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t

# exact integer representations of 2-decimal money columns (lazy: F.col
# needs an active SparkContext, so these can't be module-level constants)
def _price_cents():
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _rev_e4():
    """Revenue in 1e-4-dollar units: cents * (100 - discount%)."""
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return _price_cents() * (F.lit(100) - disc_pct)


@register(
    "q02_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS supply_cents
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, supply_cents
    FROM supply
      JOIN part     ON p_partkey = sp_partkey
      JOIN supplier ON sp_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL'
      AND supply_cents = (SELECT min(s2.supply_cents) FROM supply s2
                          WHERE s2.sp_partkey = supply.sp_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "join",
    "subquery",
    "window",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted — partsupp absent; see module docstring): for each
    SMALL mid-size part, the EUROPE supplier(s) with the minimum total
    supply cost, cheapest measured in exact integer cents.

    The correlated `min` subquery becomes a window-min over the grouped
    supply frame — one extra exchange on sp_partkey, no driver round-trip.
    Supplier/nation/region/part all broadcast; only lineitem shuffles.
    """
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "SMALL")
    )
    supply = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("l_partkey").alias("sp_partkey"),
            F.col("l_suppkey").alias("sp_suppkey"),
        )
        .agg(F.sum(_price_cents()).alias("supply_cents"))
    )
    w = Window.partitionBy("sp_partkey")
    cheapest = supply.withColumn("_min_cents", F.min("supply_cents").over(w)).filter(
        F.col("supply_cents") == F.col("_min_cents")
    )
    return (
        cheapest.join(F.broadcast(p), F.col("p_partkey") == F.col("sp_partkey"))
        .join(F.broadcast(s), F.col("sp_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supply_cents",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q08_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_8' THEN volume_e4 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume_e4) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume_e4,
             n2.n_name AS nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "join",
    "agg",
    "broadcast",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_8's share of ECONOMY-part revenue sold into EUROPE
    customers, by order year. 7-way join; every dimension broadcast, the
    customer⋈orders⋈lineitem chain shuffles on natural keys only.

    Volume is summed in exact 1e-4-dollar integers on both engines; the
    share is one integer/integer double division — deterministic, so the
    6-decimal round is stable across engines.
    """
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("volume_e4")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_e4().alias("volume_e4"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_8", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q11_important_stock",
    """
    WITH val AS (
      SELECT l_partkey AS p_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_13'
      GROUP BY 1
    )
    SELECT p_partkey, value_cents
    FROM val
    WHERE CAST(value_cents AS DOUBLE)
          > (SELECT CAST(sum(value_cents) AS DOUBLE) / 1000 FROM val)
    ORDER BY value_cents DESC, p_partkey
    """,
    "agg",
    "subquery",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted — shipped value stands in for stock value): parts
    whose NATION_13-supplied value exceeds 0.1% of that nation's total.

    The scalar aggregate subquery is a 1-row crossJoin (broadcast
    nested-loop of a single row — metadata, not data). Value is exact
    integer cents×quantity so the threshold compare is engine-stable.
    """
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_price_cents() * F.col("l_quantity").cast("long")).alias("value_cents"))
    )
    total = val.agg((F.sum("value_cents").cast("double") / 1000).alias("_threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_cents").cast("double") > F.col("_threshold"))
        .select("p_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


@register(
    "q20_potential_promotion",
    """
    SELECT s_name, s_suppkey, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 300
      )
    ORDER BY s_name
    """,
    "subquery",
    "semi-join",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted — shipped quantity stands in for partsupp
    availability): NATION_2 suppliers who moved >300 units of 'small%'
    parts during 1997. Doubly-nested IN becomes broadcast-semi-join →
    HAVING-filtered agg → semi-join, all shuffle-minimal.
    """
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    movers = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM flagged f
      JOIN per_order po ON f.l_orderkey = po.l_orderkey
      JOIN supplier ON f.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE f.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
      AND n_name = 'NATION_7'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "join",
    "subquery",
    "exists",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted — no commit/receipt dates, so "late" means
    shipped >90 days after the order date): NATION_7 suppliers who were
    the *sole* late supplier on a multi-supplier finalized order.

    The EXISTS / NOT EXISTS pair is rewritten as one grouped pass over
    the flagged fact (count distinct suppliers / late suppliers per
    order) joined back — two shuffles on l_orderkey total, instead of
    two additional correlated scans of lineitem. Oracle restates the
    same rewrite; the EXISTS formulation is equivalent by construction:
    late=1 ∧ n_supp>1 ⇔ EXISTS other-supplier line; n_late_supp=1 ∧
    late=1 ⇔ NOT EXISTS other-supplier late line.
    """
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    flagged = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90).cast("timestamp"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        flagged.filter(F.col("late") == 1)
        .join(per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)), "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
