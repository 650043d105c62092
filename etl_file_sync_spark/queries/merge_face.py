"""Registry face for the MERGE/CDC operators (operators/merge.py).

Delta/Iceberg jars aren't in this build, so MERGE INTO semantics are
supplied at the plan level (anti-join + union — the same physical work
a lakehouse MERGE does, minus the transactional commit). These queries
pin those semantics against a SQL oracle with deterministic synthetic
change-sets derived from the TPC-H tables themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators.merge import merge_upsert, scd2_apply
from etl_file_sync_spark.queries.registry import register, t


@register(
    "merge_upsert_orders",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders WHERE o_custkey < 500
    ),
    source AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(round(o_totalprice * 110) AS BIGINT) AS total_cents
      FROM orders WHERE o_custkey < 100
    )
    SELECT o_orderkey, o_orderstatus, total_cents FROM target
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, total_cents FROM source
    ORDER BY o_orderkey
    """,
    "merge",
    "upsert",
    "cdc",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: a 10%-repriced change-batch for customers
    <100 upserts into the <500 order book — source rows win on key
    collision, unmatched target rows survive. One shuffle on the key
    (left-anti + union); at 100 TB this is exactly the MERGE shuffle a
    lakehouse would run, and the anti-join side is AQE-skew-handled.
    Prices compare in exact integer cents."""
    o = t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_custkey") < 500).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    source = o.filter(F.col("o_custkey") < 100).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 110).cast("long").alias("total_cents"),
    )
    return merge_upsert(target, source, "o_orderkey").orderBy("o_orderkey")


@register(
    "merge_scd2_customers",
    """
    WITH base AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '2020-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    chg AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
    SELECT c_custkey, c_mktsegment, valid_from, valid_to FROM base
    WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT b.c_custkey, b.c_mktsegment, b.valid_from, TIMESTAMP '2021-06-01'
    FROM base b JOIN chg USING (c_custkey)
    UNION ALL
    SELECT b.c_custkey, 'MOVED', TIMESTAMP '2021-06-01', CAST(NULL AS TIMESTAMP)
    FROM base b JOIN chg USING (c_custkey)
    ORDER BY c_custkey, valid_from
    """,
    "merge",
    "scd2",
    "cdc",
)
def merge_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 apply: every 7th customer moves to segment 'MOVED' at
    2021-06-01 — the operator closes the current version (valid_to set)
    and appends the new open row; untouched keys pass through. The
    oracle restates close+append as three union branches. Shape: one
    key-shuffle join + anti-join, no windows over the full dimension
    (the change-batch dedup window runs on the tiny change set only)."""
    c = t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.lit("MOVED").alias("c_mktsegment"),
            F.lit("2021-06-01").cast("timestamp").alias("chg_ts"),
        )
    )
    return scd2_apply(dim, changes, "c_custkey", "chg_ts", ["c_mktsegment"]).orderBy(
        "c_custkey", "valid_from"
    )
