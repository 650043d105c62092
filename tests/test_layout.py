"""Plan-shape proof for the write-time layout operators
(sources/layout.py): bucketed tables join with zero shuffle exchanges,
and partitioned facts get dynamic partition pruning from a filtered dim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_file_sync_spark.catalog import load_table
from etl_file_sync_spark.plans import count_exchanges, full_plan, join_strategies
from etl_file_sync_spark.sources import layout as L


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    L.write_bucketed(o, "t_orders_b", ["o_orderkey"], num_buckets=8)
    L.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", ["o_orderkey"], num_buckets=8
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the test proves BUCKETING (not broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = L.colocated_join(spark, lt, rt, ["o_orderkey"]).groupBy().count()
        base = joined
        assert count_exchanges(base) <= 1  # only the final 1-row agg exchange
        js = join_strategies(base)
        assert js["sort_merge"] == 1 and js["broadcast_hash"] == 0
        # the join itself reads both sides pre-partitioned: no exchange
        # may appear BETWEEN the scans and the SortMergeJoin
        plan = full_plan(base)
        smj = plan.index("SortMergeJoin")
        assert "Exchange hashpartitioning" not in plan[smj:], "join shuffled despite bucketing"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles_both_sides(spark, sf_dir):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders").select("o_orderkey")
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        assert count_exchanges(o.join(li, "o_orderkey")) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_rows_match_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = L.colocated_join(spark, lt, rt, ["o_orderkey"]).count()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    exp = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert got == exp


def test_dynamic_partition_pruning_from_filtered_dim(spark, sf_dir, tmp_path):
    fact_path = str(tmp_path / "orders_by_priority")
    o = load_table(spark, sf_dir, "orders")
    L.write_partitioned(o, fact_path, ["o_orderpriority"])
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
         ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")],
        "o_orderpriority string, tier string",
    )
    joined = fact.join(dim.filter(F.col("tier") == "hot"), "o_orderpriority")
    plan = full_plan(joined)
    assert "dynamicpruning" in plan, "DPP subquery missing from partition filters"
    n = joined.count()
    exp = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert n == exp


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compact")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(32).write.parquet(src)
    import os
    assert sum(1 for f in os.listdir(src) if f.endswith(".parquet")) == 32
    written = L.compact_parquet(spark, src, dst, target_file_mb=128)
    assert written < 32
    assert spark.read.parquet(dst).count() == o.count()
