"""Unit tests for the distributed two-phase rank machinery
(operators/rankstats.py): output must equal the naive global-window
answer regardless of bucketing, including ties, tiny inputs, and
fewer-distinct-values-than-buckets inputs."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_file_sync_spark.operators.rankstats import (
    avg_ranks,
    bucketed_cumsums,
    bucketed_row_number,
)


def _values_df(spark):
    # deterministic, with heavy ties and a skewed tail
    rows = [(float(i % 17), i) for i in range(500)] + [(999.5, 10_000 + i) for i in range(20)]
    return spark.createDataFrame(rows, ["v", "id"])


def test_row_number_matches_global_window(spark):
    df = _values_df(spark)
    got = bucketed_row_number(df, "v", ["id"], out_col="rn", n_buckets=8)
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    g = {(r["v"], r["id"]): r["rn"] for r in got.collect()}
    w = {(r["v"], r["id"]): r["rn"] for r in want.collect()}
    assert g == w


def test_row_number_handles_fewer_values_than_buckets(spark):
    df = spark.createDataFrame([(1.0, 1), (1.0, 2), (2.0, 3)], ["v", "id"])
    got = sorted(
        (r["id"], r["rn"])
        for r in bucketed_row_number(df, "v", ["id"], n_buckets=32).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_cumsums_match_global_window(spark):
    df = (
        _values_df(spark)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("id").alias("s"))
    )
    got = bucketed_cumsums(df, "v", ["c", "s"], inclusive=True, n_buckets=8)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum_c", F.sum("c").over(w)).withColumn(
        "cum_s", F.sum("s").over(w)
    )
    g = {r["v"]: (r["cum_c"], r["cum_s"]) for r in got.collect()}
    e = {r["v"]: (r["cum_c"], r["cum_s"]) for r in want.collect()}
    assert g == e


def test_cumsums_exclusive_prefix(spark):
    df = spark.createDataFrame([(1.0, 5), (2.0, 7), (3.0, 11)], ["v", "c"])
    got = {
        r["v"]: r["cum_c"]
        for r in bucketed_cumsums(df, "v", ["c"], inclusive=False, n_buckets=2).collect()
    }
    assert got == {1.0: 0, 2.0: 5, 3.0: 12}


def test_avg_ranks_match_pandas_average_method(spark):
    raw = [1.0, 1.0, 2.0, 3.0, 3.0, 3.0, 7.5, 7.5, 9.0]
    pdf = pd.DataFrame({"v": raw})
    expected = (
        pdf.assign(r=pdf["v"].rank(method="average")).groupby("v")["r"].first().to_dict()
    )
    df = (
        spark.createDataFrame([(v,) for v in raw], ["v"])
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {r["v"]: r["avg_rank"] for r in avg_ranks(df, "v", "c", n_buckets=4).collect()}
    assert got == expected


def test_bucket_count_independence(spark):
    """Boundaries shift with n_buckets; ranks must not."""
    df = _values_df(spark)
    a = {
        (r["v"], r["id"]): r["rn"]
        for r in bucketed_row_number(df, "v", ["id"], n_buckets=2).collect()
    }
    b = {
        (r["v"], r["id"]): r["rn"]
        for r in bucketed_row_number(df, "v", ["id"], n_buckets=32).collect()
    }
    assert a == b


def test_null_order_key_raises(spark):
    import pytest

    df = spark.createDataFrame([(1.0, 1), (None, 2), (3.0, 3)], ["v", "id"])
    with pytest.raises(ValueError, match="NULL"):
        bucketed_row_number(df, "v", ["id"]).collect()
    with pytest.raises(ValueError, match="NULL"):
        bucketed_cumsums(df.withColumnRenamed("id", "c"), "v", ["c"]).collect()
