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


def test_grouped_cumsum_matches_per_group_window(spark):
    from etl_file_sync_spark.operators.rankstats import grouped_bucketed_cumsum

    rows = [(chr(97 + i % 3), float(i % 29), (-1) ** i * (i + 1)) for i in range(300)]
    df = (
        spark.createDataFrame(rows, ["g", "v", "w"])
        .groupBy("g", "v")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    got = grouped_bucketed_cumsum(df, ["g"], "v", "w", out_col="cum", n_buckets=8)
    w = Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("w").over(w))
    g = {(r["g"], r["v"]): r["cum"] for r in got.collect()}
    e = {(r["g"], r["v"]): r["cum"] for r in want.collect()}
    assert g == e


def test_grouped_cumsum_double_weights(spark):
    from etl_file_sync_spark.operators.rankstats import grouped_bucketed_cumsum

    df = spark.createDataFrame(
        [("a", 1.0, 0.5), ("a", 2.0, 0.25), ("b", 1.0, -1.5)], ["g", "v", "w"]
    )
    got = {
        (r["g"], r["v"]): r["cum"]
        for r in grouped_bucketed_cumsum(df, ["g"], "v", "w").collect()
    }
    assert got == {("a", 1.0): 0.5, ("a", 2.0): 0.75, ("b", 1.0): -1.5}


def test_cummax_matches_global_window(spark):
    from etl_file_sync_spark.operators.rankstats import bucketed_cummax

    rows = [(float(i), float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, ["v", "x"])
    for inclusive in (True, False):
        got = bucketed_cummax(
            df, "v", "x", out_col="m", inclusive=inclusive, n_buckets=8
        )
        end = 0 if inclusive else -1
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
        want = df.withColumn("m", F.max("x").over(w))
        g = {r["v"]: r["m"] for r in got.collect()}
        e = {r["v"]: r["m"] for r in want.collect()}
        assert g == e, f"inclusive={inclusive}"


def test_cummax_strict_prefix_is_null_at_minimum(spark):
    from etl_file_sync_spark.operators.rankstats import bucketed_cummax

    df = spark.createDataFrame([(1.0, 9), (2.0, 3), (3.0, 11)], ["v", "x"])
    got = {
        r["v"]: r["m"]
        for r in bucketed_cummax(df, "v", "x", out_col="m", inclusive=False).collect()
    }
    assert got == {1.0: None, 2.0: 9, 3.0: 9}


def test_cumsums_double_weights_keep_fractional_offsets(spark):
    """Regression (round 5): a fractional weight column must not infer a
    LongType offset frame from the integer zero of the first bucket.
    Bucketed association reorders double additions, so agreement with
    the sequential global window is to ulp tolerance, not bit-exact —
    the documented accepted risk for fractional weights."""
    import pytest

    rows = [(float(i), 0.1 * i) for i in range(100)]
    df = spark.createDataFrame(rows, ["v", "w"])
    got = bucketed_cumsums(df, "v", ["w"], inclusive=True, n_buckets=8)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum_w", F.sum("w").over(w))
    g = {r["v"]: r["cum_w"] for r in got.collect()}
    e = {r["v"]: r["cum_w"] for r in want.collect()}
    assert g == pytest.approx(e, abs=1e-9)


def test_multi_row_numbers_match_single_calls(spark):
    """bucketed_row_numbers (the layered multi-ranking spelling, r8) must
    equal one bucketed_row_number per spec — ties, skewed tail and all."""
    from etl_file_sync_spark.operators.rankstats import bucketed_row_numbers

    rows = [(float(i % 17), float((i * 7) % 23), i) for i in range(500)] + [
        (999.5, -3.25, 10_000 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["a", "b", "id"])
    got = bucketed_row_numbers(
        df, [("a", ["id"], "rn_a"), ("b", ["id"], "rn_b")], n_buckets=8
    )
    g = {r["id"]: (r["rn_a"], r["rn_b"]) for r in got.collect()}
    ra = {
        r["id"]: r["rn"]
        for r in bucketed_row_number(df, "a", ["id"], out_col="rn", n_buckets=8).collect()
    }
    rb = {
        r["id"]: r["rn"]
        for r in bucketed_row_number(df, "b", ["id"], out_col="rn", n_buckets=8).collect()
    }
    assert g == {i: (ra[i], rb[i]) for i in ra}


def test_multi_row_numbers_empty_and_null(spark):
    from etl_file_sync_spark.operators.rankstats import bucketed_row_numbers

    empty = spark.createDataFrame([], "a double, b double, id long")
    out = bucketed_row_numbers(empty, [("a", ["id"], "rn_a"), ("b", ["id"], "rn_b")])
    assert out.count() == 0 and {"rn_a", "rn_b"} <= set(out.columns)

    withnull = spark.createDataFrame(
        [(1.0, 1.0, 1), (None, 2.0, 2)], "a double, b double, id long"
    )
    import pytest

    with pytest.raises(Exception, match="NULL values in order column"):
        bucketed_row_numbers(withnull, [("a", ["id"], "rn_a")]).collect()
