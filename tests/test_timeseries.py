"""Hand-computed ground truth for the time-series operators
(operators/timeseries.py): EWMA recurrence, gap-fill interpolation,
rolling z-score null rules."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import timeseries as TS


def _series(spark, vals):
    rows = [
        ("k", dt.date(2024, 1, d), c) for d, c in vals
    ]
    return spark.createDataFrame(rows, "key string, day date, cents long")


def test_ewma_matches_recurrence(spark):
    xs = [100, 200, 50, 400, 400]
    df = TS.ewma(_series(spark, list(enumerate(xs, start=1))), alpha=0.2)
    got = [r.ewma_cents for r in df.orderBy("day").collect()]
    s, exp = None, []
    for x in xs:
        s = x if s is None else 0.2 * x + 0.8 * s
        exp.append(s)
    assert got == pytest.approx(exp, rel=1e-9)


def test_gapfill_interior_linear_and_edges_nearest(spark):
    # days 1,4 observed; 2,3 interpolated at 1/3 and 2/3; day 5+ absent
    df = TS.gapfill_interpolate(_series(spark, [(1, 300), (4, 600)]))
    rows = {r.day.day: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].filled_cents == 300.0 and not rows[1].is_interpolated
    assert rows[2].filled_cents == 400.0 and rows[2].is_interpolated
    assert rows[3].filled_cents == 500.0
    assert rows[4].filled_cents == 600.0 and not rows[4].is_interpolated


def test_gapfill_edge_bfill(spark):
    # leading gap: day 1 missing in span only if a later min... construct
    # two keys so the spine spans day 1-3 while key b starts at day 2
    a = _series(spark, [(1, 100), (3, 100)])
    b = _series(spark, [(2, 500), (3, 700)]).withColumn("key", F.lit("b"))
    df = TS.gapfill_interpolate(a.unionByName(b))
    got = {(r.key, r.day.day): r.filled_cents for r in df.collect()}
    assert got[("b", 1)] == 500.0  # bfill from first observation
    assert got[("k", 2)] == 100.0  # interior interpolation (flat)


def test_rolling_zscore_null_until_three_points_and_flat(spark):
    df = TS.rolling_zscore(
        _series(spark, [(1, 100), (2, 100), (3, 100), (4, 100), (5, 900)]), window_days=7
    )
    rows = {r.day.day: r for r in df.collect()}
    assert rows[1].z is None and rows[2].z is None  # < 3 points
    assert rows[3].z is None and rows[4].z is None  # flat window, sd=0
    # day 5: mean=260, sd=stddev_samp([100]*4+[900])=sqrt(128000)≈357.77
    # z = (900-260)/357.77 ≈ 1.7889 — present, below the 2.0 flag bar
    assert rows[5].z == pytest.approx(1.7889, abs=1e-3)
    assert rows[5].is_anomaly is False
