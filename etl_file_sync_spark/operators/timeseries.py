"""Time-series operators: calendar gap-fill with linear interpolation,
EWMA smoothing, rolling z-score anomaly flags.

All three run on integer-cent daily aggregates (exact across engines —
the windowed-double-sum ulp hazard documented in the verify skill) and
are pure JVM window/sequence expressions — no Python, no driver
round-trips.

Scale design (100 TB): each operator is ONE shuffle on the series key
(the groupBy to daily grain) followed by per-key windows that reuse the
same partitioning — Catalyst plans the window over the agg exchange
without a second shuffle. Series count scales out (one key = one
window partition); series LENGTH is the per-task bound, which for daily
grain is trivially small. The calendar spine is a generated sequence —
no calendar table scan.

EWMA closed form: with β = 1-α and 1-based row number t,
  s_t = β^t · Σ_{i≤t} g_i,  g_1 = x_1/β,  g_i = α·x_i/β^i (i>1)
which turns the recurrence s_t = α·x_t + β·s_{t-1} into a running sum —
a single window aggregate instead of a sequential scan. β^-t grows
exponentially, so this form is for BOUNDED windows per key (daily/hourly
grain: β=0.8 stays in double range beyond t=3000; for unbounded event
streams, chunk by epoch or use applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# The testdata events domain (TESTDATA.md: one month of 2024-01 events
# at every SF). Spine-building registry queries declare this reporting
# window explicitly so a corrupt timestamp can never inflate their
# calendar — the bounded-gapfill contract (see gapfill_interpolate).
EVENTS_REPORT_START = "2024-01-01"
EVENTS_REPORT_END = "2024-01-31"


def daily_cents(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, cents): daily sums in integer cents — exact, engine-
    independent (double daily sums differ in final ulps between engines).
    """
    return (
        df.groupBy(
            F.col(key_col).alias("key"), F.to_date(F.col(ts_col)).alias("day")
        )
        .agg(F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("cents"))
    )


def ewma(series: DataFrame, alpha: float = 0.2) -> DataFrame:
    """EWMA over (key, day, cents): s_t = α·x_t + (1-α)·s_{t-1}, s_1 = x_1,
    via the closed-form running sum (module docstring). Adds ewma_cents.
    """
    beta = 1.0 - alpha
    w_rn = W.partitionBy("key").orderBy("day")
    w_run = w_rn.rowsBetween(W.unboundedPreceding, W.currentRow)
    g = F.when(F.col("rn") == 1, F.col("cents") / beta).otherwise(
        F.col("cents") * alpha / F.pow(F.lit(beta), F.col("rn"))
    )
    return (
        series.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("g", g)
        .withColumn("ewma_cents", F.pow(F.lit(beta), F.col("rn")) * F.sum("g").over(w_run))
        .drop("g")
    )


def rolling_zscore(series: DataFrame, window_days: int = 7, z_thresh: float = 2.0) -> DataFrame:
    """Rolling z-score over the trailing `window_days` rows per key.

    Adds (mean_w, sd_w, z, is_anomaly); z is null until 3 points exist
    or when the window is flat (sd = 0).
    """
    w = (
        W.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-(window_days - 1), W.currentRow)
    )
    mean_w = F.avg("cents").over(w)
    sd_w = F.stddev_samp("cents").over(w)
    n_w = F.count(F.lit(1)).over(w)
    z = F.when((n_w >= 3) & (sd_w > 0), (F.col("cents") - mean_w) / sd_w)
    return (
        series.withColumn("mean_w", mean_w)
        .withColumn("sd_w", sd_w)
        .withColumn("z", z)
        .withColumn("is_anomaly", F.when(F.col("z").isNotNull(), F.abs("z") > z_thresh))
    )


def gapfill_interpolate(
    series: DataFrame, start: str | None = None, end: str | None = None
) -> DataFrame:
    """Densify (key, day, cents) onto the calendar and linearly
    interpolate missing days; edges fall back to nearest value.

    ``start``/``end`` ('YYYY-MM-DD', inclusive) bound the reporting
    window: the series is filtered to it and the spine generated from
    it. Pass them in production — the same contract as TimescaleDB's
    time_bucket_gapfill, whose start/end arguments exist for exactly
    this reason: an UNBOUNDED spine is O(keys x observed-span), so one
    corrupt row with a default-initialized (1970) or far-future
    timestamp inflates the calendar 4,000x and turns a 31-day gapfill
    into a 130k-day blowup (the time-edge-poked tier measured exactly
    that; the oracle's quadratic IGNORE NULLS window never finished).
    Omitting both falls back to the observed min/max span — acceptable
    only when the input's time domain is already trusted/bounded.

    Returns (key, day, cents, filled_cents, is_interpolated) where
    `cents` keeps nulls for absent days and filled_cents is
      observed  →  cents
      interior  →  prev + (next-prev)·(day-prev_day)/(next_day-prev_day)
      edge      →  nearest observed value (ffill/bfill)

    Shape: the spine is sequence(d0, d1) exploded against the distinct
    key set (a broadcast of two tiny aggregate frames), then one left
    join back to the series and two IGNORE NULLS windows per key — no
    driver collect, no calendar table.
    """
    if (start is None) != (end is None):
        raise ValueError("pass both start and end, or neither")
    if start is not None:
        series = series.where(
            (F.col("day") >= F.lit(start).cast("date"))
            & (F.col("day") <= F.lit(end).cast("date"))
        )
        span = series.sparkSession.range(1).select(
            F.lit(start).cast("date").alias("d0"), F.lit(end).cast("date").alias("d1")
        )
    else:
        span = series.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    keys = series.select("key").distinct()
    spine = keys.crossJoin(F.broadcast(span)).select(
        "key", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    dense = spine.join(series, ["key", "day"], "left")

    w_prev = W.partitionBy("key").orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_next = W.partitionBy("key").orderBy("day").rowsBetween(W.currentRow, W.unboundedFollowing)
    day_obs = F.when(F.col("cents").isNotNull(), F.col("day"))
    out = (
        dense.withColumn("prev_c", F.last("cents", ignorenulls=True).over(w_prev))
        .withColumn("prev_d", F.last(day_obs, ignorenulls=True).over(w_prev))
        .withColumn("next_c", F.first("cents", ignorenulls=True).over(w_next))
        .withColumn("next_d", F.first(day_obs, ignorenulls=True).over(w_next))
    )
    interp = F.col("prev_c") + (F.col("next_c") - F.col("prev_c")) * (
        F.datediff("day", "prev_d") / F.datediff("next_d", "prev_d")
    )
    return out.select(
        "key",
        "day",
        "cents",
        F.round(
            F.coalesce(F.col("cents").cast("double"), interp, F.col("prev_c"), F.col("next_c")), 2
        ).alias("filled_cents"),
        F.col("cents").isNull().alias("is_interpolated"),
    )
