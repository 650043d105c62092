"""Time-series queries over `events`: gap-fill interpolation, EWMA
smoothing, rolling z-score anomalies. All integer-cent daily grain so the
DuckDB oracles reproduce every value (windowed double sums differ between
engines in final ulps; integer cents do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import timeseries as TS
from etl_file_sync_spark.queries.registry import register, t

_DAILY_TYPE = """
    daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
"""


@register(
    "ts_ewma_daily",
    f"""
    WITH {_DAILY_TYPE},
    g AS (
      SELECT key, day, cents,
             CAST(row_number() OVER (PARTITION BY key ORDER BY day) AS INTEGER) AS rn
      FROM daily
    ),
    s AS (
      SELECT key, day, cents, rn,
             power(0.8, rn) * sum(
               CASE WHEN rn = 1 THEN cents / 0.8
                    ELSE cents * 0.2 / power(0.8, rn) END
             ) OVER (PARTITION BY key ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ewma_cents
      FROM g
    )
    SELECT key AS event_type, CAST(day AS TIMESTAMP) AS day, cents,
           round(ewma_cents / 100.0, 2) AS ewma_value
    FROM s ORDER BY event_type, day
    """,
    "timeseries",
    "ewma",
    "window",
)
def ts_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.2) of daily revenue per event type via the closed-form
    running-sum window (operators/timeseries.py) — one shuffle to daily
    grain, windows reuse the same partitioning, no sequential scan."""
    ev = t(spark, sf_dir, "events")
    series = TS.daily_cents(ev, "event_type")
    return (
        TS.ewma(series, alpha=0.2)
        .select(
            F.col("key").alias("event_type"),
            F.col("day").cast("timestamp").alias("day"),
            "cents",
            F.round(F.col("ewma_cents") / 100.0, 2).alias("ewma_value"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_rolling_zscore",
    f"""
    WITH {_DAILY_TYPE},
    z AS (
      SELECT key, day, cents,
             avg(cents) OVER w AS mean_w,
             stddev_samp(cents) OVER w AS sd_w,
             count(*) OVER w AS n_w
      FROM daily
      WINDOW w AS (PARTITION BY key ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT key AS event_type, CAST(day AS TIMESTAMP) AS day, cents,
           round(CASE WHEN n_w >= 3 AND sd_w > 0
                      THEN (cents - mean_w) / sd_w END, 4) AS z,
           CASE WHEN n_w >= 3 AND sd_w > 0
                THEN abs((cents - mean_w) / sd_w) > 2.0 END AS is_anomaly
    FROM z ORDER BY event_type, day
    """,
    "timeseries",
    "anomaly",
    "window",
)
def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day z-score anomaly flags on daily revenue per event
    type; z is null until 3 points exist (integer-cent inputs keep the
    float window math engine-identical to 1e-12)."""
    ev = t(spark, sf_dir, "events")
    series = TS.daily_cents(ev, "event_type")
    return (
        TS.rolling_zscore(series, window_days=7, z_thresh=2.0)
        .select(
            F.col("key").alias("event_type"),
            F.col("day").cast("timestamp").alias("day"),
            "cents",
            F.round("z", 4).alias("z"),
            "is_anomaly",
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_gapfill_interpolate",
    """
    WITH daily AS (
      SELECT user_id AS key, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE user_id < 30 GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    spine AS (
      SELECT k.key, CAST(unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT key FROM daily) k CROSS JOIN span s
    ),
    dense AS (
      SELECT sp.key, sp.day, d.cents FROM spine sp
      LEFT JOIN daily d ON sp.key = d.key AND sp.day = d.day
    ),
    nbr AS (
      SELECT key, day, cents,
             last_value(cents IGNORE NULLS) OVER wp AS prev_c,
             last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS prev_d,
             first_value(cents IGNORE NULLS) OVER wn AS next_c,
             first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS next_d
      FROM dense
      WINDOW wp AS (PARTITION BY key ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY key ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT key AS user_id, CAST(day AS TIMESTAMP) AS day, cents,
           round(COALESCE(
             CAST(cents AS DOUBLE),
             prev_c + (next_c - prev_c)
               * (date_diff('day', prev_d, day) * 1.0 / date_diff('day', prev_d, next_d)),
             CAST(prev_c AS DOUBLE), CAST(next_c AS DOUBLE)), 2) AS filled_cents,
           cents IS NULL AS is_interpolated
    FROM nbr ORDER BY user_id, day
    """,
    "timeseries",
    "gapfill",
    "interpolation",
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-user daily revenue onto the full calendar (generated
    sequence spine — no calendar table) and linearly interpolate interior
    gaps; edges fall back to nearest observed value. ~45% of the
    (user, day) cells are absent at this SF, so the interpolation path
    is genuinely exercised."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    series = TS.daily_cents(ev, "user_id")
    return (
        TS.gapfill_interpolate(series)
        .select(
            F.col("key").alias("user_id"),
            F.col("day").cast("timestamp").alias("day"),
            "cents",
            "filled_cents",
            "is_interpolated",
        )
        .orderBy("user_id", "day")
    )
