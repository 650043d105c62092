"""Time-edge-poked tier: calendar semantics and watermark hygiene.

The organic tiers span one tidy month of events and six tidy TPC-H
years, so date_trunc / datediff / day-of-week / spine construction only
ever see friendly positive-epoch dates. This sweep re-runs every
oracled query on a tier where events.ts, orders.o_orderdate and
lineitem.l_shipdate carry calendar edges — the exact epoch (the classic
default-initialized timestamp), pre-epoch negative microseconds, a leap
day, the 2038 rollover, 1700/1899 dates, and far-future values near the
pandas ns ceiling (tools/timeedge_tier.py).

The first run of this sweep found two failure classes, each fixed by a
contract rather than a per-query patch:
- WATERMARK POISONING: one poked 2262 event advanced the global
  watermark past every real window and five stateful streaming queries
  silently lost 2-15 rows each to "late" drops. Fix: the event-time
  admission window (streaming/replay.py ADMIT_MIN_TS/ADMIT_MAX_TS),
  mirrored into every watermarked oracle.
- SPINE BLOWUP: the gapfill/resample operators built calendar spines
  over the observed min/max span, so one corrupt timestamp inflated a
  31-day spine 4,000x (the oracle's quadratic IGNORE NULLS window never
  finished). Fix: the bounded-gapfill contract (explicit reporting
  window, TimescaleDB-style — operators/timeseries.py).
"""

from __future__ import annotations


import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.timeedge_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("timeedge_tier")))
    con = duckdb.connect()
    lo, hi, pre = con.execute(
        f"""
        SELECT min(ts), max(ts),
               count(*) FILTER (ts < TIMESTAMP '1970-01-02')
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    con.close()
    assert lo.year <= 1900 and hi.year >= 2262 and pre > 0, (
        "tier synthesis poked no time edges"
    )
    return d


@pytest.fixture(scope="module")
def duck(tier):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{tier}/{name}.parquet')"
        )
    yield con
    con.close()


def test_watermark_not_poisoned(spark, tier):
    """One far-future event must not late-drop the rest of the stream:
    with the admission window, the streamed exactly-once dedup output
    equals the admitted batch relation row-for-row."""
    from pyspark.sql import functions as F

    from etl_file_sync_spark.catalog import load_table
    from etl_file_sync_spark.streaming.replay import ADMIT_MAX_TS, ADMIT_MIN_TS

    q = REGISTRY["stream_dedup_exactly_once"]
    got = q.build(spark, tier).count()
    want = (
        load_table(spark, tier, "events")
        .where(
            (F.col("ts") >= F.lit(ADMIT_MIN_TS).cast("timestamp"))
            & (F.col("ts") < F.lit(ADMIT_MAX_TS).cast("timestamp"))
        )
        .count()
    )
    assert got == want


def test_bounded_spine_stays_bounded(spark, tier):
    """The gapfill spine is the declared reporting window — 31 days per
    key — no matter how corrupt the input timestamps are."""
    from pyspark.sql import functions as F

    out = REGISTRY["ts_gapfill_interpolate"].build(spark, tier)
    per_key = out.groupBy("key" if "key" in out.columns else "user_id").count()
    mx = per_key.agg(F.max("count")).collect()[0][0]
    assert mx == 31, f"spine leaked outside the reporting window: {mx} days"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_timeedge_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()
