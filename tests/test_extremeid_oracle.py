"""Extreme-ID tier: ids cover the full BIGINT range, FKs intact.

Every organic tier draws entity ids from a small dense non-negative
range, so id-space assumptions are never exercised: sign (pmod vs
sign-of-dividend %, truncating vs floor division, sign-blind regexes,
left-shifting negatives), sentinel encoding (user_id < 0 meant
"synthetic"), and magnitude (id sums and id*k arithmetic overflow
BIGINT; float division of ids above 2^53 rounds before the engines'
differing double->int casts). Hash-derived int64 ids — routine at
cluster scale — are negative half the time and uniformly huge.

This sweep re-runs every oracled query on a tier where one injective
remap (tools/extremeid_tier.py: id%5==0 -> -(id+1), id%5==1 -> 2^62+id)
is applied consistently across every FK pair, so referential
integrity, row counts, measures, and timestamps are untouched and ID
SPACE is the only variable.

First contact: 336/351 — fifteen failures across seven defect classes,
all fixed by DEFINED conventions (see COVERAGE.md round-7 notes):
floor-mod (pmod / ((x%k)+k)%k) for every id-derived parameter and
class selector; exact integer division (never float detours) for
id-derived labels and hierarchy parents (decimal-prefix by STRING);
modular checksums instead of raw id sums; mask-first left shifts;
sign-aware regexes; floor-grain quotients instead of round() at .xx5
boundaries; and the streaming flush sentinel re-encoded as ONE
reserved id (Long.MIN_VALUE) instead of the sign convention that
silently dropped real negative users from outer-join results.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.extremeid_tier import HUGE, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("extremeid_tier")))
    con = duckdb.connect()
    n_neg, n_huge = con.execute(
        f"""
        SELECT count(*) FILTER (user_id < 0),
               count(*) FILTER (user_id >= {HUGE})
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    orphans, = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{d}/lineitem.parquet') l
        LEFT JOIN read_parquet('{d}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()
    con.close()
    assert n_neg > 50 and n_huge > 50, f"id space not extreme ({n_neg}, {n_huge})"
    assert orphans == 0, f"remap broke referential integrity ({orphans} orphans)"
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_extremeid_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()


def test_negative_users_survive_streaming_outer_joins(spark, tier):
    """The flush sentinel is ONE reserved id (Long.MIN_VALUE), not a
    sign class: real negative user ids must flow through the
    watermarked outer joins and appear in results. Pins the silent-drop
    defect the old `user_id >= 0` filter caused."""
    out = REGISTRY["stream_full_outer_join"].build(spark, tier).toPandas()
    assert (out["user_id"] < 0).any(), "negative users were dropped"
    assert (out["user_id"] != -(2**63)).all(), "sentinel leaked into results"
