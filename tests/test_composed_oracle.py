"""Composed poked tiers: pairwise interactions of the single-variable
families (round-7 verdict #3).

Every convention in CONVENTIONS.md was derived one poked family at a
time, so each parent sweep holds every other variable organic —
interactions are the likeliest remaining hiding place. Three
compositions (tools/composed_tiers.py), each run at FULL oracle
parity:

* extremeid x skew — the 80 %-owner user id is NEGATIVE (-6) and the
  50 %-owner customer key is 2^62+1: sentinel re-encoding, per-entity
  caps, floor-mod bucketing, and id checksums all exercised on a
  DOMINANT extreme-band entity at once.
* ties x skew — 80 % of events belong to one user AND sit on
  timestamp grids with exact-duplicate times inside that user: every
  rank/session/as-of tiebreak runs inside a single dominant
  partition.
* unicode x monster — both monster documents are multi-byte (the
  repeat monster's unit is CJK/sharp-s/combining text, the blob is
  repeat('ß数', 30000)): per-document array machinery at monster
  CHARACTER length where byte length is ~2.5x larger.

Synthesis is DuckDB-deterministic — both engines read byte-identical
parquet, so any divergence here is a real convention gap between the
engine spelling and the oracle spelling under the INTERACTION.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.composed_tiers import (
    HOT_CUST_HUGE,
    HOT_USER_NEG,
    extremeid_skew,
    ties_skew,
    unicode_monster,
)

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


def _views(con, d):
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{d}/{name}.parquet')"
        )


@pytest.fixture(scope="module")
def xidskew_tier(tmp_path_factory):
    d = extremeid_skew(str(tmp_path_factory.mktemp("xid_skew")))
    con = duckdb.connect()
    frac_neg, frac_huge = con.execute(
        f"""
        SELECT (SELECT count(*) FILTER (user_id = {HOT_USER_NEG}) * 1.0 / count(*)
                FROM read_parquet('{d}/events.parquet')),
               (SELECT count(*) FILTER (o_custkey = {HOT_CUST_HUGE}) * 1.0 / count(*)
                FROM read_parquet('{d}/orders.parquet'))
        """
    ).fetchone()
    con.close()
    assert frac_neg > 0.75, f"negative hot user not dominant ({frac_neg})"
    assert frac_huge > 0.45, f"huge hot customer not dominant ({frac_huge})"
    return d


@pytest.fixture(scope="module")
def xidskew_duck(xidskew_tier):
    con = duckdb.connect()
    _views(con, xidskew_tier)
    yield con
    con.close()


@pytest.fixture(scope="module")
def tieskew_tier(tmp_path_factory):
    d = ties_skew(str(tmp_path_factory.mktemp("ties_skew")))
    con = duckdb.connect()
    frac_hot, dup_ts = con.execute(
        f"""
        SELECT (SELECT count(*) FILTER (user_id = 7) * 1.0 / count(*)
                FROM read_parquet('{d}/events.parquet')),
               (SELECT count(*) FROM (
                  SELECT ts FROM read_parquet('{d}/events.parquet')
                  WHERE user_id = 7 GROUP BY ts HAVING count(*) > 1))
        """
    ).fetchone()
    con.close()
    assert frac_hot > 0.75, f"hot user not dominant ({frac_hot})"
    assert dup_ts > 10, f"no duplicate timestamps inside the hot user ({dup_ts})"
    return d


@pytest.fixture(scope="module")
def tieskew_duck(tieskew_tier):
    con = duckdb.connect()
    _views(con, tieskew_tier)
    yield con
    con.close()


@pytest.fixture(scope="module")
def unimon_tier(tmp_path_factory):
    d = unicode_monster(str(tmp_path_factory.mktemp("uni_monster")))
    con = duckdb.connect()
    monsters = con.execute(
        f"""
        SELECT length(text) AS chars, strlen(text) AS bytes
        FROM read_parquet('{d}/documents.parquet')
        WHERE doc_id % 499 IN (3, 7) ORDER BY chars DESC
        """
    ).fetchall()
    con.close()
    assert monsters and monsters[0][0] > 8_000, f"no monster doc: {monsters}"
    for chars, nbytes in monsters:
        assert nbytes > chars, f"monster is not multi-byte ({chars}ch/{nbytes}B)"
    return d


@pytest.fixture(scope="module")
def unimon_duck(unimon_tier):
    con = duckdb.connect()
    _views(con, unimon_tier)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_extremeid_skew(spark, xidskew_tier, xidskew_duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, xidskew_tier), xidskew_duck.sql(q.oracle))
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_ties_skew(spark, tieskew_tier, tieskew_duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tieskew_tier), tieskew_duck.sql(q.oracle))
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_unicode_monster(spark, unimon_tier, unimon_duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, unimon_tier), unimon_duck.sql(q.oracle))
    spark.catalog.clearCache()
