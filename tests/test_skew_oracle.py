"""Hot-key-skew tier: Zipfian key distributions, organic values.

The organic tiers are uniform, so every per-entity aggregate runs on
small balanced groups. This sweep re-runs every oracled query on a
tier where 80 % of events belong to ONE user, half the orders to ONE
customer, 30 % of lineitems to ONE part, and 80 % of documents to ONE
source (tools/skew_tier.py) — measures, text, and timestamps
untouched, so key distribution is the only variable.

Parity classes hunted: per-entity sequence machinery (funnels, Markov
chains, sessionization, streaks, attribution paths) on an entity
holding most of the corpus; distinct/rank machinery where one group
dwarfs the rest; domain-cap sampling where one domain exceeds the cap
many times over. The scale half of the story (does the hot key
straggle?) lives in the plan assertions and SCALE.md — this sweep
pins that the MATH stays identical when the keys go Zipfian.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.skew_tier import HOT_USER, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("skew_tier")))
    con = duckdb.connect()
    frac_hot, = con.execute(
        f"""
        SELECT count(*) FILTER (user_id = {HOT_USER}) * 1.0 / count(*)
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    con.close()
    assert frac_hot > 0.75, f"tier is not skewed (hot-user share {frac_hot})"
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
def test_query_matches_oracle_on_skew_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()
