"""Numerical-conditioning tier: huge-offset measures, organic spreads.

The magnitude-STRESS tier multiplies money by 1000, which leaves the
RELATIVE conditioning of every second-moment statistic unchanged.
This sweep re-runs every oracled query on a tier where the continuous
measures gain a huge ADDITIVE offset instead (events.value and
c_acctbal + 1e9, o_totalprice + 1e8; tools/conditioning_tier.py):
spreads stay ~1e2 while means move to 1e9, so the textbook one-pass
moment spellings (Σx² − (Σx)²/n, Σxy − ΣxΣy/n, θ̄ − θ) cancel ~15 of
16 significant digits and what survives is summation-order noise —
which DIFFERS between Spark's 32-partition tree merge and DuckDB's
accumulation order. A stably-spelled statistic (centered two-pass
algebra, Welford-merge built-ins, exact integer-cents sums, or
point-estimate-anchored resampling deviations) stays in lockstep; an
unstable one diverges here and nowhere else.

This is the 100 TB failure mode where a statistic is green on every
small uniform tier and silently wrong in production: cluster-scale
accumulations routinely carry 1e18+ magnitudes (epoch-nanos, lifetime
counters, global byte totals). Rank/order machinery is immune (the
offset is monotone) and both engines read byte-identical doubles, so
any divergence is a real algorithm-stability finding, never noise.

First contact: 350/351 green; stat_jackknife_ratio's replicate
moments (Σθ²_g − G·θ̄² and θ̄ − θ at θ ~ 1e10 cents) diverged in the
4th decimal and were respelled anchored on d_g = θ_g − θ, which is
bit-identical in both engines because every input is an exact BIGINT.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.conditioning_tier import OFFSET_VALUE, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("conditioning_tier")))
    con = duckdb.connect()
    mean_v, spread_v = con.execute(
        f"""
        SELECT avg(value), max(value) - min(value)
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    con.close()
    assert mean_v > OFFSET_VALUE * 0.99, f"offset missing (mean {mean_v})"
    assert spread_v < 1e6, f"spread not organic ({spread_v}) — offset must be additive"
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
def test_query_matches_oracle_on_conditioning_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()
