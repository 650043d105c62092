"""Boundary/tie tier: every cut lands ON an edge, every rank has a tie.

The organic tiers are continuous-uniform — no two rows tie and no
value sits exactly on a boundary, so `>` vs `>=`, [start, end) window
edges, rank tiebreaks, percentile-interpolation midpoints, and
half-up vs half-even rounding are all invisible (the shuffled tier
only catches nondeterminism that organic ties realize; there are
none). This sweep re-runs every oracled query on a tier
(tools/boundary_tier.py) where:

* event times collapse onto 6-hour/15-minute/midnight grids
  (duplicate timestamps within a user, session gaps exactly at the
  timeout, exact tumbling-window starts);
* measures sit on half-integer and x.x5 rounding cliffs and a coarse
  grid that ties at every quantile cut and top-k threshold;
* l_discount/l_quantity are pinned to the TPC-H q6 BETWEEN edges
  (0.05 / 0.07 / 24);
* documents carry exact-duplicate TEXT pairs crossing source/lang
  (keep-best reps tie on every text metric, jaccard hits 1.0);
* embeddings carry exact-duplicate VECTOR pairs (cosine exactly 1.0
  at the top-k cut, identical LSH bands).

A query that orders through a tie without a deterministic tiebreak,
or whose oracle disagrees with the engine about which side of an
edge a boundary value falls on, mismatches here and nowhere else.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.boundary_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("boundary_tier")))
    con = duckdb.connect()
    dup_ts, dup_user_ts = con.execute(
        f"""
        SELECT count(*) - count(DISTINCT ts),
               count(*) - count(DISTINCT (user_id, ts))
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    vec_dups, = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{d}/embeddings.parquet') a
        JOIN read_parquet('{d}/embeddings.parquet') b
          ON a.vec_id = b.vec_id + 1 AND a.embedding = b.embedding
        """
    ).fetchone()
    con.close()
    assert dup_ts > 50, f"tier has no timestamp ties ({dup_ts})"
    assert dup_user_ts > 5, f"tier has no within-user ts ties ({dup_user_ts})"
    assert vec_dups > 100, f"tier has no duplicate vectors ({vec_dups})"
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
def test_query_matches_oracle_on_boundary_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()


def test_rollup_avg_floor_grain_on_sf01_boundary(spark, tmp_path_factory):
    """Rounding-boundary regression pinned at the SCALE it appeared:
    the sf0.01-sourced boundary tier aligns one hourly group's
    sum(cents)/count so the average's 4th decimal lands exactly on .5,
    where Spark's BigDecimal HALF_UP (on the double's exact binary
    expansion) and DuckDB's round disagree by 1e-4. avg_value is
    therefore reported at the FLOOR grain (floor(x·10^4)/10^4) —
    deterministic on identical doubles — in both spellings; this test
    re-runs the parity on that exact tier (the sf0.001 sweep above
    never realizes the alignment)."""
    import duckdb as _dd

    d = synthesize(
        str(tmp_path_factory.mktemp("boundary_sf01")), src="/root/testdata/sf0.01"
    )
    con = _dd.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{d}/{name}.parquet')"
        )
    q = REGISTRY["rollup_reaggregation"]
    assert_frames_match(q.build(spark, d), con.sql(q.oracle))
    con.close()
    spark.catalog.clearCache()
