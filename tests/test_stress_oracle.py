"""Magnitude-stress oracle sweep: the full Spark-vs-DuckDB comparison
re-run on a tier whose money columns are scaled x1000
(tools/stress_tier.py), so integer squared/cross-multiplied aggregates
land PAST the 9.2e18 BIGINT ceiling.

The non-ANSI session wraps BIGINT silently while DuckDB accumulates in
HUGEINT, so this sweep is an empirical overflow detector: any
n^2-scale integer product still spelled in BIGINT wraps on the Spark
side, diverges from the oracle, and fails here — and ONLY here, because
every other tier sits orders of magnitude below the ceiling.  The
round-6 DECIMAL promotions (squared cents in Cohen's d / DiD /
Brown-Forsythe / BH / Holm, the KS and CUSUM cross-multiplies, the Gini
rank-weighted sum, the kappa marginal products — SCALE.md) are what
this sweep proves out at overflow-triggering magnitudes.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.stress_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="session")
def stress_dir(tmp_path_factory):
    return synthesize(str(tmp_path_factory.mktemp("stress_tier")))


@pytest.fixture(scope="module")
def duck_stress(stress_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{stress_dir}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_stressed(spark, duck_stress, stress_dir, name):
    q = REGISTRY[name]
    sdf = q.build(spark, stress_dir)
    rel = duck_stress.sql(q.oracle)
    assert_frames_match(sdf, rel)
