"""Row-order / partitioning INVARIANCE: the full oracle sweep re-run on
a tier whose rows are identical to sf0.001 but whose physical layout is
completely different (rows permuted by key-md5, each table split across
3 part files by an md5 bucket — tools/shuffled_tier.py).

On a 1000-executor cluster, partition composition and scan order are
arbitrary scheduling accidents; a correct operator's result is a pure
function of the input RELATION.  This sweep is the engine-level version
of the rank-machinery partitioning-invariance property tests
(tests/test_properties.py): any query leaning on incidental row order —
an ``F.first`` without ordering, an order-sensitive ``collect_list``
consumer, a window or top-k missing a deterministic tiebreaker — agrees
with DuckDB on the pristine tier (tests/test_queries_oracle.py) but
flips here, because DuckDB's deterministic SQL answer does not move
when the file layout does.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.shuffled_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="session")
def shuffled_dir(tmp_path_factory):
    return synthesize(str(tmp_path_factory.mktemp("shuffled_tier")))


@pytest.fixture(scope="module")
def duck_shuffled(shuffled_dir):
    con = duckdb.connect()
    for name in TABLES:
        # each table is a DIRECTORY of part files in the shuffled tier
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{shuffled_dir}/{name}.parquet/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_invariant_to_layout(spark, shuffled_dir, duck_shuffled, name):
    q = REGISTRY[name]
    sdf = q.build(spark, shuffled_dir)
    rel = duck_shuffled.sql(q.oracle)
    assert_frames_match(sdf, rel)
