"""Malformed/heterogeneous-JSON tier: schema-on-read under producer bugs.

The organic events.props column is uniformly tidy '{"k": <int>, ...}'
objects, so the JSON surface (get_json_object, parse_json VARIANT,
json_extract oracles) only ever ran the happy path. This sweep re-runs
every oracled query on a tier where props carries truncated objects,
bare words, empty strings, arrays/scalars/JSON nulls at the object
position, wrong-typed values at the extracted path (string numbers,
booleans, nested objects, 20-digit overflow integers), escaped
surrogate pairs, deep nesting, BOM prefixes and NULLs
(tools/json_tier.py).

The first run CRASHED both engines — plain parse_json aborts the whole
job on the first malformed payload and DuckDB's json_extract errors
the oracle — which is exactly the class this tier exists to catch.
Fixed by TRY semantics as the contract (try_parse_json /
try_variant_get engine-side; json_valid guards oracle-side) plus the
shared numeric-string truncation convention for path casts
('12.7' -> 12 like Spark's non-ANSI string->int; boolean and overflow
-> NULL; a bare DuckDB CAST would round to 13 and error on 20-digit
values).

There is deliberately NO duplicate-key poke: Spark's variant builder
REJECTS duplicate-key objects, DuckDB's parser dedups last-wins, and
Jackson streams first-wins — three engines, three answers, no
SQL-expressible mirror. Duplicate-key producers are a DLQ concern
upstream of the analytics surface.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.json_tier import PROPS_POKES, synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("json_tier")))
    con = duckdb.connect()
    n_null, n_bad = con.execute(
        f"""
        SELECT count(*) FILTER (props IS NULL),
               count(*) FILTER (props IS NOT NULL AND NOT json_valid(props))
        FROM read_parquet('{d}/events.parquet')
        """
    ).fetchone()
    con.close()
    assert n_null > 0 and n_bad > 0, "tier synthesis poked no bad JSON"
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


def test_try_parse_never_aborts(spark, tier):
    """The don't-kill-the-job contract: the VARIANT query completes over
    every poke class and yields one row per input id — malformed
    payloads become NULL extractions, not exceptions."""
    out = REGISTRY["scalar_variant_ops"].build(spark, tier).toPandas()
    assert len(out) == 500
    poked_bad = [i for i in range(500) if i % 229 in (3, 7, 11)]
    assert out.set_index("event_id").loc[poked_bad, "k_val"].isna().all()


def test_truncation_convention(spark, tier):
    """'12.7' at the path casts to 12 in BOTH engines (Spark non-ANSI
    truncation; the oracle's double-parse + trunc spelling)."""
    out = REGISTRY["scalar_variant_ops"].build(spark, tier).toPandas()
    string_num = [i for i in range(500) if i % 229 == 19]
    got = out.set_index("event_id").loc[string_num, "k_val"]
    assert (got == 12).all()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_json_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()
