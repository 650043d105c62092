"""t2-style correctness: every registered query with an oracle is compared
against DuckDB on the same parquet tables — the same check the driver
runs (row count + column names + values), at sf0.001 for speed."""

from __future__ import annotations

import pytest

from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    rel = duck.sql(q.oracle)
    assert_frames_match(sdf, rel)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    # stable schema: collect twice must agree
    assert sdf.columns == q.build(spark, sf_dir).columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
