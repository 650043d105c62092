"""Negative/zero/sub-cent money tier: sign-sensitive spellings.

The organic money columns are strictly positive and cent-aligned, so
every sign-sensitive spelling only ever ran on the happy half of the
number line. Refunds and chargebacks make negative money ROUTINE in
production revenue streams. This sweep re-runs every oracled query on
a tier where orders.o_totalprice and events.value carry full refunds
(negated), partial refunds, zeros, and sub-cent magnitudes
(tools/refunds_tier.py).

Divergence classes hunted: floor-vs-truncate integer division (DuckDB
``//`` and F.floor agree at floor; CAST(x/y AS INT) truncates toward
zero — identical on positives, off-by-one on negatives), ln/sqrt of
aggregates that can now go negative (Spark returns NULL where DuckDB
ERRORS), rounding of negative halves, and rank/percentile machinery
over signed values.

The first run was 350/350 GREEN — the repo's existing conventions
(floor spellings for every bucket index, exact DECIMAL cents
accumulation, complete-case measures) already hold on signed money —
so this sweep ships as a pure regression guard: any future query that
spells trunc where it means floor, or an unguarded log over a signed
aggregate, fails here and nowhere else.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import assert_frames_match
from tools.refunds_tier import synthesize

pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def tier(tmp_path_factory):
    d = synthesize(str(tmp_path_factory.mktemp("refunds_tier")))
    con = duckdb.connect()
    n_neg, n_zero, n_sub = con.execute(
        f"""
        SELECT count(*) FILTER (o_totalprice < 0),
               count(*) FILTER (o_totalprice = 0),
               count(*) FILTER (o_totalprice <> 0 AND abs(o_totalprice) < 0.005)
        FROM read_parquet('{d}/orders.parquet')
        """
    ).fetchone()
    n_lneg, n_full_disc = con.execute(
        f"""
        SELECT count(*) FILTER (l_extendedprice < 0),
               count(*) FILTER (l_discount = 1.0)
        FROM read_parquet('{d}/lineitem.parquet')
        """
    ).fetchone()
    con.close()
    assert n_neg > 0 and n_zero > 0 and n_sub > 0, "tier poked no refund shapes"
    assert n_lneg > 0 and n_full_disc > 0, "tier poked no lineitem refunds"
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


def test_signed_cents_sum_is_exact(spark, tier):
    """Refund rows subtract exactly: the signed integer-cents total over
    the poked tier equals the independently computed pandas sum."""
    import pandas as pd

    from pyspark.sql import functions as F

    from etl_file_sync_spark.catalog import load_table

    got = (
        load_table(spark, tier, "orders")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"))
        .collect()[0]["c"]
    )
    import numpy as np

    pdf = pd.read_parquet(f"{tier}/orders.parquet")
    # HALF_UP away from zero like Spark's round (pandas .round is
    # half-EVEN): trunc(x + sign(x)*0.5)
    v = pdf["o_totalprice"].to_numpy() * 100
    want = int(np.trunc(v + np.where(v >= 0, 0.5, -0.5)).astype("int64").sum())
    assert got == want


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_refunds_tier(spark, tier, duck, name):
    q = REGISTRY[name]
    assert_frames_match(q.build(spark, tier), duck.sql(q.oracle))
    spark.catalog.clearCache()
