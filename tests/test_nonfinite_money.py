"""Non-finite money tier: the ingest contract under NaN/Infinity doubles.

The non-ANSI session casts NaN -> 0 and Infinity -> Long.MaxValue
SILENTLY, so one corrupt upstream double in o_totalprice would inject
9.2 quintillion cents into every revenue aggregate at 100 TB (DuckDB at
least aborts the cast). The engine's contract (catalog._sanitize_doubles)
is: non-finite floating values are NULL at the scan chokepoint. This
sweep re-runs every oracled query on a tier with NaN/Infinity poked
into o_totalprice, against DuckDB views that apply the SAME contract
(CASE WHEN isfinite(x) THEN x END) — pinning that the engine on raw
corrupt data equals the oracle on contract-sanitized data.

The first run of this sweep found 14 divergences: the rank/percentile
machinery receiving partial-NULL measures (rankstats refuses NULL order
keys; DuckDB windows rank them) — fixed by the observed-values
convention (filter NULL measures in BOTH engines) across the
Mann-Whitney/Kruskal/KS/Mood/Dunn/energy/Wasserstein/trimmed/winsorized/
equi-depth/conformal/Brown-Forsythe family — and NULL-revenue days
breaking the daily-series recursions (Pettitt, Holt-Winters) — fixed by
the unobserved-days-leave-the-series convention in the shared daily
frames.
"""

from __future__ import annotations

import math
import os
import shutil

import duckdb
import pandas as pd
import pytest

from etl_file_sync_spark.catalog import TABLES
from etl_file_sync_spark.queries import REGISTRY
from tests.conftest import canon, _kind

pytestmark = pytest.mark.slow

SRC = "/root/testdata/sf0.001"
ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def nan_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nonfinite_tier"))
    for name in TABLES:
        src = os.path.join(SRC, f"{name}.parquet")
        if name != "orders" and os.path.exists(src):
            dst = os.path.join(d, f"{name}.parquet")
            shutil.copy2(src, dst) if os.path.isfile(src) else shutil.copytree(src, dst)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
              CASE WHEN o_orderkey % 997 = 5 THEN 'NaN'::DOUBLE
                   WHEN o_orderkey % 997 = 11 THEN 'Infinity'::DOUBLE
                   ELSE o_totalprice END AS o_totalprice)
              FROM read_parquet('{SRC}/orders.parquet'))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/orders.parquet') "
        "WHERE isnan(o_totalprice) OR NOT isfinite(o_totalprice)"
    ).fetchone()[0]
    assert n > 0, "tier synthesis poked no non-finite values"
    con.close()
    return d


@pytest.fixture(scope="module")
def duck(nan_dir):
    con = duckdb.connect()
    for name in TABLES:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{nan_dir}/{name}.parquet')"
        ).df()
        repl = [
            f"CASE WHEN isfinite({r.column_name}) THEN {r.column_name} END"
            f" AS {r.column_name}"
            for r in cols.itertuples()
            if r.column_type in ("DOUBLE", "FLOAT")
        ]
        rep = f" REPLACE ({', '.join(repl)})" if repl else ""
        con.execute(
            f"CREATE VIEW {name} AS SELECT *{rep} FROM "
            f"read_parquet('{nan_dir}/{name}.parquet')"
        )
    yield con
    con.close()


def _match(spark_df, duck_rel):
    sp = canon(spark_df.toPandas())
    dk = canon(duck_rel.df())
    assert list(sp.columns) == list(dk.columns)
    assert len(sp) == len(dk), f"rows {len(sp)} vs {len(dk)}"
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if bool(a.isna().all()) and bool(b.isna().all()):
            continue
        ka, kb = _kind(a), _kind(b)
        if "empty" not in (ka, kb):
            assert ka == kb, f"dtype {c}: {ka} vs {kb}"
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            for i, (x, y) in enumerate(zip(a, b)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                assert not (xn or yn), f"{c}[{i}]: {x!r} != {y!r}"
                assert x == pytest.approx(y, abs=1e-9, rel=1e-9), f"{c}[{i}]"
        else:
            assert a.where(pd.notna(a), None).tolist() == b.where(
                pd.notna(b), None
            ).tolist(), f"col {c} differs"


def test_ingest_contract_blocks_silent_wrap(spark, nan_dir):
    """The raw non-ANSI cast turns Infinity into Long.MaxValue cents;
    the sanitized catalog scan must never let that value exist."""
    from pyspark.sql import functions as F

    from etl_file_sync_spark.catalog import load_table

    mx = (
        load_table(spark, nan_dir, "orders")
        .agg(F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx < 10**15, f"non-finite price leaked into cents: {mx}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_on_nonfinite_tier(spark, nan_dir, duck, name):
    q = REGISTRY[name]
    _match(q.build(spark, nan_dir), duck.sql(q.oracle))
    spark.catalog.clearCache()
