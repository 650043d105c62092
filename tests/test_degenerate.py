"""Registry-wide degenerate-input sweep (round-6 verdict ask #3).

Every registered query runs against three degenerate tiers a real
pipeline WILL eventually see — an empty extract, a single surviving row,
and a sparse extract where every optional (non-key) column is NULL —
and must:

- not crash (no driver-side IndexError/KeyError/ZeroDivision, no
  ANSI aborts, no unresolved pivot columns),
- keep a STABLE schema (same column names as on real data — a pivot
  that infers its columns from data changes shape on empty input), and
- emit no NaN/Inf floats (div-by-zero must surface as NULL, the DuckDB
  oracle's semantics, never as a silent NaN).

Tiers are synthesized from sf0.001 by tools/degenerate_tiers.py.
Marked `slow`: ~1000 tiny cases, deselect with `-m "not slow"` while
iterating.
"""

from __future__ import annotations

import math

import pytest

from etl_file_sync_spark.queries import REGISTRY
from tools.degenerate_tiers import synthesize

pytestmark = pytest.mark.slow

ALL_QUERIES = sorted(REGISTRY)
TIERS = ("empty", "one_row", "null_opt")

# column names each query produces on real data (lazy, computed once)
_expected_cols: dict[str, list[str]] = {}


@pytest.fixture(scope="session")
def degen_tiers(tmp_path_factory):
    root = tmp_path_factory.mktemp("degen_tiers")
    return synthesize(str(root))


def _bad_float(v) -> bool:
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_bad_float(x) for x in v)
    if isinstance(v, dict):
        return any(_bad_float(x) for x in v.values())
    return False


@pytest.mark.parametrize("tier", TIERS)
@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_survives_degenerate_tier(spark, sf_dir, degen_tiers, name, tier):
    q = REGISTRY[name]
    df = q.build(spark, degen_tiers[tier])
    rows = df.collect()
    # stable schema: same column names as a build over real data
    if name not in _expected_cols:
        _expected_cols[name] = q.build(spark, sf_dir).columns
    assert df.columns == _expected_cols[name], (
        f"{name} changes shape on {tier}: {df.columns} != {_expected_cols[name]}"
    )
    nan_cells = [
        (i, k, v)
        for i, r in enumerate(rows)
        for k, v in r.asDict(recursive=True).items()
        if _bad_float(v)
    ]
    assert not nan_cells, f"{name} on {tier} emits NaN/Inf: {nan_cells[:5]}"
    spark.catalog.clearCache()
