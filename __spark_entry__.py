"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` exposes the
full registry (one entry per implemented operator, SURVEY.md §2);
`oracle_sql()` supplies the DuckDB-equivalent SQL for every
SQL-expressible query (the 11 rows-only entries are approximate or
iterative by design — HLL/frequent-items/approx-top-k sketches,
IVF/PQ/IVF+PQ ANN, the two BPE tokenizer queries, the IRLS
classifier trainer, and the PCA label profile — each with a
value-exact oracled sibling and
accuracy/recall/bit-exactness/numpy-truth bounds in tests/; the
rows-only count here is lockstep-enforced by
tests/test_docs_lockstep.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_file_sync_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q01_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
