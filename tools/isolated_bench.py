"""Isolated re-measure of individual headline queries.

The 180-query bench sweep (bench.py) inherits context from its
neighbors — JVM old-gen pressure, Python-worker churn, cleared caches —
and this box carries documented ~2x run-to-run noise, so a per-query
regression inside the sweep is not evidence by itself. The SCALE.md
discipline (rounds 3-6 precedent): any suspicious cell is re-measured
ISOLATED — its own process, its own fresh JVM, warmup + min-of-N —
before it is called a regression or a fix is attempted. Real defects
reproduce isolated (r6: ts_backtest_seasonal_naive's 3x uncached
branch, r5: phash's 8x lineage re-run); noise clears.

Usage (one PROCESS per query for true isolation):

    python tools/isolated_bench.py QUERY_NAME [--runs 4] [--sf DIR]

Prints one JSON line: {"query": ..., "runs": [...], "min": ..., "sf": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bench import _extras, force
    from etl_file_sync_spark.queries import REGISTRY
    from etl_file_sync_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("isolated-bench", cpus=cpus)
    # same warmup posture as bench.py: JVM codegen + Python worker pool
    force(REGISTRY["q06_forecast_revenue"].build(spark, args.sf))
    force(spark.range(1000).repartition(cpus).mapInPandas(lambda it: it, "id long"))

    extras = _extras()
    build = extras[args.query] if args.query in extras else REGISTRY[args.query].build
    runs: list[float] = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        force(build(spark, args.sf))
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "query": args.query,
        "runs": runs,
        "min": min(runs),
        "sf": args.sf,
        "loadavg": os.getloadavg(),
    }))


if __name__ == "__main__":
    main()
