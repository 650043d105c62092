"""Per-stage metrics probe for headline queries (guide §1/§7: find where
the time actually goes before touching anything).

Runs the named queries once warm + once measured in a UI-enabled session,
then reads the Spark status REST API and prints, per stage of the
measured run: executor run/cpu time, input / shuffle-read / shuffle-write
bytes, task count, and the stage name (operator scope). This is the
empirical stage-level view the optimization guide's §1.1 empirical loop
wants; wall-clock alone on this noisy box cannot say WHICH stage is hot.

The session is built here with the exact bench confs (session.get_spark)
plus the UI enabled; builders' prep() only touches runtime confs, so
plans match the bench exactly.

Usage:
    python tools/stage_probe.py QUERY [QUERY...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--port", type=int, default=4049)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bench import _extras, force
    from etl_file_sync_spark.queries import REGISTRY

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.port))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("WARN")
    force(REGISTRY["q06_forecast_revenue"].build(spark, args.sf))
    force(spark.range(1000).repartition(cpus).mapInPandas(lambda it: it, "id long"))

    api = f"http://localhost:{args.port}/api/v1"
    app_id = sc.applicationId
    extras = _extras()

    def all_stages():
        with urllib.request.urlopen(f"{api}/applications/{app_id}/stages") as r:
            return json.load(r)

    for name in args.queries:
        build = extras[name] if name in extras else REGISTRY[name].build
        spark.catalog.clearCache()
        force(build(spark, args.sf))  # warm run (codegen; caches filled then cleared)
        spark.catalog.clearCache()
        next_stage = 1 + max((s["stageId"] for s in all_stages()), default=-1)
        t0 = time.perf_counter()
        force(build(spark, args.sf))
        wall = time.perf_counter() - t0
        rows = []
        for s in all_stages():
            if s["stageId"] < next_stage or s["status"] not in ("COMPLETE", "FAILED"):
                continue
            rows.append(
                {
                    "id": s["stageId"],
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s["executorRunTime"],
                    "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "in_mb": round(s["inputBytes"] / 1e6, 1),
                    "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                    "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                    "name": s["name"].split("\n")[0][:90],
                }
            )
        rows.sort(key=lambda r: -r["run_ms"])
        print(f"=== {name}: wall={wall:.2f}s stages={len(rows)} "
              f"sum_run={sum(r['run_ms'] for r in rows)/1000:.2f}s "
              f"sum_cpu={sum(r['cpu_ms'] for r in rows)/1000:.2f}s")
        for r in rows:
            print(
                f"  s{r['id']:<4} t={r['tasks']:<3} run={r['run_ms']:>6}ms cpu={r['cpu_ms']:>6}ms "
                f"in={r['in_mb']:>7} shR={r['sh_r_mb']:>7} shW={r['sh_w_mb']:>7}  {r['name']}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
