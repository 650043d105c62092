"""SQL-operator-level metrics probe: run one query, dump the Spark UI
SQL tab's per-operator metrics (the node -> time/rows map wall-clock
can't give). Usage: python tools/sql_probe.py QUERY [--sf DIR]"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--port", type=int, default=4048)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bench import _extras, force
    from etl_file_sync_spark.queries import REGISTRY

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sql-probe")
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

    extras = _extras()
    build = extras[args.query] if args.query in extras else REGISTRY[args.query].build
    spark.catalog.clearCache()
    force(build(spark, args.sf))  # warm
    spark.catalog.clearCache()

    api = f"http://localhost:{args.port}/api/v1"
    app_id = sc.applicationId
    with urllib.request.urlopen(f"{api}/applications/{app_id}/sql") as r:
        before = {q["id"] for q in json.load(r)}
    force(build(spark, args.sf))
    with urllib.request.urlopen(f"{api}/applications/{app_id}/sql?details=true&planDescription=false&length=200") as r:
        after = json.load(r)
    for q in after:
        if q["id"] in before:
            continue
        print(f"--- sql id={q['id']} status={q['status']} duration={q['duration']}ms "
              f"desc={q['description'][:60]}")
        for node in q.get("nodes", []):
            m = {mm["name"]: mm["value"] for mm in node.get("metrics", [])}
            interesting = {
                k: v
                for k, v in m.items()
                if any(t in k for t in ("time", "rows", "spill", "size"))
            }
            if interesting:
                print(f"  [{node['nodeId']:>3}] {node['nodeName'][:55]:55} {interesting}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
