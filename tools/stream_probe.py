"""Wall-clock split of the streaming queries (round-8 verdict #8).

stream_upsert_materialize's ~2.4 s bench wall could hide three very
different costs: the staged-replay setup write, the three genuine
micro-batches (maxFilesPerTrigger=1), and the final-state read. This
probe replays the query's exact build steps with per-phase timers and
reads the per-batch durations from StreamingQuery.recentProgress, so
the "keep or cut" decision is made on a measured split rather than the
bench total. Measurement only — the declared query is untouched.

Usage: python tools/stream_probe.py [--runs 2]
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from bench import force
    from etl_file_sync_spark.queries import REGISTRY
    from etl_file_sync_spark.queries.registry import t
    from etl_file_sync_spark.session import get_spark
    from etl_file_sync_spark.streaming.upsert import final_state, make_upsert

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("stream-probe", cpus=cpus)
    force(REGISTRY["q06_forecast_revenue"].build(spark, args.sf))
    force(spark.range(1000).repartition(cpus).mapInPandas(lambda it: it, "id long"))

    for run in range(args.runs):
        spark.catalog.clearCache()
        t_all = time.perf_counter()
        ev = t(spark, args.sf, "events").select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "value",
        )
        root = tempfile.mkdtemp(prefix="stream_probe_")
        stage = os.path.join(root, "stage")
        t0 = time.perf_counter()
        ev.repartitionByRange(3, "ts").write.mode("overwrite").parquet(stage)
        t_stagewrite = time.perf_counter() - t0
        t0 = time.perf_counter()
        schema = spark.read.parquet(stage).schema
        t_schema = time.perf_counter() - t0

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        t0 = time.perf_counter()
        q = stream.writeStream.foreachBatch(make_upsert(root)).outputMode("update").start()
        try:
            q.processAllAvailable()
        finally:
            t_stream = time.perf_counter() - t0
            prog = [json.loads(p.json) for p in q.recentProgress]
            q.stop()
        t0 = time.perf_counter()
        final = final_state(spark, root)
        out = final.select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
            F.round("value", 2).alias("last_value"),
        ).orderBy("user_id").localCheckpoint(eager=True)
        force(out)
        t_final = time.perf_counter() - t0
        wall = time.perf_counter() - t_all

        batches = [
            {
                "batchId": p.get("batchId"),
                "trigger_ms": p.get("durationMs", {}).get("triggerExecution"),
                "addBatch_ms": p.get("durationMs", {}).get("addBatch"),
                "latestOffset_ms": p.get("durationMs", {}).get("latestOffset"),
                "rows": p.get("numInputRows"),
            }
            for p in prog
        ]
        print(json.dumps({
            "run": run,
            "wall": round(wall, 3),
            "stage_write": round(t_stagewrite, 3),
            "schema_sniff": round(t_schema, 3),
            "stream_drive": round(t_stream, 3),
            "final_read": round(t_final, 3),
            "batches": batches,
        }), flush=True)


if __name__ == "__main__":
    main()
