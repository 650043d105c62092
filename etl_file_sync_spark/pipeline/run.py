"""CLI entry point — argparse parity with the reference main
(/root/reference/src/etl/main.py:33-90): topic / group-id / bootstrap
servers accepted positionally AND as flags (flag wins, main.py:100-102),
``--env-file``, ``-v`` for debug logging. Adds engine-specific modes:

- kafka mode (default): readStream(kafka) → transform → foreachBatch sink,
  checkpointed — the reference's consumer loop as one streaming query.
- manifest mode (--manifest PATH): batch run over a json-lines manifest of
  job messages, no Kafka needed (mirrors tests/test_e2e.py:354-394
  local→local semantics).
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys

from etl_file_sync_spark.pipeline.config import get_dlq_topic, servers_dataframe
from etl_file_sync_spark.pipeline.sink import foreach_batch_factory, run_manifest_batch
from etl_file_sync_spark.session import get_spark

log = logging.getLogger("etl_file_sync_spark")


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="etl-file-sync-spark", description="PySpark file-sync pipeline")
    p.add_argument("topic", nargs="?", help="Kafka topic")
    p.add_argument("group_id", nargs="?", help="consumer group id")
    p.add_argument("bootstrap_servers", nargs="?", help="Kafka bootstrap servers")
    p.add_argument("--topic", dest="topic_flag")
    p.add_argument("--group-id", dest="group_flag")
    p.add_argument("--bootstrap-servers", dest="bootstrap_flag")
    p.add_argument("--env-file", help=".env file with server configs")
    p.add_argument("--manifest", help="json-lines manifest path (batch mode, no Kafka)")
    p.add_argument("--output-dir", default="/tmp/etl-sync-out", help="status/dlq output root")
    p.add_argument("--checkpoint", default="/tmp/etl-sync-ckpt")
    p.add_argument("-v", "--verbose", action="store_true")
    a = p.parse_args(argv)
    # flags take precedence over positionals (main.py:100-102 parity)
    a.topic = a.topic_flag or a.topic
    a.group_id = a.group_flag or a.group_id
    a.bootstrap_servers = a.bootstrap_flag or a.bootstrap_servers
    return a


def load_env_file(path: str) -> None:
    """Minimal .env loader (KEY=VALUE lines, # comments)."""
    import os

    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            os.environ.setdefault(k.strip(), v.strip())


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)
    if args.env_file:
        load_env_file(args.env_file)

    spark = get_spark("etl-file-sync-pipeline")
    servers = servers_dataframe(spark)

    if args.manifest:
        raw = spark.read.text(args.manifest)
        status, dlq = run_manifest_batch(raw, servers)
        status.write.mode("append").parquet(f"{args.output_dir}/status")
        dlq.write.mode("append").parquet(f"{args.output_dir}/dlq")
        n_err = status.filter("status = 'error'").count()
        log.info("manifest run complete; %d transfer errors", n_err)
        return 0

    if not (args.topic and args.bootstrap_servers):
        print("topic and bootstrap servers required in kafka mode", file=sys.stderr)
        return 2

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", args.bootstrap_servers)
        .option("subscribe", args.topic)
        .option("startingOffsets", "earliest")
        .option("kafka.group.id", args.group_id or "etl-file-sync-spark")
    )
    # backpressure: bound records per micro-batch so transfer work per
    # batch stays inside executor disk/connection budgets (the Spark
    # analogue of the reference's 1s poll granularity, consumer.py:94)
    max_offsets = os.environ.get("ETL_MAX_OFFSETS_PER_TRIGGER")
    if max_offsets:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets)
    min_parts = os.environ.get("ETL_KAFKA_MIN_PARTITIONS")
    if min_parts:
        reader = reader.option("minPartitions", min_parts)  # fan out beyond topic partitions
    stream = reader.load().selectExpr("CAST(value AS STRING) AS value")
    log.info("DLQ topic for Kafka sink variant: %s", get_dlq_topic(args.topic))
    query = (
        stream.writeStream.foreachBatch(
            foreach_batch_factory(servers, f"{args.output_dir}/dlq", f"{args.output_dir}/status")
        )
        .option("checkpointLocation", args.checkpoint)
        .start()
    )

    def stop(_sig, _frm):  # graceful shutdown (main.py:25-30 parity)
        log.info("stopping streaming query")
        query.stop()

    signal.signal(signal.SIGINT, stop)
    signal.signal(signal.SIGTERM, stop)
    query.awaitTermination()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
