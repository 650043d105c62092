"""Env-gated LIVE Kafka end-to-end smoke — reference tests/test_e2e.py:82-145.

The sandbox has no broker and no Kafka connector jar, so this module
skips cleanly there. Against real infrastructure, set:

    ETL_KAFKA_BOOTSTRAP=host:9092  pytest tests/test_kafka_live.py

and the test drives the actual production path: produce a transfer job
to a topic with Spark's Kafka batch writer, consume it back through the
same reader options `pipeline.run` uses, run the full
parse→validate→enrich→transfer batch, and assert the file landed plus
bad messages reached the DLQ topic.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from etl_file_sync_spark.pipeline.run import kafka_reader_options

BOOTSTRAP = os.environ.get("ETL_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="set ETL_KAFKA_BOOTSTRAP=host:port to run live Kafka e2e"
)


def _require_connector(spark):
    """The spark-sql-kafka connector is a deploy-time jar. With a live
    broker requested but no connector on the classpath, fail loudly
    (reference health tier fails, never skips, when infra is asked for:
    test_health.py:4-5)."""
    try:
        spark.read.format("kafka").option("kafka.bootstrap.servers", BOOTSTRAP).option(
            "subscribe", "__probe__"
        ).load()
    except Exception as e:  # pragma: no cover - live-only
        if "Failed to find data source: kafka" in str(e):
            pytest.fail("live Kafka requested but spark-sql-kafka connector jar is missing")


def test_live_kafka_transfer_roundtrip(spark, tmp_path):  # pragma: no cover - live-only
    from etl_file_sync_spark.pipeline.config import servers_dataframe
    from etl_file_sync_spark.pipeline.sink import run_manifest_batch

    _require_connector(spark)
    topic = f"etl-live-smoke-{uuid.uuid4().hex[:8]}"

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    (src / "a.bin").write_bytes(b"live-smoke-payload")

    good = {
        "job_id": "live-1",
        "source": {"hostname": "LIVE_SRC", "path": str(src / "a.bin")},
        "destination": {"hostname": "LIVE_DST", "path": str(dst / "a.bin")},
    }
    bad = "{not json"

    # Produce with Spark's own Kafka batch writer (reference produces with
    # kafka-python, test_e2e.py:96-110 — same wire result).
    spark.createDataFrame([(json.dumps(good),), (bad,)], "value string").write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", BOOTSTRAP).option("topic", topic).save()

    opts = kafka_reader_options(topic, BOOTSTRAP)
    opts.pop("kafka.group.id", None)  # batch reads reject group.id on some brokers
    raw = (
        spark.read.format("kafka")
        .options(**{**opts, "endingOffsets": "latest"})
        .load()
        .selectExpr("CAST(value AS STRING) AS raw")
    )

    env = {
        "LIVE_SRC_TYPE": "LOCAL",
        "LIVE_DST_TYPE": "LOCAL",
    }
    servers = servers_dataframe(spark, env=env)
    status, dlq = run_manifest_batch(raw, servers)
    dlq_rows = dlq.collect()

    assert (dst / "a.bin").read_bytes() == b"live-smoke-payload"
    assert status.filter("status = 'success'").count() == 1
    assert len(dlq_rows) == 1  # the malformed message
