"""Kafka-mode surface, exercised to the connector boundary (no broker or
spark-sql-kafka jar ships in this image):

- reader options seam: the exact option dict the stream builder applies
  (subscribe/startingOffsets/group.id/backpressure knobs) — parity with
  the reference consumer config (consumer.py:83, main.py:45).
- DLQ-on-the-bus: foreach_batch_factory hands every DLQ envelope to the
  configured kafka writer (consumer.py:188-225 parity), failures in the
  send are swallowed without losing the parquet DLQ trail or the batch
  (consumer.py:224-225), and the REAL kafka_dlq_writer's failure mode in
  this sandbox (connector absent) routes through the same swallow path.
- topic auto-create opt-in degrades to a logged no-op without an admin
  client (entrypoint.sh:66-117 soft-fail parity).
"""

from __future__ import annotations

import json
import os

from etl_file_sync_spark.pipeline.config import ServerConfig, servers_dataframe
from etl_file_sync_spark.pipeline.run import ensure_topics, kafka_reader_options
from etl_file_sync_spark.pipeline.sink import foreach_batch_factory, kafka_dlq_writer


def test_kafka_reader_options_defaults_and_env():
    opts = kafka_reader_options("jobs", "broker:9092", None, env={})
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "jobs",
        "startingOffsets": "earliest",
        "kafka.group.id": "etl-file-sync-spark",
    }
    opts = kafka_reader_options(
        "jobs",
        "broker:9092",
        "g1",
        env={"ETL_MAX_OFFSETS_PER_TRIGGER": "500", "ETL_KAFKA_MIN_PARTITIONS": "64"},
    )
    assert opts["kafka.group.id"] == "g1"
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert opts["minPartitions"] == "64"


def _run_batch(spark, tmp_path, dlq_writer):
    servers = servers_dataframe(
        spark, [ServerConfig(hostname="S", type="local"), ServerConfig(hostname="D", type="local")]
    )
    src = tmp_path / "a.txt"
    src.write_bytes(b"payload")
    rows = [
        json.dumps(
            {
                "job_id": "ok1",
                "source": {"hostname": "S", "path": str(src)},
                "destination": {"hostname": "D", "path": str(tmp_path / "dst" / "a.txt")},
            }
        ),
        "not json",  # parse failure → DLQ
        json.dumps(
            {
                "job_id": "bad1",
                "source": {"hostname": "S", "path": str(tmp_path / "missing.txt")},
                "destination": {"hostname": "D", "path": str(tmp_path / "dst" / "b.txt")},
            }
        ),  # transfer failure → DLQ
    ]
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    body = foreach_batch_factory(
        servers,
        str(tmp_path / "dlq"),
        str(tmp_path / "status"),
        staging_dir=str(tmp_path),
        dlq_writer=dlq_writer,
    )
    body(raw, epoch_id=0)
    return spark


def test_dlq_envelopes_land_on_the_kafka_writer(spark, tmp_path):
    captured: list[str] = []

    def capture(dlq_df):
        captured.extend(r.value for r in dlq_df.select("value").collect())

    _run_batch(spark, tmp_path, capture)
    assert len(captured) == 2  # parse failure + transfer failure
    envs = [json.loads(v) for v in captured]
    for e in envs:
        assert set(e) == {"original_message", "error", "timestamp", "retry_count"}
    raw_wrapped = [
        e
        for e in envs
        if e["original_message"].startswith("{") and json.loads(e["original_message"]) == {"raw": "not json"}
    ]
    assert raw_wrapped, "unparseable input must be raw-wrapped"
    # the bus and the parquet trail carry the SAME envelopes
    disk = {r.value for r in spark.read.parquet(str(tmp_path / "dlq")).collect()}
    assert disk == set(captured)
    # the good job still transferred
    assert (tmp_path / "dst" / "a.txt").read_bytes() == b"payload"


def test_kafka_dlq_send_failure_is_swallowed(spark, tmp_path):
    def boom(dlq_df):
        raise RuntimeError("broker down")

    _run_batch(spark, tmp_path, boom)  # must not raise
    status = spark.read.parquet(str(tmp_path / "status"))
    assert status.filter("status = 'ok'").count() == 1
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == 2  # trail intact


def test_real_kafka_writer_missing_connector_swallowed(spark, tmp_path):
    """In this image the spark-sql-kafka connector is absent, so the real
    writer's .save() raises — which must route through the same swallow
    path as a dead broker, keeping the batch and the parquet DLQ alive."""
    _run_batch(spark, tmp_path, kafka_dlq_writer("localhost:19092", "jobs-dlq"))
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == 2


def test_ensure_topics_degrades_without_admin_client():
    assert ensure_topics("localhost:19092", {"jobs": 1, "jobs-dlq": 1}) is False
