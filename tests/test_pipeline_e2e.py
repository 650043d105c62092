"""Pipeline e2e: manifest batch and the streaming query, local→local with
byte-compare verification — mirrors the reference's E2E contract
(tests/test_e2e.py:354-394 local→local; golden content assertion :142)."""

from __future__ import annotations

import json
import os

from etl_file_sync_spark.pipeline.config import ServerConfig, servers_dataframe
from etl_file_sync_spark.pipeline.sink import foreach_batch_factory, run_manifest_batch


def _setup(tmp_path, n=8):
    src = tmp_path / "src"
    src.mkdir()
    files = {}
    for i in range(n):
        payload = os.urandom(256) + bytes([i])
        (src / f"f{i}.bin").write_bytes(payload)
        files[f"f{i}.bin"] = payload
    servers = [
        ServerConfig(hostname="S", type="local"),
        ServerConfig(hostname="D", type="local"),
    ]
    jobs = [
        json.dumps(
            {
                "job_id": f"j{i}",
                "source": {"hostname": "S", "path": str(src / f"f{i}.bin")},
                "destination": {"hostname": "D", "path": str(tmp_path / "dst" / f"f{i}.bin")},
            }
        )
        for i in range(n)
    ]
    return files, servers, jobs


def test_manifest_batch_byte_identical(spark, tmp_path):
    files, servers, jobs = _setup(tmp_path)
    raw = spark.createDataFrame([(j,) for j in jobs], "value string")
    status, dlq = run_manifest_batch(raw, servers_dataframe(spark, servers), staging_dir=str(tmp_path))
    assert status.filter("status = 'ok'").count() == len(files)
    assert dlq.count() == 0
    for name, payload in files.items():
        assert (tmp_path / "dst" / name).read_bytes() == payload  # golden content


def test_manifest_batch_failure_goes_to_dlq_not_task_failure(spark, tmp_path):
    files, servers, jobs = _setup(tmp_path, n=2)
    jobs.append(
        json.dumps(
            {
                "job_id": "missing",
                "source": {"hostname": "S", "path": str(tmp_path / "nope.bin")},
                "destination": {"hostname": "D", "path": str(tmp_path / "dst" / "nope.bin")},
            }
        )
    )
    raw = spark.createDataFrame([(j,) for j in jobs], "value string")
    status, dlq = run_manifest_batch(raw, servers_dataframe(spark, servers), staging_dir=str(tmp_path))
    assert status.filter("status = 'ok'").count() == 2
    assert status.filter("status = 'error'").count() == 1
    envs = [json.loads(r.value) for r in dlq.collect()]
    assert len(envs) == 1 and "FileNotFoundError" in envs[0]["error"]
    # job context preserved in the DLQ payload (test_e2e.py:151-202 contract)
    assert json.loads(envs[0]["original_message"])["job_id"] == "missing"


def test_streaming_pipeline_checkpointed(spark, tmp_path):
    """File-source streaming variant of the pipeline (Kafka-less smoke):
    manifest lines arrive as a stream, foreachBatch executes transfers."""
    files, servers, jobs = _setup(tmp_path, n=4)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "batch0.jsonl").write_text("\n".join(jobs))

    raw = spark.readStream.format("text").load(str(inbox))
    body = foreach_batch_factory(
        servers_dataframe(spark, servers),
        dlq_dir=str(tmp_path / "dlq"),
        status_dir=str(tmp_path / "status"),
        staging_dir=str(tmp_path),
    )
    q = (
        raw.writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    status = spark.read.parquet(str(tmp_path / "status"))
    assert status.filter("status = 'ok'").count() == 4
    for name, payload in files.items():
        assert (tmp_path / "dst" / name).read_bytes() == payload


def test_checkpoint_recovery_across_restarts(spark, tmp_path):
    """Stop the streaming pipeline, add new input, restart with the SAME
    checkpoint: earlier batches must not replay (each job processed
    exactly once in status) — the checkpoint-backed analogue of the
    reference's manual offset commit (consumer.py:58,123,136-137)."""
    files, servers, jobs = _setup(tmp_path, n=6)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "batch0.jsonl").write_text("\n".join(jobs[:3]))

    sdf = servers_dataframe(spark, servers)
    body = foreach_batch_factory(
        sdf,
        dlq_dir=str(tmp_path / "dlq"),
        status_dir=str(tmp_path / "status"),
        staging_dir=str(tmp_path),
    )

    def run_once():
        q = (
            spark.readStream.format("text")
            .load(str(inbox))
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    (inbox / "batch1.jsonl").write_text("\n".join(jobs[3:]))
    run_once()  # restart from checkpoint

    status = spark.read.parquet(str(tmp_path / "status"))
    per_job = status.groupBy("job_id").count().collect()
    assert len(per_job) == 6
    assert all(r["count"] == 1 for r in per_job), "a job replayed or was lost across restart"
    for name, payload in files.items():
        assert (tmp_path / "dst" / name).read_bytes() == payload


def test_skip_if_exists_idempotency(spark, tmp_path):
    """Retry idempotency: a second run with skip_if_exists leaves existing
    destinations untouched (no re-copy) and still reports ok."""
    from etl_file_sync_spark.pipeline.transform import split_valid_dlq
    from etl_file_sync_spark.pipeline.sink import run_transfers

    files, servers, jobs = _setup(tmp_path, n=2)
    raw = spark.createDataFrame([(j,) for j in jobs], "value string")
    sdf = servers_dataframe(spark, servers)
    split = split_valid_dlq(raw, sdf)
    assert run_transfers(split.valid, str(tmp_path)).filter("status='ok'").count() == 2
    # tamper with a destination; the skipping rerun must NOT overwrite it
    tampered = tmp_path / "dst" / "f0.bin"
    tampered.write_bytes(b"tampered")
    status = run_transfers(split.valid, str(tmp_path), skip_if_exists=True)
    assert status.filter("status='ok'").count() == 2
    assert tampered.read_bytes() == b"tampered"
    # without the flag, the rerun overwrites (reference STOR semantics)
    run_transfers(split.valid, str(tmp_path)).collect()
    assert tampered.read_bytes() == files["f0.bin"]


def test_transfers_execute_exactly_once_per_batch(spark, tmp_path):
    """The transfer stage is side-effecting: run_manifest_batch must
    materialize status ONCE — consuming status and dlq repeatedly must
    not re-run downloads (regression: dlq lineage used to re-execute the
    whole mapInPandas)."""
    import shutil

    files, servers, jobs = _setup(tmp_path, n=3)
    raw = spark.createDataFrame([(j,) for j in jobs], "value string")
    status, dlq = run_manifest_batch(raw, servers_dataframe(spark, servers), staging_dir=str(tmp_path))
    # destroy the sources AFTER the batch ran: any re-execution would fail
    shutil.rmtree(tmp_path / "src")
    assert status.filter("status = 'ok'").count() == 3
    assert status.count() == 3  # second action, same materialized rows
    assert dlq.count() == 0  # derivation from status must not re-transfer
    for name, payload in files.items():
        assert (tmp_path / "dst" / name).read_bytes() == payload


def test_parse_and_field_failures_keep_raw_payload(spark):
    """Reference parity: parse failures AND required-field failures both
    raise pre-job ValueError, so BOTH wrap the raw text (regression:
    non-object JSON used to produce an empty original_message)."""
    import json as _json

    from etl_file_sync_spark.pipeline.config import ServerConfig
    from etl_file_sync_spark.pipeline.transform import split_valid_dlq

    servers = servers_dataframe(spark, [ServerConfig(hostname="S", type="local")])
    msgs = ["[1,2,3]", "5", "not json", '{"job_id": "j1", "source": {"hostname": "S"}}']
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    dlq_rows = split_valid_dlq(raw, servers).dlq.collect()
    originals = {r.original_message for r in dlq_rows}
    assert originals == {
        _json.dumps({"raw": m}, separators=(",", ":")) for m in msgs
    }
