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


def test_chaos_multi_restart_converges(spark, tmp_path):
    """CHAOS: crash the streaming pipeline mid-micro-batch N times —
    both BEFORE any side effect (clean replay) and AFTER the transfers
    ran but before the checkpoint committed (the worst case for
    exactly-once) — and assert the system CONVERGES to the batch truth:
    destination tree byte-identical, every job reporting ok, DLQ empty.
    Status is an at-least-once operational trail (a batch whose crash
    landed after its side effects replays on restart), so the assertion
    is set-equality + >=1 ok per job, with skip_if_exists making the
    destination writes idempotent. Extends
    test_checkpoint_recovery_across_restarts (one clean restart) to
    repeated UNCLEAN restarts."""
    files, servers, jobs = _setup(tmp_path, n=10)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for i, j in enumerate(jobs):
        (inbox / f"m{i:02d}.jsonl").write_text(j)

    body = foreach_batch_factory(
        servers_dataframe(spark, servers),
        dlq_dir=str(tmp_path / "dlq"),
        status_dir=str(tmp_path / "status"),
        staging_dir=str(tmp_path),
        skip_if_exists=True,  # idempotent destination writes under replay
    )

    # crash schedule: epoch -> phase ("before" = crash with no side
    # effects; "after" = crash once the batch's transfers already ran).
    # Each injected crash fires exactly once; the replay must succeed.
    crashes = {1: "before", 3: "after", 5: "after", 7: "before"}
    fired: set[int] = set()

    def chaotic_body(batch_df, epoch_id):
        if crashes.get(epoch_id) == "before" and epoch_id not in fired:
            fired.add(epoch_id)
            raise RuntimeError(f"chaos: pre-batch crash at epoch {epoch_id}")
        body(batch_df, epoch_id)
        if crashes.get(epoch_id) == "after" and epoch_id not in fired:
            fired.add(epoch_id)
            raise RuntimeError(f"chaos: post-effect crash at epoch {epoch_id}")

    def run_until_stall():
        q = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)  # one job per micro-batch
            .load(str(inbox))
            .writeStream.foreachBatch(chaotic_body)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            return True  # drained with no crash
        except Exception:
            return False  # injected crash killed the query; restart
        finally:
            q.stop()

    restarts = 0
    while not run_until_stall():
        restarts += 1
        assert restarts <= len(crashes) + 2, "pipeline failed to converge"
    assert restarts == len(crashes), "every injected crash forces one restart"

    # convergence: destination tree is the batch truth, byte-identical
    for name, payload in files.items():
        assert (tmp_path / "dst" / name).read_bytes() == payload
    status = spark.read.parquet(str(tmp_path / "status"))
    ok_jobs = {r.job_id for r in status.filter("status = 'ok'").collect()}
    assert ok_jobs == {f"j{i}" for i in range(10)}
    assert status.filter("status != 'ok'").count() == 0
    # post-effect crashes replay their batch: the trail is at-least-once,
    # never lossy — each job appears at least once, duplicates only for
    # the two "after" epochs
    per_job = {r["job_id"]: r["count"] for r in status.groupBy("job_id").count().collect()}
    assert all(c >= 1 for c in per_job.values())
    assert sum(c - 1 for c in per_job.values()) <= len([v for v in crashes.values() if v == "after"])
    assert not (tmp_path / "dlq").exists() or spark.read.parquet(str(tmp_path / "dlq")).count() == 0
