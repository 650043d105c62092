"""Structured Streaming behaviors beyond the registry queries: streaming
dedup within watermark, session windows in streaming mode, and a custom
stateful operator via applyInPandasWithState."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from etl_file_sync_spark.catalog import load_table
from etl_file_sync_spark.streaming import events_stream


def _events_stream(spark, sf_dir, tmp_path):
    stage = tmp_path / "events_src"
    return events_stream(spark, sf_dir, stage_dir=str(stage))


def _run_to_completion(df, qname, mode):
    q = df.writeStream.outputMode(mode).format("memory").queryName(qname).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_session_window(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir, tmp_path)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    _run_to_completion(agg, "sess_sink", "complete")
    got = spark.sql("SELECT sum(n_events) AS total, count(*) AS n_sessions FROM sess_sink").collect()[0]
    n_total = load_table(spark, sf_dir, "events").count()
    assert got.total == n_total  # every event lands in exactly one session
    # must agree with the batch sessionizer on session count
    from etl_file_sync_spark.queries import REGISTRY

    batch_sessions = REGISTRY["sessionize_events"].build(spark, sf_dir).count()
    assert got.n_sessions == batch_sessions


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dup_src"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "c"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:30", "2024-01-01 00:01:00",
                 "2024-01-01 00:01:10", "2024-01-01 00:02:00"]
            ),
        }
    )
    pdf.to_parquet(src / "part.parquet", coerce_timestamps="us")
    stream = spark.readStream.schema("k string, ts timestamp").parquet(str(src))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["k"])
    _run_to_completion(deduped, "dedup_sink", "append")
    rows = spark.sql("SELECT k FROM dedup_sink").collect()
    assert sorted(r.k for r in rows) == ["a", "b", "c"]


def test_apply_in_pandas_with_state_running_count(spark, tmp_path):
    """Custom stateful operator: per-key running event count across
    micro-batches (the applyInPandasWithState surface the reference's
    'UDF registration' plugin point maps to for streaming state)."""
    src = tmp_path / "state_src"
    src.mkdir()
    pd.DataFrame({"k": ["x", "y", "x"]}).to_parquet(src / "b0.parquet")

    def count_fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    stream = spark.readStream.schema("k string").parquet(str(src))
    counted = stream.groupBy("k").applyInPandasWithState(
        count_fn,
        outputStructType="k string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = counted.writeStream.outputMode("update").format("memory").queryName("state_sink").start()
    try:
        q.processAllAvailable()
        pd.DataFrame({"k": ["x", "z"]}).to_parquet(src / "b1.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r.k): r.n for r in spark.sql(
        "SELECT k, max(n) AS n FROM state_sink GROUP BY k").collect()}
    assert rows == {"x": 3, "y": 1, "z": 1}  # state carried across batches


def test_available_now_trigger(spark, sf_dir, tmp_path):
    """Trigger.AvailableNow: drain everything currently available in
    bounded batches, then stop on its own — the batch-over-stream runner
    used for backfills."""
    stream = _events_stream(spark, sf_dir, tmp_path)
    counts = stream.groupBy("event_type").count()
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("avail_now_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("SELECT sum(count) AS n FROM avail_now_sink").collect()[0].n
    assert total == load_table(spark, sf_dir, "events").count()
