"""Streaming layer: replay sources and event-time query builders."""

from etl_file_sync_spark.streaming.replay import events_stream, run_to_memory_sink  # noqa: F401
