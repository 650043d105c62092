"""Reference-parity pipeline face: job-message parse → validate → enrich →
transfer → DLQ, as Structured Streaming (or a batch manifest run).

Mirrors the semantics of nineking424/etl-file-sync's consumer
(src/etl/consumer.py) re-expressed on Spark primitives — see SURVEY.md §3.1
for the lifecycle mapping.
"""
