"""etl_file_sync_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo nineking424/etl-file-sync (a Kafka->FTP file-sync ETL
service), re-expressed Spark-first:

- ``pipeline/``  — reference-parity face: job-message parse/validate/enrich
  (Structured Streaming or batch manifest), pluggable transfer handlers
  (local/FTP) with per-executor connection pooling, DLQ routing.
- ``queries/``   — the relational/analytics face: a registry of named
  queries (DataFrame builders + ANSI-SQL oracles) spanning scans, joins,
  aggregations, windows, set ops, scalar functions and streaming windows.
- ``operators/`` — LLM-data-pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search, text
  analysis, multimodal binary columns, as-of/range joins.
- ``streaming/`` — event-time windows, watermarks, sessionization,
  stateful dedup over replayed streams.

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
