"""Physical data layout for 100 TB: bucketed tables (co-located joins)
and partitioned writes (partition pruning, static and dynamic).

These are WRITE-TIME decisions that delete shuffles at read time:

- **Bucketing** pre-shuffles a table once at write into N hash buckets on
  the join/agg key. Two tables bucketed the same way join with ZERO
  exchanges — the per-query shuffle a SortMergeJoin would pay at every
  read is paid once at ingest. At 100 TB this converts the recurring
  O(fact) network cost of fact⋈fact joins into a one-time layout cost.
  (Spark bucketed tables live in the session catalog: saveAsTable, not
  bare parquet paths — the bucket metadata is catalog state.)

- **Partitioning** (hive-style directories) prunes whole directories at
  planning time for literal predicates, and at RUNTIME via dynamic
  partition pruning (DPP) when the filter arrives through a join with a
  filtered dimension — the plan carries a `dynamicpruning` subquery that
  seeds the fact scan's PartitionFilters from the dim's build side.

Keep bucket/partition columns low-cardinality enough that files stay
HDFS-block-sized: buckets ≈ cluster cores × small factor; partitions
bounded (a 100k-directory table is its own pathology).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally removes the Sort under a
    SortMergeJoin — a bucketed+sorted pair of tables joins with neither
    Exchange nor Sort.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write (directory per value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def colocated_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two identically-bucketed catalog tables on the bucket key.

    With matching bucket specs Catalyst reports both sides'
    outputPartitioning as HashPartitioning(bucket_cols) and plans the
    SortMergeJoin with no Exchange. Callers should keep
    spark.sql.autoBroadcastJoinThreshold semantics in mind — a tiny side
    will broadcast instead, which is also shuffle-free.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Compact a small-file parquet directory into ~target_file_mb files.

    The small-files pathology: a streaming sink or over-parallel write
    leaves thousands of KB-scale files, and every later scan pays task
    scheduling + footer reads per file. Compaction reads once and
    rewrites at the target size; the file count comes from the ACTUAL
    on-disk byte size (not a row-count guess, which breaks on wide/
    narrow schemas). Returns the number of files written.

    At 100 TB this runs per partition-directory (compact the partitions
    whose file count drifted, not the table) — combine with
    write_partitioned and run under AQE so the final coalesce adapts.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    written = sum(
        1 for f in os.listdir(dst_path) if f.endswith(".parquet")
    )
    return written
