"""Table catalog over the driver's synthetic parquet tables.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (see
/root/repo/TESTDATA.md). Reads are plain ``spark.read.parquet`` so Catalyst
gets predicate pushdown / column pruning for free; at cluster scale these
would be partitioned directories and the same code path applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos (legacy conf) and truncate to
    a microsecond timestamp — the DuckDB oracle applies the matching
    CAST(ts AS TIMESTAMP) truncation, so values agree exactly."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL face)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
