"""Batch source/sink layer over Spark's DataSource API.

The reference reads exactly two "formats" (Kafka JSON messages and opaque
FTP/local file bytes — SURVEY.md §2.1 rows 1, 7-9); the engine exposes the
full columnar surface the analytics face needs. All readers take explicit
schemas in production mode (inference is a dev convenience that costs a
full extra pass at 100 TB).

Formats needing external jars (Delta/Iceberg/Hudi, JDBC drivers) are
declared but gated — attempting them raises a clear error instead of a
classpath mystery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json", "text", "xml")
GATED_FORMATS = ("delta", "iceberg", "hudi", "jdbc", "avro")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read `path` in `fmt`. CSV defaults: header on."""
    fmt = fmt.lower()
    if fmt in GATED_FORMATS:
        raise NotImplementedError(
            f"format {fmt!r} requires external jars/drivers not present in this build"
        )
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if fmt == "xml":
        options.setdefault("rowTag", "row")  # Spark 4 built-in XML source
    return reader.format(fmt).options(**options).load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write df to `path` in `fmt`; partition_by produces the hive-style
    directory layout partition pruning needs at scale."""
    fmt = fmt.lower()
    if fmt in GATED_FORMATS:
        raise NotImplementedError(
            f"format {fmt!r} requires external jars/drivers not present in this build"
        )
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "xml":
        options.setdefault("rowTag", "row")
        options.setdefault("rootTag", "rows")
    writer.format(fmt).options(**options).save(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque file payloads as rows: (path, modificationTime, length,
    content BINARY) — the engine's ingest analogue of the reference's
    byte-stream transfers (ftp.py:137, local.py:50-94) and the input
    layer for multimodal corpora."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
