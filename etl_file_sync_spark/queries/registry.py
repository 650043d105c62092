"""Query registry: named DataFrame builders paired with DuckDB oracle SQL.

Each registered query is the unit the correctness driver checks: the Spark
build function and the ANSI-SQL oracle must produce identical column names
and (order-insensitive) values over the same parquet tables.

Registration is decorator-based so each domain module
(tpch/relational/llm/pipeline_face/streaming_face) stays self-contained.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_file_sync_spark.catalog import load_table
from etl_file_sync_spark.session import prep

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: BuildFn
    oracle: str | None  # DuckDB-runnable SQL; None => rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, *tags: str) -> Callable[[BuildFn], BuildFn]:
    """Register ``fn`` as query ``name`` with its DuckDB oracle SQL."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep(spark)  # UTC tz + AQE even under the driver's session
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(name, wrapped, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by the query builders."""
    return load_table(spark, sf_dir, name)
