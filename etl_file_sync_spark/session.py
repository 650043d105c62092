"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime skew-join/coalesce), UTC session timezone (oracle parity),
shuffle partitions sized to cores rather than the 200 default, Arrow
enabled for the Pandas-UDF paths.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_PYFILES_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make etl_file_sync_spark importable on executor Python workers.

    The driver process may import this repo via sys.path manipulation that
    executors don't inherit; any Pandas-UDF/mapInPandas closure referencing
    module-level symbols would then fail with ModuleNotFoundError on the
    worker. Shipping a zip of the package via addPyFile fixes every such
    path once per session.
    """
    key = id(spark.sparkContext)
    if key in _PYFILES_SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stage = tempfile.mkdtemp(prefix="etl_pkg_")
    zip_base = os.path.join(stage, "etl_file_sync_spark")
    zip_path = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "etl_file_sync_spark")
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SHIPPED.add(key)


def get_spark(app_name: str = "etl_file_sync_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan partitioning when reading CACHED frames
        # (off by default): operator-internal caches (rankstats value
        # frames, shingle/signature frames) otherwise pin every
        # downstream stage to the static shuffle-partition count, so
        # tiny k-row cached aggregates fan out 32 near-empty tasks per
        # consumer. Scale-correct at any size: AQE picks counts from
        # runtime bytes, exactly as it does for uncached exchanges.
        # Interleaved A/B at sf0.1: rfm 5.18->3.56 s, kaplan 3.16->2.22,
        # brown-forsythe 3.53->2.92; no query measured worse.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Non-ANSI arithmetic: x/0 -> NULL, matching the DuckDB oracle
        # (DuckDB: SELECT 1/0 IS NULL) and the pipeline posture a 100-TB
        # job needs — one empty group / degenerate partition must yield
        # NULL rows, not kill the whole job (Spark 4 flipped the default
        # to ANSI=raise; every division-by-zero in a degenerate-input
        # sweep then aborts the query where the oracle returns NULL).
        .config("spark.sql.ansi.enabled", "false")
        # ansi=false silently flips legacy.sizeOfNull to true (its
        # default is !ansi.enabled), making size(NULL) return -1 — a
        # NULL-text doc would report -1 tokens and shard plans would
        # accumulate NEGATIVE token totals. Pin the modern semantics:
        # size(NULL) = NULL, like DuckDB's len(NULL).
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_PREPPED: set[int] = set()


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine settings to an externally-built session.

    The correctness driver supplies its own SparkSession; these settings are
    the ones that affect result *values* (timezone) or plan quality (AQE)
    and are safe to set per-session at runtime.

    Idempotent per session and MEMOIZED on the context id: prep() runs at
    the top of every registered query build (hundreds of times per bench
    run), and each conf.set is a py4j round trip. External code that
    deliberately flips one of these confs mid-session owns putting it
    back — the same contract as before, since prep() always set the same
    constants anyway.
    """
    key = id(spark.sparkContext)
    if key in _PREPPED:
        return spark
    _PREPPED.add(key)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    # oracle-parity division semantics (x/0 -> NULL, like DuckDB); see
    # get_spark — ansi.enabled is runtime-mutable so it applies to the
    # driver's externally-built session too
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # see get_spark: ansi=false would otherwise flip size(NULL) to -1
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    _ship_package(spark)
    return spark
