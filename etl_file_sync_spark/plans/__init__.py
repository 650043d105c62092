"""Plan inspection utilities — used by tests to assert plan QUALITY, not
just result correctness: filters pushed to the scan, dimensions broadcast,
no shuffle where none is needed. At 100 TB these properties are the
difference between a job and a bill.
"""

from etl_file_sync_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    full_plan,
    join_strategies,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)
