"""Engine function library: reusable Column-expression builders.

All JVM-evaluated (built on pyspark.sql.functions) — the engine's scalar
extension surface, analogous to the reference's lone json/uuid/timestamp
helpers (SURVEY.md §2.2 'scalar functions' row) but covering vectors and
text as first-class domains.
"""

from etl_file_sync_spark.operators.similarity import (  # noqa: F401
    cosine_expr,
    dot_expr,
    norm_expr,
)
from etl_file_sync_spark.operators.text import (  # noqa: F401
    normalize_text,
    tokens,
)
