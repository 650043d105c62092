"""As-of join — Spark lacks a native one; composed from a union + window.

Technique (the shuffle-minimal classic): tag both sides, union on a
common schema, sort within (key, time) partitions, and carry the most
recent right-side row forward with last(..., ignorenulls=True) over an
unbounded-preceding window. ONE shuffle on the join key total — same cost
as a sort-merge join, versus the naive theta-join's O(n·m) explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_vals: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (or < if strict) and the same `on` key.

    Returns left columns + right_vals (null when no prior right row).
    """
    lt = F.col(left_time)
    l_tagged = left.withColumn("_t", lt).withColumn("_side", F.lit(1))
    for c in right_vals:
        l_tagged = l_tagged.withColumn(f"_rv_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_vals],
    )
    for c in left.columns:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.select(r_tagged.columns).unionByName(r_tagged.select(r_tagged.columns))

    # _side: left=1, right=0. Non-strict: a right row at equal _t IS
    # visible => right sorts before left at ties (ascending _side).
    # Strict: right sorts after left at ties.
    order = [F.col("_t"), (1 - F.col("_side")) if strict else F.col("_side")]
    w = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    filled = unioned
    for c in right_vals:
        filled = filled.withColumn(f"_rv_{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [F.col(f"_rv_{c}").alias(c) for c in right_vals]
    return filled.filter(F.col("_side") == 1).select(*out_cols)
