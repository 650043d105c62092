"""Assemble the full query registry (import side effects register)."""

from etl_file_sync_spark.queries import (  # noqa: F401
    behavior,
    advanced,
    audit_face,
    cluster_face,
    curation_face,
    decision_face,
    dq,
    experiment_face,
    experiment_face2,
    inference_face,
    insight_face,
    eval_face,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    merge_face,
    pipeline_face,
    relational,
    relational2,
    relational3,
    relational4,
    search_face,
    stats_face,
    streaming_face,
    timeseries_face,
    tpch,
    tpch2,
    tpch3,
    udfs,
)
from etl_file_sync_spark.queries.registry import REGISTRY, Query  # noqa: F401

__all__ = ["REGISTRY", "Query"]
