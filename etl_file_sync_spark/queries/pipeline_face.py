"""Pipeline-face queries: the reference's parse/validate/enrich semantics
driven through the engine's transform functions, made oracle-checkable by
generating a deterministic job-message stream from the orders table.

Error-class mix mirrors the reference test matrix
(tests/test_consumer.py:145-262): raw non-JSON, missing required field,
unknown server, and valid jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.pipeline.config import ServerConfig
from etl_file_sync_spark.pipeline.transform import split_valid_dlq
from etl_file_sync_spark.queries.registry import register, t

# Deterministic synthetic server dimension (no env dependence).
_SERVERS = [
    ServerConfig(hostname="SRV_0", type="local"),
    ServerConfig(hostname="SRV_1", type="local"),
    ServerConfig(hostname="SRV_2", type="local"),
    ServerConfig(hostname="DST_SRV", type="local"),
]


def job_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic job-message stream derived from orders.

    pmod(o_orderkey, 13): 0 → non-JSON garbage, 1 → JSON missing
    destination, 2 → unknown source hostname, else valid (hostname
    SRV_{pmod(custkey, 3)}). Floor-mod, not %: hash-range negative keys
    must land in a DEFINED class and a VALID hostname bucket — with
    sign-of-dividend % they skipped every WHEN into 'valid' while their
    'srv_-1' hostname failed enrichment (extreme-id tier).
    """
    o = t(spark, sf_dir, "orders")
    mod = F.pmod(F.col("o_orderkey"), F.lit(13))
    src_host = F.when(mod == 2, F.lit("NO_SUCH_SRV")).otherwise(
        F.concat(F.lit("srv_"), F.pmod(F.col("o_custkey"), F.lit(3)).cast("string"))  # lowercase: exercises case-insensitive lookup
    )
    valid_json = F.to_json(
        F.struct(
            F.concat(F.lit("job-"), F.col("o_orderkey").cast("string")).alias("job_id"),
            F.struct(src_host.alias("hostname"), F.concat(F.lit("/data/"), F.col("o_orderkey").cast("string")).alias("path")).alias("source"),
            F.struct(F.lit("DST_SRV").alias("hostname"), F.concat(F.lit("/out/"), F.col("o_orderkey").cast("string")).alias("path")).alias("destination"),
        )
    )
    missing_dst = F.to_json(
        F.struct(
            F.concat(F.lit("job-"), F.col("o_orderkey").cast("string")).alias("job_id"),
            F.struct(src_host.alias("hostname"), F.concat(F.lit("/data/"), F.col("o_orderkey").cast("string")).alias("path")).alias("source"),
        )
    )
    value = (
        F.when(mod == 0, F.concat(F.lit("garbage::"), F.col("o_orderkey").cast("string")))
        .when(mod == 1, missing_dst)
        .otherwise(valid_json)
    )
    return o.select(value.alias("value"))


@register(
    "pipeline_parse_validate",
    """
    WITH cls AS (
      SELECT CASE WHEN ((o_orderkey % 13) + 13) % 13 = 0 THEN 'parse_error'
                  WHEN ((o_orderkey % 13) + 13) % 13 = 1 THEN 'missing_field'
                  WHEN ((o_orderkey % 13) + 13) % 13 = 2 THEN 'unknown_server'
                  ELSE 'valid' END AS status
      FROM orders)
    SELECT status, count(*) AS n_jobs FROM cls GROUP BY status
    """,
    "pipeline",
    "parse",
    "validate",
    "enrich",
)
def pipeline_parse_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parse→validate→enrich split over a synthetic message stream;
    output = per-class counts. The oracle states the expected
    classification directly from the generator rule — the Spark side has
    to actually parse JSON, apply required-field checks and resolve
    hostnames (case-insensitively) against the server dimension to agree.
    """
    from etl_file_sync_spark.pipeline.config import servers_dataframe

    raw = job_messages(spark, sf_dir)
    servers = servers_dataframe(spark, _SERVERS)
    split = split_valid_dlq(raw, servers)
    # groupBy (not a bare agg) so an EMPTY stream yields zero rows like
    # the oracle's GROUP BY, not a ('valid', 0) row
    valid_counts = (
        split.valid.select(F.lit("valid").alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_jobs"))
    )
    err_class = (
        F.when(F.col("error").startswith("parse_error"), "parse_error")
        .when(F.col("error").startswith("missing_field"), "missing_field")
        .otherwise("unknown_server")
    )
    dlq_counts = (
        split.dlq.withColumn("status", err_class).groupBy("status").agg(F.count(F.lit(1)).alias("n_jobs"))
    )
    return valid_counts.unionByName(dlq_counts)


@register(
    "pipeline_dlq_messages",
    """
    SELECT CASE WHEN ((o_orderkey % 13) + 13) % 13 = 0
                THEN concat('{"raw":"garbage::', CAST(o_orderkey AS VARCHAR), '"}')
                ELSE concat('job-', CAST(o_orderkey AS VARCHAR)) END AS original_ref,
           CASE WHEN ((o_orderkey % 13) + 13) % 13 = 0 THEN 'parse_error'
                ELSE 'missing_field' END AS error_class
    FROM orders WHERE ((o_orderkey % 13) + 13) % 13 IN (0, 1)
    ORDER BY original_ref
    """,
    "pipeline",
    "dlq",
)
def pipeline_dlq_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ payload shape: raw text wrapped as {"raw": ...} for unparseable
    input (consumer.py:205-208 parity), job_id preserved for parsed-but-
    invalid jobs (test_e2e.py:151-202 contract)."""
    from etl_file_sync_spark.pipeline.config import servers_dataframe

    raw = job_messages(spark, sf_dir)
    servers = servers_dataframe(spark, _SERVERS)
    split = split_valid_dlq(raw, servers)
    dlq = split.dlq.filter(~F.col("error").startswith("unknown_server"))
    # missing_field rows carry the RAW message text wrapped as {"raw": ...}
    # (reference ValueError path) — unwrap, then read the job_id out of it
    original_ref = F.when(
        F.col("error").startswith("parse_error"), F.col("original_message")
    ).otherwise(F.get_json_object(F.get_json_object("original_message", "$.raw"), "$.job_id"))
    err_class = F.when(F.col("error").startswith("parse_error"), "parse_error").otherwise("missing_field")
    return dlq.select(original_ref.alias("original_ref"), err_class.alias("error_class")).orderBy("original_ref")
