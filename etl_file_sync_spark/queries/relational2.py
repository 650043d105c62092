"""Second relational batch: range window frames, analytic window functions,
statistical co-aggregates, argmin/argmax, ordered string/list aggregation,
explode/lateral, null-handling semantics, casts/formatting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_file_sync_spark.catalog import register_views
from etl_file_sync_spark.queries.registry import register, t


@register(
    "win_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000.0 PRECEDING AND 10000.0 FOLLOWING) AS n_similar_price
    FROM orders WHERE o_custkey <= 30
    ORDER BY o_custkey, o_orderkey
    """,
    "window",
    "range-frame",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over a numeric ordering (value-based frame)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 10000.0 PRECEDING AND 10000.0 FOLLOWING) AS n_similar_price
        FROM orders WHERE o_custkey <= 30
        ORDER BY o_custkey, o_orderkey
        """
    )


@register(
    "win_first_last_value",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           CAST(count(*) OVER w AS INTEGER) AS orders_so_far
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    "window",
    "analytic",
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit frames (full-partition last)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.withColumn("first_order", F.first("o_orderkey").over(w))
        .withColumn("last_order", F.last("o_orderkey").over(w_full))
        .withColumn("orders_so_far", F.count(F.lit(1)).over(w).cast("int"))
        .select("o_custkey", "o_orderkey", "first_order", "last_order", "orders_so_far")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_percent_cume",
    """
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank,
           round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_cume
    FROM customer WHERE c_custkey <= 100
    ORDER BY c_custkey
    """,
    "window",
    "analytic",
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist over a deterministic total order."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
    ).orderBy("c_custkey")


@register(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
    "stats",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-moment aggregates: corr, covar_samp, regr_slope."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
    )


@register(
    "agg_argmin_argmax",
    """
    SELECT o_orderstatus,
           arg_max(o_orderkey, round(o_totalprice * 100) * 10000000 + o_orderkey) AS priciest_order,
           arg_min(o_orderkey, round(o_totalprice * 100) * 10000000 + o_orderkey) AS cheapest_order
    FROM orders GROUP BY o_orderstatus
    """,
    "agg",
    "argminmax",
)
def agg_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (== DuckDB arg_max/arg_min) with a tie-proof ordinal
    (price in cents scaled, order key as tiebreak — prices collide)."""
    o = t(spark, sf_dir, "orders")
    ordinal = F.round(F.col("o_totalprice") * 100, 0) * 10000000 + F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", ordinal).alias("priciest_order"),
        F.min_by("o_orderkey", ordinal).alias("cheapest_order"),
    )


@register(
    "agg_ordered_strings",
    """
    SELECT c_nationkey,
           coalesce(string_agg(c_name, ',' ORDER BY c_name), '') AS names_csv,
           coalesce(array_to_string(list_sort(list(DISTINCT c_mktsegment)
             FILTER (c_mktsegment IS NOT NULL)), '|'), '') AS segments
    FROM customer WHERE c_custkey <= 60
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "agg",
    "collect",
)
def agg_ordered_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation / sorted collect_set — deterministic by
    sorting before joining (collect order is engine-arbitrary)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 60)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names_csv"),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "explode_word_freq",
    """
    SELECT word, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 20
    """,
    "explode",
    "lateral",
)
def explode_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST) + aggregation: corpus word frequencies, top 20."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(20)
    )


@register(
    "array_functions",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_words,
           w[1] AS first_word,
           w[-1] AS last_word,
           CAST(list_contains(w, 'data') AS BOOLEAN) AS has_data,
           CAST(list_position(w, 'data') AS INTEGER) AS data_pos,
           array_to_string(w[1:3], '_') AS first3
    FROM d ORDER BY doc_id
    """,
    "scalar",
    "array",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library: size/element_at/contains/position/slice.

    Both engines return 0 (1-based otherwise) from array/list position
    for a missing element."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.array_contains(w, "data").alias("has_data"),
        F.array_position(w, "data").cast("int").alias("data_pos"),
        F.array_join(F.slice(w, 1, 3), "_").alias("first3"),
    ).orderBy("doc_id")


@register(
    "null_semantics",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           (o_orderstatus IS DISTINCT FROM 'F') AS not_finished,
           CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE round(o_totalprice, 2) END AS price_nn,
           ifnull(nullif(o_orderpriority, o_orderpriority), 'same') AS always_same
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    "scalar",
    "null",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics: nullif/coalesce/ifnull/IS DISTINCT FROM."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.col("o_orderstatus").eqNullSafe("F").__invert__().alias("not_finished"),
        F.when(F.col("o_totalprice").isNull(), -1.0).otherwise(F.round("o_totalprice", 2)).alias("price_nn"),
        F.ifnull(F.nullif("o_orderpriority", F.col("o_orderpriority")), F.lit("same")).alias("always_same"),
    ).orderBy("o_orderkey")


@register(
    "cast_and_format",
    """
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           round(CAST('3.25' AS DOUBLE) * o_orderkey, 2) AS parsed_mult
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    "scalar",
    "cast",
)
def cast_and_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casting + date formatting parity (Spark date_format == strftime).

    Spark CAST(double AS BIGINT) truncates toward zero; DuckDB's cast
    rounds — the oracle states trunc() explicitly to pin the Spark
    semantics."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.round(F.lit("3.25").cast("double") * F.col("o_orderkey"), 2).alias("parsed_mult"),
    ).orderBy("o_orderkey")


@register("agg_approx_sketches", None, "agg", "approx", "sketch")
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB cardinality work: HLL++ distinct count
    and approximate percentiles. Sketches are engine-specific ⇒ rows-only
    driver check; accuracy vs exact values asserted in tests."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("exact_median_price"),
    )


@register(
    "win_range_frame_rolling",
    """
    WITH o AS (
      SELECT o_custkey,
             CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
             o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, day, o_orderkey, cents,
           CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
                                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_7d_cents,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
                               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_7d_orders
    FROM o ORDER BY o_custkey, day, o_orderkey
    """,
    "window",
    "range-frame",
)
def win_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowing (the value-based frame SURVEY §2.2's window
    row names alongside rowsBetween): per customer, each order's
    trailing-7-DAY spend and order count — a RANGE frame over the
    integer epoch-day, so orders on the same day aggregate together and
    calendar gaps shrink the window (a ROWS frame would get both
    wrong). Partitioned by customer (per-partition cardinality = one
    customer's order count, the behavior-face precedent); exact integer
    cents and days throughout."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .cast("bigint")
        .alias("day"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    return o.select(
        "o_custkey",
        "day",
        "o_orderkey",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("rolling_7d_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("rolling_7d_orders"),
    ).orderBy("o_custkey", "day", "o_orderkey")
