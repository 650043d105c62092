"""Third relational batch: regexp functions, unpivot, map type, bitwise
ops, generator sources (calendar dimension), and set-op ALL variants."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t


@register(
    "scalar_regexp_funcs",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, 'data|table')) AS INTEGER) AS kw_hits,
           regexp_matches(text, 'join.*join') AS has_two_joins,
           substring(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_prefix
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
    "scalar",
    "regexp",
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp library parity on the dialect-shared subset (character
    classes, alternation, greedy dot) — Java regex vs RE2 agree there.

    Note Spark regexp_replace is global by default; DuckDB needs the 'g'
    flag. Spark rlike == DuckDB regexp_matches (partial match)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.size(F.expr(r"regexp_extract_all(text, 'data|table', 0)")).alias("kw_hits"),
        F.col("text").rlike("join.*join").alias("has_two_joins"),
        F.substring(F.regexp_replace("text", "[aeiou]", "_"), 1, 40).alias("devoweled_prefix"),
    ).orderBy("doc_id")


@register(
    "unpivot_metrics",
    """
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    WHERE c_custkey <= 25
    ORDER BY c_custkey, metric
    """,
    "unpivot",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide columns → (metric, value) rows."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 25)
    return (
        c.select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, raw)"
            ),
        )
        .select("c_custkey", "metric", F.round("raw", 2).alias("val"))
        .orderBy("c_custkey", "metric")
    )


@register(
    "map_type_ops",
    """
    SELECT o_orderkey,
           (map {'status': o_orderstatus, 'priority': o_orderpriority}['status'])[1] AS m_status,
           (map {'status': o_orderstatus, 'priority': o_orderpriority}['priority'])[1] AS m_priority,
           CAST(cardinality(map {'status': o_orderstatus, 'priority': o_orderpriority}) AS INTEGER) AS m_size
    FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey
    """,
    "scalar",
    "map",
)
def map_type_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access + cardinality (values extracted
    to plain columns so the result is hashable cross-engine)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("m_status"),
        F.element_at(m, "priority").alias("m_priority"),
        F.size(m).alias("m_size"),
    ).orderBy("o_orderkey")


@register(
    "bitwise_ops",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 255) AS flipped,
           (o_orderkey & 255) << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
    "scalar",
    "bitwise",
)
def bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function parity (&, |, xor, shifts, popcount). Negative
    keys are first-class: & | xor, arithmetic >> and two's-complement
    bit_count agree across engines at any sign, but DuckDB REFUSES to
    left-shift a negative (Spark wraps silently) — so the left shift is
    DEFINED over the masked low byte, (k & 255) << 2, in both
    spellings (extreme-id tier)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(255)).alias("flipped"),
        F.shiftleft(k.bitwiseAND(F.lit(255)), 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


@register(
    "calendar_join_gaps",
    """
    WITH months AS (
      SELECT CAST(unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01',
                                         INTERVAL 1 MONTH)) AS TIMESTAMP) AS month_start),
    per_month AS (
      SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n
      FROM orders GROUP BY 1)
    SELECT month_start, coalesce(n, 0) AS n_orders
    FROM months LEFT JOIN per_month ON m = month_start
    ORDER BY month_start
    """,
    "generator",
    "join",
)
def calendar_join_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension left-joined to order counts — months
    with zero orders stay visible (the gap-filling reporting pattern;
    F.sequence is the generator source, no table needed)."""
    o = t(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2001-08-01").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    per_month = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        months.join(per_month, months.month_start == per_month.m, "left")
        .select("month_start", F.coalesce("n", F.lit(0)).alias("n_orders"))
        .orderBy("month_start")
    )


@register(
    "set_ops_all_variants",
    """
    WITH a AS (SELECT o_orderstatus AS s FROM orders WHERE o_orderkey <= 500),
         b AS (SELECT o_orderstatus AS s FROM orders WHERE o_orderkey BETWEEN 250 AND 750)
    SELECT 'union_all' AS op, count(*) AS n FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all' AS op, count(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all' AS op, count(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
    "setop",
    "all-variants",
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL
    cardinalities (multiplicity preserved, unlike the distinct variants)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 500).select(F.col("o_orderstatus").alias("s"))
    b = o.filter(F.col("o_orderkey").between(250, 750)).select(F.col("o_orderstatus").alias("s"))
    pieces = [
        ("union_all", a.unionAll(b)),
        ("intersect_all", a.intersectAll(b)),
        ("except_all", a.exceptAll(b)),
    ]
    out = None
    for op, df in pieces:
        piece = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = piece if out is None else out.unionByName(piece)
    return out


@register(
    "agg_grouping_id",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg",
    "grouping-id",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() marker columns distinguish real NULL group keys from
    rollup subtotal rows."""
    l = t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@register(
    "agg_percentiles_exact",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS med_qty,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS p25_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS p75_cents,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9)  AS p90_cents
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg",
    "percentile",
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation) per group — the
    sort-based complement to the approx sketches in agg_approx_sketches.
    Both engines interpolate a + (b-a)*f over the sorted values; inputs
    are exact integers (quantities, cents), so the interpolated doubles
    agree bit-for-bit. At 100 TB exact percentiles are a per-group sort
    — Spark's percentile() aggregates partial histograms per partition,
    so the shuffle carries digests, not rows."""
    l = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # one percentile buffer per COLUMN, not per quantile: the array-
    # probability form sorts the cents values once for all three cuts
    # (3 separate aggregates each keep their own sort buffer — ~2x the
    # memory and time for identical output)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("med_qty"),
            F.percentile(cents, F.array(F.lit(0.25), F.lit(0.75), F.lit(0.9))).alias("pc"),
        )
        .select(
            "l_returnflag",
            "med_qty",
            F.col("pc")[0].alias("p25_cents"),
            F.col("pc")[1].alias("p75_cents"),
            F.col("pc")[2].alias("p90_cents"),
        )
        .orderBy("l_returnflag")
    )
