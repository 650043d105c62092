"""Fourth relational batch: nested struct round-trips, higher-order array
functions, and the DataFrameNaFunctions surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import text as T
from etl_file_sync_spark.queries.registry import register, t


@register(
    "nested_struct_roundtrip",
    """
    WITH j AS (
      SELECT o_orderkey,
             to_json(struct_pack(key := o_orderkey,
                                 meta := struct_pack(status := o_orderstatus,
                                                     priority := o_orderpriority))) AS payload
      FROM orders WHERE o_orderkey <= 100)
    SELECT o_orderkey, payload,
           CAST(json_extract_string(payload, '$.key') AS BIGINT) AS key_back,
           json_extract_string(payload, '$.meta.status') AS status_back
    FROM j ORDER BY o_orderkey
    """,
    "scalar",
    "struct",
    "json",
)
def nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct build → JSON serialize → field extraction round-trip
    (the reference's entire message model is this shape, message.py:33-53;
    here it is exercised as a first-class nested type, not a dict)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
            ).alias("meta"),
        ),
        # keep NULL fields in the serialization (Spark's default DROPS
        # them, so a NULL status vanished from the payload while
        # DuckDB's to_json kept "status": null — a round-trip should
        # preserve the field)
        {"ignoreNullFields": "false"},
    )
    return o.select(
        "o_orderkey",
        payload.alias("payload"),
        F.get_json_object(payload, "$.key").cast("bigint").alias("key_back"),
        F.get_json_object(payload, "$.meta.status").alias("status_back"),
    ).orderBy("o_orderkey")


@register(
    "array_hof_funcs",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 40)
    SELECT doc_id,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS INTEGER) AS n_long_words,
           array_to_string(list_transform(w[1:3],
             x -> translate(x, 'abcdefghijklmnopqrstuvwxyz',
                               'ABCDEFGHIJKLMNOPQRSTUVWXYZ')), ',') AS first3_upper,
           CAST(list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b) AS BIGINT) AS total_chars,
           CAST(list_max(list_transform(w, x -> length(x))) AS INTEGER) AS longest_word_len
    FROM d ORDER BY doc_id
    """,
    "scalar",
    "higher-order",
)
def array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / transform / aggregate folds
    (Spark lambda expressions == DuckDB list lambdas).

    Oracle note: DuckDB 1.0's list_reduce miscomputes BRANCHING lambdas
    (CASE max-fold) on large vectorized batches — same query, different
    WHERE cardinality, different answer — so the oracle states the max
    via list_max; the arithmetic sum fold is unaffected (verified).

    Case fold is the ASCII contract (CONVENTIONS.md C20), not upper():
    both parent poked tiers masked the divergence (the unicode tier's
    poked payloads never reach the first-3 words; the monster tier's
    blob is ASCII), but the COMPOSED unicode x monster tier makes word
    1 of doc 7 'ß数...' — JVM SpecialCasing upper('ß') = 'SS' vs
    DuckDB/utf8proc 'ẞ', the exact C33 data-dependent-happy-path trap
    this query previously carried."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    w = F.split("text", " ")
    lens = F.transform(w, lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.array_join(
            F.transform(F.slice(w, 1, 3), lambda x: T.ascii_upper(x)), ","
        ).alias("first3_upper"),
        F.aggregate(lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total_chars"),
        F.aggregate(lens, F.lit(0), lambda acc, x: F.when(x > acc, x).otherwise(acc)).alias(
            "longest_word_len"
        ),
    ).orderBy("doc_id")


@register(
    "na_fill_drop",
    """
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status_nullable,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS price_nullable
      FROM orders WHERE o_orderkey <= 200)
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN status_nullable IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status,
           count(CASE WHEN status_nullable IS NOT NULL AND price_nullable IS NOT NULL THEN 1 END) AS n_complete,
           round(sum(coalesce(price_nullable, 0.0)), 2) AS total_filled,
           count(DISTINCT coalesce(status_nullable, 'UNKNOWN')) AS n_status_filled
    FROM base
    """,
    "scalar",
    "na-functions",
)
def na_fill_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameNaFunctions surface: na.fill / na.drop over injected NULLs
    (the oracle restates them as coalesce / IS NOT NULL counting)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    base = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("o_orderstatus")).alias("status_nullable"),
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice")).alias("price_nullable"),
    )
    filled = base.na.fill({"price_nullable": 0.0, "status_nullable": "UNKNOWN"})
    complete = base.na.drop(subset=["status_nullable", "price_nullable"])
    return (
        base.agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("status_nullable").isNull(), 1).otherwise(0)).alias("n_null_status"),
        )
        .crossJoin(complete.agg(F.count(F.lit(1)).alias("n_complete")))
        .crossJoin(filled.agg(F.round(F.sum("price_nullable"), 2).alias("total_filled")))
        .crossJoin(filled.agg(F.countDistinct("status_nullable").alias("n_status_filled")))
    )


@register(
    "scalar_try_functions",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CASE WHEN ((o_orderkey % 10) + 10) % 10 = 0 THEN NULL
                ELSE floor(o_totalprice * 100
                           / (((o_orderkey % 10) + 10) % 10)) / 100
           END AS safe_div
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    "scalar",
    "error-safe",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions: try_cast yields NULL instead of failing;
    try_divide yields NULL on division by zero (== the oracle's CASE
    guard). The quotient is reported at a FLOOR grain (floor(x·100)/100),
    not round(x, 2): the engines' round() implementations disagree at
    .xx5 boundaries of negative quotients (Spark -67022.92 vs DuckDB
    -67022.91 on the extreme-id tier), while floor of an identical
    double is identical everywhere. Divisor is pmod (floor-mod) so
    hash-range negative keys land in the same 0..9 bucket as the
    oracle's ((x%k)+k)%k spelling."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    div = F.pmod(F.col("o_orderkey"), F.lit(10))
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        (F.floor(F.try_divide(F.col("o_totalprice") * 100, div)) / 100).alias(
            "safe_div"
        ),
    ).orderBy("o_orderkey")


@register(
    "scalar_month_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           round(CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS DOUBLE) / 30.4375, 2)
             AS approx_months_since
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    "scalar",
    "date",
)
def scalar_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month arithmetic: add_months-equivalent interval addition, last_day,
    and day-based month deltas (months_between's engine-specific 31-day
    convention is avoided in favor of an explicit shared formula)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3mo"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.round(F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp")) / 30.4375, 2).alias(
            "approx_months_since"
        ),
    ).orderBy("o_orderkey")


@register(
    "stat_crosstab",
    """
    -- df.stat.crosstab stringifies a NULL group key as 'null'
    SELECT coalesce(o_orderstatus, 'null') AS o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM orders GROUP BY o_orderstatus
    """,
    "agg",
    "crosstab",
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via df.stat.crosstab, projected to fixed columns
    (crosstab's dynamic column set is data-dependent; the two pinned
    priorities keep the schema stable for the oracle)."""
    o = t(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    # crosstab's column set is inferred from the DATA: a tier where a
    # pinned priority never occurs (empty/degenerate input) would
    # otherwise fail to resolve `1-URGENT` — pin absent levels to 0
    for level in ("1-URGENT", "5-LOW"):
        if level not in ct.columns:
            ct = ct.withColumn(level, F.lit(0))
    return ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("o_orderstatus"),
        F.col("1-URGENT").cast("bigint").alias("urgent"),
        F.col("5-LOW").cast("bigint").alias("low"),
    )


@register("agg_freq_items", None, "agg", "heavy-hitters")
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (df.stat.freqItems, the
    Karp-Schenker-Papadimitriou single-pass sketch). Sketch output is a
    superset of true frequent items ⇒ rows-only check; superset property
    asserted in tests."""
    o = t(spark, sf_dir, "orders")
    fi = o.stat.freqItems(["o_orderpriority", "o_orderstatus"], support=0.15)
    return fi.select(
        F.array_join(F.sort_array("o_orderpriority_freqItems"), ",").alias("frequent_priorities"),
        F.array_join(F.sort_array("o_orderstatus_freqItems"), ",").alias("frequent_statuses"),
    )


@register(
    "sql_join_hints",
    """
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "join",
    "hints",
    "sql-face",
)
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL join-strategy hints (/*+ BROADCAST */): hints steer the
    physical plan, never the result — the oracle is the plain join."""
    from etl_file_sync_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register(
    "win_nth_value",
    """
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_orderkey
    FROM orders WHERE o_custkey <= 25
    ORDER BY o_custkey, o_orderkey
    """,
    "window",
    "nth-value",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame (each customer's second
    order attached to every row)."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 25)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.withColumn("second_orderkey", F.nth_value("o_orderkey", 2).over(w))
        .select("o_custkey", "o_orderkey", "second_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_count_distinct",
    """
    SELECT o_orderkey,
           CAST(count(DISTINCT o_custkey) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_distinct_custs
    FROM orders WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
    "window",
    "distinct",
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per group — Spark has no DISTINCT window
    aggregate, so it is spelled size(collect_set(...)) over the same
    frame; the oracle uses the native DISTINCT window. The collect_set
    state is bounded by the distinct-key cardinality per partition —
    fine for dimension-sized keys, not for unbounded ones (that regime
    is the HLL sketch in agg_hll_lifecycle)."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            F.size(F.collect_set("o_custkey").over(w)).cast("long").alias("running_distinct_custs"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "dq_histogram_equidepth",
    """
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ntile(10) OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
               AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    "dq",
    "histogram",
    "ntile",
)
def dq_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals — the DQ profile
    that resists skew where equi-width bins collapse. ntile over a
    unique total order (cents, orderkey) is engine-identical; the global
    sort is the cost, which at 100 TB becomes approx_percentile
    boundaries + one bucketing pass (agg_approx_sketches shows that
    path)."""
    from pyspark.sql import Window as W

    # observed values only: NULL prices carry no histogram mass
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b = o.select(
        cents.alias("cents"),
        F.ntile(10).over(W.orderBy(cents, F.col("o_orderkey"))).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("cents").alias("lo_cents"), F.max("cents").alias("hi_cents"))
        .orderBy("bucket")
    )


@register(
    "agg_share_of_hierarchy",
    """
    WITH rev AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region_name, nation_name,
           round(cents / 100.0, 2) AS revenue,
           round(cents * 1.0 / sum(cents) OVER (PARTITION BY region_name), 6)
             AS share_of_region,
           round(cents * 1.0 / sum(cents) OVER (), 6) AS share_of_total
    FROM rev ORDER BY region_name, nation_name
    """,
    "aggregation",
    "hierarchy",
    "share-of-parent",
)
def agg_share_of_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent BI rollup: nation revenue as a share of its
    region and of the world. The fact table collapses through one
    combiner-friendly groupBy after broadcast dimension joins; the
    percent-of-parent windows run over the ~25-row aggregate only.
    Integer-cent sums keep both engines bit-identical before the two
    terminal divisions."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)  # fact-fact: customer is NOT broadcastable at scale
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"))
    )
    return (
        rev.select(
            "region_name",
            "nation_name",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.col("cents") / F.sum("cents").over(W.partitionBy("region_name")), 6
            ).alias("share_of_region"),
            F.round(F.col("cents") / F.sum("cents").over(W.partitionBy()), 6).alias(
                "share_of_total"
            ),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "mba_pair_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n_ord AS (
      SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items
    ),
    item_n AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM items GROUP BY pk
    ),
    pair_n AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_ab,
           round(n_ab * 1.0 / n, 6) AS support,
           round(n_ab * 1.0 / ia.n_item, 6) AS confidence,
           round(n_ab * 1.0 * n / (ia.n_item * 1.0 * ib.n_item), 6) AS lift
    FROM pair_n
    JOIN item_n ia ON pair_n.part_a = ia.pk
    JOIN item_n ib ON pair_n.part_b = ib.pk
    CROSS JOIN n_ord
    ORDER BY n_ab * 1.0 * n / (ia.n_item * 1.0 * ib.n_item) DESC,
             part_a, part_b
    LIMIT 20
    """,
    "basket",
    "association",
    "join",
)
def mba_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: the 20 part pairs with the
    highest lift among pairs co-ordered at least twice, with support
    and confidence. The pair space comes from per-order BASKETS — one
    shuffle on the order key into a sorted distinct item set, pairs
    enumerated INSIDE the array (a TPC-H order holds <= 7 items, so
    fan-out is C(7,2) per basket, never quadratic in the table). The
    round-8 respell: the previous items-frame self-join consumed the
    distinct (ok, pk) lineage three times (runtime probe: 3 lineitem
    scans + a 600k-row broadcast for the self-join); the basket shape
    derives pairs, per-item counts, and the basket total from ONE
    grouped frame, identical counts by construction (sort_array makes
    part_a < part_b; collect_set = DISTINCT; a basket's combination
    count = the self-join's a.pk < b.pk count). Item counts join back
    per pair side (shuffle-hash on part at scale), the order total is
    a 1-row broadcast, and the top-20 is TakeOrderedAndProject. Lift
    ties order deterministically by (part_a, part_b) in both engines;
    all ratios are integer-derived doubles, so the engines compute
    identical sort keys."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    baskets = li.groupBy("ok").agg(F.sort_array(F.collect_set("pk")).alias("pks"))
    n_ord = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    item_n = (
        baskets.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    )
    pair_n = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(pks, (x, i) ->"
                    " transform(slice(pks, i + 2, size(pks)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ia = item_n.select(F.col("pk").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item_n.select(F.col("pk").alias("part_b"), F.col("n_item").alias("n_b"))
    lift = F.col("n_ab") * 1.0 * F.col("n") / (F.col("n_a") * 1.0 * F.col("n_b"))
    return (
        pair_n.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_ord))  # 1-row totals dimension
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(F.col("n_ab") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_a"), 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
            lift.alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "part_a", "part_b")
        .limit(20)
        .drop("_ord")
    )


@register(
    "scalar_xml_extract",
    """
    WITH x AS (
      SELECT o_orderkey,
             '<order id="' || o_orderkey || '"><status>' || o_orderstatus ||
             '</status><cents>' || CAST(round(o_totalprice * 100) AS BIGINT) ||
             '</cents></order>' AS xml
      FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey, xml,
           CAST(regexp_extract(xml, 'id="(-?\\d+)"', 1) AS BIGINT) AS id_back,
           regexp_extract(xml, '<status>(.*)</status>', 1) AS status_back,
           CAST(regexp_extract(xml, '<cents>(-?\\d+)</cents>', 1) AS BIGINT) AS cents_back
    FROM x ORDER BY o_orderkey
    """,
    "scalar",
    "xml",
)
def scalar_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar surface (Spark 4 from_xml): serialize each order to an
    XML fragment with JVM string expressions, then parse it back with a
    schema'd from_xml — attribute id and both elements round-trip
    value-exact (totals as integer cents, so no float formatting
    skew). The oracle extracts the same fields relationally; both
    engines construct byte-identical fragments, so the comparison pins
    the parser, not the formatter."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><cents>"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.lit("</cents></order>"),
    )
    parsed = F.from_xml(xml, "STRUCT<_id: BIGINT, status: STRING, cents: BIGINT>")
    return (
        o.select(F.col("o_orderkey"), xml.alias("xml"), parsed.alias("p"))
        .select(
            "o_orderkey",
            "xml",
            F.col("p._id").alias("id_back"),
            F.col("p.status").alias("status_back"),
            F.col("p.cents").alias("cents_back"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "agg_weighted_median",
    """
    WITH g AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt, CAST(count(*) AS BIGINT) AS nv
            FROM g),
    cum AS (
      SELECT v, w, sum(w) OVER (ORDER BY v) AS cw FROM g
    )
    SELECT tot.wt AS total_weight, tot.nv AS n_distinct_prices,
           CAST(min(CASE WHEN cum.cw * 2 >= tot.wt THEN cum.v END) AS BIGINT)
             AS weighted_median_cents,
           CAST(min(CASE WHEN cum.cw * 4 >= tot.wt THEN cum.v END) AS BIGINT)
             AS weighted_p25_cents,
           CAST(min(CASE WHEN cum.cw * 4 >= 3 * tot.wt THEN cum.v END) AS BIGINT)
             AS weighted_p75_cents
    FROM cum, tot GROUP BY tot.wt, tot.nv
    """,
    "agg",
    "percentile",
    "distributed-rank",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median (and p25/p75) of the unit price in
    cents: the smallest price whose cumulative quantity weight reaches
    half (quarter, three-quarters) of the total — the lower weighted
    quantile, decided entirely in exact integer arithmetic (cw*2 >= W
    avoids any 0.5 double), so no interpolation convention can
    diverge. Cumulative weights ride the bucketed two-phase plan over
    DISTINCT prices (operators/rankstats.py); the crossing pick is a
    conditional min, not an order-dependent first()."""
    from etl_file_sync_spark.operators.rankstats import bucketed_cumsums

    g = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    )
    tot = g.agg(
        F.sum("w").cast("bigint").alias("wt"),
        F.count(F.lit(1)).cast("bigint").alias("nv"),
    )
    cum = bucketed_cumsums(g, "v", ["w"], inclusive=True)
    cw = F.col("cum_w")
    return (
        cum.crossJoin(F.broadcast(tot))  # 1-row totals dimension
        .groupBy("wt", "nv")
        .agg(
            F.min(F.when(cw * 2 >= F.col("wt"), F.col("v")))
            .cast("bigint")
            .alias("weighted_median_cents"),
            F.min(F.when(cw * 4 >= F.col("wt"), F.col("v")))
            .cast("bigint")
            .alias("weighted_p25_cents"),
            F.min(F.when(cw * 4 >= 3 * F.col("wt"), F.col("v")))
            .cast("bigint")
            .alias("weighted_p75_cents"),
        )
        .select(
            F.col("wt").alias("total_weight"),
            F.col("nv").alias("n_distinct_prices"),
            "weighted_median_cents",
            "weighted_p25_cents",
            "weighted_p75_cents",
        )
    )


@register(
    "agg_log2_histogram",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    b AS (
      SELECT length(bin(c)) AS bucket, c FROM v
    ),
    g AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(min(c) AS BIGINT) AS min_cents,
             CAST(max(c) AS BIGINT) AS max_cents
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
    SELECT CAST(g.bucket AS BIGINT) AS log2_bucket, g.n, g.min_cents, g.max_cents,
           round(g.n * 1.0 / tot.nt, 6) AS share,
           round(sum(g.n) OVER (ORDER BY g.bucket) * 1.0 / tot.nt, 6) AS cum_share
    FROM g, tot ORDER BY log2_bucket
    """,
    "agg",
    "dq",
    "distribution-fit",
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram of purchase value cents (the HDR-style
    magnitude profile a latency/value dashboard wants): bucket = BIT
    LENGTH of the integer cents — length(bin(c)) — which equals
    floor(log2(c))+1 in EXACT integer arithmetic, so no float log can
    flip a power-of-two boundary differently across engines. One
    groupBy to the ~40-row bucket frame; share and cumulative share
    fold against the broadcast total."""
    v = (
        t(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("value") > 0))
        .select(F.round(F.col("value") * 100).cast("bigint").alias("c"))
    )
    g = (
        v.select(F.length(F.bin(F.col("c"))).alias("bucket"), "c")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
        )
    )
    tot = g.agg(F.sum("n").cast("bigint").alias("nt"))
    from pyspark.sql import Window as W

    w = W.orderBy("bucket")  # ~40-row bucket frame — bounded
    return (
        g.crossJoin(F.broadcast(tot))  # 1-row totals dimension
        .select(
            F.col("bucket").cast("bigint").alias("log2_bucket"),
            "n",
            "min_cents",
            "max_cents",
            F.round(F.col("n") * 1.0 / F.col("nt"), 6).alias("share"),
            F.round(F.sum("n").over(w) * 1.0 / F.col("nt"), 6).alias("cum_share"),
        )
        .orderBy("log2_bucket")
    )
