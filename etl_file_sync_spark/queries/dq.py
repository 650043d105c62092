"""Data-quality queries: table profiling, declarative constraint checks,
LSH calibration — the ingest-gate face of the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.localrel import local_rows_df

from etl_file_sync_spark.operators.profile import Constraint, check_constraints, profile_table
from etl_file_sync_spark.queries.registry import register, t

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


def _profile_oracle_piece(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT {col}) AS n_distinct,
           CAST(min({col}) AS VARCHAR) AS min_val,
           CAST(max({col}) AS VARCHAR) AS max_val
    FROM orders"""


@register(
    "dq_profile_orders",
    "\nUNION ALL\n".join(_profile_oracle_piece(c) for c in _PROFILE_COLS),
    "dq",
    "profile",
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile: nulls / exact distinct / min / max per
    column (one wide aggregation + stack, one job for any column count).

    Double columns are excluded here only because engines format
    float-to-string differently; the operator itself profiles them fine.
    """
    o = t(spark, sf_dir, "orders")
    return profile_table(o, _PROFILE_COLS).withColumnRenamed("column", "col_name")


@register(
    "dq_constraint_checks",
    """
    SELECT 'orders_pk_unique' AS check_name, 'unique' AS kind,
           CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders_pk_not_null', 'not_null',
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_fk_orders', 'foreign_key',
           CAST(count(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'status_accepted_values', 'accepted_values',
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL
    """,
    "dq",
    "constraints",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style declarative checks evaluated as violation counts
    (0 everywhere == green ingest gate): PK uniqueness and non-null,
    lineitem→orders referential integrity, accepted status values."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    checks = [
        Constraint("orders_pk_unique", "unique", "o_orderkey"),
        Constraint("orders_pk_not_null", "not_null", "o_orderkey"),
        Constraint("lineitem_fk_orders", "foreign_key", "l_orderkey", ref=orders, ref_column="o_orderkey"),
        Constraint("status_accepted_values", "accepted_values", "o_orderstatus", values=("O", "F", "P")),
    ]
    fk = check_constraints(lineitem, [checks[2]])
    rest = check_constraints(orders, [checks[0], checks[1], checks[3]])
    return rest.unionByName(fk)


@register(
    "lsh_calibration_plan",
    """
    WITH sampled AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 8))::UBIGINT::BIGINT % 100 < 50
    ),
    ii AS (SELECT doc_id, l, unnest(range(0, greatest(len(l) - 3, 0) + 1)) AS i FROM sampled),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(l, i + 1, i + 3), ' ') AS shingle
      FROM ii WHERE length(array_to_string(list_slice(l, i + 1, i + 3), ' ')) > 0
    ),
    perms AS (SELECT unnest(range(0, 64)) AS p),
    hashes AS (
      SELECT doc_id, p,
             min(('0x' || substr(md5(shingle || ':' || CAST(p AS VARCHAR)), 1, 8))::UBIGINT::BIGINT) AS h
      FROM sh, perms GROUP BY doc_id, p
    ),
    sig AS MATERIALIZED (SELECT doc_id, list(h ORDER BY p) AS sig FROM hashes GROUP BY doc_id),
    cand AS (
      SELECT count(*) AS n_cand
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE len(list_filter(range(0, 32),
                            band -> list_slice(a.sig, band * 2 + 1, band * 2 + 2)
                                    = list_slice(b.sig, band * 2 + 1, band * 2 + 2))) > 0
    ),
    -- square-and-multiply chains: the SAME fixed order of IEEE multiplies
    -- the Spark side's calibrate._ipow computes, so the probabilities are
    -- bit-identical (libm pow would be implementation-defined in the ulp)
    x1 AS (SELECT CAST(1.0 AS DOUBLE) - CAST(0.5 AS DOUBLE) * CAST(0.5 AS DOUBLE) AS r,
                  CAST(1.0 AS DOUBLE) - CAST(0.25 AS DOUBLE) * CAST(0.25 AS DOUBLE) AS f),
    x2 AS (SELECT r * r AS r, f * f AS f FROM x1),
    x4 AS (SELECT r * r AS r, f * f AS f FROM x2),
    x8 AS (SELECT r * r AS r, f * f AS f FROM x4),
    x16 AS (SELECT r * r AS r, f * f AS f FROM x8),
    x32 AS (SELECT r * r AS r, f * f AS f FROM x16)
    SELECT CAST(32 AS INTEGER) AS bands, CAST(2 AS INTEGER) AS rows_per_band,
           CAST(64 AS INTEGER) AS num_perm,
           round(CAST(1.0 AS DOUBLE) - x32.r, 4) AS recall_at_threshold,
           round(CAST(1.0 AS DOUBLE) - x32.f, 4) AS fp_at_half_threshold,
           CAST(cand.n_cand * 4 AS BIGINT) AS est_candidate_pairs
    FROM x32, cand
    """,
    "dq",
    "calibration",
    "lsh",
)
def lsh_calibration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic LSH parameter choice for threshold 0.5 at 64 perms, plus a
    sampled candidate-count estimate on documents — how a 100 TB dedup
    run sizes its banding shuffle before paying for it. Oracle-checked
    (round-3 verdict promotion): parameters (32 bands × 2 rows) are
    integers, the S-curve probabilities are computed by fixed-order
    square-and-multiply (calibrate._ipow) that the oracle restates as
    multiply-chain CTEs, and the candidate estimate runs on an
    md5-seeded 50% sample with md5 minhash signatures so DuckDB
    reproduces the exact candidate count (×4 extrapolation is integer)."""
    from etl_file_sync_spark.operators.calibrate import choose_lsh_params, estimate_candidates

    plan = choose_lsh_params(threshold=0.5, num_perm=64, min_recall=0.9)
    plan = estimate_candidates(t(spark, sf_dir, "documents"), plan, sample_pct=50, hash_fn="md5")
    return local_rows_df(
        spark,
        [
            (
                plan.bands,
                plan.rows_per_band,
                plan.num_perm,
                float(plan.recall_at_threshold),
                float(plan.false_positive_at_half_threshold),
                plan.est_candidate_pairs,
            )
        ],
        "bands int, rows_per_band int, num_perm int, recall_at_threshold double, "
        "fp_at_half_threshold double, est_candidate_pairs long",
    )


@register(
    "dq_key_skew",
    """
    WITH counts AS (
      SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_custkey
    ),
    totals AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                      CAST(count(*) AS BIGINT) AS nkeys FROM counts)
    SELECT c.key, c.cnt,
           CAST((c.cnt * 1000000) // t.total AS BIGINT) AS share_ppm,
           c.cnt * t.nkeys > 10.0 * t.total AS is_skewed
    FROM counts c, totals t
    ORDER BY c.cnt DESC, c.key LIMIT 20
    """,
    "dq",
    "skew",
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic on orders.o_custkey
    (operators/skew.py::key_skew_report) — surfaces the keys a
    salted_join or AQE skew split must absorb."""
    from etl_file_sync_spark.operators.skew import key_skew_report

    o = t(spark, sf_dir, "orders")
    return key_skew_report(o, "o_custkey", top=20, skew_factor=10.0)


@register(
    "dq_entropy_profile",
    """
    WITH
    c1 AS (SELECT event_type AS v, count(*) AS c FROM events GROUP BY 1),
    c2 AS (SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS v, count(*) AS c FROM events GROUP BY 1),
    c3 AS (SELECT lang AS v, count(*) AS c FROM documents GROUP BY 1),
    c4 AS (SELECT source AS v, count(*) AS c FROM documents GROUP BY 1),
    u AS (
      SELECT 'events.event_type' AS col, * FROM c1
      UNION ALL SELECT 'events.hour', * FROM c2
      UNION ALL SELECT 'documents.lang', * FROM c3
      UNION ALL SELECT 'documents.source', * FROM c4
    )
    SELECT col, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy_nats,
           round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(count(*)), 6) AS norm_entropy
    FROM u GROUP BY col ORDER BY col
    """,
    "dq",
    "profiling",
    "entropy",
)
def dq_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy profile of categorical columns — the uniformity /
    skew signal a data-quality scanner reports per column (0 = constant,
    1 = uniform after normalizing by ln(cardinality)). Each column costs
    one combiner-friendly groupBy; the entropy is computed on the
    aggregate (value, count) frame via the cancellation-free identity
    H = ln(n) − Σ c·ln(c)/n, so only count integers enter the logs and
    both engines evaluate ln() on identical inputs (round-6 absorbs the
    final-ulp libm seam). The union of per-column count frames is
    aggregate-sized regardless of table size."""
    e = t(spark, sf_dir, "events")
    d = t(spark, sf_dir, "documents")

    def counts(df: DataFrame, col, label: str) -> DataFrame:
        return (
            df.groupBy(col.alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(label).alias("col"), "v", "c")
        )

    u = (
        counts(e, F.col("event_type"), "events.event_type")
        .unionByName(counts(e, F.hour("ts").cast("string"), "events.hour"))
        .unionByName(counts(d, F.col("lang"), "documents.lang"))
        .unionByName(counts(d, F.col("source"), "documents.source"))
    )
    h = F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
    return (
        u.groupBy("col")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.round(h, 6).alias("entropy_nats"),
            F.round(h / F.log(F.count(F.lit(1)).cast("double")), 6).alias("norm_entropy"),
        )
        .orderBy("col")
    )


@register(
    "dq_freshness_sla",
    """
    WITH g AS (
      SELECT event_type,
             CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(max(last_us) AS BIGINT) AS corpus_us FROM g)
    SELECT event_type, n_events,
           CAST(((SELECT corpus_us FROM tot) - last_us) // 1000000 AS BIGINT) AS lag_s,
           (((SELECT corpus_us FROM tot) - last_us) // 1000000 > 3600) AS sla_breach
    FROM g ORDER BY event_type
    """,
    "dq",
    "freshness",
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness gate: each event type's lag behind the
    corpus high-water mark in whole seconds, flagged against a 1-hour
    SLA — the staleness check an ingest monitor runs before declaring a
    partition complete. Exact integer microseconds end-to-end; one
    groupBy, enum-bounded output."""
    g = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.max(F.unix_micros("ts")).cast("bigint").alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    tot = g.agg(F.max("last_us").cast("bigint").alias("corpus_us"))
    lag = F.expr("(corpus_us - last_us) div 1000000")
    return (
        g.crossJoin(F.broadcast(tot))  # 1-row high-water dimension
        .select(
            "event_type",
            "n_events",
            lag.cast("bigint").alias("lag_s"),
            (lag > 3600).alias("sla_breach"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_functional_dependency",
    """
    WITH fd1 AS (
      SELECT 'orders: o_orderkey -> o_orderstatus' AS fd,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             CAST(max(nd) AS BIGINT) AS max_dependents
      FROM (SELECT o_orderkey, count(DISTINCT o_orderstatus) AS nd
            FROM orders GROUP BY o_orderkey)
    ),
    fd2 AS (
      SELECT 'orders: o_custkey -> o_orderpriority' AS fd,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             CAST(max(nd) AS BIGINT) AS max_dependents
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY o_custkey)
    ),
    fd3 AS (
      SELECT 'part: p_brand -> p_type' AS fd,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             CAST(max(nd) AS BIGINT) AS max_dependents
      FROM (SELECT p_brand, count(DISTINCT p_type) AS nd
            FROM part GROUP BY p_brand)
    ),
    u AS (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3)
    SELECT fd, n_keys, n_violating, max_dependents,
           round(n_violating * 1.0 / n_keys, 6) AS violation_rate
    FROM u ORDER BY fd
    """,
    "dq",
    "functional-dependency",
    "profiling",
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency validation — the schema-inference /
    normalization check a data-quality scanner runs: for each candidate
    FD X -> Y, count determinant values whose dependent is NOT unique.
    Candidates cover a holding FD (order key -> status, the PK case), a
    heavily violated one (customer -> order priority), and a
    low-cardinality violated one (brand -> type). Each FD costs one
    combiner-friendly (X, count distinct Y) aggregation; violation
    accounting runs on the key-cardinality-bounded aggregate frame."""

    def fd(df: DataFrame, label: str, det: str, dep: str) -> DataFrame:
        nd = df.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        return nd.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.max("nd").cast("bigint").alias("max_dependents"),
        )

    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    u = (
        fd(orders, "orders: o_orderkey -> o_orderstatus", "o_orderkey", "o_orderstatus")
        .unionByName(
            fd(
                orders,
                "orders: o_custkey -> o_orderpriority",
                "o_custkey",
                "o_orderpriority",
            )
        )
        .unionByName(fd(part, "part: p_brand -> p_type", "p_brand", "p_type"))
    )
    return u.select(
        "fd",
        "n_keys",
        "n_violating",
        "max_dependents",
        F.round(F.col("n_violating") * 1.0 / F.col("n_keys"), 6).alias(
            "violation_rate"
        ),
    ).orderBy("fd")


@register(
    "dq_key_gaps",
    """
    WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(min(key) AS BIGINT) AS min_key,
             CAST(max(key) AS BIGINT) AS max_key,
             CAST(max(key) - min(key) + 1 - count(*) AS BIGINT) AS n_missing
      FROM k
    ),
    nxt AS (
      SELECT key, lead(key) OVER (ORDER BY key) AS next_key FROM k
    ),
    gaps AS (
      SELECT key + 1 AS gap_start, next_key - 1 AS gap_end,
             next_key - key - 1 AS gap_len
      FROM nxt WHERE next_key - key > 1
    )
    SELECT CAST(g.gap_start AS BIGINT) AS gap_start,
           CAST(g.gap_end AS BIGINT) AS gap_end,
           CAST(g.gap_len AS BIGINT) AS gap_len,
           t.n_keys, t.n_missing
    FROM gaps g, tot t
    ORDER BY gap_len DESC, gap_start LIMIT 5
    """,
    "dq",
    "audit",
    "distributed-rank",
)
def dq_key_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit of the o_orderkey space: total missing keys
    (max - min + 1 - count, one exact aggregate) and the five largest
    contiguous holes. Successor pairs come from the bucketed global
    row_number (operators/rankstats.py) joined to itself on rn = rn+1 —
    an equi-join shuffle on the dense rank, so no single-partition
    window or lead() ever touches the full key column at any scale
    (the oracle restates it with a naive global lead)."""
    from etl_file_sync_spark.operators.rankstats import bucketed_row_number

    k = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("key")).distinct()
    tot = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min("key").cast("bigint").alias("min_key"),
        F.max("key").cast("bigint").alias("max_key"),
        (F.max("key") - F.min("key") + 1 - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_missing"),
    )
    rn = bucketed_row_number(k, "key").cache()  # both successor-join
    # sides read this frame — uncached, the rank window+offset join
    # executes once per side
    cur = rn.select(F.col("key"), F.col("rn"))
    nxt = rn.select(F.col("key").alias("next_key"), (F.col("rn") - 1).alias("rn"))
    gaps = (
        cur.join(nxt, "rn")
        .where(F.col("next_key") - F.col("key") > 1)
        .select(
            (F.col("key") + 1).cast("bigint").alias("gap_start"),
            (F.col("next_key") - 1).cast("bigint").alias("gap_end"),
            (F.col("next_key") - F.col("key") - 1).cast("bigint").alias("gap_len"),
        )
    )
    return (
        gaps.crossJoin(F.broadcast(tot.select("n_keys", "n_missing")))
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(5)
    )


@register(
    "dq_referential_integrity",
    """
    WITH li AS (
      SELECT CAST(count(*) AS BIGINT) AS child_rows,
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orphan_rows
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    oc AS (
      SELECT CAST(count(*) AS BIGINT) AS child_rows,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orphan_rows
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cn AS (
      SELECT CAST(count(*) AS BIGINT) AS child_rows,
             CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS orphan_rows
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT fk, child_rows, orphan_rows,
           round(orphan_rows * 1.0 / child_rows, 6) AS orphan_rate,
           orphan_rows = 0 AS holds
    FROM (
      SELECT 'lineitem.l_orderkey -> orders' AS fk, * FROM li
      UNION ALL SELECT 'orders.o_custkey -> customer', * FROM oc
      UNION ALL SELECT 'customer.c_nationkey -> nation', * FROM cn
    ) ORDER BY fk
    """,
    "dq",
    "audit",
    "join",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the three fact->dimension foreign
    keys (lineitem->orders, orders->customer, customer->nation): child
    row count, orphan count via a left-join null probe (one shuffle per
    FK, counted map-side after the join — never a collected orphan
    list), orphan rate, and a boolean verdict. The FK companion to
    dq_functional_dependency: FD validates intra-table determinism,
    this validates inter-table closure."""

    def probe(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, fk: str):
        joined = child.select(F.col(ckey)).join(
            parent.select(F.col(pkey)).distinct(),
            F.col(ckey) == F.col(pkey),
            "left",
        )
        return joined.agg(
            F.lit(fk).alias("fk"),
            F.count(F.lit(1)).cast("bigint").alias("child_rows"),
            F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("orphan_rows"),
        )

    li = probe(
        t(spark, sf_dir, "lineitem"), "l_orderkey",
        t(spark, sf_dir, "orders"), "o_orderkey",
        "lineitem.l_orderkey -> orders",
    )
    oc = probe(
        t(spark, sf_dir, "orders"), "o_custkey",
        t(spark, sf_dir, "customer"), "c_custkey",
        "orders.o_custkey -> customer",
    )
    cn = probe(
        t(spark, sf_dir, "customer"), "c_nationkey",
        t(spark, sf_dir, "nation"), "n_nationkey",
        "customer.c_nationkey -> nation",
    )
    return (
        li.unionAll(oc)
        .unionAll(cn)
        .select(
            "fk",
            "child_rows",
            "orphan_rows",
            F.round(F.col("orphan_rows") * 1.0 / F.col("child_rows"), 6).alias(
                "orphan_rate"
            ),
            (F.col("orphan_rows") == 0).alias("holds"),
        )
        .orderBy("fk")
    )
