"""UDF surface: Arrow-vectorized pandas UDFs, grouped applyInPandas, and
a Python UDTF — the engine's user-extension points (the reference's only
analogue is the TransferFactory.register plugin hook, base.py:78-86).

Each query computes something an ANSI-SQL oracle can restate, so the UDF
machinery itself is value-checked, not just smoke-tested. Python logic
here is Arrow-batched (never row-at-a-time pickling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.queries.registry import register, t

# BPE-ish word/number/punctuation tokenizer (shared by UDF and oracle).
TOKEN_RE = r"[a-z]+|[0-9]+"


@register(
    "udf_pandas_token_count",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(
             translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                             'abcdefghijklmnopqrstuvwxyz'),
             '{TOKEN_RE}')) AS INTEGER) AS n_re_tokens,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents ORDER BY doc_id
    """,
    "udf",
    "pandas-udf",
    "text",
)
def udf_pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting in a scalar pandas UDF (Arrow-batched).

    The built-in regexp functions would beat this in production — the
    point is validating the Python-worker path end-to-end against the
    same computation stated in SQL. Case folding is the ASCII contract
    (Python str.lower() maps 'İ' to 'i'+U+0307, splitting a token that
    utf8proc's 'i' keeps whole — operators/text.py ascii_lower)."""
    import re

    pat = re.compile(TOKEN_RE)
    fold = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    )

    @F.pandas_udf("int")
    def n_tokens(s: pd.Series) -> pd.Series:
        # NULL text -> NULL count (regexp_extract_all(NULL) is NULL in
        # the oracle); nullable Int32 keeps the Arrow type integral
        return s.map(
            lambda x: len(pat.findall(x.translate(fold))) if isinstance(x, str) else None
        ).astype("Int32")

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_re_tokens"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "udf_grouped_zscore",
    """
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS chars_z
    FROM documents ORDER BY doc_id
    """,
    "udf",
    "applyInPandas",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score via grouped applyInPandas (pandas per group).

    pandas std(ddof=1) == SQL stddev_samp; the oracle restates the same
    normalization with window functions."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["n_chars"]
        pdf["chars_z"] = ((s - s.mean()) / s.std(ddof=1)).round(4)
        return pdf[["doc_id", "lang", "chars_z"]]

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(zscore, schema="doc_id long, lang string, chars_z double").orderBy(
        "doc_id"
    )


@register(
    "udtf_word_expand",
    """
    SELECT doc_id, word, CAST(pos AS INTEGER) AS pos
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM documents WHERE doc_id < 20)
    ORDER BY doc_id, pos
    """,
    "udf",
    "udtf",
)
def udtf_word_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row per (word, position) — the table-function
    extension point (posexplode restated as a UDTF so the arrow-UDTF
    machinery is exercised and value-checked)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class WordExpand:
        def eval(self, text: str):
            if text is None:  # unnest(NULL) yields no rows in the oracle
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1

    spark.udtf.register("word_expand", WordExpand)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, w.word AS word, w.pos AS pos
        FROM docs_udtf, LATERAL word_expand(text) AS w
        ORDER BY doc_id, pos
        """
    )


@register(
    "udaf_geometric_mean",
    """
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price,
           count(*) AS n
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    """,
    "udf",
    "udaf",
)
def udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True custom UDAF: pandas GROUPED_AGG computing a geometric mean
    per group (Arrow-batched, partial-aggregation-free — the pandas UDAF
    path). Oracle restates it as exp(avg(ln(x)))."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # pandas UDAFs cannot mix with JVM aggregates in one agg — the
        # count rides the same Arrow path
        return len(v)

    l = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return l.groupBy("l_returnflag").agg(
        F.round(geo_mean("l_extendedprice"), 4).alias("geo_mean_price"),
        n_rows("l_extendedprice").alias("n"),
    )


@register(
    "udf_cogroup_reconcile",
    """
    WITH li AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS lineitem_revenue_e4,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
           round(o.o_totalprice, 2) AS order_total,
           CAST(COALESCE(li.lineitem_revenue_e4, 0) AS BIGINT) AS lineitem_revenue_e4,
           CAST(COALESCE(li.n_lines, 0) AS INTEGER) AS n_lines
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    WHERE o.o_custkey < 200
    ORDER BY orderkey
    """,
    "udf",
    "cogroup",
    "applyInPandas",
)
def udf_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: orders and lineitems cogrouped on a
    64-way hash BUCKET of the order key, reconciled inside each bucket
    with one vectorized pandas groupby+join (header total vs summed line
    revenue) — the two-sided Arrow UDF surface (GroupedData.cogroup),
    distinct from single-input applyInPandas. Cogroup shuffles BOTH
    sides once; bucket grain amortizes the per-group Python round-trip
    over thousands of orders (per-order grain costs ~ms per key). The oracle restates it as a
    grouped left join. Revenue is reconciled in integer 1e-4-dollar
    units (prices/discounts are exact 2-decimal values) so the sum is
    order-independent and bit-identical across engines — a float
    round(sum(...), 2) can land on opposite sides of a half-cent
    boundary depending on summation order."""

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # One invocation per BUCKET, not per order: the merge inside is a
        # vectorized pandas groupby+join over every order in the bucket.
        if len(left) == 0:
            return pd.DataFrame(
                columns=["orderkey", "custkey", "order_total", "lineitem_revenue_e4", "n_lines"]
            )
        if len(right):
            cents = np.rint(right["l_extendedprice"].to_numpy() * 100).astype("int64")
            disc = np.rint(right["l_discount"].to_numpy() * 100).astype("int64")
            li = pd.DataFrame(
                {"orderkey": right["l_orderkey"].to_numpy(), "rev": cents * (100 - disc)}
            )
            agg = li.groupby("orderkey", sort=False).agg(
                lineitem_revenue_e4=("rev", "sum"), n_lines=("rev", "size")
            )
        else:
            agg = pd.DataFrame(columns=["lineitem_revenue_e4", "n_lines"])
        out = (
            left.rename(
                columns={"o_orderkey": "orderkey", "o_custkey": "custkey", "o_totalprice": "order_total"}
            )
            .drop(columns=["bucket"])
            .join(agg, on="orderkey")
        )
        out["order_total"] = out["order_total"].round(2)
        out["lineitem_revenue_e4"] = out["lineitem_revenue_e4"].fillna(0).astype("int64")
        out["n_lines"] = out["n_lines"].fillna(0).astype("int32")
        return out

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    # push the order-side predicate to the lineitem side with a broadcast
    # semi-join BEFORE cogrouping: cogroup materializes a Python group for
    # every key on EITHER side, so an unfiltered right side invokes the
    # pandas function once per order in the whole table (~30x more groups
    # than survive the filter) just to emit empty frames. At 100 TB the
    # rule is the same — cogroup only what both sides need.
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount").join(
        F.broadcast(o.select(F.col("o_orderkey").alias("l_orderkey"))), "l_orderkey", "left_semi"
    )
    # Cogroup at BUCKET grain (hash of the key mod 64), not per order:
    # cogrouped applyInPandas pays one Python round-trip per group, so
    # per-order groups cost ~ms each while per-bucket groups amortize
    # thousands of orders into one vectorized pandas merge. Same output,
    # same co-shuffle; this is the grain a 100 TB cogroup must use.
    ob = o.withColumn("bucket", F.pmod(F.xxhash64("o_orderkey"), F.lit(64)))
    lb = l.withColumn("bucket", F.pmod(F.xxhash64("l_orderkey"), F.lit(64)))
    out = ob.groupBy("bucket").cogroup(lb.groupBy("bucket")).applyInPandas(
        reconcile,
        schema="orderkey long, custkey long, order_total double, lineitem_revenue_e4 long, n_lines int",
    )
    return out.orderBy("orderkey")
