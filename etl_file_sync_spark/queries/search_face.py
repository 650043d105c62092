"""Full-text search queries: inverted-index stats, BM25 retrieval,
TF-IDF keyword extraction — the lexical-retrieval face over `documents`.

All three are oracle-checked: the scoring math is restated in ANSI SQL
(DuckDB) and rounded so last-ulp float noise cannot flip a value or a
rank (ranks order by round(score, 6) with an id/term tie-break in BOTH
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import search as S
from etl_file_sync_spark.queries.registry import register, t

_QUERY_TERMS = ["spark", "window", "merge"]
_QLIST = "['spark', 'window', 'merge']"


@register(
    "search_posting_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(max(tf) AS BIGINT) AS max_tf
    FROM tf
    WHERE term IN (SELECT unnest({_QLIST}))
    GROUP BY term
    ORDER BY term
    """,
    "search",
    "inverted-index",
)
def search_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics (document frequency, total/max term
    frequency) for a probe term set — the index-health view a retrieval
    stack exposes. Build is the canonical postings shuffle
    (operators/search.py postings); stats are a second partial agg over
    the (already tiny) probed lists."""
    docs = t(spark, sf_dir, "documents")
    q = spark.createDataFrame([(x,) for x in _QUERY_TERMS], "term string")
    post = S.postings(docs).join(F.broadcast(q), "term")
    return (
        post.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.max("tf").alias("max_tf"),
        )
        .orderBy("term")
    )


@register(
    "search_bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    ),
    dl AS (
      SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    q AS (SELECT unnest({_QLIST}) AS term),
    scored AS (
      SELECT tf.doc_id,
             sum( ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                  * (tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
      FROM tf
      JOIN q ON tf.term = q.term
      JOIN dft ON tf.term = dft.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS bm25,
           CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS INTEGER) AS rnk
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    "search",
    "bm25",
    "topk",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a bag-of-words query (k1=1.2, b=0.75,
    Lucene-style idf). Postings are semi-filtered to the broadcast query
    terms before any join — only the touched posting lists move — and
    the final top-k is TakeOrderedAndProject. See operators/search.py
    for the 100 TB shape (term-bucketed postings)."""
    docs = t(spark, sf_dir, "documents")
    return S.bm25_topk(docs, _QUERY_TERMS, k=10)


@register(
    "search_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / dft.df) AS tfidf
      FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
      WHERE tf.doc_id < 40
    )
    SELECT doc_id, term, round(tfidf, 4) AS tfidf, trank FROM (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY round(tfidf, 6) DESC, term) AS INTEGER) AS trank
      FROM scored
    ) WHERE trank <= 3
    ORDER BY doc_id, trank
    """,
    "search",
    "tfidf",
)
def search_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (docs 0-39) — the per-doc
    keyword extraction primitive. Window ranks break ties on the term
    string so both engines emit identical rows."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    # df/idf must come from the FULL corpus, not the 40-doc slice
    full = t(spark, sf_dir, "documents")
    post = S.postings(full)
    dft = S.term_doc_freq(post)
    n_docs = full.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    from pyspark.sql import Window as W

    scored = (
        S.postings(docs)
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy("id").orderBy(F.round("tfidf", 6).desc(), F.col("term"))
    return (
        scored.withColumn("trank", F.row_number().over(w))
        .filter(F.col("trank") <= 3)
        .select(F.col("id").alias("doc_id"), "term", F.round("tfidf", 4).alias("tfidf"), "trank")
        .orderBy("doc_id", "trank")
    )
