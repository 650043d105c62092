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

from etl_file_sync_spark.localrel import local_rows_df

from etl_file_sync_spark.operators import search as S
from etl_file_sync_spark.operators.similarity import vec_ok
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
    q = local_rows_df(spark, [(x,) for x in _QUERY_TERMS], "term string")
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


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained CTEs (4 picks, lambda=0.7)."""
    head = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL
                 AND len(list_filter(embedding, x -> x IS NULL)) = 0
        AND len(list_filter(embedding, x -> x <> 0)) > 0),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, e.v, round(list_cosine_similarity(e.v, q.v), 4) AS rel
      FROM e, q WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id LIMIT 12
    ),
    pairs AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             round(list_cosine_similarity(a.v, b.v), 4) AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    p1 AS (SELECT vec_id, rel, rel AS mmr FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
    """
    parts, sel = [head], "SELECT vec_id FROM p1"
    for i in range(2, 5):
        parts.append(
            f""",
    s{i - 1} AS ({sel}),
    m{i} AS (
      SELECT p.aid AS vec_id, max(p.sim) AS ms
      FROM pairs p JOIN s{i - 1} s ON p.bid = s.vec_id GROUP BY 1
    ),
    sc{i} AS (
      SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * m.ms AS mmr
      FROM cand c JOIN m{i} m USING (vec_id)
      WHERE c.vec_id NOT IN (SELECT vec_id FROM s{i - 1})
    ),
    p{i} AS (SELECT vec_id, rel, mmr FROM sc{i} ORDER BY mmr DESC, vec_id LIMIT 1)"""
        )
        sel += f" UNION ALL SELECT vec_id FROM p{i}"
    union = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, rel, mmr FROM p{i}" for i in range(1, 5)
    )
    parts.append(
        f"""
    SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
           rel AS relevance, round(mmr, 6) AS mmr_score
    FROM ({union}) ORDER BY rank"""
    )
    return "".join(parts)


@register(
    "sim_mmr_rerank",
    _mmr_oracle(),
    "similarity",
    "mmr",
    "rerank",
    "rag",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified re-rank (Carbonell &
    Goldstein 1998) — the RAG serving step between ANN retrieval and the
    prompt: greedily pick results that are relevant to the query but
    dissimilar to what is already picked
    (score = λ·rel − (1−λ)·max_sim_to_selected, λ=0.7, 4 picks from a
    12-candidate pool around query vec_id 0).

    Scale shape: only the CANDIDATE stage touches the corpus (top-12 by
    quantized cosine — at fleet scale that is sim_topk_bruteforce /
    sim_topk_ivf's GEMM path; here the JVM zip_with/aggregate fold keeps
    the whole query declarative); the greedy unroll runs on the bounded
    candidate frame — each pick is an argmax over ≤12 rows, built as
    chained limit-1 plans with NO driver collect. Cosines are quantized
    to the 1e-4 grain before every comparison and ties break on vec_id,
    so both engines walk the identical greedy trajectory (same
    accepted-risk posture as operators/similarity.py ivf_assign)."""
    emb = (
        t(spark, sf_dir, "embeddings")
        # unusable vectors (NULL or NULL-element) leave the frame in
        # both engines (engine-wide embedding posture; oracle guard)
        .where(vec_ok(F.col("embedding")))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )

    def cos(a, b):
        dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        na = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
        nb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
        return dot / (F.sqrt(na) * F.sqrt(nb))

    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", F.round(cos(F.col("v"), F.col("qv")), 4).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(12)
    )
    a, b = cand.alias("a"), cand.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("aid"),
        F.col("b.vec_id").alias("bid"),
        F.round(cos(F.col("a.v"), F.col("b.v")), 4).alias("sim"),
    )
    picks = [
        cand.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "rel", F.col("rel").alias("mmr"), F.lit(1).alias("rank"))
    ]
    for i in range(2, 5):
        sel = picks[0].select("vec_id")
        for p in picks[1:]:
            sel = sel.unionByName(p.select("vec_id"))
        ms = (
            pairs.join(sel.withColumnRenamed("vec_id", "bid"), "bid")
            .groupBy(F.col("aid").alias("vec_id"))
            .agg(F.max("sim").alias("ms"))
        )
        scored = (
            cand.join(ms, "vec_id")
            .join(sel, "vec_id", "left_anti")
            .select("vec_id", "rel", (0.7 * F.col("rel") - 0.3 * F.col("ms")).alias("mmr"))
        )
        picks.append(
            scored.orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .select("vec_id", "rel", "mmr", F.lit(i).alias("rank"))
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("rank").cast("bigint").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("rel").alias("relevance"),
        F.round("mmr", 6).alias("mmr_score"),
    ).orderBy("rank")
