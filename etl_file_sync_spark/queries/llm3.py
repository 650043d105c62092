"""Corpus-curation queries round 2: domain mixture sampling, bigram
novelty, cross-source leakage, and per-source inspection samples.

All four are exact-arithmetic (integer counts, md5 thresholds,
integer-quantized weights) so the DuckDB oracles reproduce results
bit-for-bit — no float-sum-order hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import mix as MX
from etl_file_sync_spark.queries.registry import register, t

_MIX_BUDGET = 160


@register(
    "mix_sources_temperature",
    f"""
    WITH counts AS (
      SELECT source, count(*) AS n_total,
             CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS weight_q
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_total, weight_q,
             least(1.0, ({_MIX_BUDGET}.0 * CAST(weight_q AS DOUBLE))
                        / (CAST((SELECT sum(weight_q) FROM counts) AS DOUBLE)
                           * CAST(n_total AS DOUBLE))) AS rate
      FROM counts
    ),
    kept AS (
      SELECT d.source
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(('0x' || substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            < CAST(r.rate * 4294967296.0 AS BIGINT)
    )
    SELECT r.source, r.n_total, r.weight_q,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN (SELECT source, count(*) AS n_kept FROM kept GROUP BY source) k
      ON r.source = k.source
    ORDER BY r.source
    """,
    "mixture",
    "sampling",
    "temperature",
)
def mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 domain rebalancing: sample each source toward
    weight ∝ sqrt(count) under a global row budget, selection by
    portable md5 bucket. Output is the per-source audit (total, weight,
    rows kept) — the frame a curation run logs before materializing.
    Two narrow passes, no wide shuffle (operators/mix.py).
    """
    docs = t(spark, sf_dir, "documents")
    rates = MX.temperature_mixture_rates(docs, "source", _MIX_BUDGET)
    kept = (
        MX.temperature_mixture_sample(docs, "source", _MIX_BUDGET)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_total",
            "weight_q",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_bigram_novelty",
    """
    WITH occ AS (
      SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
                            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
             AS bigram
      FROM documents
    ),
    counts AS (SELECT bigram, count(*) AS bg_count FROM occ GROUP BY bigram),
    scored AS (
      SELECT occ.doc_id,
             count(*) AS n_bigrams,
             sum(bg_count) AS freq_sum,
             sum(CASE WHEN bg_count = 1 THEN 1 ELSE 0 END) AS n_hapax
      FROM occ JOIN counts ON occ.bigram = counts.bigram
      GROUP BY occ.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(s.freq_sum, 0) AS BIGINT) AS freq_sum,
           CAST(COALESCE(s.n_hapax, 0) AS BIGINT) AS n_hapax
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
    "text",
    "novelty",
    "ngram",
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram corpus-frequency novelty score per document — the integer
    form of an n-gram-LM quality filter: high freq_sum/n_bigrams means
    boilerplate, high n_hapax means novel text. Two partial-agg
    shuffles (operators/mix.py bigram_novelty)."""
    return MX.bigram_novelty(t(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "dedup_cross_source_leak",
    """
    SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')) AS prefix_md5,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_docs,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents
    GROUP BY prefix_md5
    HAVING count(DISTINCT source) >= 2
    ORDER BY prefix_md5
    """,
    "dedup",
    "leakage",
)
def dedup_cross_source_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source leakage audit: 5-word-prefix fingerprints appearing
    in two or more sources — the quick screen for boilerplate or eval
    text leaking across domain snapshots. One partial-agg shuffle on the
    md5 fingerprint; at 100 TB this is the same shape as exact dedup
    (hash-groupBy), and the prefix keeps the key narrow regardless of
    document length."""
    docs = t(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5))
    return (
        docs.select(F.md5(prefix).alias("prefix_md5"), "source")
        .groupBy("prefix_md5")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        )
        .filter(F.col("n_sources") >= 2)
        .orderBy("prefix_md5")
    )


@register(
    "sample_topk_per_source",
    """
    SELECT doc_id, source, rk
    FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(concat_ws(':', source, CAST(doc_id AS VARCHAR))), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    )
    WHERE rk <= 5
    ORDER BY source, rk
    """,
    "sampling",
    "window",
)
def sample_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-source inspection sample: rank rows inside
    each source by a portable md5 shuffle key and keep the first five —
    the 'show me a random-but-reproducible handful per domain' query
    every curation review needs. Window per source; at scale the rank
    is bounded per group so AQE's skew handling applies, and k rows per
    partition survive — no global sort, no driver collect."""
    docs = t(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 5)
        .orderBy("source", "rk")
    )


@register(
    "text_unigram_ppl",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY doc_id, term
    ),
    model AS (
      SELECT term, count(*) AS n FROM toks WHERE term <> '' GROUP BY term
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM model)
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           round(sum(tf.tf * ln(model.n / tot.total)) / sum(tf.tf), 4) AS avg_logp,
           round(exp(-(sum(tf.tf * ln(model.n / tot.total)) / sum(tf.tf))), 2) AS ppl
    FROM tf JOIN model ON tf.term = model.term CROSS JOIN tot
    GROUP BY tf.doc_id
    ORDER BY tf.doc_id
    """,
    "quality",
    "perplexity",
    "unigram",
)
def text_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy per document: train corpus unigram
    probabilities (two partial-agg passes), score each doc by mean token
    log-likelihood, report ppl = exp(-avg_logp). The cheapest quality
    gate a pretraining pipeline runs before a real LM scorer — rare-token
    spam scores high-ppl, templated boilerplate low-ppl. All JVM
    expressions; the model join broadcasts at this vocab and
    shuffle-hashes on term at web scale (operators/text.py
    unigram_doc_scores)."""
    from etl_file_sync_spark.operators.text import unigram_doc_scores

    docs = t(spark, sf_dir, "documents")
    return unigram_doc_scores(docs).select(
        F.col("id").alias("doc_id"), "n_tokens", "avg_logp", "ppl"
    ).orderBy("doc_id")


@register(
    "dedup_paragraph_segments",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    segs AS (
      SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
             array_to_string(toks[i*20+1 : i*20+20], ' ') AS seg
      FROM base, LATERAL (SELECT unnest(range(CAST(floor(len(toks) / 20) AS BIGINT))) AS i)
    ),
    flagged AS (
      SELECT doc_id, seg_idx,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) > 1 AS dup
      FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) * 20 AS BIGINT) AS tokens_removed,
           round(sum(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup",
    "paragraph",
    "segments",
)
def dedup_paragraph_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-grain (20-token segment) dedup audit — the linear-time
    CCNet-style pass pretraining pipelines run before any fuzzy doc
    matching. First occurrence by (doc_id, seg_idx) is canonical; later
    copies count as removable boilerplate. One shuffle on the segment
    text + one partial agg (operators/dedup.py paragraph_dup_stats)."""
    from etl_file_sync_spark.operators.dedup import paragraph_dup_stats

    docs = t(spark, sf_dir, "documents")
    return (
        paragraph_dup_stats(docs)
        .select(F.col("id").alias("doc_id"), "n_segs", "n_dup_segs", "tokens_removed", "dup_frac")
        .orderBy("doc_id")
    )
