"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (100 TB):
- exact dedup is one hash-shuffle on a 64-char digest — the canonical
  groupBy; AQE splits skewed digests (identical boilerplate docs).
- pairwise Jaccard only ever runs on CANDIDATE pairs. The all-pairs
  verifier below is for oracle-checkable correctness at small SF; the
  scale path is MinHash→LSH banding→bucket equi-join, which shuffles
  (band_id, band_hash) instead of O(n²) pairs.
- everything is built-in expressions (xxhash64, array ops, bit ops) — no
  Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_file_sync_spark.operators.text import normalize_text


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group exact duplicates by content digest; keep the min id as canonical.

    Returns (keep_id, n_copies) — one row per distinct content.
    """
    return (
        df.select(F.col(id_col), F.sha2(normalize_text(text_col), 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Return df with exact duplicates removed (min-id row survives)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")).where(
        F.length("shingle") > 0
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All candidate pairs with shingle-Jaccard >= threshold (id_a < id_b).

    Exact verifier: join on shared shingles, count common, divide by union
    size. Output: (id_a, id_b, jaccard). At scale, feed this only LSH
    candidates (see minhash_lsh_candidates); with a selective shingle space
    the shared-shingle join is itself the pruning step.

    Per-doc set sizes ride along as a window count over the shingle rows,
    so the plan is ONE self-join + one aggregation — no extra size joins.
    The shingle frame is cached for the self-join's two scans (small:
    |docs|·|shingles| rows; a 100 TB run would checkpoint it instead).
    """
    from pyspark.sql import Window as W

    sh = shingles(df, id_col, text_col, n).withColumn(
        "n_sh", F.count(F.lit(1)).over(W.partitionBy("id"))
    ).cache()
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, num_perm: int = 64
) -> DataFrame:
    """MinHash signatures: num_perm seeded xxhash64 min-hashes per doc.

    One explode + one groupBy(id) with num_perm min() aggregates — a single
    shuffle on the doc id, partial-aggregated map-side. Returns
    (id, sig ARRAY<BIGINT>[num_perm]).
    """
    sh = shingles(df, id_col, text_col, n)
    aggs = [F.min(F.xxhash64(F.col("shingle"), F.lit(p))).alias(f"h{p}") for p in range(num_perm)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("sig"))


def minhash_lsh_candidates(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    Shuffles on (band, band_hash) — the scale-out alternative to all-pairs.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    num_perm = bands * rows_per_band
    band_cols = [
        F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig_df.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bhash")) for b in range(bands)])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash near-dup pipeline: signatures → LSH candidates →
    signature-similarity estimate filter. Returns (id_a, id_b, est_jaccard).
    """
    sig = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    cand = minhash_lsh_candidates(sig, bands, num_perm // bands)
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)) / F.lit(num_perm)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens (xxhash64 token hashes).

    Per doc: majority vote per bit position of token hashes. Computed as
    one explode + one groupBy(id) with `bits` signed-count aggregates —
    all JVM bit-ops, partial-aggregated. Returns (id, simhash BIGINT).
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = toks.withColumn("th", F.xxhash64("tok"))
    bit_aggs = [
        F.sum(F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = h.groupBy("id").agg(*bit_aggs)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint") * F.lit(2**i if i < 63 else -(2**63))).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return votes.select("id", sim.alias("simhash"))


def simhash_near_pairs(sim_df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs via 4×16-bit block banding.

    Pigeonhole: hamming <= 3 over 64 bits => at least one of the four
    16-bit blocks is identical; equi-join on (block_idx, block_value)
    finds all such candidates without the O(n²) pair space, then
    bit_count(XOR) verifies. Returns (id_a, id_b, hamming).
    """
    blocks = sim_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bval"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bval").alias("bval"))
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_dup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.9
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold (id_a < id_b).

    All-pairs verifier: the full normalized matrix is broadcast and each
    Arrow batch GEMMs against it (one n_batch×n_corpus BLAS call instead
    of n² interpreted expressions). Fine up to ~100k vectors; beyond
    that, generate candidates with LSH/IVF first (operators.similarity)
    and verify only the candidate pairs.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    ids = np.array([r.id for r in rows], dtype=np.int64)
    M = np.array([list(r.v) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bM = spark.sparkContext.broadcast((ids, Mn))

    def pairs(batches):
        all_ids, all_mat = bM.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["v"].tolist(), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ all_mat.T  # (batch, corpus)
            bid = pdf["id"].values
            rows_i, cols_j = np.where(S >= threshold)
            keep = bid[rows_i] < all_ids[cols_j]
            yield pd.DataFrame(
                {
                    "id_a": bid[rows_i][keep],
                    "id_b": all_ids[cols_j][keep],
                    "cosine": S[rows_i, cols_j][keep],
                }
            )

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    out = v.mapInPandas(pairs, "id_a long, id_b long, cosine double")
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
