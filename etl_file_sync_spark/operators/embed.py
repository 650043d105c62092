"""Deterministic text embeddings via the hashing trick (feature hashing).

No model weights exist in this environment, so the engine supplies the
classic model-free embedding: token → xxhash64 → bucket index, signed by
a second hash bit, counts L2-normalized. Deterministic, vocabulary-free,
streamable — and the output is a real ARRAY<DOUBLE> column that feeds
directly into the similarity/dedup operators (cosine_topk, ivf_topk,
embedding_dup_pairs), closing the text→vector loop without ML libs.

All JVM expressions: explode → per-(doc, bucket) signed counts → pivot to
a dense array via array building over a map — one shuffle on the doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Add an `embedding ARRAY<DOUBLE>` (L2-normalized, `dim` buckets)."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")).where(
        F.length("tok") > 0
    )
    h = F.xxhash64("tok")
    signed = toks.select(
        "id",
        F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
        # second, independent hash bit decides the sign (reduces bias)
        F.when(F.pmod(F.xxhash64("tok", F.lit(1)), F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sign"),
    )
    counts = signed.groupBy("id", "bucket").agg(F.sum("sign").alias("w"))
    vecs = counts.groupBy("id").agg(F.map_from_arrays(F.collect_list("bucket"), F.collect_list("w")).alias("m"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
    )
    norm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda acc, v: acc + v * v))
    out = vecs.select(
        F.col("id").alias(id_col),
        F.transform(dense, lambda v: v / F.greatest(norm, F.lit(1e-12))).alias("embedding"),
    )
    return df.join(out, id_col, "left")
