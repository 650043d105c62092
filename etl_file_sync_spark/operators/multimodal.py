"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct —
exactly how a 100 TB multimodal corpus is laid out in parquet. The
Spark-side plumbing (schemas, batch iteration, partition sizing) is real;
the actual codec step is stubbed (pillow/ffmpeg are not in this
container) behind `decode_stub`, which produces a deterministic fake
feature vector so the pipeline stays testable end-to-end.

mapInPandas is the right shape here: Arrow-batched, per-partition
iterator, no row-at-a-time pickling — the sanctioned slow path for
logic Spark expressions can't state.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta STRUCT<byte_len: BIGINT, sha256: STRING, width: INT, height: INT>"
)

FEATURE_SCHEMA = "doc_id BIGINT, media_type STRING, byte_len BIGINT, feature ARRAY<DOUBLE>"


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary media column from text (deterministic stand-in
    for real image/audio bytes) with typed metadata — pure JVM expressions."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("bigint").alias("byte_len"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB for the real media decode/feature-extract step.

    A real deployment would decode with pillow/torchaudio/ffmpeg here;
    those libs are absent, so we derive a deterministic fake feature from
    the payload digest. Raise NotImplementedError for media types we would
    never fake (video frame sampling).
    """
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(df: DataFrame, dim: int = 8, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The mapInPandas iterator sees whole Arrow batches — the same shape a
    real GPU-decode stage would consume. Schema/partitioning/batching are
    production-real; only `decode_stub` is fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(lambda p: decode_stub(bytes(p), dim)),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: real implementations need ffmpeg.

    Kept as an explicit NotImplementedError so the API surface exists and
    the gap is honest.
    """
    raise NotImplementedError("video frame sampling requires ffmpeg; not available in this environment")
