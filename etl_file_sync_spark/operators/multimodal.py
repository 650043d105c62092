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


# --- image-header parsing: real parsers over the binary column ---------
#
# PNG and GIF dimensions sit at spec-fixed offsets (PNG: 8-byte signature
# + IHDR length/tag puts width/height at bytes 17-24, big-endian u32;
# GIF: logical screen descriptor puts them at bytes 7-10, little-endian
# u16), so both parse with pure JVM expressions — hex/conv/substring in
# whole-stage codegen, zero Python. JPEG needs a marker WALK (SOFn floats
# behind variable-length segments), which is genuinely iterative — that
# parser is the sanctioned Arrow-batched slow path.

_PNG_SIG = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
_GIF_SIG = b"GIF89a"
_JPEG_SIG = bytes([0xFF, 0xD8, 0xFF])


def _be32(pos: int):
    return F.conv(F.hex(F.expr(f"substring(payload, {pos}, 4)")), 16, 10).cast("int")


def _le16(pos: int):
    lo = F.conv(F.hex(F.expr(f"substring(payload, {pos}, 1)")), 16, 10).cast("int")
    hi = F.conv(F.hex(F.expr(f"substring(payload, {pos + 1}, 1)")), 16, 10).cast("int")
    return hi * 256 + lo


def sniff_media_type(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-number sniffing — adds `sniffed_type` from the leading bytes
    (the format column a 100 TB media lake derives once at ingest)."""
    p = F.col(payload_col)
    head = lambda n: F.expr(f"substring({payload_col}, 1, {n})")  # noqa: E731
    return df.withColumn(
        "sniffed_type",
        F.when(head(8) == F.lit(_PNG_SIG), "image/png")
        .when(head(4) == F.lit(b"GIF8"), "image/gif")  # GIF87a and GIF89a
        .when(head(3) == F.lit(_JPEG_SIG), "image/jpeg")
        .otherwise("application/octet-stream"),
    )


def parse_png_gif_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds (width, height) parsed JVM-side for PNG/GIF payloads; null for
    formats that need the iterative JPEG walker."""
    assert payload_col == "payload", "parsers address the column by name"
    is_png = F.expr("substring(payload, 1, 8)") == F.lit(_PNG_SIG)
    is_gif = F.expr("substring(payload, 1, 4)") == F.lit(b"GIF8")
    return df.withColumn(
        "width", F.when(is_png, _be32(17)).when(is_gif, _le16(7))
    ).withColumn("height", F.when(is_png, _be32(21)).when(is_gif, _le16(9)))


def jpeg_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JPEG SOF marker walk (Arrow-batched): skip variable-length segments
    until an SOF0-SOF3 frame header, read (height, width) from it. Adds
    (width, height); null when no SOF marker is found."""

    def walk(buf: bytes) -> tuple[int | None, int | None]:
        if len(buf) < 4 or buf[:3] != _JPEG_SIG:
            return None, None
        i = 2
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None, None
            marker = buf[i + 1]
            if 0xC0 <= marker <= 0xC3:
                if i + 9 > len(buf):
                    return None, None
                h = (buf[i + 5] << 8) | buf[i + 6]
                w = (buf[i + 7] << 8) | buf[i + 8]
                return w, h
            seg_len = (buf[i + 2] << 8) | buf[i + 3]
            i += 2 + seg_len
        return None, None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(lambda p: walk(bytes(p)))
            pdf = pdf.copy()
            pdf["width"] = dims.map(lambda t: t[0]).astype("Int32")
            pdf["height"] = dims.map(lambda t: t[1]).astype("Int32")
            yield pdf

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=f"{in_schema}, width int, height int")


def synth_png(width, height):
    """Deterministic minimal PNG header (signature + IHDR) as a binary
    column expression — test/fixture builder, spec-correct layout."""
    be32 = lambda c: F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))  # noqa: E731
    return F.concat(
        F.lit(_PNG_SIG),
        F.unhex(F.lit("0000000D")),  # IHDR length 13
        F.lit(b"IHDR"),
        be32(width),
        be32(height),
        F.unhex(F.lit("0806000000")),  # bit depth/color/compress/filter/interlace
    )


def synth_gif(width, height):
    le16 = lambda c: F.unhex(  # noqa: E731
        F.concat(
            F.lpad(F.hex(c.cast("bigint") % 256), 2, "0"),
            F.lpad(F.hex(F.floor(c.cast("bigint") / 256)), 2, "0"),
        )
    )
    return F.concat(F.lit(_GIF_SIG), le16(width), le16(height), F.unhex(F.lit("F70000")))


def synth_jpeg(width, height):
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dimensions —
    enough structure that the marker walk must actually skip a segment."""
    be16 = lambda c: F.unhex(F.lpad(F.hex(c.cast("bigint")), 4, "0"))  # noqa: E731
    soi = F.unhex(F.lit("FFD8"))
    app0 = F.unhex(F.lit("FFE000104A46494600010100000100010000"))
    sof0_head = F.unhex(F.lit("FFC0001108"))
    return F.concat(
        soi, app0,
        sof0_head, be16(height), be16(width),
        F.unhex(F.lit("03012200021101031101")),
    )
