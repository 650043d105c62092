"""Independent validation of the image-header parsers: payloads packed
with struct (not the engine's own synth_* builders), plus garbage and
truncation cases."""

from __future__ import annotations

import struct
import zlib

from etl_file_sync_spark.operators import multimodal as M


def _png(w, h):
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    ihdr += struct.pack(">I", zlib.crc32(ihdr[4:]))
    return b"\x89PNG\r\n\x1a\n" + ihdr


def _gif(w, h, ver=b"GIF89a"):
    return ver + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # a COM segment before SOF0 forces the walker to skip two segments
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + com + sof


def test_parsers_on_independently_packed_bytes(spark):
    rows = [
        (0, bytearray(_png(640, 480))),
        (1, bytearray(_gif(320, 200))),
        (2, bytearray(_gif(12, 34, b"GIF87a"))),
        (3, bytearray(_jpeg(1920, 1080))),
        (4, bytearray(b"not an image at all")),
        (5, bytearray(b"\x89PNG")),  # truncated signature
    ]
    df = M.sniff_media_type(spark.createDataFrame(rows, "doc_id long, payload binary"))
    got = {r.doc_id: r.sniffed_type for r in df.collect()}
    assert got == {
        0: "image/png", 1: "image/gif", 2: "image/gif", 3: "image/jpeg",
        4: "application/octet-stream", 5: "application/octet-stream",
    }
    jvm = {r.doc_id: (r.width, r.height)
           for r in M.parse_png_gif_dims(df.filter("doc_id in (0,1,2)")).collect()}
    assert jvm == {0: (640, 480), 1: (320, 200), 2: (12, 34)}
    jw = {r.doc_id: (r.width, r.height) for r in M.jpeg_dims(df.filter("doc_id in (3,4)")).collect()}
    assert jw[3] == (1920, 1080)
    assert jw[4] == (None, None)


def test_jpeg_walker_handles_truncated_stream(spark):
    # SOI + APP0 cut mid-segment: walker must return nulls, not crash
    buf = _jpeg(10, 10)[:8]
    df = spark.createDataFrame([(0, bytearray(buf))], "doc_id long, payload binary")
    r = M.jpeg_dims(df).collect()[0]
    assert r.width is None and r.height is None
