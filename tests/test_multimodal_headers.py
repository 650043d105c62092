"""Independent validation of the image-header parsers: payloads packed
with struct (not the engine's own synth_* builders), plus garbage and
truncation cases."""

from __future__ import annotations

import struct
import zlib

import pytest

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


# --- real pixel decode: BMP / PPM -------------------------------------


def _hand_bmp_2x2() -> bytes:
    """Hand-packed 2×2 24bpp BMP, independent of encode_bmp. Image
    (top-first) rows: [(255,0,0), (0,255,0)] / [(0,0,255), (9,8,7)].
    Stored bottom-up, BGR, rows padded 6→8 bytes."""
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0
    )
    bottom_row = bytes([255, 0, 0, 7, 8, 9]) + b"\x00\x00"  # BGR of (0,0,255),(9,8,7)
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # BGR of (255,0,0),(0,255,0)
    return header + bottom_row + top_row


def test_decode_bmp_hand_packed_bytes():
    img = M.decode_bmp(_hand_bmp_2x2())
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [9, 8, 7]


def test_decode_ppm_hand_packed_bytes():
    buf = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    img = M.decode_ppm(buf)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [1, 2, 3] and img[0, 1].tolist() == [4, 5, 6]


def test_codec_round_trip_and_reject_paths():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # 7*3=21 → 3 pad bytes
    assert np.array_equal(M.decode_bmp(M.encode_bmp(img)), img)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)
    assert M.decode_bmp(b"BM too short") is None
    assert M.decode_ppm(b"P6\n2 2\n255\n\x00") is None  # truncated raster
    assert M.decode_image(b"garbage") is None
    # header-only PNG (no IDAT): the real decoder reports undecodable
    assert M.decode_image(_png(4, 4)) is None


def test_image_pixel_stats_null_row_for_undecodable(spark):
    rows = [(0, bytearray(M.synth_pixel_image(0, 4, 3, "bmp"))), (1, bytearray(b"nope"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in M.image_pixel_stats(df).collect()}
    assert got[0].width == 4 and got[0].height == 3 and got[0].sum_r is not None
    assert got[1].width is None and got[1].sum_r is None


def _png_forward_filter(img, ftypes):
    """Spec forward filters (the encoder side of filters 1-4) applied per
    scanline — an INDEPENDENT spelling the decoder's unfilter must invert."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    bpp = ch
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        line = bytearray(img[y].tobytes())
        ft = ftypes[y % len(ftypes)]
        out = bytearray(line)
        for x in range(w * ch):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                out[x] = (line[x] - a) & 0xFF
            elif ft == 2:
                out[x] = (line[x] - b) & 0xFF
            elif ft == 3:
                out[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                out[x] = (line[x] - M._png_paeth(a, b, c)) & 0xFF
        raw += bytes([ft]) + bytes(out)
        prev = bytes(line)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        M._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_decoder_inverts_all_five_filters():
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    # every scanline uses a different filter type, cycling 0..4
    buf = _png_forward_filter(img, ftypes=[0, 1, 2, 3, 4])
    got = M.decode_png(buf)
    assert np.array_equal(got, img), "unfilter must invert None/Sub/Up/Average/Paeth"


def test_png_roundtrip_and_rgba_and_rejects():
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_png(M.encode_png(img)), img)
    # RGBA (color type 6): alpha plane must be dropped, RGB preserved
    rgba = np.dstack([img, np.full((6, 5), 200, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(6))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    buf = (
        M._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(M.decode_png(buf), img)
    # 16-bit depth and interlaced streams are out of scope -> None
    buf16 = (
        M._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 16, 2, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    assert M.decode_png(buf16) is None
    assert M.decode_png(b"\x89PNG garbage") is None
    # decode_image dispatch: PNG decodes; a header-only JPEG (no scan
    # data) is undecodable → None from the real baseline decoder
    assert M.decode_image(M.encode_png(img)) is not None
    assert M.decode_image(_jpeg(4, 4)) is None


def test_gif_lzw_decoder_against_hand_computed_codes():
    """Hand-derived LZW stream (independent of encode_gif): palette bits
    N=2, pixels [0,1,2] encode to codes [clear=4, 0, 1, 2, end=5]. The
    decoder's table lags the encoder by one entry, so its width bump
    3→4 lands only after processing code 2 — the end code is the first
    4-bit read. LSB-first packing gives exactly bytes 0x44 0x54."""
    import struct

    import numpy as np

    pal = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 9, 9, 9])  # 4 entries
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x80 | 0x01, 0, 0)  # GCT, 4 colors
        + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2])  # LZW min code size
        + bytes([2, 0x44, 0x54, 0])  # one 2-byte sub-block + terminator
        + b"\x3b"
    )
    from etl_file_sync_spark.operators.multimodal import decode_gif

    img = decode_gif(gif)
    assert img.shape == (1, 3, 3)
    assert img[0].tolist() == [[10, 0, 0], [0, 20, 0], [0, 0, 30]]


def test_gif_roundtrip_interlace_and_rejects():
    import numpy as np

    from etl_file_sync_spark.operators import multimodal as M2

    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, size=(30, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 30, size=(11, 6))]
    assert np.array_equal(M2.decode_gif(M2.encode_gif(img)), img)
    # interlaced: permute rows per the 4-pass schedule and set the flag
    buf = bytearray(M2.encode_gif(img))
    # find image descriptor (0x2C after header+GCT) and set interlace bit
    # easier: re-encode via the interlace row order manually
    rows = (
        list(range(0, 11, 8)) + list(range(4, 11, 8))
        + list(range(2, 11, 4)) + list(range(1, 11, 2))
    )
    inter = img[rows]  # rows stored in interlace order
    raw = bytearray(M2.encode_gif(inter))
    # image descriptor flag byte: 6 (sig) + 7 (screen) + 256*3? — locate 0x2C
    pos = raw.index(0x2C)
    raw[pos + 9] |= 0x40
    got = M2.decode_gif(bytes(raw))
    assert np.array_equal(got, img), "4-pass interlace must reorder back"
    assert M2.decode_gif(b"GIF89a\x00") is None
    assert M2.decode_image(M2.encode_gif(img)) is not None
