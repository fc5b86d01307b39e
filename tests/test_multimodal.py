"""Real image-header decoding (round-2 verdict item 5): the parser is
pinned against hand-crafted KNOWN bytes (independent of the payload
generator, so a matched generator/parser bug pair cannot cancel out),
then the distributed mapInPandas path is checked end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.multimodal import (
    image_header_features,
    make_gif_header,
    make_jpeg_header,
    make_png_header,
    parse_image_header,
    synth_image_payload,
)

# The smallest well-known PNG: 1x1, bit depth 1, color type 0 (grayscale).
_KNOWN_PNG_1X1 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000101000000003a7e9b55"
)
# Minimal JPEG: SOI + SOF0 (precision 8, height 0x0010=16, width 0x0020=32,
# 3 components) + EOI, segment length 8+3*3=17 -> 0x11.
_KNOWN_JPEG = bytes.fromhex("ffd8ffc00011080010002003011100021100031100ffd9")
# GIF89a, width 2 LE (0200), height 3 LE (0300).
_KNOWN_GIF = bytes.fromhex("4749463839610200030000")


def test_parse_known_png():
    assert parse_image_header(_KNOWN_PNG_1X1) == ("png", 1, 1, 1)


def test_parse_known_jpeg():
    assert parse_image_header(_KNOWN_JPEG) == ("jpeg", 32, 16, 3)


def test_parse_known_jpeg_skips_leading_segments():
    """SOF0 found behind an APP0 segment (the common JFIF layout)."""
    b = make_jpeg_header(640, 480)
    assert b[2:4] == b"\xff\xe0"  # APP0 precedes SOF0
    assert parse_image_header(b) == ("jpeg", 640, 480, 3)


def test_parse_known_gif():
    assert parse_image_header(_KNOWN_GIF) == ("gif", 2, 3, None)


def test_parse_known_bmp():
    import struct

    b = b"BM" + b"\x00" * 16 + struct.pack("<ii", 123, -45)
    assert parse_image_header(b) == ("bmp", 123, 45, None)


def test_parse_garbage_and_truncated():
    assert parse_image_header(b"not an image") == (None, None, None, None)
    assert parse_image_header(b"") == (None, None, None, None)
    assert parse_image_header(_KNOWN_PNG_1X1[:10]) == (None, None, None, None)
    # JPEG magic but no SOF before EOI: recognized, dims unknown
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("jpeg", None, None, None)


def test_makers_produce_spec_valid_headers():
    assert parse_image_header(make_png_header(800, 600)) == ("png", 800, 600, 4)
    assert parse_image_header(make_png_header(5, 7, color_type=2)) == ("png", 5, 7, 3)
    assert parse_image_header(make_jpeg_header(1, 65535)) == ("jpeg", 1, 65535, 3)
    assert parse_image_header(make_gif_header(320, 200)) == ("gif", 320, 200, None)
    # PNG CRC is the real spec CRC32 (a strict decoder would accept it)
    import struct
    import zlib

    b = make_png_header(9, 9)
    chunk = b[12:29]  # "IHDR" + 13-byte payload
    assert b[29:33] == struct.pack(">I", zlib.crc32(chunk))


def test_distributed_header_decode(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i) for i in range(50)], schema="doc_id bigint"
    )
    out = image_header_features(synth_image_payload(df)).collect()
    assert len(out) == 50
    by_id = {r["doc_id"]: r for r in out}
    for i in (0, 1, 2, 33):
        r = by_id[i]
        assert r["fmt"] == ["png", "jpeg", "gif"][i % 3]
        assert r["width"] == 16 + (i * 7) % 640
        assert r["height"] == 16 + (i * 13) % 480
