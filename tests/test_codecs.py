"""Byte-level codec tests (operators/codecs.py): BMP, GIF LZW, WAV.

Policy (same as the PNG decoder): every decoder is pinned against
HAND-COMPUTED known bytes, not just encoder round-trips, so a matching
encoder/decoder bug pair cannot cancel.
"""

from __future__ import annotations

import struct

import pytest

from arcane_stream_parquet_spark.operators.codecs import (
    decode_bmp_pixels,
    decode_gif_pixels,
    encode_bmp,
    encode_gif,
    encode_wav,
    gray_palette,
    lzw_decode,
    lzw_encode,
    parse_gif,
    parse_wav,
    wav_features,
)

# ---------------------------------------------------------------------------
# BMP


def _hand_bmp_2x2() -> bytes:
    """A 2x2 24-bit bottom-up BMP built field-by-field BY HAND.
    Logical image (top row first): (255,0,0) (0,255,0) / (0,0,255)
    (10,20,30). Bottom-up storage → file rows are logical rows
    reversed; pixels stored BGR; stride 6 padded to 8."""
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    bottom_row = bytes([255, 0, 0, 30, 20, 10]) + b"\x00\x00"  # logical row 1
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # logical row 0
    return header + info + bottom_row + top_row


def test_bmp_decode_hand_bytes():
    w, h, nch, rgb = decode_bmp_pixels(_hand_bmp_2x2())
    assert (w, h, nch) == (2, 2, 3)
    assert rgb == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def test_bmp_roundtrip_both_orientations():
    rgb = bytes(range(5 * 3 * 3))  # 5x3
    for top_down in (False, True):
        out = decode_bmp_pixels(encode_bmp(5, 3, rgb, top_down=top_down))
        assert out == (5, 3, 3, rgb)


def test_bmp_32bit_hand_bytes():
    # 1x1 top-down 32-bit: stored BGRA = (4, 3, 2, 9) → RGBA (2, 3, 4, 9)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 0, 4, 0, 0, 0, 0)
    w, h, nch, rgba = decode_bmp_pixels(header + info + bytes([4, 3, 2, 9]))
    assert (w, h, nch) == (1, 1, 4)
    assert rgba == bytes([2, 3, 4, 9])


def test_bmp_rejects_compressed_and_paletted():
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    rle = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 1, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="compression"):
        decode_bmp_pixels(header + rle + b"\x00" * 16)
    pal8 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp_pixels(header + pal8 + b"\x00" * 16)


# ---------------------------------------------------------------------------
# GIF LZW


def test_lzw_decode_hand_bytes():
    # min_code_size=2 → clear=4, end=5, width starts at 3 bits.
    # Codes 4,1,6,1,5 packed LSB-first = bytes 0x8C 0x53; code 6 is the
    # table entry (1,1) added after the first literal — decodes to
    # 1,1,1,1 (hand-packed, see bit layout in the round-4 notes).
    assert lzw_decode(2, bytes([0x8C, 0x53])) == b"\x01\x01\x01\x01"


def test_lzw_kwkwk_case():
    # 'aaa' pattern forces code == next-free-slot on the decode side
    stream = lzw_encode(2, b"\x01\x01\x01")
    assert lzw_decode(2, stream) == b"\x01\x01\x01"


def test_lzw_roundtrip_long_and_width_growth():
    # long enough that the code width grows past its initial size and
    # the dictionary sees repeats, runs, and fresh material
    data = bytes((i * 7 + (i >> 3)) % 256 for i in range(10_000))
    assert lzw_decode(8, lzw_encode(8, data)) == data
    runs = b"\x05" * 5000 + bytes(range(256)) * 4
    assert lzw_decode(8, lzw_encode(8, runs)) == runs


def test_lzw_table_overflow_reset():
    # enough distinct material to push next_code to 4096 → encoder must
    # emit clear + reset and the decoder must follow
    data = bytes((i * 131 + i // 256 * 17) % 256 for i in range(60_000))
    assert lzw_decode(8, lzw_encode(8, data)) == data


def test_lzw_rejects_corrupt_code_gap():
    # code far beyond the table with no entries defined: 3-bit codes,
    # first code 7 > len(table)=6
    with pytest.raises(ValueError):
        lzw_decode(2, bytes([0b111]))


# ---------------------------------------------------------------------------
# GIF container


def test_gif_single_frame_roundtrip_gray():
    w, h = 7, 5
    indices = bytes((3 * x + 11 * y) % 256 for y in range(h) for x in range(w))
    gif = encode_gif(w, h, [indices])
    gw, gh, nch, rgb = decode_gif_pixels(gif)
    assert (gw, gh, nch) == (w, h, 3)
    expect = bytes(v for idx in indices for v in (idx, idx, idx))
    assert rgb == expect


def test_gif_small_palette_and_hand_header():
    # 4-color palette → size_bits 1, min_code_size 2; check the header
    # bytes the encoder wrote are the spec's, field by field
    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # K R G B
    indices = bytes([0, 1, 2, 3, 3, 2, 1, 0])  # 4x2
    gif = encode_gif(4, 2, [indices], palette=palette)
    assert gif[:6] == b"GIF89a"
    assert struct.unpack_from("<HH", gif, 6) == (4, 2)
    assert gif[10] & 0x80  # global color table present
    assert 2 << (gif[10] & 0x07) == 4  # 4 entries
    parsed = parse_gif(gif)
    assert parsed["width"] == 4 and parsed["height"] == 2
    f = parsed["frames"][0]
    assert f["rgb"][:6] == bytes([0, 0, 0, 255, 0, 0])  # black, red


def test_gif_animated_frames_and_delay():
    w, h = 6, 4
    frames = [
        bytes((fi * 40 + x + y) % 256 for y in range(h) for x in range(w))
        for fi in range(3)
    ]
    parsed = parse_gif(encode_gif(w, h, frames, delay_cs=7))
    assert len(parsed["frames"]) == 3
    for fi, f in enumerate(parsed["frames"]):
        assert (f["width"], f["height"], f["delay_cs"]) == (w, h, 7)
        expect = bytes(
            v
            for y in range(h)
            for x in range(w)
            for v in ((fi * 40 + x + y) % 256,) * 3
        )
        assert f["rgb"] == expect


def test_gif_interlaced_frame_depassed():
    w, h = 5, 9  # odd height exercises all four interlace passes
    indices = bytes((y * 10 + x) % 256 for y in range(h) for x in range(w))
    plain = parse_gif(encode_gif(w, h, [indices]))["frames"][0]["rgb"]
    laced = parse_gif(encode_gif(w, h, [indices], interlace_frame=0))
    assert laced["frames"][0]["rgb"] == plain


def test_gif_rejects_index_outside_palette():
    palette = bytes([0, 0, 0, 255, 255, 255])  # 2 colors
    bad = encode_gif(2, 1, [bytes([0, 3])], palette=palette)
    with pytest.raises(ValueError, match="outside"):
        parse_gif(bad)


# ---------------------------------------------------------------------------
# WAV


def _hand_wav_mono() -> bytes:
    """8 kHz mono 16-bit, 4 samples (100, -200, 300, 0), built by hand."""
    data = struct.pack("<4h", 100, -200, 300, 0)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_parse_hand_bytes():
    w = parse_wav(_hand_wav_mono())
    assert w["sample_rate"] == 8000
    assert w["n_channels"] == 1
    assert w["bits"] == 16
    assert w["n_frames"] == 4
    assert w["samples"] == [100, -200, 300, 0]


def test_wav_features_hand_computed():
    f = wav_features(_hand_wav_mono())
    assert f["duration_micro"] == 4 * 1_000_000 // 8000  # 500 µs
    assert f["peak_abs"] == 300
    assert f["mean_abs_micro"] == (100 + 200 + 300 + 0) * 1_000_000 // 4
    assert f["zero_crossings"] == 2  # +→−, −→+ (trailing 0 transparent)


def test_wav_roundtrip_stereo_and_extra_chunk():
    samples = [(i * 37 - 500) % 2001 - 1000 for i in range(200)]  # 100 frames x 2ch
    b = encode_wav(16000, 2, samples)
    # splice an extra odd-sized LIST chunk between fmt and data: the
    # parser must skip it with word alignment
    fmt_end = b.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = b[:fmt_end] + extra + b[fmt_end:]
    w = parse_wav(spliced)
    assert w["n_channels"] == 2 and w["n_frames"] == 100
    assert w["samples"] == samples


def test_wav_8bit_and_rejections():
    b = encode_wav(8000, 1, [0, 128, 255, 64], bits=8)
    w = parse_wav(b)
    assert w["samples"] == [-128, 0, 127, -64]
    non_pcm = bytearray(_hand_wav_mono())
    non_pcm[20] = 3  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM"):
        parse_wav(bytes(non_pcm))
