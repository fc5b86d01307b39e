"""Property-fuzzing for the codec lattice (r5 VERDICT item 8).

The decoders are pinned by hand-computed bytes at specific geometries
(test_codecs.py); these properties sweep RANDOM geometries/contents:

- encode → decode == identity per format (BMP, PNG, GIF, WAV, MP4, and
  constant-tile JPEG where the round trip is exact by construction);
- EVERY payload truncation raises ValueError — never IndexError /
  struct.error / KeyError, the r5 RLE8 bug class.

No Spark involved — pure byte-level functions, so examples are cheap.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_stream_parquet_spark.operators.codecs import (
    decode_bmp_pixels,
    decode_gif_pixels,
    decode_jpeg_pixels,
    encode_avi_mjpeg,
    encode_bmp,
    encode_gif,
    encode_jpeg_gray_tiles,
    encode_jpeg_lossless,
    encode_mp4_metadata,
    encode_wav,
    parse_avi,
    parse_gif,
    mp4_samples,
    parse_mp4,
    parse_wav,
)
from arcane_stream_parquet_spark.operators.multimodal import (
    decode_png_pixels,
    encode_png,
)

SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _rand_bytes(seed: int, n: int) -> bytes:
    return bytes(random.Random(seed).randrange(256) for _ in range(n))


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(**SETTINGS)
def test_bmp_roundtrip_any_geometry(w, h, top_down, seed):
    rgb = _rand_bytes(seed, w * h * 3)
    assert decode_bmp_pixels(encode_bmp(w, h, rgb, top_down=top_down)) == (
        w,
        h,
        3,
        rgb,
    )


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    ct=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_png_roundtrip_any_geometry_and_filters(w, h, ct, seed, filters):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    samples = _rand_bytes(seed, w * h * ch)
    b = encode_png(
        w, h, samples, color_type=ct,
        filter_for_row=lambda y: filters[y % len(filters)],
    )
    assert decode_png_pixels(b) == (w, h, ch, samples)


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    n_frames=st.integers(1, 3),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(**SETTINGS)
def test_gif_roundtrip_any_geometry_and_frames(w, h, n_frames, interlace, seed):
    rng = random.Random(seed)
    frames = [
        bytes(rng.randrange(256) for _ in range(w * h))
        for _ in range(n_frames)
    ]
    gif = encode_gif(
        w, h, frames,
        interlace_frame=0 if interlace else None,
    )
    parsed = parse_gif(gif)
    assert len(parsed["frames"]) == n_frames
    for idx, f in zip(frames, parsed["frames"]):
        assert f["rgb"] == bytes(v for i in idx for v in (i, i, i))
    gw, gh, nch, rgb = decode_gif_pixels(gif)
    assert (gw, gh, nch) == (w, h, 3)


@given(
    rate=st.integers(1, 96_000),
    n_channels=st.integers(1, 3),
    bits=st.sampled_from([8, 16]),
    n_frames=st.integers(0, 50),
    seed=st.integers(0, 2**31),
)
@settings(**SETTINGS)
def test_wav_roundtrip_any_geometry(rate, n_channels, bits, n_frames, seed):
    rng = random.Random(seed)
    if bits == 16:
        samples = [
            rng.randrange(-32768, 32768) for _ in range(n_frames * n_channels)
        ]
        expect = samples
    else:
        samples = [rng.randrange(256) for _ in range(n_frames * n_channels)]
        expect = [v - 128 for v in samples]
    w = parse_wav(encode_wav(rate, n_channels, samples, bits=bits))
    assert (w["sample_rate"], w["n_channels"], w["bits"]) == (
        rate, n_channels, bits,
    )
    assert w["n_frames"] == n_frames and w["samples"] == expect


@given(
    bx=st.integers(1, 4),
    by=st.integers(1, 4),
    mode=st.sampled_from(
        ["sequential", "progressive", "arithmetic", "arith-progressive"]
    ),
    restart=st.integers(0, 3),
    seed=st.integers(0, 2**31),
)
@settings(**SETTINGS)
def test_jpeg_constant_tiles_roundtrip_exact(bx, by, mode, restart, seed):
    rng = random.Random(seed)
    tiles = [[rng.randrange(256) for _ in range(bx)] for _ in range(by)]
    b = encode_jpeg_gray_tiles(
        bx * 8, by * 8, tiles,
        restart_interval=restart if mode in ("sequential", "arithmetic") else 0,
        progressive="progressive" in mode,
        arithmetic="arith" in mode,
    )
    w, h, nch, samples = decode_jpeg_pixels(b)
    assert (w, h, nch) == (bx * 8, by * 8, 1)
    for yy in range(h):
        for xx in range(w):
            assert samples[yy * w + xx] == tiles[yy // 8][xx // 8]


@given(
    duration=st.integers(0, 2**31),
    timescale=st.integers(1, 10**6),
    tracks=st.lists(
        st.fixed_dictionaries(
            {
                "handler": st.sampled_from(["vide", "soun", "hint"]),
                "codec": st.sampled_from(["avc1", "mp4a", "hvc1", "tx3g"]),
                "width": st.integers(0, 8192),
                "height": st.integers(0, 8192),
                "timescale": st.integers(1, 10**6),
                "duration": st.integers(0, 2**31),
            }
        ),
        max_size=4,
    ),
)
@settings(**SETTINGS)
def test_mp4_roundtrip_any_tracks(duration, timescale, tracks):
    m = parse_mp4(encode_mp4_metadata(duration, timescale, tracks))
    assert m["timescale"] == timescale and m["duration"] == duration
    assert m["n_tracks"] == len(tracks)
    for t_in, t_out in zip(tracks, m["tracks"]):
        # r9: parsed tracks additionally carry the raw stbl tables
        assert {k: t_out[k] for k in t_in} == t_in
        assert t_out["stbl"] == {}  # no sample tables were encoded


def _sample_payloads(seed: int) -> list[tuple[str, bytes, object]]:
    rng = random.Random(seed)
    w, h = rng.randint(1, 6), rng.randint(1, 6)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    tiles = [[rng.randrange(256)]]
    jpg = encode_jpeg_gray_tiles(8, 8, tiles)
    return [
        ("bmp", encode_bmp(w, h, rgb), decode_bmp_pixels),
        ("png", encode_png(w, h, rgb, color_type=2), decode_png_pixels),
        ("gif", encode_gif(w, h, [idx]), decode_gif_pixels),
        ("jpeg", jpg, decode_jpeg_pixels),
        (
            "jpeg-arith",
            encode_jpeg_gray_tiles(8, 8, tiles, arithmetic=True),
            decode_jpeg_pixels,
        ),
        (
            "jpeg-arith-prog",
            encode_jpeg_gray_tiles(8, 8, tiles, arithmetic=True, progressive=True),
            decode_jpeg_pixels,
        ),
        (
            "jpeg-lossless",
            encode_jpeg_lossless(4, 4, [list(range(16))]),
            decode_jpeg_pixels,
        ),
        ("wav", encode_wav(8000, 1, [1, -2, 3]), parse_wav),
        (
            "mp4",
            encode_mp4_metadata(10, 1000, [
                {"handler": "vide", "codec": "avc1", "width": 16,
                 "height": 16, "timescale": 600, "duration": 6},
            ]),
            parse_mp4,
        ),
        ("avi", encode_avi_mjpeg(8, 8, [jpg]), parse_avi),
        (
            "mp4-stbl",
            encode_mp4_metadata(10, 1000, [
                {"handler": "vide", "codec": "avc1", "width": 16,
                 "height": 16, "timescale": 600, "duration": 6,
                 "samples": [
                     {"size": 1 + rng.randrange(64), "delta": 100,
                      "keyframe": rng.random() < 0.5}
                     for _ in range(rng.randrange(1, 8))
                 ]},
            ]),
            mp4_samples,
        ),
    ]


@given(seed=st.integers(0, 2**31), cut_frac=st.floats(0.0, 0.999))
@settings(**{**SETTINGS, "max_examples": 150})
def test_truncation_never_crashes_or_misreads(seed, cut_frac):
    """Cutting ANY valid payload at ANY point must either raise
    ValueError or return EXACTLY the full decode — never a different
    result, and never IndexError/struct.error/zlib.error (the magic
    still matches, so fake-mode fallbacks contract on the exception
    type; the r5 RLE8 bug class).  Sound acceptance happens when the
    cut only removes trailing bytes a self-terminating stream didn't
    need (e.g. a PNG whose IDAT is complete but IEND got cut)."""
    for name, payload, decoder in _sample_payloads(seed):
        cut = max(1, int(len(payload) * cut_frac))
        if cut >= len(payload):
            continue
        try:
            got = decoder(payload[:cut])
        except ValueError:
            continue
        assert got == decoder(payload), (
            f"{name} cut at {cut}/{len(payload)} returned a DIFFERENT "
            f"result than the full decode"
        )


@given(seed=st.integers(0, 2**31), n_flips=st.integers(1, 6))
@settings(**{**SETTINGS, "max_examples": 60})
def test_byte_corruption_only_raises_valueerror(seed, n_flips):
    """Flipping ANY bytes of a valid payload (not just truncating it)
    must either decode or raise ValueError — never IndexError /
    KeyError / ZeroDivisionError out of a parser's guts (r8 sweep
    found five such sites: SOS/SOF/DHT bounds, sampling factors,
    missing table refs, PNG IHDR under a corrupted length field).
    Decompression-bomb dims are rejected by the 1M-pixel JPEG bound
    rather than ground through."""
    rng = random.Random(seed)
    for name, payload, decoder in _sample_payloads(seed):
        b = bytearray(payload)
        for _ in range(n_flips):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decoder(bytes(b))
        except ValueError:
            pass


def test_review_finds_truncation_regressions():
    """Pinned repros from the r6 review: silent partial decodes and
    wrong-exception-type rejections, all must raise ValueError."""
    from arcane_stream_parquet_spark.operators.codecs import (
        encode_avi_mjpeg,
        encode_gif,
        encode_jpeg_gray_tiles,
        encode_mp4_metadata,
        parse_avi,
        parse_gif,
        parse_mp4,
    )

    # AVI cut inside the movi LIST: must not return a partial frame list
    avi = encode_avi_mjpeg(8, 8, [encode_jpeg_gray_tiles(8, 8, [[7]])] * 3)
    for cut in range(12, len(avi)):
        try:
            got = parse_avi(avi[:cut])
        except ValueError:
            continue
        assert got["frames"] == parse_avi(avi)["frames"], cut

    # GIF cut between image descriptors: must not drop trailing frames
    f1 = bytes([1, 2, 3, 4])
    f2 = bytes([5, 6, 7, 8])
    gif = encode_gif(2, 2, [f1, f2])
    for cut in range(6, len(gif)):
        try:
            got = parse_gif(gif[:cut])
        except ValueError:
            continue
        assert len(got["frames"]) == 2, cut

    # MP4 with an under-sized mvhd: ValueError, not struct.error /
    # a silent read of the next box's bytes
    import struct

    def box(t, p):
        return struct.pack(">I", len(p) + 8) + t + p

    short_mvhd = box(b"mvhd", b"\x00" * 8)
    bad = box(b"ftyp", b"isom" + b"\x00" * 8) + box(b"moov", short_mvhd)
    with pytest.raises(ValueError):
        parse_mp4(bad)
    # zero timescale: ValueError, not ZeroDivisionError
    zero_ts = encode_mp4_metadata(10, 1, [])
    zero_ts = bytearray(zero_ts)
    # timescale lives 12 bytes into the mvhd body; find it and zero it
    i = bytes(zero_ts).find(b"mvhd") + 4 + 12
    zero_ts[i : i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        parse_mp4(bytes(zero_ts))


def test_bmp_bitfields_v3_truncated_at_alpha_mask():
    import struct

    import pytest as _pytest

    from arcane_stream_parquet_spark.operators.codecs import decode_bmp_pixels

    info = struct.pack(
        "<IiiHHIIiiII", 56, 1, 1, 1, 32, 3, 4, 0, 0, 0, 0
    ) + struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 70)
    # 66..69 bytes: masks guard passes but the alpha DWORD is short
    for n in range(66, 70):
        with _pytest.raises(ValueError):
            decode_bmp_pixels((header + info)[:n])


@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    predictor=st.integers(1, 7),
    pt=st.integers(0, 3),
    color=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(**SETTINGS)
def test_jpeg_lossless_roundtrip_any_geometry(w, h, predictor, pt, color, seed):
    rng = random.Random(seed)
    nch = 3 if color else 1
    planes = [
        [rng.randrange(256 >> pt) for _ in range(w * h)] for _ in range(nch)
    ]
    gw, gh, gch, s = decode_jpeg_pixels(
        encode_jpeg_lossless(w, h, planes, predictor=predictor, pt=pt)
    )
    assert (gw, gh, gch) == (w, h, nch)
    for ci in range(nch):
        assert list(s[ci::nch]) == [(v << pt) & 0xFF for v in planes[ci]]
