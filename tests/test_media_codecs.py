"""From-scratch PNG/WAV codecs (functions/media_codecs.py): encode ->
decode round trips, full PNG filter reconstruction against a hand-built
file, area resample properties."""

import struct
import zlib

import numpy as np
import pytest

from osmquadtree_depreceated_ray.functions.media_codecs import (
    _PNG_SIG,
    _chunk,
    block_resize,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)

rng = np.random.default_rng(11)


def test_png_roundtrip_gray_and_rgb():
    g = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(g)), g)
    c = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(c)), c)
    # 1x1 edge
    one = np.array([[7]], dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(one)), one)


def test_png_decode_all_filters():
    """Hand-encode rows with filters Sub/Up/Average/Paeth; the decoder
    must reconstruct the original pixels (our encoder only emits filter
    0, so this pins the other four reconstruction paths)."""
    h, w, ch = 4, 5, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    rows = img.reshape(h, w * ch).astype(np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    enc = []
    prev = np.zeros(w * ch, np.int64)
    for y, f in enumerate([1, 2, 3, 4]):
        line = rows[y]
        out = line.copy()
        for x in range(w * ch):
            left = line[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            up = prev[x]
            if f == 1:
                out[x] = (line[x] - left) & 0xFF
            elif f == 2:
                out[x] = (line[x] - up) & 0xFF
            elif f == 3:
                out[x] = (line[x] - (left + up) // 2) & 0xFF
            else:
                out[x] = (line[x] - paeth(int(left), int(up), int(ul))) & 0xFF
        enc.append(bytes([f]) + bytes(out.astype(np.uint8)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(enc)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(png), img)


def test_png_rejects_corruption():
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(png_encode(g))
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    data[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must fail
    with pytest.raises(ValueError):
        png_decode(bytes(data))


def test_block_resize_properties():
    g = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    down = block_resize(g, 8, 8)
    assert down.shape == (8, 8)
    # area resample of a constant image is the constant
    const = np.full((20, 30), 77, dtype=np.uint8)
    assert (block_resize(const, 7, 11) == 77).all()
    # mean is preserved when blocks tile evenly
    even = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    d = block_resize(even, 8, 8)
    assert abs(d.mean() - even.mean()) < 1.0
    up = block_resize(g, 64, 96)
    assert up.shape == (64, 96)
    # regression: upsampling must NOT produce zero-area (black) blocks —
    # a constant image upsampled stays constant
    const_up = block_resize(np.full((32, 48), 200, dtype=np.uint8), 64, 96)
    assert (const_up == 200).all()
    # identity resize is exact
    assert np.array_equal(block_resize(g, 32, 48), g)


def test_wav_roundtrip():
    s = (np.sin(np.linspace(0, 40, 1600)) * 12000).astype(np.int16)
    rate, back = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    assert np.array_equal(back, s)


def test_mp4_container_roundtrip():
    """From-scratch ISO BMFF writer/parser: byte-identical sample
    extraction, correct metadata, stts/stsz/stco tables."""
    import numpy as np

    from osmquadtree_depreceated_ray.functions.media_codecs import (
        mp4_encode,
        mp4_extract_samples,
        mp4_parse,
        png_decode,
        png_encode,
    )

    frames = [
        png_encode(((np.mgrid[0:12, 0:10][0] * (i + 1)) % 256
                    ).astype(np.uint8))
        for i in range(5)
    ]
    data = mp4_encode(frames, 10, 12, timescale=1000, frame_duration=40)
    meta = mp4_parse(data)
    assert meta["brand"] == "isom"
    assert meta["codec"] == "png"
    assert (meta["width"], meta["height"]) == (10, 12)
    assert meta["timescale"] == 1000
    assert meta["duration_ms"] == 5 * 40
    assert meta["sample_sizes"] == [len(f) for f in frames]
    assert meta["sample_durations"] == [40] * 5
    # extraction is byte-identical; frames decode to real pixels
    out = mp4_extract_samples(data)
    assert out == frames
    assert png_decode(out[3]).shape == (12, 10)
    # limit
    assert mp4_extract_samples(data, limit=2) == frames[:2]
    # non-BMFF input is rejected loudly
    import pytest

    with pytest.raises(ValueError):
        mp4_parse(b"garbage-not-a-container")
