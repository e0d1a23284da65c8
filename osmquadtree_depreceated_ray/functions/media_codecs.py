"""From-scratch media codecs over stdlib only — no PIL/ffmpeg needed.

PNG (encode + decode) using ``zlib``/``struct``: 8-bit grayscale and
RGB, no interlace; all five PNG scanline filters are reconstructed on
decode (encode always emits filter 0, so the hot path stays
vectorized).  WAV (encode + decode) for 16-bit PCM via the stdlib
``wave`` module.  These make the multimodal pipeline's image/audio
stages REAL: payload bytes in the Arrow binary column are genuine PNG /
WAV files.  Video container parsing has no stdlib support and remains
the one stubbed path (stages/multimodal.py documents it).

Format references are the public specs (PNG: RFC 2083; WAV: RIFF PCM).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 -> PNG bytes
    (filter 0 scanlines, one zlib stream)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # scanlines: filter byte 0 + raw row bytes, vectorized via hstack
    rows = img.reshape(h, w * channels)
    raw = np.hstack(
        [np.zeros((h, 1), dtype=np.uint8), rows]
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> uint8 array (HxW or HxWx3).  Supports 8-bit
    grayscale/RGB, no interlace; reconstructs all five scanline
    filters (None/Sub/Up/Average/Paeth)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = color_type = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length: pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    "only 8-bit gray/RGB non-interlaced PNG supported"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    bpp = channels  # bytes per pixel at depth 8
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — cumulative along the row per channel
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def block_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resample to (out_h, out_w) by averaging source pixel
    blocks (nearest-bin edges) — a real downsample/upsample without any
    imaging library."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    else:
        squeeze = False
    h, w, c = img.shape
    # per-output-pixel source block [lo, hi): hi is clamped to lo+1 so
    # an UPSAMPLED axis (out > in, duplicate integer bin edges) still
    # reads one real pixel instead of a zero-area (black) block
    y0 = (np.arange(out_h) * h) // out_h
    y1 = np.maximum((np.arange(1, out_h + 1) * h) // out_h, y0 + 1)
    x0 = (np.arange(out_w) * w) // out_w
    x1 = np.maximum((np.arange(1, out_w + 1) * w) // out_w, x0 + 1)
    acc = img.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    acc = np.pad(acc, ((1, 0), (1, 0), (0, 0)))
    a = acc[y1][:, x1]
    b = acc[y0][:, x1]
    d = acc[y1][:, x0]
    e = acc[y0][:, x0]
    area = (
        (y1 - y0).reshape(-1, 1, 1) * (x1 - x0).reshape(1, -1, 1)
    ).astype(np.float64)
    out = np.clip((a - b - d + e) / area, 0, 255)
    out = out.astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono PCM -> WAV bytes (stdlib wave)."""
    samples = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (rate, int16 samples); mono 16-bit PCM."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM supported")
        rate = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    return rate, np.frombuffer(frames, dtype=np.int16)
