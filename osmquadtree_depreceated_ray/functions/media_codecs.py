"""From-scratch media codecs over stdlib only — no PIL/ffmpeg needed.

PNG (encode + decode) using ``zlib``/``struct``: 8-bit grayscale and
RGB, no interlace; all five PNG scanline filters are reconstructed on
decode (encode always emits filter 0, so the hot path stays
vectorized).  WAV (encode + decode) for 16-bit PCM via the stdlib
``wave`` module.  These make the multimodal pipeline's image/audio
stages REAL: payload bytes in the Arrow binary column are genuine PNG /
WAV files.  Video is covered by a from-scratch ISO BMFF (MP4) container
codec at the bottom of this module: box-tree writer/parser with
stsz/stts/stco sample tables and PNG frames as the (codec-agnostic)
sample payloads — container parse -> sample extraction -> png_decode
yields real pixels with zero external dependencies.

Format references are the public specs (PNG: RFC 2083; WAV: RIFF PCM;
MP4: ISO/IEC 14496-12 box structure).
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


# ---------------------------------------------------------------- MP4 / BMFF
#
# From-scratch ISO Base Media File Format (MP4) container codec — the
# public box structure only (ISO/IEC 14496-12): every box is
# size:uint32be + fourcc + payload (size==1 -> 64-bit largesize).  The
# container is codec-agnostic: sample payloads here are whole PNG
# frames under a 'png ' visual sample entry (a registered QuickTime
# sample format), so the video path needs no external codec — container
# parse -> sample extraction -> png_decode gives real pixels.  This
# closes the multimodal pipeline's last stub.

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + payload)


def mp4_encode(frames: list, width: int, height: int,
               timescale: int = 1000, frame_duration: int = 40) -> bytes:
    """Frames (each a bytes PNG payload) -> minimal valid single-track
    MP4: ftyp + mdat(samples) + moov(mvhd/trak(tkhd/mdia(mdhd/hdlr/minf
    (vmhd/stbl(stsd['png ']/stts/stsc/stsz/stco))))).  All samples land
    in one chunk; stco points into mdat."""
    if not frames:
        raise ValueError("mp4_encode needs at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    # chunk offset: file-absolute position of the first sample byte
    chunk_off = len(ftyp) + 8
    n = len(frames)
    duration = n * frame_duration

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH2s", 0x00010000, 0x0100, b"\0\0")
        + b"\0" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\0" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration)
        + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\0" * 12 + b"graft\0")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # visual sample entry 'png ' (14496-12 §12.1.3 layout)
    entry = (b"\0" * 6 + struct.pack(">H", 1)          # reserved + dref idx
             + struct.pack(">HHIII", 0, 0, 0, 0, 0)    # predef/reserved
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + struct.pack(">IH", 0, 1)                # reserved, framecount
             + b"\0" * 32                              # compressorname
             + struct.pack(">Hh", 24, -1))             # depth, predefined
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(b"png ", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, frame_duration))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the box sequence
    in data[start:end] (size==1 largesize and size==0 to-end handled)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def mp4_parse(data: bytes) -> dict:
    """Minimal MP4 metadata: {brand, timescale, duration_ms, width,
    height, codec, sample_sizes, sample_durations, sample_offsets}.
    Raises ValueError on anything that is not ISO BMFF."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4) file")
    out = {"brand": data[8:12].decode("ascii", "replace")}

    def walk(lo, hi):
        for fourcc, b0, b1 in _walk_boxes(data, lo, hi):
            if fourcc in _MP4_CONTAINERS:
                walk(b0, b1)
            elif fourcc == b"mvhd":
                ver = data[b0]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, b0 + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", data, b0 + 4 + 8)
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 / ts) if ts else 0
            elif fourcc == b"tkhd":
                out["width"] = struct.unpack_from(
                    ">I", data, b1 - 8)[0] >> 16
                out["height"] = struct.unpack_from(
                    ">I", data, b1 - 4)[0] >> 16
            elif fourcc == b"stsd":
                # first sample entry's fourcc = the sample format
                out["codec"] = data[b0 + 12:b0 + 16].decode(
                    "ascii", "replace").strip()
            elif fourcc == b"stsz":
                fixed, n = struct.unpack_from(">II", data, b0 + 4)
                out["sample_sizes"] = (
                    [fixed] * n if fixed else list(
                        struct.unpack_from(f">{n}I", data, b0 + 12)))
            elif fourcc == b"stts":
                nent = struct.unpack_from(">I", data, b0 + 4)[0]
                durs = []
                for i in range(nent):
                    cnt, d = struct.unpack_from(">II", data, b0 + 8 + 8 * i)
                    durs.extend([d] * cnt)
                out["sample_durations"] = durs
            elif fourcc == b"stco":
                nent = struct.unpack_from(">I", data, b0 + 4)[0]
                out["chunk_offsets"] = list(
                    struct.unpack_from(f">{nent}I", data, b0 + 8))
            elif fourcc == b"co64":
                nent = struct.unpack_from(">I", data, b0 + 4)[0]
                out["chunk_offsets"] = list(
                    struct.unpack_from(f">{nent}Q", data, b0 + 8))

    walk(0, len(data))
    # per-sample absolute offsets (single-chunk layout: consecutive)
    sizes = out.get("sample_sizes", [])
    offs = out.get("chunk_offsets", [])
    if sizes and offs:
        pos = offs[0]
        sample_offsets = []
        for s in sizes:
            sample_offsets.append(pos)
            pos += s
        out["sample_offsets"] = sample_offsets
    return out


def mp4_extract_samples(data: bytes, limit: int | None = None) -> list:
    """Raw sample (frame) payload bytes straight out of mdat, via the
    stsz/stco tables — no decode."""
    meta = mp4_parse(data)
    sizes = meta.get("sample_sizes", [])
    offs = meta.get("sample_offsets", [])
    n = len(sizes) if limit is None else min(limit, len(sizes))
    return [bytes(data[offs[i]:offs[i] + sizes[i]]) for i in range(n)]
