"""Multimodal (image/audio/video) column plumbing — REAL Ray-side shape,
STUBBED codecs (task brief: the media libraries are not available in this
container, so decode is a clearly-marked deterministic fake behind an
import-try; schema, batch sizing, actor signature and output layout are
real and tested).

Media rows are (media_id:int64, kind:string, payload:binary,
meta:struct<width:int32, height:int32, duration_ms:int32>).  Payloads
are opaque bytes; stages run as actor pools with small batches (wide
binary rows -> keep batch_size low so batch x concurrency fits the
worker heap)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                            ("duration_ms", pa.int32())])),
    ]
)

RECOMMENDED_BATCH_SIZE = 64  # wide binary payloads: keep batches small


def gen_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic synthetic media fixture."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[np.arange(n) % 3]
    payloads = []
    metas = []
    for i in range(n):
        raw = hashlib.sha256(f"media-{seed}-{i}".encode()).digest()
        payloads.append((raw * (payload_bytes // len(raw) + 1))[:payload_bytes])
        metas.append(
            {
                "width": int(64 + (i * 37) % 1024),
                "height": int(64 + (i * 53) % 768),
                "duration_ms": int((i * 997) % 60000),
            }
        )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        }
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: 8x8 'pixels' from
    the payload digest."""
    d = hashlib.sha256(payload).digest()
    return np.frombuffer((d * 2)[:64], dtype=np.uint8).reshape(8, 8)


class DecodeFeatureActor:
    """Actor-pool stage: decode payload -> fixed-size feature vector.

    Real decoders (PIL / torchvision / ffmpeg) are loaded in __init__
    when available; otherwise the deterministic fake keeps the pipeline
    runnable and testable.  Raise instead by passing strict=True
    (NotImplementedError marks the genuinely-stubbed path)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # pragma: no cover - not present in this container
            from PIL import Image  # noqa: F401

            self.backend = "pil"
        except ImportError:
            self.backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend != "fake":  # pragma: no cover
            raise NotImplementedError("real decoder path not wired in sandbox")
        if self.strict:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg (unavailable in this container)"
            )
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([_fake_decode(p).ravel() for p in payloads]).astype(np.float32)
        means = feats.mean(axis=1)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), 64
                ),
                "mean_px": pa.array(means, pa.float32()),
            }
        )


class ResizeActor:
    """Stub resize: recomputes meta for the target size; payload passes
    through untouched (a real implementation would re-encode)."""

    def __init__(self, width: int = 256, height: int = 256):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        meta = pa.array(
            [
                {"width": self.width, "height": self.height, "duration_ms": d}
                for d in [
                    m["duration_ms"] for m in batch.column("meta").to_pylist()
                ]
            ],
            MEDIA_SCHEMA.field("meta").type,
        )
        return batch.set_column(batch.schema.get_field_index("meta"), "meta", meta)


class FrameSampleActor:
    """Stub frame sampler for video rows: emits one row per sampled
    'frame' (deterministic count from duration), exercising the
    one-to-many layout real samplers need."""

    def __init__(self, every_ms: int = 10_000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = []
        frame_idx = []
        for mid, kind, meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            n = 1
            if kind == "video":
                n = max(1, meta["duration_ms"] // self.every_ms)
            for f in range(n):
                ids.append(mid)
                frame_idx.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int64()),
            }
        )


def media_pipeline(media_table: pa.Table, concurrency=(1, 4)):
    """Dataset pipeline over a media table: decode -> features; the shape
    (actor pools, small batches, binary-safe Arrow formats) is the real
    100 TB layout."""
    import ray

    ds = ray.data.from_arrow(media_table)
    return ds.map_batches(
        DecodeFeatureActor,
        batch_format="pyarrow",
        batch_size=RECOMMENDED_BATCH_SIZE,
        concurrency=concurrency,
    )
