"""Text / entity extraction stages (the engine's 'decoder', SURVEY §2.1 S4/S6).

``extract_text`` is the html -> text step whose output must be
byte-identical per url (BASELINE.json input_hint invariant); the test
suite pins it against the fixture's golden ``text`` column.

``extract_entities`` mines geo-entity mentions from ``text`` — the
analogue of decoding OSM nodes from a planet file.  Batch format is
pyarrow in/out; the regex work runs through pandas' C-accelerated
extractall on a module-level compiled pattern.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.quadtree import to_int
from ..sources.fixtures import ENTITY_REGEX

_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITY_RE = re.compile(ENTITY_REGEX)


def extract_text(batch: pa.Table) -> pa.Table:
    """html(binary) -> text, byte-identical to the original extraction.

    Keeps url/warc_ts/lang, drops the heavy html column immediately
    (SURVEY §7.4: project html away as early as possible).

    The tag strip is a single C-speed RE2 pass over the whole column
    (``pc.replace_substring_regex``) — byte-equivalent to the per-row
    ``re.sub(rb"<[^>]+>", b"")`` for valid-UTF-8 html, because the
    char class ``[^>]`` delimits identical spans at byte and codepoint
    level.  Non-UTF-8 payloads fall back to the per-row bytes path with
    U+FFFD replacement — the standard web-corpus contract (lossy by
    design for corrupt payloads; the byte-identity invariant applies to
    valid-UTF-8 html, which the whole fixture corpus is).
    """
    html = batch.column("html")
    try:
        s = pc.cast(html, pa.large_string())
        text = pc.replace_substring_regex(s, pattern="<[^>]+>",
                                          replacement="")
    except pa.ArrowInvalid:
        raw = html.to_pylist()
        text = pa.array(
            [_TAG_RE.sub(b"", h).decode("utf-8", "replace") for h in raw],
            pa.large_string())
    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "lang": batch.column("lang"),
        "text": text,
    }
    return pa.table(cols)


def extract_entities(batch: pa.Table) -> pa.Table:
    """text -> one row per geo-entity mention: (url, name, lon, lat).

    Coordinates parse back to the exact int64 1e-7-deg values embedded at
    generation time (to_int's away-from-zero rounding matches the
    reference's ToInt, bbox.go:16-21).

    Implementation: one finditer pass over a NUL-joined batch string —
    ~3x fewer allocations than pandas extractall, which matters because
    the extract stage is memory-bandwidth-bound across a full node.

    Measured A/B (8M pages, 32 cpus, warm): an all-Arrow rewrite
    (pc.split_pattern on the literal prefix + anchored
    pc.extract_regex over the flattened fragments) ran 6.2-8.1 s vs
    4.3 s for this version — materializing ~7 fragment strings per
    page and running RE2 per fragment costs more than the single
    C-level finditer scan.  Don't retry that shape.
    """
    texts = batch.column("text").to_pylist()
    if not texts:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "name": pa.array([], pa.string()),
                "lon": pa.array([], pa.int64()),
                "lat": pa.array([], pa.int64()),
                "mention_idx": pa.array([], pa.int64()),
            }
        )
    joined = "\x00".join(texts)
    offsets = np.cumsum([0] + [len(t) + 1 for t in texts])
    names: list[str] = []
    lat_s: list[str] = []
    lon_s: list[str] = []
    spans: list[int] = []
    for m in _ENTITY_RE.finditer(joined):
        names.append(m.group(1))
        lat_s.append(m.group(2))
        lon_s.append(m.group(3))
        spans.append(m.start())
    page_idx = np.searchsorted(offsets, np.asarray(spans, np.int64), side="right") - 1
    # mention index within each page (matches arrive in document order,
    # so page_idx is non-decreasing)
    idx = np.arange(len(page_idx), dtype=np.int64)
    if len(idx):
        starts_mask = np.concatenate([[True], page_idx[1:] != page_idx[:-1]])
        first_idx = np.maximum.accumulate(np.where(starts_mask, idx, 0))
        mention_idx = idx - first_idx
    else:
        mention_idx = idx
    lat = to_int(np.asarray(lat_s, dtype=np.float64))
    lon = to_int(np.asarray(lon_s, dtype=np.float64))
    urls = batch.column("url").take(pa.array(page_idx))
    return pa.table(
        {
            "url": urls,
            "name": pa.array(names, pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "mention_idx": pa.array(mention_idx),
        }
    )


def add_entity_id(batch: pa.Table) -> pa.Table:
    """Derive the stable entity id from the mention name (fixture contract:
    name == POI_<entity_id>); general inputs would key on (url, mention_idx).

    Arrow slice + cast (the extractor guarantees the POI_ prefix) — the
    previous pandas ``str.extract`` ran a Python regex per entity row,
    6x the page count."""
    eid = pc.cast(
        pc.utf8_slice_codeunits(batch.column("name"), 4), pa.int64())
    return batch.append_column("entity_id", eid)


def _sha256_utf8_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hexdigest per row, hashing the Arrow UTF-8 data buffer
    in place.  No ``to_pylist`` / no per-row ``str.encode`` — each row
    is a zero-copy memoryview slice ``data[offsets[i]:offsets[i+1]]``
    fed straight to OpenSSL, so the only per-row Python cost is the
    hasher call itself (measured ~2.3x faster than the materializing
    version on a 200k x 1KB corpus)."""
    import hashlib

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list[str | None] = []
    for chunk in chunks:
        n = len(chunk)
        if n == 0:
            continue
        if chunk.null_count:
            out.extend(
                None if t is None
                else hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in chunk.to_pylist()
            )
            continue
        if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type):
            odt = np.int64
        else:
            odt = np.int32
        bufs = chunk.buffers()
        offs = np.frombuffer(
            bufs[1], dtype=odt, count=n + 1, offset=chunk.offset * np.dtype(odt).itemsize
        )
        mv = memoryview(bufs[2])
        sha = hashlib.sha256
        out.extend(
            sha(mv[offs[i]:offs[i + 1]]).hexdigest() for i in range(n)
        )
    return pa.array(out, pa.string())


def text_digest(batch: pa.Table) -> pa.Table:
    """Per-url content hash carried through the pipeline instead of the
    text payload (SURVEY §7.4 byte-identity bookkeeping).  Matches
    DuckDB ``sha256(text)`` byte for byte (both hash the UTF-8 bytes
    and emit lowercase hex)."""
    return pa.table(
        {
            "url": batch.column("url"),
            "text_sha256": _sha256_utf8_column(batch.column("text")),
        }
    )
