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

from ..functions.quadtree import to_int
from ..sources.fixtures import ENTITY_REGEX

_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITY_RE = re.compile(ENTITY_REGEX)


def extract_text(batch: pa.Table) -> pa.Table:
    """html(binary) -> text, byte-identical to the original extraction.

    Keeps url/warc_ts/lang, drops the heavy html column immediately
    (SURVEY §7.4: project html away as early as possible).
    """
    html = batch.column("html").to_pylist()
    text = [_TAG_RE.sub(b"", h).decode("utf-8") for h in html]
    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "lang": batch.column("lang"),
        "text": pa.array(text, pa.large_string()),
    }
    return pa.table(cols)


def extract_entities(batch: pa.Table) -> pa.Table:
    """text -> one row per geo-entity mention: (url, name, lon, lat).

    Coordinates parse back to the exact int64 1e-7-deg values embedded at
    generation time (to_int's away-from-zero rounding matches the
    reference's ToInt, bbox.go:16-21).
    """
    s = batch.column("text").to_pandas()
    urls = batch.column("url").to_pandas()
    found = s.str.extractall(_ENTITY_RE)
    if len(found) == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "name": pa.array([], pa.string()),
                "lon": pa.array([], pa.int64()),
                "lat": pa.array([], pa.int64()),
                "mention_idx": pa.array([], pa.int64()),
            }
        )
    page_idx = found.index.get_level_values(0).to_numpy()
    mention_idx = found.index.get_level_values(1).to_numpy().astype(np.int64)
    lat = to_int(found[1].to_numpy(dtype=np.float64))
    lon = to_int(found[2].to_numpy(dtype=np.float64))
    return pa.table(
        {
            "url": pa.array(urls.iloc[page_idx].to_numpy(dtype=object).tolist(), pa.string()),
            "name": pa.array(found[0].tolist(), pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "mention_idx": pa.array(mention_idx),
        }
    )


def add_entity_id(batch: pa.Table) -> pa.Table:
    """Derive the stable entity id from the mention name (fixture contract:
    name == POI_<entity_id>); general inputs would key on (url, mention_idx)."""
    names = batch.column("name").to_pandas()
    eid = names.str.extract(r"POI_(\d+)", expand=False).astype("int64")
    return batch.append_column("entity_id", pa.array(eid.to_numpy()))


def text_digest(batch: pa.Table) -> pa.Table:
    """Per-url content hash carried through the pipeline instead of the
    text payload (SURVEY §7.4 byte-identity bookkeeping)."""
    import hashlib

    texts = batch.column("text").to_pylist()
    digests = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            "url": batch.column("url"),
            "text_sha256": pa.array(digests, pa.string()),
        }
    )
