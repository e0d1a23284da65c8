"""Deterministic synthetic fixtures (FIXTURES.md F1-F7).

Everything is generated in-process from numpy PCG64(seed) — no external
data.  The ``pages`` table matches BASELINE.json's input_hint schema
(url, warc_ts, html, text, lang); geo-entity mentions embedded in
``text`` play the role of OSM nodes, with the byte content of ``text``
serving as the golden for the per-url byte-identity invariant.

Coordinates are int64 units of 1e-7 degree exactly as the reference
(/root/reference/quadtree/bbox.go:12-31).  The coordinate mixture is 80%
uniform world / 20% clustered in 5 hot cells (Gaussian sigma ~0.2 deg),
exercising the max-per-tile split rule the same way city density does in
OSM.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MENTION_FMT = "Visited {name} (lat={lat}, lon={lon})."
# extraction regex must recover exactly what MENTION_FMT embeds
ENTITY_REGEX = r"(POI_\d+) \(lat=(-?\d+\.\d{7}), lon=(-?\d+\.\d{7})\)"

HOT_CENTERS = np.array(
    [
        (-740000000, 407000000),   # ~NYC
        (1390000000, 352000000),   # ~Tokyo
        (-34000000, 515000000),    # ~London
        (1035000000, -62000000),   # ~Singapore-ish
        (280000000, -260000000),   # ~Johannesburg-ish
    ],
    dtype=np.int64,
)
HOT_SIGMA_DEG = 0.2
KINDS = ("poi", "city", "peak")


def _entity_coords(n: int, rng: np.random.Generator):
    lon = rng.integers(-1_800_000_000, 1_800_000_000, size=n)
    lat = rng.integers(-900_000_000, 900_000_000, size=n)
    hot = rng.random(n) < 0.2
    k = int(hot.sum())
    which = rng.integers(0, len(HOT_CENTERS), size=k)
    jitter = (rng.normal(0.0, HOT_SIGMA_DEG, size=(k, 2)) * 1e7).astype(np.int64)
    lon[hot] = np.clip(HOT_CENTERS[which, 0] + jitter[:, 0], -1_799_999_999, 1_799_999_999)
    lat[hot] = np.clip(HOT_CENTERS[which, 1] + jitter[:, 1], -899_999_999, 899_999_999)
    return lon, lat


def gen_pages(n_pages: int, seed: int = 42, page_offset: int = 0,
              entity_offset: int = 0):
    """F1 pages + F2 geo_entities golden tables (pyarrow).

    ``page_offset``/``entity_offset`` let large corpora be generated in
    parallel chunks with globally unique page and entity ids."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    i = np.arange(n_pages, dtype=np.int64) + page_offset
    url = np.char.add(
        np.char.add("https://site", (i % 997).astype("U4")),
        np.char.add(".example/", i.astype("U12")),
    )
    warc_ts = np.datetime64("2025-01-01T00:00:00", "us") + i * np.timedelta64(13_000_000, "us")
    lang = np.where(i % 10 == 7, "de", np.where(i % 10 == 3, "fr", "en"))

    n_ent = rng.integers(0, 6, size=n_pages)
    total = int(n_ent.sum())
    page_idx = np.repeat(np.arange(n_pages), n_ent)  # 0-based array index
    page_of = i[page_idx]                            # global page id
    entity_id = np.arange(total, dtype=np.int64) + entity_offset
    lon, lat = _entity_coords(total, rng)
    name = np.char.add("POI_", entity_id.astype("U12"))
    kind = np.asarray(KINDS)[entity_id % 3]

    lat_s = np.char.mod("%.7f", lat * 1e-7)
    lon_s = np.char.mod("%.7f", lon * 1e-7)
    mention = np.char.add(
        np.char.add(np.char.add(np.char.add("Visited ", name), " (lat="), lat_s),
        np.char.add(np.char.add(", lon=", lon_s), ")."),
    )
    joined = pd.Series(mention).groupby(page_of).agg(" ".join)
    preamble = np.char.add(
        np.char.add("Page ", i.astype("U12")),
        np.char.add(np.char.add(" report ", lang), "."),
    )
    text = pd.Series(preamble, index=i, dtype="object")
    text.loc[joined.index] = text.loc[joined.index] + " " + joined
    text_arr = text.to_numpy(dtype="object")

    html = pa.array(
        [b"<html><body>" + t.encode() + b"</body></html>" for t in text_arr],
        type=pa.binary(),
    )
    pages = pa.table(
        {
            "url": pa.array(url.tolist(), pa.string()),
            "warc_ts": pa.array(warc_ts),
            "html": html,
            "text": pa.array(text_arr.tolist(), pa.large_string()),
            "lang": pa.array(lang.tolist(), pa.string()),
        }
    )
    entities = pa.table(
        {
            "entity_id": pa.array(entity_id),
            "url": pa.array(url[page_idx].tolist(), pa.string()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "kind": pa.array(kind.tolist(), pa.string()),
            "name": pa.array(name.tolist(), pa.string()),
        }
    )
    return pages, entities


def _ring(cx, cy, radii_deg, k, rng, phase=0.0):
    ang = phase + np.linspace(0.0, 2 * np.pi, k, endpoint=False)
    lon = (cx + np.cos(ang) * radii_deg * 1e7).astype(np.int64)
    lat = (cy + np.sin(ang) * radii_deg * 0.5 * 1e7).astype(np.int64)
    lon = np.append(lon, lon[0])
    lat = np.append(lat, lat[0])
    return lon, lat


def gen_admin_polys(seed: int = 42, n_scatter: int = 50):
    """F3 admin polygons: one per hot cluster + world-scattered; 60%
    convex, 30% star (concave), 10% with a hole.  Rings closed
    (first==last)."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    pid = 0
    centers = [(int(x), int(y), 1.2) for x, y in HOT_CENTERS]
    for _ in range(n_scatter):
        centers.append(
            (
                int(rng.integers(-1_700_000_000, 1_700_000_000)),
                int(rng.integers(-700_000_000, 700_000_000)),
                float(rng.uniform(1.0, 5.0)),
            )
        )
    for cx, cy, base_r in centers:
        style = rng.random()
        k = int(rng.integers(6, 13))
        phase = float(rng.uniform(0, 2 * np.pi))
        if style < 0.6:  # convex-ish
            radii = np.full(k, base_r)
        elif style < 0.9:  # star
            radii = np.where(np.arange(k) % 2 == 0, base_r, base_r * 0.45)
        else:
            radii = np.full(k, base_r)
        lon, lat = _ring(cx, cy, radii, k, rng, phase)
        rings = [list(zip(lon.tolist(), lat.tolist()))]
        if style >= 0.9:  # add a hole
            hlon, hlat = _ring(cx, cy, np.full(6, base_r * 0.35), 6, rng, phase)
            rings.append(list(zip(hlon.tolist(), hlat.tolist())))
        admin_level = int(rng.integers(2, 11))
        rows.append(
            {
                "poly_id": pid,
                "rings": [[{"lon": int(a), "lat": int(b)} for a, b in ring] for ring in rings],
                "admin_level": admin_level,
                "name": f"ADMIN_{pid}",
                "boundary": "administrative",
            }
        )
        pid += 1
    ring_t = pa.list_(pa.list_(pa.struct([("lon", pa.int64()), ("lat", pa.int64())])))
    return pa.table(
        {
            "poly_id": pa.array([r["poly_id"] for r in rows], pa.int64()),
            "rings": pa.array([r["rings"] for r in rows], ring_t),
            "admin_level": pa.array([r["admin_level"] for r in rows], pa.int32()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "boundary": pa.array([r["boundary"] for r in rows], pa.string()),
        }
    )


HIGHWAYS = list(
    {
        "service", "footway", "residential", "unclassified", "tertiary",
        "secondary", "primary", "trunk", "motorway", "cycleway",
    }
)
HIGHWAYS.sort()


def gen_way_segments(n_ways: int, n_entities: int, seed: int = 42):
    """F4 ways over entity refs: 70% open polylines, 20% closed rings,
    10% ring fragments that only close when merged (J6 merge_rings).

    Fragment groups: consecutive way ids starting at a multiple of 1000
    carry 'frag_group' = that id, splitting one ring into 2-3 chained
    segments (shared endpoints).
    """
    rng = np.random.default_rng(seed + 2)
    way_id = []
    refs = []
    tags_hw = []
    area_yes = []
    layer = []
    bridge = []
    tunnel = []
    frag_group = []
    wid = 0
    while wid < n_ways:
        style = rng.random()
        base = int(rng.integers(0, max(n_entities - 40, 1)))
        if style < 0.7 or n_ways - wid < 3:  # open polyline
            k = int(rng.integers(3, 21))
            rr = (base + np.arange(k)).tolist()
            way_id.append(wid)
            refs.append(rr)
            frag_group.append(-1)
            wid += 1
        elif style < 0.9:  # closed ring
            k = int(rng.integers(4, 12))
            rr = (base + np.arange(k)).tolist() + [base]
            way_id.append(wid)
            refs.append(rr)
            frag_group.append(-1)
            wid += 1
        else:  # fragments of one ring, chained endpoints
            k = int(rng.integers(6, 12))
            cycle = (base + np.arange(k)).tolist() + [base]
            cut = sorted(rng.choice(np.arange(1, k), size=2, replace=False).tolist())
            parts = [cycle[: cut[0] + 1], cycle[cut[0]: cut[1] + 1], cycle[cut[1]:]]
            g = wid
            for p in parts:
                way_id.append(wid)
                refs.append(p)
                frag_group.append(g)
                wid += 1
        # tags for each way added this round
        while len(tags_hw) < len(way_id):
            tags_hw.append(HIGHWAYS[int(rng.integers(0, len(HIGHWAYS)))])
            area_yes.append("yes" if rng.random() < 0.1 else None)
            layer.append(str(int(rng.integers(-2, 3))) if rng.random() < 0.15 else None)
            bridge.append("yes" if rng.random() < 0.08 else None)
            tunnel.append("yes" if rng.random() < 0.08 else None)
    return pa.table(
        {
            "way_id": pa.array(way_id, pa.int64()),
            "refs": pa.array(refs, pa.list_(pa.int64())),
            "highway": pa.array(tags_hw, pa.string()),
            "area": pa.array(area_yes, pa.string()),
            "layer": pa.array(layer, pa.string()),
            "bridge": pa.array(bridge, pa.string()),
            "tunnel": pa.array(tunnel, pa.string()),
            "frag_group": pa.array(frag_group, pa.int64()),
        }
    )


def gen_rel_members(ways: pa.Table, seed: int = 42):
    """F5 relations: multipolygons from fragment groups (outer) + closed
    ways (inner), boundary relations over open ways, one 3-deep nested
    chain and one circular pair (A4 propagation)."""
    rng = np.random.default_rng(seed + 3)
    wid = ways["way_id"].to_numpy()
    fg = ways["frag_group"].to_numpy()
    refs = ways["refs"].to_pylist()
    closed = np.array([len(r) > 3 and r[0] == r[-1] for r in refs])

    rel_id = []
    member_type = []
    member_ref = []
    role = []
    rel_tag_type = []
    rel_admin = []

    rid = 1000
    # multipolygon per fragment group
    for g in np.unique(fg[fg >= 0]):
        members = wid[fg == g]
        for m in members:
            rel_id.append(rid)
            member_type.append(1)
            member_ref.append(int(m))
            role.append("outer")
            rel_tag_type.append("multipolygon")
            rel_admin.append(None)
        # maybe an inner ring from a closed way
        cl = wid[closed & (fg < 0)]
        if len(cl) and rng.random() < 0.5:
            rel_id.append(rid)
            member_type.append(1)
            member_ref.append(int(cl[int(rng.integers(0, len(cl)))]))
            role.append("inner")
            rel_tag_type.append("multipolygon")
            rel_admin.append(None)
        rid += 1
    # boundary relations over random open ways
    open_ways = wid[~closed]
    for _ in range(max(3, len(open_ways) // 20)):
        k = int(rng.integers(2, 6))
        for m in rng.choice(open_ways, size=min(k, len(open_ways)), replace=False):
            rel_id.append(rid)
            member_type.append(1)
            member_ref.append(int(m))
            role.append("")
            rel_tag_type.append("boundary")
            rel_admin.append(str(int(rng.integers(2, 11))))
        rid += 1
    # nested chain rel->rel->rel and a circular pair
    chain = [rid, rid + 1, rid + 2]
    for parent, child in zip(chain[:-1], chain[1:]):
        rel_id.append(parent)
        member_type.append(2)
        member_ref.append(child)
        role.append("")
        rel_tag_type.append("collection")
        rel_admin.append(None)
    rel_id.append(chain[2])
    member_type.append(1)
    member_ref.append(int(wid[0]))
    role.append("")
    rel_tag_type.append("collection")
    rel_admin.append(None)
    rid += 3
    a, b = rid, rid + 1  # circular pair
    for x, y in ((a, b), (b, a)):
        rel_id.append(x)
        member_type.append(2)
        member_ref.append(y)
        role.append("")
        rel_tag_type.append("collection")
        rel_admin.append(None)
    return pa.table(
        {
            "rel_id": pa.array(rel_id, pa.int64()),
            "member_type": pa.array(member_type, pa.int8()),
            "member_ref": pa.array(member_ref, pa.int64()),
            "role": pa.array(role, pa.string()),
            "rel_type": pa.array(rel_tag_type, pa.string()),
            "admin_level": pa.array(rel_admin, pa.string()),
        }
    )


def gen_changes(entities: pa.Table, n_batches: int = 3, seed: int = 42):
    """F6 change batches: ~1% of entities per batch Delete(1) / Modify(4)
    / Create(5), with cross-tile moves (ChangeType lattice,
    /root/reference/elements/elements.go:47-56)."""
    rng = np.random.default_rng(seed + 4)
    eid = entities["entity_id"].to_numpy()
    urls = entities["url"].to_pylist()
    n = len(eid)
    rows = {k: [] for k in ("seq", "change", "entity_id", "url", "lon", "lat", "name")}
    next_id = int(eid.max()) + 1 if n else 0
    for seq in range(1, n_batches + 1):
        m = max(1, n // 100)
        picks = rng.choice(n, size=m, replace=False)
        for p in picks:
            r = rng.random()
            if r < 0.3:
                ct = 1  # Delete
                lon = lat = 0
                e = int(eid[p])
                name = None
            elif r < 0.8:
                ct = 4  # Modify: move (often across tile boundaries)
                lon = int(rng.integers(-1_800_000_000, 1_800_000_000))
                lat = int(rng.integers(-900_000_000, 900_000_000))
                e = int(eid[p])
                name = f"POI_{e}"
            else:
                ct = 5  # Create
                lon = int(rng.integers(-1_800_000_000, 1_800_000_000))
                lat = int(rng.integers(-900_000_000, 900_000_000))
                e = next_id
                name = f"POI_{e}"
                next_id += 1
            rows["seq"].append(seq)
            rows["change"].append(ct)
            rows["entity_id"].append(e)
            rows["url"].append(urls[p])
            rows["lon"].append(lon)
            rows["lat"].append(lat)
            rows["name"].append(name)
    return pa.table(
        {
            "seq": pa.array(rows["seq"], pa.int64()),
            "change": pa.array(rows["change"], pa.int8()),
            "entity_id": pa.array(rows["entity_id"], pa.int64()),
            "url": pa.array(rows["url"], pa.string()),
            "lon": pa.array(rows["lon"], pa.int64()),
            "lat": pa.array(rows["lat"], pa.int64()),
            "name": pa.array(rows["name"], pa.string()),
        }
    )


def gen_raster_tiles(z: int = 8):
    """F7 slippy-grid raster tiles at one zoom: 16x16 float grid per tile,
    value = deterministic hash of (x, y, cell).

    The 2^z x 2^z x 256 value cube costs seconds of int64 modulo at z=8,
    so it is baked once per machine to /tmp (atomic rename) and
    mmap-loaded by every later process."""
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    xs = xs.ravel().astype(np.int64)
    ys = ys.ravel().astype(np.int64)
    cell = np.arange(256, dtype=np.int64)
    # values are small integers stored as float32 — exactly representable,
    # so SQL oracles can compare them without float-precision hedging
    # cache name embeds the value formula's constants: a stale file from
    # an older formula (or another checkout) can never be mistaken for
    # this one.  mmap read — consumers copy what they slice.
    cache = (f"/tmp/oqr_cache/raster_z{z}_"
             f"{73856093:x}-{19349663:x}-{83492791:x}-1000_f32.npy")
    try:
        vals = np.load(cache, mmap_mode="r")
        assert vals.shape == (n * n, 256) and vals.dtype == np.float32
    except Exception:
        a = xs * 73856093 ^ ys * 19349663
        c = cell * 83492791
        vals = ((a[:, None] ^ c[None, :]) % 1000).astype(np.float32)
        try:
            os.makedirs("/tmp/oqr_cache", exist_ok=True)
            tmp = f"{cache}.{os.getpid()}.tmp.npy"
            np.save(tmp, vals)
            os.replace(tmp, cache)
        except OSError:
            pass
    return pa.table(
        {
            "z": pa.array(np.full(len(xs), z, dtype=np.int32)),
            "x": pa.array(xs.astype(np.int32)),
            "y": pa.array(ys.astype(np.int32)),
            "values": pa.FixedSizeListArray.from_arrays(
                pa.array(vals.ravel(), pa.float32()), 256
            ),
        }
    )


def raster_value(z, x, y, cell):
    """Scalar/golden formula matching gen_raster_tiles."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    cell = np.asarray(cell, dtype=np.int64)
    return ((x * 73856093 ^ y * 19349663 ^ cell * 83492791) % 1000).astype(np.float32)


def write_fixture_dir(path: str, n_pages: int, seed: int = 42, n_ways: int | None = None):
    """Write all fixture tables as parquet under ``path`` (idempotent:
    skipped when the _SUCCESS marker exists)."""
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    pages, entities = gen_pages(n_pages, seed)
    pq.write_table(pages, os.path.join(path, "pages.parquet"))
    pq.write_table(entities, os.path.join(path, "geo_entities.parquet"))
    pq.write_table(gen_admin_polys(seed), os.path.join(path, "admin_polys.parquet"))
    ways = gen_way_segments(n_ways or max(n_pages // 10, 20), len(entities), seed)
    pq.write_table(ways, os.path.join(path, "way_segments.parquet"))
    pq.write_table(gen_rel_members(ways, seed), os.path.join(path, "rel_members.parquet"))
    pq.write_table(gen_changes(entities, 3, seed), os.path.join(path, "changes.parquet"))
    pq.write_table(gen_raster_tiles(8), os.path.join(path, "raster_tiles.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return path
