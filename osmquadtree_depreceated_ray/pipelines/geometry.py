"""Geometry-construction pipeline (reference P3, SURVEY §3):

    entities(nodes) + way_segments + rel_members
      -> J2  coord join (way refs x node coords, bucketed hash join)
      -> A2  way bbox agg -> way qt (buffer 0.05, level 18)
      -> A3  node qt = Common(parent way qts) else point qt
      -> J4  parent-way tag donation to nodes (parent_highway)
      -> J5  relation-range tag donation to ways (min/max_admin_level)
      -> M6-M8 tag filter, polygon decision, z_order, shoelace area
      -> J6  multipolygon assembly (merge_rings/group_rings/finishRel
             with osm2pgsql tag absorption)
      -> A4  relation qt = Common over members + 5 propagation rounds
      -> re-calc qt from geometry bbox (buffer 0.025, geometry.go:311-317)
      -> features parquet (wkb, geom_type, z_order, area, bbox, qt)
         + optional newline-GeoJSON

Ray-Data shape: every order-dependent trick of the reference (the
ancestor-tile coord store, subtree watermarks) is replaced by explicit
hash-bucketed shuffles (stages/shuffle.py); small sides (relation
metadata, way tags) are broadcast via ray.put; the big sides (node
coords, way vertices) stream through map_batches.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import geom as G
from ..functions import tags_rings as TR
from ..functions import wkb as WKB
from ..functions.quadtree import calculate, calculate_point, qt_common, qt_round
from ..stages.shuffle import bucketed_apply

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3
GEOM_MULTI = 6


def _node_tags_row(kind: str, name: str, entity_id: int) -> dict:
    tags = {"name": name}
    if kind == "poi":
        tags["amenity"] = "poi"
    elif kind == "city":
        tags["place"] = "city"
    else:
        tags["natural"] = "peak"
    if entity_id % 11 == 0:
        tags["highway"] = "crossing"  # exercises the J4 parent join
    return tags


def _align(t: pa.Table, cols: dict[str, pa.DataType]) -> pa.Table:
    arrays = []
    for name, typ in cols.items():
        if name in t.column_names:
            arrays.append(t.column(name).cast(typ))
        else:
            arrays.append(pa.nulls(t.num_rows, typ))
    return pa.table(dict(zip(cols.keys(), arrays)))


def build_way_vertices(entities_ds, ways_table: pa.Table):
    """J2: attach per-vertex coords to ways via two bucketed shuffles.
    Returns Dataset of (way_id, refs, lons, lats) with arrays in ref
    order."""
    import ray

    refs_rows = []
    wid = ways_table.column("way_id").to_numpy()
    refs = ways_table.column("refs").to_pylist()
    for w, rr in zip(wid, refs):
        for pos, r in enumerate(rr):
            refs_rows.append((int(r), int(w), pos))
    refs_df = pd.DataFrame(refs_rows, columns=["entity_id", "way_id", "pos"])
    refs_ds = ray.data.from_pandas(refs_df)

    cols = {
        "entity_id": pa.int64(),
        "way_id": pa.int64(),
        "pos": pa.int64(),
        "lon": pa.int64(),
        "lat": pa.int64(),
        "side": pa.string(),
    }

    def tag_side(side):
        def fn(b: pa.Table) -> pa.Table:
            t = b.append_column("side", pa.array([side] * b.num_rows))
            return _align(t, cols)

        return fn

    both = refs_ds.map_batches(tag_side("ref"), batch_format="pyarrow").union(
        entities_ds.map_batches(tag_side("node"), batch_format="pyarrow")
    )

    def join_coords(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g[g["side"] == "node"][["entity_id", "lon", "lat"]]
        rr = g[g["side"] == "ref"][["entity_id", "way_id", "pos"]]
        m = rr.merge(nodes, on="entity_id", how="inner")
        return m[["way_id", "pos", "entity_id", "lon", "lat"]]

    vertices = bucketed_apply(both, ["entity_id"], join_coords)

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["way_id", "pos"])
        out = g.groupby("way_id", sort=False).agg(
            refs=("entity_id", list), lons=("lon", list), lats=("lat", list)
        )
        return out.reset_index()

    return bucketed_apply(vertices, ["way_id"], assemble)


def _way_tags_map(ways_table: pa.Table) -> dict[int, dict]:
    out = {}
    cols = ["highway", "area", "layer", "bridge", "tunnel"]
    data = {c: ways_table.column(c).to_pylist() for c in cols}
    wid = ways_table.column("way_id").to_numpy()
    for i, w in enumerate(wid):
        tags = {c: data[c][i] for c in cols if data[c][i] is not None}
        out[int(w)] = tags
    return out


def _relation_ranges(rels_table: pa.Table) -> dict[int, list[str]]:
    """J5 prep: way_id -> donated admin_level values from boundary rels."""
    df = rels_table.to_pandas()
    df = df[(df["rel_type"] == "boundary") & (df["member_type"] == 1)]
    df = df[df["admin_level"].notna()]
    out: dict[int, list[str]] = {}
    for w, al in zip(df["member_ref"], df["admin_level"]):
        out.setdefault(int(w), []).append(str(al))
    return out


def admin_levels(tags: dict, values: list[str]) -> bool:
    """AdminLevels (relationrange.go:27-43)."""
    nums = []
    for s in values:
        try:
            nums.append(int(s))
        except ValueError:
            pass
    if not nums:
        return False
    tags["min_admin_level"] = str(min(nums))
    tags["max_admin_level"] = str(max(nums))
    return True


def route_list(tags: dict, key: str, values: list[str]) -> bool:
    """RouteList.Proc (relationrange.go:50-69)."""
    if not values:
        return False
    tags[key] = ";".join(sorted(set(values)))
    return True


def build_geometries(fixture_dir: str, out_dir: str,
                     style: dict | None = None) -> dict:
    import pyarrow.parquet as pq
    import ray

    style = style or TR.DEFAULT_STYLE
    os.makedirs(out_dir, exist_ok=True)

    entities_ds = ray.data.read_parquet(
        os.path.join(fixture_dir, "geo_entities.parquet")
    )
    ways_table = pq.read_table(os.path.join(fixture_dir, "way_segments.parquet"))
    rels_table = pq.read_table(os.path.join(fixture_dir, "rel_members.parquet"))

    # --- J2: way vertices ---------------------------------------------------
    way_verts = build_way_vertices(entities_ds, ways_table).materialize()

    # --- small-side broadcasts ----------------------------------------------
    way_tags_map = _way_tags_map(ways_table)
    rel_ranges = _relation_ranges(rels_table)
    wt_ref = ray.put({"tags": way_tags_map, "ranges": rel_ranges, "style": style})

    # --- way geometries (M6-M8 + A2 qt) ------------------------------------
    class MakeWayGeoms:
        def __init__(self):
            d = ray.get(wt_ref)
            self.tags = d["tags"]
            self.ranges = d["ranges"]
            self.style = d["style"]

        def __call__(self, b: pa.Table) -> pa.Table:
            rows = {
                "way_id": [], "geom_type": [], "refs": [], "lons": [], "lats": [],
                "tags": [], "z_order": [], "area": [], "qt": [],
            }
            for i in range(b.num_rows):
                w = int(b.column("way_id")[i].as_py())
                refs = np.asarray(b.column("refs")[i].as_py(), dtype=np.int64)
                lons = np.asarray(b.column("lons")[i].as_py(), dtype=np.int64)
                lats = np.asarray(b.column("lats")[i].as_py(), dtype=np.int64)
                tags = dict(self.tags.get(w, {}))
                if w in self.ranges:  # J5 donation
                    admin_levels(tags, self.ranges[w])
                zo, isp = TR.way_tags(tags, self.style)
                if isp:
                    isp = len(refs) >= 3 and refs[0] == refs[-1]
                area = 0.0
                gtype = GEOM_LINESTRING
                if isp:
                    gtype = GEOM_POLYGON
                    try:
                        area = G.polygon_area([(lons, lats)])
                    except ValueError:
                        area = 0.0
                # A2: way qt from bbox
                qt = int(
                    calculate(
                        np.asarray([lons.min()]), np.asarray([lats.min()]),
                        np.asarray([lons.max()]), np.asarray([lats.max()]),
                        0.05, 18,
                    )[0]
                )
                rows["way_id"].append(w)
                rows["geom_type"].append(gtype)
                rows["refs"].append(refs.tolist())
                rows["lons"].append(lons.tolist())
                rows["lats"].append(lats.tolist())
                rows["tags"].append(json.dumps(tags, sort_keys=True))
                rows["z_order"].append(zo)
                rows["area"].append(area)
                rows["qt"].append(qt)
            return pa.table(
                {
                    "way_id": pa.array(rows["way_id"], pa.int64()),
                    "geom_type": pa.array(rows["geom_type"], pa.int64()),
                    "refs": pa.array(rows["refs"], pa.list_(pa.int64())),
                    "lons": pa.array(rows["lons"], pa.list_(pa.int64())),
                    "lats": pa.array(rows["lats"], pa.list_(pa.int64())),
                    "tags": pa.array(rows["tags"], pa.string()),
                    "z_order": pa.array(rows["z_order"], pa.int64()),
                    "area": pa.array(rows["area"], pa.float64()),
                    "qt": pa.array(rows["qt"], pa.int64()),
                }
            )

    way_geoms = way_verts.map_batches(
        MakeWayGeoms, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()

    # --- A3 + J4: node qt from parent ways; parent_highway ------------------
    wg_df = way_geoms.to_pandas()  # fixture scale; see docstring note
    node_parent_qt: dict[int, list[int]] = {}
    node_parent_hw: dict[int, list[str]] = {}
    for _, r in wg_df.iterrows():
        tags = json.loads(r["tags"])
        hw = tags.get("highway")
        for ref in r["refs"]:
            node_parent_qt.setdefault(int(ref), []).append(int(r["qt"]))
            if hw:
                node_parent_hw.setdefault(int(ref), []).append(hw)
    np_ref = ray.put({"qt": node_parent_qt, "hw": node_parent_hw, "style": style})

    class MakeNodeGeoms:
        def __init__(self):
            d = ray.get(np_ref)
            self.parent_qt = d["qt"]
            self.parent_hw = d["hw"]
            self.style = d["style"]

        def __call__(self, b: pa.Table) -> pa.Table:
            eid = b.column("entity_id").to_numpy()
            lon = b.column("lon").to_numpy()
            lat = b.column("lat").to_numpy()
            kind = b.column("kind").to_pylist()
            name = b.column("name").to_pylist()
            pt_qt = calculate_point(lon, lat, 0.05, 18)
            out = {k: [] for k in ("node_id", "lon", "lat", "tags", "qt", "feature")}
            for i, e in enumerate(eid):
                tags = _node_tags_row(kind[i], name[i], int(e))
                pq_list = self.parent_qt.get(int(e))
                if pq_list:  # A3: Common over parent way qts
                    q = -1
                    for p in pq_list:
                        q = int(qt_common(np.asarray([q]), np.asarray([p]))[0])
                else:
                    q = int(pt_qt[i])
                if "highway" in tags:  # J4 parent value reduction
                    hw = G.find_parent_highway(self.parent_hw.get(int(e), []))
                    if hw:
                        tags["parent_highway"] = hw
                feat = TR.node_tags(tags, self.style)
                out["node_id"].append(int(e))
                out["lon"].append(int(lon[i]))
                out["lat"].append(int(lat[i]))
                out["tags"].append(json.dumps(tags, sort_keys=True))
                out["qt"].append(q)
                out["feature"].append(feat)
            return pa.table(
                {
                    "node_id": pa.array(out["node_id"], pa.int64()),
                    "lon": pa.array(out["lon"], pa.int64()),
                    "lat": pa.array(out["lat"], pa.int64()),
                    "tags": pa.array(out["tags"], pa.string()),
                    "qt": pa.array(out["qt"], pa.int64()),
                    "feature": pa.array(out["feature"], pa.bool_()),
                }
            )

    node_geoms = entities_ds.map_batches(
        MakeNodeGeoms, batch_format="pyarrow", concurrency=(1, 4)
    )

    # --- J6: relation assembly ----------------------------------------------
    rel_df = rels_table.to_pandas()
    mp = rel_df[
        rel_df["rel_type"].isin(["boundary", "multipolygon"])
        & (rel_df["member_type"] == 1)
    ]
    rel_members: dict[int, list] = {}
    rel_tags_map: dict[int, dict] = {}
    way_to_rels: dict[int, list[int]] = {}
    for _, r in mp.iterrows():
        rid = int(r["rel_id"])
        w = int(r["member_ref"])
        rel_members.setdefault(rid, []).append((w, r["role"]))
        way_to_rels.setdefault(w, []).append(rid)
        t = rel_tags_map.setdefault(rid, {"type": r["rel_type"]})
        if r["rel_type"] == "boundary":
            t["boundary"] = "administrative"
            if r["admin_level"] is not None and not pd.isna(r["admin_level"]):
                t["admin_level"] = str(r["admin_level"])

    held_ways = set(way_to_rels)
    rel_geoms = []
    removed_marks: dict[int, list[str]] = {}
    ways_for_rel: dict[int, TR.WayGeom] = {}
    for _, r in wg_df.iterrows():
        w = int(r["way_id"])
        if w in held_ways:
            ways_for_rel[w] = TR.WayGeom(
                way_id=w,
                geom_type=int(r["geom_type"]),
                refs=np.asarray(r["refs"], np.int64),
                lon=np.asarray(r["lons"], np.int64),
                lat=np.asarray(r["lats"], np.int64),
                tags=json.loads(r["tags"]),
                z_order=int(r["z_order"]),
                area=float(r["area"]),
            )
    for rid, members in rel_members.items():
        gm, removed = TR.finish_rel(
            rid, rel_tags_map[rid], members, ways_for_rel, style
        )
        if gm is not None:
            rel_geoms.append(gm)
        for w, ks in removed.items():
            removed_marks.setdefault(w, []).extend(ks)

    # release held ways: apply tag absorption, keep if still a feature
    released = []
    for w, wy in ways_for_rel.items():
        tags = dict(wy.tags)
        for k in removed_marks.get(w, []):
            tags.pop(k, None)
        if TR.is_feature(tags, style):
            released.append((w, wy, tags))

    # --- A4: relation qt (Common over members + 5 rel->rel rounds) ----------
    way_qt = {int(r["way_id"]): int(r["qt"]) for _, r in wg_df.iterrows()}
    rel_qt: dict[int, int] = {}
    all_rels = rel_df.groupby("rel_id")
    rel_rel_edges = []
    for rid, grp in all_rels:
        q = -1
        for _, m in grp.iterrows():
            if m["member_type"] == 1 and int(m["member_ref"]) in way_qt:
                q = int(qt_common(np.asarray([q]),
                                  np.asarray([way_qt[int(m["member_ref"])]]))[0])
            elif m["member_type"] == 2:
                rel_rel_edges.append((int(rid), int(m["member_ref"])))
        rel_qt[int(rid)] = q
    for _ in range(5):  # fixed 5 propagation rounds (resortwaynodes.go:767-824)
        for k, v in rel_rel_edges:
            if v in rel_qt:
                rel_qt[k] = int(
                    qt_common(np.asarray([rel_qt[k]]), np.asarray([rel_qt.get(v, -1)]))[0]
                )
    rel_qt = {k: (0 if v == -1 else v) for k, v in rel_qt.items()}

    # --- final feature table -------------------------------------------------
    feats = {k: [] for k in (
        "feature_id", "orig_type", "geom_type", "tags", "z_order", "area",
        "qt", "minx", "miny", "maxx", "maxy", "wkb",
    )}

    def add_feature(fid, orig, gtype, tags, zo, area, lons_all, lats_all, wkb):
        minx, miny = int(np.min(lons_all)), int(np.min(lats_all))
        maxx, maxy = int(np.max(lons_all)), int(np.max(lats_all))
        # geometry re-calc qt: buffer 0.025 (geometry.go:311-317)
        q = int(calculate(np.asarray([minx]), np.asarray([miny]),
                          np.asarray([maxx]), np.asarray([maxy]), 0.025, 18)[0])
        feats["feature_id"].append(fid)
        feats["orig_type"].append(orig)
        feats["geom_type"].append(gtype)
        feats["tags"].append(json.dumps(tags, sort_keys=True))
        feats["z_order"].append(zo)
        feats["area"].append(area)
        feats["qt"].append(q)
        feats["minx"].append(minx)
        feats["miny"].append(miny)
        feats["maxx"].append(maxx)
        feats["maxy"].append(maxy)
        feats["wkb"].append(wkb)

    # nodes (distributed part collected: feature nodes only)
    node_df = node_geoms.to_pandas()
    for _, r in node_df[node_df["feature"]].iterrows():
        add_feature(
            int(r["node_id"]), 0, GEOM_POINT, json.loads(r["tags"]), 0, 0.0,
            np.asarray([r["lon"]]), np.asarray([r["lat"]]),
            WKB.point_wkb(int(r["lon"]), int(r["lat"])),
        )
    # free-standing ways (not held by any relation)
    for _, r in wg_df.iterrows():
        w = int(r["way_id"])
        if w in held_ways:
            continue
        tags = json.loads(r["tags"])
        if not TR.is_feature(tags, style):
            continue
        lons = np.asarray(r["lons"], np.int64)
        lats = np.asarray(r["lats"], np.int64)
        if int(r["geom_type"]) == GEOM_POLYGON:
            wkb = WKB.polygon_wkb([(lons, lats)])
        else:
            wkb = WKB.linestring_wkb(lons, lats)
        add_feature(w, 1, int(r["geom_type"]), tags, int(r["z_order"]),
                    float(r["area"]), lons, lats, wkb)
    # released relation member ways
    for w, wy, tags in released:
        if wy.geom_type == GEOM_POLYGON:
            wkb = WKB.polygon_wkb([(wy.lon, wy.lat)])
        else:
            wkb = WKB.linestring_wkb(wy.lon, wy.lat)
        add_feature(w, 1, wy.geom_type, tags, wy.z_order, wy.area,
                    wy.lon, wy.lat, wkb)
    # relations
    for gm in rel_geoms:
        all_lon = np.concatenate([r[1] for grp in gm["groups"] for r in grp])
        all_lat = np.concatenate([r[2] for grp in gm["groups"] for r in grp])
        if gm["geom_type"] == GEOM_POLYGON:
            wkb = WKB.polygon_wkb([(r[1], r[2]) for r in gm["groups"][0]])
        else:
            wkb = WKB.multipolygon_wkb(
                [[(r[1], r[2]) for r in grp] for grp in gm["groups"]]
            )
        add_feature(int(gm["rel_id"]), 2, gm["geom_type"], gm["tags"],
                    gm["z_order"], gm["area"], all_lon, all_lat, wkb)

    table = pa.table(
        {
            "feature_id": pa.array(feats["feature_id"], pa.int64()),
            "orig_type": pa.array(feats["orig_type"], pa.int8()),
            "geom_type": pa.array(feats["geom_type"], pa.int8()),
            "tags": pa.array(feats["tags"], pa.string()),
            "z_order": pa.array(feats["z_order"], pa.int64()),
            "area": pa.array(feats["area"], pa.float64()),
            "qt": pa.array(feats["qt"], pa.int64()),
            "minx": pa.array(feats["minx"], pa.int64()),
            "miny": pa.array(feats["miny"], pa.int64()),
            "maxx": pa.array(feats["maxx"], pa.int64()),
            "maxy": pa.array(feats["maxy"], pa.int64()),
            "wkb": pa.array(feats["wkb"], pa.binary()),
        }
    )
    import pyarrow.parquet as pq2

    pq2.write_table(table, os.path.join(out_dir, "features.parquet"))
    return {
        "features": table.num_rows,
        "nodes": int(node_df["feature"].sum()),
        "ways": int(sum(1 for t in feats["orig_type"] if t == 1)),
        "relations": len(rel_geoms),
        "rel_qt": rel_qt,
        "out": os.path.join(out_dir, "features.parquet"),
    }


def write_geojson(features_path: str, out_path: str) -> int:
    """S9: features parquet -> newline-delimited GeoJSON features."""
    import pyarrow.parquet as pq

    t = pq.read_table(features_path)
    n = 0
    with open(out_path, "w") as f:
        for i in range(t.num_rows):
            gtype = int(t.column("geom_type")[i].as_py())
            tags = json.loads(t.column("tags")[i].as_py())
            fid = int(t.column("feature_id")[i].as_py())
            wkb_bytes = t.column("wkb")[i].as_py()
            coords = _wkb_to_coords(wkb_bytes)
            f.write(WKB.feature_geojson(gtype, coords, tags, fid) + "\n")
            n += 1
    return n


def _wkb_to_coords(buf: bytes):
    """Minimal WKB reader for our own emitted geometries (round-trip)."""
    import struct

    def read_ring(off):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off)
        off += 16 * n
        lon = (arr[0::2] * 1e7).round().astype(np.int64)
        lat = (arr[1::2] * 1e7).round().astype(np.int64)
        return (lon, lat), off

    (kind,) = struct.unpack_from("<I", buf, 1)
    if kind == 1:
        x, y = struct.unpack_from("<dd", buf, 5)
        return int(round(x * 1e7)), int(round(y * 1e7))
    if kind == 2:
        ring, _ = read_ring(5)
        return ring
    if kind == 3:
        (nr,) = struct.unpack_from("<I", buf, 5)
        off = 9
        rings = []
        for _ in range(nr):
            ring, off = read_ring(off)
            rings.append(ring)
        return rings
    # multipolygon
    (np_,) = struct.unpack_from("<I", buf, 5)
    off = 9
    polys = []
    for _ in range(np_):
        (nr,) = struct.unpack_from("<I", buf, off + 5)
        o2 = off + 9
        rings = []
        for _ in range(nr):
            ring, o2 = read_ring(o2)
            rings.append(ring)
        polys.append(rings)
        off = o2
    return polys
