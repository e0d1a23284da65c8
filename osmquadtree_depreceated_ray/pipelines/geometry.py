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

Ray-Data shape — every join is a bucketed hash shuffle over keyed rows
(stages/shuffle.py), so each stage holds only its bucket:

* J2/J5 + M6-M8: union(vertex rows, way-tag rows, admin-donation rows)
  keyed by way_id -> per-bucket assembly into way-geometry rows
* A3/J4: union(node rows, parent-way fan-out rows) keyed by entity_id
  -> per-bucket Common-qt fold + parent-highway reduction
* J6: way-geometry fan-out to parent relations keyed by rel_id ->
  per-bucket finishRel; tag-absorption marks flow back to ways through
  one more bucketed join
* only RELATION METADATA (tags + ordered member lists) and the
  way->parent-relations index are broadcast via ray.put (the small side;
  the geometries themselves always stream through shuffles), and the A4
  relation-qt propagation runs on the driver over one row per relation.
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

_TAG_COLS = ("highway", "area", "layer", "bridge", "tunnel")


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


def build_way_vertices(entities_ds, refs_ds):
    """J2 phase 1: (entity_id, way_id, pos) x (entity_id, lon, lat) ->
    vertex rows, via one bucketed hash join on entity_id."""
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

    return bucketed_apply(both, ["entity_id"], join_coords)


def _way_assembly_fn(style):
    """Per-bucket way assembly: vertex rows + tag rows + admin-donation
    rows (all keyed way_id) -> way geometry rows (M6-M8 + A2)."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        verts = g[g["kind"] == "vert"].sort_values(["way_id", "pos"])
        tags_rows = g[g["kind"] == "tags"].set_index("way_id")
        admin_rows = g[g["kind"] == "admin"].groupby("way_id")["a_val"].agg(list)

        out = {k: [] for k in ("way_id", "geom_type", "refs", "lons", "lats",
                               "tags", "z_order", "area", "qt")}
        for w, grp in verts.groupby("way_id", sort=False):
            refs = grp["entity_id"].to_numpy(np.int64)
            lons = grp["lon"].to_numpy(np.int64)
            lats = grp["lat"].to_numpy(np.int64)
            tags = {}
            if w in tags_rows.index:
                row = tags_rows.loc[w]
                if isinstance(row, pd.DataFrame):
                    row = row.iloc[0]
                raw = row["tags_json"]
                if isinstance(raw, str) and raw:
                    tags = json.loads(raw)
            if w in admin_rows.index:  # J5 donation
                admin_levels(tags, [str(v) for v in admin_rows.loc[w]])
            zo, isp = TR.way_tags(tags, style)
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
            qt = int(
                calculate(
                    np.asarray([lons.min()]), np.asarray([lats.min()]),
                    np.asarray([lons.max()]), np.asarray([lats.max()]),
                    0.05, 18,
                )[0]
            )
            out["way_id"].append(int(w))
            out["geom_type"].append(gtype)
            out["refs"].append(refs.tolist())
            out["lons"].append(lons.tolist())
            out["lats"].append(lats.tolist())
            out["tags"].append(json.dumps(tags, sort_keys=True))
            out["z_order"].append(zo)
            out["area"].append(float(area))
            out["qt"].append(qt)
        return pd.DataFrame(out)

    return assemble


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


def _node_join_fn(style, point_qt_buffer=0.05):
    """Per-bucket A3/J4: node rows + parent-way fan-out rows keyed
    entity_id -> node feature rows."""

    def join(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g[g["kind"] == "node"]
        parents = g[g["kind"] == "parent"]
        out = {k: [] for k in ("node_id", "lon", "lat", "tags", "qt", "feature")}
        if len(parents):
            pq_min = parents.groupby("entity_id")["p_qt"].min()
            pq_max = parents.groupby("entity_id")["p_qt"].max()
            pq_dep = parents.groupby("entity_id")["p_depth"].min()
            hw_lists = (
                parents[parents["p_hw"].notna() & (parents["p_hw"] != "")]
                .groupby("entity_id")["p_hw"].agg(list)
            )
        else:
            pq_min = pq_max = pq_dep = hw_lists = pd.Series(dtype="object")
        for _, r in nodes.iterrows():
            e = int(r["entity_id"])
            tags = _node_tags_row(r["n_kind"], r["n_name"], e)
            if e in pq_min.index:
                # A3: Common over parent way qts == round(common(min,max),
                # min depth) on the qt pre-order (mixed depths handled)
                c = int(qt_common(np.asarray([int(pq_min.loc[e])]),
                                  np.asarray([int(pq_max.loc[e])]))[0])
                lvl = min(int(c & 31), int(pq_dep.loc[e]))
                q = int(qt_round(np.asarray([c]), lvl)[0])
            else:
                q = int(calculate_point(np.asarray([int(r["lon"])]),
                                        np.asarray([int(r["lat"])]),
                                        point_qt_buffer, 18)[0])
            if "highway" in tags:  # J4 parent value reduction
                hw = G.find_parent_highway(
                    list(hw_lists.loc[e]) if e in hw_lists.index else []
                )
                if hw:
                    tags["parent_highway"] = hw
            feat = TR.node_tags(tags, style)
            out["node_id"].append(e)
            out["lon"].append(int(r["lon"]))
            out["lat"].append(int(r["lat"]))
            out["tags"].append(json.dumps(tags, sort_keys=True))
            out["qt"].append(q)
            out["feature"].append(bool(feat))
        return pd.DataFrame(out)

    return join


def _feature_row(fid, orig, gtype, tags, zo, area, lons_all, lats_all, wkb):
    minx, miny = int(np.min(lons_all)), int(np.min(lats_all))
    maxx, maxy = int(np.max(lons_all)), int(np.max(lats_all))
    q = int(calculate(np.asarray([minx]), np.asarray([miny]),
                      np.asarray([maxx]), np.asarray([maxy]), 0.025, 18)[0])
    return {
        "feature_id": int(fid), "orig_type": int(orig), "geom_type": int(gtype),
        "tags": json.dumps(tags, sort_keys=True) if isinstance(tags, dict) else tags,
        "z_order": int(zo), "area": float(area), "qt": q,
        "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy, "wkb": wkb,
    }


_FEATURE_SCHEMA = pa.schema(
    [
        ("feature_id", pa.int64()), ("orig_type", pa.int8()),
        ("geom_type", pa.int8()), ("tags", pa.string()),
        ("z_order", pa.int64()), ("area", pa.float64()), ("qt", pa.int64()),
        ("minx", pa.int64()), ("miny", pa.int64()),
        ("maxx", pa.int64()), ("maxy", pa.int64()), ("wkb", pa.binary()),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return _FEATURE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_FEATURE_SCHEMA)


def _way_feature_batch(b: pa.Table, held: np.ndarray, style) -> pa.Table:
    """Free-standing way geometries -> feature rows (skips rel-held ways)."""
    rows = []
    for i in range(b.num_rows):
        w = int(b.column("way_id")[i].as_py())
        p = np.searchsorted(held, w)
        if p < len(held) and held[p] == w:
            continue
        tags = json.loads(b.column("tags")[i].as_py())
        if not TR.is_feature(tags, style):
            continue
        lons = np.asarray(b.column("lons")[i].as_py(), np.int64)
        lats = np.asarray(b.column("lats")[i].as_py(), np.int64)
        gtype = int(b.column("geom_type")[i].as_py())
        wkb = (WKB.polygon_wkb([(lons, lats)]) if gtype == GEOM_POLYGON
               else WKB.linestring_wkb(lons, lats))
        rows.append(_feature_row(w, 1, gtype, b.column("tags")[i].as_py(),
                                 int(b.column("z_order")[i].as_py()),
                                 float(b.column("area")[i].as_py()),
                                 lons, lats, wkb))
    return _rows_to_table(rows)


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

    # --- row sources --------------------------------------------------------
    wid = ways_table.column("way_id").to_numpy()
    refs = ways_table.column("refs").to_pylist()
    refs_rows = [
        (int(r), int(w), p)
        for w, rr in zip(wid, refs)
        for p, r in enumerate(rr)
    ]
    refs_ds = ray.data.from_pandas(
        pd.DataFrame(refs_rows, columns=["entity_id", "way_id", "pos"])
    )

    tag_data = {c: ways_table.column(c).to_pylist() for c in _TAG_COLS}
    way_tag_rows = pd.DataFrame(
        {
            "way_id": wid,
            "tags_json": [
                json.dumps(
                    {c: tag_data[c][i] for c in _TAG_COLS if tag_data[c][i] is not None},
                    sort_keys=True,
                )
                for i in range(len(wid))
            ],
        }
    )
    rel_df = rels_table.to_pandas()
    adm = rel_df[
        (rel_df["rel_type"] == "boundary") & (rel_df["member_type"] == 1)
        & rel_df["admin_level"].notna()
    ]
    admin_rows = pd.DataFrame(
        {"way_id": adm["member_ref"].astype("int64"),
         "a_val": adm["admin_level"].astype(str)}
    )

    # --- J2 + M6-M8: way geometries (two bucketed shuffles) ----------------
    verts = build_way_vertices(entities_ds, refs_ds)
    way_cols = {
        "way_id": pa.int64(), "pos": pa.int64(), "entity_id": pa.int64(),
        "lon": pa.int64(), "lat": pa.int64(), "tags_json": pa.string(),
        "a_val": pa.string(), "kind": pa.string(),
    }

    def kindify(kind):
        def fn(b: pa.Table) -> pa.Table:
            return _align(
                b.append_column("kind", pa.array([kind] * b.num_rows)), way_cols
            )

        return fn

    way_inputs = (
        verts.map_batches(kindify("vert"), batch_format="pyarrow")
        .union(ray.data.from_pandas(way_tag_rows)
               .map_batches(kindify("tags"), batch_format="pyarrow"))
        .union(ray.data.from_pandas(admin_rows)
               .map_batches(kindify("admin"), batch_format="pyarrow"))
    )
    way_geoms = bucketed_apply(
        way_inputs, ["way_id"], _way_assembly_fn(style)
    ).materialize()

    # --- A3 + J4: nodes (bucketed join on entity_id) ------------------------
    def parent_fanout(b: pa.Table) -> pa.Table:
        e, q, d, hw = [], [], [], []
        for i in range(b.num_rows):
            tags = json.loads(b.column("tags")[i].as_py())
            phw = tags.get("highway", "")
            wqt = int(b.column("qt")[i].as_py())
            for r in b.column("refs")[i].as_py():
                e.append(int(r))
                q.append(wqt)
                d.append(wqt & 31)
                hw.append(phw)
        return pa.table(
            {"entity_id": pa.array(e, pa.int64()), "p_qt": pa.array(q, pa.int64()),
             "p_depth": pa.array(d, pa.int64()), "p_hw": pa.array(hw, pa.string())}
        )

    node_cols = {
        "entity_id": pa.int64(), "lon": pa.int64(), "lat": pa.int64(),
        "n_kind": pa.string(), "n_name": pa.string(),
        "p_qt": pa.int64(), "p_depth": pa.int64(), "p_hw": pa.string(),
        "kind": pa.string(),
    }

    def node_rows(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "entity_id": b.column("entity_id"),
                "lon": b.column("lon"),
                "lat": b.column("lat"),
                "n_kind": b.column("kind"),
                "n_name": b.column("name"),
            }
        ).append_column("kind", pa.array(["node"] * b.num_rows))
        return _align(t, node_cols)

    def parent_rows(b: pa.Table) -> pa.Table:
        return _align(
            b.append_column("kind", pa.array(["parent"] * b.num_rows)), node_cols
        )

    node_inputs = entities_ds.map_batches(node_rows, batch_format="pyarrow").union(
        way_geoms.map_batches(parent_fanout, batch_format="pyarrow")
        .map_batches(parent_rows, batch_format="pyarrow")
    )
    node_geoms = bucketed_apply(node_inputs, ["entity_id"],
                                _node_join_fn(style)).materialize()

    # --- J6: relation assembly ----------------------------------------------
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
    held = np.sort(np.asarray(list(way_to_rels), dtype=np.int64))
    meta_ref = ray.put({"members": rel_members, "tags": rel_tags_map,
                        "w2r": way_to_rels, "style": style})

    def rel_fanout(b: pa.Table) -> pa.Table:
        w2r = ray.get(meta_ref)["w2r"]
        out_rel, out_payload = [], []
        for i in range(b.num_rows):
            w = int(b.column("way_id")[i].as_py())
            rels = w2r.get(w)
            if not rels:
                continue
            payload = json.dumps(
                {
                    "way_id": w,
                    "geom_type": int(b.column("geom_type")[i].as_py()),
                    "refs": b.column("refs")[i].as_py(),
                    "lons": b.column("lons")[i].as_py(),
                    "lats": b.column("lats")[i].as_py(),
                    "tags": b.column("tags")[i].as_py(),
                    "z_order": int(b.column("z_order")[i].as_py()),
                    "area": float(b.column("area")[i].as_py()),
                }
            )
            for rid in rels:
                out_rel.append(rid)
                out_payload.append(payload)
        return pa.table(
            {"rel_id": pa.array(out_rel, pa.int64()),
             "payload": pa.array(out_payload, pa.string())}
        )

    def assemble_rels(g: pd.DataFrame) -> pd.DataFrame:
        meta = ray.get(meta_ref)
        out = {"row_kind": [], "rel_id": [], "way_id": [], "removed_key": [],
               "feature": []}
        for rid, grp in g.groupby("rel_id", sort=False):
            ways = {}
            for pj in grp["payload"]:
                d = json.loads(pj)
                ways[d["way_id"]] = TR.WayGeom(
                    way_id=d["way_id"], geom_type=d["geom_type"],
                    refs=np.asarray(d["refs"], np.int64),
                    lon=np.asarray(d["lons"], np.int64),
                    lat=np.asarray(d["lats"], np.int64),
                    tags=json.loads(d["tags"]),
                    z_order=d["z_order"], area=d["area"],
                )
            gm, removed = TR.finish_rel(
                int(rid), meta["tags"][int(rid)], meta["members"][int(rid)],
                ways, meta["style"],
            )
            if gm is not None:
                all_lon = np.concatenate([r[1] for gp in gm["groups"] for r in gp])
                all_lat = np.concatenate([r[2] for gp in gm["groups"] for r in gp])
                if gm["geom_type"] == GEOM_POLYGON:
                    wkb = WKB.polygon_wkb([(r[1], r[2]) for r in gm["groups"][0]])
                else:
                    wkb = WKB.multipolygon_wkb(
                        [[(r[1], r[2]) for r in gp] for gp in gm["groups"]]
                    )
                feat = _feature_row(gm["rel_id"], 2, gm["geom_type"], gm["tags"],
                                    gm["z_order"], gm["area"], all_lon, all_lat,
                                    wkb)
                feat["wkb"] = feat["wkb"].hex()
                out["row_kind"].append("rel_geom")
                out["rel_id"].append(int(rid))
                out["way_id"].append(-1)
                out["removed_key"].append(json.dumps(feat))
                out["feature"].append(True)
            for w, ks in removed.items():
                for k in ks:
                    out["row_kind"].append("removed")
                    out["rel_id"].append(int(rid))
                    out["way_id"].append(int(w))
                    out["removed_key"].append(k)
                    out["feature"].append(False)
        return pd.DataFrame(out)

    # NOTE: a way shared by several relations is fanned out to each; the
    # rel bucket sees its own copy (geometries are immutable rows here)
    rel_stream = way_geoms.map_batches(rel_fanout, batch_format="pyarrow")
    rel_results = bucketed_apply(rel_stream, ["rel_id"], assemble_rels,
                                 n_buckets=8).materialize()
    rel_res_df = rel_results.to_pandas() if rel_results.count() else pd.DataFrame(
        {"row_kind": [], "rel_id": [], "way_id": [], "removed_key": [],
         "feature": []}
    )
    rel_feature_rows = [
        json.loads(s) for s in rel_res_df[rel_res_df["row_kind"] == "rel_geom"][
            "removed_key"]
    ]
    for fr in rel_feature_rows:
        fr["wkb"] = bytes.fromhex(fr["wkb"])
    removed_df = rel_res_df[rel_res_df["row_kind"] == "removed"][
        ["way_id", "removed_key"]]

    # released held ways: apply absorption marks, keep if still a feature
    removed_map: dict[int, set] = {}
    for _, r in removed_df.iterrows():
        removed_map.setdefault(int(r["way_id"]), set()).add(r["removed_key"])
    rm_ref = ray.put(removed_map)

    def released_ways(b: pa.Table) -> pa.Table:
        marks = ray.get(rm_ref)
        rows = []
        for i in range(b.num_rows):
            w = int(b.column("way_id")[i].as_py())
            p = np.searchsorted(held, w)
            if not (p < len(held) and held[p] == w):
                continue
            tags = json.loads(b.column("tags")[i].as_py())
            for k in marks.get(w, ()):  # absorption deletions
                tags.pop(k, None)
            if not TR.is_feature(tags, style):
                continue
            lons = np.asarray(b.column("lons")[i].as_py(), np.int64)
            lats = np.asarray(b.column("lats")[i].as_py(), np.int64)
            gtype = int(b.column("geom_type")[i].as_py())
            wkb = (WKB.polygon_wkb([(lons, lats)]) if gtype == GEOM_POLYGON
                   else WKB.linestring_wkb(lons, lats))
            rows.append(_feature_row(w, 1, gtype,
                                     json.dumps(tags, sort_keys=True),
                                     int(b.column("z_order")[i].as_py()),
                                     float(b.column("area")[i].as_py()),
                                     lons, lats, wkb))
        return _rows_to_table(rows)

    # --- A4: relation qt (small driver graph over distributed member qts) ---
    way_qt_df = way_geoms.select_columns(["way_id", "qt"]).to_pandas()
    way_qt = dict(zip(way_qt_df["way_id"].astype(int),
                      way_qt_df["qt"].astype(int)))
    rel_qt: dict[int, int] = {}
    rel_rel_edges = []
    for rid, grp in rel_df.groupby("rel_id"):
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
                    qt_common(np.asarray([rel_qt[k]]),
                              np.asarray([rel_qt.get(v, -1)]))[0]
                )
    rel_qt = {k: (0 if v == -1 else v) for k, v in rel_qt.items()}

    # --- final features (distributed per-batch construction + write) -------
    def node_features(b: pa.Table) -> pa.Table:
        rows = []
        for i in range(b.num_rows):
            if not b.column("feature")[i].as_py():
                continue
            lon = int(b.column("lon")[i].as_py())
            lat = int(b.column("lat")[i].as_py())
            rows.append(_feature_row(int(b.column("node_id")[i].as_py()), 0,
                                     GEOM_POINT, b.column("tags")[i].as_py(),
                                     0, 0.0, np.asarray([lon]), np.asarray([lat]),
                                     WKB.point_wkb(lon, lat)))
        return _rows_to_table(rows)

    feats = (
        node_geoms.map_batches(node_features, batch_format="pyarrow")
        .union(way_geoms.map_batches(
            lambda b: _way_feature_batch(b, held, style), batch_format="pyarrow"))
        .union(way_geoms.map_batches(released_ways, batch_format="pyarrow"))
    )
    parts = [
        b.cast(_FEATURE_SCHEMA)
        for b in feats.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    feats_tbl = pa.concat_tables(parts) if parts else _FEATURE_SCHEMA.empty_table()
    rel_tbl = _rows_to_table(rel_feature_rows)
    table = pa.concat_tables([feats_tbl, rel_tbl])

    import pyarrow.parquet as pq2

    pq2.write_table(table, os.path.join(out_dir, "features.parquet"))
    ot = table.column("orig_type").to_numpy()
    return {
        "features": table.num_rows,
        "nodes": int((ot == 0).sum()),
        "ways": int((ot == 1).sum()),
        "relations": int((ot == 2).sum()),
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
