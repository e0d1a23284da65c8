"""Tag-filter + ring-assembly semantics (pure Python, no Ray).

Ports, with dict-based tags:
* TagTest style entries + style map (/root/reference/geometry/tags.go:17-47)
* tags Add/Clip merge lattice (tags.go:110-156): conflicting values
  collapse to "" and Clip removes them — the osm2pgsql-style relation
  tag reconciliation
* nodeTags / wayTags / IsFeature (makegeometries.go:43-120): style
  filtering, other_tags JSON fold, polygon-ness decision
* merge_rings / joinrings / check_ring (makegeometries.go:335-429):
  end-point-ref union-join of open linestrings into closed rings
* group_rings (makegeometries.go:431-470): assign inners to containing
  outers
* finish_rel (makegeometries.go:472-643): multipolygon assembly with
  outer-tag absorption and duplicate-tag suppression
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from . import geom

# --- style -----------------------------------------------------------------

DEFAULT_STYLE = {
    "highway": {"IsWay": True, "IsNode": True, "IsPoly": "no", "IsFeature": True},
    "area": {"IsWay": True, "IsNode": False, "IsPoly": "maybe", "IsFeature": False},
    "boundary": {"IsWay": True, "IsNode": False, "IsPoly": "yes", "IsFeature": True},
    "admin_level": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "name": {"IsWay": True, "IsNode": True, "IsPoly": "no", "IsFeature": False},
    "amenity": {"IsWay": True, "IsNode": True, "IsPoly": "maybe", "IsFeature": True},
    "place": {"IsWay": False, "IsNode": True, "IsPoly": "no", "IsFeature": True},
    "natural": {"IsWay": True, "IsNode": True, "IsPoly": "maybe", "IsFeature": True},
    "layer": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "bridge": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "tunnel": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "min_admin_level": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "max_admin_level": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "parent_highway": {"IsWay": False, "IsNode": True, "IsPoly": "no", "IsFeature": False},
    "bus_routes": {"IsWay": True, "IsNode": False, "IsPoly": "no", "IsFeature": False},
    "other_tags": {"IsWay": True, "IsNode": True, "IsPoly": "no", "IsFeature": False,
                   "Type": "json"},
}

_TRUE = {"1", "yes", "true"}


def is_true(v: str) -> bool:
    return v.lower() in _TRUE


def tags_add(base: dict, other: dict) -> None:
    """tagsMap.Add (tags.go:110-144): merge with conflict -> ''."""
    for k in sorted(other):
        v = other[k]
        if v == "":
            continue
        if k in base:
            if base[k] == "" or base[k] == v:
                continue
            base[k] = ""
        else:
            base[k] = v


def tags_clip(tags: dict) -> None:
    """tagsMap.Clip (tags.go:146-156): drop empty values."""
    for k in [k for k, v in tags.items() if v == ""]:
        del tags[k]


def _add_other_tags(tags: dict, rms: list[str], style: dict) -> None:
    # makegeometries.go:23-41
    ot = style.get("other_tags")
    if not (rms or "other_tags" in tags):
        return
    if ot is None:
        return
    if "other_tags" in tags:
        rms = rms + ["other_tags"]
    if ot.get("Type") == "json":
        mm = {t: tags.get(t, "") for t in rms}
        tags["other_tags"] = json.dumps(mm, separators=(",", ":"), sort_keys=True)


def node_tags(tags: dict, style: dict) -> bool:
    """nodeTags (makegeometries.go:43-70): filters IN PLACE, returns
    is-feature."""
    rms = []
    isfeat = False
    for k in sorted(tags):
        tt = style.get(k)
        if tt is None or not tt["IsNode"]:
            rms.append(k)
            continue
        if tt["IsFeature"]:
            isfeat = True
    _add_other_tags(tags, rms, style)
    for t in rms:
        tags.pop(t, None)
    return isfeat


def way_tags(tags: dict, style: dict) -> tuple[int, bool]:
    """wayTags (makegeometries.go:86-120): filters IN PLACE, returns
    (z_order, is_polygon)."""
    isp = False
    rms = []
    for k in sorted(tags):
        tt = style.get(k)
        if tt is None or not tt["IsWay"]:
            rms.append(k)
            continue
        if tt["IsPoly"] == "yes" or (k == "area" and is_true(tags[k])):
            isp = True
    if "boundary" in tags:  # checked before deletion, as the reference does
        isp = True
    _add_other_tags(tags, rms, style)
    for t in rms:
        tags.pop(t, None)
    zo = _zorder_from_tags(tags)
    return zo, isp


def is_feature(tags: dict, style: dict) -> bool:
    """IsFeature (makegeometries.go:74-84): any key with IsWay & IsFeature."""
    for k in tags:
        tt = style.get(k)
        if tt is not None and tt["IsWay"] and tt["IsFeature"]:
            return True
    return False


def _zorder_from_tags(tags: dict) -> int:
    # find_zorder (zorder.go:61-121) over a dict
    zo = 0
    l = 0
    haszo = tags.get("z_order", "")
    hw = tags.get("highway")
    if hw is not None:
        z = geom.HW_ORDER.get(hw)
        if z is not None and z > 1 and z > zo:
            zo = z
    if "railway" in tags:
        zo = max(zo, 5)
    if "layer" in tags:
        try:
            l += int(tags["layer"])
        except ValueError:
            pass
    if "bridge" in tags and tags["bridge"].lower() not in ("0", "no", "false"):
        l += 1
    if "tunnel" in tags and tags["tunnel"].lower() not in ("0", "no", "false"):
        l -= 1
    if haszo != "":
        try:
            zo = int(haszo)
        except ValueError:
            return 0
    return zo + l * 10


# --- rings -----------------------------------------------------------------
# A ring is (refs int64 array, lon int64 array, lat int64 array).


def join_rings(A, rev_a: bool, B, rev_b: bool):
    """joinrings (makegeometries.go:335-352): concatenate, dropping B's
    first point (shared endpoint)."""
    ra, la, oa = A
    rb, lb, ob = B
    if rev_a:
        ra, la, oa = ra[::-1], la[::-1], oa[::-1]
    if rev_b:
        rb, lb, ob = rb[::-1], lb[::-1], ob[::-1]
    return (
        np.concatenate([ra, rb[1:]]),
        np.concatenate([la, lb[1:]]),
        np.concatenate([oa, ob[1:]]),
    )


def check_ring_refs(ring) -> bool:
    """check_ring (makegeometries.go:354-362): closed by REF, >= 3 pts."""
    refs = ring[0]
    return len(refs) >= 3 and refs[0] == refs[-1]


def merge_rings(rings: list) -> list:
    """merge_rings (makegeometries.go:364-429): end-point-ref union-join.
    Exact port including the recursion and the `added` flag."""
    if len(rings) == 0:
        return []
    if len(rings) == 1:
        return list(rings)

    r0 = None
    a = b = None
    rem = []
    fin = []
    added = False
    for r in rings:
        refs = r[0]
        if refs[0] == refs[-1]:
            fin.append(r)
        elif r0 is None:
            r0 = r
            a = r0[0][0]
            b = r0[0][-1]
        elif refs[0] == a:
            r0 = join_rings(r0, True, r, False)
            a, b = r0[0][0], r0[0][-1]
            added = True
        elif refs[0] == b:
            r0 = join_rings(r0, False, r, False)
            a, b = r0[0][0], r0[0][-1]
            added = True
        elif refs[-1] == a:
            r0 = join_rings(r0, True, r, True)
            a, b = r0[0][0], r0[0][-1]
            added = True
        elif refs[-1] == b:
            r0 = join_rings(r0, False, r, True)
            a, b = r0[0][0], r0[0][-1]
            added = True
        else:
            rem.append(r)
    if r0 is not None:
        if a == b or not added:
            fin.append(r0)
        else:
            rem.append(r0)
    if rem:
        fin.extend(merge_rings(rem))
    return fin


def group_rings(outers: list, inners: list, allow_loose: bool = True):
    """group_rings (makegeometries.go:431-470): list of polygons, each a
    list of rings (outer first)."""
    if len(outers) == 1:
        return [[outers[0]] + list(inners)]
    if len(inners) == 0:
        return [[o] for o in outers]
    ans = [[o] for o in outers]
    for z, inner in enumerate(inners):
        added = False
        for grp in ans:
            o = grp[0]
            if geom.ring_contains(o[1], o[2], inner[1], inner[2]):
                grp.append(inner)
                added = True
                # reference `continue`s within the loop — an inner can be
                # attached to several containing outers
        if not added and not allow_loose:
            raise ValueError(f"inner {z} not contained by any outer")
    return ans


@dataclass
class WayGeom:
    way_id: int
    geom_type: int  # 2 linestring, 3 polygon
    refs: np.ndarray
    lon: np.ndarray
    lat: np.ndarray
    tags: dict
    z_order: int = 0
    area: float = 0.0
    removed: list = field(default_factory=list)


def finish_rel(
    rel_id: int,
    rel_tags: dict,
    members: list,  # ordered [(way_id, role)]
    ways: dict,  # way_id -> WayGeom (only those available)
    style: dict,
):
    """finishRel (makegeometries.go:472-643) minus the streaming release
    bookkeeping (handled by the caller): returns
    (rel_geom | None, removed_tag_marks {way_id: [keys]}).

    rel_geom = dict(geom_type=3|6, groups=[[ring...]], tags, z_order, area).
    """
    isboundary = "boundary" in rel_tags
    outers = []
    inners = []
    outer_tags: dict = {}
    outer_refs = []
    for way_id, role in members:
        wy = ways.get(way_id)
        if wy is None:
            continue
        ring = (wy.refs, wy.lon, wy.lat)
        if role == "inner":
            inners.append(ring)
        else:
            outers.append(ring)
            if not isboundary:
                tags_add(outer_tags, wy.tags)
            outer_refs.append(way_id)

    removed: dict[int, list[str]] = {}
    if not outers:
        return None, removed

    outer_rings = [r for r in merge_rings(outers) if check_ring_refs(r)]
    inner_rings = [r for r in merge_rings(inners) if check_ring_refs(r)]
    if not outer_rings:
        return None, removed

    groups = group_rings(outer_rings, inner_rings, allow_loose=True)

    rt = dict(rel_tags)
    tags_add(rt, outer_tags)
    tags_clip(rt)
    zo, isp = way_tags(rt, style)
    if not rt or not isp:
        return None, removed

    if not isboundary:
        for w in outer_refs:
            wy = ways.get(w)
            if wy is None or not wy.tags:
                continue
            marks = [k for k, v in rt.items() if wy.tags.get(k) == v]
            if marks:
                removed.setdefault(w, []).extend(marks)

    area = 0.0
    for grp in groups:
        try:
            area += geom.polygon_area([(r[1], r[2]) for r in grp])
        except ValueError:
            pass

    geom_type = 3 if len(groups) == 1 else 6
    return (
        {
            "rel_id": rel_id,
            "geom_type": geom_type,
            "groups": groups,
            "tags": rt,
            "z_order": zo,
            "area": area,
        },
        removed,
    )
