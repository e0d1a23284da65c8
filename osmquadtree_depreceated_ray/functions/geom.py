"""Polygon / ring / z-order kernels, vectorized where it matters.

Semantics ported from the reference:

* ``pnpoly``      — even-odd crossing test, int64 coords with float64 edge
                    interpolation (/root/reference/quadtree/bbox.go:158-194);
                    vectorized over *points* (the big side), loop over the
                    polygon's few edges.
* ring area       — mercator-meter shoelace with the reference's exact
                    index structure and |area|/2 + ccw flag
                    (/root/reference/geometry/zorder.go:177-199).
* polygon area    — outer minus holes, reversing rings to canonical
                    orientation (zorder.go:149-168).
* lines/rings     — segment intersection + ring containment
                    (zorder.go:201-238).
* z_order         — ranked highway table, railway=5, layer*10,
                    bridge +1 / tunnel -1, explicit z_order override
                    (zorder.go:20-121).
* bbox algebra    — Intersects/ContainsXY (bbox.go:41-107).  NOTE: the
                    reference's ``Contains`` compares ``Miny > other.Minx``
                    (bbox.go:81) — a bug SURVEY §2 flags; we implement the
                    intended y-vs-y comparison.
"""

from __future__ import annotations

import numpy as np

from .quadtree import mercator

HW_ORDER = {
    "service": 1, "footway": 1, "path": 1, "footpath": 1, "cycleway": 1,
    "bridlepath": 1, "living_street": 2, "pedestrian": 2, "residential": 3,
    "unclassified": 3, "road": 3, "tertiary_link": 4, "tertiary": 4,
    "secondary_link": 6, "secondary": 6, "primary_link": 7, "primary": 7,
    "trunk_link": 8, "trunk": 8, "motorway_link": 9, "motorway": 9,
}

_FALSE_VALUES = {"0", "no", "false"}


def pnpoly(ring_lon: np.ndarray, ring_lat: np.ndarray,
           pt_lon: np.ndarray, pt_lat: np.ndarray) -> np.ndarray:
    """Even-odd point-in-ring for many points against one ring.

    int64 inputs; float64 edge interpolation as bbox.go:158-194.
    """
    pt_lon = np.asarray(pt_lon, dtype=np.int64)
    pt_lat = np.asarray(pt_lat, dtype=np.int64)
    n = len(ring_lon)
    inside = np.zeros(pt_lon.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        li, lj = int(ring_lat[i]), int(ring_lat[j])
        xi, xj = int(ring_lon[i]), int(ring_lon[j])
        crosses = (li > pt_lat) != (lj > pt_lat)
        if crosses.any() and lj != li:
            tp = (
                float(xj - xi) * (pt_lat - li).astype(np.float64) / float(lj - li)
                + float(xi)
            )
            inside ^= crosses & (pt_lon.astype(np.float64) < tp)
        j = i
    return inside


def bbox_intersects(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized Bbox.Intersects (bbox.go:59-73)."""
    return ~(
        (aminx > bmaxx) | (aminy > bmaxy) | (amaxx < bminx) | (amaxy < bminy)
    )


def bbox_contains_xy(minx, miny, maxx, maxy, x, y):
    """Vectorized Bbox.ContainsXY (bbox.go:93-107)."""
    return (minx <= x) & (miny <= y) & (maxx >= x) & (maxy >= y)


def bbox_contains(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Bbox contains other — intended semantics (reference bbox.go:76-90
    compares Miny against other.Minx on line 81; deliberately fixed here)."""
    return (
        (aminx <= bminx) & (aminy <= bminy) & (amaxx >= bmaxx) & (amaxy >= bmaxy)
    )


def drop_repeats(lon: np.ndarray, lat: np.ndarray):
    """Remove consecutive duplicate vertices (zorder.go:133-147)."""
    if len(lon) == 0:
        return lon, lat
    keep = np.ones(len(lon), dtype=bool)
    keep[1:] = (lon[1:] != lon[:-1]) | (lat[1:] != lat[:-1])
    return lon[keep], lat[keep]


def ring_area(lon: np.ndarray, lat: np.ndarray):
    """(abs_area, is_ccw) in mercator m² — exact shoelace structure of
    calculate_ring_area (zorder.go:177-199); expects a closed ring
    (first == last vertex)."""
    n = len(lon)
    if n < 3:
        return 0.0, False
    x, y = mercator(np.asarray(lon, np.float64) * 1e-7,
                    np.asarray(lat, np.float64) * 1e-7)
    # ss = sum_{i=1..n-1} x[i]*(y[i+1]-y[i-1]), wrapping the last term to
    # x[0]*(y[1]-y[n-2]) as the reference does
    ss = float(np.sum(x[1:-1] * (y[2:] - y[:-2])))
    ss += float(x[0] * (y[1] - y[n - 2]))
    return abs(ss) / 2.0, ss > 0


def check_ring(lon: np.ndarray, lat: np.ndarray) -> bool:
    """Closed (first==last) with >= 4 distinct-run points."""
    if len(lon) < 4:
        return False
    return lon[0] == lon[-1] and lat[0] == lat[-1]


def polygon_area(rings: list[tuple[np.ndarray, np.ndarray]]) -> float:
    """Outer ring area minus holes; rings re-oriented to the reference's
    canonical (outer cw-negative? — outer kept, holes subtracted) form
    (calculate_polygon_area, zorder.go:149-168)."""
    total = 0.0
    for i, (lon, lat) in enumerate(rings):
        lon, lat = drop_repeats(lon, lat)
        if len(lon) < 4:
            raise ValueError("Not enough points in ring")
        a, _ = ring_area(lon, lat)
        total += a if i == 0 else -a
    return total


def lines_intersect_many(p0, p1, q0, q1) -> np.ndarray:
    """Vectorized segment intersection (zorder.go:225-238).

    p0/p1: (2,) single segment endpoints; q0/q1: (n,2) arrays — or vice
    versa via broadcasting.  Uses the reference's parametric s/t test
    (shared-endpoint counts as intersecting, collinear divides by 0 ->
    inf/nan compares false, same as Go).
    """
    s1 = p1 - p0
    s2 = q1 - q0
    q = p0 - q0
    denom = -s2[..., 0] * s1[..., 1] + s1[..., 0] * s2[..., 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = (-s1[..., 1] * q[..., 0] + s1[..., 0] * q[..., 1]) / denom
        t = (s2[..., 0] * q[..., 1] - s2[..., 1] * q[..., 0]) / denom
    return (s >= 0) & (s <= 1) & (t >= 0) & (t <= 1)


def rings_intersect(alon, alat, blon, blat) -> bool:
    """Any segment of ring a intersects any segment of ring b
    (zorder.go:201-210), vectorized over the edge-pair grid."""
    a = np.stack([np.asarray(alon, np.float64), np.asarray(alat, np.float64)], axis=1)
    b = np.stack([np.asarray(blon, np.float64), np.asarray(blat, np.float64)], axis=1)
    p0 = a[:-1, None, :]
    p1 = a[1:, None, :]
    q0 = b[None, :-1, :]
    q1 = b[None, 1:, :]
    return bool(lines_intersect_many(p0, p1, q0, q1).any())


def ring_contains(outer_lon, outer_lat, inner_lon, inner_lat) -> bool:
    """Ring containment: no edge intersection + first inner vertex inside
    (zorder.go:218-223)."""
    if rings_intersect(outer_lon, outer_lat, inner_lon, inner_lat):
        return False
    return bool(
        pnpoly(outer_lon, outer_lat,
               np.asarray([inner_lon[0]]), np.asarray([inner_lat[0]]))[0]
    )


def find_zorder(highway, railway, layer, bridge, tunnel, z_order_tag):
    """Vectorized find_zorder (zorder.go:61-121) over string columns
    (None/'' for absent tags).  Returns int64 z-order per row."""
    import pandas as pd

    hw = pd.Series(highway, dtype="object").fillna("")
    rw = pd.Series(railway, dtype="object").fillna("")
    ly = pd.Series(layer, dtype="object").fillna("")
    br = pd.Series(bridge, dtype="object").fillna("")
    tu = pd.Series(tunnel, dtype="object").fillna("")
    zt = pd.Series(z_order_tag, dtype="object").fillna("")

    zo = hw.map(HW_ORDER).fillna(0).astype("int64")
    zo = zo.where(zo > 1, 0)  # reference only applies hworder when z > 1
    zo = np.maximum(zo, np.where(rw != "", 5, 0))

    l = pd.to_numeric(ly, errors="coerce").fillna(0).astype("int64")
    l = l + (~br.str.lower().isin(_FALSE_VALUES) & (br != "")).astype("int64")
    l = l - (~tu.str.lower().isin(_FALSE_VALUES) & (tu != "")).astype("int64")

    explicit = pd.to_numeric(zt, errors="coerce")
    zo = np.where(zt != "", explicit.fillna(0).astype("int64"), zo)
    return (zo + l.to_numpy() * 10).astype(np.int64)


def find_parent_highway(highways: list[str]) -> str:
    """Reducer for the node->parent-way join (zorder.go:242-279)."""
    if not highways:
        return ""
    if len(highways) == 1:
        return highways[0]
    mv = ""
    sc = 0
    for p in highways:
        s = HW_ORDER.get(p)
        if s is not None and (
            s > sc or (s == sc and mv.endswith("link")) or (s == sc and p < mv)
        ):
            mv = p
            sc = s
    if mv == "":
        counts: dict[str, int] = {}
        for p in highways:
            counts[p] = counts.get(p, 0) + 1
        maxm = 0
        for k, v in counts.items():
            if v > maxm:
                mv = k
                maxm = v
    return mv
