"""S2 and hexagonal cell indexes, vectorized.

``s2_cell_id`` is a from-scratch numpy implementation of the public S2
cell-ID algorithm (quadratic ST projection + Hilbert curve position, as
documented for s2geometry): lon/lat -> unit xyz -> cube face + (u,v) ->
(s,t) -> 30-bit (i,j) -> Hilbert position via 4-bit lookup tables ->
64-bit cell id, truncatable to any level 0..30.  The north_rule requires
an H3/S2-style cell index; the real H3 library is not available in this
environment, so ``hex_cell_id`` provides a genuine hexagonal binning
(axial coordinates + cube rounding on an equirectangular projection)
with the same interface — a documented stand-in, not ISEA H3.

These ids serve as companion partition keys next to the osmquadtree
``qt`` (SURVEY §1.2): same deepest-cell prefix-join patterns apply.
"""

from __future__ import annotations

import numpy as np

_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level, i, j, orig_orient, pos, orient):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orient] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for index in range(4):
        ij = r[index]
        _init_lookup(
            level, i + (ij >> 1), j + (ij & 1), orig_orient,
            pos + index, orient ^ _POS_TO_ORIENT[index],
        )


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.radians(lon_deg)
    lat = np.radians(lat_deg)
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x),      # +x
            (lambda: -x / y, lambda: z / y),     # +y
            (lambda: -x / z, lambda: -y / z),    # +z
            (lambda: z / x, lambda: y / x),      # -x
            (lambda: z / y, lambda: -x / y),     # -y
            (lambda: -y / z, lambda: -x / z),    # -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ufn(), u)
                v = np.where(m, vfn(), v)
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    # S2's quadratic projection; errstate: np.where evaluates both branches,
    # one of which takes sqrt of a negative for |u|>1/3 — the other wins
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s):
    return np.clip((s * (1 << 30)).astype(np.int64), 0, (1 << 30) - 1)


def s2_cell_id(lon_deg, lat_deg, level: int = 16) -> np.ndarray:
    """Vectorized S2 cell id at ``level`` (0..30) for lon/lat degrees."""
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    x, y, z = _lonlat_to_xyz(lon_deg, lat_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face << np.int64(60)
    bits = face & _SWAP
    mask = np.int64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits = bits + (((i >> np.int64(k * _LOOKUP_BITS)) & mask) << np.int64(_LOOKUP_BITS + 2))
        bits = bits + (((j >> np.int64(k * _LOOKUP_BITS)) & mask) << np.int64(2))
        bits = _LOOKUP_POS[bits]
        n = n | ((bits >> np.int64(2)) << np.int64(k * 2 * _LOOKUP_BITS))
        bits = bits & np.int64(_SWAP | _INVERT)
    leaf = n * np.int64(2) + np.int64(1)
    return s2_parent(leaf, level)


def s2_parent(cell_id, level: int) -> np.ndarray:
    """Truncate an S2 cell id to ``level`` (set the level's lsb marker)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (30 - level))
    return (cell_id & -lsb) | lsb


def s2_level(cell_id) -> np.ndarray:
    """Level of an S2 cell id = 30 - (trailing zero count / 2)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    tz = np.zeros(cell_id.shape, dtype=np.int64)
    v = lsb.astype(np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(s)) != 0
        tz[big] += s
        v = np.where(big, v >> np.uint64(s), v)
    return 30 - tz // 2


_HEX_BASE_DEG = 360.0  # res 0 hexagons span the whole longitude range


def hex_cell_id(lon_deg, lat_deg, res: int = 9) -> np.ndarray:
    """Hexagonal cell id (H3-style interface; documented fallback).

    Axial hex binning with flat-top hexagons on the equirectangular
    plane, cell size halving per resolution.  Packs (res, q, r) into an
    int64: ``res << 58 | (q + 2^28) << 29 | (r + 2^28)``.
    """
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    size = _HEX_BASE_DEG / (2.0**res)
    qf = (2.0 / 3.0 * lon) / size
    rf = (-1.0 / 3.0 * lon + np.sqrt(3.0) / 3.0 * lat) / size
    # cube rounding
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    q = rx.astype(np.int64)
    r = rz.astype(np.int64)
    return (
        (np.int64(res) << np.int64(58))
        | ((q + np.int64(1 << 28)) << np.int64(29))
        | (r + np.int64(1 << 28))
    )


def hex_cell_parent(cell_id, parent_res: int) -> np.ndarray:
    """Approximate parent: re-bin the cell's center at a coarser res."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = (cell_id >> np.int64(58)) & np.int64(31)
    q = ((cell_id >> np.int64(29)) & np.int64((1 << 29) - 1)) - (1 << 28)
    r = (cell_id & np.int64((1 << 29) - 1)) - (1 << 28)
    size = _HEX_BASE_DEG / (2.0 ** res.astype(np.float64))
    lon = 3.0 / 2.0 * q * size
    # invert r = (-lon/3 + sqrt(3)/3 * lat) / size
    lat = (r * size + lon / 3.0) * 3.0 / np.sqrt(3.0)
    return hex_cell_id(lon, lat, parent_res)
