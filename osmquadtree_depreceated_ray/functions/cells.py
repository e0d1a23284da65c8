"""S2 and hexagonal cell indexes, vectorized.

``s2_cell_id`` is a from-scratch numpy implementation of the public S2
cell-ID algorithm (quadratic ST projection + Hilbert curve position, as
documented for s2geometry): lon/lat -> unit xyz -> cube face + (u,v) ->
(s,t) -> 30-bit (i,j) -> Hilbert position via 4-bit lookup tables ->
64-bit cell id, truncatable to any level 0..30.  ``s2_cell_id`` IS
canonically numbered (matches the published S2 algorithm bit for bit).

The north_rule requires an H3/S2-style cell index; ``icosa_cell_id``
is a from-scratch icosahedral aperture-7 hex index built exactly as
the public H3 design describes (gnomonic projection per icosahedron
face, sqrt(7) scale + 19.1066-degree rotation per resolution) — same
geometry and same aggregation/join properties as H3, but **NOT
canonical H3 numbering**: the canonical ids depend on the reference
implementation's 122-entry base-cell assignment and orientation
tables, which are data, not derivable geometry.  Ids from this module
are deterministic and self-consistent (parent/child containment,
equal-area-ish cells, prefix joins) but are NOT interchangeable with
ids from the `h3` library — hence the column is named ``cell_hex``,
not ``cell_h3``.  ``hex_cell_id`` remains as a cheap planar hexagonal
binning (axial coordinates + cube rounding on an equirectangular
projection) with the same interface.

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


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial hex coordinates to the nearest hex center
    (cube rounding)."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


# --------------------------------------------------------------------------
# Icosahedral aperture-7 hex index (the H3 construction, from scratch)
# --------------------------------------------------------------------------
#
# Genuine icosahedral hexagonal DGGS exactly as the public H3 design
# documents describe the construction: project each point gnomonically
# onto the tangent plane of its nearest icosahedron face, lay a hexagonal
# lattice on that plane, and refine by aperture 7 — each resolution
# shrinks the lattice by sqrt(7) and rotates it by
# alpha = atan(sqrt(3)/5) ~= 19.1066 degrees (the argument of the
# Eisenstein integer 2 + omega whose norm is 7).  Orientation and cell
# numbering differ from Uber's library (different icosahedron rotation,
# no pentagon base-cell table); the geometry of the index is the same.

_PHI = (1.0 + np.sqrt(5.0)) / 2.0
_ICO_VERTS = np.array(
    [
        (-1, _PHI, 0), (1, _PHI, 0), (-1, -_PHI, 0), (1, -_PHI, 0),
        (0, -1, _PHI), (0, 1, _PHI), (0, -1, -_PHI), (0, 1, -_PHI),
        (_PHI, 0, -1), (_PHI, 0, 1), (-_PHI, 0, -1), (-_PHI, 0, 1),
    ],
    dtype=np.float64,
)
_ICO_VERTS /= np.linalg.norm(_ICO_VERTS, axis=1, keepdims=True)
_ICO_FACES = np.array(
    [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ],
    dtype=np.int64,
)
_FACE_CENTERS = _ICO_VERTS[_ICO_FACES].mean(axis=1)
_FACE_CENTERS /= np.linalg.norm(_FACE_CENTERS, axis=1, keepdims=True)
# per-face orthonormal tangent basis: x-axis toward the face's first
# vertex, y-axis = center x x-axis
_FACE_AX = _ICO_VERTS[_ICO_FACES[:, 0]] - (
    (_ICO_VERTS[_ICO_FACES[:, 0]] * _FACE_CENTERS).sum(axis=1, keepdims=True)
    * _FACE_CENTERS
)
_FACE_AX /= np.linalg.norm(_FACE_AX, axis=1, keepdims=True)
_FACE_AY = np.cross(_FACE_CENTERS, _FACE_AX)

_AP7_ALPHA = np.arctan2(np.sqrt(3.0), 5.0)  # 19.1066 deg
_SQRT7 = np.sqrt(7.0)
# res-0 lattice size: the face circumradius maps to tan(~37.38 deg) on
# the gnomonic plane; one res-0 hexagon comfortably covers a face
_ICOSA_SIZE0 = 1.0
_ICOSA_MAX_RES = 15  # |q|,|r| < 2^23 holds through res 15


def icosa_cell_id(lon_deg, lat_deg, res: int = 9) -> np.ndarray:
    """Icosahedral aperture-7 hex cell id at ``res`` (0..15), vectorized.

    Packs (res, face, q, r) into an int64:
    ``res << 54 | face << 48 | (q + 2^23) << 24 | (r + 2^23)``.
    """
    if not 0 <= res <= _ICOSA_MAX_RES:
        raise ValueError(f"res must be 0..{_ICOSA_MAX_RES}")
    x, y, z = _lonlat_to_xyz(
        np.asarray(lon_deg, np.float64), np.asarray(lat_deg, np.float64)
    )
    p = np.stack([x, y, z], axis=-1)
    dots = p @ _FACE_CENTERS.T
    face = np.argmax(dots, axis=-1)
    pc = np.take_along_axis(dots, face[..., None], axis=-1)[..., 0]
    ax = _FACE_AX[face]
    ay = _FACE_AY[face]
    # gnomonic projection onto the face tangent plane
    u = (p * ax).sum(axis=-1) / pc
    v = (p * ay).sum(axis=-1) / pc
    # aperture-7 refinement: rotate by res*alpha, scale by sqrt(7)^res
    theta = res * _AP7_ALPHA
    ct, st = np.cos(theta), np.sin(theta)
    ur = u * ct + v * st
    vr = -u * st + v * ct
    size = _ICOSA_SIZE0 / _SQRT7**res
    qf = (np.sqrt(3.0) / 3.0 * ur - vr / 3.0) / size
    rf = (2.0 / 3.0 * vr) / size
    q, r = _cube_round(qf, rf)
    return (
        (np.int64(res) << np.int64(54))
        | (face.astype(np.int64) << np.int64(48))
        | ((q + np.int64(1 << 23)) << np.int64(24))
        | (r + np.int64(1 << 23))
    )


def icosa_cell_decode(cell_id) -> tuple[np.ndarray, ...]:
    """(res, face, q, r) components of an icosa cell id."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = (cell_id >> np.int64(54)) & np.int64(63)
    face = (cell_id >> np.int64(48)) & np.int64(63)
    q = ((cell_id >> np.int64(24)) & np.int64((1 << 24) - 1)) - (1 << 23)
    r = (cell_id & np.int64((1 << 24) - 1)) - (1 << 23)
    return res, face, q, r


def icosa_cell_parent(cell_id, parent_res: int) -> np.ndarray:
    """Parent cell at ``parent_res``: re-bin the cell center's face-plane
    coordinates at the coarser resolution (same face, exact inverse of
    the child binning — no trigonometry reruns)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res, face, q, r = icosa_cell_decode(cell_id)
    size = _ICOSA_SIZE0 / _SQRT7**res.astype(np.float64)
    # axial -> face-plane cartesian at the child resolution
    ur = size * np.sqrt(3.0) * (q + r / 2.0)
    vr = size * 1.5 * r
    # undo the child rotation, apply the parent rotation
    theta = parent_res * _AP7_ALPHA - res.astype(np.float64) * _AP7_ALPHA
    ct, st = np.cos(theta), np.sin(theta)
    up = ur * ct + vr * st
    vp = -ur * st + vr * ct
    psize = _ICOSA_SIZE0 / _SQRT7**parent_res
    qf = (np.sqrt(3.0) / 3.0 * up - vp / 3.0) / psize
    rf = (2.0 / 3.0 * vp) / psize
    pq, pr = _cube_round(qf, rf)
    return (
        (np.int64(parent_res) << np.int64(54))
        | (face << np.int64(48))
        | ((pq + np.int64(1 << 23)) << np.int64(24))
        | (pr + np.int64(1 << 23))
    )


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


# --------------------------------------------------------------- geohash

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH32_BYTES = np.frombuffer(_GEOHASH32.encode(), dtype=np.uint8)


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Interleave-with-zeros (Morton spread) of an up-to-32-bit int64."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & np.int64(0x0000FFFF0000FFFF)
    v = (v | (v << 8)) & np.int64(0x00FF00FF00FF00FF)
    v = (v | (v << 4)) & np.int64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << 2)) & np.int64(0x3333333333333333)
    v = (v | (v << 1)) & np.int64(0x5555555555555555)
    return v


def geohash_encode(lon_int, lat_int, precision: int = 8) -> np.ndarray:
    """Canonical geohash (Niemeyer base32) of integer 1e-7-degree
    coordinates — PURE int64 arithmetic, so the SQL oracle reproduces
    it bit-for-bit (no float in the chain, unlike the mercator qt).

    The first 5*precision bits of the standard bisection are exactly
    ``lonb = floor((lon+180) / 360 * 2^nlon)`` interleaved with the
    analogous lat bits (lon first); on 1e-7-deg ints that floor is an
    integer floor-division.  precision <= 12 keeps the products within
    int64.  Returns an object array of `precision`-char strings.
    """
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    lon = np.asarray(lon_int, dtype=np.int64)
    lat = np.asarray(lat_int, dtype=np.int64)
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lonb = ((lon + np.int64(1_800_000_000)) << np.int64(nlon)) \
        // np.int64(3_600_000_000)
    latb = ((lat + np.int64(900_000_000)) << np.int64(nlat)) \
        // np.int64(1_800_000_000)
    # exact-east/north edge (lon == +180 etc.) folds into the last cell
    lonb = np.minimum(lonb, np.int64((1 << nlon) - 1))
    latb = np.minimum(latb, np.int64((1 << nlat) - 1))
    if nlon == nlat:
        # even precision: lon bit i sits at position 2i+1
        g = _spread_bits32(latb) | (_spread_bits32(lonb) << np.int64(1))
    else:
        # odd precision: lon has one extra (lowest) bit at position 0
        g = _spread_bits32(lonb) | (_spread_bits32(latb) << np.int64(1))
    shifts = np.arange(precision - 1, -1, -1, dtype=np.int64) * 5
    idx = (g[:, None] >> shifts[None, :]) & np.int64(31)
    codes = _GEOHASH32_BYTES[idx]
    return codes.view(f"S{precision}").ravel().astype(str)
