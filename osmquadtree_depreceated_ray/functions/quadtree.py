"""Vectorized quadtree-ID kernels.

Semantics follow the reference implementation
(/root/reference/quadtree/quadtree.go) exactly:

* A quadtree tile ID is an int64 of 28 interleaved x/y bit *pairs* plus 5
  depth bits: ``xyxy...xy ddddd`` (quadtree.go:19-38).  Pair ``i`` (level
  ``i+1``) occupies bits ``62-2i, 61-2i``; depth is ``qt & 31``.
  ``-1`` is the Null tile.
* ``calculate`` finds the *deepest* tile whose (buffer-expanded) bounds
  fully contain a bbox, by recursive quadrant descent with the exact
  branch order of ``findQuad`` (quadtree.go:62-86), mercator-warping the
  y axis first (quadtree.go:44-59) and nudging degenerate boxes by
  +0.0000001 (quadtree.go:48-53).
* Coordinates everywhere are int64 units of 1e-7 degree
  (/root/reference/quadtree/bbox.go:12-31).

Everything here is pure numpy over arrays (no Python loop over rows): the
descent is a fixed ``max_level``-iteration loop over whole arrays.
"""

from __future__ import annotations

import numpy as np

MAX_LON = 1_800_000_000
MAX_LAT = MAX_LON // 2
MIN_LON = -MAX_LON
MIN_LAT = -MAX_LAT

EARTH_HALF_CIRCUM = 20037508.3428  # quadtree.go:303

NULL_QT = np.int64(-1)


def to_float(i):
    """int 1e-7-deg -> float degrees (bbox.go:12-14: float64(i)*0.0000001)."""
    return np.asarray(i, dtype=np.float64) * 0.0000001


def to_int(f):
    """float degrees -> int 1e-7-deg with the reference's away-from-zero
    rounding (bbox.go:16-21)."""
    f = np.asarray(f, dtype=np.float64)
    return np.where(f < 0, (f * 1e7 - 0.5), (f * 1e7 + 0.5)).astype(np.int64)


def merc(y):
    """Degrees lat -> 'mercator degrees' in [-inf, inf], ~[-180,180] for
    |lat|<85 (quadtree.go:295-297).

    Beyond the poles (|lat| > 90, reachable via the reference's +1e-7
    point-bbox nudge) tan() goes negative and log() yields NaN; NaN
    compares false in findQuad exactly like the Go original, so descent
    just stops — suppress the numpy warning for that benign case.
    """
    y = np.asarray(y, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.log(np.tan(np.pi * (1.0 + y / 90.0) / 4.0)) * 90.0 / np.pi


def unmerc(d):
    """Inverse of :func:`merc` (quadtree.go:299-301)."""
    d = np.asarray(d, dtype=np.float64)
    return (np.arctan(np.exp(d * np.pi / 90.0)) * 4.0 / np.pi - 1.0) * 90.0


def mercator(lon, lat):
    """lon/lat degrees -> spherical-mercator metres (quadtree.go:306-308)."""
    lon = np.asarray(lon, dtype=np.float64)
    return lon * EARTH_HALF_CIRCUM / 180.0, merc(lat) * EARTH_HALF_CIRCUM / 90.0


def unmercator(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return x * 180.0 / EARTH_HALF_CIRCUM, unmerc(y * 90.0 / EARTH_HALF_CIRCUM)


def _find_quad(mx, my, Mx, My, bf, active):
    """Vectorized ``findQuad`` (quadtree.go:62-86) — branch order preserved.

    Returns int8 array of quadrant 0..3, or -1 (no quadrant contains the
    buffered box).  ``active`` masks rows still descending.
    """
    aMx, amx = np.abs(Mx), np.abs(mx)
    aMy, amy = np.abs(My), np.abs(my)

    oob = (mx < (-1 - bf)) | (my < (-1 - bf)) | (Mx > (1 + bf)) | (My > (1 + bf))

    c0 = (Mx <= 0) & (my >= 0)
    c1 = (mx >= 0) & (my >= 0)
    c2 = (Mx <= 0) & (My <= 0)
    c3 = (mx >= 0) & (My <= 0)
    # buffered fallbacks, same order as the reference
    b0 = (Mx < bf) & (aMx < amx) & (my > -bf) & (aMy >= amy)
    b1 = (mx > -bf) & (aMx >= amx) & (my > -bf) & (aMy >= amy)
    b2 = (Mx < bf) & (aMx < amx) & (My < bf) & (aMy < amy)
    b3 = (mx > -bf) & (aMx >= amx) & (My < bf) & (aMy < amy)

    q = np.select(
        [~active, oob, c0, c1, c2, c3, b0, b1, b2, b3],
        [np.int8(-1)] * 2 + [np.int8(0), np.int8(1), np.int8(2), np.int8(3)] * 2,
        default=np.int8(-1),
    )
    return q


def calculate(minx, miny, maxx, maxy, buffer: float = 0.05, max_level: int = 18):
    """Vectorized ``quadtree.Calculate`` (quadtree.go:44-113, 246-251).

    Args are int64 arrays in 1e-7-deg units.  Returns int64 qt array
    (-1 for invalid boxes).
    """
    mx = to_float(minx)
    my = to_float(miny)
    Mx = to_float(maxx)
    My = to_float(maxy)

    invalid = (mx > Mx) | (my > My)  # quadtree.go:45-47 -> -1

    # degenerate-box nudges (quadtree.go:48-53)
    Mx = np.where(Mx == mx, Mx + 0.0000001, Mx)
    My = np.where(My == my, My + 0.0000001, My)

    my = merc(my) / 90.0
    My = merc(My) / 90.0
    mx = mx / 180.0
    Mx = Mx / 180.0

    n = mx.shape[0] if mx.ndim else 1
    mx, my, Mx, My = (np.atleast_1d(a).copy() for a in (mx, my, Mx, My))

    result = np.zeros(n, dtype=np.int64)
    depth = np.zeros(n, dtype=np.int64)
    active = ~np.atleast_1d(invalid)

    for cl in range(max_level):
        if not active.any():
            break
        q = _find_quad(mx, my, Mx, My, buffer, active)
        hit = q >= 0
        active = active & hit
        # accumulate pair bits at positions (62-2cl, 61-2cl) and depth+1
        result[hit] += q[hit].astype(np.int64) << np.int64(61 - 2 * cl)
        depth[hit] += 1
        # recenter the chosen quadrant onto [-1,1]^2 and double
        # (quadtree.go:98-112)
        left = hit & ((q == 0) | (q == 2))
        right = hit & ((q == 1) | (q == 3))
        bottom = hit & ((q == 2) | (q == 3))
        top = hit & ((q == 0) | (q == 1))
        mx[left] += 0.5
        Mx[left] += 0.5
        mx[right] -= 0.5
        Mx[right] -= 0.5
        my[bottom] += 0.5
        My[bottom] += 0.5
        my[top] -= 0.5
        My[top] -= 0.5
        mx[hit] *= 2.0
        my[hit] *= 2.0
        Mx[hit] *= 2.0
        My[hit] *= 2.0

    out = result + depth
    out[np.atleast_1d(invalid)] = -1
    return out


def _spread2(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def calculate_point(lon, lat, buffer: float = 0.05, max_level: int = 18):
    """qt for point features: bbox (lon, lat, lon+1, lat+1) exactly as
    the reference's node path (/root/reference/calcqts/resortwaynodes.go:705).

    Fast path: every arithmetic step of the descent loop is an exact IEEE
    op (doubling, +-0.5, +-1 on small magnitudes), so the level-L
    quadrant decisions equal the binary digits of the normalized
    coordinates.  If BOTH corners of the point box fall in the same
    finest-level dyadic cell (and strictly in bounds), no quadrant
    boundary crosses the box at any level, no buffered branch can fire,
    and the result is exactly the Morton interleave of the cell indices.
    The ~0.1% of points straddling a finest-level boundary (or out of
    range / non-finite after the mercator warp) take the exact loop.
    Pinned against the scalar reference port by tests.
    """
    lon = np.asarray(lon, dtype=np.int64)
    lat = np.asarray(lat, dtype=np.int64)
    L = max_level
    if L < 1:
        return calculate(lon, lat, lon + 1, lat + 1, buffer, max_level)

    x0 = to_float(lon) / 180.0
    x1 = to_float(lon + 1) / 180.0
    y0 = merc(to_float(lat)) / 90.0
    y1 = merc(to_float(lat + 1)) / 90.0

    half = np.int64(1) << (L - 1)
    with np.errstate(invalid="ignore", over="ignore"):
        fin = np.isfinite(y0) & np.isfinite(y1)
        x0s = np.where(fin, x0, 0.0)
        x1s = np.where(fin, x1, 0.0)
        y0s = np.where(fin, y0, 0.0)
        y1s = np.where(fin, y1, 0.0)
        cx0 = np.floor(x0s * half).astype(np.int64) + half
        cx1 = np.floor(x1s * half).astype(np.int64) + half
        cy0 = np.floor(y0s * half).astype(np.int64) + half
        cy1 = np.floor(y1s * half).astype(np.int64) + half
    n_cells = np.int64(1) << L
    safe = (
        fin
        & (cx0 == cx1) & (cy0 == cy1)
        & (cx0 >= 0) & (cx0 < n_cells) & (cy0 >= 0) & (cy0 < n_cells)
    )
    y_slippy = (n_cells - 1) - cy0
    inter = _spread2(cx0) | (_spread2(np.where(safe, y_slippy, 0)) << 1)
    fast = (inter << np.int64(63 - 2 * L)) | np.int64(L)

    out = np.where(safe, fast, np.int64(-1))
    if not safe.all():
        idx = np.flatnonzero(~safe)
        out[idx] = calculate(lon[idx], lat[idx], lon[idx] + 1, lat[idx] + 1,
                             buffer, max_level)
    return out


def qt_round(qt, level):
    """Parent tile at ``level`` (quadtree.go:206-213)."""
    qt = np.asarray(qt, dtype=np.int64)
    level = np.asarray(level, dtype=np.int64)
    d = qt & 31
    sh = np.int64(63) - 2 * level
    rounded = ((qt >> sh) << sh) + level
    return np.where(d < level, qt, rounded)


def qt_common(a, b):
    """Deepest common ancestor, vectorized (quadtree.go:216-241).

    Uses the leading-common-bit-pair trick: pair i occupies bits
    (62-2i, 61-2i), so the common level is (nlz(xor of paths)-1)//2
    capped at min depth.  Null (-1) acts as identity.
    """
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    a_null = a == -1
    b_null = b == -1

    da = a & 31
    db = b & 31
    d = np.minimum(da, db)

    x = ((a & ~np.int64(31)) ^ (b & ~np.int64(31))).astype(np.uint64)
    # number of leading zeros of the 64-bit xor; x==0 -> 64
    nlz = np.where(x == 0, np.int64(64), np.int64(63) - _log2_floor(x))
    lvl = np.minimum(d, (nlz - 1) // 2)
    # round a down to lvl — elementwise level requires manual shift
    sh = np.int64(63) - 2 * lvl
    common = ((a >> sh) << sh) + lvl
    out = np.where(a_null, b, np.where(b_null, a, common))
    return out


def _log2_floor(x_u64):
    """floor(log2(x)) for uint64 array, x>0 (returns 0 for x==0)."""
    x = x_u64.astype(np.uint64)
    r = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        r[big] += s
        x = np.where(big, x >> np.uint64(s), x)
    return r


def qt_to_string(qt):
    """Base-4 A/B/C/D string per qt (quadtree.go:115-137). Python loop —
    only for small/driver-side data and tests."""
    qt = np.atleast_1d(np.asarray(qt, dtype=np.int64))
    out = []
    for v in qt:
        if v <= -1:
            out.append("NULL")
            continue
        l = int(v & 31)
        out.append("".join("ABCD"[(int(v) >> (61 - 2 * i)) & 3] for i in range(l)))
    return out


def qt_from_string(s: str) -> int:
    """Inverse of qt_to_string (quadtree.go:270-293)."""
    ans = 0
    for i, ch in enumerate(s):
        p = "ABCD".index(ch)
        ans |= p << (61 - 2 * i)
    return ans | len(s)


def qt_tuple(qt):
    """qt -> slippy (x, y, z), vectorized (quadtree.go:181-203)."""
    qt = np.asarray(qt, dtype=np.int64)
    z = (qt & 31).astype(np.int64)
    x = np.zeros_like(z)
    y = np.zeros_like(z)
    maxz = int(z.max()) if z.size else 0
    for i in range(maxz):
        live = i < z
        t = (qt >> np.int64(61 - 2 * i)) & 3
        x = np.where(live, (x << 1) | (t & 1), x)
        y = np.where(live, (y << 1) | ((t >> 1) & 1), y)
    null = qt == -1
    return (
        np.where(null, -1, x),
        np.where(null, -1, y),
        np.where(null, -1, z),
    )


def qt_from_tuple(x, y, z):
    """slippy (x,y,z) -> qt, vectorized (quadtree.go:253-268)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    ans = np.zeros_like(x)
    maxz = int(z.max()) if z.size else 0
    for i in range(maxz):
        live = i < z
        pair = ((x >> i) & 1) | (((y >> i) & 1) << 1)
        ans = np.where(live, ans + (pair << np.int64(2 * i)), ans)
    ans = ans << (63 - 2 * z)
    ans = ans | z
    null = (x == -1) & (y == -1) & (z == -1)
    return np.where(null, np.int64(-1), ans)


def qt_bounds(qt, buffer: float = 0.0):
    """Tile bounds in int 1e-7-deg, vectorized (quadtree.go:139-177).

    Returns (minx, miny, maxx, maxy).  x bounds are exact closed-form
    (multiples of 360/2^z are exactly representable); y is computed in
    'mercator degrees' then inverse-warped, as the reference does.
    """
    x, y, z = qt_tuple(qt)
    pz = np.power(2.0, z.astype(np.float64))
    span_x = 360.0 / pz
    span_y = 180.0 / pz
    mx = -180.0 + x * span_x
    Mx = mx + span_x
    My_m = 90.0 - y * span_y
    my_m = My_m - span_y
    my = unmerc(my_m)
    My = unmerc(My_m)
    if buffer > 0.0:
        xx = (Mx - mx) * buffer
        yy = (My - my) * buffer
        mx = mx - xx
        my = my - yy
        Mx = Mx + xx
        My = My + yy
    return to_int(mx), to_int(my), to_int(Mx), to_int(My)
