"""Parity: vectorized numpy quadtree kernels vs literal scalar reference port.

The scalar port (functions/reference_scalar.py) is a line-for-line
transcription of /root/reference/quadtree/quadtree.go; these tests pin the
vectorized implementation to it bit-for-bit, including the buffered
findQuad branch order near quadrant seams and the degenerate-box nudges.
"""

import numpy as np
import pytest

from osmquadtree_depreceated_ray.functions import quadtree as qt
from osmquadtree_depreceated_ray.functions import reference_scalar as ref

rng = np.random.default_rng(42)


def _random_boxes(n, seed=0):
    r = np.random.default_rng(seed)
    lon = r.integers(qt.MIN_LON, qt.MAX_LON, size=n)
    lat = r.integers(qt.MIN_LAT, qt.MAX_LAT, size=n)
    w = (r.pareto(1.0, size=n) * 1e4).astype(np.int64)
    h = (r.pareto(1.0, size=n) * 1e4).astype(np.int64)
    return lon, lat, np.minimum(lon + w, qt.MAX_LON), np.minimum(lat + h, qt.MAX_LAT)


@pytest.mark.parametrize("buffer,max_level", [(0.0, 18), (0.05, 18), (0.05, 13), (0.025, 18)])
def test_calculate_matches_scalar_port(buffer, max_level):
    mnx, mny, mxx, mxy = _random_boxes(2000, seed=7)
    vec = qt.calculate(mnx, mny, mxx, mxy, buffer, max_level)
    for i in range(len(mnx)):
        s = ref.calculate(int(mnx[i]), int(mny[i]), int(mxx[i]), int(mxy[i]), buffer, max_level)
        assert vec[i] == s, f"row {i}: box={mnx[i]},{mny[i]},{mxx[i]},{mxy[i]}"


def test_calculate_point_matches_scalar_port():
    r = np.random.default_rng(11)
    lon = r.integers(qt.MIN_LON, qt.MAX_LON, size=3000)
    lat = r.integers(qt.MIN_LAT, qt.MAX_LAT, size=3000)
    vec = qt.calculate_point(lon, lat, 0.05, 18)
    for i in range(0, len(lon), 7):
        s = ref.calculate(int(lon[i]), int(lat[i]), int(lon[i]) + 1, int(lat[i]) + 1, 0.05, 18)
        assert vec[i] == s


def test_seam_boxes():
    """Boxes straddling quadrant boundaries exercise the buffered branches."""
    cases = []
    for d in (0, 1, 5, 1000, 100000, 10000000):
        cases += [
            (-d, -d, d, d),
            (-d, 100, d, 200 + d),
            (100, -d, 200 + d, d),
            (900000000 - d, 450000000 - d, 900000000 + d, 450000000 + d),
            (-900000000 - d, -450000000, -900000000 + d, -450000000 + 2 * d + 1),
        ]
    for bf in (0.0, 0.05):
        for c in cases:
            vec = int(qt.calculate(*(np.array([v]) for v in c), bf, 18)[0])
            s = ref.calculate(*c, bf, 18)
            assert vec == s, (c, bf)


def test_round_common_string_tuple_roundtrip():
    lon = rng.integers(qt.MIN_LON, qt.MAX_LON, size=500)
    lat = rng.integers(qt.MIN_LAT, qt.MAX_LAT, size=500)
    qts = qt.calculate_point(lon, lat, 0.05, 18)
    for level in (0, 1, 5, 13, 17, 18):
        vec = qt.qt_round(qts, level)
        for i in range(0, 500, 13):
            assert vec[i] == ref.qt_round(int(qts[i]), level)
    # common: vector vs scalar on random pairs (plus identities)
    a = qts[:250]
    b = qts[250:]
    com = qt.qt_common(a, b)
    for i in range(250):
        assert com[i] == ref.qt_common(int(a[i]), int(b[i]))
    assert qt.qt_common(np.array([-1]), np.array([42 | 3]))[0] == (42 | 3)
    assert qt.qt_common(qts[:1], qts[:1])[0] == qts[0]
    # string/tuple codecs round-trip
    strs = qt.qt_to_string(qts[:100])
    for i in range(100):
        assert strs[i] == ref.qt_string(int(qts[i]))
        assert qt.qt_from_string(strs[i]) == qts[i]
    x, y, z = qt.qt_tuple(qts[:100])
    back = qt.qt_from_tuple(x, y, z)
    for i in range(100):
        sx, sy, sz = ref.qt_tuple(int(qts[i]))
        assert (x[i], y[i], z[i]) == (sx, sy, sz)
        assert back[i] == qts[i]


def test_bounds_matches_scalar():
    lon = rng.integers(qt.MIN_LON, qt.MAX_LON, size=200)
    lat = rng.integers(qt.MIN_LAT, qt.MAX_LAT, size=200)
    qts = qt.calculate_point(lon, lat, 0.05, 18)
    for buf in (0.0, 0.05):
        bx = qt.qt_bounds(qts, buf)
        for i in range(0, 200, 11):
            s = ref.qt_bounds(int(qts[i]), buf)
            got = tuple(int(b[i]) for b in bx)
            assert got == s, (qts[i], buf)


def test_bounds_contain_point():
    """Invariant: a point's level-18 tile bounds (buffered or not) contain it."""
    lon = rng.integers(qt.MIN_LON, qt.MAX_LON, size=1000)
    lat = rng.integers(int(qt.MIN_LAT * 0.9), int(qt.MAX_LAT * 0.9), size=1000)
    qts = qt.calculate_point(lon, lat, 0.0, 18)
    mnx, mny, mxx, mxy = qt.qt_bounds(qts, 0.0)
    # tolerance 1 int-unit for the to_int rounding at the boundary
    assert (lon >= mnx - 1).all() and (lon <= mxx + 1).all()
    assert (lat >= mny - 1).all() and (lat <= mxy + 1).all()


def test_mercator_roundtrip():
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-85, 85, 100)
    x, y = qt.mercator(lon, lat)
    lon2, lat2 = qt.unmercator(x, y)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)


def test_fast_point_path_matches_loop():
    """The closed-form point fast path must equal the exact descent loop,
    including forced seam/boundary coordinates and poles."""
    r = np.random.default_rng(99)
    lon = r.integers(qt.MIN_LON, qt.MAX_LON, size=200_000)
    lat = r.integers(qt.MIN_LAT, qt.MAX_LAT, size=200_000)
    # salt in exact dyadic boundaries and their neighbourhoods
    k = r.integers(0, 1 << 18, size=2000)
    bound_lon = (k * 3_600_000_000 // (1 << 18)) - 1_800_000_000
    lon[:2000] = np.clip(bound_lon + r.integers(-2, 3, size=2000), qt.MIN_LON, qt.MAX_LON)
    lat[2000:4000] = np.asarray([0, 1, -1, 900000000, -900000000] * 400)
    for buf, lvl in ((0.05, 18), (0.0, 18), (0.05, 13), (0.025, 16)):
        fast = qt.calculate_point(lon, lat, buf, lvl)
        loop = qt.calculate(lon, lat, lon + 1, lat + 1, buf, lvl)
        bad = np.flatnonzero(fast != loop)
        assert len(bad) == 0, (buf, lvl, bad[:5], lon[bad[:3]], lat[bad[:3]])
