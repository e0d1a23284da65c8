"""Property tests for S2/hex cell ids and polygon kernels."""

import numpy as np
import pytest

from osmquadtree_depreceated_ray.functions import geom
from osmquadtree_depreceated_ray.functions import reference_scalar as ref
from osmquadtree_depreceated_ray.functions.cells import (
    hex_cell_id,
    s2_cell_id,
    s2_level,
    s2_parent,
)

rng = np.random.default_rng(5)


def test_s2_basic_properties():
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89, 89, 5000)
    leaf = s2_cell_id(lon, lat, 30)
    # valid ids: odd lsb at level 30
    assert (leaf & 1).all()
    # level marker round-trips
    for level in (0, 5, 16, 30):
        c = s2_cell_id(lon, lat, level)
        assert (s2_level(c) == level).all()
        # parent relation: truncating the leaf gives the same cell
        assert (s2_parent(leaf, level) == c).all()
    # all six faces are reachable
    faces = np.unique(s2_cell_id(lon, lat, 30) >> 61 & 7)
    assert len(faces) == 6
    # nearby points share coarse cells; far points don't share fine cells
    c1 = s2_cell_id(np.array([10.0]), np.array([50.0]), 10)
    c2 = s2_cell_id(np.array([10.0001]), np.array([50.0001]), 10)
    assert c1[0] == c2[0]
    c3 = s2_cell_id(np.array([11.0]), np.array([50.0]), 16)
    assert c3[0] != s2_cell_id(np.array([10.0]), np.array([50.0]), 16)[0]


def test_s2_determinism_and_distribution():
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-80, 80, 20000)
    a = s2_cell_id(lon, lat, 12)
    b = s2_cell_id(lon, lat, 12)
    assert (a == b).all()
    # level-12 cells over the globe: expect high cardinality (fine cells)
    assert len(np.unique(a)) > 15000


def test_hex_cell_properties():
    lon = rng.uniform(-170, 170, 5000)
    lat = rng.uniform(-80, 80, 5000)
    c = hex_cell_id(lon, lat, 9)
    assert (c == hex_cell_id(lon, lat, 9)).all()
    # close points share a cell at coarse res
    assert hex_cell_id(np.array([10.0]), np.array([50.0]), 5)[0] == \
           hex_cell_id(np.array([10.01]), np.array([50.01]), 5)[0]
    # resolution packs into the id
    assert ((c >> 58) == 9).all()


def test_pnpoly_matches_scalar():
    # random star polygon
    for seed in range(5):
        r = np.random.default_rng(seed)
        k = r.integers(5, 12)
        ang = np.sort(r.uniform(0, 2 * np.pi, k))
        rad = r.uniform(0.5, 1.5, k) * 1e7
        lon = (np.cos(ang) * rad).astype(np.int64)
        lat = (np.sin(ang) * rad).astype(np.int64)
        lon = np.append(lon, lon[0])
        lat = np.append(lat, lat[0])
        px = r.integers(-2e7, 2e7, 500)
        py = r.integers(-2e7, 2e7, 500)
        got = geom.pnpoly(lon, lat, px, py)
        for i in range(0, 500, 17):
            want = ref.point_in_poly(lon.tolist(), lat.tolist(), int(px[i]), int(py[i]))
            assert got[i] == want, (seed, i)


def test_ring_area_and_orientation():
    # unit square at equator, ccw, closed
    lon = np.array([0, 10_000_000, 10_000_000, 0, 0], dtype=np.int64)
    lat = np.array([0, 0, 10_000_000, 10_000_000, 0], dtype=np.int64)
    a, ccw = geom.ring_area(lon, lat)
    assert ccw
    # ~111.3 km per degree in mercator at equator
    assert a == pytest.approx((111_319.49079327358) ** 2, rel=1e-3)
    a2, ccw2 = geom.ring_area(lon[::-1], lat[::-1])
    assert a2 == pytest.approx(a) and not ccw2
    # polygon with a hole: outer minus inner
    hole_lon = np.array([2_000_000, 4_000_000, 4_000_000, 2_000_000, 2_000_000], dtype=np.int64)
    hole_lat = np.array([2_000_000, 2_000_000, 4_000_000, 4_000_000, 2_000_000], dtype=np.int64)
    pa = geom.polygon_area([(lon, lat), (hole_lon, hole_lat)])
    assert pa == pytest.approx(a - geom.ring_area(hole_lon, hole_lat)[0], rel=1e-9)


def test_ring_contains_and_intersect():
    outer_lon = np.array([0, 100, 100, 0, 0], dtype=np.int64) * 100000
    outer_lat = np.array([0, 0, 100, 100, 0], dtype=np.int64) * 100000
    inner_lon = np.array([20, 40, 40, 20, 20], dtype=np.int64) * 100000
    inner_lat = np.array([20, 20, 40, 40, 20], dtype=np.int64) * 100000
    assert geom.ring_contains(outer_lon, outer_lat, inner_lon, inner_lat)
    assert not geom.ring_contains(inner_lon, inner_lat, outer_lon, outer_lat)
    crossing_lon = np.array([-10, 50, 50, -10, -10], dtype=np.int64) * 100000
    crossing_lat = np.array([20, 20, 40, 40, 20], dtype=np.int64) * 100000
    assert geom.rings_intersect(outer_lon, outer_lat, crossing_lon, crossing_lat)
    assert not geom.ring_contains(outer_lon, outer_lat, crossing_lon, crossing_lat)


def test_zorder():
    z = geom.find_zorder(
        highway=["motorway", "service", None, "primary", None],
        railway=[None, None, "rail", None, None],
        layer=[None, "2", None, None, None],
        bridge=[None, None, None, "yes", None],
        tunnel=[None, None, None, None, "yes"],
        z_order_tag=[None, None, None, None, "42"],
    )
    # motorway=9; service rank 1 is ignored (z>1 rule) but layer 2 adds 20;
    # railway=5; primary=7 + bridge 10; explicit z_order overrides, tunnel -10
    assert z.tolist() == [9, 20, 5, 17, 32]


def test_find_parent_highway():
    assert geom.find_parent_highway(["residential", "motorway"]) == "motorway"
    assert geom.find_parent_highway(["trunk_link", "trunk"]) == "trunk"
    assert geom.find_parent_highway([]) == ""
    assert geom.find_parent_highway(["weird"]) == "weird"
    assert geom.find_parent_highway(["weird", "weird", "odd"]) == "weird"


def test_string_utils():
    from osmquadtree_depreceated_ray.functions.strutils import (
        date_string,
        parse_string_int,
        read_date_string,
        timestamp_string,
    )

    assert parse_string_int("42") == (42, True)
    assert parse_string_int("-17") == (-17, True)
    assert parse_string_int("1.5") == (15000000, False)
    assert parse_string_int("-0.25") == (-2500000, False)
    with pytest.raises(ValueError):
        parse_string_int("nope")
    ts = read_date_string("2006-01-02T15:04:05")
    assert timestamp_string(ts) == "2006-01-02T15:04:05"
    ts2 = read_date_string("20060102")
    assert date_string(ts2) == "20060102"
    with pytest.raises(ValueError):
        read_date_string("2006/01/02")


def test_hex_cell_parent():
    from osmquadtree_depreceated_ray.functions.cells import hex_cell_id, hex_cell_parent

    lon = rng.uniform(-170, 170, 2000)
    lat = rng.uniform(-80, 80, 2000)
    child = hex_cell_id(lon, lat, 9)
    parent = hex_cell_parent(child, 5)
    assert ((parent >> 58) == 5).all()
    # a cell's parent is (almost always) the coarse cell of its own center;
    # hex-grid misalignment can shift a small fraction at the seams
    direct = hex_cell_id(lon, lat, 5)
    agree = (parent == direct).mean()
    assert agree > 0.9


def test_icosa_cell_properties():
    from osmquadtree_depreceated_ray.functions.cells import (
        icosa_cell_decode,
        icosa_cell_id,
        icosa_cell_parent,
    )

    lon = rng.uniform(-180, 180, 20000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 20000)))

    # res 0 = exactly one hexagon per icosahedron face
    c0 = icosa_cell_id(lon, lat, 0)
    assert len(np.unique(c0)) == 20
    res, face, q, r = icosa_cell_decode(c0)
    assert (res == 0).all() and (q == 0).all() and (r == 0).all()
    assert len(np.unique(face)) == 20

    # determinism + component bounds at the deepest resolution
    c15 = icosa_cell_id(lon, lat, 15)
    assert (icosa_cell_id(lon[:100], lat[:100], 15) == c15[:100]).all()
    res, face, q, r = icosa_cell_decode(c15)
    assert (res == 15).all()
    assert (np.abs(q) < (1 << 23)).all() and (np.abs(r) < (1 << 23)).all()

    # aperture 7: the lattice refines by sqrt(7) per resolution, so the
    # axial-coordinate extent over a fixed point set grows 7x per two
    # resolutions (deterministic, unlike occupied-cell counts which are
    # boundary- and sampling-dominated at low res)
    _, _, q7, _ = icosa_cell_decode(icosa_cell_id(lon, lat, 7))
    _, _, q9, _ = icosa_cell_decode(icosa_cell_id(lon, lat, 9))
    growth = np.abs(q9).max() / np.abs(q7).max()
    assert 6.5 < growth < 7.5

    with pytest.raises(ValueError):
        icosa_cell_id(lon[:1], lat[:1], 16)


def test_icosa_cell_parent():
    from osmquadtree_depreceated_ray.functions.cells import (
        icosa_cell_decode,
        icosa_cell_id,
        icosa_cell_parent,
    )

    lon = rng.uniform(-180, 180, 5000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))
    child = icosa_cell_id(lon, lat, 9)
    parent = icosa_cell_parent(child, 8)
    pres, pface, _, _ = icosa_cell_decode(parent)
    cres, cface, _, _ = icosa_cell_decode(child)
    assert (pres == 8).all()
    assert (pface == cface).all()  # parenting never crosses faces
    # aperture-7 hex hierarchies nest only approximately (true of H3
    # too): the parent of a point's child cell is the point's own
    # coarse cell for the vast majority of points
    direct = icosa_cell_id(lon, lat, 8)
    assert (parent == direct).mean() > 0.85
    # parent at the same res is the identity
    assert (icosa_cell_parent(child, 9) == child).all()


def _ref_geohash(lon7: int, lat7: int, precision: int) -> str:
    """Textbook geohash bisection in exact rational arithmetic."""
    from fractions import Fraction

    lon = Fraction(int(lon7), 10**7)
    lat = Fraction(int(lat7), 10**7)
    lo_lon, hi_lon = Fraction(-180), Fraction(180)
    lo_lat, hi_lat = Fraction(-90), Fraction(90)
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    return "".join(
        alpha[int("".join(map(str, bits[i:i + 5])), 2)]
        for i in range(0, len(bits), 5))


def test_geohash_matches_rational_bisection():
    from osmquadtree_depreceated_ray.functions.cells import geohash_encode

    rng = np.random.default_rng(11)
    lon = rng.integers(-1_800_000_000, 1_800_000_001, 300).astype(np.int64)
    lat = rng.integers(-900_000_000, 900_000_001, 300).astype(np.int64)
    for p in (1, 4, 5, 8, 11, 12):
        got = geohash_encode(lon, lat, p)
        for i in range(len(lon)):
            want = _ref_geohash(int(lon[i]), int(lat[i]), p)
            assert got[i] == want, (p, lon[i], lat[i], got[i], want)


def test_geohash_known_values():
    from osmquadtree_depreceated_ray.functions.cells import geohash_encode

    # London (51.5085 N, 0.1257 W) -> the well-known gcpvj0 prefix
    got = geohash_encode(np.array([-1257000]), np.array([515085000]), 6)
    assert got[0] == "gcpvj0"
    # the north-east corner folds into the last cell
    assert geohash_encode(np.array([1_800_000_000]),
                          np.array([900_000_000]), 5)[0] == "zzzzz"
    with pytest.raises(ValueError):
        geohash_encode(np.array([0]), np.array([0]), 13)
