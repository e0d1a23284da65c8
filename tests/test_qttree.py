"""Split-rule (FindQtGroups) + allocator semantics.

Pins two implementations of /root/reference/calcqts/qttree.go to each
other and to invariants: ``find_qt_groups_slow`` is a literal port of the
trie traversal (findGroupIntFlat + the widening loop); ``find_qt_groups``
is the vectorized array formulation used by pipelines.  They must agree
exactly.
"""

import numpy as np

from osmquadtree_depreceated_ray.functions import quadtree as qt
from osmquadtree_depreceated_ray.functions.qttree import (
    QtAllocator,
    QtTree,
    find_qt_groups,
    find_qt_groups_slow,
)


def _random_qts(n, seed=3):
    r = np.random.default_rng(seed)
    lon = r.integers(qt.MIN_LON, qt.MAX_LON, size=n)
    lat = r.integers(qt.MIN_LAT, qt.MAX_LAT, size=n)
    # 30% clustered in one hot cell to exercise skew splitting
    hot = r.random(n) < 0.3
    lon[hot] = 100_000_000 + r.integers(0, 2_000_000, size=hot.sum())
    lat[hot] = 500_000_000 + r.integers(0, 2_000_000, size=hot.sum())
    return qt.calculate_point(lon, lat, 0.05, 18)


def _counts(qts):
    return np.unique(qts, return_counts=True)


def test_trie_counts():
    t = QtTree.from_counts([0, 0, 18 | (3 << 61)], [5, 2, 1])
    assert t.root_total == 8
    assert t.nodes[0].count == 7  # qt==0 lands on root


def test_fast_matches_slow_port():
    for seed, n, target, minimum in [(3, 20000, 2000, 100), (9, 8000, 500, 40),
                                     (17, 5000, 8000, 500), (23, 30000, 1000, 50)]:
        vals, counts = _counts(_random_qts(n, seed=seed))
        slow = find_qt_groups_slow(QtTree.from_counts(vals, counts), target, minimum)
        slow_groups = {g: c for g, c, _ in slow.leaves()}
        gq, gt = find_qt_groups(vals, counts, target, minimum)
        fast_groups = dict(zip(gq.tolist(), gt.tolist()))
        assert fast_groups == slow_groups, (seed, n, target, minimum)


def test_find_qt_groups_conservation():
    qts = _random_qts(60_000)
    vals, counts = _counts(qts)
    gq, gt = find_qt_groups(vals, counts, target=2000, minimum=100)
    assert gt.sum() == 60_000
    assert len(np.unique(gq)) == len(gq)


def test_allocator_matches_trie_find():
    qts = _random_qts(20_000, seed=9)
    vals, counts = _counts(qts)
    gq, gt = find_qt_groups(vals, counts, target=1000, minimum=50)

    # allocator trie reconstruction (MakeQtTree) as the scalar oracle
    trie = QtTree()
    for g in gq.tolist():
        trie.add(g)
    alloc = QtAllocator(gq)
    assigned = alloc.assign(qts)
    for i in range(0, len(qts), 37):
        idx = trie.find(int(qts[i]))
        assert assigned[i] == trie.nodes[idx].qt
    assert set(np.unique(assigned)) <= set(gq.tolist()) | {0}


def test_group_totals_match_assignment():
    """Assigning the original qts through the allocator reproduces the
    group totals exactly (the reference's block-partition invariant)."""
    qts = _random_qts(30_000, seed=17)
    vals, counts = _counts(qts)
    gq, gt = find_qt_groups(vals, counts, target=1500, minimum=100)
    leaves = dict(zip(gq.tolist(), gt.tolist()))
    alloc = QtAllocator(gq)
    assigned = alloc.assign(qts)
    got_vals, got_counts = np.unique(assigned, return_counts=True)
    got = dict(zip(got_vals.tolist(), got_counts.tolist()))
    assert got == leaves


def test_small_input_goes_to_root():
    gq, gt = find_qt_groups(
        np.array([(3 << 61) | 18, (1 << 61) | 18]), np.array([3, 4]),
        target=8000, minimum=500)
    assert gq.tolist() == [0] and gt.tolist() == [7]


def test_adaptive_counts_equivalent_to_flat(ray_session):
    """Hierarchical hot-cell counting must produce the exact same split
    as flat max-level counting (the refinement-threshold argument)."""
    import pyarrow as pa
    import ray

    from osmquadtree_depreceated_ray.pipelines.tile import (
        count_tiles,
        count_tiles_adaptive,
    )

    qts = _random_qts(60_000, seed=41)
    ds = ray.data.from_arrow(pa.table({"qt": qts})).repartition(8)
    for target, minimum in [(2000, 100), (500, 40)]:
        fq, fn = count_tiles(ds)
        aq, an = count_tiles_adaptive(ds, target, levels=(4, 8, 13, 18))
        assert an.sum() == fn.sum() == 60_000
        g1 = dict(zip(*[x.tolist() for x in find_qt_groups(fq, fn, target, minimum,
                                                           require_count=False)]))
        g2 = dict(zip(*[x.tolist() for x in find_qt_groups(aq, an, target, minimum,
                                                           require_count=False)]))
        assert g1 == g2, (target, minimum)


def test_onepass_counts_equal_adaptive(ray_session):
    """The one-pass exchange count must emit the exact same pruned
    ladder as the sequential adaptive version (same leaves, same
    totals), for several targets and reducer widths."""
    import pyarrow as pa
    import ray

    from osmquadtree_depreceated_ray.pipelines.tile import (
        count_tiles_adaptive,
        count_tiles_onepass,
    )

    qts = _random_qts(60_000, seed=43)
    ds = ray.data.from_arrow(pa.table({"qt": qts})).repartition(8).materialize()
    for target in (500, 2000, 8000):
        for levels in ((4, 8, 13, 18), (6, 12, 18)):
            aq, an = count_tiles_adaptive(ds, target, levels=levels)
            for n_red in (1, 5):
                oq, on = count_tiles_onepass(ds, target, levels=levels,
                                             n_reducers=n_red)
                assert oq.tolist() == aq.tolist(), (target, levels, n_red)
                assert on.tolist() == an.tolist(), (target, levels, n_red)


def test_onepass_counts_empty(ray_session):
    import pyarrow as pa
    import ray

    from osmquadtree_depreceated_ray.pipelines.tile import count_tiles_onepass

    ds = ray.data.from_arrow(pa.table({"qt": pa.array([], pa.int64())}))
    q, n = count_tiles_onepass(ds, 1000)
    assert len(q) == 0 and len(n) == 0
