"""Spatial filter (LocTest), pruned reads, complete-ways closure."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmquadtree_depreceated_ray.pipelines.spatial_filter import (
    BboxTest,
    PolyTest,
    complete_ways_closure,
    filter_entities_ds,
    read_tiles_pruned,
)


def test_bbox_test_contains_and_qt():
    from osmquadtree_depreceated_ray.functions.quadtree import calculate_point

    bt = BboxTest(-100_000_000, -50_000_000, 100_000_000, 50_000_000)
    assert bt.contains([0], [0])[0]
    assert not bt.contains([200_000_000], [0])[0]
    inside_qt = calculate_point(np.array([1_000_000]), np.array([1_000_000]))
    far_qt = calculate_point(np.array([1_500_000_000]), np.array([700_000_000]))
    assert bt.contains_qt(inside_qt)[0]
    assert not bt.contains_qt(far_qt)[0]
    assert bt.intersects_qt(inside_qt)[0]
    assert not bt.intersects_qt(far_qt)[0]


def test_poly_test_with_hole():
    outer = (np.array([0, 100, 100, 0, 0]) * 10**7,
             np.array([0, 0, 100, 100, 0]) * 10**6)
    hole = (np.array([40, 60, 60, 40, 40]) * 10**7,
            np.array([40, 40, 60, 60, 40]) * 10**6)
    pt = PolyTest(outer[0], outer[1], holes=[hole])
    assert pt.contains([10 * 10**7], [10 * 10**6])[0]
    assert not pt.contains([50 * 10**7], [50 * 10**6])[0]  # in the hole
    assert not pt.contains([-10 * 10**7], [10 * 10**6])[0]


@pytest.fixture(scope="module")
def tiled_small(ray_session, fixture_dir, tmp_path_factory):
    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out = str(tmp_path_factory.mktemp("sfilter"))
    tp.tile_pages(os.path.join(fixture_dir, "pages.parquet"), out,
                  target=300, minimum=20)
    return out


def test_pruned_read_matches_full_filter(ray_session, tiled_small):
    out = tiled_small
    bt = BboxTest(-800_000_000, 300_000_000, -600_000_000, 500_000_000)
    ds, pruned = read_tiles_pruned(out, bt)
    assert pruned["tiles_read"] <= pruned["tiles_total"]
    got = ds.to_pandas().sort_values("entity_id") if ds is not None else None
    # brute-force oracle over all data
    from osmquadtree_depreceated_ray.state import manifest as mf

    full = pq.read_table(mf.data_dir(out)).to_pandas()
    want = full[bt.contains(full["lon"].to_numpy(), full["lat"].to_numpy())]
    want = want.sort_values("entity_id")
    assert len(got) == len(want)
    assert (got["entity_id"].to_numpy() == want["entity_id"].to_numpy()).all()


def test_closure_filter(fixture_dir, ray_session):
    ents = pq.read_table(os.path.join(fixture_dir, "geo_entities.parquet"))
    ways = pq.read_table(os.path.join(fixture_dir, "way_segments.parquet"))
    rels = pq.read_table(os.path.join(fixture_dir, "rel_members.parquet"))
    bt = BboxTest(-1_800_000_000, -900_000_000, 0, 0)  # SW quarter of world
    res = complete_ways_closure(ents, ways, rels, bt)
    assert len(res["nodes"]) > 0 and len(res["ways"]) > 0
    # complete-ways invariant: every ref of every kept way is a kept node
    kept_ways = set(res["ways"].tolist())
    kept_nodes = set(res["nodes"].tolist())
    for w, rr in zip(ways.column("way_id").to_pylist(),
                     ways.column("refs").to_pylist()):
        if w in kept_ways:
            assert all(r in kept_nodes for r in rr)
    # trimmed members only reference kept ids
    tm = res["rel_members"].to_pandas()
    for _, m in tm.iterrows():
        mt, ref = int(m["member_type"]), int(m["member_ref"])
        if mt == 0:
            assert ref in kept_nodes
        elif mt == 1:
            assert ref in kept_ways
        else:
            assert ref in set(res["relations"].tolist())
    # distributed semi-join filter agrees with the id set
    import ray

    ents_ds = ray.data.read_parquet(
        os.path.join(fixture_dir, "geo_entities.parquet")
    )
    filtered = filter_entities_ds(ents_ds, res["nodes"]).count()
    assert filtered == len(res["nodes"])
