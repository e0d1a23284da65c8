"""End-to-end flagship pipeline over the synthetic pages fixture (Ray)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmquadtree_depreceated_ray.functions.quadtree import calculate_point
from osmquadtree_depreceated_ray.pipelines import tile as tp
from osmquadtree_depreceated_ray.state import manifest as mf


@pytest.fixture(scope="module")
def tiled(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiled"))
    res = tp.tile_pages(
        os.path.join(fixture_dir, "pages.parquet"), out, target=300, minimum=20
    )
    return out, res


def test_extraction_byte_identity(ray_session, fixture_dir, tiled):
    """extract_text(html) must reproduce the pages.text column byte-for-byte
    (BASELINE.json per-row invariant)."""
    import ray

    from osmquadtree_depreceated_ray.stages.extract import extract_text

    pages = ray.data.read_parquet(os.path.join(fixture_dir, "pages.parquet"))
    ext = pages.map_batches(extract_text, batch_format="pyarrow").to_pandas()
    golden = pq.read_table(
        os.path.join(fixture_dir, "pages.parquet"), columns=["url", "text"]
    ).to_pandas()
    merged = ext.merge(golden, on="url", suffixes=("_got", "_want"))
    assert len(merged) == len(golden)
    assert (merged["text_got"] == merged["text_want"]).all()


def test_entity_extraction_matches_golden(tiled, fixture_dir):
    out, _ = tiled
    ents = pq.read_table(os.path.join(out, "entities")).to_pandas()
    golden = pq.read_table(os.path.join(fixture_dir, "geo_entities.parquet")).to_pandas()
    assert len(ents) == len(golden)
    ents = ents.sort_values("name").reset_index(drop=True)
    golden["name_key"] = golden["name"]
    golden = golden.sort_values("name").reset_index(drop=True)
    assert (ents["name"].to_numpy() == golden["name"].to_numpy()).all()
    assert (ents["lon"].to_numpy() == golden["lon"].to_numpy()).all()
    assert (ents["lat"].to_numpy() == golden["lat"].to_numpy()).all()
    assert (ents["url"].to_numpy() == golden["url"].to_numpy()).all()


def test_tile_partition_invariants(tiled):
    out, res = tiled
    man = mf.read_manifest(out).to_pandas()
    # conservation: manifest totals == written rows == entity count
    data = pq.read_table(mf.data_dir(out), columns=["qt", "tile"]).to_pandas()
    data["tile"] = data["tile"].astype("int64")  # hive col reads back categorical
    assert res["total"] == len(data) == man["count"].sum()
    # every written row's tile is in the manifest, with exact counts
    got = data.groupby("tile").size().to_dict()
    want = man.set_index("tile")["count"].to_dict()
    assert got == want
    # tile is ancestor-or-equal of each row's qt
    from osmquadtree_depreceated_ray.functions.quadtree import qt_round

    tl = data["tile"].to_numpy()
    q = data["qt"].to_numpy()
    lvl = tl & 31
    sh = 63 - 2 * lvl
    assert ((((q >> sh) << sh) + lvl == tl) | (tl == 0)).all()


def test_qt_matches_scalar_recompute(tiled):
    out, _ = tiled
    data = pq.read_table(mf.data_dir(out), columns=["lon", "lat", "qt"]).to_pandas()
    want = calculate_point(data["lon"].to_numpy(), data["lat"].to_numpy(), 0.05, 18)
    assert (data["qt"].to_numpy() == want).all()


def test_resume_skips_completed(ray_session, tiled):
    import ray

    out, res = tiled
    ents = ray.data.read_parquet(os.path.join(out, "entities"))
    res2 = tp.tile_entities(ents, out, target=300, minimum=20, resume=True)
    assert res2["skipped_tiles"] == res["tiles"]
    # all tiles were skipped -> no duplicate rows were written
    data = pq.read_table(mf.data_dir(out), columns=["qt"])
    assert data.num_rows == res["total"]
    # the committed state carries the run metrics (self-describing
    # output: per-tile counts in the manifest + run-level metrics here)
    st = mf.read_state(out)
    assert st["metrics"]["total"] == res["total"]
    assert st["metrics"]["skipped_tiles"] == res["tiles"]
    assert "assign_write" in st["metrics"]["timings"]


def test_qts_writer_and_resort(ray_session, tiled, tmp_path):
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out, res = tiled
    ents = ray.data.read_parquet(os.path.join(out, "entities"))
    qts_path = str(tmp_path / "qts")
    tp.write_qts(ents, qts_path)
    t = pq.read_table(qts_path)
    assert t.num_rows == res["total"]
    assert set(t.column_names) >= {"entity_id", "qt"}

    byid = tp.resort_by_id(out)
    got = pq.read_table(byid, columns=["entity_id"]).to_pandas()["entity_id"]
    assert len(got) == res["total"]
    files = sorted(os.listdir(byid))
    # id order holds within and across the ordered part files
    prev_max = -1
    for f in files:
        part = pq.read_table(os.path.join(byid, f), columns=["entity_id"])
        arr = part.column("entity_id").to_numpy()
        assert (np.diff(arr) >= 0).all()


def test_read_tiled_ordered(ray_session, tiled):
    import numpy as np

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out, res = tiled
    ds, tiles = tp.read_tiled_ordered(out, columns=["qt"])
    assert tiles == sorted(tiles)
    assert ds.count() == res["total"]
    # qt pre-order invariant: each tile's qts are >= the previous tile id
    prev = -1
    for t in tiles:
        assert t >= prev
        prev = t


def test_read_tiled_ordered_restores_context(ray_session, tiled):
    """The ordered read must not mutate preserve_order globally — a
    later pipeline in the same process would silently serialize."""
    import ray

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out, _ = tiled
    ctx = ray.data.DataContext.get_current()
    before = ctx.execution_options.preserve_order
    ds, tiles = tp.read_tiled_ordered(out)
    assert ctx.execution_options.preserve_order == before
    assert ds.count() > 0 and len(tiles) > 0


def test_iter_tiled_ordered_streams_in_qt_order(ray_session, tiled):
    """The streamed ordered reader (O3) yields every tile exactly once,
    in ascending qt order, with per-tile tables that reconstruct the
    full output — no materialization of the corpus (window smaller than
    the tile count forces genuine windowed prefetch)."""
    import numpy as np

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out, res = tiled
    seen_tiles, total = [], 0
    for t, tbl in tp.iter_tiled_ordered(out, columns=["qt"],
                                        window_tiles=3):
        seen_tiles.append(t)
        assert tbl.num_rows > 0
        total += tbl.num_rows
    assert seen_tiles == sorted(seen_tiles)
    assert total == res["total"]
    # matches the lazy read's tile list (manifest-driven)
    _, tiles = tp.read_tiled_ordered(out)
    assert seen_tiles == tiles
