"""T6 per-tile serving store (PackedDataStore.Filter analogue)."""

import numpy as np
import pytest

from osmquadtree_depreceated_ray.stages.serve import TileServer


@pytest.fixture(scope="module")
def served(ray_session, fixture_dir, tmp_path_factory):
    import os

    from osmquadtree_depreceated_ray.pipelines import tile as tp

    out = str(tmp_path_factory.mktemp("serve"))
    tp.tile_pages(os.path.join(fixture_dir, "pages.parquet"), out,
                  target=300, minimum=20)
    return out


def test_filter_matches_direct_read(served):
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.state import manifest as mf

    srv = TileServer(served, cache_tiles=8)
    full = pq.read_table(mf.data_dir(served))
    lon = full.column("lon").to_numpy()
    lat = full.column("lat").to_numpy()
    bbox = (int(np.median(lon)) - 10**7, int(np.median(lat)) - 10**7,
            int(np.median(lon)) + 10**7, int(np.median(lat)) + 10**7)
    got = srv.filter(bbox=bbox, columns=["entity_id", "lon", "lat"],
                     sort_by="entity_id")
    want_mask = ((lon >= bbox[0]) & (lon < bbox[2])
                 & (lat >= bbox[1]) & (lat < bbox[3]))
    want = np.sort(full.column("entity_id").to_numpy()[want_mask])
    assert got.column("entity_id").to_numpy().tolist() == want.tolist()
    # second identical query is served from cache (no new tile loads)
    m0 = srv.stats()["misses"]
    srv.filter(bbox=bbox, columns=["entity_id"])
    assert srv.stats()["misses"] == m0
    assert srv.stats()["hits"] > 0


def test_limit_and_sort(served):
    srv = TileServer(served)
    t = srv.filter(columns=["entity_id"], sort_by="entity_id", limit=10)
    ids = t.column("entity_id").to_numpy()
    assert len(ids) == 10 and (np.diff(ids) >= 0).all()


def test_as_ray_actor(served):
    import ray

    Actor = ray.remote(TileServer)
    a = Actor.remote(served, 4)
    t = ray.get(a.filter.remote(columns=["entity_id"], limit=5))
    assert t.num_rows == 5


def test_sql_over_served_tiles(served):
    """T6 full parity: a SQL string (the reference's Parse grammar) runs
    against the served store and matches DuckDB over the same rows."""
    import duckdb
    import pyarrow.parquet as pq

    from osmquadtree_depreceated_ray.state import manifest as mf

    srv = TileServer(served, cache_tiles=8)
    q = ("SELECT qt, COUNT(*) AS n, MIN(entity_id) AS lo "
         "FROM tiles WHERE entity_id % 2 = 0 GROUP BY qt ORDER BY qt")
    got = srv.sql(q).to_pandas().reset_index(drop=True)

    full = pq.read_table(mf.data_dir(served))
    con = duckdb.connect()
    con.register("tiles", full)
    want = con.sql(q).df()
    assert got["qt"].tolist() == want["qt"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    assert got["lo"].astype(int).tolist() == want["lo"].astype(int).tolist()

    # bbox pre-pruning composes with SQL
    t = srv.sql("SELECT entity_id FROM tiles", bbox=(-1800000000, -900000000,
                                                     0, 900000000))
    assert t.num_rows <= full.num_rows
