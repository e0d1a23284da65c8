"""Boundary-aware tiled writer edge cases."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_write_tiled_basic_and_skip(ray_session, tmp_path):
    import ray

    from osmquadtree_depreceated_ray.stages.write_tiles import write_tiled

    tiles = np.array([10, 20, 30], dtype=np.int64)
    counts = np.array([100, 200, 50], dtype=np.int64)
    rows_tile = np.repeat(tiles, counts)
    t = pa.table({"tile": rows_tile, "v": np.arange(len(rows_tile))})
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "d1")
    n = write_tiled(ds, out, tiles, counts, n_writers=2)
    assert n == 350
    for tl, c in zip(tiles, counts):
        got = pq.read_table(os.path.join(out, f"tile={tl}")).num_rows
        assert got == c
    # skip list: rerun writes nothing for completed tiles
    out2 = str(tmp_path / "d2")
    n2 = write_tiled(ray.data.from_arrow(t), out2, tiles, counts,
                     n_writers=2, skip_tiles=tiles)
    assert n2 == 0

    # single-writer degenerate case
    out3 = str(tmp_path / "d3")
    n3 = write_tiled(ray.data.from_arrow(t), out3, tiles, counts, n_writers=1)
    assert n3 == 350


def test_write_tiled_empty(ray_session, tmp_path):
    import ray

    from osmquadtree_depreceated_ray.stages.write_tiles import write_tiled

    t = pa.table({"tile": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    n = write_tiled(ray.data.from_arrow(t), str(tmp_path / "e"),
                    np.array([5], dtype=np.int64), np.array([0], dtype=np.int64))
    assert n == 0


def test_write_tiled_retires_stale_layout(ray_session, tmp_path):
    """A crashed run with a different writer layout must not leave stale
    part files behind (the manifest is the commit point)."""
    import ray

    from osmquadtree_depreceated_ray.stages.write_tiles import write_tiled

    tiles = np.array([10, 20, 30, 40], dtype=np.int64)
    counts = np.array([50, 50, 50, 50], dtype=np.int64)
    rows_tile = np.repeat(tiles, counts)
    t = pa.table({"tile": rows_tile, "v": np.arange(len(rows_tile))})
    out = str(tmp_path / "d")
    # "crashed" run with 4 writers
    write_tiled(ray.data.from_arrow(t).repartition(4), out, tiles, counts,
                n_writers=4)
    # fresh run with 1 writer — stale part files must be retired
    write_tiled(ray.data.from_arrow(t).repartition(4), out, tiles, counts,
                n_writers=1)
    for tl, c in zip(tiles, counts):
        d = os.path.join(out, f"tile={tl}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, files
        assert pq.read_table(d).num_rows == c
