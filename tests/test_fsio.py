"""Sink contract over non-POSIX filesystems (fsspec routing).

Pins the two-level commit protocol of ``state/fsio.py``:

* per-file commit works on a backend WITHOUT atomic rename
  (fsspec ``memory://``, the object-store stand-in — direct PUT), and
  on local paths (tmp + rename, no ``.tmp`` residue);
* dataset visibility is gated by the manifest: part files written
  before a crash are invisible to ``completed_tiles`` until
  ``write_manifest`` commits, and stale parts are retired on rerun.

The memory filesystem is per-process, so the exchange's task bodies
(``_split_impl`` / ``_write_range_impl``) are driven in-process here;
the full Ray path is exercised with a ``file://`` scheme.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmquadtree_depreceated_ray.state import fsio, manifest
from osmquadtree_depreceated_ray.stages.write_tiles import (
    _split_impl, _write_range_impl, _writer_ranges, write_tiled)


@pytest.fixture
def memfs():
    import fsspec

    fs = fsspec.filesystem("memory")
    fs.store.clear()
    yield fs
    fs.store.clear()


def _demo_table():
    tiles = np.repeat(np.array([10, 20, 30], dtype=np.int64), [40, 30, 30])
    return pa.table({"tile": tiles, "v": np.arange(100, dtype=np.int64)})


def test_exchange_on_memory_fs(memfs):
    """Split + range-write + manifest against memory:// end-to-end."""
    t = _demo_table()
    tiles = np.array([10, 20, 30], dtype=np.int64)
    counts = np.array([40, 30, 30], dtype=np.int64)
    wid = _writer_ranges(tiles, counts, 2)
    n_writers = int(wid.max()) + 1
    pieces = [_split_impl(tiles, wid, n_writers, None, b)
              for b in (t.slice(0, 55), t.slice(55))]
    out = "memory://sink/data"
    rows = sum(
        _write_range_impl(w, out, None, None,
                          *[pieces[b][w] for b in range(len(pieces))])
        for w in range(n_writers))
    assert rows == 100

    # parts exist on the memory fs, not on local disk
    for tl, c in zip(tiles, counts):
        d = f"/sink/data/tile={tl}"
        names = fsio.list_basenames(memfs, d)
        assert len([n for n in names if n.endswith(".parquet")]) == 1
        with memfs.open(fsio.join(d, names[0]), "rb") as f:
            assert pq.read_table(f).num_rows == c
    # no tmp residue anywhere
    assert not [p for p in memfs.find("/sink") if ".tmp" in p]

    # manifest-gated visibility: invisible before commit, visible after
    root = "memory://sink"
    assert len(manifest.completed_tiles(root)) == 0
    manifest.write_manifest(root, tiles, counts, {"sequence": 0})
    assert manifest.completed_tiles(root).tolist() == tiles.tolist()
    assert manifest.read_state(root) == {"sequence": 0}
    m = manifest.read_manifest(root)
    assert m.column("count").to_pylist() == counts.tolist()


def test_stale_parts_invisible_and_retired(memfs):
    """A crashed run's parts are invisible (no manifest) and retired by
    the next successful writer for the same tile."""
    t = _demo_table()
    tiles = np.array([10, 20, 30], dtype=np.int64)
    counts = np.array([40, 30, 30], dtype=np.int64)
    out = "memory://sink2/data"
    # "crashed" 3-writer run: parts land, manifest never written
    wid3 = _writer_ranges(tiles, counts, 3)
    n3 = int(wid3.max()) + 1
    p3 = _split_impl(tiles, wid3, n3, None, t)
    for w in range(n3):
        _write_range_impl(w, out, None, None, p3[w])
    assert len(manifest.completed_tiles("memory://sink2")) == 0

    # fresh single-writer run retires the stale layout
    wid1 = _writer_ranges(tiles, counts, 1)
    p1 = _split_impl(tiles, wid1, 1, None, t)
    _write_range_impl(0, out, None, None, p1)
    for tl, c in zip(tiles, counts):
        d = f"/sink2/data/tile={tl}"
        names = [n for n in fsio.list_basenames(memfs, d)
                 if n.endswith(".parquet")]
        assert names == ["part-0.parquet"]
    manifest.write_manifest("memory://sink2", tiles, counts)
    assert manifest.completed_tiles("memory://sink2").tolist() == tiles.tolist()


def test_lineage_buckets_on_memory_fs(memfs):
    """Bucketed lineage store round-trips through a scheme-qualified path."""
    t = pa.table({"tile": np.array([10, 10, 20], dtype=np.int64),
                  "v": np.arange(3, dtype=np.int64),
                  "entity_id": np.array([1, 17, 2], dtype=np.int64)})
    tiles = np.array([10, 20], dtype=np.int64)
    wid = _writer_ranges(tiles, np.array([2, 1], dtype=np.int64), 1)
    piece = _split_impl(tiles, wid, 1, None, t)
    root = "memory://sink3"
    _write_range_impl(0, manifest.data_dir(root), manifest.lineage_dir(root),
                      None, piece)
    # ids 1 and 17 share bucket 1 (mod 16); id 2 is bucket 2
    got = manifest.read_lineage_buckets(root, [1])
    assert sorted(got.column("entity_id").to_pylist()) == [1, 17]
    assert manifest.read_lineage_buckets(root, [2]) \
        .column("entity_id").to_pylist() == [2]
    # consolidation replaces writer parts
    manifest.write_lineage_bucket(root, 1, got)
    bd = "/sink3/lineage/bucket=1"
    assert [n for n in fsio.list_basenames(memfs, bd)
            if n.endswith(".parquet")] == ["consolidated.parquet"]


def test_write_tiled_file_scheme(ray_session, tmp_path):
    """The full Ray exchange accepts a scheme-qualified local URL."""
    import ray

    t = _demo_table()
    tiles = np.array([10, 20, 30], dtype=np.int64)
    counts = np.array([40, 30, 30], dtype=np.int64)
    out_local = tmp_path / "schemed"
    n = write_tiled(ray.data.from_arrow(t).repartition(3),
                    f"file://{out_local}", tiles, counts, n_writers=2)
    assert n == 100
    # visible at the plain local path, atomic path left no tmp files
    for tl, c in zip(tiles, counts):
        d = out_local / f"tile={tl}"
        assert pq.read_table(str(d)).num_rows == c
        assert not [f for f in d.iterdir() if f.name.endswith(".tmp")]


def test_commit_parquet_local_atomic(tmp_path):
    """Local commit goes through tmp+rename and leaves no residue."""
    fs, root = fsio.get_fs(str(tmp_path))
    assert fsio.supports_atomic_rename(fs)
    dest = fsio.join(root, "x.parquet")
    fsio.commit_parquet(pa.table({"a": [1, 2]}), fs, dest)
    assert pq.read_table(dest).num_rows == 2
    assert [p.name for p in tmp_path.iterdir()] == ["x.parquet"]


def test_ordered_read_on_memory_fs(memfs):
    """The ordered readers are scheme-routed like the sink: a tiled
    layout committed to memory:// lists and reads back in qt order
    (driver-side — the memory backend is per-process)."""
    from osmquadtree_depreceated_ray.pipelines.tile import (
        _ordered_tiles_and_paths, _read_tile_impl)

    t = _demo_table()
    tiles = np.array([10, 20, 30], dtype=np.int64)
    counts = np.array([40, 30, 30], dtype=np.int64)
    wid = _writer_ranges(tiles, counts, 2)
    n_writers = int(wid.max()) + 1
    pieces = [_split_impl(tiles, wid, n_writers, None, b)
              for b in (t.slice(0, 55), t.slice(55))]
    out = "memory://osink"
    data = "memory://osink/data"
    for w in range(n_writers):
        _write_range_impl(w, data, None, None,
                          *[pieces[b][w] for b in range(len(pieces))])
    manifest.write_manifest(out, tiles, counts)

    per = _ordered_tiles_and_paths(out)
    assert [t_ for t_, _f in per] == [10, 20, 30]
    got_rows = 0
    for t_, files in per:
        assert all(f.startswith("memory://") for f in files)
        tab = _read_tile_impl(files, None)
        got_rows += tab.num_rows
    assert got_rows == 100
