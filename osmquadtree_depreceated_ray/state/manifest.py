"""Per-partition manifests + lineage — the LocationsCache/state analogue.

The reference tracks (element -> file/tile) lineage in a persistent
LocationsCache (/root/reference/locationscache/locationscache.go:18-90)
and a per-snapshot state number; readers use the file-header block index
as a partition manifest (/root/reference/write/header.go:21-35).  Here:

* output layout: ``<out>/data/tile=<qt>/*.parquet`` (Hive partitioning
  — the partition dirs ARE the block index, prunable at read time),
* ``manifest.parquet``: one row per tile (tile, count) + ``state.json``
  (sequence number, params) written LAST — a tile listed in the manifest
  is complete, so a rerun skips it (idempotent per-partition writes),
* ``lineage.parquet``: entity_id -> tile, driving incremental updates
  (J10: only re-read affected tiles).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def write_manifest(out_dir: str, tiles: np.ndarray, counts: np.ndarray,
                   state: dict | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({"tile": pa.array(tiles, pa.int64()),
                  "count": pa.array(counts, pa.int64())}),
        os.path.join(out_dir, "manifest.parquet"),
    )
    with open(os.path.join(out_dir, "state.json"), "w") as f:
        json.dump(state or {}, f)


def read_manifest(out_dir: str):
    p = os.path.join(out_dir, "manifest.parquet")
    if not os.path.exists(p):
        return None
    return pq.read_table(p)


def read_state(out_dir: str) -> dict:
    p = os.path.join(out_dir, "state.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def completed_tiles(out_dir: str) -> np.ndarray:
    """Tiles whose partition is complete (listed in the manifest AND whose
    Hive dir exists)."""
    m = read_manifest(out_dir)
    if m is None:
        return np.zeros(0, dtype=np.int64)
    tiles = m.column("tile").to_numpy()
    dd = data_dir(out_dir)
    ok = [t for t in tiles if os.path.isdir(os.path.join(dd, f"tile={t}"))]
    return np.asarray(ok, dtype=np.int64)


LINEAGE_BUCKETS = 16


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def lineage_bucket(entity_id):
    """Bucket assignment for the lineage store (entity_id -> bucket).
    An update batch reads/rewrites ONLY its ids' buckets — the indexed
    LocationsCache analogue (locationscache/pbfindex.go:34-305): state
    touched per increment is O(batch), not O(corpus)."""
    return entity_id % LINEAGE_BUCKETS


def lineage_bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(lineage_dir(out_dir), f"bucket={int(bucket)}")


def write_lineage(out_dir: str, table: pa.Table) -> None:
    """Legacy single-file lineage write (kept for small callers).  The
    tiling writers and the update path use the bucketed ``lineage/``
    store instead; the single file, when present, is the newer state."""
    pq.write_table(table, os.path.join(out_dir, "lineage.parquet"))


def write_lineage_bucket(out_dir: str, bucket: int, table: pa.Table) -> None:
    """Atomically replace one lineage bucket with a consolidated file."""
    d = lineage_bucket_dir(out_dir, bucket)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".consolidated.parquet.tmp")
    pq.write_table(table, tmp)
    final = "consolidated.parquet"
    os.replace(tmp, os.path.join(d, final))
    for f in os.listdir(d):
        if f != final and not f.startswith("."):
            os.remove(os.path.join(d, f))


def read_lineage_buckets(out_dir: str, buckets) -> pa.Table | None:
    """Read ONLY the given buckets of the lineage store (the per-batch
    update path).  Falls back to filtering the legacy single file."""
    d = lineage_dir(out_dir)
    tables = []
    for b in buckets:
        bd = lineage_bucket_dir(out_dir, b)
        if os.path.isdir(bd):
            for f in sorted(os.listdir(bd)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(bd, f)))
    if tables:
        return pa.concat_tables(tables, promote_options="default")
    p = os.path.join(out_dir, "lineage.parquet")
    if os.path.exists(p):
        t = pq.read_table(p)
        bs = np.asarray(sorted(int(b) for b in buckets))
        m = np.isin(lineage_bucket(t.column("entity_id").to_numpy()), bs)
        return t.filter(pa.array(m))
    if os.path.isdir(d) and not any(
            name.startswith("bucket=") for name in os.listdir(d)):
        # legacy flat writer parts: filter the whole dir
        t = pq.read_table(d)
        bs = np.asarray(sorted(int(b) for b in buckets))
        m = np.isin(lineage_bucket(t.column("entity_id").to_numpy()), bs)
        return t.filter(pa.array(m))
    return None


def read_lineage(out_dir: str) -> pa.Table | None:
    p = os.path.join(out_dir, "lineage.parquet")
    if os.path.exists(p):
        return pq.read_table(p)
    d = lineage_dir(out_dir)
    if os.path.isdir(d) and os.listdir(d):
        t = pq.read_table(d)
        if "bucket" in t.column_names:  # hive partition column
            t = t.drop_columns(["bucket"])
        return t
    return None
