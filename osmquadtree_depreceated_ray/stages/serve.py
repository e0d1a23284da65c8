"""Per-tile interactive serving store (reference T6 PackedDataStore,
/root/reference/packeddatastore/packeddatastore.go:228-463): a resident
actor holding hot tiles in memory and answering
``Filter(bbox, cols, sort_by, limit)`` without re-reading cold data.

Ray shape: one ``TileServer`` per served output directory, created with
``ray.remote(TileServer).remote(out_dir)`` (or used inline for tests).
The manifest is the partition index (tiles pruned before any IO), tile
tables are cached with LRU eviction bounded by ``cache_tiles``, and the
row filter / projection / sort run as Arrow compute on the cached
tables — the interactive analogue of the batch path in
pipelines/spatial_filter.read_tiles_pruned.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state import manifest as mf


class TileServer:
    """Resident per-output serving store with an LRU tile cache."""

    def __init__(self, out_dir: str, cache_tiles: int = 64):
        self.out_dir = out_dir
        self.cache_tiles = int(cache_tiles)
        man = mf.read_manifest(out_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest in {out_dir}")
        self.tiles = np.sort(man.column("tile").to_numpy())
        self._cache: OrderedDict[int, pa.Table] = OrderedDict()
        self._hits = 0
        self._misses = 0

    # -- tile cache ----------------------------------------------------------
    def _load_tile(self, tile: int) -> pa.Table | None:
        if tile in self._cache:
            self._cache.move_to_end(tile)
            self._hits += 1
            return self._cache[tile]
        d = os.path.join(mf.data_dir(self.out_dir), f"tile={int(tile)}")
        if not os.path.isdir(d):
            return None
        t = pq.read_table(d)
        self._misses += 1
        self._cache[tile] = t
        while len(self._cache) > self.cache_tiles:
            self._cache.popitem(last=False)
        return t

    def stats(self) -> dict:
        return {"tiles": int(len(self.tiles)), "cached": len(self._cache),
                "hits": self._hits, "misses": self._misses}

    # -- queries -------------------------------------------------------------
    def filter(self, bbox=None, columns=None, sort_by=None,
               limit: int | None = None) -> pa.Table:
        """PackedDataStore.Filter: prune tiles by bbox, exact-filter rows
        by containment, project, sort, limit (packeddatastore.go:228-463;
        the sortby/limit tail is simpleSelect's, sqlselect/tables.go)."""
        from ..pipelines.spatial_filter import BboxTest

        if bbox is not None:
            minx, miny, maxx, maxy = (int(v) for v in bbox)
            lt = BboxTest(minx, miny, maxx, maxy)
            keep = lt.intersects_qt(self.tiles)
            tiles = self.tiles[keep]
        else:
            lt = None
            tiles = self.tiles
        parts = []
        for t in tiles:
            tbl = self._load_tile(int(t))
            if tbl is None or not tbl.num_rows:
                continue
            if lt is not None:
                m = lt.contains(tbl.column("lon").to_numpy(),
                                tbl.column("lat").to_numpy())
                if not m.any():
                    continue
                tbl = tbl.filter(pa.array(m))
            if columns is not None:
                tbl = tbl.select([c for c in columns if c in tbl.column_names])
            parts.append(tbl)
        if not parts:
            empty = self._load_tile(int(self.tiles[0])) if len(self.tiles) else None
            if empty is not None:
                sel = empty.slice(0, 0)
                if columns is not None:
                    sel = sel.select(
                        [c for c in columns if c in sel.column_names])
                return sel
            return pa.table({})
        out = pa.concat_tables(parts, promote_options="default")
        if sort_by:
            keys = [(c, "ascending") for c in
                    ([sort_by] if isinstance(sort_by, str) else sort_by)]
            out = out.sort_by(keys)
        if limit is not None:
            out = out.slice(0, limit)
        return out

    def sql(self, sql_text: str, bbox=None,
            table_name: str = "tiles") -> pa.Table:
        """Interactive SQL over the served store — the reference's
        PackedDataStore -> sqlselect feed (packeddatastore.go:382-463
        hands tile blocks to the Parse'd query): tiles are bbox-pruned
        through the cache first, then the SQL string (the full
        sqlparse.py grammar) runs against them as table ``tiles``."""
        import ray

        from ..pipelines.sqlparse import parse_sql

        base = self.filter(bbox=bbox)
        if not base.num_rows and not base.column_names:
            return base
        out = parse_sql(sql_text, {table_name: ray.data.from_arrow(base)})
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
