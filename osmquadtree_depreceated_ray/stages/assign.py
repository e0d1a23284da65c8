"""Cell / tile assignment stages (SURVEY §2.2 M1-M3), zero-copy Arrow.

``assign_cells`` adds the osmquadtree ``qt`` plus the S2 / hex companion
indexes to any batch carrying int64 1e-7-deg ``lon``/``lat`` columns.
``TileAssigner`` maps each row's qt to its output tile through a
broadcast :class:`~..functions.qttree.QtAllocator` — the map-side half
of the count -> split -> shuffle pipeline (reference P2,
/root/reference/blocksort/blocksort.go:229-272): the allocator is put in
the object store ONCE and read zero-copy by every actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import hex_cell_id, icosa_cell_id, s2_cell_id
from ..functions.quadtree import calculate_point, qt_round


QT_BUFFER = 0.05       # resortwaynodes.go:615
QT_MAX_LEVEL = 18
GEOM_BUFFER = 0.025    # geometry/geometry.go:314
S2_LEVEL = 16
HEX_RES = 9


def assign_cells(batch: pa.Table, buffer: float = QT_BUFFER,
                 max_level: int = QT_MAX_LEVEL,
                 include_icosa: bool = False) -> pa.Table:
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    qt = calculate_point(lon, lat, buffer, max_level)
    lon_deg = lon * 1e-7
    lat_deg = lat * 1e-7
    s2 = s2_cell_id(lon_deg, lat_deg, S2_LEVEL)
    hx = hex_cell_id(lon_deg, lat_deg, HEX_RES)
    out = (
        batch.append_column("qt", pa.array(qt))
        .append_column("cell_s2", pa.array(s2))
        .append_column("cell_hex", pa.array(hx))
    )
    if include_icosa:
        # the icosahedral aperture-7 index (20-face matmul + trig) is
        # opt-in: query surfaces request it; the flagship tiling hot
        # path keeps the cheaper qt/s2/planar-hex triple
        ic = icosa_cell_id(lon_deg, lat_deg, HEX_RES)
        out = out.append_column("cell_icosa", pa.array(ic))
    return out


def qt_prefix_counts(batch: pa.Table, level: int = QT_MAX_LEVEL) -> pa.Table:
    """Map-side partial aggregation for the tile-count trie (A1 —
    qttree.go:282-319): one (qt, n) row per distinct rounded qt per
    batch, so the global groupby shuffles partials, not rows."""
    qt = qt_round(batch.column("qt").to_numpy(), level)
    vals, counts = np.unique(qt, return_counts=True)
    return pa.table({"qt": pa.array(vals), "n": pa.array(counts.astype(np.int64))})


class TileAssigner:
    """Actor-pool stage: qt -> output tile via broadcast allocator.

    ``alloc_ref`` is a ``ray.ObjectRef`` to a QtAllocator — fetched once
    per actor in ``__init__`` (zero-copy plasma read), reused per batch.
    """

    def __init__(self, alloc_ref):
        import ray

        self.alloc = ray.get(alloc_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tiles = self.alloc.assign(batch.column("qt").to_numpy())
        return batch.append_column("tile", pa.array(tiles))
