"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial pipeline on /root/testdata/sf0.001;
``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 with DuckDB oracles (see
osmquadtree_depreceated_ray/pipelines/queries.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: derive geo-entities from the documents table, assign
    quadtree/S2/hex cells, run the count -> skew-split -> allocate flow,
    and return the per-tile summary (tile, count) as pandas."""
    import numpy as np
    import pandas as pd

    from osmquadtree_depreceated_ray.functions.qttree import QtAllocator, find_qt_groups
    from osmquadtree_depreceated_ray.pipelines.queries import derived_entities
    from osmquadtree_depreceated_ray.pipelines.tile import count_tiles

    ents = derived_entities(SF_SMOKE, table="orders", key_col="o_orderkey")
    qts, counts = count_tiles(ents)
    gq, gt = find_qt_groups(qts, counts, target=200, minimum=20, require_count=False)
    return pd.DataFrame({"tile": gq, "count": gt})


def queries() -> dict[str, Callable[[str], Any]]:
    from osmquadtree_depreceated_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osmquadtree_depreceated_ray.pipelines.queries import ORACLES

    # callable entries are lazy SQL generators (e.g. pip_poly's
    # fixture-derived crossing-number oracle) — resolve them here so
    # module import stays cheap for every Ray worker
    return {k: (v() if callable(v) else v) for k, v in ORACLES.items()}
