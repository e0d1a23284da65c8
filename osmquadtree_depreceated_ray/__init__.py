"""osmquadtree_depreceated_ray — a Ray-Data-native spatial tiling + join engine.

A from-scratch reimplementation of the semantics of
``jharris2268/osmquadtree-depreceated`` (quadtree tile assignment,
skew-aware max-per-tile splitting, ordered tile layout, geometry
construction, point-in-polygon / kNN / raster spatial joins, incremental
change application) as idiomatic Ray Data pipelines over zero-copy Arrow
batches, applied to Parquet tables of Common-Crawl-style web pages.

Layout:
    functions/  pure numpy/pyarrow kernels (quadtree math, cells, pnpoly, text)
    sources/    readers + deterministic synthetic fixture generators
    stages/     map_batches stages (stateless fns + stateful actor classes)
    pipelines/  end-to-end Dataset pipelines (tile, geometry, dedup, knn, ...)
    state/      manifests, lineage, checkpoint/resume helpers
"""

__version__ = "0.1.0"
