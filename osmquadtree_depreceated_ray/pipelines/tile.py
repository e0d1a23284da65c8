"""The flagship tiling pipeline (reference P1+P2, SURVEY §3).

    pages ── extract_text ── extract_entities ── assign_cells ─▶ entities
    entities ── qt_prefix_counts ──▶ driver: find_qt_groups (split rule)
    entities ── TileAssigner(broadcast allocator) ──▶ Hive-partitioned
        parquet by tile + manifest + lineage

Ray-Data design notes:
* html is projected away in the very first stage; entities (a few ints +
  short strings per row) are checkpointed to parquet so the count pass
  and the assignment pass re-read the SMALL table, not the pages.
* the tile-count aggregation is map-side partial (one row per distinct
  qt per batch) and merged on the driver — the trie input is tile
  counts, never raw rows (A1/A5, qttree.go:282-319,508-627).
* the allocator is ``ray.put`` once and read zero-copy per actor.
* writes are Hive-partitioned by tile; the manifest is written last, so
  a rerun with resume=True skips tiles already recorded (idempotent
  per-partition writes, reference T5/J10 lineage semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.qttree import QtAllocator, find_qt_groups
from ..functions.quadtree import qt_round
from ..stages.assign import QT_MAX_LEVEL, TileAssigner, assign_cells, qt_prefix_counts
from ..stages.extract import extract_entities, extract_text
from ..state import manifest as mf

DEFAULT_TARGET = 8000
DEFAULT_MINIMUM = 500


def pages_to_entities(pages_ds, parallelism_hint: int | None = None):
    """pages Dataset -> entity Dataset with qt / cell_s2 / cell_h3."""
    from ..stages.extract import add_entity_id

    ents = (
        pages_ds.map_batches(extract_text, batch_format="pyarrow")
        .map_batches(extract_entities, batch_format="pyarrow")
        .map_batches(add_entity_id, batch_format="pyarrow")
        .map_batches(assign_cells, batch_format="pyarrow")
    )
    return ents


def count_tiles(entities_ds, level: int = QT_MAX_LEVEL):
    """Distributed partial counts -> driver-side merged (qt, n) arrays."""
    parts_q = []
    parts_n = []
    counts = entities_ds.map_batches(
        lambda b: qt_prefix_counts(b, level), batch_format="pyarrow"
    )
    for b in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts_q.append(b.column("qt").to_numpy())
        parts_n.append(b.column("n").to_numpy())
    if not parts_q:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    q = np.concatenate(parts_q)
    n = np.concatenate(parts_n)
    order = np.argsort(q, kind="stable")
    q, n = q[order], n[order]
    starts = np.concatenate([[0], np.flatnonzero(q[1:] != q[:-1]) + 1])
    return q[starts], np.add.reduceat(n, starts)


def split_and_allocate(qts, counts, target=DEFAULT_TARGET, minimum=DEFAULT_MINIMUM):
    """Driver-side split rule -> (group_qts, group_counts, QtAllocator)."""
    gq, gt = find_qt_groups(qts, counts, target, minimum, require_count=False)
    return gq, gt, QtAllocator(gq)


def tile_entities(
    entities_ds,
    out_dir: str,
    target: int = DEFAULT_TARGET,
    minimum: int = DEFAULT_MINIMUM,
    resume: bool = True,
    concurrency=(1, 8),
    state: dict | None = None,
):
    """Count -> split -> assign -> partitioned write (+ manifest, lineage).

    Returns dict(tiles=int, total=int, skipped_tiles=int).
    """
    import ray

    qts, counts = count_tiles(entities_ds)
    gq, gt, alloc = split_and_allocate(qts, counts, target, minimum)
    alloc_ref = ray.put(alloc)

    done = mf.completed_tiles(out_dir) if resume else np.zeros(0, np.int64)
    assigned = entities_ds.map_batches(
        TileAssigner,
        fn_constructor_args=(alloc_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if len(done):
        done_set = done

        def _skip_done(t: pa.Table) -> pa.Table:
            tile = t.column("tile").to_numpy()
            keep = ~np.isin(tile, done_set)
            return t.filter(pa.array(keep))

        assigned = assigned.map_batches(_skip_done, batch_format="pyarrow")

    assigned.write_parquet(mf.data_dir(out_dir), partition_cols=["tile"])

    # lineage (T5/J10): entity -> tile, drives incremental updates
    if "entity_id" in entities_ds.schema().names:
        lineage_ds = entities_ds.map_batches(
            TileAssigner,
            fn_constructor_args=(alloc_ref,),
            batch_format="pyarrow",
            concurrency=concurrency,
        ).select_columns(["entity_id", "tile"])
        import pyarrow as _pa

        mf.write_lineage(
            out_dir,
            _pa.Table.from_pandas(lineage_ds.to_pandas(), preserve_index=False),
        )

    mf.write_manifest(out_dir, gq, gt, state=dict(state or {}, target=target,
                                                  minimum=minimum, seq=0))
    return {
        "tiles": int(len(gq)),
        "total": int(gt.sum()),
        "skipped_tiles": int(len(done)),
    }


def tile_pages(
    pages_path: str,
    out_dir: str,
    target: int = DEFAULT_TARGET,
    minimum: int = DEFAULT_MINIMUM,
    resume: bool = True,
):
    """Full flagship: pages parquet -> tiled entity parquet + manifest."""
    import ray

    ent_path = os.path.join(out_dir, "entities")
    ent_marker = os.path.join(out_dir, "entities.done")
    if not (resume and os.path.exists(ent_marker)):
        # a partial previous extraction must not leave appendable files
        import shutil

        shutil.rmtree(ent_path, ignore_errors=True)
        pages = ray.data.read_parquet(
            pages_path, columns=["url", "warc_ts", "html", "lang"]
        )
        ents = pages_to_entities(pages)
        ents.write_parquet(ent_path)
        with open(ent_marker, "w") as f:
            f.write("ok\n")
    ents2 = ray.data.read_parquet(ent_path)
    return tile_entities(ents2, out_dir, target, minimum, resume)


def tiled_summary(out_dir: str):
    """Per-tile counts from the written partitions (tile, n rows)."""
    import ray

    ds = ray.data.read_parquet(mf.data_dir(out_dir))
    return ds.groupby("tile").count()


def write_qts(entities_ds, out_path: str) -> None:
    """S10: qts-only output — the (id -> qt) result stream as its own
    artifact (writefile.go:223-235)."""
    cols = [c for c in ("entity_id", "url", "name", "qt") if c in
            entities_ds.schema().names]
    entities_ds.select_columns(cols).write_parquet(out_path)


def resort_by_id(out_dir: str, group_size: int = 8000):
    """O2: inverse shuffle — tiled layout back to id order in uniform
    blocks (blocksort/byelementid.go:18-53; groupSize 8000 as the
    reference's block size)."""
    import ray

    ds = ray.data.read_parquet(mf.data_dir(out_dir))
    n = ds.count()
    blocks = max(1, n // group_size)
    out = ds.sort("entity_id").repartition(blocks)
    path = os.path.join(out_dir, "byid")
    out.write_parquet(path)
    return path
