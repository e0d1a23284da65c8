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


def count_tiles_adaptive(
    entities_ds,
    target: int = DEFAULT_TARGET,
    levels: tuple = (6, 12, QT_MAX_LEVEL),
):
    """Hierarchical tile counting with hot-cell refinement — the scalable
    replacement for a flat max-level count.

    Only cells with count > target+50 are refined one level-step deeper
    (re-counted over the rows under them); everything else is emitted as
    a leaf.  This is EXACTLY equivalent as input to
    :func:`~..functions.qttree.find_qt_groups`: the widening pass visits
    a node's children only when ``total > mx`` (mx starts at target+50
    and only grows), and any unrefined cell satisfies
    ``total <= target+50 <= mx`` so it is always accepted whole, never
    descended into — pinned by tests/test_qttree.py::test_adaptive_counts.

    Driver-side data is therefore O(output tiles), independent of corpus
    size — at 10^12 docs a flat level-18 count (~10^10 distinct cells)
    could never reach the driver.  Each refinement round is one
    column-pruned pass over the (shrinking) hot subset.
    """
    import ray

    threshold = target + 50
    out_q: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    hot_prefixes: np.ndarray | None = None
    prev_level: int | None = None
    ds = entities_ds

    for i, level in enumerate(levels):
        if hot_prefixes is not None and len(hot_prefixes) == 0:
            break
        if hot_prefixes is not None:
            pref = ray.put(np.sort(hot_prefixes))
            pl = prev_level

            def _filter(b: pa.Table, _pref=pref, _pl=pl) -> pa.Table:
                hot = ray.get(_pref)
                q = qt_round(b.column("qt").to_numpy(), _pl)
                pos = np.searchsorted(hot, q)
                pos_c = np.clip(pos, 0, max(len(hot) - 1, 0))
                keep = (pos < len(hot)) & (hot[pos_c] == q)
                return b.filter(pa.array(keep))

            ds = entities_ds.map_batches(_filter, batch_format="pyarrow")
        qts, counts = count_tiles(ds, level)
        if level == levels[-1]:
            out_q.append(qts)
            out_n.append(counts)
            break
        # cells shallower than this level are the row's own (seam-stopped)
        # qt — they cannot be refined and are final leaves regardless of
        # count; only exact-depth hot cells spawn a refinement round
        depth = qts & 31
        cold = (counts <= threshold) | (depth < level)
        out_q.append(qts[cold])
        out_n.append(counts[cold])
        hot_prefixes = qts[~cold]
        prev_level = level

    if not out_q:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    q = np.concatenate(out_q)
    n = np.concatenate(out_n)
    order = np.argsort(q, kind="stable")
    return q[order], n[order]


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
    concurrency=(1, 16),
    state: dict | None = None,
    allocator=None,
):
    """Count -> split -> assign -> partitioned write (+ manifest, lineage).

    ``allocator`` (reference §2.9 pluggable ``Allocater``,
    blocksort/blocksort.go:185): any object with ``assign(qts) ->
    tile array``; defaults to the QtAllocator built from the split rule.

    Returns dict(tiles=int, total=int, skipped_tiles=int, timings=dict).
    """
    import time

    import ray

    timings = {}
    t0 = time.time()
    qts, counts = count_tiles_adaptive(entities_ds, target)
    timings["count"] = round(time.time() - t0, 2)
    t0 = time.time()
    gq, gt, alloc = split_and_allocate(qts, counts, target, minimum)
    if allocator is not None:
        alloc = allocator
    timings["split"] = round(time.time() - t0, 2)
    alloc_ref = ray.put(alloc)
    t0 = time.time()

    done = mf.completed_tiles(out_dir) if resume else np.zeros(0, np.int64)
    assigned = entities_ds.map_batches(
        TileAssigner,
        fn_constructor_args=(alloc_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    # single-exchange boundary-aware shuffle + atomic per-tile files
    # (stages/write_tiles.py): one file per tile, reference's tile-ordered
    # layout (writefile.go:50-52), resumable (completed tiles skipped)
    from ..stages.write_tiles import write_tiled

    has_entity_id = "entity_id" in entities_ds.schema().names
    lin_file = os.path.join(out_dir, "lineage.parquet")
    if has_entity_id and os.path.exists(lin_file):
        os.remove(lin_file)  # a fresh tiling invalidates update lineage
    n_writers = max(concurrency[1] if isinstance(concurrency, tuple) else 8, 8)
    write_tiled(assigned, mf.data_dir(out_dir), gq, gt,
                n_writers=n_writers, skip_tiles=done,
                lineage_dir=mf.lineage_dir(out_dir) if has_entity_id else None)
    timings["assign_write"] = round(time.time() - t0, 2)
    t0 = time.time()

    timings["lineage"] = 0.0  # folded into write_tiled

    mf.write_manifest(out_dir, gq, gt, state=dict(state or {}, target=target,
                                                  minimum=minimum, seq=0))
    return {
        "tiles": int(len(gq)),
        "total": int(gt.sum()),
        "skipped_tiles": int(len(done)),
        "timings": timings,
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
    import time

    t_extract = 0.0
    ents2 = None
    if not (resume and os.path.exists(ent_marker)):
        # a partial previous extraction must not leave appendable files
        import shutil

        t0 = time.time()
        shutil.rmtree(ent_path, ignore_errors=True)
        pages = ray.data.read_parquet(
            pages_path, columns=["url", "warc_ts", "html", "lang"]
        )
        # materialize once: the entities table is consumed several times
        # (adaptive count rounds + assignment) — keep it in the object
        # store instead of re-reading parquet each pass; the parquet
        # checkpoint (coalesced files) is still written for resume and
        # downstream consumers
        ents2 = pages_to_entities(pages).materialize()
        ents2.write_parquet(ent_path, min_rows_per_file=100_000)
        with open(ent_marker, "w") as f:
            f.write("ok\n")
        t_extract = round(time.time() - t0, 2)
    if ents2 is None:
        ents2 = ray.data.read_parquet(ent_path)
    res = tile_entities(ents2, out_dir, target, minimum, resume)
    res["timings"]["extract"] = t_extract
    res["entities_ds"] = ents2  # reusable in-memory handle for callers
    return res


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


def read_tiled_ordered(out_dir: str, columns=None):
    """Read the tiled output in NUMERIC tile (qt pre-order) order — the
    reference's block-order invariant (writefile.go:50-52).  Hive paths
    sort lexicographically, so the file list is ordered explicitly; with
    ``preserve_order`` the stream yields tiles in ascending qt order."""
    import ray

    dd = mf.data_dir(out_dir)
    tiles = sorted(
        (int(name.split("=", 1)[1]) for name in os.listdir(dd)
         if name.startswith("tile=")),
    )
    paths = []
    for t in tiles:
        d = os.path.join(dd, f"tile={t}")
        paths.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    ctx = ray.data.DataContext.get_current()
    ctx.execution_options.preserve_order = True
    return ray.data.read_parquet(paths, columns=columns), tiles
