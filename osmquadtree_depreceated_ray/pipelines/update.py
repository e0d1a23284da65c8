"""Incremental update pipeline (reference update/update.go:343-738 +
change/*.go — SURVEY J7-J10, §2.8 incremental state).

Change batches carry the reference's ChangeType lattice
(/root/reference/elements/elements.go:47-56):
    1 Delete   — object removed
    4 Modify   — payload changed (same tile)
    5 Create   — new object
Cross-tile moves are emitted as the reference does
(update.go:622-690): a ``Remove`` (2) record in the OLD tile plus an
``Unchanged`` (3) record carrying the payload in the NEW tile.

Lineage (entity -> tile, the LocationsCache analogue) determines the
affected tiles; only those partitions need rewriting on compaction.
Snapshot reads overlay base + change files with last-writer-wins by
(entity, seq) and the J8 merge rule: change code > 2 replaces the base
row, Delete/Remove drops it, otherwise the base row survives.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.qttree import QtAllocator
from ..functions.quadtree import calculate_point
from ..state import manifest as mf

CH_DELETE = 1
CH_REMOVE = 2
CH_UNCHANGED = 3
CH_MODIFY = 4
CH_CREATE = 5


def _changes_dir(out_dir: str) -> str:
    from ..state import fsio

    return fsio.join(out_dir, "changes")


def _changes_present(out_dir: str) -> bool:
    """True when retired-able change files exist — fs-routed so the
    overlay/compaction lifecycle runs on any fsspec backend."""
    from ..state import fsio

    fs, root = fsio.get_fs(_changes_dir(out_dir))
    return fs.isdir(root) and bool(fsio.list_basenames(fs, root))


def _migrate_legacy_lineage(out_dir: str) -> None:
    """One-time migration of a legacy single-file lineage.parquet into
    the bucketed store (a stale legacy file would shadow bucket state)."""
    from ..state import fsio

    fs, root = fsio.get_fs(out_dir)
    legacy = fsio.join(root, "lineage.parquet")
    if not fs.exists(legacy):
        return
    with fs.open(legacy, "rb") as f:
        t = pq.read_table(f)
    eids = t.column("entity_id").to_numpy()
    bks = mf.lineage_bucket(eids)
    for b in np.unique(bks):
        mf.write_lineage_bucket(out_dir, int(b), t.filter(pa.array(bks == b)))
    fs.rm(legacy)


def apply_change_batch(out_dir: str, changes: pa.Table, seq: int) -> dict:
    """Compute per-tile change records for one batch and update lineage.

    Only the affected tiles appear in the change file — the reference's
    partial re-read (S3/J10) becomes partition pruning over these tiles.

    Scale shape: the lineage store is bucketed by entity id
    (state/manifest.py LINEAGE_BUCKETS); a batch reads and rewrites ONLY
    its ids' buckets, so per-increment state IO is O(batch + touched
    buckets), never O(corpus) — the LocationsCache indexed-store
    semantics (locationscache/pbfindex.go:34-305).  The emit logic is a
    vectorized numpy case-when over the lattice, no per-row loop.
    """
    man = mf.read_manifest(out_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    alloc = QtAllocator(man.column("tile").to_numpy())
    _migrate_legacy_lineage(out_dir)

    df = changes.to_pandas()
    df = df[df["seq"] == seq]
    # last-wins within the batch (J9 semantics, defensive)
    df = df.drop_duplicates(subset=["entity_id"], keep="last")

    eid = df["entity_id"].to_numpy().astype(np.int64)
    code = df["change"].to_numpy()
    lon = df["lon"].to_numpy().astype(np.int64)
    lat = df["lat"].to_numpy().astype(np.int64)
    qt = calculate_point(lon, lat, 0.05, 18)
    new_tile = alloc.assign(qt)

    # old tile lookup from ONLY the affected lineage buckets
    buckets = np.unique(mf.lineage_bucket(eid))
    lin_t = mf.read_lineage_buckets(out_dir, buckets.tolist())
    if lin_t is not None and lin_t.num_rows:
        o_ids = lin_t.column("entity_id").to_numpy().astype(np.int64)
        o_tiles = lin_t.column("tile").to_numpy().astype(np.int64)
        order = np.argsort(o_ids, kind="stable")
        o_ids, o_tiles = o_ids[order], o_tiles[order]
    else:
        o_ids = np.zeros(0, np.int64)
        o_tiles = np.zeros(0, np.int64)
    pos = np.searchsorted(o_ids, eid)
    pos_c = np.clip(pos, 0, max(len(o_ids) - 1, 0))
    has_old = (pos < len(o_ids)) & (len(o_ids) > 0)
    if len(o_ids):
        has_old &= o_ids[pos_c] == eid
    old_tile = o_tiles[pos_c] if len(o_ids) else np.zeros(len(eid), np.int64)

    is_del = code == CH_DELETE
    is_mod = code == CH_MODIFY
    is_cre = code == CH_CREATE
    del_hit = is_del & has_old
    mod_same = is_mod & has_old & (old_tile == new_tile)
    mod_move = is_mod & has_old & (old_tile != new_tile)
    creates = is_cre | (is_mod & ~has_old)
    # a Create over an entity whose lineage points at a DIFFERENT tile
    # (e.g. a k-way-merged Delete∘Create collapsed to one Create) must
    # still purge the old tile's base row — same Remove-in-old-tile
    # record the mod_move pair emits (update.go:622-690); without it the
    # merged path leaves a stale duplicate that direct tile readers see
    cre_move = creates & has_old & (old_tile != new_tile)
    n_missing_delete = int((is_del & ~has_old).sum())

    zero = np.zeros_like(eid)
    neg1 = np.full_like(eid, -1)

    def rows(mask, tile, ch, lo, la, q):
        n = int(mask.sum())
        return (tile[mask], eid[mask],
                np.full(n, ch, np.int8), lo[mask], la[mask], q[mask])

    groups = [
        rows(del_hit, old_tile, CH_DELETE, zero, zero, neg1),
        rows(mod_same, old_tile, CH_MODIFY, lon, lat, qt),
        rows(mod_move, old_tile, CH_REMOVE, zero, zero, neg1),
        rows(mod_move, new_tile, CH_UNCHANGED, lon, lat, qt),
        rows(cre_move, old_tile, CH_REMOVE, zero, zero, neg1),
        rows(creates, new_tile, CH_CREATE, lon, lat, qt),
    ]
    cat = [np.concatenate([g[i] for g in groups]) for i in range(6)]
    out = pa.table(
        {
            "tile": pa.array(cat[0]),
            "entity_id": pa.array(cat[1]),
            "change": pa.array(cat[2]),
            "lon": pa.array(cat[3]),
            "lat": pa.array(cat[4]),
            "qt": pa.array(cat[5]),
            "seq": pa.array(np.full(len(cat[0]), seq, np.int64)),
        }
    )
    from ..state import fsio

    cfs, croot = fsio.get_fs(_changes_dir(out_dir))
    cfs.makedirs(croot, exist_ok=True)
    fsio.commit_parquet(out, cfs,
                        fsio.join(croot, f"change_{seq:06d}.parquet"))

    # rewrite ONLY the affected lineage buckets: drop deleted ids, upsert
    # modified/created ids
    upd_mask = mod_same | mod_move | creates
    upd = pd.DataFrame({"entity_id": eid[upd_mask], "tile": new_tile[upd_mask]})
    dropped = set(eid[del_hit].tolist())
    old_df = (lin_t.to_pandas() if lin_t is not None
              else pd.DataFrame({"entity_id": [], "tile": []}))
    old_df = old_df[["entity_id", "tile"]].astype(np.int64)
    merged = pd.concat([old_df, upd], ignore_index=True)
    merged = merged.drop_duplicates(subset=["entity_id"], keep="last")
    if dropped:
        merged = merged[~merged["entity_id"].isin(dropped)]
    bks = mf.lineage_bucket(merged["entity_id"].to_numpy())
    for b in buckets:
        sub = merged[bks == b]
        mf.write_lineage_bucket(
            out_dir, int(b),
            pa.Table.from_pandas(sub, preserve_index=False))
    state = mf.read_state(out_dir)
    state["seq"] = seq
    man_df = man.to_pandas()
    mf.write_manifest(out_dir, man_df["tile"].to_numpy(), man_df["count"].to_numpy(),
                      state=state)
    return {
        "records": out.num_rows,
        "affected_tiles": int(pd.Series(cat[0]).nunique()),
        "missing_deletes": n_missing_delete,
    }


def merge_change_files(tables: list[pa.Table], seq: int | None = None) -> pa.Table:
    """J9 multi-file k-way change merge (readfile/parallel.go:16-101 +
    change/changefiles.go:156-230): k change tables ordered by their
    start date are aligned and collapsed to one last-wins batch — the
    later FILE wins per entity, and within a file the later record wins.

    Applying the merged batch once is equivalent to applying the files
    sequentially: the ChangeType lattice composes left-to-right into its
    final element (Create∘Modify ≡ Create-with-new-payload handled by
    the modify-without-lineage -> Create rule; X∘Delete ≡ Delete;
    Delete∘Create ≡ Create), which tests pin against sequential apply.
    """
    parts = []
    for k, t in enumerate(tables):
        parts.append(t.append_column(
            "_file", pa.array(np.full(t.num_rows, k, np.int64))))
    allc = pa.concat_tables(parts, promote_options="default")
    df = allc.to_pandas()
    order_cols = ["_file"] + (["seq"] if "seq" in df.columns else [])
    df = df.sort_values(order_cols, kind="stable")
    df = df.drop_duplicates(subset=["entity_id"], keep="last")
    df = df.drop(columns=["_file"])
    if seq is not None:
        df["seq"] = seq
    return pa.Table.from_pandas(df, preserve_index=False)


def apply_change_files(out_dir: str, paths: list[str], seq: int) -> dict:
    """Read k change files (each may hold several seqs), k-way merge,
    apply as one batch against the bucketed lineage."""
    tables = [pq.read_table(p) for p in paths]
    merged = merge_change_files(tables, seq=seq)
    return apply_change_batch(out_dir, merged, seq)


def read_snapshot(out_dir: str):
    """Base (+) all change batches — the J8/J9 overlay, Ray-Data shaped.

    Returns a Dataset of surviving (entity_id, lon, lat, qt, tile).
    """
    import ray

    from ..stages.shuffle import bucketed_apply

    base = ray.data.read_parquet(mf.data_dir(out_dir))

    def base_rows(b: pa.Table) -> pa.Table:
        tile = b.column("tile")
        if pa.types.is_dictionary(tile.type) or pa.types.is_string(tile.type):
            tile = pa.array(
                pd.to_numeric(tile.to_pandas()).astype("int64")
            )
        return pa.table(
            {
                "entity_id": b.column("entity_id"),
                "lon": b.column("lon"),
                "lat": b.column("lat"),
                "qt": b.column("qt"),
                "tile": tile,
                "change": pa.array(np.zeros(b.num_rows, np.int8)),
                "seq": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    cols = ["entity_id", "lon", "lat", "qt", "tile", "change", "seq"]
    base = base.map_batches(base_rows, batch_format="pyarrow").select_columns(cols)

    if _changes_present(out_dir):
        ch = ray.data.read_parquet(_changes_dir(out_dir)).select_columns(cols)
        both = base.union(ch)
    else:
        both = base

    def overlay(g: pd.DataFrame) -> pd.DataFrame:
        # J9: latest seq wins per entity per tile; J8: code>2 replaces,
        # Delete/Remove drop, base row (code 0) survives otherwise
        g = g.sort_values(["entity_id", "seq", "change"])  # move pair: Unchanged(3) outranks Remove(2)
        last = g.groupby("entity_id", as_index=False).last()
        keep = last[(last["change"] == 0) | (last["change"] > 2)]
        return keep[["entity_id", "lon", "lat", "qt", "tile"]]

    return bucketed_apply(both, ["entity_id"], overlay)


def _compact_tile_impl(data_dir: str, t: int, sub: pd.DataFrame):
    from ..state import fsio

    fs, root = fsio.get_fs(data_dir)
    tdir = fsio.join(root, f"tile={int(t)}")
    parts = []
    if fs.isdir(tdir):
        base = pq.read_table(tdir, filesystem=fs)
        bdf = base.to_pandas()
        bdf["change"] = 0
        bdf["seq"] = -1
        parts.append(bdf[["entity_id", "lon", "lat", "qt", "change", "seq"]])
    parts.append(sub)
    allr = pd.concat(parts, ignore_index=True)
    allr = allr.sort_values(["entity_id", "seq", "change"])
    last = allr.groupby("entity_id", as_index=False).last()
    keep = last[(last["change"] == 0) | (last["change"] > 2)][
        ["entity_id", "lon", "lat", "qt"]]
    fs.makedirs(tdir, exist_ok=True)
    # base rows carry extra columns (url/name/cells); compacted tiles
    # carry the core schema — readers select shared columns.  Commit via
    # fsio (tmp+rename local, direct PUT + manifest gate elsewhere);
    # stale pre-compaction parts retired after the commit.
    final = "part-compacted.parquet"
    fsio.commit_parquet(pa.Table.from_pandas(keep, preserve_index=False),
                        fs, fsio.join(tdir, final))
    fsio.remove_stale(fs, tdir, final)
    return int(t), int(len(keep))


def compact(out_dir: str) -> dict:
    """Merge accumulated change batches INTO the tile partitions —
    the reference's partial re-read/re-write (update.go:343-738 +
    readfile/partial.go): ONLY tiles named in change files are rewritten
    (tmp+rename per tile), everything else is untouched; change files
    are then retired.

    After compaction ``read_snapshot`` over the bare data dir equals the
    pre-compaction overlay.
    """
    import ray

    from ..stages.shuffle import bucketed_apply

    if not _changes_present(out_dir):
        return {"rewritten_tiles": 0, "retired_files": 0}
    cdir = _changes_dir(out_dir)
    data_dir = mf.data_dir(out_dir)

    # route the change stream to per-tile compaction through the
    # bucketed exchange (same shape as write_tiled): the driver never
    # materializes change rows — a deferred multi-sequence backlog
    # streams from parquet straight into the tile-keyed buckets.  Each
    # bucket task overlays every one of its tiles' base rows with that
    # tile's change slice and rewrites atomically (the reference
    # rewrites tiles on independent goroutines, update.go:343-738),
    # returning only (tile, new_count) for the manifest refresh.
    ch_ds = ray.data.read_parquet(
        cdir, columns=["entity_id", "lon", "lat", "qt", "tile",
                       "change", "seq"])

    def compact_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tiles, counts = [], []
        for t, grp in g.groupby("tile", sort=False):
            n_t, n_keep = _compact_tile_impl(
                data_dir, int(t),
                grp[["entity_id", "lon", "lat", "qt", "change", "seq"]])
            tiles.append(n_t)
            counts.append(n_keep)
        return pd.DataFrame({"tile": pd.Series(tiles, dtype=np.int64),
                             "count": pd.Series(counts, dtype=np.int64)})

    results_df = bucketed_apply(ch_ds, ["tile"], compact_bucket).to_pandas()
    results = list(zip(results_df["tile"].astype(int),
                       results_df["count"].astype(int)))

    retired = 0
    from ..state import fsio

    cfs, croot = fsio.get_fs(cdir)
    for f in fsio.list_basenames(cfs, croot):
        cfs.rm(fsio.join(croot, f))
        retired += 1
    # refresh manifest counts for rewritten tiles
    man = mf.read_manifest(out_dir).to_pandas()
    for t, n in results:
        if (man["tile"] == t).any():
            man.loc[man["tile"] == t, "count"] = n
        else:
            man = pd.concat(
                [man, pd.DataFrame({"tile": [int(t)], "count": [n]})],
                ignore_index=True,
            )
    state = mf.read_state(out_dir)
    state["compacted_seq"] = state.get("seq", 0)
    mf.write_manifest(out_dir, man["tile"].to_numpy(), man["count"].to_numpy(),
                      state=state)
    return {"rewritten_tiles": len(results), "retired_files": retired}
