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
    return os.path.join(out_dir, "changes")


def apply_change_batch(out_dir: str, changes: pa.Table, seq: int) -> dict:
    """Compute per-tile change records for one batch and update lineage.

    Only the affected tiles appear in the change file — the reference's
    partial re-read (S3/J10) becomes partition pruning over these tiles.
    """
    man = mf.read_manifest(out_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    alloc = QtAllocator(man.column("tile").to_numpy())

    lineage_t = mf.read_lineage(out_dir)
    lineage = (
        lineage_t.to_pandas().set_index("entity_id")["tile"]
        if lineage_t is not None
        else pd.Series(dtype="int64")
    )

    df = changes.to_pandas()
    df = df[df["seq"] == seq]
    # last-wins within the batch (J9 semantics, defensive)
    df = df.drop_duplicates(subset=["entity_id"], keep="last")

    eid = df["entity_id"].to_numpy()
    code = df["change"].to_numpy()
    lon = df["lon"].to_numpy()
    lat = df["lat"].to_numpy()
    qt = calculate_point(lon, lat, 0.05, 18)
    new_tile = alloc.assign(qt)
    # NB: keep tile ids as Python ints — a float64 round-trip (e.g. via
    # reindex-with-NaN) silently destroys the low depth bits of 63-bit ids
    old_map = {int(k): int(v) for k, v in lineage.items()}

    rec = {k: [] for k in ("tile", "entity_id", "change", "lon", "lat", "qt", "seq")}

    def emit(tile, e, ch, lo=0, la=0, q=-1):
        rec["tile"].append(int(tile))
        rec["entity_id"].append(int(e))
        rec["change"].append(int(ch))
        rec["lon"].append(int(lo))
        rec["lat"].append(int(la))
        rec["qt"].append(int(q))
        rec["seq"].append(seq)

    new_lineage = dict(old_map)
    n_missing_delete = 0
    for i in range(len(df)):
        e = int(eid[i])
        old = old_map.get(e)
        has_old = old is not None
        if code[i] == CH_DELETE:
            if has_old:
                emit(int(old), e, CH_DELETE)
                new_lineage.pop(e, None)
            else:
                n_missing_delete += 1  # tolerated (update.go delete-of-missing)
        elif code[i] == CH_MODIFY:
            if has_old and int(old) == int(new_tile[i]):
                emit(int(old), e, CH_MODIFY, lon[i], lat[i], qt[i])
            elif has_old:
                # cross-tile move: Remove from old + Unchanged into new
                emit(int(old), e, CH_REMOVE)
                emit(int(new_tile[i]), e, CH_UNCHANGED, lon[i], lat[i], qt[i])
            else:
                emit(int(new_tile[i]), e, CH_CREATE, lon[i], lat[i], qt[i])
            new_lineage[e] = int(new_tile[i])
        elif code[i] == CH_CREATE:
            emit(int(new_tile[i]), e, CH_CREATE, lon[i], lat[i], qt[i])
            new_lineage[e] = int(new_tile[i])

    out = pa.table(
        {
            "tile": pa.array(rec["tile"], pa.int64()),
            "entity_id": pa.array(rec["entity_id"], pa.int64()),
            "change": pa.array(rec["change"], pa.int8()),
            "lon": pa.array(rec["lon"], pa.int64()),
            "lat": pa.array(rec["lat"], pa.int64()),
            "qt": pa.array(rec["qt"], pa.int64()),
            "seq": pa.array(rec["seq"], pa.int64()),
        }
    )
    os.makedirs(_changes_dir(out_dir), exist_ok=True)
    pq.write_table(out, os.path.join(_changes_dir(out_dir), f"change_{seq:06d}.parquet"))

    lin = pd.Series(new_lineage, name="tile")
    lin.index.name = "entity_id"
    mf.write_lineage(out_dir, pa.Table.from_pandas(lin.reset_index(),
                                                   preserve_index=False))
    state = mf.read_state(out_dir)
    state["seq"] = seq
    man_df = man.to_pandas()
    mf.write_manifest(out_dir, man_df["tile"].to_numpy(), man_df["count"].to_numpy(),
                      state=state)
    return {
        "records": out.num_rows,
        "affected_tiles": int(pd.Series(rec["tile"]).nunique()),
        "missing_deletes": n_missing_delete,
    }


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

    cdir = _changes_dir(out_dir)
    if os.path.isdir(cdir) and os.listdir(cdir):
        ch = ray.data.read_parquet(cdir).select_columns(cols)
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

    cdir = _changes_dir(out_dir)
    if not (os.path.isdir(cdir) and os.listdir(cdir)):
        return {"rewritten_tiles": 0, "retired_files": 0}
    ch = pq.read_table(cdir)
    affected = np.unique(ch.column("tile").to_numpy())
    ch_df = ch.to_pandas()

    data_dir = mf.data_dir(out_dir)
    rewritten = 0
    for t in affected:
        tdir = os.path.join(data_dir, f"tile={int(t)}")
        parts = []
        if os.path.isdir(tdir):
            base = pq.read_table(tdir)
            bdf = base.to_pandas()
            bdf["change"] = 0
            bdf["seq"] = -1
            parts.append(bdf[["entity_id", "lon", "lat", "qt", "change", "seq"]])
        sub = ch_df[ch_df["tile"] == t][
            ["entity_id", "lon", "lat", "qt", "change", "seq"]]
        parts.append(sub)
        allr = pd.concat(parts, ignore_index=True)
        allr = allr.sort_values(["entity_id", "seq", "change"])
        last = allr.groupby("entity_id", as_index=False).last()
        keep = last[(last["change"] == 0) | (last["change"] > 2)][
            ["entity_id", "lon", "lat", "qt"]]
        os.makedirs(tdir, exist_ok=True)
        # base rows carry extra columns (url/name/cells); compacted tiles
        # carry the core schema — readers select shared columns
        tmp = os.path.join(tdir, ".compact.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(keep, preserve_index=False), tmp)
        for f in os.listdir(tdir):
            if not f.startswith(".") and f.endswith(".parquet"):
                os.remove(os.path.join(tdir, f))
        os.replace(tmp, os.path.join(tdir, "part-compacted.parquet"))
        rewritten += 1

    retired = 0
    for f in list(os.listdir(cdir)):
        os.remove(os.path.join(cdir, f))
        retired += 1
    # refresh manifest counts for rewritten tiles
    man = mf.read_manifest(out_dir).to_pandas()
    for t in affected:
        tdir = os.path.join(data_dir, f"tile={int(t)}")
        n = pq.read_table(tdir, columns=["entity_id"]).num_rows if os.path.isdir(tdir) else 0
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
    return {"rewritten_tiles": rewritten, "retired_files": retired}
