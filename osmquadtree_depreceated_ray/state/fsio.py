"""Filesystem abstraction for the sink contract (fsspec-routed).

The reference writer assumes one shared POSIX filesystem and commits
each file via tmp + rename (/root/reference/writefile/writefile.go:97-205).
A multi-node cluster writing to object storage has no atomic rename, so
the sink commit protocol here is two-level:

* **per-file**: on filesystems with atomic rename (local/NFS), write to
  a dotted ``.tmp`` name and rename — a reader never observes a partial
  file.  On object stores (no rename), write the final key directly:
  a PUT is all-or-nothing, so the object either exists complete or not
  at all; a *verify* step (size check after write) guards truncated
  multipart uploads.
* **per-dataset**: ``manifest.parquet`` is the SOLE commit point
  (written LAST by :func:`manifest.write_manifest`).  A tile/partition
  is visible iff it is listed in the manifest — readers and resume
  logic (``completed_tiles``) consult the manifest, never a directory
  listing, so uncommitted part files on any backend are invisible.

Every path may carry an fsspec scheme (``memory://``, ``file://``,
``s3://``); plain paths resolve to the local filesystem.  Helpers
return/accept (fs, root) pairs so remote tasks resolve the filesystem
once per task, not once per file.
"""

from __future__ import annotations

import posixpath

import pyarrow.parquet as pq


def get_fs(path: str):
    """Resolve ``path`` to ``(fsspec_filesystem, scheme_stripped_path)``.

    fsspec caches filesystem instances per (protocol, storage options),
    so calling this in every task is cheap.
    """
    import fsspec

    return fsspec.core.url_to_fs(path)


def join(base: str, *parts: str) -> str:
    """posix join that tolerates scheme-qualified bases."""
    return posixpath.join(base, *parts)


def supports_atomic_rename(fs) -> bool:
    """True when tmp+rename is atomic on ``fs`` (local and subclasses).

    Object stores and the in-memory test fs take the direct-PUT path;
    their visibility is gated by the manifest commit instead.
    """
    from fsspec.implementations.local import LocalFileSystem

    return isinstance(fs, LocalFileSystem)


def _tmp_name(path: str) -> str:
    head, tail = posixpath.split(path)
    return posixpath.join(head, f".{tail}.tmp")


def commit_parquet(table, fs, final_path: str) -> None:
    """Write ``table`` as parquet at ``final_path`` with the strongest
    commit the backend offers (see module docstring)."""
    if supports_atomic_rename(fs):
        tmp = _tmp_name(final_path)
        with fs.open(tmp, "wb") as f:
            pq.write_table(table, f)
        fs.mv(tmp, final_path)
    else:
        with fs.open(final_path, "wb") as f:
            pq.write_table(table, f)
        # verify: a PUT is all-or-nothing but a client-side abort can
        # leave nothing — surface that here rather than at read time
        if not fs.exists(final_path):
            raise IOError(f"sink commit failed: {final_path} absent "
                          "after write")


def commit_bytes(data: bytes, fs, final_path: str) -> None:
    """Commit a small opaque file (state.json, ndjson) — same protocol."""
    if supports_atomic_rename(fs):
        tmp = _tmp_name(final_path)
        fs.pipe_file(tmp, data)
        fs.mv(tmp, final_path)
    else:
        fs.pipe_file(final_path, data)


def list_basenames(fs, d: str) -> list[str]:
    """Basenames of entries under ``d`` ('' entries and dirs included);
    [] when the dir is absent."""
    if not fs.exists(d):
        return []
    return [posixpath.basename(p.rstrip("/")) for p in fs.ls(d, detail=False)]


def remove_stale(fs, d: str, keep: str) -> None:
    """Delete every non-hidden file in ``d`` except ``keep`` — retires
    parts a crashed run with a different writer layout left behind (the
    manifest gates visibility, so these are never readable, but they
    cost storage)."""
    for fn in list_basenames(fs, d):
        if fn != keep and not fn.startswith("."):
            p = join(d, fn)
            if not fs.isdir(p):
                fs.rm_file(p)
