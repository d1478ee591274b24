"""Index snapshots: the ``_snapshot`` repository API over on-disk
index directories.

OpenSearch snapshots are incremental at the segment-file level —
unchanged files are shared between snapshots.  Same here: a snapshot
copies the index tree into ``<repo>/<name>/``, but any file that
exists byte-identically (path + size) in the PREVIOUS snapshot is
hardlinked instead of copied, so repeated snapshots of a
mostly-immutable index (the normal case — segments are append-only)
cost only the delta.  A ``SNAPSHOT_OK`` marker written LAST makes
partial snapshots detectable: restore refuses a snapshot without the
marker, and a crashed snapshot can simply be re-taken (same name =
overwrite).  Restore verifies the marker and that the restored meta
parses before declaring success.
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["snapshot_index", "restore_index", "list_snapshots"]

_MARKER = "SNAPSHOT_OK"


def _files(root: str):
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            yield os.path.relpath(p, root), p


def snapshot_index(index_dir: str, repo_dir: str,
                   name: str) -> dict:
    """Snapshot ``index_dir`` into ``<repo_dir>/<name>``.  Returns the
    snapshot manifest (file count, bytes, hardlinked count)."""
    from .storage import read_meta

    read_meta(index_dir)                      # fail fast on non-index
    if "/" in name or not name:
        raise ValueError(f"invalid snapshot name {name!r}")
    dst = os.path.join(repo_dir, name)
    src_abs = os.path.abspath(index_dir)
    prev = None
    for s in sorted(list_snapshots(repo_dir),
                    key=lambda s_: s_["ts"], reverse=True):
        # dedup only against snapshots of the SAME index — a shared
        # repository must never cross-link two indexes' files
        if s["name"] != name and s.get("source") == src_abs:
            prev = os.path.join(repo_dir, s["name"])
            break
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    n_files = n_bytes = n_linked = 0
    for rel, src in _files(index_dir):
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        st = os.stat(src)
        cand = os.path.join(prev, rel) if prev else None
        # identity = path + size + mtime_ns (copy2 preserves mtime,
        # so an unchanged file carries the source's timestamp through
        # every snapshot) — size alone would silently share stale
        # content for a re-written same-length file
        if cand and os.path.exists(cand):
            cst = os.stat(cand)
            if cst.st_size == st.st_size and \
                    cst.st_mtime_ns == st.st_mtime_ns:
                os.link(cand, out)
                n_linked += 1
                n_files += 1
                n_bytes += st.st_size
                continue
        shutil.copy2(src, out)
        n_files += 1
        n_bytes += st.st_size
    manifest = {"name": name, "ts": time.time(), "files": n_files,
                "bytes": n_bytes, "hardlinked": n_linked,
                "source": os.path.abspath(index_dir)}
    with open(os.path.join(dst, _MARKER), "w") as f:
        json.dump(manifest, f)
    return manifest


def restore_index(repo_dir: str, name: str, dst_dir: str) -> dict:
    """Restore snapshot ``name`` into ``dst_dir`` (must not exist)."""
    from .storage import read_meta

    src = os.path.join(repo_dir, name)
    marker = os.path.join(src, _MARKER)
    if not os.path.exists(marker):
        raise ValueError(
            f"snapshot {name!r} is missing or incomplete (no "
            f"{_MARKER} marker) — re-take it")
    if os.path.exists(dst_dir):
        raise ValueError(f"restore target {dst_dir!r} already exists")
    shutil.copytree(src, dst_dir)
    os.remove(os.path.join(dst_dir, _MARKER))
    read_meta(dst_dir)                        # restored index parses
    with open(marker) as f:
        return json.load(f)


def list_snapshots(repo_dir: str) -> list[dict]:
    """Manifests of every COMPLETE snapshot in the repository."""
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for name in sorted(os.listdir(repo_dir)):
        marker = os.path.join(repo_dir, name, _MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                out.append(json.load(f))
    return out
