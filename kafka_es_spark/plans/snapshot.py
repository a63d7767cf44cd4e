"""Snapshot / restore — the ES `_snapshot` API: point-in-time copies of a
committed index into a repository, verified on restore. ES snapshots are
file copies into repo storage with a shard-file manifest and checksums;
this is the same design over the index dataset directory.

Layout: `<repo>/<name>/files/...` (the index tree) plus
`<repo>/<name>/SNAPSHOT.json` — the catalog of every copied file with
size + md5, written LAST via tmp+replace, so a snapshot directory without
a readable SNAPSHOT.json is by definition incomplete and is never
restorable (the manifest-last commit discipline the build itself uses).
Restore verifies every checksum before declaring the index usable and
refuses to overwrite a non-empty target.

Scale note: on a real deployment the copy is `distcp`/object-store bulk
copy — the catalog+verify contract here is the part that matters; the
byte movement is I/O plumbing, deliberately kept as straightforward file
copies (driver-side) in the sandbox. Snapshots are incremental in ES by
segment-file identity; `compact_index` + immutable epoch units give the
same property (unchanged unit files snapshot to identical checksums — a
dedup-capable repo stores them once).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk(root: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return out


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Copy a COMMITTED index into `<repo>/<name>`; returns the catalog.
    Refuses an index without a committed term_stats manifest entry and an
    existing snapshot name (snapshots are immutable, as in ES)."""
    if not os.path.exists(os.path.join(index_dir, "_manifest", "term_stats.json")):
        raise ValueError(f"{index_dir!r} is not a completed index")
    dst = os.path.join(repo_dir, name)
    if os.path.exists(dst):
        raise ValueError(f"snapshot {name!r} already exists (immutable)")
    files_dst = os.path.join(dst, "files")
    os.makedirs(files_dst)
    catalog = {}
    for rel in _walk(index_dir):
        src = os.path.join(index_dir, rel)
        out = os.path.join(files_dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copyfile(src, out)
        catalog[rel] = {"bytes": os.path.getsize(out), "md5": _md5(out)}
    meta = {"name": name, "n_files": len(catalog), "files": catalog}
    tmp = os.path.join(dst, "SNAPSHOT.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(dst, "SNAPSHOT.json"))
    return meta


def restore_index(repo_dir: str, name: str, index_dir: str) -> dict:
    """Restore `<repo>/<name>` into ``index_dir`` (must not already hold
    files), verifying every file's size + md5 against the snapshot
    catalog; raises on any mismatch BEFORE the index is usable."""
    src = os.path.join(repo_dir, name)
    cat_path = os.path.join(src, "SNAPSHOT.json")
    if not os.path.exists(cat_path):
        raise ValueError(
            f"snapshot {name!r} has no SNAPSHOT.json — incomplete snapshot"
        )
    with open(cat_path) as f:
        meta = json.load(f)
    if os.path.exists(index_dir) and os.listdir(index_dir):
        raise ValueError(f"restore target {index_dir!r} is not empty")
    files_src = os.path.join(src, "files")
    for rel, info in sorted(meta["files"].items()):
        s = os.path.join(files_src, rel)
        d = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copyfile(s, d)
        if os.path.getsize(d) != info["bytes"] or _md5(d) != info["md5"]:
            raise ValueError(f"checksum mismatch restoring {rel!r}")
    return meta
