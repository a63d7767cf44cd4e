"""Index aliases — the ES `_aliases` API: stable names over physical
index directories with ATOMIC swap, the blue/green cutover primitive
that makes `reindex` zero-downtime (build the green index, repoint the
alias, readers opened afterwards see the new index; ES parity:
`POST _aliases {actions: [{remove: ...}, {add: ...}]}` is atomic the
same way).

The registry is one small JSON file per alias repository
(`aliases.json`), rewritten via tmp-file + os.replace — the same
rename-commit discipline the manifest uses, so a concurrent reader sees
either the old or the new mapping, never a torn file. The registry is
metadata (bytes, not data): nothing here scales with the corpus.
"""

from __future__ import annotations

import json
import os


def _path(repo_dir: str) -> str:
    return os.path.join(repo_dir, "aliases.json")


def aliases(repo_dir: str) -> dict[str, str]:
    """The alias → index-dir mapping (empty if none registered)."""
    try:
        with open(_path(repo_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def set_alias(repo_dir: str, alias: str, index_dir: str) -> None:
    """Point ``alias`` at ``index_dir`` (create or atomic swap). The
    target must look like an index (committed manifest) — a swap to a
    half-built directory is the bug this guard exists for."""
    if not os.path.exists(os.path.join(index_dir, "_manifest", "term_stats.json")):
        raise ValueError(
            f"{index_dir!r} has no committed term_stats manifest entry — "
            "not a completed index; refusing to alias it"
        )
    os.makedirs(repo_dir, exist_ok=True)
    m = aliases(repo_dir)
    m[alias] = os.path.abspath(index_dir)
    tmp = _path(repo_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(repo_dir))


def drop_alias(repo_dir: str, alias: str) -> None:
    """Remove ``alias`` (missing alias is a no-op, as in ES with
    ``must_exist=false``)."""
    m = aliases(repo_dir)
    if alias not in m:
        return
    del m[alias]
    tmp = _path(repo_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(repo_dir))


def resolve_alias(repo_dir: str, alias: str) -> str:
    """The physical index dir behind ``alias``; raises KeyError with the
    known aliases when absent."""
    m = aliases(repo_dir)
    if alias not in m:
        raise KeyError(
            f"alias {alias!r} not registered (known: {sorted(m)})"
        )
    return m[alias]
