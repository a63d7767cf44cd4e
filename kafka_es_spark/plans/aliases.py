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


def next_generation(index_dir: str) -> str:
    """ES rollover naming: ``...-000001 → ...-000002``; a dir without a
    generation suffix starts at ``-000002`` (its implicit gen is 1)."""
    import re

    base = index_dir.rstrip("/")
    m = re.search(r"-(\d{6})$", base)
    if m:
        return f"{base[: m.start()]}-{int(m.group(1)) + 1:06d}"
    return f"{base}-000002"


def rollover(
    repo_dir: str,
    alias: str,
    build_new=None,
    *,
    max_docs: int | None = None,
    max_age_s: float | None = None,
    now_s: float | None = None,
    dry_run: bool = False,
) -> dict:
    """The ES ``_rollover`` API: when the index behind ``alias`` meets
    ANY condition (``max_docs`` against the committed stats.json doc
    count, ``max_age_s`` against the stats commit time), start the next
    generation and atomically repoint the alias.

    ES rollover cuts to an EMPTY new index and later writes land there;
    in this batch/streaming engine the new generation must be a
    committed index before it can be aliased (the set_alias guard), so
    the caller supplies ``build_new(new_dir)`` — typically a fresh
    ``build_index`` over the next corpus slice or a streaming sink
    target. With ``dry_run=True`` (or ``build_new=None``) the decision
    is reported without acting — the condition-probe half of the API.
    Metadata-only besides the caller's build: one stats.json read, one
    registry rewrite."""
    import time

    old = resolve_alias(repo_dir, alias)
    with open(os.path.join(old, "stats.json")) as f:
        stats = json.load(f)
    met: list[str] = []
    if max_docs is not None and int(stats["n_docs"]) >= int(max_docs):
        met.append("max_docs")
    if max_age_s is not None:
        committed = os.stat(
            os.path.join(old, "_manifest", "term_stats.json")
        ).st_mtime
        age = (now_s if now_s is not None else time.time()) - committed
        if age >= max_age_s:
            met.append("max_age")
    out = {
        "old_index": old,
        "new_index": next_generation(old),
        "conditions_met": met,
        "rolled_over": False,
        "dry_run": bool(dry_run or build_new is None),
    }
    if not met or out["dry_run"]:
        return out
    build_new(out["new_index"])
    set_alias(repo_dir, alias, out["new_index"])
    out["rolled_over"] = True
    return out


def resolve_alias(repo_dir: str, alias: str) -> str:
    """The physical index dir behind ``alias``; raises KeyError with the
    known aliases when absent."""
    m = aliases(repo_dir)
    if alias not in m:
        raise KeyError(
            f"alias {alias!r} not registered (known: {sorted(m)})"
        )
    return m[alias]
