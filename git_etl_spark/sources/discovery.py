"""Repo discovery + config resolution — SURVEY.md §2.1 S6/S7,
§2.4 F4/F5, §2.7 SET1/SET2.

Driver-side by design (filesystem walking is not a distributed
problem); produces the repo list that parameterizes the distributed
ingestion. Resolution semantics mirror the reference
(``main.ts:154-309``): explicit repos ∪ per-path recursive scans,
normalized, deduplicated, minus the ignore set.
"""

from __future__ import annotations

import json
import os

DEFAULT_MAX_DEPTH = 3
SKIP_DIRS = frozenset(
    {"node_modules", "venv", ".venv", "dist", "build", "target"}
)


def normalize_path(path: str) -> str:
    """P10: strip trailing slash (reference ``main.ts:277,285``)."""
    return path.rstrip("/") if path != "/" else path


def find_git_repositories(
    search_path: str, max_depth: int = DEFAULT_MAX_DEPTH
) -> list[str]:
    """S6: recursive scan bounded at ``max_depth`` levels, pruning
    hidden dirs and the dependency/build skip-list
    (reference ``main.ts:154-215``, skip list :186-194). A dir that IS
    a git repo is returned and not descended into."""
    found: list[str] = []

    def walk(path: str, depth: int) -> None:
        if depth > max_depth:
            return
        if os.path.isdir(os.path.join(path, ".git")):
            found.append(normalize_path(path))
            return
        try:
            entries = sorted(os.scandir(path), key=lambda e: e.name)
        except OSError:
            return
        for entry in entries:
            if not entry.is_dir(follow_symlinks=False):
                continue
            if entry.name.startswith(".") or entry.name in SKIP_DIRS:
                continue
            walk(entry.path, depth + 1)

    walk(normalize_path(search_path), 0)
    return found


def load_repositories_config(config_path: str) -> list[str]:
    """S7 + SET1/SET2 (reference ``main.ts:224-309``): JSON config with
    ``repositories[]`` (explicit), ``paths[]`` (scan roots), and
    ``ignore[]``. Result = (explicit ∪ scanned) deduped, minus ignore —
    the reference's union → distinct → anti-join pipeline, driver-side."""
    with open(config_path) as f:
        cfg = json.load(f)

    explicit = [normalize_path(p) for p in cfg.get("repositories", [])]
    scanned = [
        repo
        for root in cfg.get("paths", [])
        for repo in find_git_repositories(root)
    ]
    ignore = {normalize_path(p) for p in cfg.get("ignore", [])}

    seen: set[str] = set()
    result: list[str] = []
    for path in explicit + scanned:
        if path in seen or path in ignore:
            continue
        seen.add(path)
        result.append(path)
    return result
