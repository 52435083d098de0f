"""Per-query definition fingerprints for re-verification rotation.

The driver re-checks ~50 of the 246 registered queries per round, so
ordering decides how fast a regression in freshly-edited code is
caught. Module-level git ancestry (the original signal) is too coarse:
one edit to ``events.py`` flags all ~40 of its queries as "changed",
diluting the changed-first tier to near-staleness ordering. Two
per-query hashes are kept, stored as ``"<shallow>:<deep>"``:

- shallow — md5 of the query function's OWN source plus its oracle
  SQL. This was the only component before round 11; historical
  QUERY_FINGERPRINTS.json revisions contain just this hash.
- deep — md5 of the query source, the sources of every package-local
  function it (transitively) references by name, and the oracle SQL.
  This closes the round-10 gap where an edit to a shared helper
  (``_pca_power_solve`` gaining a repartition) changed the executed
  plan of ``embedding_pca_loading_ppm`` without touching the query
  function's own source, so the shallow hash — and therefore the
  changed-since-green tier — never flagged it (ADVICE r10).

``QUERY_FINGERPRINTS.json`` is committed; at rotation time the live
fingerprint is compared against the file's content AT the commit that
recorded the query's last green round (``git show <green>:...``) via
:func:`fingerprints_differ`, which compares deep-vs-deep when the
stored value has a deep component and falls back to shallow-vs-shallow
against pre-round-11 revisions (whose shallow hashes remain directly
comparable — the shallow algorithm is unchanged). The freshness test
(``tests/test_fingerprints.py``) fails if the file drifts from the
live registry — regenerate with ``python -m git_etl_spark.fingerprints``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import types
from pathlib import Path

FINGERPRINT_FILE = Path(__file__).resolve().parent.parent / "QUERY_FINGERPRINTS.json"

# __package__, not __name__: under `python -m git_etl_spark.fingerprints`
# __name__ is "__main__", which would empty every helper closure.
_PACKAGE_PREFIX = __package__ or __name__.rsplit(".", 1)[0]  # "git_etl_spark"


def referenced_helper_sources(fn: types.FunctionType) -> dict[str, str]:
    """module.qualname → source for every package-local function the
    query (transitively) references by global name.

    Resolution walks the function's code object — including nested
    code objects for lambdas/comprehensions — collecting ``co_names``,
    and looks each name up in the function's ``__globals__``; plain
    functions defined inside this package recurse. Attribute-chained
    helpers (``mod.helper(...)``) and non-function globals are outside
    the net by design: registry queries call shared helpers by direct
    name (the pattern this guards), and widening to attribute
    resolution would drag in whole modules per reference, collapsing
    the per-query signal back toward module granularity.
    """
    seen: dict[str, str] = {}
    _collect_helpers(fn, seen)
    return seen


def _collect_helpers(fn: types.FunctionType, seen: dict[str, str]) -> None:
    code = getattr(fn, "__code__", None)
    if code is None:
        return
    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        names.update(c.co_freevars)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    globs = getattr(fn, "__globals__", {})
    for nm in sorted(names):
        obj = globs.get(nm)
        if not isinstance(obj, types.FunctionType):
            continue
        mod = getattr(obj, "__module__", "") or ""
        if mod != _PACKAGE_PREFIX and not mod.startswith(_PACKAGE_PREFIX + "."):
            continue
        key = f"{mod}.{obj.__qualname__}"
        if key in seen:
            continue
        try:
            seen[key] = inspect.getsource(obj)
        except (OSError, TypeError):
            seen[key] = key  # stable placeholder; still participates
        _collect_helpers(obj, seen)


def fingerprints_differ(stored: str, live: str) -> bool:
    """True when the live definition no longer matches the stored one.

    ``stored`` may be a legacy pre-round-11 value (shallow hash only);
    then only the shallow components are compared — exactly the
    pre-round-11 behavior, so historical greens are judged by the same
    rule they were recorded under. When both sides carry a deep
    component, the deep hashes decide, so helper-only edits count as
    changes going forward.
    """
    s_parts = stored.split(":")
    l_parts = live.split(":")
    if len(s_parts) >= 2 and len(l_parts) >= 2:
        return s_parts[1] != l_parts[1]
    return s_parts[0] != l_parts[0]


def current_fingerprints() -> dict[str, str]:
    """name → ``"<shallow>:<deep>"`` (see module docstring), computed
    live.

    Import of the operator modules happens via ``__spark_entry__``'s
    registry population; callers must ensure the registry is loaded
    (importing ``__spark_entry__`` or the operator packages first).
    """
    from . import registry

    fps: dict[str, str] = {}
    for name, fn in registry.QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            # builtins / exec-defined functions: fall back to the
            # qualified name so the fingerprint is at least stable
            src = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', name)}"
        oracle = registry.ORACLES.get(name, "")
        shallow = hashlib.md5((src + "\x00" + oracle).encode()).hexdigest()
        helpers = referenced_helper_sources(fn) if isinstance(fn, types.FunctionType) else {}
        deep_blob = src + "".join(
            f"\x00{k}\x00{v}" for k, v in sorted(helpers.items())
        )
        deep = hashlib.md5((deep_blob + "\x00" + oracle).encode()).hexdigest()
        fps[name] = f"{shallow}:{deep}"
    return fps


def write_fingerprints() -> Path:
    """Regenerate QUERY_FINGERPRINTS.json from the live registry."""
    fps = current_fingerprints()
    FINGERPRINT_FILE.write_text(
        json.dumps(dict(sorted(fps.items())), indent=0) + "\n"
    )
    return FINGERPRINT_FILE


if __name__ == "__main__":
    import __spark_entry__  # noqa: F401  (populates the registry)

    path = write_fingerprints()
    print(f"wrote {path} ({len(current_fingerprints())} queries)")
