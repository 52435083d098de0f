"""Per-query definition fingerprints for re-verification rotation.

The driver re-checks ~50 of the 245 registered queries per round, so
ordering decides how fast a regression in freshly-edited code is
caught. Module-level git ancestry (the original signal) is too coarse:
one edit to ``events.py`` flags all ~40 of its queries as "changed",
diluting the changed-first tier to near-staleness ordering. The
fingerprint here is per-query — md5 of the query function's own source
plus its oracle SQL — so only queries whose DEFINITION changed jump
the queue; helper-only edits still surface through the module-ancestry
fallback tier in ``__spark_entry__.queries()``.

``QUERY_FINGERPRINTS.json`` is committed; at rotation time the live
fingerprint is compared against the file's content AT the commit that
recorded the query's last green round (``git show <green>:...``), so
"changed since green" is exact even across many rounds. The freshness
test (``tests/test_fingerprints.py``) fails if the file drifts from
the live registry — regenerate with ``python -m
git_etl_spark.fingerprints``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
from pathlib import Path

FINGERPRINT_FILE = Path(__file__).resolve().parent.parent / "QUERY_FINGERPRINTS.json"


def current_fingerprints() -> dict[str, str]:
    """name → md5(query function source + oracle SQL), computed live.

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
        fps[name] = hashlib.md5((src + "\x00" + oracle).encode()).hexdigest()
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
