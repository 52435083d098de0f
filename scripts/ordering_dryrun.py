"""Dry-run the driver's re-verification ordering without a Spark
session: prints the first-N queries() names with their green round,
fine-flag state, and tier, plus the oldest greens left OUT of the
budget. Rounds 11-13 each re-derived this inline to check the
exactly-50 slot arithmetic before committing _REVERIFY_FIRST /
_FLAG_RESOLVED changes — this makes the simulation a one-liner:

    python scripts/ordering_dryrun.py [N]
"""

from __future__ import annotations

import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402
from git_etl_spark import registry  # noqa: E402


def main() -> None:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest_green, latest_hash = e._driver_verified()
    verified = {
        n: (latest_hash[n] if n in registry.ORACLES else rnd)
        for n, rnd in latest_green.items()
        if n not in registry.ORACLES or n in latest_hash
    }
    round_commit = e._round_commits(verified)
    fine = e._fp_changed_since_green(verified, round_commit)
    e._apply_flag_resolutions(fine, verified)
    reverify = {
        n for n, r in e._REVERIFY_FIRST.items() if verified.get(n, 0) < r
    }
    names = list(e.queries())

    def row(n: str) -> str:
        tier = (
            "NEVER-GREEN" if n not in verified
            else "REVERIFY" if n in reverify
            else "stale"
        )
        return (
            f"{n:45s} green=r{verified.get(n, 0):02d} "
            f"fine={str(fine.get(n)):5s} {tier}"
        )

    print(f"--- first {budget} (the driver's budget) ---")
    for n in names[:budget]:
        print(row(n))
    dist = collections.Counter(verified.get(n, 0) for n in names[:budget])
    print(f"\ngreen-round distribution of first {budget}: {dict(sorted(dist.items()))}")
    rest = sorted((verified.get(n, 0), n) for n in names[budget:])
    print(f"oldest greens OUTSIDE the budget: {rest[:5]}")
    print(f"active _REVERIFY_FIRST entries: {sorted(reverify)}")
    resolved = [
        n for n, s in e._FLAG_RESOLVED.items()
        if max(verified.values(), default=0) <= s
    ]
    print(f"active _FLAG_RESOLVED entries: {sorted(resolved)}")


if __name__ == "__main__":
    main()
