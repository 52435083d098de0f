"""Full cross-scale oracle parity sweep — the round-7 "ADVICE-killer":
run EVERY oracled query against its DuckDB twin at a given sf_dir
(default sf0.1, where 1-ulp cross-engine divergences that are
invisible at the driver's sf0.01 become visible; r7's sweep caught two
real defect classes this way).

Usage: python scripts/sweep_parity.py [sf_dir ...]
Prints one line per (sf, query); nonzero exit on any mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from git_etl_spark import registry  # noqa: E402
from git_etl_spark.session import get_spark  # noqa: E402
from oracle_utils import compare_query  # noqa: E402


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    registry.load_all()
    spark = get_spark(app_name="sweep", cpus=32, shuffle_partitions=32)
    failures = []
    for sf in sf_dirs:
        for name in sorted(registry.ORACLES):
            try:
                compare_query(spark, name, sf)
                print(f"{sf} {name} OK", flush=True)
            except AssertionError as ex:
                failures.append((sf, name, str(ex)[:500]))
                print(f"{sf} {name} FAIL {str(ex)[:200]}", flush=True)
            except Exception as ex:  # noqa: BLE001 — report, keep sweeping
                failures.append((sf, name, f"{type(ex).__name__}: {ex}"[:500]))
                print(f"{sf} {name} ERROR {type(ex).__name__}", flush=True)
    print(f"\n{len(failures)} failures")
    for sf, name, msg in failures:
        print(f"  {sf} {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
