"""Eighth robustness axis: RESOURCE hostility (constrained memory /
spill) — VERDICT r14 task 4.

The seven prior axes vary the DATA; this one varies the MACHINE. At
100 TB the design question is "what happens when the working set does
not fit in executor memory": every operator must degrade to graceful
SPILL (slower, still correct), never to OOM or — worse — a silently
different answer. This survey runs the FULL registry under a
deliberately starved session and hash-checks every oracled query
against DuckDB (the temporal-axis lesson: execute-only surveys miss
value defects), while sampling the engine's own spill metrics per
query through the UI REST API.

Constraint profile (vs the 16 GiB / local[32] default):
  - driver/executor heap  : $SPARK_GRAFT_DRIVER_MEM   (default 2g)
  - spark.memory.fraction : 0.3  (unified region ~500 MB)
  - cores                 : $SPARK_GRAFT_CPUS          (default 8)
  - shuffle partitions    : 8    (bigger per-task working sets)
Heap must be a JVM start flag, so run this in a FRESH process:

  SPARK_GRAFT_DRIVER_MEM=2g SPARK_GRAFT_CPUS=8 \
      python scripts/survey_resource.py [sf_dir] [--skip-file prior.log]

Prints one line per query: OK/FAIL/ERROR, wall seconds, and the
memory/disk bytes spilled while it ran. A crash that kills the JVM
loses only the in-flight query: rerun with --skip-file pointing at
the previous output to resume. Exit nonzero on any FAIL/ERROR.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from git_etl_spark import registry  # noqa: E402
from git_etl_spark.session import get_spark  # noqa: E402
from oracle_utils import compare_query  # noqa: E402

UI_PORT = 4050  # off the default 4040 so a concurrent session can't race


def _spill_totals() -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all completed
    stages, from the UI REST API. Returns (0, 0) if the API is
    unreachable (metrics are advisory; correctness is the gate)."""
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
        )
        mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
        return mem, disk
    except Exception:
        return 0, 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    skip: set[str] = set()
    if "--skip-file" in args:
        i = args.index("--skip-file")
        for line in Path(args[i + 1]).read_text().splitlines():
            parts = line.split()
            # resume lines look like: "OK <name> ..." / "FAIL <name> ..."
            if len(parts) >= 2 and parts[0] in ("OK", "FAIL", "ERROR"):
                skip.add(parts[1])
        args = args[:i] + args[i + 2 :]
    only: set[str] | None = None
    if "--queries" in args:
        i = args.index("--queries")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    sf = args[0] if args else "/root/testdata/sf0.1"

    registry.load_all()
    if only is not None:
        unknown = only - set(registry.QUERIES)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", flush=True)
            return 2
    # profile knobs (heap comes via $SPARK_GRAFT_DRIVER_MEM, a JVM
    # start flag read by get_spark): fraction sizes the unified
    # execution+storage region, shuffle sets per-task working-set size
    import os

    fraction = os.environ.get("SPARK_GRAFT_MEM_FRACTION", "0.3")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "8")
    spark = get_spark(
        app_name="survey-resource",
        extra_conf={
            "spark.memory.fraction": fraction,
            "spark.sql.shuffle.partitions": shuffle,
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    heap = spark.sparkContext.getConf().get("spark.driver.memory")
    cores = spark.sparkContext.defaultParallelism
    print(f"# constrained session: heap={heap} cores={cores} "
          f"fraction={fraction} shuffle={shuffle} sf={sf}", flush=True)

    failures = []
    names = sorted(registry.QUERIES)
    for name in names:
        if name in skip or (only is not None and name not in only):
            continue
        m0, d0 = _spill_totals()
        t0 = time.monotonic()
        try:
            if name in registry.ORACLES:
                compare_query(spark, name, sf)
                status = "OK"
            else:
                n = registry.QUERIES[name](spark, sf).count()
                status = "OK" if n >= 0 else "FAIL"
        except AssertionError as ex:
            status = "FAIL"
            failures.append((name, str(ex)[:400]))
        except Exception as ex:  # noqa: BLE001 — report, keep surveying
            status = "ERROR"
            failures.append((name, f"{type(ex).__name__}: {ex}"[:400]))
        dt = time.monotonic() - t0
        m1, d1 = _spill_totals()
        print(
            f"{status} {name} {dt:.2f}s spill_mem={m1 - m0} spill_disk={d1 - d0}",
            flush=True,
        )

    print(f"\n{len(failures)} failures", flush=True)
    for name, msg in failures:
        print(f"  {name}: {msg}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
