#!/usr/bin/env python
"""Phase decomposition of the checkpoint-structured floor queries
(VERDICT r15 task 3: prove where the seconds go, don't assert it).

The dedup/CC floor queries materialize their pipeline in eager
``localCheckpoint`` steps plus driver actions (``count``/``collect``),
so per-PHASE wall time falls out of instrumenting exactly those calls:
this script monkeypatches the classic DataFrame's ``localCheckpoint``,
``count`` and ``collect`` to log (callsite, seconds), runs each named
query with the bench methodology (noop sink, warm-up absorbed), and
prints the phase table. The callsite (file:line) identifies the phase —
read it next to the operator source.

Usage::

    SPARK_GRAFT_CPUS=32 python scripts/decompose_floors.py <query> [...]

Each query runs twice; the second run (memos warm, codegen warm) is the
bench-comparable decomposition.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from git_etl_spark import registry
from git_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"

EVENTS: list[tuple[str, str, float]] = []


def _callsite() -> str:
    for fr in reversed(traceback.extract_stack()):
        if "git_etl_spark" in fr.filename and "session.py" not in fr.filename:
            return f"{Path(fr.filename).name}:{fr.lineno}"
    return "?"


def _patch() -> None:
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    for meth in ("localCheckpoint", "count", "collect"):
        orig = getattr(CDF, meth)

        def wrapper(self, *a, _orig=orig, _name=meth, **kw):
            t0 = time.perf_counter()
            out = _orig(self, *a, **kw)
            EVENTS.append((_name, _callsite(), time.perf_counter() - t0))
            return out

        setattr(CDF, meth, wrapper)


def main() -> int:
    names = sys.argv[1:]
    registry.load_all()
    spark = get_spark(app_name="decompose-floors")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for w in (
        "join_multiway_regional_revenue",
        "multimodal_decode_features",
        "join_broadcast_lookup",
    ):
        run(w)
    _patch()
    for name in names:
        run(name)  # rep 1: cold (memo/codegen build) — discarded
        EVENTS.clear()
        wall = run(name)
        print(f"\n== {name}: wall {wall:.3f}s (warm rep) ==")
        accounted = 0.0
        for kind, site, dt in EVENTS:
            print(f"  {dt:7.3f}s  {kind:15s} {site}")
            accounted += dt
        print(
            f"  phases account for {accounted:.3f}s; remaining"
            f" {wall - accounted:.3f}s = lazy tail (final action) +"
            f" plan build"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
