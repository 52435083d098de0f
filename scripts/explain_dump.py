#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage::

    python scripts/explain_dump.py <tag_suffix> <query> [<query> ...]

writes ``plans/r16/<query>_<tag_suffix>.txt`` for each query (e.g.
``before`` / ``after``). Plan capture only for most queries — but
queries with eager build-time checkpoints (e.g. graph_triangle_top20,
multimodal_ahash_dup_candidates) DO run jobs during DataFrame
construction, including any mapInPandas pass feeding the checkpoint, so
capture those in a quiet window. The session is built by the
same factory as the bench so the captured plan is the one the bench
executes (modulo AQE's runtime re-optimization, which ``explain`` on an
unexecuted plan cannot show: these files show the static plan shape —
Exchange count, join strategy, PushedFilters, codegen spans).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from git_etl_spark import registry
from git_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r16"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    registry.load_all()
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (OUT_DIR / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
