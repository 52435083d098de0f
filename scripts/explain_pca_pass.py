#!/usr/bin/env python
"""Capture the PCA moment-pass internal plans (means + cells collects).

``embedding_pca_top_component`` / ``embedding_pca_loading_ppm`` run
their distributed work eagerly inside ``_pca_power_solve`` and return a
driver-built LocalTableScan, so a registry-level ``explain`` shows
nothing. This script runs the real solve with ``DataFrame.collect``
instrumented to record each collected frame's ``explain("formatted")``
— i.e. exactly the plans the solve executes — and writes them to
``plans/r15/pca_moment_pass_<tag>.txt``.

Usage: python scripts/explain_pca_pass.py <tag>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Spark 4: the executable class is the classic subclass — patching the
# pyspark.sql.DataFrame parent would not intercept its collect()
from pyspark.sql.classic.dataframe import DataFrame

from git_etl_spark.operators.similarity import _pca_power_solve
from git_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r15"


def main() -> None:
    tag = sys.argv[1]
    spark = get_spark(app_name="explain-pca-pass")
    spark.sparkContext.setLogLevel("ERROR")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    captured: list[str] = []
    orig = DataFrame.collect

    def spy(self):
        captured.append(
            self._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return orig(self)

    DataFrame.collect = spy
    try:
        _pca_power_solve(spark, SF_DIR)
    finally:
        DataFrame.collect = orig
    labels = ["means pass", "cells (second-moment) pass"]
    text = "\n\n".join(
        f"=== collect #{k + 1}: {labels[k] if k < len(labels) else '?'} ===\n{p}"
        for k, p in enumerate(captured)
    )
    out = OUT_DIR / f"pca_moment_pass_{tag}.txt"
    out.write_text(text + "\n")
    print(f"wrote {out} ({len(captured)} plans)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
