#!/usr/bin/env python
"""Crossover microbench: single-task global-window NTILE vs the
two-phase distributed ranking (functions/ranking.global_ntile).

The round-11 A/B at the three production sites (events RFM, surprisal
deciles, PPJoin sid) REJECTED the primitive: their window inputs are
aggregate-sized (20-50k rows), where the single-task sort costs
milliseconds and the primitive's fixed jobs (eager checkpoint,
offsets collect, broadcast join) dominate. This script measures WHERE
the trade inverts, on a synthetic relation whose size is the only
variable — the number both the site docstrings and ranking.py cite.

Usage: python scripts/bench_ranking_crossover.py [rows ...]
Prints one JSON line: {"cores": N, "rows": {n: {"window": s,
"distributed": s}}}

Each size runs in THIS JVM (sizes are independent relations; no state
leaks through spark.range), min-of-2 after a warm-up rep, forced
through an aggregate sink so neither form collects n rows.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from git_etl_spark.functions.ranking import global_ntile
from git_etl_spark.session import get_spark


def base(spark, n: int):
    # deterministic, unsorted sort key with duplicates; unique
    # tie-break on id — the same total-order contract the production
    # sites use
    return spark.range(n).select(
        "id", (F.xxhash64("id") % 100_000).alias("v")
    )


def run_window(spark, n: int) -> float:
    df = base(spark, n)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    t0 = time.monotonic()
    df.select(F.ntile(10).over(w).cast("long").alias("t")).agg(
        F.sum("t")
    ).collect()
    return time.monotonic() - t0


def run_distributed(spark, n: int) -> float:
    df = base(spark, n)
    t0 = time.monotonic()
    global_ntile(
        df, 10, [F.col("v").asc(), F.col("id").asc()], "t"
    ).agg(F.sum("t")).collect()
    return time.monotonic() - t0


def wm_base(spark, n: int):
    # 3 groups (the weighted-median production shape), integer value
    # in cents with duplicates, positive weights
    return spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.xxhash64("id") % 1_000_000 + 1_000_000).alias("cents"),
        (F.col("id") % 7 + 1).alias("wt"),
        "id",
    )


def run_wm_window(spark, n: int) -> float:
    from pyspark.sql import Window

    df = wm_base(spark, n)
    w = (
        Window.partitionBy("g")
        .orderBy("cents", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("g")
    t0 = time.monotonic()
    (
        df.select(
            "g", "cents",
            F.sum("wt").over(w).alias("cw"),
            F.sum("wt").over(wt).alias("tw"),
        )
        .filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("cents"))
        .collect()
    )
    return time.monotonic() - t0


def run_wm_bucket(spark, n: int) -> float:
    from git_etl_spark.functions.ranking import (
        grouped_weighted_quantile_rows,
    )

    df = wm_base(spark, n)
    t0 = time.monotonic()
    (
        grouped_weighted_quantile_rows(df, ["g"], "cents", ["id"], "wt")
        .groupBy("g")
        .agg(F.min("cents"))
        .collect()
    )
    return time.monotonic() - t0


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [
        50_000,
        500_000,
        5_000_000,
        20_000_000,
    ]
    spark = get_spark(app_name="ranking-crossover")
    cores = spark.sparkContext.defaultParallelism
    out: dict[str, dict[str, float]] = {}
    wm: dict[str, dict[str, float]] = {}
    for n in sizes:
        reps_w = [run_window(spark, n) for _ in range(3)]
        reps_d = [run_distributed(spark, n) for _ in range(3)]
        out[str(n)] = {
            "window": round(min(reps_w[1:]), 3),
            "distributed": round(min(reps_d[1:]), 3),
        }
        wm_w = [run_wm_window(spark, n) for _ in range(3)]
        wm_b = [run_wm_bucket(spark, n) for _ in range(3)]
        wm[str(n)] = {
            "grouped_window": round(min(wm_w[1:]), 3),
            "bucket_search": round(min(wm_b[1:]), 3),
        }
    print(json.dumps({"cores": cores, "rows": out, "weighted_median": wm}))


if __name__ == "__main__":
    main()
