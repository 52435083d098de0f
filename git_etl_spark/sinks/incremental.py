"""Incremental aggregate maintenance — merge partials, don't recompute.

A 100 TB fact table's daily rollup cannot be rebuilt from scratch each
load; the maintained table stores *mergeable partial states* per key
(count, sum, min, max — the same partial/final split Spark's own
HashAggregate uses), and each new batch folds in with one small
aggregate + key-merge. COUNT/SUM merge by addition, MIN/MAX by
min/max; AVG is derived (sum/count) at read time, never stored.

This replaces the reference's accumulate-on-conflict SQLite pattern
(``db/schema.ts`` authors table: commit counts / first-last dates
updated per batch) with the lake equivalent, and the invariant is
testable: incrementally maintained state == full recompute, exactly,
in any batch order (the partial states form a commutative monoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import publish, write_staging

# aggregate spec: output column -> (partial expr over raw rows, merge fn)
_PARTIAL_EXPRS = {
    "cnt": lambda value_col: F.count("*"),
    "sum_v": lambda value_col: F.sum(F.col(value_col).cast("decimal(18,2)")),
    "min_v": lambda value_col: F.min(value_col),
    "max_v": lambda value_col: F.max(value_col),
}
_MERGE_EXPRS = {
    "cnt": F.sum,
    "sum_v": F.sum,
    "min_v": F.min,
    "max_v": F.max,
}


def partial_aggregate(batch: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One batch → one partial-state row per key."""
    return batch.groupBy(*keys).agg(
        *[expr(value_col).alias(name) for name, expr in _PARTIAL_EXPRS.items()]
    )


def merge_partials(state: DataFrame | None, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta's partial states into the maintained state. Union +
    re-aggregate: the shuffle carries one row per (key, input) — group
    rows only, never fact rows."""
    both = delta if state is None else state.unionByName(delta)
    return both.groupBy(*keys).agg(
        *[fn(name).alias(name) for name, fn in _MERGE_EXPRS.items()]
    )


def refresh_incremental(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    keys: list[str],
    value_col: str,
) -> None:
    """Maintain the rollup at ``state_path`` with one new batch:
    partial-aggregate the batch (fact rows reduced executor-side),
    merge with existing state, publish atomically."""
    import os

    delta = partial_aggregate(batch, keys, value_col)
    state = spark.read.parquet(state_path) if os.path.exists(state_path) else None
    merged = merge_partials(state, delta, keys)
    publish(write_staging(merged, state_path), state_path)


def finalize(state: DataFrame) -> DataFrame:
    """Read-time derivation of non-mergeable aggregates (AVG) from the
    stored partial states."""
    return state.select(
        "*", (F.col("sum_v").cast("double") / F.col("cnt")).alias("avg_v")
    )
