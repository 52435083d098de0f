"""Incremental aggregate maintenance: batch-folded state must equal a
full recompute exactly, in any batch order (commutative-monoid check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_etl_spark.io import load_table
from git_etl_spark.sinks.incremental import (
    finalize,
    merge_partials,
    partial_aggregate,
    refresh_incremental,
)

from .conftest import SF_CORRECTNESS

KEYS = ["event_type"]


def _full(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    return partial_aggregate(ev, KEYS, "value")


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def test_incremental_equals_full_recompute(spark, tmp_path):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    state = str(tmp_path / "rollup")
    # three uneven batches by hash — simulates three daily loads
    for salt in range(3):
        batch = ev.filter(F.crc32(F.col("event_id").cast("string")) % 3 == salt)
        refresh_incremental(spark, batch, state, KEYS, "value")
    maintained = spark.read.parquet(state)
    assert _rows(maintained) == _rows(_full(spark))


def test_merge_is_order_insensitive(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    batches = [
        partial_aggregate(
            ev.filter(F.crc32(F.col("event_id").cast("string")) % 3 == s),
            KEYS,
            "value",
        )
        for s in range(3)
    ]
    fwd = merge_partials(merge_partials(None, batches[0], KEYS), batches[1], KEYS)
    fwd = merge_partials(fwd, batches[2], KEYS)
    rev = merge_partials(merge_partials(None, batches[2], KEYS), batches[1], KEYS)
    rev = merge_partials(rev, batches[0], KEYS)
    assert _rows(fwd) == _rows(rev) == _rows(_full(spark))


def test_finalize_avg_matches_direct(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    derived = finalize(_full(spark)).select(*KEYS, "avg_v")
    direct = ev.groupBy(*KEYS).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value")).alias("avg_v")
    )
    assert _rows(derived) == _rows(direct)
