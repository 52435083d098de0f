"""Upsert / merge semantics on Parquet — SURVEY.md §2.2 K1/K3/K6."""

from __future__ import annotations

import os

import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, payload string")


def test_upsert_last_writer_wins(spark, tmp_path):
    from git_etl_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(spark, _df(spark, [("a", 1, "old"), ("b", 1, "old")]), path, ["k"])
    upsert_parquet(spark, _df(spark, [("a", 2, "new"), ("c", 1, "new")]), path, ["k"])
    rows = {r.k: (r.v, r.payload) for r in spark.read.parquet(path).collect()}
    # K1 ON CONFLICT DO UPDATE: 'a' updated, 'b' kept, 'c' inserted
    assert rows == {"a": (2, "new"), "b": (1, "old"), "c": (1, "new")}


def test_upsert_first_writer_wins(spark, tmp_path):
    from git_etl_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(
        spark, _df(spark, [("a", 1, "first")]), path, ["k"], keep="first"
    )
    upsert_parquet(
        spark, _df(spark, [("a", 2, "second"), ("b", 1, "x")]), path, ["k"],
        keep="first",
    )
    rows = {r.k: r.payload for r in spark.read.parquet(path).collect()}
    # K3 INSERT OR IGNORE: 'a' keeps first value
    assert rows == {"a": "first", "b": "x"}


def test_upsert_dedups_within_batch(spark, tmp_path):
    from git_etl_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    upsert_parquet(
        spark,
        _df(spark, [("a", 1, "x"), ("a", 1, "x"), ("b", 2, "y")]),
        path,
        ["k"],
    )
    assert spark.read.parquet(path).count() == 2


def test_upsert_idempotent(spark, tmp_path):
    from git_etl_spark.sinks.upsert import upsert_parquet

    path = str(tmp_path / "t")
    batch = _df(spark, [("a", 1, "x"), ("b", 2, "y")])
    upsert_parquet(spark, batch, path, ["k"])
    first = sorted(map(repr, spark.read.parquet(path).collect()))
    upsert_parquet(spark, batch, path, ["k"])
    assert sorted(map(repr, spark.read.parquet(path).collect())) == first


def test_publish_rolls_back_on_failure(spark, tmp_path):
    from git_etl_spark.sinks.upsert import publish, write_staging

    final = str(tmp_path / "table")
    staging = write_staging(_df(spark, [("a", 1, "v1")]), final)
    publish(staging, final)
    assert {r.payload for r in spark.read.parquet(final).collect()} == {"v1"}

    missing_staging = str(tmp_path / "does-not-exist")
    with pytest.raises(OSError):
        publish(missing_staging, final)
    # original table restored (rollback), still readable
    assert os.path.exists(final)
    assert {r.payload for r in spark.read.parquet(final).collect()} == {"v1"}
