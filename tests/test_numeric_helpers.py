"""Cross-engine exactness of the scaled-integer mean machinery
(functions/vector.py sum14 / mean14 / dec14_to_double / py_dec14):
the three implementations — Spark expression, DuckDB SQL fragment, and
the driver-side Python mirror — must produce bit-identical doubles for
the same inputs, under any partitioning.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from git_etl_spark.functions.vector import (
    _DEC14_SPLIT,
    duck_mean14,
    mean14,
    py_dec14,
)


def _py_mean14(vals: list[float]) -> float:
    s = sum(int(v * 1e14) for v in vals)  # int() truncates toward zero
    return py_dec14(s) / len(vals)


def test_py_dec14_split_exactness():
    rng = random.Random(7)
    for _ in range(200):
        # sums up to ~1e24: far past int64, inside DECIMAL(38,0)
        s = rng.randint(-(10**24), 10**24)
        sgn = -1.0 if s < 0 else 1.0
        a = abs(s)
        expect = sgn * (float(a // _DEC14_SPLIT) * 1e12 + float(a % _DEC14_SPLIT)) / 1e14
        assert py_dec14(s) == expect


@pytest.mark.parametrize("n_parts", [1, 7])
def test_spark_mean14_matches_python_mirror(spark, n_parts):
    rng = random.Random(11)
    rows = [(i % 3, rng.uniform(-1, 1)) for i in range(500)]
    df = spark.createDataFrame(rows, "g INT, val DOUBLE").repartition(n_parts)
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(mean14(F.col("val")).alias("m")).collect()
    }
    for g in range(3):
        vals = [v for gg, v in rows if gg == g]
        assert got[g] == _py_mean14(vals), f"group {g} differs"


def test_duckdb_mean14_matches_python_mirror():
    rng = random.Random(13)
    vals = [rng.uniform(-2, 2) for _ in range(1000)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    (got,) = con.execute(f"SELECT {duck_mean14('val')} FROM t").fetchone()
    assert got == _py_mean14(vals)


def test_qsum_matches_duck_qsum_in_range(spark):
    """qsum / duck_qsum agree bit-for-bit for in-bound derived values."""
    from git_etl_spark.functions.exact import duck_qsum, qsum

    rng = random.Random(11)
    vals = [rng.uniform(-9e4, 9e4) * rng.uniform(0.8, 1.2) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(qsum(F.col("x")).alias("s")).collect()[0]["s"]
    want = duckdb.sql(
        f"SELECT {duck_qsum('x')} AS s FROM (SELECT unnest(?) AS x)",
        params=[vals],
    ).fetchall()[0][0]
    assert got == want


def test_qsum_out_of_range_fails_loudly(spark):
    """Past |x| >= (2^63-2)/10^s, floor's long saturates silently
    (measured: floor(1e19) -> Long.MAX even under ANSI); the in-plan
    guard must turn that into a loud failure naming the value."""
    from git_etl_spark.functions.exact import qsum

    df = spark.createDataFrame([(1.0,), (1.0e11,)], "x double")
    with pytest.raises(Exception, match="qsum"):
        df.agg(qsum(F.col("x")).alias("s")).collect()


def test_qsum_accepts_values_near_bound(spark):
    """Values just inside the guard still aggregate (the guard is the
    documented bound, not an over-tight one)."""
    from git_etl_spark.functions.exact import qsum

    df = spark.createDataFrame([(9.0e10,), (-9.0e10,)], "x double")
    got = df.agg(qsum(F.col("x")).alias("s")).collect()[0]["s"]
    assert got == 0.0


def test_session_pins_ansi_mode(spark):
    """The no-silent-wrap posture: the r12 hostile-numerics survey
    (every float scaled to ~1e150, ids near 2^62, all 246 queries)
    showed out-of-domain values fail LOUDLY — 232/246 execute, the
    other 14 raise ArithmeticException/qsum domain guards, and none
    returns a silently wrapped aggregate. That property rests on ANSI
    mode; pin it so a future default flip or env override can't
    silently change overflow semantics."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_qsum_skips_nulls_like_sql_sum(spark):
    """NULL rows must pass qsum's range guard and vanish into SUM
    semantics on BOTH engines — before the r12 fix, abs(NULL) < bound
    was NULL and assert_true(NULL) killed the job (with a NULL concat
    message) on data the DuckDB twin silently aggregated."""
    import duckdb

    from git_etl_spark.functions.exact import duck_qsum, qsum
    from pyspark.sql import functions as F

    vals = [1.25, None, 2.5, None, 3.125]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(qsum(F.col("x")).alias("s")).collect()[0]["s"]
    want = duckdb.connect().execute(
        f"SELECT {duck_qsum('x')} AS s FROM (SELECT unnest(?) AS x)",
        [vals],
    ).fetchone()[0]
    assert got == want == 6.875


def test_dataset_fingerprint_sees_nested_rewrites(tmp_path):
    """An in-place rewrite of a leaf file inside a partition directory
    (same name, same size, newer mtime — the production partition-
    rewrite shape) must change the fingerprint even though the parent
    directory's stat is untouched."""
    import os
    import time

    from git_etl_spark.io import dataset_fingerprint

    root = tmp_path / "documents.parquet" / "date=2026-01-01"
    root.mkdir(parents=True)
    leaf = root / "part-0.parquet"
    leaf.write_bytes(b"v1-bytes")
    before = dataset_fingerprint(str(tmp_path), "documents")
    time.sleep(0.01)
    leaf.write_bytes(b"v2-bytes")  # same size, same path, newer mtime
    os.utime(tmp_path / "documents.parquet")  # parent stat irrelevant
    after = dataset_fingerprint(str(tmp_path), "documents")
    assert before != after
