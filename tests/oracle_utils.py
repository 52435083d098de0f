"""Local twin of the driver's DuckDB differential oracle.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column-name set, and an order-insensitive value
comparison. Stricter than a hash: reports the first differing cell.
Floats are compared for exact equality — the engine's decimal-exact
aggregation design (functions/exact.py) promises bitwise agreement,
and this harness is where that promise is enforced before the driver
sees it.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

CORPUS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize one cell for comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in idx) for r in rows]
    return sorted(canon, key=repr)


def compare_query(spark, name: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for query `name`."""
    from git_etl_spark import registry

    registry.load_all()
    fn = registry.QUERIES[name]
    oracle = registry.ORACLES.get(name)
    assert oracle is not None, f"{name} has no oracle (rows-only query)"

    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_sorted = _sorted_rows(spark_cols, spark_rows)
    d_sorted = _sorted_rows(duck_cols, duck_rows)
    for i, (s, d) in enumerate(zip(s_sorted, d_sorted)):
        assert s == d, f"{name}: row {i} differs\n spark={s}\n duck ={d}"
