"""Differential parity: every oracled query must match DuckDB at
sf0.01 — the same check the driver runs (CORRECTNESS_r{N}.json),
enforced locally first.
"""

from __future__ import annotations

import pytest

from .conftest import SF_CORRECTNESS
from .oracle_utils import compare_query


def _oracle_names():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from git_etl_spark import registry

    registry.load_all()
    return sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, name):
    compare_query(spark, name, SF_CORRECTNESS)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and len(df.columns) > 0


def test_every_query_has_callable(spark):
    import __spark_entry__ as e

    qs = e.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key must have a query
    for name in e.oracle_sql():
        assert name in qs, f"oracle {name} lacks a query"
