"""Query + oracle registry — the driver contract.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string computing the same result on the same parquet.

Determinism rules (the driver hash-compares values order-insensitively,
so these are what make a query *checkable*):

- **Doubles**: never hash a raw float aggregate. ``SUM``/``AVG`` over
  doubles is order-dependent in the last bits and Spark/DuckDB will
  disagree. Both sides cast inputs to DECIMAL, aggregate exactly, and
  cast the final result to double (identical bit pattern both engines).
- **Integer sums**: DuckDB widens SUM(BIGINT) to HUGEINT — oracles cast
  back to BIGINT to match Spark's LongType.
- **Top-k**: every LIMIT is preceded by a total order (unique tie-break
  key) so the selected row *set* is deterministic.
- **Column names**: every computed column is aliased identically in the
  DataFrame code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run.

    Order matters to the external correctness harness: it walks the
    query dict in registration order under a wall-clock budget, so the
    cheap single-pass relational modules register first and the
    expensive iterative families (dedup clustering, graph, similarity,
    multimodal, streaming replay) register last — a budget cut-off then
    costs coverage of the fewest, slowest queries instead of stranding
    cheap ones behind them.
    """
    from .operators import (  # noqa: F401
        aggregates,
        joins,
        projections,
        setops,
        collections,
        windows,
        relational_ext,
        tpch_more,
        tpch_subqueries,
        text,
        curation,
        events,
        file_formats,
        layout,
        quality,
        udfs,
        similarity,
        dedup,
        graph,
        multimodal,
        streaming_bridge,
    )
