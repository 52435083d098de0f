"""Deterministic aggregate helpers.

Floating-point SUM/AVG is order-dependent; Spark's partial/final
aggregation tree and DuckDB's serial scan sum in different orders, so
raw double aggregates differ in the last bits and fail a value-hash
compare. These helpers route float aggregation through DECIMAL (exact,
order-independent) and cast the *final* value back to double — both
engines then produce the identical bit pattern.

At 100 TB this is also the right call for money-like columns: decimal
partial aggregates stay in Tungsten unsafe rows and whole-stage
codegen; there is no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact SUM of a double column via decimal; result as double.

    Oracle-side twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double.

    Oracle-side twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def count_if(cond: Column) -> Column:
    """COUNT_IF as a LongType column (reference README.md:92 pattern:
    ``SUM(CASE WHEN ... THEN 1 ELSE 0 END)``)."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")
