"""Set-operation pack — SURVEY.md §2.7 (SET1 union+distinct,
SET2 except/anti) plus intersect for completeness.

The reference dedupes a repo list with a JS Set and subtracts an
ignore list (``main.ts:231-296``); distributed, these are
union→dropDuplicates and except/intersect — all shuffle on the full
row as key, so at 100 TB the projected columns are kept narrow
(keys only) before the set op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


def _heavy_users(ev: DataFrame, event_type: str, min_events: int) -> DataFrame:
    return (
        ev.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_events)
        .select("user_id")
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET1 (reference ``main.ts:231-277``): union two key sets, dedup.
    SQL UNION = Spark union + distinct."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


@query(
    "setop_except_heavy_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING COUNT(*) >= 14
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 14
    """,
)
def setop_except_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET2 except (reference ignore-list subtraction ``main.ts:283-296``):
    users with ≥14 errors minus users with ≥14 purchases. HAVING keeps
    the sets non-degenerate on the dense synthetic corpus."""
    ev = load_table(spark, sf_dir, "events")
    return _heavy_users(ev, "error", 14).exceptAll(
        _heavy_users(ev, "purchase", 14)
    ).distinct()


@query(
    "setop_intersect_heavy_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING COUNT(*) >= 14
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 14
    """,
)
def setop_intersect_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect twin of the except query."""
    ev = load_table(spark, sf_dir, "events")
    return _heavy_users(ev, "error", 14).intersect(
        _heavy_users(ev, "purchase", 14)
    )


@query(
    "setop_union_all_tagged",
    oracle="""
    SELECT party, COUNT(*) AS n FROM (
        SELECT 'customer' AS party FROM customer
        UNION ALL
        SELECT 'supplier' AS party FROM supplier
    ) GROUP BY party
    """,
)
def setop_union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) with a provenance tag — the multiplex
    pattern for combining heterogeneous sources into one frame."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party")
    )
    return cust.unionByName(supp).groupBy("party").agg(F.count("*").alias("n"))
