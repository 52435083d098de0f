"""Collection-type operator pack: array functions, map functions
(from_json), and date-spine generation — the complex-type surface of
SURVEY.md §1.3/§2.10 (nested ArrayType model, X6 JSON-to-map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


@query(
    "array_functions_pack",
    oracle="""
    WITH t AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id < 50)
    SELECT vec_id,
           len(e) AS dim,
           e[1] AS first_val,
           e[-1] AS last_val,
           list_contains(list_transform(e, x -> x > 0), true) AS any_positive,
           len(list_filter(e, x -> x > 0)) AS n_positive,
           round(CAST(list_aggregate(list_transform(e[1:8],
                 x -> CAST(x AS DOUBLE)), 'sum') AS DOUBLE), 6) AS head8_sum,
           array_to_string(list_sort(list_transform(e[1:3],
                 x -> CAST(round(round(CAST(x AS DOUBLE), 3) * 1000) AS BIGINT))),
                 ',') AS head3_sorted
    FROM t
    """,
)
def array_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface over the vector column: size, indexing
    (1-based + negative), exists/filter lambdas, slice + sequential
    sum, sort. Mirrored element-order operations keep float parity.
    ``head3_sorted`` is projected to a comma-joined string of integer
    milli-units: the driver's pandas canonicalizer cannot hash
    array-typed cells, and BIGINT→string rendering is identical across
    engines where double→string notation thresholds are not. The
    double round (3dp, then to integer after ×1000) keeps the value a
    ulp away from any .5 boundary so HALF_UP-vs-HALF_EVEN never
    fires."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    e = F.col("embedding")
    head8 = F.aggregate(
        F.transform(F.slice(e, 1, 8), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.element_at(e, 1).alias("first_val"),
        F.element_at(e, -1).alias("last_val"),
        F.exists(e, lambda x: x > 0).alias("any_positive"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.round(head8, 6).alias("head8_sum"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.slice(e, 1, 3),
                        lambda x: F.round(
                            F.round(x.cast("double"), 3) * 1000, 0
                        ).cast("bigint"),
                    )
                ),
                lambda v: v.cast("string"),
            ),
            ",",
        ).alias("head3_sorted"),
    )


@query(
    "map_from_json_pack",
    oracle="""
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           TRY_CAST(props->>'$.k' AS BIGINT) AS k_val,
           TRY_CAST(props->>'$.k' AS BIGINT) IS NOT NULL AS has_k
    FROM events
    """,
)
def map_from_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 continued: JSON → MapType with map_keys / size /
    element_at — the schema-on-read path for semi-structured props
    (``from_json`` parses once; repeated get_json_object re-parses).

    The map parses as ``map<string,string>`` with a ``try_cast`` on
    the one field read as a number, NOT as ``map<string,bigint>``
    (r14 unicode-hostility full-oracle sweep): a value-typed map
    schema nulls the ENTIRE record when any one value fails the type
    (PERMISSIVE mode is per-record, not per-entry), so a single
    string-valued key in a mixed-type payload erased all keys —
    while the oracle's ``json_keys`` kept them. Schema-on-read means
    committing only to the shape you actually read; DuckDB's
    TRY_CAST mirrors the per-field cast."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    k_val = F.element_at(m, "k").try_cast("bigint")
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(F.map_keys(m)).alias("n_keys"),
        k_val.alias("k_val"),
        k_val.isNotNull().alias("has_k"),
    )


@query(
    "gen_date_spine_zero_fill",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                      INTERVAL 1 DAY))::DATE AS day
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT s.day AS day, COALESCE(d.n, 0) AS n_orders
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def gen_date_spine_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + zero-fill: ``sequence()`` of dates
    exploded into a spine, left-joined against per-day counts — the
    standard gap-filling pattern for time series (a groupBy alone
    silently drops empty days)."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n")
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@query(
    "setop_except_all_bag",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicities subtract, unlike the
    set-semantics EXCEPT in setop_except_heavy_users)."""
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    filled_keys = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_keys.exceptAll(filled_keys)


@query(
    "setop_intersect_all_bag",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_intersect_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min of multiplicities)."""
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    filled_keys = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_keys.intersectAll(filled_keys)
