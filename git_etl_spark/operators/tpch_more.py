"""More TPC-H-shaped queries (adapted to the corpus's columns) —
filling out the predicate / correlated-subquery / HAVING surface:
Q4 (EXISTS semi with range), Q6 (selective scan, BETWEEN/IN),
Q12 (CASE-in-agg over join), Q14 (promo share, conditional ratio),
Q18 (HAVING subquery), Q19 (OR-of-ANDs compound pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import count_if, duck_qsum, qsum
from ..functions.timeutil import ts_ntz
from ..io import load_table
from ..registry import query


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {duck_qsum("l_extendedprice * l_discount")}
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: highly selective conjunctive scan — every predicate
    (range, BETWEEN, <) pushes to the parquet scan; the aggregate sees
    a fraction of the table. The canonical pushdown benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_ntz("1996-01-01"))
            & (F.col("l_shipdate") < ts_ntz("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            qsum(rev).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority AS orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table predicate
    (lineitem shipped after its order date) → left-semi join with a
    non-equi term riding on the equi key."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-07-01"))
        & (F.col("o_orderdate") < ts_ntz("1996-10-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + IN-list CASE counts."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1996-01-01"))
        & (F.col("l_shipdate") < ts_ntz("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            count_if(high).alias("high_line_count"),
            count_if(~high).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT 100.0 * ({duck_qsum(
        "CASE WHEN p.p_type = 'PROMO'"
        " THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")})
               / ({duck_qsum("l.l_extendedprice * (1 - l.l_discount)")})
               AS promo_share,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a broadcast
    part join (promo share of one month's revenue)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1995-09-01"))
        & (F.col("l_shipdate") < ts_ntz("1995-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (100.0 * qsum(promo_rev) / qsum(rev)).alias("promo_share"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING.

    The textbook decorrelation (semi join the key set, then re-join
    lineitem and re-aggregate) computes the SAME per-order quantity
    sum twice and scans lineitem twice. Here the HAVING aggregate's
    value is carried through: each output group (custkey, orderkey,
    orderdate) is exactly one order, so its total_qty IS the q the
    filter already computed — one lineitem scan, one aggregation, two
    dim joins, no re-aggregation. The oracle keeps the IN +
    re-aggregation formulation, so the equivalence is hash-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    ).filter(F.col("q") > 150)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big_orders.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("q").cast("double").alias("total_qty"),
        )
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {duck_qsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides — the
    optimizer must keep the equi join and evaluate the disjunction as a
    post-join filter while still pushing the single-side conjuncts
    (brand/size CNF residuals) toward the scans."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(
        qsum(rev).alias("revenue"),
        F.count("*").alias("n_lines"),
    )
