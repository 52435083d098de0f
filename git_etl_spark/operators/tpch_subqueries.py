"""TPC-H correlated-subquery / decorrelation pack (Q2, Q7, Q8, Q9,
Q10, Q11, Q13, Q15, Q16, Q17, Q20, Q21, Q22 shapes), adapted to this
corpus's star schema (no partsupp table — part-supplier facts come
from lineitem). Together with tpch_more.py and the Q1/Q3/Q5 shapes in
aggregates/joins, every TPC-H query shape Q1–Q22 is registered under
the differential oracle.

These are the query shapes whose reference-engine counterparts need a
subquery interpreter; in Spark each one is stated as the decorrelated
plan Catalyst itself would produce: scalar subqueries become one-row
aggregates broadcast via cross join, correlated EXISTS/NOT EXISTS
become left-semi/left-anti joins, and groupwise-min membership becomes
a join-back against the aggregated key set. Stating the decorrelated
form keeps every step visible to the optimizer (pushdown, broadcast,
AQE) instead of hiding it in per-row re-execution — the difference
between O(n) subquery evaluations and one shuffle at 100 TB.

Determinism: every double aggregate routes through DECIMAL
(functions.exact), every LIMIT is preceded by a unique tie-break key,
thresholds multiply exact values in identical expression order on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import count_if, dsum
from ..functions.exact import duck_qsum, qsum
from ..functions.vector import dec_scaled_to_double, duck_dec_scaled_to_double
from ..functions.timeutil import ts_ntz
from ..io import load_table
from ..registry import query

# Exact revenue term shared by several queries, in integer 1e-8 units:
# floor(x·1e8 + 0.5) is pure IEEE arithmetic both engines execute
# identically, where the former per-row double→DECIMAL(24,8) cast was
# engine-dependent for derived products (Spark rounds the shortest
# decimal repr, DuckDB the exact binary value — 1-ulp divergences at
# sf0.1 row counts; see functions/exact.qsum). Sums of these units are
# exact (DECIMAL(38,0) / HUGEINT); consumers divide by 1e8 only when
# EMITTING a double, and unit-space comparisons (MAX, thresholds,
# ratios) need no rescale at all.
_REV_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 1e8 + 0.5) AS BIGINT)"

_Q8_NUM = (
    "SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume"
    " ELSE CAST(0 AS BIGINT) END)"
)

_DUCK_PROFIT = duck_qsum(
    "l.l_extendedprice * (1 - l.l_discount)"
    " - l.l_quantity * p.p_retailprice * 0.1"
)


def _rev() -> F.Column:
    """Quantized revenue units (1e-8) as DECIMAL(38,0) — exact sums."""
    return F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * F.lit(1e8)
        + F.lit(0.5)
    ).cast("decimal(38,0)")


@query(
    "tpch_q2_min_price_supplier",
    oracle="""
    SELECT p.p_partkey AS partkey, p.p_name AS part_name,
           l.l_suppkey AS suppkey, l.l_extendedprice AS min_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN (SELECT l_partkey, MIN(l_extendedprice) AS minp
          FROM lineitem GROUP BY l_partkey) m
      ON m.l_partkey = l.l_partkey AND l.l_extendedprice = m.minp
    WHERE p.p_size <= 5
    """,
)
def tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated groupwise-MIN membership (which
    supplier offers each part at its minimum price) as a join-back
    against the per-key MIN — no per-part subquery re-execution. The
    equality is on untouched parquet doubles (no arithmetic), so it is
    exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    minp = li.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("minp")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            minp,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("minp")),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_extendedprice").alias("min_price"),
        )
    )


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS ship_year,
           {duck_dec_scaled_to_double(f'SUM({_REV_SQL})', '1e8')} AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Two independent nation dimension joins (supplier side
    and customer side) with a symmetric pair predicate that can only be
    applied after both — dims broadcast, facts shuffle once on their
    join keys."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dec_scaled_to_double(F.sum(_rev()), 1e8).alias("volume"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           n.n_name AS nation_name,
           {duck_dec_scaled_to_double(f'SUM({_REV_SQL})', '1e8')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-merchandise
    revenue in one quarter. Selective flag + date predicates push to
    both fact scans; the LIMIT rides a total order (revenue, custkey)
    so the selected set is deterministic → TakeOrderedAndProject, no
    global sort materialization."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_ntz("1996-10-01"))
        & (F.col("o_orderdate") < ts_ntz("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(dec_scaled_to_double(F.sum(_rev()), 1e8).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey AS partkey,
               SUM({_REV_SQL}) AS part_value
        FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT {duck_dec_scaled_to_double('SUM(part_value)', '1.0')}
                         / COUNT(*) AS avgv
              FROM per_part)
    SELECT p.partkey,
           {duck_dec_scaled_to_double('p.part_value', '1e8')} AS part_value
    FROM per_part p, total t
    WHERE {duck_dec_scaled_to_double('p.part_value', '1.0')} > t.avgv * 1.5
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key share against a global scalar subquery
    (parts whose revenue exceeds 1.5× the average part's — a
    scale-invariant threshold, selective at every SF). The scalar is
    a one-row aggregate cross-joined in — Spark broadcasts it to every
    partition; no second pass over the fact, the per-part aggregate is
    reused for both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_rev()).alias("part_value")
    )
    total = per_part.agg(
        (dec_scaled_to_double(F.sum("part_value"), 1.0) / F.count("*")).alias(
            "avgv"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            dec_scaled_to_double(F.col("part_value"), 1.0) > F.col("avgv") * 1.5
        )
        .select(
            "partkey",
            dec_scaled_to_double(F.col("part_value"), 1e8).alias("part_value"),
        )
    )


@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts. The
    priority predicate lives in the LEFT JOIN's ON clause — it filters
    join partners without dropping order-less customers, a semantics a
    WHERE cannot express. Two aggregation levels, the second over the
    first's tiny output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REV_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           {duck_dec_scaled_to_double('r.total_revenue', '1e8')} AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving MAX of an aggregated
    view (3-month revenue). MAX-of-agg is a second one-row aggregate
    over the view, broadcast back — the view is computed once and
    reused for both the ranking and the filter (the reference's VIEW +
    scalar subquery, decorrelated). Equality compares exact decimals,
    so ties are well-defined on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_ntz("1996-01-01"))
        & (F.col("l_shipdate") < ts_ntz("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            dec_scaled_to_double(F.col("total_revenue"), 1e8).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH th AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   * 0.5 / COUNT(*) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN th ON th.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < th.half_avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery (lines below
    half the part's average quantity) decorrelated into a per-part
    aggregate join. The threshold is computed as exact-decimal sum
    divided in double with identical operation order on both engines,
    so the comparison is bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    th = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            * 0.5
            / F.count("*")
        ).alias("half_avg_qty")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(th, li.l_partkey == th.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q20_dominant_suppliers",
    oracle="""
    WITH per_ps AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        FROM lineitem GROUP BY l_suppkey, l_partkey
    ),
    per_part AS (
        SELECT l_partkey, SUM(sq) AS tot, COUNT(*) AS nsup
        FROM per_ps GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey AS suppkey, s.s_name AS supp_name
    FROM supplier s
    JOIN per_ps ps ON ps.l_suppkey = s.s_suppkey
    JOIN per_part pp ON pp.l_partkey = ps.l_partkey
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_name LIKE '%gear%'
      AND CAST(ps.sq AS DOUBLE) > CAST(pp.tot AS DOUBLE) * 3.0 / pp.nsup
    """,
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped >3× their fair share of
    some 'gear' part's total moved quantity (fair share = 1/n of the
    part's suppliers — scale-invariant, stays selective at every SF) —
    a nested IN over a correlated half-sum subquery, decorrelated into
    two grouped aggregates over the same fact joined on the part key,
    then a distinct semi-ish projection onto suppliers. The per-part
    totals roll up from the per-(supplier, part) partials — one wide
    shuffle, the second aggregate reuses its output.

    The part-name filter commutes with both aggregates (it selects
    whole groups by the grouping key), so it is applied as a broadcast
    semi-join BELOW them — the fact rows for non-gear parts never
    enter the shuffle. At 100 TB this is the difference between
    aggregating the whole fact table and aggregating the qualifying
    fraction."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_ps = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(qty).alias("sq"))
    per_part = per_ps.groupBy(F.col("l_partkey").alias("ppk")).agg(
        F.sum("sq").alias("tot"), F.count("*").alias("nsup")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_ps.join(per_part, F.col("l_partkey") == F.col("ppk"))
        .filter(
            F.col("sq").cast("double")
            > F.col("tot").cast("double") * 3.0 / F.col("nsup")
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
        )
        .distinct()
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH lines AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_suppkey IS NOT NULL
        GROUP BY l.l_orderkey, l.l_suppkey
    )
    SELECT s.s_name AS supp_name, COUNT(*) AS numwait
    FROM lines l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper in a
    multi-supplier order (late = shipped >90 days after the order
    date).

    The EXISTS/NOT EXISTS pair decorrelates to per-order counts
    instead of two self-joins: for a late supplier row, "another
    supplier exists" ⇔ n_suppliers ≥ 2, and "no OTHER late supplier"
    ⇔ n_late = 1 (its own flag) — and since n_late = 1 makes the late
    supplier unique, ``max(when(late=1, suppkey))`` extracts it with
    no join-back at all. The textbook semi+anti plan recomputes the
    lineitem⋈orders aggregate THREE times and shuffles it for each
    self-join; here the whole reduction is ONE exchange on
    l_orderkey: hash-partitioning on l_orderkey satisfies the
    clustered distribution of both the (l_orderkey, l_suppkey) and
    the l_orderkey aggregates, so Catalyst pipelines the two
    aggregations in a single post-shuffle stage (measured 1.67 s
    semi+anti → 1.77 s window sort → this form at sf0.1; the window
    variant loses to its per-partition sort). The oracle keeps the
    EXISTS formulation, so the decorrelation itself is hash-checked.

    NULL l_suppkey groups are excluded EXPLICITLY on both engines (r15
    numeric-band null sweep): under the oracle's ``<>`` three-valued
    logic a NULL-supplier line group can never satisfy either EXISTS
    predicate — it is invisible to the correlation — but the
    decorrelated counts n_supp/n_late were counting it, so an order
    whose second late "supplier" was unknown wrongly suppressed the
    real sole-late supplier. The WHERE is provably equivalent for the
    oracle (NULL <> x is never TRUE) and makes the two formulations
    count the same universe."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_suppkey").isNotNull()
    )
    o = load_table(spark, sf_dir, "orders")
    late_line = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        1,
    ).otherwise(0)
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late_line.alias("late_line"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late_line").alias("late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, by segment. Global scalar AVG → broadcast one-row
    aggregate; NOT EXISTS with a correlated predicate → left-anti join
    against the pre-filtered orders side (the filter is pushed below
    the anti join, keeping its build side small). The urgency predicate
    keeps the anti join selective — this corpus's FKs are dense, so a
    bare no-orders anti join would be degenerate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
               n1.n_name AS supp_nation,
               {_REV_SQL} AS volume
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT order_year,
           {duck_dec_scaled_to_double(_Q8_NUM, '1.0')}
               / {duck_dec_scaled_to_double('SUM(volume)', '1.0')} AS mkt_share,
           COUNT(*) AS n_lines
    FROM vol GROUP BY order_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a region's import
    volume by year — a conditional-share ratio over a six-table join
    where the numerator condition (supplier nation) and the population
    filter (customer region) come from two *different* dimension
    branches. Dims broadcast; the ratio divides exact decimal sums in
    double."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("supp_nation"),
            _rev().alias("volume"),
        )
    )
    target = F.when(
        F.col("supp_nation") == "NATION_3", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    return vol.groupBy("order_year").agg(
        (
            dec_scaled_to_double(F.sum(target), 1.0)
            / dec_scaled_to_double(F.sum("volume"), 1.0)
        ).alias("mkt_share"),
        F.count("*").alias("n_lines"),
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
           {_DUCK_PROFIT} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    year (cost modeled as 10% of retail price per unit — this corpus
    has no partsupp). The profit expression is double arithmetic in
    one fixed order, cast to decimal before the order-independent
    sum. The part-name LIKE prunes the broadcast side first."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * 0.1
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(qsum(profit).alias("profit"))
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    group, with a NOT IN exclusion subquery (suppliers in deficit —
    the corpus analogue of Q16's complaints filter). NOT IN
    decorrelates to a left-anti join against the (pre-filtered,
    broadcast) exclusion set; lineitem serves as the part-supplier
    bridge since this corpus has no partsupp."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            l.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
