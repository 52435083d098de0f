"""Extended relational pack: TPC-H classic shapes, outer joins,
deterministic statistical moments, pivot/unpivot, string aggregation,
multi-distinct, null semantics, exact math scalars — rounding out the
SURVEY.md §2 inventory.

Determinism notes: stddev/variance/corr are *derived from decimal
sums* (Σx, Σx², Σxy exact, combined in double) instead of Spark's
streaming moment aggregates, whose partial-merge order is
nondeterministic across partitions — this is also the numerically
honest way to get reproducible moments at 100 TB. Math scalars stick
to IEEE-exact operations (abs/floor/sqrt/...); libm-dependent
functions (exp/log/pow) intentionally stay out of oracle-checked
queries because engines differ in the last ulp.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum, duck_qsum, qsum
from ..functions.timeutil import ts_ntz
from ..io import load_table
from ..registry import query


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           {duck_qsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {duck_qsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical scan-heavy pricing summary. The derived
    expressions (disc_price, charge) quantize per row with the
    engine-identical ``qsum`` kernel (functions/exact.py: Spark's
    double→decimal cast of a derived product rounds the SHORTEST
    decimal repr while DuckDB rounds the exact binary value — 1-ulp
    divergences at sf0.1 row counts) and sum exactly. One scan, one
    partial+final hash agg — the shape AQE cannot improve and codegen
    fully fuses."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= ts_ntz("1998-09-02"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            qsum(disc_price).alias("sum_disc_price"),
            qsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_discount", scale=4) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {duck_qsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           o.o_orderdate AS orderdate, o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dimension filter → fact join → top-10.
    Segment and date filters push below the joins (verified in
    tests/test_plans.py); top-k plans TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts_ntz("1995-03-15")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts_ntz("1995-03-15")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(qsum(revenue).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "join_right_outer_nations",
    oracle="""
    SELECT n.n_name AS nation, s.s_suppkey AS suppkey, s.s_name AS supplier
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation appears even with no supplier
    (null-extended right side)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        F.col("n_name").alias("nation"),
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
    )


@query(
    "join_full_outer_activity",
    oracle="""
    WITH err AS (SELECT user_id, COUNT(*) AS n_err FROM events
                 WHERE event_type = 'error' GROUP BY user_id HAVING COUNT(*) >= 15),
         buy AS (SELECT user_id, COUNT(*) AS n_buy FROM events
                 WHERE event_type = 'purchase' GROUP BY user_id HAVING COUNT(*) >= 15)
    SELECT COALESCE(err.user_id, buy.user_id) AS user_id,
           err.n_err AS n_err, buy.n_buy AS n_buy
    FROM err FULL OUTER JOIN buy ON err.user_id = buy.user_id
    """,
)
def join_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with COALESCE'd key — both-sided null extension
    (selective HAVING keeps all three regions non-empty)."""
    ev = load_table(spark, sf_dir, "events")

    def heavy(t: str, alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.count("*").alias(alias))
            .filter(F.col(alias) >= 15)
        )

    err = heavy("error", "n_err")
    buy = heavy("purchase", "n_buy").withColumnRenamed("user_id", "b_user_id")
    return err.join(
        buy, err.user_id == buy.b_user_id, "full_outer"
    ).select(
        F.coalesce("user_id", "b_user_id").alias("user_id"),
        "n_err",
        "n_buy",
    )


@query(
    "join_cross_regions",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two bounded dims (5×25) — the only
    place a cross join is ever acceptable at scale: both sides tiny."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    )


@query(
    "agg_stats_moments",
    oracle=f"""
    WITH s AS (
        SELECT c_nationkey,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               {duck_qsum("c_acctbal * c_acctbal", 4)} AS sxx
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey AS nationkey, n,
           sx / n AS mean_bal,
           CASE WHEN n > 1
                THEN sqrt((sxx - sx * sx / n) / (n - 1))
                ELSE NULL END AS stddev_bal,
           CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) ELSE NULL END
               AS var_bal
    FROM s
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance from exact decimal Σx and quantized Σx²
    (``qsum`` — engine-identical rounding of the derived square)
    combined in double — reproducible across engines and
    partitionings, unlike streaming moment aggregates whose merge
    order varies run to run."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        dsum("c_acctbal").alias("sx"),
        qsum(F.col("c_acctbal") * F.col("c_acctbal"), 4).alias("sxx"),
    )
    n, sx, sxx_c = F.col("n"), F.col("sx"), F.col("sxx")
    var = F.when(n > 1, (sxx_c - sx * sx / n) / (n - 1))
    return base.select(
        F.col("c_nationkey").alias("nationkey"),
        "n",
        (sx / n).alias("mean_bal"),
        F.sqrt(var).alias("stddev_bal"),
        var.alias("var_bal"),
    )


@query(
    "agg_corr_price_quantity",
    oracle=f"""
    WITH s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               {duck_qsum("l_quantity * l_quantity", 4)} AS sxx,
               {duck_qsum("l_extendedprice * l_extendedprice", 4)} AS syy,
               {duck_qsum("l_quantity * l_extendedprice", 4)} AS sxy
        FROM lineitem
    )
    SELECT n,
           (n * sxy - sx * sy)
               / NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0)
               AS corr_qty_price
    FROM s
    """,
)
def agg_corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact quantized-moment sums (``qsum``,
    functions/exact.py — the derived squares/products quantize with
    engine-identical IEEE arithmetic; the plain decimal cast diverged
    by 1 ulp at sf0.1, caught by the round-7 full parity sweep) — one
    pass, deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    base = li.agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sx"),
        dsum("l_extendedprice").alias("sy"),
        qsum(q * q, 4).alias("sxx"),
        qsum(p * p, 4).alias("syy"),
        qsum(q * p, 4).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # NULLIF-guarded denominator on BOTH engines (r14 degenerate
    # sweep): a single-row or constant-column input has zero variance,
    # where correlation is undefined — NULL is the honest value, and
    # ANSI makes the unguarded division a crash, not a value.
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return base.select(
        "n",
        ((n * sxy - sx * sy) / F.nullif(den, F.lit(0.0))).alias(
            "corr_qty_price"
        ),
    )


@query(
    "agg_string_concat_sorted",
    oracle="""
    SELECT n_regionkey AS regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: collect → sort → join (the
    order-insensitive form of LISTAGG; unsorted collect_list is
    partition-order-dependent and never oracle-checkable).

    A group with NO non-null names yields NULL, matching string_agg:
    collect_list skips NULLs and concat_ws would mint '' for the empty
    list — fabricating a value out of absent data (r14 null-heavy
    full-oracle sweep)."""
    nation = load_table(spark, sf_dir, "nation")
    names = F.array_sort(F.collect_list("n_name"))
    return nation.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.when(F.size(names) > 0, F.concat_ws(",", names)).alias("nations")
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT c_nationkey AS nationkey,
           max(CASE WHEN rn_hi = 1 THEN c_name END) AS richest,
           max(CASE WHEN rn_lo = 1 THEN c_name END) AS poorest
    FROM (
        SELECT c_nationkey, c_name,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_hi,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal ASC, c_custkey ASC) AS rn_lo
        FROM customer
    ) GROUP BY c_nationkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax aggregates) with a (value, key) struct
    ordering so ties break deterministically on custkey — the A1
    'latest name' semantics generalized. (DuckDB's arg_max can't order
    by a struct, so the oracle states the same semantics via
    row_number.)"""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.expr("max_by(c_name, struct(c_acctbal, c_custkey))").alias("richest"),
        F.expr("min_by(c_name, struct(c_acctbal, c_custkey))").alias("poorest"),
    )


@query(
    "pivot_events_type_by_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def pivot_events_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (required: without it Spark
    collects distinct values to the driver — a hidden job and
    nondeterministic column order at scale)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey AS partkey, metric, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    )
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) wide → long via ``stack`` — the inverse of pivot,
    no shuffle at all (pure projection + generate)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE),"
            " 'retailprice', p_retailprice) AS (metric, value)"
        ),
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS users,
           COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one GROUP BY — Catalyst plans an
    Expand (one row replica per distinct column) + two-phase agg; at
    100 TB prefer one approx_count_distinct per column instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.count("*").alias("n"),
    )


@query(
    "proj_null_semantics",
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error') AS type_or_null,
           coalesce(nullif(event_type, 'error'), 'masked') AS coalesced,
           nullif(event_type, 'error') IS NULL AS was_error,
           CASE WHEN value > 50 THEN value END AS value_if_high,
           ifnull(CASE WHEN value > 50 THEN value END, -1.0) AS value_filled
    FROM events
    """,
)
def proj_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar pack: nullif/coalesce/ifnull/IS NULL and
    the implicit ELSE NULL of CASE."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.nullif(F.col("event_type"), F.lit("error"))
    high = F.when(F.col("value") > 50, F.col("value"))
    return ev.select(
        "event_id",
        masked.alias("type_or_null"),
        F.coalesce(masked, F.lit("masked")).alias("coalesced"),
        masked.isNull().alias("was_error"),
        high.alias("value_if_high"),
        F.coalesce(high, F.lit(-1.0)).alias("value_filled"),
    )


@query(
    "proj_math_exact",
    oracle="""
    SELECT o_orderkey AS orderkey,
           abs(o_totalprice - 250000) AS abs_diff,
           CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
           CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
           sqrt(o_totalprice) AS sqrt_price,
           o_orderkey % 7 AS key_mod,
           greatest(o_totalprice, 100000.0) AS at_least,
           least(o_totalprice, 400000.0) AS at_most,
           CASE WHEN o_totalprice > 0 THEN 1
                WHEN o_totalprice < 0 THEN -1 ELSE 0 END AS sign_price
    FROM orders
    """,
)
def proj_math_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-exact math scalars (abs/ceil/floor/sqrt/mod/greatest/least).
    exp/log/pow are deliberately excluded from oracle checks: libm
    implementations differ in the final ulp across engines."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.abs(p - 250000).alias("abs_diff"),
        F.ceil(p).alias("ceil_price"),
        F.floor(p).alias("floor_price"),
        F.sqrt(p).alias("sqrt_price"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.greatest(p, F.lit(100000.0)).alias("at_least"),
        F.least(p, F.lit(400000.0)).alias("at_most"),
        F.when(p > 0, 1).when(p < 0, -1).otherwise(0).alias("sign_price"),
    )


@query(
    "proj_posexplode_embedding",
    oracle="""
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding) AS val
    FROM embeddings WHERE vec_id < 5
    """,
)
def proj_posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of a vector column (0-based positions) — the
    long-format bridge between array columns and relational ops."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )


@query(
    "window_first_last_values",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS LAST, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
)
def window_first_last_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with the classic last_value trap handled:
    the default frame ends at CURRENT ROW, so last_value needs an
    explicit UNBOUNDED FOLLOWING frame. NULLS LAST pinned on both
    engines (r15 temporal-band null sweep): undated orders rank after
    the dated history, so first/second stay the dated ones."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_sampled,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY event_type
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 sample per stratum via content hashing
    (md5(event_id) first hex digit ∈ {0,1}) — reproducible across
    engines, runs, and cluster sizes, unlike ``df.sample`` whose
    output depends on partitioning. The predicate is partition-local
    (no shuffle before the aggregate) and composes with any
    stratification key. The pattern a training pipeline uses for
    eval-split carving and data ablations at 100 TB: the sample
    decision rides the scan, costs one hash per row, and never moves
    data."""
    ev = load_table(spark, sf_dir, "events")
    digit = F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 1
    )
    return (
        ev.filter(digit.isin("0", "1"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_sampled"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "sort_paginate_offset",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def sort_paginate_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination: total order (measure + unique
    tie-break) → OFFSET/LIMIT page. Spark plans the whole thing as a
    single TakeOrderedAndProject-style top-(offset+limit) per
    partition merged on the driver — no global sort materialization.
    (At 100 TB deep pages should switch to keyset pagination — WHERE
    (price, key) < last_seen ORDER BY ... LIMIT n — same total-order
    requirement, no deepening offset cost; this query registers the
    OFFSET surface itself.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .offset(40)
        .limit(20)
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH keyed AS (
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 5000 THEN NULL
                    ELSE o_orderpriority END AS prio_key
        FROM orders
    ),
    dim(prio_key, priority_label) AS (
        VALUES ('1-URGENT', 'urgent'), ('2-HIGH', 'high'),
               ('3-MEDIUM', 'medium'), ('4-NOT SPECIFIED', 'unspecified'),
               ('5-LOW', 'low'), (NULL, 'unknown-bucket')
    )
    SELECT d.priority_label, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM keyed k JOIN dim d ON k.prio_key IS NOT DISTINCT FROM d.prio_key
    GROUP BY d.priority_label
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): under
    ordinary equi-join semantics a NULL key matches nothing, so rows
    with unknown keys silently vanish from an enrichment join — the
    classic silent-data-loss bug. The null-safe operator makes NULL a
    *first-class key value*: orders whose priority is unknown (modeled
    here as sub-5000 totals) land in the dimension's explicit
    'unknown-bucket' row instead of disappearing.

    Catalyst treats ``<=>`` as an equi-join condition (hash join, not
    nested-loop — asserted by the no-cartesian audit family), and the
    broadcast dimension carries the NULL-keyed fallback row. Counts
    prove conservation: every order appears in exactly one bucket."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 5000, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_key"),
    )
    dim = orders.sparkSession.createDataFrame(
        [
            ("1-URGENT", "urgent"),
            ("2-HIGH", "high"),
            ("3-MEDIUM", "medium"),
            ("4-NOT SPECIFIED", "unspecified"),
            ("5-LOW", "low"),
            (None, "unknown-bucket"),
        ],
        "prio_key string, priority_label string",
    )
    return (
        keyed.join(
            F.broadcast(dim),
            keyed.prio_key.eqNullSafe(dim.prio_key),
        )
        .groupBy("priority_label")
        .agg(F.count("*").alias("n_orders"))
    )


_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_brand,
       CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents,
       CAST(p.p_size AS BIGINT) AS size
FROM part p
WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part q
    WHERE CAST(CAST(q.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              <= CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      AND q.p_size <= p.p_size
      AND (CAST(CAST(q.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               < CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           OR q.p_size < p.p_size)
)
"""


def _skyline_pass(parts: DataFrame, bucket) -> DataFrame:
    """One skyline filter pass within ``bucket`` partitions: a row is
    dominated iff a strictly-cheaper row in the same bucket has size ≤
    its size, or an equal-priced row has strictly smaller size. Both
    tests are window minima over the (bucket, price) sort — no self
    join."""
    w_lt = (
        Window.partitionBy(bucket)
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(bucket, "price_cents")
    return (
        parts.withColumn("min_sz_lt", F.min("size").over(w_lt))
        .withColumn("min_sz_eq", F.min("size").over(w_eq))
        .filter(
            (F.col("min_sz_lt").isNull() | (F.col("min_sz_lt") > F.col("size")))
            & (F.col("min_sz_eq") == F.col("size"))
        )
        .drop("min_sz_lt", "min_sz_eq")
    )


@query("relational_skyline_2d", oracle=_SKYLINE_ORACLE)
def relational_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts where no other part is both
    cheaper-or-equal and smaller-or-equal with at least one strict — the
    dominance operator relational engines bolt on as SKYLINE OF
    (Börzsönyi et al., ICDE'01). The oracle is the O(n²) NOT EXISTS
    definition; the plan is the distributed two-phase filter:

    1. **local skyline per hash bucket** — each bucket sorts on price
       and keeps rows whose size beats the running minimum (the sort-
       filter skyline). A dominator may hash to another bucket, so
       survivors are a *superset* of the global skyline — but never
       miss it (an undominated row survives any pass), and for roughly
       independent dims each bucket keeps ~O(log n) rows, so the union
       feeding phase 2 is tiny.
    2. **global pass over the union of local skylines** — same filter
       with a constant bucket; runs on the reduced set, so the single-
       partition global sort is bounded, never corpus-sized.

    Ties: equal (price, size) pairs don't dominate each other (no
    strict inequality), so the filter keeps the whole tie group —
    `min_sz_eq == size` keeps exactly the rows minimal in their price
    class that aren't beaten by a cheaper class.

    NULL-dimension quarantine mirrored in the oracle (r15 numeric-band
    null sweep): a part with unknown price or size is incomparable
    under the dominance order — the bare NOT EXISTS form vacuously
    admits every such row (no comparison is ever TRUE against it)
    while the window form silently drops them; both engines now
    restrict the skyline to fully-known rows."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    )
    parts = part.select(
        "p_partkey",
        "p_brand",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    local = _skyline_pass(parts, F.pmod(F.hash("p_partkey"), F.lit(32)))
    return _skyline_pass(local, F.lit(0)).select(
        "p_partkey", "p_brand", "price_cents", "size"
    )


@query(
    "agg_group_ols_trend",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus AS status, COUNT(*) AS n,
               CAST(SUM(CAST(date_diff('day', DATE '1970-01-01',
                                        CAST(o_orderdate AS DATE))
                             AS DECIMAL(18,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS DECIMAL(18,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(date_diff('day', DATE '1970-01-01',
                                        CAST(o_orderdate AS DATE))
                             * CAST(date_diff('day', DATE '1970-01-01',
                                              CAST(o_orderdate AS DATE))
                                    AS DECIMAL(28,0))
                             AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(date_diff('day', DATE '1970-01-01',
                                        CAST(o_orderdate AS DATE))
                             * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                    AS DECIMAL(28,0))
                             AS DECIMAL(38,0))) AS DOUBLE) AS sxy
        FROM orders GROUP BY o_orderstatus
    )
    SELECT status, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
               AS slope_cents_per_day,
           (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx) / n
               AS intercept_cents
    FROM s
    """,
)
def agg_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (least-squares trend line): order value
    in cents regressed on order date (days since epoch) per order
    status. Same determinism strategy as agg_corr_price_quantity: the
    four sufficient statistics (Σx, Σy, Σx², Σxy) are EXACT integer/
    decimal partial aggregates — one map-side-combined pass, any
    partitioning — and only the final slope/intercept division runs in
    IEEE double, so both engines emit identical bits. This is the
    grouped-regression operator MLlib would answer with a per-group
    solver; for one feature the sufficient-statistic fold is the
    100 TB-correct plan (no per-group iteration, no driver loop)."""
    o = load_table(spark, sf_dir, "orders")
    x = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    y = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
    base = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x.cast("decimal(28,0)")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((x * y.cast("decimal(28,0)")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # NULLIF-guarded: a one-order group (or all orders on one date) has
    # zero x-variance — the trend line is undefined there, so slope and
    # intercept go NULL on both engines instead of an ANSI crash (r14
    # degenerate sweep). The intercept reuses the guarded slope, so the
    # NULL propagates consistently.
    slope = (n * F.col("sxy") - sx * sy) / F.nullif(
        n * F.col("sxx") - sx * sx, F.lit(0.0)
    )
    return base.select(
        "status",
        n.cast("long").alias("n"),
        slope.alias("slope_cents_per_day"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


@query(
    "join_asof_nearest_click",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, event_id AS click_id, ts AS cts
        FROM events WHERE event_type = 'click'
    ),
    back AS (
        SELECT p.purchase_id, p.user_id, p.pts, c.click_id, c.cts,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                  ORDER BY c.cts DESC, c.click_id DESC) AS rn
        FROM purchases p JOIN clicks c
          ON c.user_id = p.user_id AND c.cts <= p.pts
    ),
    fwd AS (
        SELECT p.purchase_id, p.user_id, p.pts, c.click_id, c.cts,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                  ORDER BY c.cts ASC, c.click_id ASC) AS rn
        FROM purchases p JOIN clicks c
          ON c.user_id = p.user_id AND c.cts > p.pts
    ),
    cand AS (
        SELECT purchase_id, user_id, pts, click_id, cts, 0 AS side
        FROM back WHERE rn = 1
        UNION ALL
        SELECT purchase_id, user_id, pts, click_id, cts, 1 AS side
        FROM fwd WHERE rn = 1
    )
    SELECT purchase_id, user_id, click_id,
           CAST(abs(epoch_us(cts) - epoch_us(pts)) AS BIGINT) AS delta_us,
           side = 0 AS matched_backward
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY purchase_id
                   ORDER BY abs(epoch_us(cts) - epoch_us(pts)), side) AS rnk
        FROM cand
    ) WHERE rnk = 1
    """,
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each purchase pairs with the same
    user's closest click in EITHER direction (ties prefer the earlier,
    backward click) — attribution when the causal direction is unknown
    (prefetch clicks land after their purchase event in some loggers).
    Plain backward as-of (join_asof_last_signup) can't express this;
    nearest = best-of(last-before, first-after), which is exactly how
    it's computed: one backward representative and one forward
    representative per purchase (each a per-user rank over its side),
    then an arg-min on absolute distance with a deterministic side
    tie-break. Distances compare as exact integer MICROseconds
    (epoch_us both engines — fractional-second doubles would disagree
    in the last bit).

    Scale: both representative picks are per-user-keyed windows over
    the interleaved event stream (the standard sorted-merge as-of
    shape, no pair explosion beyond per-user click×purchase, pruned to
    rank 1 before the union); the final arg-min touches ≤2 rows per
    purchase."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    joined = purchases.join(clicks, "user_id")
    back = (
        joined.filter(F.col("cts") <= F.col("pts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("purchase_id").orderBy(
                    F.desc("cts"), F.desc("click_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .withColumn("side", F.lit(0))
    )
    fwd = (
        joined.filter(F.col("cts") > F.col("pts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("purchase_id").orderBy(
                    F.asc("cts"), F.asc("click_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .withColumn("side", F.lit(1))
    )
    cand = back.unionByName(fwd).withColumn(
        "delta_us",
        F.abs(F.timestamp_diff("MICROSECOND", F.col("pts"), F.col("cts"))).cast(
            "long"
        ),
    )
    w = Window.partitionBy("purchase_id").orderBy("delta_us", "side")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            "delta_us",
            (F.col("side") == 0).alias("matched_backward"),
        )
    )


@query(
    "join_fulfillment_latency_histogram",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS lat_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(CASE WHEN lat_days < 30 THEN lat_days // 7
                     ELSE 4 END AS INT) AS bucket_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(MIN(lat_days) AS INT) AS min_days,
           CAST(MAX(lat_days) AS INT) AS max_days
    FROM lat
    GROUP BY o_orderpriority,
             CASE WHEN lat_days < 30 THEN lat_days // 7 ELSE 4 END
    """,
)
def join_fulfillment_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority: day latency
    from the fact-fact join bucketed into weeks (30+ days pooled into
    the tail bucket) with exact min/max — the fulfillment-SLA
    histogram an ops review reads per priority class. Integer date
    arithmetic only; the synthetic corpus draws order and ship dates
    independently, so 'latency' spans negatives here (and the bucket
    rule stays engine-identical: INTEGER division truncates toward
    zero in BOTH Spark DIV and DuckDB ``//`` — verified −17//7 = −2
    in each; it is float ``//`` that floors in DuckDB). Buckets are
    closed-form, so the histogram partial-aggregates map-side.

    Scale: one equi-join shuffle on the order key (or zero with the
    bucketed layout — join_bucketed_colocated) and one grouped count;
    output ≤ |priorities|·5 rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("lat_days"),
    )
    bucket = (
        F.when(F.col("lat_days") < 30, F.expr("lat_days div 7"))
        .otherwise(F.lit(4))
        .cast("int")
    )
    return lat.groupBy("o_orderpriority", bucket.alias("bucket_weeks")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.min("lat_days").cast("int").alias("min_days"),
        F.max("lat_days").cast("int").alias("max_days"),
    )
