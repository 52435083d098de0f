"""Join pack — SURVEY.md §2.6.

The reference executes no joins in code (tables load independently;
FKs are by convention) but provisions the keys; the README query
surface and the star schema make joins first-class here.

Scale posture: dimension tables (region, nation, and at real scale a
bounded customer dim) are broadcast — ``F.broadcast`` hints where the
side is small by construction, otherwise AQE's runtime size check
upgrades sort-merge to broadcast. Fact-fact joins shuffle on the join
key; at 100 TB those keys are the bucketing candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..io import load_table
from ..registry import query


@query(
    "join_revenue_per_nation",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact→dim→dim with aggregation. ``nation`` (25
    rows) is broadcast explicitly; ``customer`` broadcasts under the
    10 MB threshold at test scale and sort-merges beyond it — the plan
    stays correct either way."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (reference SET-membership pattern, SURVEY §2.7
    SET1): customers having at least one order. Semi joins shuffle only
    distinct keys of the probe side — cheaper than inner+distinct."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


@query(
    "join_anti_customers_without_big_orders",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's ignore-list subtraction
    (``main.ts:283-296``, SURVEY §2.4 F4 / §2.7 SET2) as a distributed
    anti join. The synthetic FKs are dense (every customer has orders),
    so the anti side is made non-degenerate with a high-value predicate
    — which also shows the filter pushed below the join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


@query(
    "join_theta_richer_suppliers",
    oracle="""
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY c.c_nationkey
    """,
)
def join_theta_richer_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nation) + non-equi predicate (balance).
    Expressed with the inequality *inside* the join condition so
    Catalyst plans a hash/sort-merge join on the equi part and applies
    the range predicate as a post-join filter — never a cartesian
    product. The small side is broadcast-hinted."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    joined = F.broadcast(supplier).join(
        customer,
        (supplier.s_nationkey == customer.c_nationkey)
        & (supplier.s_acctbal > customer.c_acctbal),
    )
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_pairs")
    )


@query(
    "join_multiway_regional_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table join (local-supplier volume): fact-fact
    join lineitem⋈orders on orderkey, dims broadcast, the
    customer-nation = supplier-nation condition folded into the
    supplier join. At 100 TB lineitem and orders are both bucketed by
    orderkey so this join is shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum("l_extendedprice").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_broadcast_lookup",
    oracle="""
    SELECT CASE lang WHEN 'en' THEN 'English' WHEN 'de' THEN 'German'
                     WHEN 'es' THEN 'Spanish' WHEN 'fr' THEN 'French'
                     WHEN 'zh' THEN 'Chinese' ELSE 'Unknown' END AS language,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 static lookup-map join (reference ``src/git-parser.ts:233-252``
    18-entry ext→language map): a literal DataFrame broadcast-joined —
    the Spark idiom for small reference data instead of a CASE chain."""
    docs = load_table(spark, sf_dir, "documents")
    lookup = spark.createDataFrame(
        [
            ("en", "English"),
            ("de", "German"),
            ("es", "Spanish"),
            ("fr", "French"),
            ("zh", "Chinese"),
        ],
        "lang_code string, language string",
    )
    return (
        docs.join(F.broadcast(lookup), docs.lang == lookup.lang_code, "left")
        .withColumn("language", F.coalesce("language", F.lit("Unknown")))
        .groupBy("language")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "join_fuzzy_levenshtein_blocked",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM names a JOIN names b
      ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
     AND a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= 3
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    """,
)
def join_fuzzy_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) matching with **blocking**, run over the
    deduplicated name dictionary — the entity-resolution shape:
    dictionary-dedupe first (64 distinct names here vs 20k rows at
    sf0.1; real catalogs are equally repetitive), then candidate pairs
    form only within a block (same first character) and pass a cheap
    length filter (|Δlen| ≤ 3, a necessary condition for distance ≤ 3)
    before the O(n·m) Levenshtein runs. Cost is Σ block² over the
    *dictionary*, not the fact table; matched name pairs join back to
    rows by name when needed. Blocks are the shuffle key at 100 TB,
    skewed blocks split by AQE. Distance 0 is excluded — exact dupes
    belong to the hash-equality dedup family."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    a = names.select(F.col("p_name").alias("name_a")).withColumn(
        "blk", F.substring("name_a", 1, 1)
    )
    b = names.select(F.col("p_name").alias("name_b")).withColumn(
        "blk", F.substring("name_b", 1, 1)
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (a.blk == b.blk)
            & (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 3),
        )
        .withColumn("edit_dist", dist)
        .filter(dist.between(1, 3))
        .select("name_a", "name_b", "edit_dist")
    )


@query(
    "join_salted_replicated",
    oracle="""
    SELECT e.event_type AS event_type, d.weight AS weight,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (SELECT DISTINCT event_type,
                 CAST(length(event_type) AS BIGINT) AS weight
          FROM events) d
      ON e.event_type = d.event_type
    GROUP BY e.event_type, d.weight
    """,
)
def join_salted_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join under the PLAIN join oracle — proof the
    skew rewrite preserves semantics. A low-cardinality hot key
    (event_type: a handful of values, every one a skew cell in a
    shuffle join) is salted on the fact side with a deterministic
    16-way hash of the row key; the dim side is replicated ×16 with an
    exploded salt column, and the join key becomes (key, salt) — every
    hot key's rows now spread over 16 tasks. This is the manual form
    of AQE skew-join splitting, needed when the skew is in a grouped
    join-aggregate AQE can't split (or on engines/configs without it).
    Salt fans the small side only (16×|dim| rows); the post-join
    aggregate merges across salts, so results are salt-invariant —
    which is exactly what the oracle checks. (Here the dim would
    broadcast at this size; broadcast is disabled for this plan to
    exercise the shuffle-join path the pattern exists for.)"""
    n_salt = 16
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type").cast("bigint"))
    )
    dim_rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    ev_salted = ev.withColumn(
        "salt", (F.crc32(F.col("event_id").cast("string")) % n_salt).cast("int")
    )
    joined = ev_salted.hint("shuffle_hash").join(
        dim_rep, ["event_type", "salt"]
    )
    return joined.groupBy("event_type", "weight").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
