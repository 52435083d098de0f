"""Data-quality operators — the checks a training-data pipeline runs
before rows reach a model: constraint auditing, statistical outlier
filtering, and null imputation. Extends the reference's row-level
validation (``src/validation.ts`` composite checks; quarantine split
in operators/projections.py) to table-level and distribution-level
rules, all as single-pass declarative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


@query(
    "quality_constraint_report",
    oracle="""
    SELECT 'orders.o_custkey_fk' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders.o_orderkey_unique',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderstatus_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    """,
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level constraint audit: referential integrity (orphaned
    FKs via null-probe left join), key uniqueness, value range, and
    categorical domain — one row per rule with checked/violation
    counts. The declarative audit replaces what the reference gets
    implicitly from SQLite constraints (``db/schema.ts`` UNIQUE / FK
    clauses): a lake has no enforcement, so the pipeline must measure.

    Scale shape: each rule is a partial+final aggregate (violation
    counts cross the shuffle as one row per rule); the FK probe is a
    shuffle join on the key with the dimension's key column only
    (pruned scan), and the per-rule results union driver-free."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    fk = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .agg(
            F.count("*").alias("n_checked"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
        .select(F.lit("orders.o_custkey_fk").alias("rule"), "n_checked", "n_violations")
    )
    uniq = o.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias(
            "n_violations"
        ),
    ).select(
        F.lit("orders.o_orderkey_unique").alias("rule"), "n_checked", "n_violations"
    )
    rng = o.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit("orders.o_totalprice_positive").alias("rule"),
        "n_checked",
        "n_violations",
    )
    dom = o.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit("orders.o_orderstatus_domain").alias("rule"),
        "n_checked",
        "n_violations",
    )
    return fk.unionByName(uniq).unionByName(rng).unionByName(dom)


@query(
    "quality_outliers_iqr",
    oracle="""
    WITH b AS (
        SELECT round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS q1,
               round(CAST(quantile_cont(value, 0.75) AS DOUBLE), 4) AS q3
        FROM events)
    SELECT event_id, event_type, value,
           value < q1 - 1.5 * (q3 - q1) AS low_outlier,
           value > q3 + 1.5 * (q3 - q1) AS high_outlier
    FROM events, b
    WHERE value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1)
    """,
)
def quality_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection (Tukey fences: outside
    [Q1−1.5·IQR, Q3+1.5·IQR]) — the standard pre-training numeric
    filter. Same two-pass no-global-sort shape as the equi-depth
    histogram: exact quartiles once (one-row broadcast), then a
    codegen comparison filter over the fact rows. Boundaries rounded
    to 4 dp on both engines so interpolation last-bit noise can't flip
    a fence-adjacent row."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    low = F.col("value") < F.col("q1") - 1.5 * iqr
    high = F.col("value") > F.col("q3") + 1.5 * iqr
    return (
        ev.crossJoin(F.broadcast(bounds))
        .filter(low | high)
        .select(
            "event_id",
            "event_type",
            "value",
            low.alias("low_outlier"),
            high.alias("high_outlier"),
        )
    )


@query(
    "quality_impute_group_mean",
    oracle="""
    WITH masked AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        FROM events),
    m AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value)
                   AS grp_mean
        FROM masked GROUP BY event_type)
    SELECT event_id, masked.event_type,
           COALESCE(masked.value, m.grp_mean) AS value_imputed,
           masked.value IS NULL AS was_imputed
    FROM masked JOIN m ON masked.event_type = m.event_type
    """,
)
def quality_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null imputation with the per-group mean — the fill strategy for
    sparse numeric features. Nulls are synthesized deterministically
    (event_id % 7) since the corpus is dense; the imputation itself is
    the production shape: per-group means are a tiny aggregate
    broadcast back onto the fact rows (never a window over the full
    partition), and the mean is computed order-independently
    (decimal sum / count) so the filled values hash-match across
    engines. ``was_imputed`` keeps provenance for downstream weighting."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("value"),
    )
    means = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("value")
        ).alias("grp_mean")
    )
    return ev.join(F.broadcast(means), "event_type").select(
        "event_id",
        "event_type",
        F.coalesce("value", "grp_mean").alias("value_imputed"),
        F.col("value").isNull().alias("was_imputed"),
    )


@query(
    "quality_profile_table",
    oracle="""
    SELECT 'c_acctbal' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS n_distinct,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_num,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_num
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           NULL, NULL
    FROM customer
    UNION ALL
    SELECT 'c_nationkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(MIN(c_nationkey) AS DOUBLE),
           CAST(MAX(c_nationkey) AS DOUBLE)
    FROM customer
    """,
)
def quality_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling summary — row counts, null counts, distinct
    cardinality, numeric min/max per column — the first thing a data
    pipeline computes about an unfamiliar 100 TB table. One aggregate
    per profiled column over a shared scan (Catalyst reuses the
    exchange); distinct counts are the exact form here because they're
    oracle-checked — the scale variant swaps in the HLL sketches
    registered as agg_hll_reaggregatable."""
    cust = load_table(spark, sf_dir, "customer")

    def prof(col: str, numeric: bool) -> DataFrame:
        aggs = [
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).cast("bigint").alias("n_null"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            (F.min(col).cast("double") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.max(col).cast("double") if numeric else F.lit(None).cast("double")).alias("max_num"),
        ]
        return cust.agg(*aggs).select(
            F.lit(col).alias("column_name"), "n_rows", "n_null", "n_distinct",
            "min_num", "max_num",
        )

    return (
        prof("c_acctbal", True)
        .unionByName(prof("c_mktsegment", False))
        .unionByName(prof("c_nationkey", True))
    )


@query(
    "quality_drift_ks",
    oracle="""
    WITH s AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS in_b
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    totals AS (
        SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
               CAST(SUM(in_b) AS BIGINT) AS n_b
        FROM s
    ),
    per_cent AS (
        SELECT cents, CAST(SUM(in_a) AS BIGINT) AS ca,
               CAST(SUM(in_b) AS BIGINT) AS cb
        FROM s GROUP BY cents
    ),
    ecdf AS (
        SELECT cents,
               CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
               CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
        FROM per_cent
        WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    scored AS (
        SELECT cents, abs(cum_a * t.n_b - cum_b * t.n_a) AS num,
               t.n_a AS n_a, t.n_b AS n_b
        FROM ecdf CROSS JOIN totals t
    )
    SELECT n_a, n_b,
           CAST(num * 1000000 // (n_a * n_b) AS BIGINT) AS ks_ppm,
           CAST(cents AS DOUBLE) / 100 AS at_value
    FROM scored
    ORDER BY num DESC, cents ASC
    LIMIT 1
    """,
)
def quality_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    ``value`` distributions of two event cohorts (click vs purchase) —
    the distribution-shift monitor a feature pipeline runs between
    yesterday's and today's data before a model sees it.

    Exact arithmetic throughout: values land on a cent grid (the
    decimal cast), ECDFs are cumulative *integer* counts, and the KS
    statistic is maximized as |cumA·nB − cumB·nA| (cross-multiplied —
    no per-row float division) with the final D reported in exact ppm.
    The argmax row also reports where the distributions diverge most.

    Scale shape: raw rows collapse to the value grid first (bounded by
    the cent domain, ~50k cells, regardless of corpus size), so the
    one ordered window that builds both ECDFs runs over grid cells,
    not events — the classic bounded-state trick that makes a global
    ECDF feasible at 100 TB. Everything before it is one
    partial-aggregated shuffle.

    Mirrored participation filter (r15 numeric-band null sweep): an
    unmeasured event is not a sample of either distribution — the
    NULL grid cell's engine-dependent slot in the ECDF ordering
    shifted both cumulative counts."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    s = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("in_b"),
    )
    totals = s.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
    )
    per_cent = s.groupBy("cents").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum("in_b").cast("long").alias("cb"),
    )
    w = (
        Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = per_cent.select(
        "cents",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    # DECIMAL(38,0) before the cross-multiplication: with int64 the
    # product cum_a*n_b wraps silently past ~3e9-row cohorts (Spark,
    # ANSI off) while DuckDB widens to HUGEINT — the engines would
    # diverge exactly at the scale this operator claims. Same pattern
    # as agg_gini_concentration.
    scored = ecdf.crossJoin(F.broadcast(totals)).select(
        "cents",
        F.abs(
            F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
        ).alias("num"),
        "n_a",
        "n_b",
    )
    return (
        scored.orderBy(F.col("num").desc(), F.col("cents").asc())
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.expr("num * 1000000 div (cast(n_a as decimal(38,0)) * n_b)")
            .cast("long")
            .alias("ks_ppm"),
            (F.col("cents").cast("double") / 100).alias("at_value"),
        )
    )


@query(
    "quality_skew_report",
    oracle="""
    WITH per_key AS (
        SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_orderkey
    ),
    ranked AS (
        SELECT key, n,
               row_number() OVER (ORDER BY n DESC, key ASC) AS rk,
               CAST(SUM(n) OVER () AS BIGINT) AS total_rows,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_keys
        FROM per_key
    )
    SELECT 'lineitem.l_orderkey' AS join_key,
           n_keys, total_rows,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_key_rows,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) * 1000000 // total_rows
                AS BIGINT) AS top_key_share_ppm,
           CAST(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) * 1000000
                // total_rows AS BIGINT) AS top10_share_ppm,
           CAST(MAX(n) * n_keys * 1000000 // total_rows AS BIGINT)
               AS max_over_mean_ppm
    FROM ranked
    GROUP BY n_keys, total_rows
    """,
)
def quality_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the pre-flight check before keying a
    shuffle on a column at 100 TB: per-key cardinality profile of
    lineitem.l_orderkey reduced to the numbers a planner (or operator)
    acts on — hottest-key share, top-10 share, and max/mean ratio, all
    in exact integer ppm. max/mean ≫ 10⁶ means salting or AQE skew
    splitting is mandatory; top-10 share near 10⁶ means broadcast or
    key-split instead.

    One partial-aggregated shuffle builds the per-key counts; the
    profile needs only scalar aggregates of that table plus its top-10
    rows (TakeOrdered — no global window, no single-partition sort
    over keys, unlike the oracle's rank-window derivation of the same
    numbers). Works unchanged as a template over any (table, key)
    pair."""
    from ..session import iter_checkpoint

    li = load_table(spark, sf_dir, "lineitem")
    per_key = iter_checkpoint(
        li.groupBy(F.col("l_orderkey").alias("key")).agg(
            F.count("*").alias("n")
        )
    )
    totals = per_key.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("top_key_rows"),
    )
    top10 = (
        per_key.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(10)
        .agg(F.sum("n").cast("long").alias("top10_rows"))
    )
    return (
        totals.crossJoin(F.broadcast(top10))
        .select(
            F.lit("lineitem.l_orderkey").alias("join_key"),
            "n_keys",
            "total_rows",
            "top_key_rows",
            F.expr("top_key_rows * 1000000 div total_rows")
            .cast("long")
            .alias("top_key_share_ppm"),
            F.expr("top10_rows * 1000000 div total_rows")
            .cast("long")
            .alias("top10_share_ppm"),
            F.expr("top_key_rows * n_keys * 1000000 div total_rows")
            .cast("long")
            .alias("max_over_mean_ppm"),
        )
        # no keys → no report: the oracle's rank-window derivation
        # naturally emits zero rows over an empty table, while the
        # global-aggregate plan here emits one all-NULL row — mirror
        # to the oracle's (and the more useful) shape (r14 degenerate
        # full-oracle sweep). On any non-empty table n_keys >= 1.
        .filter(F.col("n_keys") > 0)
    )


@query(
    "quality_outliers_mad",
    oracle="""
    WITH vals AS (
        SELECT event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    med AS (
        SELECT event_type,
               CAST(median(cents) * 2 AS BIGINT) AS med2
        FROM vals GROUP BY event_type
    ),
    devs AS (
        SELECT v.event_id, v.event_type, v.cents,
               abs(2 * v.cents - m.med2) AS dev2
        FROM vals v JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               CAST(median(dev2) * 2 AS BIGINT) AS mad4
        FROM devs GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 2 * d.dev2 * 10000 > 3 * 14826 * m.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM devs d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def quality_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    heavy-tail-safe sibling of the IQR fence (quality_outliers_iqr)
    and z-score (events_hourly_anomaly): a point is an outlier when
    |x − median| > 3·1.4826·MAD.

    Exactness without floats: values sit on the cent grid, and every
    median (even-count interpolation lands on halves) is doubled into
    an integer — med2 = 2·median, mad4 = 4·MAD — so the flag
    comparison 2·dev2·10⁴ > 3·14826·mad4 is pure 64-bit integer
    arithmetic; the 1.4826 normal-consistency constant rides along as
    the rational 14826/10⁴. Two median aggregations + one broadcast
    join per stage; at scale the exact medians swap for
    approx_percentile with the same integer framing."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    med = vals.groupBy("event_type").agg(
        (F.expr("percentile(cents, 0.5)") * 2).cast("long").alias("med2")
    )
    devs = vals.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "cents",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2"),
    )
    mad = devs.groupBy("event_type").agg(
        (F.expr("percentile(dev2, 0.5)") * 2).cast("long").alias("mad4")
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(
                    2 * F.col("dev2") * 10000 > 3 * 14826 * F.col("mad4"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@query(
    "sample_weighted_bernoulli",
    oracle="""
    WITH keyed AS (
        SELECT l_orderkey, l_linenumber, l_partkey,
               CAST(l_quantity AS BIGINT) AS w,
               CAST(('0x' || substr(md5(l_orderkey || ':' || l_linenumber), 1, 8))
                    AS BIGINT) % 50 AS u
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_partkey, w
    FROM keyed WHERE u < w
    """,
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling without RNG state: each lineitem is
    kept with probability quantity/50, decided by comparing a
    per-row md5 draw (uniform over [0,50) by construction) against the
    integer weight — the deterministic form of importance-weighted
    example selection in training-data pipelines (sample long/valuable
    rows more often), reproducible across engines, runs, and restarts
    because the randomness is a pure function of the row key.

    A scan-level filter: no shuffle at all, trivially parallel at
    100 TB, and the kept set is stable under re-partitioning (the draw
    depends only on the natural key, never on task layout). The exact
    integer comparison u < w is the whole operator."""
    li = load_table(spark, sf_dir, "lineitem")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 50
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            F.col("l_quantity").cast("long").alias("w"),
            u.alias("u"),
        )
        .filter(F.col("u") < F.col("w"))
        .drop("u")
    )


# Benford expected first-digit proportions log10(1+1/d), in ppm — public
# constants, inlined identically in the Spark plan and the oracle
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_ROWS = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())


@query(
    "quality_benford_first_digit",
    oracle=f"""
    WITH expected(digit, expected_ppm) AS (VALUES {_BENFORD_ROWS}),
    digits AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
        FROM orders
    ),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
        FROM digits GROUP BY digit
    )
    SELECT e.digit, COALESCE(c.n, 0) AS n,
           CAST(COALESCE(c.n, 0) * 1000000 // MAX(c.total) OVER ()
                AS BIGINT) AS observed_ppm,
           e.expected_ppm,
           abs(CAST(COALESCE(c.n, 0) * 1000000 // MAX(c.total) OVER ()
                    AS BIGINT) - e.expected_ppm) AS abs_dev_ppm
    FROM expected e LEFT JOIN counts c USING (digit)
    """,
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    data-forensics screen for fabricated or truncated numeric columns
    (synthetic uniform data fails it loudly, which is itself the
    signal here). The nine expected proportions log10(1+1/d) ride as
    inlined ppm constants, the observed share is exact integer ppm,
    and the per-digit absolute deviation is the audit output — no
    logarithm is ever evaluated at query time.

    First digits come from the integer-cents rendering (identical
    decimal cast on both engines); one partial-aggregated shuffle of
    at most nine groups plus a broadcast of the constant table."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    expected = orders.sparkSession.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "digit long, expected_ppm long",
    )
    obs_ppm = F.expr("coalesce(n, 0) * 1000000 div total").cast("long")
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            obs_ppm.alias("observed_ppm"),
            "expected_ppm",
            F.abs(obs_ppm - F.col("expected_ppm")).alias("abs_dev_ppm"),
        )
    )


@query(
    "quality_cohen_kappa",
    oracle="""
    WITH labeled AS (
        SELECT CASE WHEN len(list_filter(string_split(text, ' '),
                                         t -> t IN ('the', 'a', 'of', 'and',
                                                    'to', 'in', 'is', 'on')))
                         * 1.0 / len(string_split(text, ' ')) >= 0.08
                    THEN 1 ELSE 0 END AS guess_en,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
        FROM documents
    ),
    cm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(guess_en * is_en) AS BIGINT) AS tp,
               CAST(SUM(guess_en * (1 - is_en)) AS BIGINT) AS fp,
               CAST(SUM((1 - guess_en) * is_en) AS BIGINT) AS fn,
               CAST(SUM((1 - guess_en) * (1 - is_en)) AS BIGINT) AS tn
        FROM labeled
    )
    SELECT n, tp, fp, fn, tn,
           CAST(CAST(n AS DECIMAL(19,0)) * CAST(tp + tn AS DECIMAL(19,0))
                - (CAST(tp + fp AS DECIMAL(19,0)) * CAST(tp + fn AS DECIMAL(19,0))
                   + CAST(tn + fn AS DECIMAL(19,0)) * CAST(tn + fp AS DECIMAL(19,0)))
               AS DOUBLE)
               / NULLIF(CAST(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
                      - (CAST(tp + fp AS DECIMAL(19,0)) * CAST(tp + fn AS DECIMAL(19,0))
                         + CAST(tn + fn AS DECIMAL(19,0)) * CAST(tn + fp AS DECIMAL(19,0)))
                  AS DOUBLE), 0)
               AS kappa
    FROM cm
    """,
)
def quality_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stopword-ratio language-ID heuristic
    (text_langid_heuristic's rule) and the corpus's ``lang`` label,
    binarized to en / not-en — the chance-corrected agreement metric a
    labeling pipeline reports when validating a cheap model against
    ground truth. The 2×2 confusion matrix is four conditional counts
    in ONE partial-aggregated scan; po/pe/kappa derive from those exact
    BIGINTs, with only the final division in double (identical IEEE
    bits both engines). Scale: a scan plus a 4-cell aggregate —
    nothing grows with the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_ratio = (
        F.size(
            F.filter(
                toks,
                lambda t: t.isin("the", "a", "of", "and", "to", "in", "is", "on"),
            )
        ).cast("double")
        / F.size(toks)
    )
    labeled = docs.select(
        F.when(stop_ratio >= 0.08, 1).otherwise(0).alias("guess_en"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    g, e = F.col("guess_en"), F.col("is_en")
    cm = labeled.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(g * e).cast("long").alias("tp"),
        F.sum(g * (1 - e)).cast("long").alias("fp"),
        F.sum((1 - g) * e).cast("long").alias("fn"),
        F.sum((1 - g) * (1 - e)).cast("long").alias("tn"),
    )
    n = F.col("n")
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    # both factors cast to DECIMAL(19,0) so the products land in
    # DECIMAL(38,0) in BOTH engines (DuckDB multiplies operand
    # precisions within its 38 cap): n·n stays exact past the ~3.1e9
    # rows where a 19-digit product would overflow — and Spark's
    # non-ANSI overflow-to-NULL vs DuckDB's raise never diverges
    dec = "decimal(19,0)"
    pe_num = (tp + fp).cast(dec) * (tp + fn).cast(dec) + (tn + fn).cast(dec) * (
        tn + fp
    ).cast(dec)
    # NULLIF-guarded (r14 degenerate sweep): when every row lands in
    # one class (e.g. all-NULL text → every guess and label 0),
    # expected agreement equals 1, the denominator is 0 and kappa is
    # UNDEFINED — NULL on both engines, not an ANSI crash.
    return cm.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        (
            (n.cast(dec) * (tp + tn).cast(dec) - pe_num).cast("double")
            / F.nullif(
                (n.cast(dec) * n.cast(dec) - pe_num).cast("double"),
                F.lit(0.0),
            )
        ).alias("kappa"),
    )


K_ANON = 5  # minimum group size for a quasi-identifier combination
LEN_BUCKET = 64  # n_chars bucket width joining the quasi-identifier


@query(
    "quality_k_anonymity",
    oracle=f"""
    SELECT lang, source, n_chars // {LEN_BUCKET} AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           COUNT(*) >= {K_ANON} AS k_anonymous
    FROM documents
    GROUP BY lang, source, n_chars // {LEN_BUCKET}
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination
    (lang, source, length bucket): any combination observed in fewer
    than K documents could single out an individual record when the
    corpus is released or joined against outside data, so a privacy
    review suppresses or generalizes those cells before publication.
    This is the reporting pass that drives that decision — one grouped
    count, each cell flagged against the k threshold.

    Scale: a single partial-aggregated shuffle keyed on the
    quasi-identifier tuple; output is cell-count-sized (bounded by the
    identifier domain product, never the corpus). n_chars uses integer
    floor-bucketing — nonnegative, so Spark DIV ≡ DuckDB ``//``."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang", "source", F.expr(f"n_chars div {LEN_BUCKET}").alias("len_bucket")
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("k_anonymous", F.col("n_docs") >= K_ANON)
    )


@query(
    "quality_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, dayofweek(ts)
    ),
    rows_t AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY event_type),
    cols_t AS (SELECT dow, SUM(o) AS ct FROM cells GROUP BY dow),
    tot AS (SELECT SUM(o) AS n FROM cells),
    terms AS (
        SELECT c.o,
               CAST(r.rt AS DOUBLE) * CAST(c2.ct AS DOUBLE)
                   / CAST(t.n AS DOUBLE) AS e
        FROM cells c
        JOIN rows_t r USING (event_type)
        JOIN cols_t c2 USING (dow)
        CROSS JOIN tot t
    ),
    acc AS (
        SELECT SUM(CAST(trunc(LEAST((CAST(o AS DOUBLE) - e)
                                    * (CAST(o AS DOUBLE) - e) / e,
                                    9e8) * 1e10) AS BIGINT)) AS s14,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               (SELECT COUNT(*) FROM rows_t) AS nr,
               (SELECT COUNT(*) FROM cols_t) AS nc
        FROM terms
    )
    SELECT CAST(floor((CASE WHEN s14 < 0 THEN -1.0 ELSE 1.0 END
               * (CAST(abs(s14) // 1000000000000 AS DOUBLE) * 1e12
                  + CAST(abs(s14) % 1000000000000 AS DOUBLE)) / 1e10)
               * 1000000 + 0.5) AS BIGINT) AS chi2_ppm,
           n_cells,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof
    FROM acc
    """,
)
def quality_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic for event_type ×
    weekday — the categorical drift companion to quality_drift_ks: a
    pipeline asserting "behavior mix does not depend on day of week"
    alarms when this statistic crosses the critical value for its
    degrees of freedom. Expected counts come from the exact BIGINT
    margins (E = rowTot·colTot/N in double, identical association
    order both engines); the per-cell (O−E)²/E terms are folded with
    the order-independent scaled-integer sum from functions/vector.py
    at per-term scale 1e10 and clamped at 9e8 (a term can reach N on a
    fully dependent table, so the 1e14/9e4 default precondition does
    not hold here; term·1e10 ≤ 9e18 provably fits int64 in both
    engines, and a clamped cell only occurs when chi² is already
    astronomically past any critical value). Hash-stable, exact ppm.

    Scale: one grouped count (the contingency table), two margin
    aggregates over the |cells| rows, and a cells-sized join — nothing
    after the first scan touches the corpus."""
    from ..functions.vector import dec_scaled_to_double, sum_scaled

    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").cast("long").alias("o"))
    rows_t = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_t = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    terms = (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            e.alias("e"),
        )
    )
    od = F.col("o").cast("double")
    acc = terms.agg(
        sum_scaled(
            F.least(
                (od - F.col("e")) * (od - F.col("e")) / F.col("e"),
                F.lit(9e8),
            ),
            1e10,
        ).alias("s14"),
        F.count("*").cast("long").alias("n_cells"),
    )
    nr = rows_t.agg(F.count("*").alias("nr"))
    nc = cols_t.agg(F.count("*").alias("nc"))
    return (
        acc.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            F.floor(dec_scaled_to_double(F.col("s14"), 1e10) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("chi2_ppm"),
            "n_cells",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        )
    )
