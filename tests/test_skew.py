"""Skew-handling demo — SURVEY.md §4 scale posture: a hot key that
dwarfs every other (a monorepo in file_changes, a bot author) must not
serialize one reducer. Two mitigations shown on a deliberately skewed
join, both asserted equal to the plain result:

1. key salting (split the hot key into N sub-keys, replicate the small
   side N ways) — works on any Spark;
2. AQE skew-join splitting — automatic, already on in session.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    """1M-row fact where key 0 holds 90% of rows, + a 100-row dim."""
    fact = spark.range(1_000_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim

def _result_set(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_equals_plain_join(spark, skewed):
    fact, dim = skewed
    n_salts = 8

    plain = (
        fact.join(dim, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sv"))
    )

    # salt the fact side: hot rows scatter over (k, salt); replicate the
    # dim side once per salt value so every (k, salt) pair still matches
    salted_fact = fact.withColumn(
        "salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    salted_dim = dim.crossJoin(
        spark.range(n_salts).select(F.col("id").cast("int").alias("salt"))
    )
    salted = (
        salted_fact.join(salted_dim, ["k", "salt"])
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sv"))
    )

    assert _result_set(salted) == _result_set(plain)


def test_salted_aggregation_two_phase(spark, skewed):
    """Salted two-phase aggregation: partial agg on (k, salt), final on
    k — the map-side-combine idea made explicit for a hot group key."""
    fact, _ = skewed
    n_salts = 8

    plain = fact.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sv"),
    )

    phase1 = (
        fact.withColumn("salt", (F.rand(seed=11) * n_salts).cast("int"))
        .groupBy("k", "salt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sv_d"),
        )
    )
    phase2 = phase1.groupBy("k").agg(
        F.sum("n").alias("n"),
        F.sum("sv_d").cast("double").alias("sv"),
    )

    assert _result_set(phase2) == _result_set(plain)
