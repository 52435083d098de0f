"""E8 layout demo — SURVEY.md §4: bucketed tables replace the
reference's secondary indexes for repeated join keys. Writing lineitem
and orders bucketed by the join key must let Catalyst plan the
fact-fact join with ZERO shuffle exchanges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_warehouse(spark, tmp_path_factory):
    from git_etl_spark.io import load_table

    load_table(spark, SF_SMOKE, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("li_bucketed")
    load_table(spark, SF_SMOKE, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("o_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_warehouse):
    from git_etl_spark.plans.audit import count_shuffles

    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    # join itself is co-partitioned: the only exchange is the final
    # tiny aggregation on o_orderstatus
    assert count_shuffles(joined) <= 1

    # and the result matches the unbucketed computation
    from git_etl_spark.io import load_table

    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )
