"""Partition-pruning demo — the 100 TB layout story (SURVEY.md §4 E8):
date-partitioned fact tables let a day filter skip whole directories;
the plan must show PartitionFilters, and the scan must not list the
pruned partitions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    from git_etl_spark.io import load_table

    path = tmp_path_factory.mktemp("part") / "orders_by_year"
    (
        load_table(spark, SF_SMOKE, "orders")
        .withColumn("order_year", F.year("o_orderdate"))
        .write.partitionBy("order_year")
        .parquet(str(path))
    )
    return str(path)


def test_year_filter_prunes_partitions(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).filter(
        F.col("order_year") == 1996
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan

    # correctness: pruned read equals post-filtered full read
    full = (
        spark.read.parquet(partitioned_orders)
        .filter(F.year("o_orderdate") == 1996)
        .count()
    )
    assert df.count() == full and full > 0


def test_dynamic_overwrite_rewrites_one_partition(spark, partitioned_orders, tmp_path):
    """partitionOverwriteMode=dynamic: overwriting a frame that touches
    one partition must leave the others untouched — the partition-scoped
    upsert path for K1 at scale."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        src = spark.read.parquet(partitioned_orders)
        before_other = src.filter(F.col("order_year") != 1996).count()
        one_year = src.filter(F.col("order_year") == 1996).limit(10)
        one_year.write.mode("overwrite").partitionBy("order_year").parquet(
            partitioned_orders
        )
        after = spark.read.parquet(partitioned_orders)
        assert after.filter(F.col("order_year") == 1996).count() == 10
        assert after.filter(F.col("order_year") != 1996).count() == before_other
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
