"""Iterative graph analytics on the star schema's implicit graphs.

Connected components (dedup.dedup_cluster_components) and PageRank
share the same distributed shape: a per-round equi join of an edge
table against a small node-state table, an aggregate, and an eager
``localCheckpoint`` to keep lineage O(1) per round. This is the
DataFrame form of Pregel-style iteration — no RDDs, no driver-side
loops over collected data; each round is one shuffle keyed by node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query
from ..session import loop_shuffle_partitions

PAGERANK_ITERS = 6
DAMPING = 0.85


@query("graph_pagerank_bipartite")  # rows-only: iterative fixpoint, not SQL
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer↔supplier trade graph
    (an edge per distinct high-volume (customer, supplier) trading
    pair, both directions). Six synchronous rounds: contributions =
    rank/out-degree joined across edges, new rank = (1−d) + d·Σ.

    Determinism: per-node contribution sums fold a *sorted* list
    (see vector_centroid_per_label) so partial-merge order cannot
    perturb doubles; two runs produce identical bits (asserted).

    At 100 TB: the edge table is the only large operand — it is
    hash-partitioned by source once and every round reuses that
    exchange; node state is thousands× smaller and broadcastable.
    Checkpoint to reliable storage on a real cluster."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pairs = (
        li.filter(F.col("l_quantity") >= 40)  # high-volume trades only
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionByName(
            pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
        )
        .localCheckpoint()
    )
    # out-degree is a static per-source property: bake it into the edge
    # table once so each round joins edges against node state exactly
    # once (two joins/round → one, and the degree aggregation never
    # re-runs) — at scale this halves the per-iteration shuffle work
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    sorted_sum = F.aggregate(
        F.array_sort(F.collect_list("contrib")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # size each round's shuffle to the materialized edge list — the
    # per-round fixed cost (tasks, AQE planning, checkpoint) dominates
    # small rounds, while the sorted-fold aggregation is CPU-heavy
    # enough that ~20k edges per task keeps cores busy at this scale
    with loop_shuffle_partitions(spark, edges_w.count(), rows_per_partition=20_000):
        ranks = (
            edges.select("src").distinct().withColumn("rank", F.lit(1.0))
        ).localCheckpoint()
        for _ in range(PAGERANK_ITERS):
            contribs = edges_w.join(ranks, "src").select(
                "dst", (F.col("rank") / F.col("deg")).alias("contrib")
            )
            ranks = (
                contribs.groupBy(F.col("dst").alias("src"))
                .agg(((1 - DAMPING) + DAMPING * sorted_sum).alias("rank"))
                .localCheckpoint()
            )
    return ranks.select(F.col("src").alias("node"), "rank")
