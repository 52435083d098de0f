"""Robustness of the iterative engines: convergence is asserted (never
silently truncated) and round materialization can be flipped to
reliable-storage checkpoints with one standard Spark knob."""

from __future__ import annotations

import pytest

from .conftest import SF_CORRECTNESS


def _path_graph(spark, n):
    """Path 0-1-...-n (diameter n), symmetrized, plus self-labels."""
    edges = [(i, i + 1) for i in range(n)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], ["a", "b"]
    ).localCheckpoint()
    nodes = spark.createDataFrame([(i, i) for i in range(n + 1)], ["v", "lbl"])
    return sym, nodes


def test_min_label_raises_beyond_diameter_bound(spark):
    """A component with diameter > MIN_LABEL_MAX_ROUNDS must raise
    ConvergenceError instead of returning unconverged labels: min-label
    propagation moves a label one hop per round, so a 30-edge path
    cannot stabilize within the 20-round bound."""
    from git_etl_spark.operators import dedup
    from git_etl_spark.operators.graph import ConvergenceError

    sym, nodes = _path_graph(spark, 30)
    with pytest.raises(ConvergenceError):
        dedup._min_label_components(spark, sym, nodes)


def test_min_label_converges_within_bound(spark):
    """The same shape under the bound converges to the path minimum."""
    from git_etl_spark.operators import dedup

    sym, nodes = _path_graph(spark, 15)
    labels = dedup._min_label_components(spark, sym, nodes)
    assert {tuple(r) for r in labels.collect()} == {(i, 0) for i in range(16)}


def test_large_star_handles_deep_path(spark):
    """Large-Star/Small-Star is diameter-independent: the 30-edge path
    that defeats min-label propagation converges to a single star."""
    from git_etl_spark.operators.graph import large_star_small_star

    edges = spark.createDataFrame([(i, i + 1) for i in range(30)], ["a", "b"])
    labels = large_star_small_star(spark, edges)
    assert {tuple(r) for r in labels.collect()} == {(i, 0) for i in range(31)}


def test_large_star_empty_graph_is_trivially_stable(spark):
    from git_etl_spark.operators.graph import large_star_small_star

    edges = spark.createDataFrame([], "a long, b long")
    assert large_star_small_star(spark, edges).count() == 0


def test_reliable_checkpoint_equals_local(spark, tmp_path):
    """One `setCheckpointDir` call flips every iterative operator from
    executor-local to reliable-storage round checkpoints (the cluster
    deployment mode, where localCheckpoint dies with an executor); the
    clustering output must be identical either way."""
    from git_etl_spark.operators import dedup

    baseline = sorted(
        map(tuple, dedup.dedup_cluster_components(spark, SF_CORRECTNESS).collect())
    )
    dedup._CLUSTER_MEMO.clear()
    dedup._REP_GRAPH_MEMO.clear()
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        assert spark.sparkContext.getCheckpointDir() is not None
        reliable = sorted(
            map(
                tuple,
                dedup.dedup_cluster_components(spark, SF_CORRECTNESS).collect(),
            )
        )
    finally:
        # reset to the local fast path and drop results produced under
        # the reliable engine so later tests rebuild their own memos
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
        dedup._CLUSTER_MEMO.clear()
        dedup._REP_GRAPH_MEMO.clear()
    assert spark.sparkContext.getCheckpointDir() is None
    assert reliable == baseline


def test_reliable_checkpoint_pagerank_bitwise_equal(spark, tmp_path):
    """PageRank under reliable checkpointing must be bit-identical to
    the localCheckpoint run (the sorted-fold determinism guarantee is
    engine-state-independent)."""
    from git_etl_spark.operators.graph import graph_pagerank_bipartite

    baseline = sorted(
        map(tuple, graph_pagerank_bipartite(spark, SF_CORRECTNESS).collect())
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "pr-ckpt"))
    try:
        reliable = sorted(
            map(
                tuple,
                graph_pagerank_bipartite(spark, SF_CORRECTNESS).collect(),
            )
        )
    finally:
        spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert reliable == baseline
