"""r16 Large-Star/Small-Star restructure: old ≡ new, and the plan gate.

The r16 optimization re-keys each star phase with ONE explicit
hash-repartition that the phase's dedup, min-aggregation, and equi-join
all reuse (guide §2.4), removes the Small-Star orientation projection
(provably an identity: w = min(N(a) ∪ {a}) ≤ a < b = u on every ls
row), and sizes the lazy final-labels tail with the loop's
volume-derived partition count instead of the session default.

The r15 formulation is kept VERBATIM below as the reference
(the equivalence-proof pattern of tests/test_pca_moment_pass.py):
label sets must match exactly on random graphs, adversarial shapes,
and the two real registry edge sets (Jaccard pair graph, SimHash pair
graph) at the correctness scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_CORRECTNESS, SF_SMOKE


def _large_star_small_star_r15(spark, edges):
    """The pre-r16 formulation, verbatim (operators/graph.py @ r15 tag),
    minus docstrings/comments."""
    from git_etl_spark.operators.graph import ConvergenceError
    from git_etl_spark.session import iter_checkpoint, loop_shuffle_partitions

    edges0 = edges.localCheckpoint()
    verts = (
        edges0.select(F.col("a").alias("v"))
        .unionByName(edges0.select(F.col("b").alias("v")))
        .distinct()
    )
    cur = edges0.filter(F.col("a") != F.col("b"))
    prev_sig = None
    n_edges = cur.count()
    converged = n_edges == 0
    with loop_shuffle_partitions(spark, n_edges, rows_per_partition=100_000):
        for _ in range(30):
            if converged:
                break
            sym = cur.unionByName(
                cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).dropDuplicates(["a", "b"])
            mins = sym.groupBy("a").agg(
                F.least(F.min("b"), F.first("a")).alias("m")
            )
            ls = (
                sym.join(mins, "a")
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("u"), F.col("m").alias("w"))
                .filter(F.col("u") != F.col("w"))
                .dropDuplicates(["u", "w"])
            )
            d = ls.select(
                F.greatest("u", "w").alias("u"), F.least("u", "w").alias("w")
            )
            mins_s = d.groupBy("u").agg(F.min("w").alias("mn"))
            ss = (
                d.join(mins_s, "u")
                .select(F.col("w").alias("a"), F.col("mn").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .unionByName(
                    mins_s.select(F.col("u").alias("a"), F.col("mn").alias("b"))
                )
                .dropDuplicates(["a", "b"])
            )
            ss = iter_checkpoint(ss, eager=False)
            sig_row = ss.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(a, b))").alias("h"),
            ).collect()[0]
            sig = (sig_row["n"], sig_row["h"])
            cur = ss
            if sig == prev_sig:
                converged = True
            prev_sig = sig
    if not converged:
        raise ConvergenceError("r15 reference: no fixpoint within 30 rounds")
    return (
        verts.join(
            cur.select(F.col("a").alias("v"), F.col("b").alias("lbl")),
            "v",
            "left",
        )
        .groupBy("v")
        .agg(F.coalesce(F.min("lbl"), F.first("v")).alias("lbl"))
    )


def _labels(df):
    return sorted((r["v"], r["lbl"]) for r in df.collect())


def _assert_old_eq_new(spark, edges) -> None:
    from git_etl_spark.operators.graph import large_star_small_star

    assert _labels(large_star_small_star(spark, edges)) == _labels(
        _large_star_small_star_r15(spark, edges)
    )


def test_lss_old_eq_new_random_and_adversarial(spark):
    """Old ≡ new on seeded random graphs plus the adversarial shapes:
    a deep path (multi-round convergence), a star, disjoint cliques,
    and a graph whose labels need the left-join NULL branch exercised
    (isolated self-loop vertices dropped by the a != b filter never
    reach the loop, but their vertices still need labels)."""
    import random

    rng = random.Random(98_716)
    cases = []
    for n, m in [(12, 9), (40, 30), (60, 100), (25, 12)]:
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        es = [(a, b) for a, b in es if a != b]
        if es:
            cases.append(es)
    cases.append([(i, i + 1) for i in range(25)])  # deep path
    cases.append([(0, i) for i in range(1, 15)])  # star
    cases.append(
        [(a, b) for base in (0, 100) for a in range(base, base + 5)
         for b in range(a + 1, base + 5)]
    )  # two cliques
    cases.append([(7, 7), (3, 9), (9, 3), (5, 5), (1, 2)])  # self-loops + dup
    for i, es in enumerate(cases):
        df = spark.createDataFrame(es, "a long, b long")
        try:
            _assert_old_eq_new(spark, df)
        except AssertionError as ex:  # pragma: no cover - diagnostics
            raise AssertionError(f"case {i}: {ex}") from ex


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECTNESS])
def test_lss_old_eq_new_registry_edge_sets(spark, sf):
    """Old ≡ new on the two real consumers' edge sets: the exact
    token-set Jaccard pair graph (graph_components_large_star) and the
    banded SimHash Hamming pair graph (dedup_simhash_clusters)."""
    from git_etl_spark.operators.dedup import (
        dedup_jaccard_pairs,
        dedup_simhash_hamming_pairs,
    )

    jac = dedup_jaccard_pairs(spark, sf).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    sim = dedup_simhash_hamming_pairs(spark, sf).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    _assert_old_eq_new(spark, jac)
    _assert_old_eq_new(spark, sim)
