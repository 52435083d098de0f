"""r15 optimization gates for the PCA kernel (_pca_power_solve).

Two internals changed for speed and each needs its own equivalence
proof (the optimization round's rule: results must not move by a bit):

1. the second-moment pass now expands each vector's upper-triangle
   cell products with a per-row SQL lambda instead of the r14
   posexplode + vec_id self-join — same term set, order-independent
   DECIMAL sums, so every solve output must be IDENTICAL to the old
   formulation, which this file keeps inline as the reference;
2. the 500-round power iteration runs on numpy, restricted to forms
   whose float semantics are bit-identical to the sequential Python
   fold the DuckDB ppm oracle mirrors: elementwise multiply/divide
   (correctly-rounded IEEE ops in either runtime) and
   ``np.cumsum(...)[-1]`` as the left-to-right fold.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from git_etl_spark.functions.vector import py_dec14, sum14
from git_etl_spark.io import load_table
from git_etl_spark.operators.similarity import PCA_ITERS, _pca_power_solve


def test_pca_numpy_fold_bit_identical():
    """np.cumsum matvec/norm folds == the pure-Python sequential loop,
    bit for bit, across 500 rounds on a hostile magnitude spread."""
    import numpy as np

    rng = random.Random(42)
    d = 64
    C = [
        [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 2) for _ in range(d)]
        for _ in range(d)
    ]
    for i in range(d):
        for j in range(i, d):
            C[j][i] = C[i][j]
    Ca = np.array(C, dtype=np.float64)
    vp = [1.0 if i == 0 else 0.0 for i in range(d)]
    vn = np.array(vp, dtype=np.float64)
    for _ in range(PCA_ITERS):
        # reference: the sequential fold the DuckDB oracle reproduces
        w = [sum(Ca[i][j] * vp[j] for j in range(d)) for i in range(d)]
        norm = math.sqrt(sum(x * x for x in w))
        vp = [x / norm for x in w]
        # optimized form (similarity._pca_power_solve)
        wn = np.cumsum(Ca * vn, axis=1)[:, -1]
        nn = math.sqrt(np.cumsum(wn * wn)[-1])
        vn = wn / nn
        assert nn == norm
        assert vn.tolist() == vp


def _reference_solve(spark, sf_dir):
    """The r14 formulation, verbatim: posexplode to element rows,
    repartition by vec_id, self-join for the upper-half products,
    pure-Python power iteration."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "raw"))
        .select("vec_id", "pos", F.col("raw").cast("double").alias("val"))
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
    )
    means_rows = (
        elems.groupBy("pos")
        .agg(sum14(F.col("val")).alias("s14"), F.count("*").alias("n"))
        .collect()
    )
    d = len(means_rows)
    if d == 0:
        return 0, 0, [], [], 0.0, 0.0
    n = means_rows[0]["n"]
    mu = [0.0] * d
    for r in means_rows:
        mu[r["pos"]] = py_dec14(r["s14"]) / float(r["n"])
    pairs = (
        elems.alias("a")
        .join(elems.alias("b"), on="vec_id")
        .filter(F.col("b.pos") >= F.col("a.pos"))
        .select(
            F.col("a.pos").alias("i"),
            F.col("b.pos").alias("j"),
            (F.col("a.val") * F.col("b.val")).alias("xx"),
        )
    )
    cells = (
        pairs.groupBy("i", "j").agg(sum14(F.col("xx")).alias("s14")).collect()
    )
    S = [[0.0] * d for _ in range(d)]
    for r in cells:
        S[r["i"]][r["j"]] = py_dec14(r["s14"])
        S[r["j"]][r["i"]] = S[r["i"]][r["j"]]
    C = [[S[i][j] / n - mu[i] * mu[j] for j in range(d)] for i in range(d)]
    v = [1.0 if i == 0 else 0.0 for i in range(d)]
    lam = 0.0
    for _ in range(PCA_ITERS):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        norm = math.sqrt(sum(x * x for x in w))
        if norm == 0.0:
            lam = 0.0
            break
        v = [x / norm for x in w]
        lam = norm
    trace = sum(C[i][i] for i in range(d))
    return d, n, mu, v, lam, trace


def test_pca_solve_matches_r14_reference(spark):
    """Full solve outputs (d, n, mu, v, lam, trace) identical to the
    r14 join-based reference on the committed smoke corpus."""
    sf_dir = "/root/testdata/sf0.001"
    ref = _reference_solve(spark, sf_dir)
    got = _pca_power_solve(spark, sf_dir)
    assert got[0] == ref[0] and got[1] == ref[1]
    assert got[2] == ref[2]  # mu, exact
    assert got[3] == ref[3]  # v, exact
    assert got[4] == ref[4] and got[5] == ref[5]
