"""The blocked (hyperplane-LSH) edge source for semantic dedup, held to
the exact all-pairs tier as its recall oracle on a planted near-dup
corpus — plus the threshold routing in semantic_clusters."""

from __future__ import annotations

import numpy as np
import pytest

from git_etl_spark.operators import dedup

THRESHOLD = 0.9
N_CLUSTERS = 40
CLUSTER_SIZE = 3
N_SINGLETONS = 80
DIM = 64


@pytest.fixture(scope="module")
def planted_corpus(spark, tmp_path_factory):
    """40 clusters of 3 near-identical vectors (pair cos ≈ 0.96) in a
    sea of 80 random singletons (cross cos concentrates near 0) — the
    shape real semantic dedup runs at: sparse high-cos structure where
    blocking must pay off."""
    rng = np.random.default_rng(20260813)
    vecs = []
    for _ in range(N_CLUSTERS):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for _ in range(CLUSTER_SIZE):
            vecs.append(base + 0.025 * rng.standard_normal(DIM))
    for _ in range(N_SINGLETONS):
        vecs.append(rng.standard_normal(DIM))
    arr = np.array(vecs, dtype=np.float32)

    # sanity on the plant: within-cluster pairs comfortably above the
    # threshold, cross pairs comfortably below (margin for LSH tests)
    unit = arr.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    cos = unit @ unit.T
    planted = [
        (c * CLUSTER_SIZE + i, c * CLUSTER_SIZE + j)
        for c in range(N_CLUSTERS)
        for i in range(CLUSTER_SIZE)
        for j in range(i + 1, CLUSTER_SIZE)
    ]
    assert min(cos[a, b] for a, b in planted) > 0.93
    mask = np.triu(np.ones_like(cos, dtype=bool), 1)
    for a, b in planted:
        mask[a, b] = False
    assert cos[mask].max() < 0.8

    tmp = tmp_path_factory.mktemp("planted")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(arr)],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_lsh_plan_tables_grow_as_threshold_drops():
    _, t95 = dedup.lsh_plan(0.95)
    _, t90 = dedup.lsh_plan(0.90)
    _, t80 = dedup.lsh_plan(0.80)
    assert t95 < t90 < t80
    # below the routing floor the honest table count explodes — the
    # quantitative reason semantic_clusters refuses to block there
    _, t35 = dedup.lsh_plan(0.35)
    assert t35 > 200


def test_blocked_tier_full_recall_vs_exact_oracle(spark, planted_corpus):
    """Every exact pair at cos ≥ 0.9 must surface through the bucket
    join, with bitwise-identical verified cos values (same addition
    order as the exact tier)."""
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup._exact_cosine_pairs(
            spark, planted_corpus, THRESHOLD
        ).collect()
    }
    blocked = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in dedup.blocked_cosine_pairs(
            spark, planted_corpus, THRESHOLD
        ).collect()
    }
    assert len(exact) == N_CLUSTERS * 3  # the plant, nothing else
    assert blocked == exact  # precision is structural; recall is tested


def test_blocked_candidates_prune_quadratic_space(spark, planted_corpus):
    """The point of blocking: bucket co-occupancy must admit a small
    fraction of the n(n-1)/2 pair space while the recall test above
    holds."""
    n = N_CLUSTERS * CLUSTER_SIZE + N_SINGLETONS
    total_pairs = n * (n - 1) // 2
    unit = dedup._unit_cols(spark, planted_corpus)
    n_cand = dedup._blocked_candidates(spark, unit, THRESHOLD).count()
    assert n_cand < 0.3 * total_pairs


def test_semantic_clusters_blocked_equals_exact(spark, planted_corpus):
    """Tier-agnostic clustering: blocked and exact edge sources yield
    identical (vec_id, cluster_id, is_representative) rows, and `auto`
    routes ≥ 0.7 thresholds to the blocked tier."""
    exact = sorted(
        map(
            tuple,
            dedup.semantic_clusters(
                spark, planted_corpus, THRESHOLD, edge_source="exact"
            ).collect(),
        )
    )
    blocked = sorted(
        map(
            tuple,
            dedup.semantic_clusters(
                spark, planted_corpus, THRESHOLD, edge_source="blocked"
            ).collect(),
        )
    )
    auto = sorted(
        map(
            tuple,
            dedup.semantic_clusters(spark, planted_corpus, THRESHOLD).collect(),
        )
    )
    assert blocked == exact == auto
    # every planted triple is one cluster keyed by its min vec_id
    clusters = {}
    for vec_id, cluster_id, _is_rep in exact:
        clusters.setdefault(cluster_id, set()).add(vec_id)
    assert clusters == {
        c * CLUSTER_SIZE: {c * CLUSTER_SIZE + i for i in range(CLUSTER_SIZE)}
        for c in range(N_CLUSTERS)
    }


def test_lsh_plan_meets_target_recall_property():
    """Math property (hypothesis): the table count returned by lsh_plan
    achieves at least the target recall for an exactly-at-threshold
    pair under the hyperplane collision model, without overshooting by
    more than one table."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        threshold=st.floats(min_value=0.5, max_value=0.99),
        target=st.floats(min_value=0.9, max_value=0.9999),
    )
    def check(threshold, target):
        bits, n_tables = dedup.lsh_plan(threshold, target)
        p = 1.0 - math.acos(threshold) / math.pi
        recall = 1.0 - (1.0 - p**bits) ** n_tables
        assert recall >= target - 1e-12
        if n_tables > 1:
            recall_minus_one = 1.0 - (1.0 - p**bits) ** (n_tables - 1)
            assert recall_minus_one < target

    check()
