"""Data-derived deletion distance for the deletion-neighborhood
candidate scheme: d must come from the corpus's max token-set size, in
exact rational arithmetic — a hardcoded d=1 silently loses qualifying
pairs once sets grow past 38 tokens at t=0.95."""

from __future__ import annotations

import pytest

from git_etl_spark.operators import dedup


def test_deletion_distance_exact_rational():
    # 31-token sets (the real corpus): one deletion per side suffices
    assert dedup._deletion_distance(31) == 1
    # 38/19 = 2 exactly; naive float math gives (1/0.95-1)*38 = 1.999…
    # which floors to 1 — the silent under-generation the rational form
    # exists to prevent
    assert dedup._deletion_distance(38) == 2
    assert dedup._deletion_distance(44) == 2
    assert dedup._deletion_distance(57) == 3


def test_deletion_keys_beyond_two_refuses():
    with pytest.raises(NotImplementedError):
        dedup._deletion_keys_expr(3)


def _write_corpus(spark, tmp_path, docs):
    df = spark.createDataFrame(
        [(i, t, "en", "srcX", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


@pytest.fixture()
def big_set_corpus(spark, tmp_path):
    """Docs 0/1 share 42 tokens; doc 1 has 2 extras → J = 42/44 ≈ 0.954
    ≥ 0.95, but the pair differs by TWO tokens on one side, so delete-one
    keys can never align the two sets."""
    common = [f"t{i:02d}" for i in range(42)]
    docs = [
        (0, " ".join(common)),
        (1, " ".join(common + ["xx", "yy"])),
        (2, " ".join(f"u{i:02d}" for i in range(40))),
        (3, " ".join(f"w{i:02d}" for i in range(41))),
    ]
    return _write_corpus(spark, tmp_path, docs)


def test_d1_provably_loses_pair_and_derived_d_recovers(spark, big_set_corpus):
    # forced d=1: the (0, 1) pair has no shared deletion-1 key → lost
    _, rep_pairs_d1 = dedup._rep_graph_impl(spark, big_set_corpus, deletion_d=1)
    assert rep_pairs_d1.count() == 0

    # derived d: max set size 44 → d=2 → the delete-two key of doc 1
    # equals the full key of doc 0
    _, rep_pairs = dedup._rep_graph_impl(spark, big_set_corpus)
    got = [(r["jaccard"],) for r in rep_pairs.collect()]
    assert len(got) == 1
    assert got[0][0] == pytest.approx(42 / 44)

    # end-to-end through the registered pair listing
    pairs = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup._jaccard_pairs_impl(spark, big_set_corpus).collect()
    )
    assert [(a, b) for a, b, _ in pairs] == [(0, 1)]


def test_incremental_index_derives_d(spark, big_set_corpus):
    """The incremental delta-vs-index join sizes its key family from the
    same corpus statistic: doc 0 (the % 17 == 0 delta) must match doc 1
    in the archive despite the two-token difference."""
    got = sorted(
        (r["doc_a"], r["doc_b"], r["pair_type"])
        for r in dedup.dedup_incremental_index_join(
            spark, big_set_corpus
        ).collect()
    )
    assert got == [(0, 1, "new-old")]


def test_real_corpus_unchanged_at_d1(spark):
    """On the shipped corpus (max set 31 → derived d=1) the derived
    scheme must produce exactly the d=1 candidate pairs."""
    from .conftest import SF_SMOKE

    _, derived = dedup._rep_graph_impl(spark, SF_SMOKE)
    _, forced = dedup._rep_graph_impl(spark, SF_SMOKE, deletion_d=1)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, forced.collect())
    )


def test_deletion_distance_bound_property():
    """Math property (hypothesis): for ANY pair of distinct token sets
    within the corpus max size whose Jaccard meets the threshold, the
    per-side difference never exceeds the derived deletion distance —
    i.e. the key family provably covers every qualifying pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        inter=st.integers(min_value=1, max_value=60),
        extra_a=st.integers(min_value=0, max_value=12),
        extra_b=st.integers(min_value=0, max_value=12),
    )
    def check(inter, extra_a, extra_b):
        size_a, size_b = inter + extra_a, inter + extra_b
        jac = inter / (inter + extra_a + extra_b)
        if jac < dedup.JACCARD_THRESHOLD:
            return
        d = dedup._deletion_distance(max(size_a, size_b))
        assert extra_a <= d and extra_b <= d, (
            f"pair with J={jac:.4f} needs per-side deletions "
            f"({extra_a}, {extra_b}) but derived d={d}"
        )

    check()
