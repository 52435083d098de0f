"""End-to-end planted-contamination fixture for benchmark
decontamination: a known eval 8-gram inserted verbatim into one
training document must be flagged with the exact shared-shingle count
and ratio; clean documents must not appear."""

from __future__ import annotations

import pytest

from git_etl_spark.operators.curation import pipeline_decontamination

EVAL_PHRASE = "alpha bravo charlie delta echo foxtrot golf hotel"


@pytest.fixture()
def planted(spark, tmp_path):
    filler_pre = " ".join(f"pre{i:02d}" for i in range(10))
    filler_post = " ".join(f"post{i:02d}" for i in range(10))
    clean = " ".join(f"clean{i:02d}" for i in range(20))
    docs = [
        # the eval set (source src0 by the query's convention)
        (0, EVAL_PHRASE, "en", "src0", len(EVAL_PHRASE)),
        # contaminated: quotes the eval phrase inside unrelated text —
        # 28 tokens → 21 distinct 8-gram shingles, exactly one shared
        (1, f"{filler_pre} {EVAL_PHRASE} {filler_post}", "en", "src1", 0),
        # quotes it twice: still ONE distinct shared shingle
        (
            2,
            f"{EVAL_PHRASE} {filler_pre} {EVAL_PHRASE}",
            "en",
            "src2",
            0,
        ),
        # clean: no overlap, must be absent from the output
        (3, clean, "en", "src1", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_planted_eval_ngram_is_flagged(spark, planted):
    got = {
        r["doc_id"]: (r["n_shared"], r["n_shingles"], r["contamination"])
        for r in pipeline_decontamination(spark, planted).collect()
    }
    # doc 1: 28 tokens → 21 shingles, 1 shared
    # doc 2: 8 + 10 + 8 = 26 tokens → 19 windows, 18 distinct (the
    #   duplicated eval phrase collapses), 1 shared
    assert set(got) == {1, 2}
    assert got[1][0] == 1 and got[1][1] == 21
    assert got[1][2] == pytest.approx(1 / 21)
    assert got[2][0] == 1 and got[2][1] == 18
    assert got[2][2] == pytest.approx(1 / 18)


def test_bloom_variant_equals_broadcast_variant(spark, planted):
    """The relational-Bloom pre-probe is lossless: identical output to
    the broadcast variant on the planted corpus (false positives are
    removed by the exact join; false negatives are structurally
    impossible)."""
    from git_etl_spark.operators.curation import pipeline_decontamination_bloom

    plain = sorted(map(tuple, pipeline_decontamination(spark, planted).collect()))
    bloom = sorted(
        map(tuple, pipeline_decontamination_bloom(spark, planted).collect())
    )
    assert bloom == plain


def test_bloom_variant_equals_broadcast_variant_real_corpus(spark):
    from git_etl_spark.operators.curation import (
        pipeline_decontamination,
        pipeline_decontamination_bloom,
    )

    sf = "/root/testdata/sf0.001"
    plain = sorted(map(tuple, pipeline_decontamination(spark, sf).collect()))
    bloom = sorted(map(tuple, pipeline_decontamination_bloom(spark, sf).collect()))
    assert bloom == plain and len(plain) > 0
