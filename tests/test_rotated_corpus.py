"""Standing rotated-corpus robustness gate.

The r11 cores screen's full-registry smoke on a rotated 10x corpus
caught the round's only outright correctness bug:
pipeline_mixture_sampling derived a synthetic weight by ANSI-casting
digits it assumed would exist in the ``source`` id — any real-corpus
source vocabulary would have crashed it (PERFORMANCE.md round 11).
That class — "hidden input-format assumption" — was only tested once
per screen; this file makes a cheap sf0.001 variant of the smoke run
on every pytest invocation.

The rotation (mirrors scripts/build_scale_corpus.py, collapsed to one
copy at sf0.001):

- documents: doc_id shifted, text rotated with a length-preserving
  ``translate`` (keeps n_chars consistent), ``source`` rewritten to a
  DIGIT-FREE vocabulary with a punctuation prefix — the exact surface
  the mixture-sampling bug parsed,
- events: ids shifted via PYARROW so the ts column keeps the corpus's
  physical TIMESTAMP(NANOS) type (a DuckDB rewrite would change it —
  TESTDATA gotcha),
- orders/lineitem: orderkeys shifted together (FK preserved), dims
  untouched,
- embeddings: vec_ids shifted, vectors unchanged.

Values legitimately change under rotation, so this gate asserts
EXECUTION (no exception, a materialized count) — value parity stays
with the DuckDB oracle suite. The query list is one or two
robustness-sensitive representatives per family: queries that parse,
split, hash, cast, or regex over ids, sources, paths, JSON props, or
text — the surfaces a rotated vocabulary actually stresses.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

# ~2 s budget each at sf0.001; the whole gate must stay under a
# minute, so heavy iterative/streaming families send one delegate.
ROTATION_SENSITIVE = [
    # pipeline: the original catch, plus the two other source-parsers
    "pipeline_mixture_sampling",
    "pipeline_release_manifest",
    "pipeline_domain_cap",
    # dedup: source-split fingerprints, shingle hashing, group argmax
    "dedup_cross_source_duplicates",
    "dedup_minhash_lsh",
    "dedup_keep_longest_per_group",
    # text: regex tokenizers, PII patterns, lang heuristics
    "text_langid_heuristic",
    "text_token_bpe_regex",
    "text_pii_scrub",
    "text_fingerprint",
    # proj: JSON/variant parsing over events.props, string/path ops
    "proj_json_extract",
    "proj_variant_extract",
    "proj_string_ops",
    "proj_rename_path_rewrite",
    # events: sessionization + state-machine pattern matching on
    # shifted user/event ids
    "events_sessionize",
    "events_session_pattern_match",
    "events_markov_transitions",
    # agg: source/lang argmax + the decimal-cents weighted median
    "agg_argmax_source_per_lang",
    "agg_weighted_median_price",
    # join: as-of on shifted keys, blocked fuzzy string join
    "join_asof_nearest_click",
    "join_fuzzy_levenshtein_blocked",
    # hashing-based sampling and id-keyed stratification
    "sample_stratified_hash",
    # embeddings family delegate (shifted vec_ids through LSH buckets)
    "simsearch_lsh_bucketed",
    # iterative delegate (string node ids built from shifted keys)
    "graph_pagerank_ppm",
    # multimodal delegate (synthesizes binary payloads from documents)
    "multimodal_image_ahash",
    # format round-trip delegate (writes/reads rotated text as JSONL)
    "source_jsonl_malformed_quarantine",
    # streaming delegate (replay source written from rotated events)
    "streaming_hourly_agg_replay",
    # chunker UDTF over rotated text
    "udtf_doc_chunks",
]


@pytest.fixture(scope="module")
def rotated_sf_dir(tmp_path_factory):
    # builder extracted to tests/rotated_corpus.py (r15) so the
    # full-registry closing sweeps build the IDENTICAL corpus
    from .rotated_corpus import build_rotated_corpus

    out = tmp_path_factory.mktemp("rotated-sf0.001")
    return build_rotated_corpus(SF_SMOKE, str(out))


@pytest.mark.parametrize("name", ROTATION_SENSITIVE)
def test_runs_on_rotated_corpus(spark, rotated_sf_dir, name):
    from git_etl_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, rotated_sf_dir)
    # materialize fully — the mixture-sampling crash only fired at
    # execution, not at plan time
    assert df.count() >= 0


def test_rotated_events_keep_physical_ts_type(rotated_sf_dir):
    """The pyarrow copy must preserve the ts column's physical type:
    load_table's nanosAsLong path (and the ns->us truncation) only
    engages for the type the driver corpus actually has."""
    import pyarrow.parquet as pq

    orig = pq.read_schema(f"{SF_SMOKE}/events.parquet")
    rot = pq.read_schema(f"{rotated_sf_dir}/events.parquet")
    assert rot.field("ts").type == orig.field("ts").type
