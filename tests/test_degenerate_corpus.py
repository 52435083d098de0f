"""Standing degenerate-corpus robustness gate: empty, single-row, and
null-heavy.

At 100 TB the engine constantly meets degenerate slices — a fresh date
partition with zero rows, a filter that matches nothing, a tenant with
one document. The r12 survey ran all 246 registry queries against an
EMPTY corpus and a SINGLE-ROW corpus (same schemas, same physical
parquet types) and found five crashes, all real production defect
classes:

- ``embedding_pca_{loading_ppm,top_component}``: driver eigensolve
  indexed into an empty moment pass,
- ``simsearch_ann_ml_lsh``: ``pyspark.ml`` LSH ``.fit`` dies on an
  empty corpus while inferring the vector dimension,
- ``source_partitioned_pruned_read``: an empty partitioned estate has
  no files to infer a schema from (UNABLE_TO_INFER_SCHEMA),
- ``agg_price_histogram``: ANSI DIVIDE_BY_ZERO when the data-driven
  range collapses (hi == lo at one distinct price).

All five are fixed (graceful empty results / explicit reader schema /
a range-collapse guard that both engines compute identically). This
gate keeps the class closed: each family sends its most
degenerate-sensitive delegates — queries with driver-side solves,
divisions by data-derived totals, ``.fit``/index training, argmax
over possibly-empty sets, or schema inference — and every delegate
must EXECUTE (materialize a count) on both corpora. Values are
oracle-checked elsewhere; execution is the contract here.

Corpora are built per test session by slicing sf0.001 through pyarrow
(``slice(0, n)``), which preserves every physical type including the
events TIMESTAMP(NANOS) column (TESTDATA gotcha). The single-row
corpus deliberately breaks FK joint-ness (lineitem's one orderkey need
not match orders' one orderkey) — empty join results must flow, not
crash.
"""

from __future__ import annotations

import glob
import os

import pytest

from .conftest import SF_SMOKE

# driver-solve / division / fit / inference-sensitive delegates, one
# or two per family (~1-2 s each; whole gate budget < 60 s)
DEGENERATE_SENSITIVE = [
    # the five r12 catches
    "embedding_pca_loading_ppm",
    "embedding_pca_top_component",
    "simsearch_ann_ml_lsh",
    "source_partitioned_pruned_read",
    "agg_price_histogram",
    # driver-side argmax / fixpoint loops over possibly-empty state
    "text_bpe_merges",
    "graph_pagerank_ppm",
    "dedup_cluster_components",
    # index training on empty corpora
    "simsearch_ivf",
    "simsearch_pq_adc",
    # data-derived totals and weights in denominators
    "pipeline_mixture_sampling",
    "quality_chi2_independence",
    "agg_weighted_median_price",
    # streaming replay of an empty/one-event source
    "streaming_hourly_agg_replay",
    # flagship multiway join (empty dims × empty facts)
    "join_multiway_regional_revenue",
]

VARIANTS = ("empty", "one")

# The third degenerate axis: every string/binary/list column NULL
# (failed fetches, tombstoned documents, embedding backfill gaps).
# The r12 null-heavy survey over all 246 queries found 9 crashes —
# the six payload-synthesizing media pipelines (null text → null
# payload → decoder TypeError), the ml-LSH vector UDF, and the
# chunking UDTF. All fixed with a drop-null-content semantic mirrored
# in their oracles; these delegates keep the class closed, plus a few
# parse/regex-heavy survivors whose null tolerance is load-bearing.
NULL_SENSITIVE = [
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "multimodal_image_ahash",
    "multimodal_ahash_dup_candidates",
    "multimodal_jpeg_features",
    "multimodal_gif_features",
    "simsearch_ann_ml_lsh",
    "udtf_doc_chunks",
    "embedding_pca_loading_ppm",
    "text_repetition_metrics",
    "dedup_minhash_lsh",
]


# row identity survives nullheavy: primary/composite-key columns stay
# intact so the corpus stresses NULL *values* and NULL *foreign/metric*
# keys, not row-identity garbage-in
_PK_COLS = {
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey",
    "p_partkey", "o_orderkey", "l_orderkey", "l_linenumber",
    "event_id", "doc_id",
}


def build_nullheavy_corpus(
    src: str, dest: str, null_strings: bool = True
) -> None:
    """Null-shape corpus family, shared by the standing gate fixture
    and the full-registry sweep scripts so both see the same corpora.

    ``null_strings=True`` → the "nullheavy" variant: all string/
    binary/list columns NULL, plus the numeric and temporal bands.
    ``null_strings=False`` → the "nullband" variant (r15): strings
    INTACT, only the bands nulled — load-bearing because total string
    nulling MASKS sequence-logic divergences (with every event_type
    NULL, a Markov matrix collapses to one row no matter how the
    engines order NULL timestamps; the r15 sweep found 8 such masked
    classes the moment strings were restored)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    for path in glob.glob(os.path.join(src, "*.parquet")):
        t = pq.read_table(path)
        n = len(t)
        # r14 ADVICE: the original builder nulled only string/binary/
        # list columns, so NULL user_id / NULL value shapes were never
        # gate-covered despite queries claiming NULL-key safety. Band-
        # null (every 3rd row) the non-key numeric columns: total
        # nulling would erase every group/join key, a band keeps the
        # queries meaningful while forcing the NULL arm of each
        # aggregate/join through both engines. Temporal columns (ts,
        # order/ship/receipt dates) get their own band on a DIFFERENT
        # stride (every 5th row) so all four combinations of
        # (value NULL?, time NULL?) occur — a crawl feed's failed
        # fetches lose payloads and timestamps independently.
        band = pa.array([i % 3 == 2 for i in range(n)])
        ts_band = pa.array([i % 5 == 3 for i in range(n)])
        cols = []
        for field in t.schema:
            if null_strings and (
                pa.types.is_string(field.type)
                or pa.types.is_large_string(field.type)
                or pa.types.is_binary(field.type)
                or pa.types.is_list(field.type)
                or pa.types.is_large_list(field.type)
            ):
                cols.append(pa.nulls(n, field.type))
            elif (
                pa.types.is_integer(field.type)
                or pa.types.is_floating(field.type)
                or pa.types.is_decimal(field.type)
            ) and field.name not in _PK_COLS:
                cols.append(
                    pc.if_else(
                        band,
                        pa.nulls(n, field.type),
                        t.column(field.name).combine_chunks(),
                    )
                )
            elif pa.types.is_temporal(field.type):
                cols.append(
                    pc.if_else(
                        ts_band,
                        pa.nulls(n, field.type),
                        t.column(field.name).combine_chunks(),
                    )
                )
            else:
                cols.append(t.column(field.name).combine_chunks())
        pq.write_table(
            pa.table(cols, schema=t.schema),
            os.path.join(dest, os.path.basename(path)),
        )


@pytest.fixture(scope="session")
def degenerate_dirs(tmp_path_factory):
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("degenerate")
    dirs = {}
    for variant, nrows in (("empty", 0), ("one", 1)):
        out = root / variant
        out.mkdir()
        for path in glob.glob(os.path.join(SF_SMOKE, "*.parquet")):
            t = pq.read_table(path)
            pq.write_table(
                t.slice(0, nrows), str(out / os.path.basename(path))
            )
        dirs[variant] = str(out)
    out = root / "nullheavy"
    build_nullheavy_corpus(SF_SMOKE, str(out))
    dirs["nullheavy"] = str(out)
    out = root / "nullband"
    build_nullheavy_corpus(SF_SMOKE, str(out), null_strings=False)
    dirs["nullband"] = str(out)
    return dirs


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("name", DEGENERATE_SENSITIVE)
def test_degenerate_corpus_executes(spark, degenerate_dirs, variant, name):
    from git_etl_spark import registry

    registry.load_all()
    n = registry.QUERIES[name](spark, degenerate_dirs[variant]).count()
    assert n >= 0


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_nullheavy_corpus_executes(spark, degenerate_dirs, name):
    from git_etl_spark import registry

    registry.load_all()
    n = registry.QUERIES[name](spark, degenerate_dirs["nullheavy"]).count()
    assert n >= 0


def test_pca_oracle_parity_on_empty_and_zero_vectors(
    spark, degenerate_dirs, tmp_path
):
    """The r12 review found two cross-engine divergences in the
    hash-oracled PCA solve on degenerate inputs: (a) on an EMPTY
    corpus the oracle's ungrouped list() emitted one NULL matrix and
    64 NULL rows while Spark returned 0; (b) on a ZERO-COVARIANCE
    corpus (every embedding identical — here all-zero) DuckDB's x/0 ->
    NULL poisoned the recursion while Spark's fixed-point break kept
    numeric values. Both sides now share the guards (WHERE EXISTS /
    nrm=0 CASE / trace=0 CASE); this is the full differential compare
    on exactly those corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .oracle_utils import compare_query

    compare_query(spark, "embedding_pca_loading_ppm", degenerate_dirs["empty"])

    zero = tmp_path / "zerovec"
    zero.mkdir()
    for path in glob.glob(os.path.join(SF_SMOKE, "*.parquet")):
        t = pq.read_table(path)
        if os.path.basename(path) == "embeddings.parquet":
            emb_type = t.schema.field("embedding").type
            dim = len(t.column("embedding")[0].as_py())
            zeros = pa.array(
                [[0.0] * dim] * len(t), type=emb_type
            )
            t = t.set_column(
                t.schema.get_field_index("embedding"), "embedding", zeros
            )
        pq.write_table(t, str(zero / os.path.basename(path)))
    compare_query(spark, "embedding_pca_loading_ppm", str(zero))


# r14 full-oracle sweeps over these same corpora (the temporal-axis
# lesson applied retroactively: execute-only surveys miss VALUE
# defects — count() even PRUNES a crashing projection) found and
# fixed eight cross-engine divergence classes. One hash-checked
# delegate per fixed class keeps each closed:
#   empty     — grouping-sets grand-total-row mirror (n <> 0),
#               skew report's no-keys-no-report filter
#   one       — NULLIF-guarded zero-variance stats (corr/OLS/kappa)
#   nullheavy — null-total validator rules, NULL-key-safe salted
#               merge join, tombstone-proof dedup token sets +
#               fingerprints, nullable-Int64 pandas UDF, total
#               JSONL corruption rule, null-uniform simsearch,
#               no-minted-'' string agg, drop-null-content audio
DEGENERATE_ORACLED = {
    "empty": [
        "rollup_orders_year_status",
        "cube_events_type_day",
        "groupingsets_lineitem",
        "quality_skew_report",
    ],
    "one": [
        "agg_corr_price_quantity",
        "agg_group_ols_trend",
        "quality_cohen_kappa",
    ],
    "nullheavy": [
        "filter_validation_quarantine",
        "agg_salted_two_phase",
        "dedup_jaccard_pairs",
        "text_fingerprint",
        "udf_pandas_token_count",
        "source_jsonl_malformed_quarantine",
        "simsearch_topk_bruteforce",
        "agg_string_concat_sorted",
        "multimodal_audio_silence_segments",
        # r15 numeric-band extension (ADVICE r14): NULL user_id/value/
        # price/quantity/FK shapes. Nine fixed classes, one delegate
        # each: unpinned window-ORDER-BY null ends (Spark NULLS FIRST
        # vs DuckDB NULLS LAST), mirrored incomparable-row quarantines
        # (unknown spend / price / user / edge endpoint / dimension /
        # supplier), pandas cumsum NaN crash + nullable-Float64
        # leading-NULL semantics.
        "window_ntile_quartiles",
        "window_distribution_functions",
        "agg_gini_concentration",
        "agg_weighted_median_price",
        "events_gapfill_locf",
        "graph_pagerank_ppm",
        "relational_skyline_2d",
        "tpch_q21_waiting_suppliers",
        "udf_grouped_running_value",
    ],
    # r15 temporal-band + strings-intact waves: twenty fixed classes.
    # The ts-ordered families split two ways, each mirrored in both
    # engines — QUARANTINE where NULL time makes the row meaningless
    # to the operator (sessions, hourly/daily/monthly buckets, OHLC
    # candles, SCD2 intervals, Markov/trigram sequences, KS samples),
    # PINNED NULLS LAST/FIRST where the operator is a row-preserving
    # projection (running totals, lag/lead, first/last, as-of LOCF,
    # dedup-earliest, RFM tiles). NULL-user rows additionally
    # quarantined where an equi-join oracle and a window-partition
    # plan disagree on NULL keys (gapfill precedent).
    "nullband": [
        "events_sessionize",
        "events_max_concurrency",
        "events_session_pattern_match",
        "events_hourly_anomaly",
        "events_ewma_halving",
        "events_cusum_uniformity_drift",
        "events_dedup_earliest",
        "events_hourly_ohlc",
        "events_markov_transitions",
        "events_path_trigrams_top10",
        "events_rfm_segmentation",
        "agg_monthly_growth",
        "window_running_total",
        "window_lag_lead_events",
        "window_first_last_values",
        "join_asof_last_signup",
        "join_scd2_point_in_time",
        "scd2_purchase_tier_history",
        "quality_drift_ks",
        "streaming_hourly_agg_replay",
    ],
}


@pytest.mark.parametrize(
    "variant,name",
    [(v, n) for v, names in DEGENERATE_ORACLED.items() for n in names],
)
def test_degenerate_corpus_oracle_parity(spark, degenerate_dirs, variant, name):
    from .oracle_utils import compare_query

    compare_query(spark, name, degenerate_dirs[variant])
