"""UDF surface — SURVEY.md §2.10 X11: the three Python escape hatches,
each demonstrated on a real operator *and* held to the DuckDB oracle
where the computation is engine-independent.

Hierarchy (fastest first — and the order to try when building ops):

1. built-in functions (everything else in operators/) — JVM, codegen;
2. ``pandas_udf`` — Arrow-batched columnar Python, ~10-100× faster
   than row UDFs; right for numpy/vectorizable logic;
3. ``applyInPandas`` (grouped map) — per-group pandas frames; right
   for per-entity model scoring / sequence logic;
4. row-at-a-time ``udf`` — last resort, kept here only as the
   comparison point (its oracle twin shows the same op as pure SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from ..io import load_table
from ..registry import query


@query(
    "udf_pandas_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def udf_pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``pandas_udf``: vectorized token counting over Arrow
    batches. Integer outputs are engine-exact, so this Python path is
    fully oracle-checked — proving the Arrow round-trip is lossless."""

    @F.pandas_udf(LongType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        # nullable Int64, not int64: NULL text yields NaN from
        # .str.len(), and astype("int64") CRASHES the whole batch on
        # it (r14 null-heavy full-oracle sweep; the r12 survey's
        # count() had pruned this projection). Arrow maps pandas NA ->
        # SQL NULL, matching the oracle's len(string_split(NULL)).
        return texts.str.split(" ").str.len().astype("Int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@query(
    "udf_grouped_running_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def udf_grouped_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-user running total via exact
    integer-cent cumsum (a raw float cumsum would NOT match: DuckDB
    window sums tree-aggregate, pandas folds sequentially — exact
    arithmetic sidesteps the order entirely, the same rule as
    functions/exact.py). The grouped-map shape is the custom-operator
    escape hatch (per-entity sequence features, session models) — one
    shuffle on the group key."""

    def running(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # SQL window-SUM null semantics, exactly (r15 numeric-band
        # null sweep; the plain astype("int64") crashed the batch on
        # the first NaN): a NULL value contributes nothing but the
        # running total carries forward, and rows BEFORE the first
        # non-null value are SQL NULL — nullable Float64 is
        # load-bearing, since plain float64's NaN crosses Arrow as
        # NaN, not NULL, and the oracle hash would diverge.
        vals = pdf["value"]
        cents = (vals * 100).round().fillna(0).astype("int64")
        seen = vals.notna().cumsum() > 0
        pdf["running_value"] = (
            (cents.cumsum() / 100.0).astype("Float64").where(seen)
        )
        return pdf[["event_id", "user_id", "running_value"]]

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    # explicit-N hash repartition on the group key: AQE's byte-based
    # coalescer folds the grouped-map shuffle to ~2 partitions on this
    # corpus (bytes are a poor proxy for Python-boundary cost — the
    # pandas workers then run nearly serial, measured 7.9 s of executor
    # time on 2 tasks). A user repartition with explicit N is exempt
    # from coalescing and satisfies applyInPandas's required
    # distribution, so no second exchange is inserted.
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    return ev.groupBy("user_id").applyInPandas(
        running, schema="event_id long, user_id long, running_value double"
    )


@query(
    "udf_python_rot13",
    oracle="""
    SELECT doc_id,
           translate(source,
                     'abcdefghijklmnopqrstuvwxyz0123456789',
                     'nopqrstuvwxyzabcdefghijklm0123456789') AS source_rot13
    FROM documents
    """,
)
def udf_python_rot13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python ``udf`` — the LAST-RESORT path, included as
    the measured comparison point: same op as a single built-in
    ``translate`` (the oracle), but each row crosses the JVM↔Python
    boundary individually. Never ship this shape on a 100 TB hot path."""
    import codecs

    @F.udf(StringType())
    def rot13(s: str) -> str:
        return codecs.encode(s, "rot13") if s is not None else None

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rot13("source").alias("source_rot13"))


def batch_partials(docs: DataFrame) -> DataFrame:
    """One row per Arrow batch of ``docs.doc_id``: (rows, min, max,
    sum). The raw per-batch view — batch boundaries depend on
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and partition
    layout, so this frame is NOT deterministic across runs; consumers
    either fold it (udf_mapinpandas_batch_stats) or assert shape
    invariants (the batch-shape pytest)."""

    def batch_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # an empty batch has no min/max to report
                continue
            yield pd.DataFrame(
                {
                    "batch_rows": [len(pdf)],
                    "min_doc_id": [int(pdf["doc_id"].min())],
                    "max_doc_id": [int(pdf["doc_id"].max())],
                    "sum_doc_id": [int(pdf["doc_id"].sum())],
                }
            )

    return docs.mapInPandas(
        batch_stats,
        schema=(
            "batch_rows long, min_doc_id long, max_doc_id long, sum_doc_id long"
        ),
    )


@query(
    "udf_mapinpandas_batch_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents
    """,
)
def udf_mapinpandas_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas`` per-Arrow-batch introspection, made verifiable:
    each batch emits one PARTIAL row (its size, min/max/sum of ids) —
    the same per-batch view you'd use to validate batch shaping
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) before pointing
    a heavy decode UDF at 100 TB — and the partials then fold through a
    normal global aggregate. The folded result is exactly the classic
    map-side partial-aggregation identity: COUNT = Σ batch_rows,
    MIN = min of batch minima, MAX = max of batch maxima,
    SUM = Σ batch sums — invariant to WHERE the Arrow batch boundaries
    fall, so the query finally carries a hash oracle (any partial
    dropped, duplicated, or mis-merged breaks it) while the raw
    per-batch frames stay covered by the batch-shape pytest
    (tests/test_rows_only.py)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return batch_partials(docs).agg(
        # COALESCE: the oracle's COUNT(*) over an empty table is 0,
        # but the fold's SUM over zero partials would be NULL
        # (min/max/sum stay NULL on empty in both engines)
        F.coalesce(F.sum("batch_rows"), F.lit(0).cast("long")).alias(
            "total_rows"
        ),
        F.min("min_doc_id").alias("min_doc_id"),
        F.max("max_doc_id").alias("max_doc_id"),
        F.sum("sum_doc_id").alias("sum_doc_id"),
    )


CHUNK_TOKENS = 16  # context-window chunk size for the UDTF demo


@query(
    "udtf_doc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           CAST(least(len(t), (ci + 1) * {CHUNK_TOKENS})
                - ci * {CHUNK_TOKENS} AS INT) AS n_tokens,
           array_to_string(
               t[ci * {CHUNK_TOKENS} + 1 :
                 least(len(t), (ci + 1) * {CHUNK_TOKENS})], ' ') AS chunk_text
    FROM toks,
         unnest(range(0, CAST(ceil(len(t) * 1.0 / {CHUNK_TOKENS}) AS BIGINT)))
           AS u(ci)
    """,
)
def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 tier: **Python UDTF** (Spark 4 user-defined table function)
    — the 1→N row-expanding UDF surface as a first-class SQL relation,
    demonstrated on the op every embedding/RAG pipeline needs: chunk
    each document into fixed-token-budget windows. Consumed through a
    LATERAL join, so Catalyst plans the expansion per-row without any
    driver involvement; the DuckDB oracle reconstructs every chunk
    boundary and text slice independently.

    (UDTFs run row-at-a-time in Python — fine for a surface demo; the
    PRODUCTION chunker for 100 TB is the same logic as a JVM-side
    sequence/slice projection, see pipeline_sequence_packing.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, n_tokens: int, chunk_text: string")
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                # no content -> no chunks (LATERAL drops the row),
                # matching the oracle's NULL-text behavior
                return
            toks = text.split(" ")
            for ci in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
                window = toks[ci * CHUNK_TOKENS : (ci + 1) * CHUNK_TOKENS]
                yield ci, len(window), " ".join(window)

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents")
    view = "docs_for_chunking"
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT doc_id, chunk_idx, n_tokens, chunk_text"
        f" FROM {view}, LATERAL chunk_doc(text)"
    )
