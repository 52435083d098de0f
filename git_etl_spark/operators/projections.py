"""Projection / scalar-function pack — SURVEY.md §2.3 (P1-P12, D1),
§2.4 (F1-F7, V1-V6 validation), §2.10 X6 (JSON extraction).

All row-level transforms are built-in ``pyspark.sql.functions`` —
JVM-side, inside whole-stage codegen. No Python UDFs anywhere in this
module: at 100 TB a row-at-a-time Python UDF on the hot path is a
10-100× regression (SNIPPETS.md vectorization notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_sec, trunc_hour_ntz
from ..io import load_table
from ..registry import query


@query(
    "proj_string_ops",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[-1] AS last_word,
           string_split(text, ' ')[1] AS first_word,
           upper(lang) AS lang_uc,
           CAST(NULLIF(regexp_extract(source, '([0-9]+)', 1), '')
                AS BIGINT) AS src_num,
           length(text) AS text_len,
           substr(text, 1, 16) AS prefix16,
           reverse(source) AS source_rev
    FROM documents
    """,
)
def proj_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack: split + element_at (P9 basename idiom),
    regexp_extract (P11 extension extract idiom), case/length/substr.
    Reference idioms at ``src/git-parser.ts:54-55,227-231``.

    src_num is NULLIF-guarded on both engines: regexp_extract returns
    '' (not NULL) when the source has no digits, and under ANSI
    CAST('' AS BIGINT) is a crash, not a value — found by the r14
    skew-corpus full-oracle sweep ('monorepo-hot' is digit-free; the
    r13 execute-only survey missed it because count() PRUNES the
    projection entirely). A digit-free source is in-domain input, so
    the honest value is NULL, mirrored in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.element_at(toks, -1).alias("last_word"),
        F.element_at(toks, 1).alias("first_word"),
        F.upper("lang").alias("lang_uc"),
        F.nullif(F.regexp_extract("source", r"([0-9]+)", 1), F.lit(""))
        .cast("long")
        .alias("src_num"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 16).alias("prefix16"),
        F.reverse("source").alias("source_rev"),
    )


@query(
    "proj_rename_path_rewrite",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               'src/{old_' || source || ' => new_' || lang || '}/file.txt',
               '\{[^}]*?=>\s*([^}]*?)\}', '\1', 'g') AS resolved_path
    FROM documents
    """,
)
def proj_rename_path_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 git rename-path rewrite (reference ``src/git-parser.ts:91-99``):
    ``a/{old => new}/b`` → ``a/new/b``, handling the ``{ => dir}`` edge.
    Applied to paths synthesized from corpus columns so the oracle sees
    real data flow."""
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("src/{old_"), F.col("source"), F.lit(" => new_"), F.col("lang"),
        F.lit("}/file.txt"),
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(path, r"\{[^}]*?=>\s*([^}]*?)\}", "$1").alias(
            "resolved_path"
        ),
    )


@query(
    "proj_time_parts",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) AS event_day,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           strftime(ts, '%Y-%m-%d') AS iso_day,
           date_trunc('hour', ts) AS hour_bucket,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_sec
    FROM events
    """,
)
def proj_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P5/D1 temporal scalars (reference ``src/git-parser.ts:189``,
    ``src/database.ts:45``, ``README.md:65``): epoch↔timestamp, date
    truncation, parts, ISO formatting. DuckDB ``dayofweek`` is 0=Sunday
    vs Spark's 1=Sunday — oracle shifts by one."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date("ts").alias("event_day"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.date_format("ts", "yyyy-MM-dd").alias("iso_day"),
        trunc_hour_ntz("ts").alias("hour_bucket"),
        epoch_sec("ts").alias("epoch_sec"),
    )


@query(
    "proj_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
    FROM events
    """,
)
def proj_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 JSON extraction from the ``events.props`` payload with
    missing-key null semantics, via ``json_tuple`` — ONE parse per row
    emitting every requested field, where the previous
    ``get_json_object``-per-column form re-parsed the payload for each
    path (the r11 cores screen flagged this query data-linear-flat at
    3.7 s; the parse is scan-fused CPU, so the fix is doing it once,
    not spreading it — numbers at the commit). String-then-cast
    semantics identical to get_json_object. JSON parsing stays
    JVM-side, no Python."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.json_tuple("props", "k", "missing").alias("k_s", "missing_s"),
    ).select(
        "event_id",
        F.col("k_s").cast("long").alias("k_val"),
        F.col("k_s").isNotNull().alias("has_k"),
        F.col("missing_s").cast("long").alias("missing_val"),
    )


@query(
    "filter_regex_gate",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE regexp_matches(text, '(?s)spark.*join') AND lang <> 'zh'
    """,
)
def filter_regex_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/S5 pattern gate (reference ``main.ts:51-73`` author probe):
    regex containment filter + negation, pattern as a parameter rather
    than the reference's hard-coded constant. Both predicates push into
    the scan.

    ``(?s)`` on BOTH engines (r14 unicode-hostility audit): without
    it, ``.`` spans different line-terminator sets — Java excludes
    \\n/\\r/U+2028/U+2029/NEL, RE2 only \\n — so a document with
    'spark' and 'join' on either side of a terminator matches on one
    engine and not the other. DOTALL makes the two ``.`` semantics
    identical, and states the actual intent: containment anywhere in
    the document, not within one line."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").rlike("(?s)spark.*join") & (F.col("lang") != "zh")
    ).select("doc_id", "lang", "source")


@query(
    "filter_validation_quarantine",
    oracle="""
    SELECT event_id,
           COALESCE(value > 90, FALSE) AS v_value_high,
           COALESCE(event_type = 'error', FALSE) AS v_is_error,
           (props IS NULL
            OR NOT (starts_with(props, '{') AND ends_with(props, '}')))
               AS v_bad_props,
           CAST((CASE WHEN COALESCE(value > 90, FALSE) THEN 1 ELSE 0 END)
              + (CASE WHEN COALESCE(event_type = 'error', FALSE) THEN 1 ELSE 0 END)
              + (CASE WHEN props IS NULL
                        OR NOT (starts_with(props, '{')
                                AND ends_with(props, '}'))
                      THEN 1 ELSE 0 END)
              AS INT) AS n_violations
    FROM events
    WHERE COALESCE(value > 90, FALSE)
       OR COALESCE(event_type = 'error', FALSE)
       OR props IS NULL
       OR NOT (starts_with(props, '{') AND ends_with(props, '}'))
    """,
)
def filter_validation_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1-V4 validation/quarantine split (reference ``src/validation.ts``
    composite checks + SURVEY §4 E12): per-row rule flags computed once,
    quarantine = any-rule-violated. The valid/invalid split is the
    distributed replacement for the reference's per-row INSERT
    try/catch error counting (``src/database.ts:38-63``).

    Every rule is NULL-TOTAL (r14 null-heavy full-oracle sweep): a
    validator that emits NULL flags on dirty rows defeats itself —
    under three-valued logic a row with NULL props scored n_violations
    NULL and silently escaped the quarantine filter entirely. The
    explicit semantics: a missing (NULL) props IS bad props; a missing
    event_type is NOT an error event; a missing value is NOT
    out-of-range. Mirrored verbatim in the oracle.

    The shape rule is starts_with/ends_with, NOT ``rlike '^\\{.*\\}$'``
    (r14 unicode-hostility full-oracle sweep): regex ``.`` is
    line-terminator-sensitive and the two engines disagree about WHICH
    terminators — Java excludes U+2028/U+2029/NEL, RE2 excludes only
    \\n — so a payload carrying a raw U+2028 (legal unescaped JSON,
    and exactly what json serializers emit) was quarantined by Spark
    and passed by DuckDB. First/last-char checks state the intended
    rule exactly, engine-independently, and regex-free in the 100 TB
    hot path."""
    ev = load_table(spark, sf_dir, "events")
    v_value = F.coalesce(F.col("value") > 90, F.lit(False))
    v_error = F.coalesce(F.col("event_type") == "error", F.lit(False))
    v_props = F.col("props").isNull() | ~(
        F.col("props").startswith("{") & F.col("props").endswith("}")
    )
    flagged = ev.select(
        "event_id",
        v_value.alias("v_value_high"),
        v_error.alias("v_is_error"),
        v_props.alias("v_bad_props"),
        (
            v_value.cast("int") + v_error.cast("int") + v_props.cast("int")
        ).alias("n_violations"),
    )
    return flagged.filter(F.col("n_violations") > 0)


@query(
    "proj_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_val,
           (props->>'$.absent') IS NULL AS missing_is_null
    FROM events
    """,
)
def proj_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the JSON
    props column is parsed once into a binary variant
    (``parse_json``) and fields are extracted with typed paths
    (``try_variant_get``) — the open-schema path for payloads whose
    shape isn't known at write time. Against 100 TB this beats
    per-query ``get_json_object`` string re-parsing: the variant
    encodes once at ingest into a shredded binary form, and every
    later extraction is a binary path walk, not a JSON tokenizer pass.
    A missing path under ``try_variant_get`` is NULL, not an error —
    asserted per row. The DuckDB oracle states the same semantics
    through its JSON operators, so the variant encode/decode cycle is
    value-verified end to end."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k_val"),
        F.try_variant_get(v, "$.absent", "string").isNull().alias(
            "missing_is_null"
        ),
    )
